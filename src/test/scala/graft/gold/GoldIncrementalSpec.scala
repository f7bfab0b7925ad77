package graft.gold

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Incremental gold maintenance contract: after a delta lands in one
  * year, rebuilding just that year's partition must (a) equal a full
  * from-scratch rebuild row-for-row, and (b) leave the untouched year's
  * parquet files byte-identical on disk — the proof that the rebuild was
  * actually incremental and not a disguised full rewrite.
  */
class GoldIncrementalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def silver() = {
    import spark.implicits._
    val sorteos = Seq(
      (100L, "ORDINARIO", java.sql.Date.valueOf("2024-03-01"), 2024),
      (101L, "ORDINARIO", java.sql.Date.valueOf("2025-02-01"), 2025))
      .toDF("numero_sorteo", "tipo_sorteo", "fecha_sorteo", "year")
    val premios = Seq(
      (100L, 11L, 500.0, "VENDOR_A", 2024),
      (100L, 12L, 250.0, "NO VENDIDO", 2024),
      (101L, 21L, 900.0, "VENDOR_B", 2025))
      .toDF("numero_sorteo", "numero_premiado", "monto", "vendedor", "year")
    (sorteos, premios)
  }

  test("year-partition rebuild equals full rebuild and leaves other years untouched") {
    import spark.implicits._
    val (sorteos, premios) = silver()
    val goldPath = Files.createTempDirectory("graft_gold_inc").toString + "/gold"

    // initial full build, same year-stamped shape the incremental writes
    val stamped = Gold.drawSummary(sorteos, premios)
      .join(broadcast(sorteos.select(col("numero_sorteo"), col("year"))),
        Seq("numero_sorteo"))
    graft.sources.Writers.overwritePartitions(stamped, goldPath, Seq("year"))

    def fileStates(year: Int): Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(Files.walk(Paths.get(s"$goldPath/year=$year"))) { s =>
        s.iterator().asScala
          .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
          .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis).toMap
      }
    }
    val y2024Before = fileStates(2024)

    // a correction lands for draw 101 (year 2025): one premio was missing
    val delta = Seq((101L, 22L, 100.0, "VENDOR_C", 2025))
      .toDF("numero_sorteo", "numero_premiado", "monto", "vendedor", "year")
    val premiosV2 = premios.unionByName(delta)

    val rebuilt = Gold.rebuildDrawSummaryYears(sorteos, premiosV2, delta, goldPath)
    assert(rebuilt == Seq(2025))

    // (a) the incremental result equals a full from-scratch rebuild
    val got = spark.read.parquet(goldPath)
      .orderBy("numero_sorteo").collect().map(_.toSeq)
    val want = Gold.drawSummary(sorteos, premiosV2)
      .join(broadcast(sorteos.select(col("numero_sorteo"), col("year"))),
        Seq("numero_sorteo"))
      .select(spark.read.parquet(goldPath).columns.map(col): _*)
      .orderBy("numero_sorteo").collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq)
    // the corrected draw reflects the delta (3 premios now)
    assert(spark.read.parquet(goldPath)
      .where(col("numero_sorteo") === 101L)
      .head().getAs[Long]("total_premios") == 2L)

    // (b) 2024's files were neither rewritten nor touched
    assert(fileStates(2024) == y2024Before)
  }
}
