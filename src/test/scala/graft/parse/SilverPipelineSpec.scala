package graft.parse

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Pipeline, TestSpark}
import graft.gold.{Gold, GoldSql}
import graft.sources.Writers

/** End-to-end: fixture draws → bronze scan → silver → gold, plus writer
  * round-trips and the incremental (skip-processed) contract.
  */
class SilverPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val rawPath = "data/fixtures/raw"

  private def freshDir(): String =
    Files.createTempDirectory("graft_silver_spec").toString

  test("bronze scan finds all fixture files; partition keys extract from paths") {
    val raw = Silver.rawDraws(spark, s"$rawPath/year=*/sorteo=*/*.txt")
    assert(raw.count() == 3)
  }

  test("end-to-end pipeline: silver schemas, golden values, gold tables, idempotent rerun") {
    val out = freshDir()
    val counts = Pipeline.run(spark, s"$rawPath/year=*/sorteo=*/*.txt", out)

    val sorteos = spark.read.parquet(s"$out/silver/sorteos")
    val premios = spark.read.parquet(s"$out/silver/premios")
    assert(sorteos.count() == 3)
    assert(premios.count() == 7 + 4 + 3)
    // silver schema contract (FIXTURES.md §2-3)
    assert(premios.columns.toSet == Set("numero_sorteo", "numero_premiado", "letras",
      "monto", "vendedor", "ciudad", "departamento", "year", "sorteo"))
    // Hive partition layout (year=/sorteo=)
    assert(new java.io.File(s"$out/silver/premios/year=2024/sorteo=3046").isDirectory)
    assert(new java.io.File(s"$out/silver/premios/year=2025/sorteo=3101").isDirectory)

    // gold_draw_summary golden row for sorteo 3046 (hand-computed)
    val ds = spark.read.parquet(s"$out/gold/gold_draw_summary")
      .where(col("numero_sorteo") === 3046).collect().head
    assert(ds.getAs[Long]("total_premios") == 7)
    assert(ds.getAs[Long]("premios_vendidos") == 5) // null vendedor drops out of <>
    assert(ds.getAs[Long]("premios_no_vendidos") == 1)
    assert(ds.getAs[Double]("pct_vendido") == 71.43)
    assert(math.abs(ds.getAs[Double]("total_monto") - 1103185.06) < 1e-6)
    assert(math.abs(ds.getAs[Double]("monto_pagado") - 1101200.0) < 1e-6)
    assert(ds.getAs[Double]("top_premio") == 500000.0)

    // terminations: 7 → '07', 109964 → '64' (length-robust % 100)
    val term = spark.read.parquet(s"$out/gold/gold_terminations")
    assert(term.where(col("terminacion") === "07").count() == 1)
    assert(term.where(col("terminacion") === "64").count() == 1)

    // geo_winnings is year-partitioned on disk and excludes NO VENDIDO
    assert(new java.io.File(s"$out/gold/gold_geo_winnings/year=2024").isDirectory)

    // all 7 gold tables built with rows
    assert(counts.keySet == Gold.builders.keySet)
    assert(counts.values.forall(_ > 0))

    // incremental rerun: all draws already in silver → nothing appended,
    // gold rebuild (overwrite) stays identical
    val counts2 = Pipeline.run(spark, s"$rawPath/year=*/sorteo=*/*.txt", out)
    assert(spark.read.parquet(s"$out/silver/premios").count() == 14)
    assert(counts2 == counts)
  }

  test("SQL form of every gold query matches the DataFrame builders") {
    val draws = Silver.parseDraws(Silver.rawDraws(spark, s"$rawPath/year=*/sorteo=*/*.txt"))
    val sorteos = Silver.sorteos(draws).toDF()
    val premios = Silver.premios(draws).toDF()
    Writers.registerSilver(sorteos, premios)
    Gold.builders.foreach { case (name, build) =>
      val viaDf = build(sorteos, premios)
      val viaSql = GoldSql.run(spark, name)
      assert(viaSql.columns.toSeq == viaDf.columns.toSeq, s"$name column mismatch")
      val a = viaDf.collect().map(_.toSeq).toSet
      val b = viaSql.collect().map(_.toSeq).toSet
      assert(a == b, s"$name rows differ between DataFrame and SQL form")
    }
  }

  test("incremental arrival: a NEW draw file appends only its own rows") {
    val out = freshDir()
    val raw = freshDir()
    def stage(name: String): Unit = {
      val src = java.nio.file.Paths.get(rawPath)
      java.nio.file.Files.walk(src).filter(_.toString.endsWith(s"$name")).forEach { p =>
        val rel = src.relativize(p).toString
        val dst = java.nio.file.Paths.get(raw, rel)
        java.nio.file.Files.createDirectories(dst.getParent)
        java.nio.file.Files.copy(p, dst)
      }
    }
    // first run: two 2024 draws (7 + 4 premios rows)
    stage("results_raw_lottery_url_id_287_3046.txt")
    stage("results_raw_lottery_url_id_288_3047.txt")
    Pipeline.run(spark, s"$raw/year=*/sorteo=*/*.txt", out)
    assert(spark.read.parquet(s"$out/silver/premios").count() == 11)
    // a NEW draw arrives: only its 3 rows append, nothing re-processed
    stage("results_raw_lottery_url_id_310_3101.txt")
    Pipeline.run(spark, s"$raw/year=*/sorteo=*/*.txt", out)
    val premios = spark.read.parquet(s"$out/silver/premios")
    assert(premios.count() == 14)
    assert(premios.where(col("sorteo") === 3046).count() == 7) // not duplicated
    assert(premios.where(col("sorteo") === 3101).count() == 3) // newly arrived
  }

  test("processedSorteos: empty on missing path, but corrupt silver PROPAGATES") {
    val out = freshDir()
    // missing path → first run → empty processed set
    assert(Silver.processedSorteos(spark, s"$out/nope").count() == 0)
    // corrupt silver (present path, unreadable footer) must throw, never
    // silently reprocess-everything into the append-mode writer
    Files.write(java.nio.file.Paths.get(s"$out/corrupt.parquet"),
      "not a parquet file".getBytes)
    assertThrows[Exception] {
      Silver.processedSorteos(spark, s"$out/corrupt.parquet").count()
    }
  }

  test("Pipeline.run on a raw glob matching nothing returns empty, no throw") {
    val out = freshDir()
    Files.createDirectory(java.nio.file.Paths.get(s"$out/empty_raw"))
    val counts = Pipeline.run(spark, s"$out/empty_raw/*.txt", s"$out/out")
    assert(counts.isEmpty)
  }

  test("lenient parse mode drops malformed files instead of failing the batch") {
    val raw = Silver.rawDraws(spark, "data/fixtures/bad/missing_*.txt")
    assert(raw.count() == 2)
    assert(Silver.parseDraws(raw, lenient = true).count() == 0)
    assertThrows[org.apache.spark.SparkException](Silver.parseDraws(raw).count())
  }

  test("CSV sink/scan round-trip preserves silver premios values") {
    val out = freshDir()
    val draws = Silver.parseDraws(Silver.rawDraws(spark, s"$rawPath/year=*/sorteo=*/*.txt"))
    val premios = Silver.premios(draws).toDF()
    Writers.writeCsv(premios, s"$out/premios_csv")
    val back = Writers.readCsv(spark, s"$out/premios_csv")
    assert(back.count() == premios.count())
    assert(back.columns.sorted.toSeq == premios.columns.sorted.toSeq)
    // spot value survives the text round-trip
    assert(back.where(col("numero_premiado") === 109964).count() == 1)
  }

  test("overwrite gold sink is a full idempotent rebuild (S13/S14)") {
    val out = freshDir()
    val df1 = spark.range(5).toDF("id")
    Writers.writeGold(df1, s"$out/g")
    Writers.writeGold(spark.range(3).toDF("id"), s"$out/g")
    assert(spark.read.parquet(s"$out/g").count() == 3) // replaced, not appended
  }
}
