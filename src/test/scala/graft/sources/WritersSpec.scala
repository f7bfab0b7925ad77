package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** S14 incremental sink: dynamic partition overwrite must replace ONLY the
  * partitions present in the incoming frame — the reprocess-one-batch
  * pattern. A static overwrite would wipe the untouched partitions; an
  * append would duplicate the reprocessed one. Both failure modes are
  * asserted away here.
  */
class WritersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("overwritePartitions rewrites only the partitions in the frame") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_dyn").toString + "/silver"
    val full = Seq((1L, "a", 2020, 1), (2L, "b", 2020, 2), (3L, "c", 2021, 1))
      .toDF("id", "v", "year", "sorteo")
    Writers.overwritePartitions(full, path)

    // reprocess ONLY (2020, 2): one corrected row replaces the old one
    val redo = Seq((2L, "B2", 2020, 2), (4L, "new", 2020, 2))
      .toDF("id", "v", "year", "sorteo")
    Writers.overwritePartitions(redo, path)

    val got = spark.read.parquet(path)
      .select("id", "v", "year", "sorteo")
      .collect().map(_.toSeq).toSet
    val want = Set(
      Seq(1L, "a", 2020, 1),   // untouched partition intact
      Seq(3L, "c", 2021, 1),   // untouched partition intact
      Seq(2L, "B2", 2020, 2),  // replaced, not appended alongside "b"
      Seq(4L, "new", 2020, 2))
    assert(got == want)
  }
}
