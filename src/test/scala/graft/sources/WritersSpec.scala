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

  test("compact collapses a many-small-files table without changing its rows") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_compact").toString + "/t"
    // 64 tiny files
    spark.range(10000).select(col("id"), (col("id") % 97).as("v"))
      .repartition(64).write.parquet(path)
    def files = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(path)).iterator().asScala
        .count(p => p.toString.endsWith(".parquet") &&
          java.nio.file.Files.isRegularFile(p))
    }
    val before = spark.read.parquet(path).collect().map(_.toSeq).toSet
    assert(files == 64)
    val n = Writers.compact(spark, path) // total bytes << 128 MiB => 1 file
    assert(n == 1 && files == 1)
    val after = spark.read.parquet(path).collect().map(_.toSeq).toSet
    assert(after == before)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(path + ".compact-old")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(path + ".compact-staging")))
  }

  test("compact refuses a hive-partitioned directory; compactPartitioned keeps the layout") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_compact_part").toString + "/t"
    val df = Seq.tabulate(300)(i => (i.toLong, i % 3)).toDF("id", "year")
    df.repartition(8).write.partitionBy("year").parquet(path)

    val e = intercept[IllegalArgumentException](Writers.compact(spark, path))
    assert(e.getMessage.contains("compactPartitioned"))

    def parquetFiles = {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(
        java.nio.file.Files.walk(java.nio.file.Paths.get(path))) { s =>
        s.iterator().asScala
          .filter(p => p.toString.endsWith(".parquet") &&
            java.nio.file.Files.isRegularFile(p))
          .map(_.toString).toList
      }
    }
    val before = spark.read.parquet(path).select("id", "year")
      .collect().map(_.toSeq).toSet
    assert(parquetFiles.size > 3)
    val n = Writers.compactPartitioned(spark, path)
    assert(n == 3 && parquetFiles.size == 3) // one file per year leaf
    // key=value layout intact: partition column still inferred from paths
    assert(parquetFiles.forall(_.contains("year=")))
    val after = spark.read.parquet(path).select("id", "year")
      .collect().map(_.toSeq).toSet
    assert(after == before)
  }

  test("compact clears stale staging/backup leftovers from a crashed run") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_compact_stale").toString + "/t"
    spark.range(100).toDF("id").repartition(4).write.parquet(path)
    // simulate a crash that stranded both work dirs
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path + ".compact-old"))
    java.nio.file.Files.createFile(java.nio.file.Paths.get(path + ".compact-old/orphan"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path + ".compact-staging"))
    val n = Writers.compact(spark, path)
    assert(n == 1)
    assert(spark.read.parquet(path).count() == 100)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(path + ".compact-old")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(path + ".compact-staging")))
  }

  test("range-clustered write produces near-disjoint per-file key ranges") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_cluster").toString + "/t"
    val df = spark.range(20000)
      .select((xxhash64(col("id")) % 1000).as("k"), col("id").as("payload"))
    Writers.writeRangeClustered(df, path, numFiles = 8, clusterCols = Seq("k"))
    // per-file [min, max] spans must be (nearly) disjoint: total overlap-free
    // coverage means footer stats prune a selective k predicate to ~1 file
    val spans = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("k")).as("lo"), max(col("k")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(spans.length >= 4, s"expected several clustered files, got ${spans.length}")
    spans.sliding(2).foreach { case Array((_, hi), (lo2, _)) =>
      assert(lo2 >= hi, s"file ranges overlap: hi=$hi lo2=$lo2")
    case _ => ()
    }
    // and the data survives intact
    assert(spark.read.parquet(path).count() == 20000)
  }
}
