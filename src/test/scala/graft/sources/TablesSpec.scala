package graft.sources

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Pins the events ingest-normalization contract (r11): batch loads go
  * through a once-per-drop scratch rewrite with `ts` as physical BIGINT
  * nanos, and that rewrite must be value-identical to the in-plan
  * projection fallback — the two paths may never drift, because which one
  * a deployment hits depends only on scratch-dir writability.
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("normalized events load equals the in-plan eventsNanos projection exactly") {
    val raw = spark.read.parquet(s"$dir/events.parquet")
    assume(raw.schema("ts").dataType != LongType,
      "drop already stores ts as long; normalization is an identity here")
    val normalized = Tables.load(spark, dir, "events")
    val projected = Tables.eventsNanos(raw)
    assert(normalized.schema("ts").dataType == LongType)
    assert(normalized.schema.fieldNames.sameElements(projected.schema.fieldNames))
    assert(normalized.count() == projected.count())
    assert(normalized.exceptAll(projected).isEmpty, "rows only in normalized copy")
    assert(projected.exceptAll(normalized).isEmpty, "rows only in projection")
  }

  test("normalized events scan keeps ts pushdown AND prunes columns") {
    val df = Tables.load(spark, dir, "events")
      .where(col("ts") >= 0L).select("ts", "user_id")
    df.count()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("GreaterThanOrEqual(ts,0)"), p)
    assert(p.contains("ReadSchema: struct<ts:bigint,user_id:bigint>"), p)
  }

  test("ingest publish protocol: debris self-heals, valid copies survive re-probes, new drops purge old") {
    import org.apache.hadoop.fs.Path
    import java.nio.file.{Files, Paths}
    // isolated fake "drop" so this test owns its srcTag namespace
    val drop = Files.createTempDirectory("graft_pub_drop").toString
    Files.copy(Paths.get(s"$dir/events.parquet"), Paths.get(s"$drop/events.parquet"))
    assume(spark.read.parquet(s"$drop/events.parquet").schema("ts").dataType != LongType,
      "drop already stores ts as long; the publish path never runs")
    val (_, dst1) = Tables.normTarget(spark, drop)
    val fs = dst1.getFileSystem(spark.sessionState.newHadoopConf())

    // 1. debris (a dst with no _SUCCESS — a crashed writer) must be
    //    replaced by a complete publish, not block it forever
    fs.mkdirs(dst1)
    fs.create(new Path(dst1, "debris.marker")).close()
    assert(Tables.load(spark, drop, "events").count() > 0)
    assert(fs.exists(new Path(dst1, "_SUCCESS")), "publish must complete over debris")
    assert(!fs.exists(new Path(dst1, "debris.marker")), "debris must not survive inside a publish")

    // 2. a valid published copy must survive a fresh-process re-probe
    //    untouched (the r12 qualified-path purge fix: an unqualified
    //    compare deleted and rewrote dst on every new JVM)
    val parts1 = fs.listStatus(dst1).map(_.getPath.getName).toSet
    Tables.resetNormCacheForTests()
    assert(Tables.load(spark, drop, "events").count() > 0)
    val parts2 = fs.listStatus(dst1).map(_.getPath.getName).toSet
    assert(parts1 == parts2, "existing valid publish was rewritten on re-probe")

    // 3. a NEW drop of the same source purges the superseded copy only
    Files.setLastModifiedTime(Paths.get(s"$drop/events.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + 5000))
    val (_, dst2) = Tables.normTarget(spark, drop)
    assert(dst2 != dst1, "a new mtime must key a new scratch copy")
    assert(Tables.load(spark, drop, "events").count() > 0)
    assert(fs.exists(new Path(dst2, "_SUCCESS")), "new drop must publish")
    assert(!fs.exists(dst1), "superseded copy must be purged")
    fs.delete(dst2, true) // leave no scratch behind for other suites
  }

  test("loadStream over documents matches the batch load exactly") {
    val batch = Tables.load(spark, dir, "documents")
    val streamDir = java.nio.file.Files.createTempDirectory("graft_tbl_stream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      java.nio.file.Paths.get(s"$streamDir/documents.parquet"))
    val q = Tables.loadStream(spark, dir, "documents", streamDir)
      .writeStream.format("memory").queryName("tbl_docs")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("tbl_docs")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }
}
