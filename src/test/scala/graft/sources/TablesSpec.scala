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
