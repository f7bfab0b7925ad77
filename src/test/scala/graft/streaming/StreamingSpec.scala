package graft.streaming

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** The hourly windowed aggregation executed as a genuine Structured
  * Streaming job (readStream file source → Trigger.AvailableNow → memory
  * sink) must agree exactly with its batch execution — same function,
  * two engines.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("streaming hourly agg (AvailableNow) matches batch exactly") {
    val batchDf = Tables.load(spark, dir, "events")
    // the file stream source wants a directory of arriving files
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$streamDir/events.parquet"))
    val stream = Tables.loadStream(spark, dir, "events", streamDir)
    assert(stream.isStreaming)

    val q = Events.hourlyAgg(stream).writeStream
      .format("memory")
      .queryName("hourly_stream")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("hourly_stream").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = Events.hourlyAgg(batchDf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("watermark + append mode emits only closed windows, matching batch for them") {
    val batchDf = Tables.events(spark, dir)
    val streamDir = java.nio.file.Files.createTempDirectory("graft_wm_stream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$streamDir/events.parquet"))
    val stream = Tables.loadStream(spark, dir, "events", streamDir)
      .withColumn("ts_utc", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
    val q = Events.hourlyWithWatermark(stream)
      .writeStream.format("memory").queryName("wm_hourly")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("wm_hourly").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val batch = Events.hourlyWithWatermark(batchDf).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(streamed.nonEmpty)
    // append mode withholds windows newer than max(event_time) - delay;
    // every emitted window must match batch exactly, and the only missing
    // ones must be within the final watermark hold-back
    assert(streamed.keySet.subsetOf(batch.keySet))
    streamed.foreach { case (k, v) => assert(batch(k) == v, s"window $k differs") }
    val maxUs = batchDf.agg(org.apache.spark.sql.functions.max(
      org.apache.spark.sql.functions.unix_micros(col("ts_utc")))).collect().head.getLong(0)
    val held = batch.keySet -- streamed.keySet
    assert(held.forall { case (startUs, _) => startUs + 3600000000L > maxUs - 3600000000L },
      s"closed windows missing from append output: $held")
  }

  test("streaming dedup drops re-delivered events across micro-batches") {
    val batchDf = Tables.load(spark, dir, "events")
    val streamDir = java.nio.file.Files.createTempDirectory("graft_dedup_stream").toString
    // the same file arrives twice (two micro-batches with maxFilesPerTrigger=1)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$streamDir/events_a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$streamDir/events_b.parquet"))
    val stream = Tables.loadStream(spark, dir, "events", streamDir,
      Map("maxFilesPerTrigger" -> "1"))
    val q = Events.dedupEvents(stream)
      .groupBy().count()
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val n = spark.table("dedup_stream").collect().head.getLong(0)
    assert(n == batchDf.count()) // duplicates from redelivery suppressed by state
  }

  test("flatMapGroupsWithState running totals converge to batch totals") {
    val batchDf = Tables.load(spark, dir, "events")
    val streamDir = java.nio.file.Files.createTempDirectory("graft_state_stream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$streamDir/events.parquet"))
    val stream = Tables.loadStream(spark, dir, "events", streamDir)
    val q = Events.runningUserTotals(stream)
      .writeStream.format("memory").queryName("running_totals")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // last update per user == batch aggregate
    val streamed = spark.table("running_totals")
      .groupBy(org.apache.spark.sql.functions.col("user_id"))
      .agg(org.apache.spark.sql.functions.max("n_events").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = batchDf.groupBy(org.apache.spark.sql.functions.col("user_id"))
      .count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }

  test("streaming KLL percentiles: state carries across micro-batches, bound holds") {
    val batchDf = Tables.load(spark, dir, "events")
    val streamDir = java.nio.file.Files.createTempDirectory("graft_kll_stream").toString
    // two copies of the same file → two micro-batches; the sketch state
    // must absorb both deliveries (2x each value)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$streamDir/events_a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$streamDir/events_b.parquet"))
    val stream = Tables.loadStream(spark, dir, "events", streamDir,
      Map("maxFilesPerTrigger" -> "1"))
    val q = Events.runningValuePercentiles(stream)
      .writeStream.format("memory").queryName("kll_stream")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // final update per type covers both deliveries
    val last = spark.table("kll_stream")
      .orderBy(col("n").desc).collect()
      .groupBy(_.getString(0)).map { case (et, rows) => et -> rows.head }
    val perType = batchDf.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(last.keySet == perType.keySet)
    perType.foreach { case (et, n) => assert(last(et).getLong(1) == 2 * n, et) }
    // p50 rank error vs the exact doubled distribution (== original) <= 2%
    perType.keys.foreach { et =>
      val sorted = batchDf.where(col("event_type") === et)
        .select("value").collect().map(_.getDouble(0)).sorted
      val est = last(et).getDouble(2)
      val below = sorted.count(_ <= est).toDouble / sorted.length
      assert(math.abs(below - 0.5) <= 0.02, s"$et p50=$est rank=$below")
    }
  }

  test("stream-stream interval join matches the batch range join exactly") {
    val batchDf = Tables.events(spark, dir)
    val streamDir = java.nio.file.Files.createTempDirectory("graft_ssj_stream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$streamDir/events.parquet"))
    val stream = Tables.loadStream(spark, dir, "events", streamDir)
      .withColumn("ts_utc", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
    // stream-stream joins emit in APPEND mode only; aggregate the sink
    val q = Events.pairsWithinBand(stream, stream)
      .writeStream.format("memory").queryName("ssj_pairs")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("ssj_pairs")
      .groupBy(col("type_a"), col("type_b")).count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = Events.pairsWithinBand(batchDf, batchDf)
      .groupBy(col("type_a"), col("type_b")).count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("streaming near-dup dedup: signature state suppresses re-delivered content") {
    val batchDf = Tables.load(spark, dir, "documents")
    val streamDir = java.nio.file.Files.createTempDirectory("graft_docs").toString
    // deliver the same content twice under different file names — an
    // at-least-once source re-sending a batch of documents
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      java.nio.file.Paths.get(s"$streamDir/d1.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      java.nio.file.Paths.get(s"$streamDir/d2.parquet"))
    val stream = Tables.loadStream(spark, dir, "documents", streamDir,
      Map("maxFilesPerTrigger" -> "1")) // force two micro-batches
    val q = Docs.dedupBySignature(stream).writeStream
      .format("memory").queryName("docs_dedup")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamedKeys = spark.table("docs_dedup")
      .select(col("sig_key")).collect().map(_.getLong(0))
    // exactly one survivor per distinct signature despite double delivery
    assert(streamedKeys.length == streamedKeys.distinct.length)
    val batchKeys = Docs.withSignatureKey(batchDf)
      .select(col("sig_key")).distinct().collect().map(_.getLong(0)).toSet
    assert(streamedKeys.toSet == batchKeys)
    // the key is content-derived: distinct signatures <= distinct texts
    assert(batchKeys.size <= batchDf.select(col("text")).distinct().count())
  }

  test("streaming debounce carries the anchor across micro-batches, exact parity with batch") {
    import org.apache.spark.sql.functions.expr
    val batchDf = Tables.load(spark, dir, "events")
    // two TIME-ORDERED files -> maxFilesPerTrigger=1 forces the anchor to
    // survive a real micro-batch boundary (a single batch would not
    // exercise cross-batch state at all)
    val cut = batchDf.selectExpr("percentile_approx(ts, 0.5)").collect().head.getLong(0)
    val streamDir = java.nio.file.Files.createTempDirectory("graft_deb_stream").toString
    val scratch = java.nio.file.Files.createTempDirectory("graft_deb_scratch").toString
    Seq(("b0", s"ts <= $cut"), ("b1", s"ts > $cut")).foreach { case (name, cond) =>
      batchDf.where(expr(cond)).coalesce(1).write.parquet(s"$scratch/$name")
      val part = new java.io.File(s"$scratch/$name").listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.copy(part,
        java.nio.file.Paths.get(s"$streamDir/$name.parquet"))
    }
    val stream = spark.readStream.schema(batchDf.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir)
    val q = Events.debounceStream(stream).writeStream
      .format("memory").queryName("deb_stream")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamedIds = spark.table("deb_stream")
      .select(col("event_id")).collect().map(_.getLong(0)).toSet
    // batch execution of the SAME function = the lag rule over all data
    val batchIds = Events.debounceStream(batchDf)
      .select(col("event_id")).collect().map(_.getLong(0)).toSet
    assert(streamedIds.nonEmpty && streamedIds == batchIds)
    // and both agree with the q136 per-type kept counts
    val q136 = graft.operators.Temporal.qDebounce(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val streamedByType = spark.table("deb_stream").groupBy(col("event_type"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamedByType == q136)
  }

  test("sessionize: per-user sessions split on >=30min gaps (spot-check invariants)") {
    val sessions = Events.qSessionize(spark, dir).collect()
    assert(sessions.nonEmpty)
    // session durations never negative; event counts positive
    assert(sessions.forall(r => r.getAs[Long]("dur_us") >= 0))
    assert(sessions.forall(r => r.getAs[Long]("n_events") >= 1))
    // total events across sessions == table rows
    val total = sessions.map(_.getAs[Long]("n_events")).sum
    assert(total == Tables.load(spark, dir, "events").count())
  }
}
