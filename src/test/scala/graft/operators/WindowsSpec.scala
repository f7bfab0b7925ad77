package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Structural invariants of the window pack (the driver oracle checks
  * q77-q80 value-exactly vs DuckDB; these pin the semantics that survive
  * repartitioning and hold on any input).
  */
class WindowsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q77 running totals: final running value equals the group total") {
    val run = Windows.qWindowRunning(spark, sf)
    val lastPerGroup = run.groupBy("o_orderpriority")
      .agg(max("running_orders").as("final_cnt"),
        max("running_revenue").as("final_rev"))
    val direct = graft.Tables.load(spark, sf, "orders")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"), Relational.dsum(col("o_totalprice")).as("rev"))
    val joined = lastPerGroup.join(direct, "o_orderpriority").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("final_cnt") == r.getAs[Long]("cnt"))
      assert(r.getAs[Double]("final_rev") == r.getAs[Double]("rev"))
    }
  }

  test("q77 is partition-count invariant (decimal accumulation, no float drift)") {
    val a = Windows.qWindowRunning(spark, sf)
    val b = Windows.qWindowRunning(spark, sf).repartition(7)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("q78 gaps: buckets non-negative, total gaps = rows - customers") {
    val g = Windows.qLagGap(spark, sf)
    assert(g.where(col("gap_weeks") < 0).isEmpty)
    val o = graft.Tables.load(spark, sf, "orders")
    val expected = o.count() - o.select("o_custkey").distinct().count()
    val total = g.agg(sum("n_gaps")).head().getLong(0)
    assert(total == expected)
  }

  test("q79 ntile: 10 tiles per priority, sizes differ by at most 1") {
    val d = Windows.qNtileDeciles(spark, sf)
    val perPriority = d.groupBy("o_orderpriority")
      .agg(countDistinct("tile").as("tiles"),
        max("n_orders").as("mx"), min("n_orders").as("mn")).collect()
    assert(perPriority.nonEmpty)
    perPriority.foreach { r =>
      assert(r.getAs[Long]("tiles") == 10L)
      assert(r.getAs[Long]("mx") - r.getAs[Long]("mn") <= 1L)
    }
  }

  test("q80 moving average: ma7 within [min,max] of daily revenue; one row per day") {
    val m = Windows.qMovingAvg(spark, sf)
    assert(m.count() == m.select("d").distinct().count())
    val bad = m.agg(min("daily_revenue").as("lo"), max("daily_revenue").as("hi"))
      .crossJoin(m.agg(min("ma7").as("mlo"), max("ma7").as("mhi")))
      .where(col("mlo") < col("lo") || col("mhi") > col("hi"))
    assert(bad.isEmpty)
  }

  test("q148 RANGE frame: strictly-preceding 10-minute window, hand-computed") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_range").toString
    val min5 = 300000000000L // 5 min in ns
    // u1: t=0, t=5min (sees the first), t=20min (10-min lookback empty);
    // u2: one event — isolation across users
    Seq(
      (1L, 0L, 1L, "c", 1.0), (2L, min5, 1L, "c", 1.0),
      (3L, 4 * min5, 1L, "c", 1.0), (4L, min5, 2L, "c", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val got = Windows.qRangeFrameBurst(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4))).toList
    // preceding counts: 0, 1, 0, 0 -> avg 0.25, max 1, 25% bursty
    assert(got == List(("c", 4L, 0.25, 1L, 25.0)))
  }

  test("q148 RANGE vs ROWS: simultaneous events are frame peers, not predecessors") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_range2").toString
    // two events at the SAME instant: a ROWS -1 frame would count one of
    // them as preceding the other; the value-bounded RANGE frame must not
    Seq((1L, 1000L, 1L, "c", 1.0), (2L, 1000L, 1L, "c", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val got = Windows.qRangeFrameBurst(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toList
    assert(got == List(("c", 2L, 0.0, 0L)))
  }
}
