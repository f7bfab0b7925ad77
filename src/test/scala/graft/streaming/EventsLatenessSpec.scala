package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hand trace of the watermark-lateness audit: lateness is measured
  * against the running event-time max in ARRIVAL (event_id) order.
  */
class EventsLatenessSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("lateness audit counts threshold crossings against the running max") {
    import spark.implicits._
    val M = 60L * 1000 * 1000 * 1000 // one minute in nanos
    val dir = java.nio.file.Files.createTempDirectory("graft_late").toString
    // arrival order: 10min, 2min (8min late), 20min, 19.5min (30s late)
    Seq(
      (0L, 10 * M, 1L, "click"), (1L, 2 * M, 1L, "click"),
      (2L, 20 * M, 1L, "click"), (3L, 20 * M - M / 2, 1L, "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .write.parquet(s"$dir/events.parquet")
    val r = Events.qLatenessAudit(spark, dir).collect().head
    assert(r.getString(0) == "click")
    assert(r.getLong(1) == 4L)                    // n_events
    assert(r.getLong(2) == 1L)                    // > 1 min: the 8-min one
    assert(r.getLong(3) == 0L)                    // > 1 hour: none
    assert(r.getLong(4) == 8L * 60 * 1000 * 1000) // max lateness in us
  }
}
