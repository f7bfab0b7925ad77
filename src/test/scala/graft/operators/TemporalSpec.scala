package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Micro-semantics of the as-of core, independent of the testdata shape
  * (the driver oracle checks q57/q58 end-to-end on the real tables).
  */
class TemporalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("asofLatest: latest at-or-before, inclusive same-instant, none-before-first") {
    import spark.implicits._
    val build = Seq(
      (1L, 10L, "A"), (1L, 20L, "B"),
      (2L, 100L, "C")).toDF("k", "t_ns", "attr")
    val probe = Seq(
      (1L, 5L),   // before any build → null
      (1L, 10L),  // same instant → sees A
      (1L, 15L),  // between → A
      (1L, 25L),  // after both → B
      (2L, 99L),  // other key, before → null
      (3L, 50L)   // key with no builds → null
    ).toDF("k", "t_ns")
    val got = Temporal.asofLatest(build, probe).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> Option(r.getString(2))).toMap
    assert(got((1L, 5L)).isEmpty)
    assert(got((1L, 10L)).contains("A"))
    assert(got((1L, 15L)).contains("A"))
    assert(got((1L, 25L)).contains("B"))
    assert(got((2L, 99L)).isEmpty)
    assert(got((3L, 50L)).isEmpty)
  }

  test("scd2FromChanges: runs collapse, validity chains, open row has null valid_to") {
    import spark.implicits._
    val changes = Seq(
      (1L, 10L, 1L, "A"), (1L, 20L, 2L, "A"), // same attr → one run
      (1L, 30L, 3L, "B"),                     // change → new version
      (1L, 40L, 4L, "A"),                     // back to A → THIRD version
      (2L, 5L, 1L, "X")).toDF("k", "t_ns", "seq", "attr")
    val got = Temporal.scd2FromChanges(changes).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    assert(got == Set(
      (1L, "A", 10L, Some(30L)),
      (1L, "B", 30L, Some(40L)),
      (1L, "A", 40L, None),
      (2L, "X", 5L, None)))
  }

  test("asofLatest: equal-time builds resolve deterministically (max attr)") {
    import spark.implicits._
    val build = Seq((1L, 10L, "X"), (1L, 10L, "Y")).toDF("k", "t_ns", "attr")
    val probe = Seq((1L, 11L)).toDF("k", "t_ns")
    val got = Temporal.asofLatest(build, probe).collect().head.getString(2)
    assert(got == "Y") // attr ascending → last row wins
  }
}
