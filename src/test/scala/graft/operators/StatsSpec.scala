package graft.operators

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Closed-form checks of the grouped statistics beyond the DuckDB gate:
  * OLS recovers an exactly-linear trend, and the moment formulas hit the
  * textbook values of a tiny known distribution.
  */
class StatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("group OLS recovers an exact linear trend per group") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ols").toString
    // y = 2x + 5 on days x = 100, 200, 300 (exact); second group constant
    def ts(day: Long) = new Timestamp(day * 86400000L)
    Seq(
      ("1-URGENT", ts(100), 205.0), ("1-URGENT", ts(200), 405.0),
      ("1-URGENT", ts(300), 605.0),
      ("2-HIGH", ts(100), 7.0), ("2-HIGH", ts(300), 7.0))
      .toDF("o_orderpriority", "o_orderdate", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")
    val got = Stats.qGroupOls(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got("1-URGENT") == ((3L, 2.0, 5.0)))
    assert(got("2-HIGH") == ((2L, 0.0, 7.0)))
  }

  test("mode + moments match the textbook values of a known distribution") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_moments").toString
    // balances {-1, 0, 1}: mean 0, m2 = 2/3, m3 = 0 (skew 0),
    // m4 = 2/3 -> kurtosis m4/m2^2 - 3 = 1.5 - 3 = -1.5
    Seq(
      ("SEG", 7, -1.0), ("SEG", 7, 0.0), ("SEG", 3, 1.0))
      .toDF("c_mktsegment", "c_nationkey", "c_acctbal")
      .write.parquet(s"$dir/customer.parquet")
    val r = Stats.qModeMoments(spark, dir).collect().head
    assert(r.getString(0) == "SEG")
    assert(r.getLong(1) == 3L)           // n_customers
    assert(r.getDouble(2) == 0.0)        // mean
    assert(r.getDouble(3) == 0.0)        // skewness
    assert(r.getDouble(4) == -1.5)       // kurtosis
    assert(r.getInt(5) == 7)             // mode nation (cnt 2)
    assert(r.getLong(6) == 2L)           // mode count
  }

  test("KS drift matches the hand-computed max CDF gap") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ks").toString
    // A lengths {1,1,2}, B lengths {2,3,3}: max |CDF_A - CDF_B| = 2/3 at l=1
    Seq(
      (1L, "w", "A"), (2L, "w", "A"), (3L, "w w", "A"),
      (4L, "w w", "B"), (5L, "w w w", "B"), (6L, "w w w", "B"))
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$dir/documents.parquet")
    val got = Stats.qKsDrift(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val want = BigDecimal(6.0 / 9.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Map("A" -> ((3L, want)), "B" -> ((3L, want))))
  }

  test("rolling anomaly scores event-free days: a total outage flags as negative z") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_outage").toString
    val DayNs = 86400000000000L
    // days 0..6 alternate 9/11; day 7 has NO events (outage); day 8 = 10.
    // The scaffold must score day 7 at v=0 (z ~ -10, flagged) and include
    // the zero in day 8's baseline (z ~ 0.39, not flagged).
    val vals = Seq(0 -> 9.0, 1 -> 11.0, 2 -> 9.0, 3 -> 11.0, 4 -> 9.0,
      5 -> 11.0, 6 -> 9.0, 8 -> 10.0)
    vals.zipWithIndex.map { case ((d, v), i) =>
      (i.toLong, d * DayNs + 1000L, 1L, "click", v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val got = Stats.qRollingAnomaly(spark, dir).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getString(0), r.getLong(1), r.getDouble(2)) == (("click", 7L, 0.0)))
    val mean = 69.0 / 7
    val z = (0.0 - mean) / math.sqrt(687.0 / 7 - mean * mean)
    assert(math.abs(r.getDouble(3) - math.rint(z * 1e6) / 1e6) < 1e-9)
  }

  test("ANOVA matches the hand-computed F and effect size") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_anova").toString
    // lengths A:{1,3}, B:{5,7} -> SSB=16, SSW=4, F=(16/1)/(4/2)=8, eta=0.8
    Seq(
      (1L, "w", "A"), (2L, "w w w", "A"),
      (3L, "w w w w w", "B"), (4L, "w w w w w w w", "B"))
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$dir/documents.parquet")
    val r = Stats.qAnova(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
      == ((2L, 4L, 8.0, 0.8)))
  }

  test("rolling anomaly flags a spike against its trailing window, skips flat/short baselines") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_anom").toString
    val DayNs = 86400000000000L
    // days 0..6 alternate 9/11 (live variance); day 7 spikes to 100.
    // Day 6's own score (baseline days 0..5, z = -1) must NOT flag;
    // days 0..4 lack the 5-day baseline and must be skipped entirely.
    val vals = Seq(9.0, 11.0, 9.0, 11.0, 9.0, 11.0, 9.0, 100.0)
    vals.zipWithIndex.map { case (v, d) =>
      (d.toLong, d * DayNs + 1000L, 1L, "click", v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val got = Stats.qRollingAnomaly(spark, dir).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getString(0), r.getLong(1), r.getDouble(2)) == (("click", 7L, 100.0)))
    // hand-computed: n=7, s=69, ss=687 -> z = (100 - 69/7)/sqrt(687/7 - (69/7)^2)
    val mean = 69.0 / 7
    val z = (100.0 - mean) / math.sqrt(687.0 / 7 - mean * mean)
    assert(math.abs(r.getDouble(3) - math.rint(z * 1e6) / 1e6) < 1e-9)
  }

  test("q149 trimmed mean: 5% rank cut removes exactly the tails") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_trim").toString
    // 20 obs: 1..19 plus a 1000 outlier. cut = 20*5//100 = 1 -> drop rank 1
    // (value 1) and rank 20 (value 1000): trimmed = mean(2..19) = 10.5
    val rows = ((1 to 19).map(i => (i.toLong, i.toDouble)) :+ (20L, 1000.0))
      .map { case (id, v) => (id, 0L, 1L, "t", v) }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val r = Stats.qTrimmedMean(spark, dir).collect().head
    assert(r.getString(0) == "t" && r.getLong(1) == 20L)
    assert(r.getDouble(2) == (190.0 + 1000.0) / 20) // raw mean dragged to 59.5
    assert(r.getDouble(3) == 10.5)                  // trimmed mean is not
  }

  test("q159 winsorized mean: tails clamp to the boundary order statistics") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_winsor").toString
    // 20 obs: 1..19 plus a 1000 outlier. cut = 1: rank-1 value (1) clamps
    // to lo = value@rank2 = 2, rank-20 value (1000) clamps to hi =
    // value@rank19 = 19 -> winsorized sum = sum(2..19) + 2 + 19 = 210
    val rows = ((1 to 19).map(i => (i.toLong, i.toDouble)) :+ (20L, 1000.0))
      .map { case (id, v) => (id, 0L, 1L, "t", v) }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val r = Stats.qWinsorizedMean(spark, dir).collect().head
    assert(r.getString(0) == "t" && r.getLong(1) == 20L && r.getLong(2) == 1L)
    assert(r.getDouble(3) == 2.0 && r.getDouble(4) == 19.0)
    assert(r.getDouble(5) == 210.0 / 20)
  }

  test("q163 AUC: histogram identity matches the pairwise definition with ties") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_auc").toString
    // positives (en) score {3,5}, negatives {1,5}: pairs win+win+loss+tie
    // -> AUC = 2.5/4 = 0.625, Gini = 2*AUC - 1 = 0.25
    Seq((1L, "en", 3L), (2L, "en", 5L), (3L, "de", 1L), (4L, "fr", 5L))
      .toDF("doc_id", "lang", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = Stats.qAuc(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1)) == ((2L, 2L)))
    assert(r.getDouble(2) == 0.625 && r.getDouble(3) == 0.25)
  }

  test("q169 basket lift: pair counts, marginals, and lift on a tiny basket set") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_basket").toString
    // o1{1,2,3} o2{1,2} o3{1} (+ a duplicate (1,1) line that must not
    // double-count): pairs (1,2)x2, (1,3)x1, (2,3)x1; n_orders=3,
    // n_1=3, n_2=2, n_3=1 -> lifts 1.0, 1.0, 1.5
    Seq((1L, 1L), (1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L), (3L, 1L))
      .toDF("l_orderkey", "l_partkey")
      .write.parquet(s"$dir/lineitem.parquet")
    val got = graft.operators.Relational.qBasketLift(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got == Map(
      (1L, 2L) -> ((2L, 3L, 2L, 1.0)),
      (1L, 3L) -> ((1L, 3L, 1L, 1.0)),
      (2L, 3L) -> ((1L, 2L, 1L, 1.5))))
  }

  test("q151 lift: hand-computed 2x2 co-occurrence") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_lift").toString
    // u1{a,b} u2{a} u3{b} u4{a,b}: n_users=4, n_a=n_b=3, n_ab=2
    // lift = 2*4/(3*3) = 0.888889
    val rows = Seq((1L, "a"), (1L, "b"), (2L, "a"), (3L, "b"), (4L, "a"),
      (4L, "b"), (4L, "b")) // duplicate (4,b) event must not double-count
      .zipWithIndex.map { case ((u, t), i) => (i.toLong, 0L, u, t, 1.0) }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val r = Stats.qTypeAffinity(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    assert((row.getString(0), row.getString(1)) == (("a", "b")))
    assert((row.getLong(2), row.getLong(3), row.getLong(4)) == ((3L, 3L, 2L)))
    assert(row.getDouble(5) == BigDecimal(8.0 / 9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }
}
