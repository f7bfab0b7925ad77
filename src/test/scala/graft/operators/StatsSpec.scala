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
}
