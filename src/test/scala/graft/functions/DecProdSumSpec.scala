package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[DecProdSum]] must be indistinguishable from the builtin
  * `sum(cast(a as dec(18,6)) * cast(b as dec(18,6))).cast(double)` it
  * replaces inside its documented domain: same doubles bit-for-bit on
  * every sign mix, same one-sided/both-null handling, same empty-group
  * NULL, and partition-count independence. The builtin runs alongside as
  * the in-test oracle.
  */
class DecProdSumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dec = DecimalType(18, 6)
  private def fast(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    DecProdSum.column(a.cast(dec), b.cast(dec)).cast("double")
  private def ref(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    sum(a.cast(dec) * b.cast(dec)).cast("double")

  test("bit-identical to the builtin product sum across signs, magnitudes, partitionings") {
    val rng = new scala.util.Random(862042)
    val rows = Seq.fill(5000)((
      rng.nextInt(7),
      (rng.nextDouble() - 0.5) * math.pow(10.0, rng.nextInt(9)),
      (rng.nextDouble() - 0.5) * math.pow(10.0, rng.nextInt(9)))) ++
      Seq((0, 0.0, 1.0), (1, -0.0, 5.5), (2, 0.0000005, -0.0000005),
        (3, 999999.999999, 999999.999999), (4, -999999.999999, 999999.999999),
        (5, 1e-6, 1e-6), (6, 123456.789012, -0.000001))
    val df = rows.toDF("g", "a", "b")
    for (parts <- Seq(1, 3, 32)) {
      val r = df.repartition(parts).groupBy($"g")
        .agg(fast($"a", $"b").as("fast"), ref($"a", $"b").as("ref"))
        .collect()
      assert(r.nonEmpty)
      r.foreach { row =>
        val (f, e) = (row.getDouble(1), row.getDouble(2))
        assert(java.lang.Double.doubleToRawLongBits(f) ==
          java.lang.Double.doubleToRawLongBits(e),
          s"group ${row.get(0)} at $parts parts: fast $f != ref $e")
      }
    }
  }

  test("null semantics: one-sided and both-null rows are no-ops; all-null group is NULL") {
    val df = Seq[(Int, Option[Double], Option[Double])](
      (0, Some(2.5), Some(4.0)), (0, None, Some(9.0)), (0, Some(7.0), None),
      (0, None, None),
      (1, None, Some(3.0)), (1, Some(3.0), None), (1, None, None))
      .toDF("g", "a", "b")
    val r = df.groupBy($"g")
      .agg(fast($"a", $"b").as("fast"), ref($"a", $"b").as("ref"))
      .orderBy($"g").collect()
    assert(!r(0).isNullAt(1) && r(0).getDouble(1) == 10.0 && r(0).getDouble(2) == 10.0)
    assert(r(1).isNullAt(1) && r(1).isNullAt(2), "all products null must yield NULL")
  }

  test("empty input yields NULL, matching the builtin") {
    val df = Seq((1, 1.0, 1.0)).toDF("g", "a", "b").where($"g" === 99)
    val r = df.agg(fast($"a", $"b").as("fast"), ref($"a", $"b").as("ref")).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("per-row limb domain guard: |value| past ~2.1e9 nulls instead of wrapping") {
    // 3e9 * 3e9 = 9e18 fits a long as a VALUE but its limb h = 3e9*1e6/1e6
    // = 3e9 exceeds 2^31, so h*h would wrap inside the row — the guard
    // must return NULL (builtin returns the finite product; divergence is
    // the documented safe-direction NULL)
    val df = Seq((0, 3.0e9, 3.0e9)).toDF("g", "a", "b")
    val r = df.groupBy($"g").agg(fast($"a", $"b").as("fast")).collect()(0)
    assert(r.isNullAt(1), "out-of-domain row must be NULL, never a wrapped value")
  }

  test("q86 path: DecProdSum spelling matches the retired builtin spelling row-for-row") {
    val sf = "/root/testdata/sf0.001"
    val x = col("l_quantity").cast(dec)
    val y = col("l_extendedprice").cast(dec)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val got = li.groupBy($"l_returnflag").agg(
      DecProdSum.column(x, x).cast("double").as("sxx"),
      DecProdSum.column(y, y).cast("double").as("syy"),
      DecProdSum.column(x, y).cast("double").as("sxy"))
    val exp = li.groupBy($"l_returnflag").agg(
      sum(x * x).cast("double").as("sxx"),
      sum(y * y).cast("double").as("syy"),
      sum(x * y).cast("double").as("sxy"))
    assert(got.exceptAll(exp).count() == 0 && exp.exceptAll(got).count() == 0)
  }
}
