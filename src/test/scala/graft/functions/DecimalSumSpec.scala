package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Relational.{davg, dsum}

/** [[DecSum6]] must be indistinguishable from the builtin
  * `sum(cast(x as decimal(18,6))).cast(double)` it replaced (r17): same
  * doubles bit-for-bit on every sign mix, same null/NaN coercion, same
  * empty-group NULL, and partition-count independence (the property dsum
  * exists for). The builtin is computed alongside in each test as the
  * in-test oracle.
  */
class DecimalSumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def builtin(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 6))).cast("double")

  test("bit-identical to the builtin decimal sum across sign mixes and magnitudes") {
    // deterministic pseudo-random doubles spanning magnitudes/signs,
    // including values whose 6dp rounding is a .5 tie and sums that cancel
    val rng = new scala.util.Random(421742)
    val vals = Seq.fill(5000)(
      (rng.nextDouble() - 0.5) * math.pow(10.0, rng.nextInt(10))) ++
      Seq(0.0, -0.0, 0.0000005, -0.0000005, 1.0000005, 123456789012.345678,
        -123456789012.345678, 1e-7, -1e-7)
    val df = vals.zipWithIndex.map { case (v, i) => (i % 7, v) }
      .toDF("g", "x")
    for (parts <- Seq(1, 3, 32)) {
      val r = df.repartition(parts)
        .groupBy($"g")
        .agg(dsum($"x").as("fast"), builtin($"x").as("ref"))
        .collect()
      assert(r.nonEmpty)
      r.foreach { row =>
        val (f, ref) = (row.getDouble(1), row.getDouble(2))
        assert(java.lang.Double.doubleToRawLongBits(f) ==
          java.lang.Double.doubleToRawLongBits(ref),
          s"g=${row.get(0)} parts=$parts: dsum=$f builtin=$ref")
      }
    }
  }

  test("nulls and NaN/Infinity coerce exactly like the builtin (non-ANSI cast → NULL, skipped)") {
    val df = Seq[(Int, java.lang.Double)](
      (0, 1.5), (0, null), (0, Double.NaN), (0, Double.PositiveInfinity),
      (1, null), (1, Double.NaN), // all-null group → NULL sum
      (2, -2.25), (2, Double.NegativeInfinity))
      .toDF("g", "x")
    val r = df.groupBy($"g")
      .agg(dsum($"x").as("fast"), builtin($"x").as("ref"))
      .orderBy($"g").collect()
    r.foreach { row =>
      assert(row.isNullAt(1) == row.isNullAt(2), s"null mismatch: $row")
      if (!row.isNullAt(1))
        assert(row.getDouble(1) == row.getDouble(2), row.toString)
    }
    assert(r(1).isNullAt(1), "all-null group must sum to NULL")
  }

  test("empty input sums to NULL, count survives beside it") {
    val r = spark.range(0).selectExpr("cast(id as double) x")
      .agg(dsum($"x").as("s"), count(lit(1)).as("n")).collect()(0)
    assert(r.isNullAt(0) && r.getLong(1) == 0L)
  }

  test("carry normalization: per-row and merge-side carries reassemble exactly") {
    // values just under the carry base so lo wraps on nearly every update
    // (999999.999999 unscaled = 999999999999 ≈ base·10³), mixed signs so t
    // crosses zero, across many partitions so merge carries fire too
    val df = (1 to 4096).map(i =>
      (i % 3, if (i % 2 == 0) 999999.999999 else -999999.999998))
      .toDF("g", "x").repartition(32)
    val r = df.groupBy($"g").agg(dsum($"x").as("fast"), builtin($"x").as("ref"))
      .collect()
    r.foreach { row =>
      assert(java.lang.Double.doubleToRawLongBits(row.getDouble(1)) ==
        java.lang.Double.doubleToRawLongBits(row.getDouble(2)), row.toString)
    }
  }

  test("davg rides dsum unchanged") {
    val df = Seq((0, 1.1), (0, 2.3), (0, -0.7)).toDF("g", "x")
    val r = df.groupBy($"g").agg(davg($"x").as("a"),
      (builtin($"x") / count($"x")).as("ref")).collect()(0)
    assert(r.getDouble(1) == r.getDouble(2))
  }

  test("hi-slot overflow forces NULL instead of wrapping (r18 guard, both boundary sides)") {
    // Reaching real wrap through data needs ~9.2e9 max-value rows, so the
    // boundary is pinned at the expression level: bind the merge
    // expressions to (buffer ++ inputBuffer) rows with hi near
    // Long.MaxValue and check the ovf slot and the evaluate path directly
    // — the same Catalyst evaluation the codegen'd aggregate performs.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference => AR, BindReferences, Literal => L}
    import org.apache.spark.sql.types.{DecimalType => DT}
    val agg = DecSum6(AR("x", DT(18, 6))())
    val schema = agg.aggBufferAttributes ++ agg.inputAggBufferAttributes
    val merged = agg.mergeExpressions.map(BindReferences.bindReference(_, schema))
    def merge(hi1: Long, hi2: Long, lo1: Long = 0L, lo2: Long = 0L) = {
      val row = InternalRow(hi1, lo1, false, false, hi2, lo2, false, false)
      merged.map(_.eval(row))
    }
    val big = Long.MaxValue / 2 + 1
    // wraps: both halves past the midpoint
    assert(merge(big, big)(3) == true)
    // wraps via the lo-merge carry: hi at max, carry +1 from lo sums
    assert(merge(Long.MaxValue, 0L, 999999999L, 1L)(3) == true)
    // does not wrap: same magnitudes, opposite signs
    assert(merge(big, -big)(3) == false)
    assert(merge(Long.MaxValue, -1L, 999999999L, 1L)(3) == false)
    // ovf is sticky through merge even when this merge is clean
    val sticky = InternalRow(1L, 0L, false, true, 2L, 0L, false, false)
    assert(merged(3).eval(sticky) == true)
    // evaluate: ovf → NULL, clean → finite
    val eval = BindReferences.bindReference(
      agg.evaluateExpression, agg.aggBufferAttributes)
    assert(eval.eval(InternalRow(1L, 5L, false, true)) == null)
    assert(eval.eval(InternalRow(1L, 5L, false, false)) != null)
    // and the update path sets it when hi + d wraps
    val bound = agg.updateExpressions.map(BindReferences.bindReference(
      _, agg.aggBufferAttributes ++ Seq(agg.child.asInstanceOf[AR])))
    val maxDec = org.apache.spark.sql.types.Decimal("999999999999.999999")
    maxDec.changePrecision(18, 6)
    val nearMax = InternalRow(Long.MaxValue - 100L, 0L, false, false, maxDec)
    assert(bound(3).eval(nearMax) == true, "update past hi max must flag ovf")
    val farFromMax = InternalRow(0L, 0L, false, false, maxDec)
    assert(bound(3).eval(farFromMax) == false)
  }

  test("the aggregate plans on the fast hash-agg path (primitive buffer, codegen)") {
    val df = spark.range(1000).selectExpr("id % 5 g", "cast(id as double) x")
      .groupBy($"g").agg(dsum($"x").as("s"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("ObjectHashAggregate") && !plan.contains("SortAggregate"), plan)
    assert(plan.contains("dec_sum6"), plan)
  }
}
