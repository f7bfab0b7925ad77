package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Core relational aggregation operators (SURVEY.md §2.4 A1–A5) expressed
  * over the synthetic TPC-H-ish tables.
  *
  * Determinism note: double summation order varies across partitions, so
  * every SUM/AVG over a double column goes through an exact decimal
  * accumulation and is cast back to double ([[Relational.dsum]]). Results are
  * bit-identical run-to-run and hash-comparable against the DuckDB oracle at
  * any partition count — the property survives a 1000-executor scale-up.
  */
object Relational {

  /** Order-insensitive exact sum of a double column: accumulate as
    * decimal(28,6), return double. Oracle side:
    * `CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE)`.
    */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(28, 6))).cast("double")

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** A1/A4: multi-key hash aggregate with SUM/MAX/COUNT (pricing-summary
    * shape; reference sql/gold/01_gold_draw_summary.sql:33-50 computes the
    * same COUNT/SUM/MAX family per draw).
    */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        count(lit(1)).as("n_rows"),
        max(col("l_quantity")).as("max_qty"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS n_rows,
      |  MAX(l_quantity) AS max_qty
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
