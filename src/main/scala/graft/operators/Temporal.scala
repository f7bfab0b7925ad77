package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Temporal joins — the two canonical operators an event lake needs that
  * plain equi-joins can't express:
  *
  *  - RANGE join: pairs on an equality key within a time band. Spark
  *    executes equi-key + range-predicate as a single shuffle on the key
  *    with the band as a join filter — per-key density bounds the output,
  *    never a cartesian.
  *  - AS-OF join: each probe row matched to the latest build row at or
  *    before it. Implemented as the UNION + forward-fill window — one
  *    shuffle on the key, state bounded per key, NO join explosion — the
  *    shape that survives 100 TB event volumes (an equi-join + max-per-key
  *    re-join touches every candidate pair; this touches each row once).
  *
  * Time axis: epoch NANOS as long on both engines (events.ts is already
  * nanos-as-long, see graft.Session; order timestamps convert via
  * unix_micros * 1000) so no engine timestamp precision leaks into the
  * oracle comparison.
  */
object Temporal {

  private val BandNs = 300L * 1000 * 1000 * 1000 // 5 minutes

  /** Per-user event pairs within 5 minutes (strictly later), rolled up to
    * ordered type-pair counts.
    */
  def qRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "events").select("user_id", "ts", "event_type")
    val a = e.toDF("user_id", "ts_a", "type_a")
    val b = e.toDF("user_id_b", "ts_b", "type_b")
    a.join(b,
        col("user_id") === col("user_id_b") &&
          col("ts_b") > col("ts_a") && col("ts_b") - col("ts_a") <= BandNs)
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  val qRangeJoinSql: String =
    s"""SELECT a.event_type AS type_a, b.event_type AS type_b,
       |  COUNT(*) AS n_pairs
       |FROM events a JOIN events b
       |  ON a.user_id = b.user_id
       | AND epoch_ns(b.ts) > epoch_ns(a.ts)
       | AND epoch_ns(b.ts) - epoch_ns(a.ts) <= $BandNs
       |GROUP BY 1, 2""".stripMargin

  /** For every event, the priority of the user's latest ORDER at or before
    * the event time ('none' when the user has no prior orders) — the
    * classic "dimension state as of the event" enrichment — rolled up to
    * counts. Union + forward-fill: orders and events interleave on one
    * per-key timeline; `last(ignoreNulls)` carries the most recent order
    * attribute forward to each event row.
    */
  /** Generic as-of core: probe rows (k, t_ns) each enriched with the
    * `attr` of the latest build row (k, t_ns, attr) at or before it
    * (null when none). Same-instant build rows are visible to the probe;
    * equal-time builds tiebreak on attr for a deterministic total order.
    */
  def asofLatest(build: DataFrame, probe: DataFrame): DataFrame = {
    val b = build.select(col("k"), col("t_ns"), col("attr"), lit(0).as("is_probe"))
    val p = probe.select(col("k"), col("t_ns"),
      lit(null).cast("string").as("attr"), lit(1).as("is_probe"))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t_ns").asc, col("is_probe").asc, col("attr").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.unionByName(p)
      .withColumn("last_attr", last(col("attr"), ignoreNulls = true).over(w))
      .where(col("is_probe") === 1)
      .select(col("k"), col("t_ns"), col("last_attr"))
  }

  def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
      .select(col("o_custkey").as("k"),
        // o_orderdate is TIMESTAMP_NTZ; the session tz is UTC, so the cast
        // maps wall-clock to the same instant DuckDB's epoch_us computes
        (unix_micros(col("o_orderdate").cast("timestamp")) * 1000).as("t_ns"),
        col("o_orderpriority").as("attr"))
    val e = Tables.load(s, dir, "events")
      .select(col("user_id").as("k"), col("ts").as("t_ns"))
    asofLatest(o, e)
      .groupBy(coalesce(col("last_attr"), lit("none")).as("last_order_priority"))
      .agg(count(lit(1)).as("n_events"))
  }

  val qAsofJoinSql: String =
    """WITH u AS (
      |  SELECT o_custkey AS k, epoch_us(o_orderdate) * 1000 AS t_ns,
      |    o_orderpriority AS attr, 0 AS is_probe
      |  FROM orders
      |  UNION ALL
      |  SELECT user_id, epoch_ns(ts), NULL, 1 FROM events),
      |f AS (
      |  SELECT *, last_value(attr IGNORE NULLS) OVER (
      |      PARTITION BY k ORDER BY t_ns, is_probe, attr
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_attr
      |  FROM u)
      |SELECT COALESCE(last_attr, 'none') AS last_order_priority,
      |  COUNT(*) AS n_events
      |FROM f WHERE is_probe = 1 GROUP BY 1""".stripMargin

  /** SCD2 compaction: a change stream (k, t_ns, seq, attr) → the
    * slowly-changing-dimension type-2 history: one row per RUN of equal
    * consecutive attr values per key, with [valid_from_ns, valid_to_ns)
    * validity (open row: null valid_to). Gaps-and-islands over one shuffle
    * on the key; `seq` breaks same-instant ties deterministically.
    */
  def scd2FromChanges(changes: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("k")).orderBy(col("t_ns").asc, col("seq").asc)
    val runs = changes
      .withColumn("chg",
        when(lag(col("attr"), 1).over(w).isNull ||
          lag(col("attr"), 1).over(w) =!= col("attr"), 1).otherwise(0))
      .withColumn("run_id", sum(col("chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("k"), col("run_id"))
      .agg(first(col("attr")).as("attr"), min(col("t_ns")).as("valid_from_ns"))
    // order successor lookup by run_id, not valid_from: same-instant runs
    // (tie split by seq) share a valid_from and would make lead ambiguous
    val wr = Window.partitionBy(col("k")).orderBy(col("run_id").asc)
    runs
      .withColumn("valid_to_ns", lead(col("valid_from_ns"), 1).over(wr))
      .select(col("k"), col("attr"), col("valid_from_ns"), col("valid_to_ns"))
  }

  /** SCD2 history of each customer's order priority (custkey < 100), built
    * from the order change stream.
    */
  def qScd2History(s: SparkSession, dir: String): DataFrame = {
    val changes = Tables.load(s, dir, "orders")
      .where(col("o_custkey") < 100)
      .select(col("o_custkey").as("k"),
        (unix_micros(col("o_orderdate").cast("timestamp")) * 1000).as("t_ns"),
        col("o_orderkey").as("seq"), col("o_orderpriority").as("attr"))
    scd2FromChanges(changes)
  }

  val qScd2HistorySql: String =
    """WITH c AS (
      |  SELECT o_custkey AS k, epoch_us(o_orderdate) * 1000 AS t_ns,
      |    o_orderkey AS seq, o_orderpriority AS attr
      |  FROM orders WHERE o_custkey < 100),
      |m AS (
      |  SELECT *, CASE WHEN lag(attr) OVER w IS NULL
      |                   OR lag(attr) OVER w <> attr THEN 1 ELSE 0 END AS chg
      |  FROM c WINDOW w AS (PARTITION BY k ORDER BY t_ns, seq)),
      |r AS (
      |  SELECT *, SUM(chg) OVER (PARTITION BY k ORDER BY t_ns, seq
      |    ROWS UNBOUNDED PRECEDING) AS run_id
      |  FROM m),
      |runs AS (
      |  SELECT k, run_id, MIN(t_ns) AS valid_from_ns,
      |    ANY_VALUE(attr) AS attr
      |  FROM r GROUP BY k, run_id)
      |SELECT k, attr, valid_from_ns,
      |  lead(valid_from_ns) OVER (PARTITION BY k ORDER BY run_id)
      |    AS valid_to_ns
      |FROM runs""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q57_range_join" -> (qRangeJoin _),
    "q58_asof_join" -> (qAsofJoin _),
    "q74_scd2_history" -> (qScd2History _))

  val oracle: Map[String, String] = Map(
    "q57_range_join" -> qRangeJoinSql,
    "q58_asof_join" -> qAsofJoinSql,
    "q74_scd2_history" -> qScd2HistorySql)
}
