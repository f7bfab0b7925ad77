package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import Relational.{dsum, dsumSql, davg, davgSql}

/** The reference's notebook analytics surface (SURVEY.md §2.4 A7–A15, §2.5 W,
  * §2.6 F, §2.7 U, §2.8 C) as named queries over the synthetic tables.
  *
  * Every query is a single declarative DataFrame chain — no driver-side
  * collects; top-k always carries a unique tiebreaker so the LIMIT membership
  * is deterministic and oracle-comparable.
  */
object Analytics {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** W1: top-k after group-count (reference EDA_premios.ipynb cell 35
    * `value_counts().head(10)`). Tiebreak on the key so the limit set is
    * deterministic. Physical plan: partial+final HashAggregate then
    * TakeOrderedAndProject — no full sort at scale.
    */
  def qTopk(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("l_partkey").asc)
      .limit(10)

  val qTopkSql: String =
    """SELECT l_partkey, COUNT(*) AS cnt FROM lineitem
      |GROUP BY l_partkey ORDER BY cnt DESC, l_partkey ASC LIMIT 10""".stripMargin

  /** A7: value_counts desc (reference EDA_premios.ipynb cells 35/37). */
  def qValueCounts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("event_type"))

  val qValueCountsSql: String =
    """SELECT event_type, COUNT(*) AS cnt FROM events
      |GROUP BY event_type ORDER BY cnt DESC, event_type""".stripMargin

  /** A8: group-count + HAVING post-filter (reference
    * visualization_sorteos_premios.ipynb cell 9).
    */
  def qHaving(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > 600)

  val qHavingSql: String =
    """SELECT l_suppkey, COUNT(*) AS cnt FROM lineitem
      |GROUP BY l_suppkey HAVING COUNT(*) > 600""".stripMargin

  /** A9: countDistinct per group (reference EDA_premios.ipynb cell 44,
    * sellers per departamento).
    */
  def qNuniquePerGroup(s: SparkSession, dir: String): DataFrame = {
    // r20 two-branch rewrite (after the widenScan A/B was rejected —
    // the cost was never scan parallelism but the multi-distinct Expand:
    // one 4-col(+gid) distinct partial aggregate over 2× the rows, 5–7 s
    // summed CPU). Each COUNT(DISTINCT x) becomes its own narrow 2-col
    // dedup + count — map-side dedup actually bites on the narrower keys
    // and the Expand never exists; the two ~|suppkey|-row branch results
    // join at the end. A/B same window at sf0.1: 1.14–1.15 → 0.70 s
    // (R20Probe3, exceptAll = 0 both directions). Exactness precondition:
    // lineitem's keys are non-null (TPC-H NOT NULL) — countDistinct
    // skips nulls, so the isNotNull filters make the branch dedup
    // null-identical; a supplier with rows appears in both branches.
    val l = t(s, dir, "lineitem")
    val np = l.where(col("l_partkey").isNotNull)
      .select(col("l_suppkey"), col("l_partkey")).distinct()
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n_parts"))
    val no = l.where(col("l_orderkey").isNotNull)
      .select(col("l_suppkey"), col("l_orderkey")).distinct()
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n_orders"))
    np.join(no, Seq("l_suppkey"))
  }

  /** The retired multi-distinct Expand q12 spelling — r20 A/B ledger. */
  def qNuniquePerGroupExpand(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_suppkey"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_orderkey")).as("n_orders"))

  val qNuniquePerGroupSql: String =
    """SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS n_parts,
      |  COUNT(DISTINCT l_orderkey) AS n_orders
      |FROM lineitem GROUP BY l_suppkey""".stripMargin

  /** A10 + U4: collect_set per group then explode back out (reference
    * EDA_premios.ipynb cells 39-41: unique cities per vendor, then
    * `.explode()`). The round-trip is semantically DISTINCT pairs.
    */
  def qCollectSetExplode(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .groupBy(col("c_nationkey"))
      .agg(collect_set(col("c_mktsegment")).as("segments"))
      .select(col("c_nationkey"), explode(col("segments")).as("c_mktsegment"))

  val qCollectSetExplodeSql: String =
    "SELECT DISTINCT c_nationkey, c_mktsegment FROM customer"

  /** J3: semi-join against a derived top-k key set (reference
    * EDA_premios.ipynb cell 39 `isin(top_10_sellers)`). The top-k side is
    * tiny and broadcast; the fact side never shuffles for the semi-join.
    */
  def qSemiJoin(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem")
    val top = l.groupBy(col("l_suppkey")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("l_suppkey").asc).limit(5)
      .select(col("l_suppkey"))
    l.join(broadcast(top), Seq("l_suppkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"), dsum(col("l_extendedprice")).as("sum_price"))
  }

  val qSemiJoinSql: String =
    s"""WITH top AS (
       |  SELECT l_suppkey FROM lineitem GROUP BY l_suppkey
       |  ORDER BY COUNT(*) DESC, l_suppkey ASC LIMIT 5)
       |SELECT l_returnflag, COUNT(*) AS n_rows,
       |  ${dsumSql("l_extendedprice")} AS sum_price
       |FROM lineitem WHERE l_suppkey IN (SELECT l_suppkey FROM top)
       |GROUP BY l_returnflag""".stripMargin

  /** J2/U3: anti-join dataset diff (reference processed_vs_downloaded.ipynb
    * cells 9-13: outer merge + right_only filter = rows in A missing from B).
    */
  def qAntiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").where(col("o_orderstatus") === "F")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers_without_f_orders"))
  }

  val qAntiJoinSql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_customers_without_f_orders
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
      |GROUP BY c_mktsegment""".stripMargin

  /** U3: EXCEPT set difference on projected keys (orders with no returned
    * line item). No pre-distinct on either side: EXCEPT semantics dedupe
    * the left side already (Spark compiles it to aggregate-over-anti-join),
    * so a `.distinct()` here would pay a full extra exchange of every key
    * for nothing (r15 — it did, one of the two remaining floor-class rows).
    */
  def qExcept(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(col("o_orderkey").as("okey"))
      .except(t(s, dir, "lineitem").where(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("okey")))

  val qExceptSql: String =
    """SELECT DISTINCT o_orderkey AS okey FROM orders
      |EXCEPT SELECT DISTINCT l_orderkey AS okey FROM lineitem
      |WHERE l_returnflag = 'R'""".stripMargin

  /** U1: UNION ALL of columns pooled into one series (reference
    * EDA_sorteos.ipynb cell 12: three reintegro columns concatenated), then
    * distribution count.
    */
  def qUnionCols(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem")
    l.select((col("l_orderkey") % 10).as("digit"))
      .unionAll(l.select((col("l_partkey") % 10).as("digit")))
      .unionAll(l.select((col("l_suppkey") % 10).as("digit")))
      .groupBy(col("digit")).agg(count(lit(1)).as("cnt"))
  }

  val qUnionColsSql: String =
    """SELECT digit, COUNT(*) AS cnt FROM (
      |  SELECT l_orderkey % 10 AS digit FROM lineitem
      |  UNION ALL SELECT l_partkey % 10 FROM lineitem
      |  UNION ALL SELECT l_suppkey % 10 FROM lineitem)
      |GROUP BY digit""".stripMargin

  /** Exact percentiles as a 1-row DataFrame (columns q0..qK-1), computed
    * DISTRIBUTED: hash-aggregate to (value, count) — shuffle with map-side
    * combine, memory bounded by DISTINCT cardinality rather than row count
    * (the built-in `percentile`'s per-partition buffer holds every row —
    * the r2/r3-flagged executor-memory hazard) — then a cumulative sum over
    * the sorted distinct values and Spark's own interpolation arithmetic
    * ((higher-pos)*lower + (pos-lower)*higher). The single-partition window
    * spans only the distinct values; columns with unbounded cardinality at
    * 100 TB should use [[approxQuantiles]] instead.
    */
  def exactQuantiles(df: DataFrame, valueCol: String, probs: Seq[Double]): DataFrame = {
    val vc = df.where(col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("v")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(Window.orderBy(col("v"))))
    val n = df.where(col(valueCol).isNotNull).agg(count(lit(1)).as("n"))
    val aggs = probs.zipWithIndex.flatMap { case (p, i) =>
      val pos = lit(p) * (col("n") - 1).cast("double")
      Seq(
        max(pos).as(s"pos$i"),
        min(when(col("cum") >= floor(pos) + 1, col("v"))).as(s"lo$i"),
        min(when(col("cum") >= ceil(pos) + 1, col("v"))).as(s"hi$i"))
    }
    val qs = probs.indices.map { i =>
      val (pos, lo, hi) = (col(s"pos$i"), col(s"lo$i"), col(s"hi$i"))
      when(floor(pos) === ceil(pos), lo)
        .otherwise((ceil(pos) - pos) * lo + (pos - floor(pos)) * hi)
        .as(s"q$i")
    }
    vc.crossJoin(broadcast(n)).agg(aggs.head, aggs.tail: _*).select(qs: _*)
  }

  /** Exact percentiles for HIGH-cardinality columns (near-unique values,
    * where [[exactQuantiles]]'s distinct-value window degenerates to a
    * single-partition sort): classic distributed selection. Range-partition
    * + sort-within-partitions (fully parallel), count rows per partition
    * (a #partitions-sized metadata collect, not data), convert the target
    * global ranks to (partition, local offset), and extract just those
    * rows. Interpolation applies the identical IEEE arithmetic as
    * [[exactQuantiles]]/builtin percentile, so results stay bit-equal.
    * Every pass is partition-parallel — this is the exact-quantile shape
    * that holds at 100 TB.
    */
  def exactQuantilesBySort(df: DataFrame, valueCol: String, probs: Seq[Double],
      partitions: Int = 32): DataFrame = {
    val spark = df.sparkSession
    val vals = df.select(col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull)
      .repartitionByRange(partitions, col("v"))
      .sortWithinPartitions("v")
    val rdd = vals.queryExecution.toRdd.map(_.getDouble(0))
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val counts = rdd.mapPartitionsWithIndex((i, it) => Iterator(i -> {
        var c = 0L; while (it.hasNext) { it.next(); c += 1 }; c
      })).collect().sortBy(_._1).map(_._2)
      val n = counts.sum
      val out =
        if (n == 0) probs.indices.map(_ => lit(null).cast("double"))
        else {
          val offsets = counts.scanLeft(0L)(_ + _) // start rank per partition
          val wanted = probs.flatMap { p =>
            val pos = p * (n - 1)
            Seq(math.floor(pos).toLong, math.ceil(pos).toLong)
          }.distinct
          val byPart = wanted.groupBy { r =>
            // last partition whose start rank is <= r
            offsets.lastIndexWhere(_ <= r, offsets.length - 2)
          }
          val bc = spark.sparkContext.broadcast(byPart.map { case (p, rs) =>
            p -> rs.map(_ - offsets(p)).sorted
          })
          val found = rdd.mapPartitionsWithIndex { (i, it) =>
            val locals = bc.value.getOrElse(i, Nil)
            val want = locals.iterator.buffered
            var idx = 0L
            val res = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
            while (it.hasNext && want.hasNext) {
              val v = it.next()
              while (want.hasNext && want.head == idx) res += ((want.next(), v))
              idx += 1
            }
            res.iterator.map { case (local, v) => (local, v, i) }
          }.collect().map { case (local, v, p) =>
            (local + offsets(p), v)
          }.toMap
          probs.map { p =>
            val pos = p * (n - 1)
            val (lo, hi) = (found(math.floor(pos).toLong), found(math.ceil(pos).toLong))
            val q = if (math.floor(pos) == math.ceil(pos)) lo
              else (math.ceil(pos) - pos) * lo + (pos - math.floor(pos)) * hi
            lit(q)
          }
        }
      vals.sparkSession.range(1).select(
        out.zipWithIndex.map { case (c, i) => c.as(s"q$i") }: _*)
    } finally rdd.unpersist(blocking = false)
  }

  /** Exact percentiles via histogram-refinement selection — the
    * shuffle-free alternative to [[exactQuantilesBySort]] for numeric
    * columns. Pass 1 scans the pruned single-column input for
    * count/min/max; pass 2 builds a fixed-width histogram as a hash
    * aggregate over ≤ `bins` keys (map-side combine ⇒ the exchange carries
    * `bins` rows per map task, never data). The driver maps each target
    * rank to its bin (a `bins`-sized metadata collect, same class as the
    * per-partition counts in [[exactQuantilesBySort]]) and only the
    * rank-carrying bins — expected n/bins rows — are collected and refined,
    * ALL in one batched job per level (r14: rows carry their region
    * ordinal via a disjoint when-chain, so nine decile boundaries cost
    * the same two jobs a single median does, not a job per bin).
    * A bin still over `collectBudget` rows (mass piled on a narrow range)
    * recurses with the same binning inside the bin's observed [min, max]:
    * depth is log_bins(n/collectBudget), so 10^12 rows resolve in ≤3
    * histogram passes with no range shuffle or sort anywhere. A bin whose
    * min == max is constant and resolves immediately, which also bounds
    * duplicate-heavy distributions. Rank extraction is exact order
    * statistics and the interpolation applies the identical IEEE
    * arithmetic as [[exactQuantilesBySort]]/builtin percentile, so results
    * stay bit-equal.
    */
  def exactQuantilesByHistogram(df: DataFrame, valueCol: String, probs: Seq[Double],
      bins: Int = 8192, collectBudget: Int = 1 << 18): DataFrame = {
    val vals = df.select(col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull)
    vals.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val head = vals.agg(count(lit(1)).as("n"), min(col("v")).as("mn"),
        max(col("v")).as("mx")).head()
      val n = head.getLong(0)
      val out: Seq[org.apache.spark.sql.Column] =
        if (n == 0) probs.indices.map(_ => lit(null).cast("double"))
        else {
          // Resolve each wanted 0-based global rank to its exact value by
          // narrowing (predicate, lo, hi, region ranks) regions — BATCHED
          // per level (r14): every active region at a depth shares ONE
          // histogram job and every collect-sized region shares ONE leaf
          // job, the rows tagged with their region ordinal by a disjoint
          // when-chain. The r13 shape paid one driver-coordinated job per
          // rank-carrying bin, which made the 9-boundary decile query
          // (q177) an ~18-job chain of scheduler floors; now a level
          // costs ≤2 jobs however many boundaries refine.
          case class Region(pred: org.apache.spark.sql.Column, lo: Double,
            hi: Double, cnt: Long, ranks: Seq[(Long, Long)]) // (global, local)
          def tagOf(rs: Seq[Region]): org.apache.spark.sql.Column =
            rs.zipWithIndex.tail
              .foldLeft(when(rs.head.pred, 0)) { case (acc, (r, i)) =>
                acc.when(r.pred, i) }
              .otherwise(-1)
          var found = Map.empty[Long, Double]
          val wanted = probs.flatMap { p =>
            val pos = p * (n - 1)
            Seq(math.floor(pos).toLong, math.ceil(pos).toLong)
          }.distinct.sorted
          var regions = List(Region(lit(true), head.getDouble(1),
            head.getDouble(2), n, wanted.map(r => (r, r))))
          var depth = 0
          while (regions.nonEmpty) {
            // a constant region (all values equal) resolves driver-side
            val (const, rest) = regions.partition(r => r.lo == r.hi)
            const.foreach(r => r.ranks.foreach { case (g, _) =>
              found += g -> r.lo })
            // depth 6 = bins^6 ≈ 10^23 splits; only adversarial fp
            // distributions reach it — collect then, loudly bounded.
            val (small, large) =
              rest.partition(r => r.cnt <= collectBudget || depth >= 6)
            if (small.nonEmpty) {
              val byTag = vals
                .select(tagOf(small).as("t"), col("v"))
                .where(col("t") >= 0)
                .collect().map(r => (r.getInt(0), r.getDouble(1)))
                .groupBy(_._1)
              small.zipWithIndex.foreach { case (r, i) =>
                val sorted = byTag.getOrElse(i, Array.empty).map(_._2).sorted
                r.ranks.foreach { case (g, l) => found += g -> sorted(l.toInt) }
              }
            }
            regions = if (large.isEmpty) Nil else {
              // one batched histogram over all still-large regions: each
              // row computes its own region's fixed-width bin index
              def idxIn(r: Region) = {
                val w = (r.hi - r.lo) / bins
                greatest(lit(0), least(lit(bins - 1),
                  floor((col("v") - lit(r.lo)) / lit(w)).cast("int")))
              }
              val binCol = large.zipWithIndex.tail
                .foldLeft(when(large.head.pred, idxIn(large.head))) {
                  case (acc, (r, i)) => acc.when(r.pred, idxIn(r)) }
                .otherwise(-1)
              val hist = vals
                .select(tagOf(large).as("t"), binCol.as("b"), col("v"))
                .where(col("t") >= 0)
                .groupBy(col("t"), col("b"))
                .agg(count(lit(1)).as("c"), min(col("v")).as("bmn"),
                  max(col("v")).as("bmx"))
                .collect()
                .map(r => (r.getInt(0), r.getInt(1),
                  (r.getLong(2), r.getDouble(3), r.getDouble(4))))
              large.zipWithIndex.flatMap { case (r, i) =>
                val hs = hist.collect { case (t, b, v) if t == i => (b, v) }
                  .sortBy(_._1)
                val starts = hs.scanLeft(0L)(_ + _._2._1)
                val byBin = r.ranks.groupBy { case (_, l) =>
                  starts.lastIndexWhere(_ <= l, starts.length - 2)
                }
                byBin.toSeq.map { case (bi, rs) =>
                  val (b, (c, bmn, bmx)) = hs(bi)
                  Region(r.pred && idxIn(r) === lit(b), bmn, bmx, c,
                    rs.map { case (g, l) => (g, l - starts(bi)) })
                }
              }.toList
            }
            depth += 1
          }
          probs.map { p =>
            val pos = p * (n - 1)
            val (lo, hi) = (found(math.floor(pos).toLong), found(math.ceil(pos).toLong))
            val q = if (math.floor(pos) == math.ceil(pos)) lo
              else (math.ceil(pos) - pos) * lo + (pos - math.floor(pos)) * hi
            lit(q)
          }
        }
      vals.sparkSession.range(1).select(
        out.zipWithIndex.map { case (c, i) => c.as(s"q$i") }: _*)
    } finally vals.unpersist(blocking = false)
  }

  /** The 100 TB quantile path: approx_percentile (mergeable sketch, bounded
    * memory per partition, one pass, no global sort). Same 1-row q0..qK-1
    * shape as [[exactQuantiles]].
    */
  def approxQuantiles(df: DataFrame, valueCol: String, probs: Seq[Double],
      accuracy: Int = 10000): DataFrame =
    df.agg(expr(
      s"approx_percentile($valueCol, array(${probs.mkString(", ")}), $accuracy)").as("qs"))
      .select(probs.indices.map(i => expr(s"qs[$i]").as(s"q$i")): _*)

  /** A12 + F3: exact quartiles and the IQR band (reference EDA_premios.ipynb
    * cells 22/30: quantile(0.25/0.75) then a between filter). The quartile
    * row is a 1-row broadcast crossed onto the fact scan — no collect.
    */
  def qQuantileIqr(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem")
    // l_extendedprice is near-unique (583k distinct / 600k rows at sf0.1):
    // histogram-refinement selection — no range shuffle, no sort; the
    // sort-based spelling bit-matches it (QuantileSpec) and remains the
    // fallback for adversarial fp distributions.
    val q = exactQuantilesByHistogram(l, "l_extendedprice", Seq(0.25, 0.75))
      .select(col("q0").as("q1"), col("q1").as("q3"))
    l.crossJoin(broadcast(q))
      .where(col("l_extendedprice").between(col("q1"), col("q3")))
      .agg(count(lit(1)).as("n_in_band"), dsum(col("l_extendedprice")).as("sum_in_band"),
        min(col("q1")).as("q1"), min(col("q3")).as("q3"))
  }

  val qQuantileIqrSql: String =
    s"""WITH q AS (SELECT
       |    percentile_cont(0.25) WITHIN GROUP (ORDER BY l_extendedprice) AS q1,
       |    percentile_cont(0.75) WITHIN GROUP (ORDER BY l_extendedprice) AS q3
       |  FROM lineitem)
       |SELECT COUNT(*) AS n_in_band, ${dsumSql("l_extendedprice")} AS sum_in_band,
       |  MIN(q.q1) AS q1, MIN(q.q3) AS q3
       |FROM lineitem, q
       |WHERE l_extendedprice BETWEEN q.q1 AND q.q3""".stripMargin

  /** A14: null-count per column (reference EDA_premios.ipynb cells 11/15).
    * The testdata has no native nulls, so nullable columns are derived with
    * NULLIF — the null-skipping path is genuinely exercised.
    */
  def qNullCount(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(
        nullif(col("l_quantity"), lit(1.0)).as("a"),
        nullif(col("l_returnflag"), lit("N")).as("b"),
        nullif(col("l_linenumber"), lit(2)).as("c"))
      .agg(
        sum(when(col("a").isNull, 1).otherwise(0)).as("nulls_quantity"),
        sum(when(col("b").isNull, 1).otherwise(0)).as("nulls_returnflag"),
        sum(when(col("c").isNull, 1).otherwise(0)).as("nulls_linenumber"),
        count(lit(1)).as("n_rows"))

  val qNullCountSql: String =
    """SELECT
      |  CAST(SUM(CASE WHEN NULLIF(l_quantity, 1.0) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_quantity,
      |  CAST(SUM(CASE WHEN NULLIF(l_returnflag, 'N') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_returnflag,
      |  CAST(SUM(CASE WHEN NULLIF(l_linenumber, 2) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_linenumber,
      |  COUNT(*) AS n_rows
      |FROM lineitem""".stripMargin

  /** A15: duplicate detection — keys occurring more than once, with their
    * multiplicity (reference EDA_premios.ipynb cells 9-10 `duplicated()`).
    */
  def qDupCount(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("multiplicity"))
      .where(col("multiplicity") > 1)

  val qDupCountSql: String =
    """SELECT c_nationkey, c_mktsegment, COUNT(*) AS multiplicity
      |FROM customer GROUP BY c_nationkey, c_mktsegment
      |HAVING COUNT(*) > 1""".stripMargin

  /** C8/C11: fixed-width binning histogram (reference EDA_premios.ipynb
    * cell 52 `pd.cut(..., arange(0,105000,5000))`).
    */
  def qBinning(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy((floor(col("l_extendedprice") / 5000) * 5000).cast("long").as("bucket"))
      .agg(count(lit(1)).as("cnt"), dsum(col("l_extendedprice")).as("sum_price"))

  val qBinningSql: String =
    s"""SELECT CAST(FLOOR(l_extendedprice / 5000) * 5000 AS BIGINT) AS bucket,
       |  COUNT(*) AS cnt, ${dsumSql("l_extendedprice")} AS sum_price
       |FROM lineitem GROUP BY 1""".stripMargin

  /** C9: piecewise when/otherwise scalar (reference
    * visualization_sorteos_premios.ipynb cell 59 `ticket_price` 5-branch
    * step function) — expression tree, no UDF.
    */
  def qPiecewise(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .withColumn("tier",
        when(col("o_totalprice") < 1000, "low")
          .when(col("o_totalprice") < 5000, "mid")
          .when(col("o_totalprice") < 20000, "high")
          .otherwise("whale"))
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("sum_price"))

  val qPiecewiseSql: String =
    s"""SELECT CASE WHEN o_totalprice < 1000 THEN 'low'
       |  WHEN o_totalprice < 5000 THEN 'mid'
       |  WHEN o_totalprice < 20000 THEN 'high'
       |  ELSE 'whale' END AS tier,
       |  COUNT(*) AS cnt, ${dsumSql("o_totalprice")} AS sum_price
       |FROM orders GROUP BY 1""".stripMargin

  /** A13: describe()-style column statistics (reference EDA_premios.ipynb
    * cell 8). Mean is the order-insensitive decimal-sum / count.
    */
  def qColStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .agg(
        count(col("l_quantity")).as("qty_count"),
        min(col("l_quantity")).as("qty_min"),
        max(col("l_quantity")).as("qty_max"),
        davg(col("l_quantity")).as("qty_mean"),
        min(col("l_extendedprice")).as("price_min"),
        max(col("l_extendedprice")).as("price_max"),
        davg(col("l_extendedprice")).as("price_mean"))

  val qColStatsSql: String =
    s"""SELECT COUNT(l_quantity) AS qty_count,
       |  MIN(l_quantity) AS qty_min, MAX(l_quantity) AS qty_max,
       |  ${davgSql("l_quantity")} AS qty_mean,
       |  MIN(l_extendedprice) AS price_min, MAX(l_extendedprice) AS price_max,
       |  ${davgSql("l_extendedprice")} AS price_mean
       |FROM lineitem""".stripMargin

  /** A11: multi-column mean per group (reference lottery_eda_sagemaker.ipynb
    * cell 0: avg of the three prize columns per date).
    */
  def qMultiAvg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_discount"))

  val qMultiAvgSql: String =
    s"""SELECT l_returnflag,
       |  ${davgSql("l_quantity")} AS avg_qty,
       |  ${davgSql("l_extendedprice")} AS avg_price,
       |  ${davgSql("l_discount")} AS avg_discount
       |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** F7: dedup on projected columns (reference
    * visualization_sorteos_premios.ipynb cell 31
    * `[['vendedor','ciudad']].drop_duplicates()`).
    */
  def qDistinctProj(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(col("o_orderstatus"), col("o_orderpriority")).distinct()

  val qDistinctProjSql: String =
    "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders"

  /** F3: compound range predicates (reference EDA_premios.ipynb cell 54). */
  def qRangeFilter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .where(col("l_quantity").between(10, 20) && col("l_discount") <= 0.05)
      .groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"), dsum(col("l_extendedprice")).as("sum_price"))

  val qRangeFilterSql: String =
    s"""SELECT l_linestatus, COUNT(*) AS cnt,
       |  ${dsumSql("l_extendedprice")} AS sum_price
       |FROM lineitem
       |WHERE l_quantity BETWEEN 10 AND 20 AND l_discount <= 0.05
       |GROUP BY l_linestatus""".stripMargin

  /** F4/F5: conjunctive multi-column != filter (reference EDA_premios.ipynb
    * cell 32).
    */
  def qMulticolFilter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .where(col("event_type") =!= "error" && col("event_type") =!= "view" &&
        col("value") > 0)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))

  val qMulticolFilterSql: String =
    s"""SELECT event_type, COUNT(*) AS cnt, ${dsumSql("value")} AS sum_value
       |FROM events
       |WHERE event_type <> 'error' AND event_type <> 'view' AND value > 0
       |GROUP BY event_type""".stripMargin

  /** W1/W2: ordered top-N slice with deterministic tiebreak — physical plan
    * is TakeOrderedAndProject (no cluster-wide full sort materialized).
    */
  def qSortLimit(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
      .select(col("o_orderkey"), col("o_totalprice"))

  val qSortLimitSql: String =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin

  /** Beyond-reference window op: rank-within-group top-N (the "leaderboard
    * with rank" extension SURVEY §2.5 anticipates).
    */
  def qWindowTopn(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select(col("o_orderpriority"), col("rank"), col("o_orderkey"), col("o_totalprice"))
  }

  val qWindowTopnSql: String =
    """SELECT o_orderpriority,
      |  CAST(row_number() OVER (PARTITION BY o_orderpriority
      |       ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rank,
      |  o_orderkey, o_totalprice
      |FROM orders QUALIFY rank <= 3""".stripMargin

  /** A13 full: describe()-style summary incl. exact sample stddev, computed
    * from order-insensitive decimal sums: var = (Σx² − (Σx)²/n)/(n−1), with
    * every Σ exact decimal and the final arithmetic plain doubles — so the
    * result is bit-identical at any partition count and in the oracle.
    */
  def qSummaryStats(s: SparkSession, dir: String): DataFrame = {
    val x = col("l_quantity")
    val xd = x.cast(org.apache.spark.sql.types.DecimalType(18, 6))
    val sum1 = sum(xd).cast("double")
    // square AFTER the decimal cast (identical exact decimals in both
    // engines), then DROP to scale 6 before the double cast: a scale-12
    // int128 unscaled value exceeds 2^53 and DuckDB's decimal→double is
    // not correctly rounded there
    val sum2 = sum(xd * xd).cast(org.apache.spark.sql.types.DecimalType(28, 6)).cast("double")
    t(s, dir, "lineitem").agg(
      count(x).as("cnt"),
      min(x).as("min_qty"),
      max(x).as("max_qty"),
      (sum1 / count(x)).as("mean_qty"),
      sqrt((sum2 - sum1 * sum1 / count(x)) / (count(x) - 1)).as("stddev_qty"))
  }

  val qSummaryStatsSql: String =
    """WITH a AS (SELECT COUNT(l_quantity) AS cnt,
      |    MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
      |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS s1,
      |    CAST(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6)) * CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS VARCHAR) AS DOUBLE) AS s2
      |  FROM lineitem)
      |SELECT cnt, min_qty, max_qty, s1 / cnt AS mean_qty,
      |  sqrt((s2 - s1 * s1 / cnt) / (cnt - 1)) AS stddev_qty
      |FROM a""".stripMargin

  /** C10: odds / percentage scalar math (reference
    * visualization_sorteos_premios.ipynb cells 45-49: winning percentage and
    * "1 in N" odds from constants + countDistinct).
    */
  def qOdds(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem")
    val total = l.agg(count(lit(1)).as("total"))
    l.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("distinct_parts"),
        count(lit(1)).as("n_rows"))
      .crossJoin(broadcast(total))
      .withColumn("pct_of_total",
        round(lit(100.0) * col("n_rows") / col("total"), 2))
      .withColumn("odds_one_in",
        round(col("total").cast("double") / col("n_rows"), 2))
      .drop("total")
  }

  val qOddsSql: String =
    """WITH tot AS (SELECT COUNT(*) AS total FROM lineitem)
      |SELECT l_returnflag,
      |  COUNT(DISTINCT l_partkey) AS distinct_parts,
      |  COUNT(*) AS n_rows,
      |  ROUND(CAST(100.0 AS DOUBLE) * COUNT(*) / MIN(tot.total), 2) AS pct_of_total,
      |  ROUND(CAST(MIN(tot.total) AS DOUBLE) / COUNT(*), 2) AS odds_one_in
      |FROM lineitem, tot
      |GROUP BY l_returnflag""".stripMargin

  /** J2 faithful shape: full-outer merge with indicator
    * (processed_vs_downloaded.ipynb cells 9-13: `indicator=True`, then
    * filter `_merge == "right_only"`) — here summarized per indicator state.
    */
  def qSymDiff(s: SparkSession, dir: String): DataFrame = {
    val a = t(s, dir, "orders").select(col("o_orderkey").as("key")).distinct()
      .withColumn("in_a", lit(1))
    val b = t(s, dir, "lineitem").where(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("key")).distinct().withColumn("in_b", lit(1))
    a.join(b, Seq("key"), "full_outer")
      .withColumn("merge_state",
        when(col("in_a").isNotNull && col("in_b").isNotNull, "both")
          .when(col("in_a").isNotNull, "left_only")
          .otherwise("right_only"))
      .groupBy(col("merge_state")).agg(count(lit(1)).as("n_keys"))
  }

  val qSymDiffSql: String =
    """WITH a AS (SELECT DISTINCT o_orderkey AS key, 1 AS in_a FROM orders),
      |b AS (SELECT DISTINCT l_orderkey AS key, 1 AS in_b FROM lineitem
      |      WHERE l_returnflag = 'R')
      |SELECT CASE WHEN in_a IS NOT NULL AND in_b IS NOT NULL THEN 'both'
      |            WHEN in_a IS NOT NULL THEN 'left_only'
      |            ELSE 'right_only' END AS merge_state,
      |  COUNT(*) AS n_keys
      |FROM a FULL OUTER JOIN b USING (key)
      |GROUP BY 1""".stripMargin

  /** C-json: JSON field extraction from a string column (events.props). */
  def qJsonExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy((col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("cnt"))

  val qJsonExtractSql: String =
    """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
      |  COUNT(*) AS cnt
      |FROM events GROUP BY 1""".stripMargin

  /** P2-analog as a per-row op: regex field extraction + group (the
    * header-regex pattern of reference parser.py:43-52 applied relationally).
    */
  def qRegexExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(regexp_extract(col("source"), "src(\\d+)", 1).cast("int").as("src_num"))
      .groupBy((col("src_num") % 5).as("src_mod"))
      .agg(count(lit(1)).as("cnt"))

  val qRegexExtractSql: String =
    """SELECT CAST(regexp_extract(source, 'src(\d+)', 1) AS INTEGER) % 5 AS src_mod,
      |  COUNT(*) AS cnt
      |FROM documents GROUP BY 1""".stripMargin

  /** Pivot: event counts per user-decile, one column per event type (the
    * notebook crosstab shape). Spark pivot with an explicit value list
    * stays a single hash aggregate — no second pass to discover values.
    */
  def qPivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy((col("user_id") % 10).as("user_decile"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)

  val qPivotSql: String =
    """SELECT user_id % 10 AS user_decile,
      |  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
      |  COUNT(*) FILTER (WHERE event_type = 'error') AS error,
      |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
      |  COUNT(*) FILTER (WHERE event_type = 'view') AS view
      |FROM events GROUP BY 1""".stripMargin

  /** q156: UNPIVOT / melt — the inverse of q75's pivot: the four lineitem
    * measure columns turned into (measure, value) long form, then
    * profiled per (returnflag, measure). The wide→long reshape every
    * notebook does before a faceted plot or a per-measure quality rule,
    * as a single relational pass.
    *
    * Scale shape: `stack` is a row-local generator (4 output rows per
    * input row, no shuffle); the only exchange is the bounded
    * (flag × measure) aggregate, map-side combined. Spark's stack stays
    * inside whole-stage codegen — this is the planner-native spelling,
    * not an explode over a built array.
    */
  def qUnpivot(s: SparkSession, dir: String): DataFrame =
    // widenScan (r20, guide §2.5): the ×4 stack fan-out + 8 decimal-sum
    // partial aggregates fused into the 3-row-group scan stage, near-serial
    // (R20Prof: 746 ms CPU in 3 tasks — the whole query). The group key is
    // a 6-value enum, so spread on the row hash, not the key. A/B same
    // window: 0.65–0.66 → 0.48 s (R20Probe3, exceptAll = 0). No-op at any
    // real multi-row-group scale.
    graft.Tables.widenScan(t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_tax")))
      .selectExpr("l_returnflag",
        "stack(4, 'quantity', l_quantity, 'extendedprice', l_extendedprice, " +
          "'discount', l_discount, 'tax', l_tax) AS (measure, value)")
      .groupBy(col("l_returnflag"), col("measure"))
      .agg(count(lit(1)).as("n"),
        round(dsum(col("value")), 6).as("total"),
        round(dsum(col("value")) / count(lit(1)), 6).as("mean_v"))

  val qUnpivotSql: String =
    s"""WITH m AS (
       |  SELECT l_returnflag, measure, value
       |  FROM (SELECT l_returnflag, l_quantity AS quantity,
       |          l_extendedprice AS extendedprice, l_discount AS discount,
       |          l_tax AS tax FROM lineitem)
       |  UNPIVOT INCLUDE NULLS (value FOR measure IN (quantity, extendedprice, discount, tax)))
       |SELECT l_returnflag, measure, COUNT(*) AS n,
       |  ROUND(${dsumSql("value")}, 6) AS total,
       |  ROUND(${dsumSql("value")} / COUNT(*), 6) AS mean_v
       |FROM m GROUP BY 1, 2""".stripMargin

  /** ROLLUP: totals at (flag, status), per-flag, and grand-total levels.
    * grouping_id disambiguates NULL-as-subtotal from NULL-as-data.
    *
    * r20 partial-reuse rewrite (the adopted q92 pattern — PLANS.md
    * PARTIAL-REUSE RULE): Spark plans ROLLUP as Expand — every input row
    * fans out to its 3 grains, so the partial aggregate probes 3× the
    * input with decimal buffers riding every copy. COUNT/SUM are
    * decomposable: aggregate ONCE at the finest grain (flag, status) —
    * ~|flags|·|statuses| rows — then derive the (flag) and grand-total
    * grains by re-aggregating that tiny frame, with rollup's gid encoding
    * (0/1/3). Exactness: decimal sums re-aggregate without rounding
    * ((18,6)→(28,6)→(38,6), exact at any corpus the type fits) and both
    * spellings cast the SAME exact decimal to double last — bit-identical
    * to the Expand plan (R20Probe exceptAll = 0 at sf0.1, both
    * directions) and to the untouched oracle. A/B same window at sf0.1:
    * Expand 0.55–0.89 s vs this — see OPTIMIZATION_r20.md.
    */
  def qRollup(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,6)")).as("sq"))
    val both = base.select(col("l_returnflag"), col("l_linestatus"),
      col("n").as("n_rows"), col("sq").cast("double").as("sum_qty"),
      lit(0).as("gid"))
    val byFlag = base.groupBy(col("l_returnflag"))
      .agg(sum(col("n")).as("n_rows"), sum(col("sq")).as("sq2"))
      .select(col("l_returnflag"),
        lit(null).cast("string").as("l_linestatus"), col("n_rows"),
        col("sq2").cast("double").as("sum_qty"), lit(1).as("gid"))
    val total = base
      .agg(sum(col("n")).as("n_rows"), sum(col("sq")).as("sq2"))
      .select(lit(null).cast("string").as("l_returnflag"),
        lit(null).cast("string").as("l_linestatus"), col("n_rows"),
        col("sq2").cast("double").as("sum_qty"), lit(3).as("gid"))
    both.unionByName(byFlag).unionByName(total)
  }

  /** The retired Expand ROLLUP spelling, kept for the r20 A/B ledger
    * (never part of the gated surface).
    */
  def qRollupExpand(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"),
        grouping_id().cast("int").as("gid"))

  val qRollupSql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  COUNT(*) AS n_rows, ${dsumSql("l_quantity")} AS sum_qty,
       |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INTEGER) AS gid
       |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  /** A12 scale path: per-group percentiles via the mergeable KLL sketch
    * aggregate ([[graft.functions.KllQuantiles]]) — one shuffle of
    * O(k log n)-byte sketches, map-side partial aggregation, vs shipping
    * raw values.
    *
    * Oracle closure (r14): the estimates depend on merge order (within
    * the rank-error bound), so no DuckDB spelling can match them
    * value-for-value. Instead the plan carries its own RANK-ERROR
    * CERTIFICATE: each estimate is re-ranked against the actual column
    * (broadcast of the 4×|flags| estimate rows back over lineitem —
    * counts of strictly-below and at-or-below), and `rank_ok` is true
    * iff the estimate's feasible rank interval [lo/n, hi/n] intersects
    * [p − ε, p + ε] with ε = 0.02, the QuantileSketchSpec-pinned bound
    * for k=256 — raising with the numbers if not. The DuckDB oracle
    * recomputes the per-group row counts and expects literal TRUE
    * certificates, so the driver's hash-match verifies real data AND
    * enforces the sketch bound — closing the r13 `no_oracle` row
    * without pretending sketch internals are portable.
    *
    * r20 A/B run and REJECTED (the q12/q86 class): widenScan on both
    * passes read best 0.61 vs 0.65–0.69 s with WORSE medians (0.77 vs
    * 0.66–0.72) — window noise, no adoption case; the certificate
    * columns are merge-order-free so the variant stays runnable in
    * R20Probe3 if a wider box changes the answer.
    */
  def qKllQuantiles(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val probs = Seq(0.25, 0.5, 0.75, 0.95)
    val eps = 0.02 // KLL k=256 normalized rank-error bound (QuantileSketchSpec)
    val ests = t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(graft.functions.QuantileSketch
        .kllQuantiles("l_extendedprice", probs, 256).as("qs"))
      .select(col("l_returnflag"),
        posexplode(col("qs")).as(Seq("pos", "est")))
      .withColumn("p", element_at(lit(probs.toArray), col("pos") + 1))
    t(s, dir, "lineitem")
      .join(broadcast(ests), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"), col("p"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_extendedprice") < col("est"), 1L).otherwise(0L)).as("lo"),
        sum(when(col("l_extendedprice") <= col("est"), 1L).otherwise(0L)).as("hi"))
      .select(col("l_returnflag"), col("p"), col("n"),
        when(col("lo") <= (col("p") + eps) * col("n") &&
            col("hi") >= (col("p") - eps) * col("n"), lit(true))
          .otherwise(raise_error(concat(
            lit("q81 KLL rank-error bound violated: flag "),
            col("l_returnflag"), lit(", p "), col("p").cast("string"),
            lit(", feasible rank ["), col("lo").cast("string"), lit(", "),
            col("hi").cast("string"), lit("] of n = "),
            col("n").cast("string"), lit(s" outside ±$eps"))))
          .as("rank_ok"))
  }

  val qKllQuantilesSql: String =
    """SELECT l_returnflag, CAST(p AS DOUBLE) AS p, COUNT(*) AS n,
      |  TRUE AS rank_ok
      |FROM lineitem CROSS JOIN (VALUES (0.25), (0.5), (0.75), (0.95)) v(p)
      |GROUP BY 1, 2""".stripMargin

  /** CUBE: all four grouping sets of (priority, status) in one pass —
    * with ROLLUP (q76) and pivot (q75) this completes the grouping-sets
    * family. Same single-shuffle property: partial aggregation expands
    * the sets map-side.
    *
    * r20 A/B run and REJECTED for a measured reason (the q118
    * convention): the q92/q76 partial-reuse decomposition was built
    * (below, kept for the ledger) and measured SLOWER here — 0.358 s vs
    * 0.328 s same-window at sf0.1 — because CUBE's four grains need
    * THREE marginal re-aggregate jobs + a 4-way union against an Expand
    * whose ×4 rows are orders (150k), a quarter of lineitem; the
    * partial-agg shuffle stays tiny either way. q76/q92 won the same A/B
    * because their base table is 4× larger and the grain count smaller.
    * Keep the standard Expand plan.
    */
  def qCube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("sum_price"),
        grouping_id().cast("int").as("gid"))

  /** The REJECTED partial-reuse CUBE spelling — r20 A/B ledger only
    * (row-identical to [[qCube]]; R20Probe exceptAll = 0).
    */
  def qCubePartialReuse(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "orders")
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,6)")).as("sp"))
    def grain(keys: Seq[String], gid: Int) = {
      val g = if (keys.isEmpty) base.agg(sum(col("n")).as("n_orders"),
          sum(col("sp")).as("sp2"))
        else base.groupBy(keys.map(col): _*)
          .agg(sum(col("n")).as("n_orders"), sum(col("sp")).as("sp2"))
      g.select(
        (if (keys.contains("o_orderpriority")) col("o_orderpriority")
         else lit(null).cast("string").as("o_orderpriority")) ::
        (if (keys.contains("o_orderstatus")) col("o_orderstatus")
         else lit(null).cast("string").as("o_orderstatus")) ::
        col("n_orders") :: col("sp2").cast("double").as("sum_price") ::
        lit(gid).as("gid") :: Nil: _*)
    }
    base.select(col("o_orderpriority"), col("o_orderstatus"),
        col("n").as("n_orders"), col("sp").cast("double").as("sum_price"),
        lit(0).as("gid"))
      .unionByName(grain(Seq("o_orderpriority"), 1))
      .unionByName(grain(Seq("o_orderstatus"), 2))
      .unionByName(grain(Nil, 3))
  }


  val qCubeSql: String =
    s"""SELECT o_orderpriority, o_orderstatus,
       |  COUNT(*) AS n_orders, ${dsumSql("o_totalprice")} AS sum_price,
       |  CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS INTEGER) AS gid
       |FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)""".stripMargin

  /** Ordered funnel over the event stream: view → later click → later
    * purchase, evaluated per user from each stage's earliest timestamp —
    * one shuffle on user_id, constant state per user, no self-joins
    * (the n-way event self-join formulation explodes at 100 TB; this is
    * one hash aggregate + one scalar rollup).
    */
  def qFunnel(s: SparkSession, dir: String): DataFrame = {
    def tmin(et: String) = min(when(col("event_type") === et, col("ts")))
    val perUser = t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(tmin("view").as("t_view"), tmin("click").as("t_click"),
        tmin("purchase").as("t_purchase"))
    perUser.agg(
      count(lit(1)).as("users"),
      count(col("t_view")).as("viewed"),
      sum(when(col("t_click") > col("t_view"), 1L).otherwise(0L)).as("clicked_after_view"),
      sum(when(col("t_click") > col("t_view") && col("t_purchase") > col("t_click"), 1L)
        .otherwise(0L)).as("purchased_after_click"))
  }

  val qFunnelSql: String =
    """WITH u AS (
      |  SELECT user_id,
      |    MIN(epoch_ns(ts)) FILTER (WHERE event_type = 'view') AS t_view,
      |    MIN(epoch_ns(ts)) FILTER (WHERE event_type = 'click') AS t_click,
      |    MIN(epoch_ns(ts)) FILTER (WHERE event_type = 'purchase') AS t_purchase
      |  FROM events GROUP BY user_id)
      |SELECT COUNT(*) AS users,
      |  COUNT(t_view) AS viewed,
      |  CAST(SUM(CASE WHEN t_click > t_view THEN 1 ELSE 0 END) AS BIGINT) AS clicked_after_view,
      |  CAST(SUM(CASE WHEN t_click > t_view AND t_purchase > t_click
      |       THEN 1 ELSE 0 END) AS BIGINT) AS purchased_after_click
      |FROM u""".stripMargin

  /** Correlation / covariance per group — the bivariate half of
    * describe() the notebook gets from `df.corr()`. Both moments are
    * derived from EXACT decimal sums (n, Σx, Σy, Σxy, Σx², Σy²): the five
    * sums shuffle as partial aggregates (map-side combine, one exchange),
    * and the only floating-point work is one fixed formula evaluated once
    * per group — so the result is bit-identical at any partition count and
    * in the DuckDB oracle, unlike builtin `corr` whose streaming co-moment
    * updates are partition-order-dependent in the last ulps. The decimal
    * widths hold to ~1e20 row-sums — 100 TB-safe for money-scaled data.
    */
  def qCorrMoments(s: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 6)
    val x = col("l_quantity").cast(dec)
    val y = col("l_extendedprice").cast(dec)
    // r20: the whole moment pass ran as ~1.0 s of CPU in ONE scan task
    // (single row group) — and the CPU itself was the decimal(37,12)
    // product path: a JavaBigDecimal multiply per row plus the non-compact
    // sum buffer's per-update reserialization (the R17Probe8 class). The
    // product sums now ride DecProdSum (long-limb split of the two
    // unscaled (18,6) values — exact same rational, bit-identical double,
    // DecProdSumSpec) and the plain sums ride dsum; all-primitive buffers,
    // codegen'd long ALU per row. The plan keeps the 100 TB-ideal shape:
    // scan → map-side partial agg → one 6-row exchange.
    import graft.functions.DecProdSum
    import Relational.dsum
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        dsum(col("l_quantity")).as("sx"), dsum(col("l_extendedprice")).as("sy"),
        DecProdSum.column(x, x).cast("double").as("sxx"),
        DecProdSum.column(y, y).cast("double").as("syy"),
        DecProdSum.column(x, y).cast("double").as("sxy"))
      .select(col("l_returnflag"), col("n").cast("bigint").as("n_rows"),
        expr("sx / n").as("mean_qty"), expr("sy / n").as("mean_price"),
        expr("(n * sxy - sx * sy) / (n * n)").as("cov_pop"),
        // NULLIF on the denominator: a zero-variance group must yield NULL in
        // both engines (Spark non-ANSI x/0 is NULL, DuckDB IEEE is NaN/Inf).
        expr("(n * sxy - sx * sy) / NULLIF(sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy), 0.0)")
          .as("corr_qty_price"))
  }

  /** DuckDB spelling: the product operands are DECIMAL(28,6) — a width-18
    * decimal multiply stays on DuckDB's INT64 path and overflows on
    * l_extendedprice² (observed at sf0.01); width > 18 forces the HUGEINT
    * path, which holds these sums exactly to ~1e26. The sums are exact in
    * both engines, so the double-cast results agree bit-for-bit.
    */
  val qCorrMomentsSql: String =
    """WITH m AS (
      |  SELECT l_returnflag,
      |    CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sx,
      |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sy,
      |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,6)) * CAST(l_quantity AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sxx,
      |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6)) * CAST(l_extendedprice AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS syy,
      |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,6)) * CAST(l_extendedprice AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sxy
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
      |  sx / n AS mean_qty, sy / n AS mean_price,
      |  (n * sxy - sx * sy) / (n * n) AS cov_pop,
      |  (n * sxy - sx * sy) / NULLIF(sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy), 0.0)
      |    AS corr_qty_price
      |FROM m""".stripMargin

  /** Explicit GROUPING SETS with grouping_id — the multi-grain aggregation
    * shape between rollup (q76) and cube (q83): exactly the named grains,
    * nothing more. grouping_id's bit encoding (left column = high bit)
    * matches DuckDB's GROUPING(), so the discriminator column compares
    * exactly.
    *
    * r20 partial-reuse rewrite (VERDICT r19 #1 — the suite's largest
    * un-adjudicated strict-line multiple): Spark's native GROUPING SETS
    * plans as Expand — every input row fans out to its listed grains, so
    * the aggregate hash maps (decimal sum buffers riding every copy)
    * probe 3× the input and the shuffle carries every grain's partials.
    * COUNT and SUM are decomposable, so the marginal grains are derivable
    * from the finest grain: aggregate ONCE on (l_returnflag,
    * l_linestatus) — a ~|flags|·|statuses|-row result — then re-aggregate
    * that tiny frame for the (flag) and (status) sets and union with the
    * right grouping_id. The fact side is probed and shuffled once at 1×;
    * the three union branches share one canonical partial-agg exchange
    * (ReuseExchange — pinned in PlanSpec), and the marginal re-aggregates
    * shuffle a dozen rows. Exactness: decimal sums re-aggregate without
    * rounding (DECIMAL(18,6) → (28,6) → (38,6), all exact at any corpus
    * the type fits), and both spellings cast the SAME exact decimal to
    * double last, so results are bit-identical to the Expand plan and to
    * the untouched oracle (R20Probe exceptAll = 0 at sf0.1, both
    * directions). A/B same JVM/window at sf0.1, local[16], two windows
    * (R20Probe): Expand 1.03–1.17 s warm vs this 0.70–0.77 s — ~35%
    * off the suite's largest un-adjudicated multiple; adopted
    * (BASELINE r20).
    */
  def qGroupingSets(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,6)")).as("sq"))
    val both = base.select(col("l_returnflag"), col("l_linestatus"),
      lit(0).as("gid"), col("n").as("n_rows"),
      col("sq").cast("double").as("sum_qty"))
    val byFlag = base.groupBy(col("l_returnflag"))
      .agg(sum(col("n")).as("n_rows"), sum(col("sq")).as("sq2"))
      .select(col("l_returnflag"), lit(null).cast("string").as("l_linestatus"),
        lit(1).as("gid"), col("n_rows"), col("sq2").cast("double").as("sum_qty"))
    val byStatus = base.groupBy(col("l_linestatus"))
      .agg(sum(col("n")).as("n_rows"), sum(col("sq")).as("sq2"))
      .select(lit(null).cast("string").as("l_returnflag"), col("l_linestatus"),
        lit(2).as("gid"), col("n_rows"), col("sq2").cast("double").as("sum_qty"))
    both.unionByName(byFlag).unionByName(byStatus)
  }

  /** The retired Expand spelling, kept for the r20 A/B ledger (Profile
    * runs it side-by-side with the adopted partial-reuse plan; never part
    * of the gated surface).
    */
  def qGroupingSetsExpand(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("lineitem_gsets")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping_id(l_returnflag, l_linestatus) AS INT) AS gid,
        |  COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem_gsets
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
        |                        (l_returnflag, l_linestatus))""".stripMargin)
  }

  val qGroupingSetsSql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid,
       |  COUNT(*) AS n_rows,
       |  ${dsumSql("l_quantity")} AS sum_qty
       |FROM lineitem
       |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
       |                        (l_returnflag, l_linestatus))""".stripMargin

  // ---------------------------------------------------------------- q172

  /** q172: 2-D skyline (Pareto frontier) of orders — the orders no other
    * order beats on BOTH dimensions (earlier-or-equal date AND
    * higher-or-equal price, strictly better in one). The "best so far"
    * frontier behind price-tracking and multi-objective screens.
    *
    * Scale shape: the quadratic NOT-EXISTS definition is rewritten as
    * per-date max (one map-side-combinable aggregate over the bounded
    * date domain) + a running max over the DATE frame (≤ a few thousand
    * rows regardless of corpus size) + a broadcast join back — never an
    * all-pairs dominance test. The oracle mirrors the rewrite so both
    * engines run the identical O(n + dates) plan.
    */
  def qSkyline(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(col("o_orderkey"),
      col("o_orderdate").cast("date").as("o_date"), col("o_totalprice"))
    val daily = o.groupBy(col("o_date")).agg(max(col("o_totalprice")).as("dmax"))
    val w = Window.orderBy(col("o_date")).rowsBetween(Window.unboundedPreceding, -1)
    val frontier = daily.withColumn("prior", max(col("dmax")).over(w))
      .where(col("prior").isNull || col("dmax") > col("prior"))
      .select(col("o_date"), col("dmax"))
    o.join(broadcast(frontier), Seq("o_date"))
      .where(col("o_totalprice") === col("dmax"))
      .select(col("o_orderkey"), col("o_date"), col("o_totalprice"))
  }

  val qSkylineSql: String =
    """WITH o AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
      |             o_totalprice FROM orders),
      |daily AS (SELECT o_date, MAX(o_totalprice) AS dmax FROM o GROUP BY 1),
      |f AS (SELECT o_date, dmax,
      |        MAX(dmax) OVER (ORDER BY o_date
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior
      |      FROM daily)
      |SELECT o.o_orderkey, o.o_date, o.o_totalprice
      |FROM o JOIN f ON o.o_date = f.o_date AND o.o_totalprice = f.dmax
      |WHERE f.prior IS NULL OR f.dmax > f.prior""".stripMargin

  // ---------------------------------------------------------------- q173

  /** q173: RFM customer segmentation — recency (days since last order,
    * vs the corpus max date), frequency (order count), monetary (decimal
    * order-total sum), each scored 1–5 on FIXED practitioner bins (fixed
    * thresholds, not quantiles: row-local, shuffle-free, and stable
    * across reruns — the quantile spelling would need a global rank).
    * Output: customers and mean spend per 3-digit RFM cell.
    *
    * Scale shape: one per-customer aggregate (map-side combinable), a
    * 1-row broadcast for the corpus max date, then a bounded ≤125-cell
    * aggregate. Everything else is row-local scoring.
    */
  def qRfm(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val o = t(s, dir, "orders")
    val mx = o.agg(max(col("o_orderdate").cast("date")).as("maxd"))
    val per = o.groupBy(col("o_custkey")).agg(
        max(col("o_orderdate").cast("date")).as("lastd"),
        count(lit(1)).as("f"),
        dsum(col("o_totalprice")).as("m"))
      .crossJoin(broadcast(mx))
      .withColumn("r_days", datediff(col("maxd"), col("lastd")).cast("long"))
    val scored = per.select(
      concat(
        when(col("r_days") <= 60, "5").when(col("r_days") <= 120, "4")
          .when(col("r_days") <= 240, "3").when(col("r_days") <= 400, "2")
          .otherwise("1"),
        when(col("f") >= 13, "5").when(col("f") >= 11, "4")
          .when(col("f") >= 9, "3").when(col("f") >= 7, "2").otherwise("1"),
        when(col("m") >= 3200000.0, "5").when(col("m") >= 2600000.0, "4")
          .when(col("m") >= 2200000.0, "3").when(col("m") >= 1700000.0, "2")
          .otherwise("1")).as("rfm"),
      col("m"))
    scored.groupBy(col("rfm")).agg(
      count(lit(1)).as("n_customers"),
      round(sum(col("m").cast(DecimalType(28, 6))).cast("double")
        / count(lit(1)), 6).as("avg_monetary"))
  }

  val qRfmSql: String =
    s"""WITH mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS maxd FROM orders),
       |per AS (
       |  SELECT o_custkey, MAX(CAST(o_orderdate AS DATE)) AS lastd,
       |    COUNT(*) AS f, ${dsumSql("o_totalprice")} AS m
       |  FROM orders GROUP BY 1),
       |scored AS (
       |  SELECT
       |    (CASE WHEN date_diff('day', lastd, mx.maxd) <= 60 THEN '5'
       |          WHEN date_diff('day', lastd, mx.maxd) <= 120 THEN '4'
       |          WHEN date_diff('day', lastd, mx.maxd) <= 240 THEN '3'
       |          WHEN date_diff('day', lastd, mx.maxd) <= 400 THEN '2'
       |          ELSE '1' END)
       |    || (CASE WHEN f >= 13 THEN '5' WHEN f >= 11 THEN '4'
       |             WHEN f >= 9 THEN '3' WHEN f >= 7 THEN '2' ELSE '1' END)
       |    || (CASE WHEN m >= 3200000.0 THEN '5' WHEN m >= 2600000.0 THEN '4'
       |             WHEN m >= 2200000.0 THEN '3' WHEN m >= 1700000.0 THEN '2'
       |             ELSE '1' END) AS rfm,
       |    m
       |  FROM per CROSS JOIN mx)
       |SELECT rfm, COUNT(*) AS n_customers,
       |  ROUND(CAST(CAST(SUM(CAST(m AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE)
       |    / COUNT(*), 6) AS avg_monetary
       |FROM scored GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q177

  /** q177: equi-depth decile table of line-item price — the 9 exact
    * decile boundaries as rows, computed with the same shuffle-free
    * histogram-refinement selection as q18 (two bounded scans + a
    * metadata-sized collect; no range shuffle, no sort). The
    * equi-depth histogram every optimizer and data-profiler keeps.
    */
  def qEquidepthDeciles(s: SparkSession, dir: String): DataFrame = {
    val probs = (1 to 9).map(_ / 10.0)
    exactQuantilesByHistogram(t(s, dir, "lineitem"), "l_extendedprice", probs)
      .select(expr("stack(9, " +
        (0 until 9).map(i => s"${i + 1}, q$i").mkString(", ") +
        ") AS (decile, boundary)"))
  }

  val qEquidepthDecilesSql: String = {
    val qs = (1 to 9).map(i =>
      s"percentile_cont(0.$i) WITHIN GROUP (ORDER BY l_extendedprice) AS q$i")
      .mkString(",\n  ")
    val rows = (1 to 9).map(i => s"SELECT $i AS decile, q$i AS boundary FROM q")
      .mkString("\nUNION ALL ")
    s"""WITH q AS (SELECT
       |  $qs
       |FROM lineitem)
       |$rows""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q172_skyline" -> (qSkyline _),
    "q173_rfm" -> (qRfm _),
    "q177_equidepth_deciles" -> (qEquidepthDeciles _),
    "q156_unpivot" -> (qUnpivot _),
    "q92_grouping_sets" -> (qGroupingSets _),
    "q81_kll_quantiles" -> (qKllQuantiles _),
    "q86_corr_moments" -> (qCorrMoments _),
    "q83_cube" -> (qCube _),
    "q84_funnel" -> (qFunnel _),
    "q75_pivot" -> (qPivot _),
    "q76_rollup" -> (qRollup _),
    "q09_topk" -> (qTopk _),
    "q10_value_counts" -> (qValueCounts _),
    "q11_having" -> (qHaving _),
    "q12_nunique_per_group" -> (qNuniquePerGroup _),
    "q13_collect_set_explode" -> (qCollectSetExplode _),
    "q14_semi_join" -> (qSemiJoin _),
    "q15_anti_join" -> (qAntiJoin _),
    "q16_except" -> (qExcept _),
    "q17_union_cols" -> (qUnionCols _),
    "q18_quantile_iqr" -> (qQuantileIqr _),
    "q19_null_count" -> (qNullCount _),
    "q20_dup_count" -> (qDupCount _),
    "q21_binning" -> (qBinning _),
    "q22_piecewise" -> (qPiecewise _),
    "q23_colstats" -> (qColStats _),
    "q24_multi_avg" -> (qMultiAvg _),
    "q25_distinct_proj" -> (qDistinctProj _),
    "q26_range_filter" -> (qRangeFilter _),
    "q27_multicol_filter" -> (qMulticolFilter _),
    "q28_sort_limit" -> (qSortLimit _),
    "q29_window_topn" -> (qWindowTopn _),
    "q30_json_extract" -> (qJsonExtract _),
    "q31_regex_extract" -> (qRegexExtract _),
    "q34_summary_stats" -> (qSummaryStats _),
    "q35_odds" -> (qOdds _),
    "q36_sym_diff" -> (qSymDiff _))

  val oracle: Map[String, String] = Map(
    "q81_kll_quantiles" -> qKllQuantilesSql,
    "q172_skyline" -> qSkylineSql,
    "q173_rfm" -> qRfmSql,
    "q177_equidepth_deciles" -> qEquidepthDecilesSql,
    "q156_unpivot" -> qUnpivotSql,
    "q92_grouping_sets" -> qGroupingSetsSql,
    "q86_corr_moments" -> qCorrMomentsSql,
    "q83_cube" -> qCubeSql,
    "q84_funnel" -> qFunnelSql,
    "q75_pivot" -> qPivotSql,
    "q76_rollup" -> qRollupSql,
    "q09_topk" -> qTopkSql,
    "q10_value_counts" -> qValueCountsSql,
    "q11_having" -> qHavingSql,
    "q12_nunique_per_group" -> qNuniquePerGroupSql,
    "q13_collect_set_explode" -> qCollectSetExplodeSql,
    "q14_semi_join" -> qSemiJoinSql,
    "q15_anti_join" -> qAntiJoinSql,
    "q16_except" -> qExceptSql,
    "q17_union_cols" -> qUnionColsSql,
    "q18_quantile_iqr" -> qQuantileIqrSql,
    "q19_null_count" -> qNullCountSql,
    "q20_dup_count" -> qDupCountSql,
    "q21_binning" -> qBinningSql,
    "q22_piecewise" -> qPiecewiseSql,
    "q23_colstats" -> qColStatsSql,
    "q24_multi_avg" -> qMultiAvgSql,
    "q25_distinct_proj" -> qDistinctProjSql,
    "q26_range_filter" -> qRangeFilterSql,
    "q27_multicol_filter" -> qMulticolFilterSql,
    "q28_sort_limit" -> qSortLimitSql,
    "q29_window_topn" -> qWindowTopnSql,
    "q30_json_extract" -> qJsonExtractSql,
    "q31_regex_extract" -> qRegexExtractSql,
    "q34_summary_stats" -> qSummaryStatsSql,
    "q35_odds" -> qOddsSql,
    "q36_sym_diff" -> qSymDiffSql)
}
