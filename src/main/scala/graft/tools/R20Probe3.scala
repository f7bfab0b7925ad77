package graft.tools

import graft.{Bench, Session, SparkEntry, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Relational.dsum

/** r20 widenScan A/B (guide §2.5): q02 / q156 / q81 run their whole
  * row-dense pipeline (partial aggregation, stack fan-out, sketch build,
  * certificate re-rank) fused into the 3-row-group lineitem scan stage —
  * R20Prof reads 616 / 746 / 341+285 ms of near-serial CPU there. This
  * probe times the shipped spellings against widened variants in the same
  * JVM and window, with exceptAll row-identity checks. The q12 and q86
  * precedents went opposite ways (widen lost / lost badly), so adoption is
  * strictly by this measurement. Dev-only.
  */
object R20Probe3 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Session.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t(n: String) = Tables.load(spark, sfDir, n)

    // ---- q02 variant: widenScanOn(l_orderkey) — the exchange it inserts
    // IS the per-order aggregate's required partitioning, so the partial
    // agg runs at full parallelism and the agg's own exchange disappears.
    def q02Widened(s: SparkSession, dir: String): DataFrame = {
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"))
      val l = Tables.widenScanOn(
        Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_returnflag"), col("l_extendedprice"),
            nullif(col("l_linenumber"), lit(1)).as("item_id")),
        col("l_orderkey"))
      val flagged = col("l_returnflag") =!= "N"
      val perOrder = l.groupBy(col("l_orderkey"))
        .agg(
          count(col("item_id")).as("total_items"),
          count(lit(1)).as("total_rows"),
          count(when(flagged, col("item_id"))).as("items_flagged"),
          round(lit(100.0) * count(when(flagged, col("item_id"))) /
            nullif(count(col("item_id")), lit(0)), 2).as("pct_flagged"),
          dsum(col("l_extendedprice")).as("total_price"),
          dsum(when(flagged, col("l_extendedprice"))).as("price_flagged"),
          max(col("l_extendedprice")).as("top_price"))
      o.join(perOrder, o("o_orderkey") === perOrder("l_orderkey"))
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"),
          col("total_items"), col("total_rows"), col("items_flagged"),
          col("pct_flagged"), col("total_price"), col("price_flagged"),
          col("top_price"))
    }

    // ---- q156 variant: widenScan (hash spread — the group key is a
    // 6-value enum, useless for spreading) before the stack fan-out.
    def q156Widened(s: SparkSession, dir: String): DataFrame =
      Tables.widenScan(
        Tables.load(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_quantity"),
            col("l_extendedprice"), col("l_discount"), col("l_tax")))
        .selectExpr("l_returnflag",
          "stack(4, 'quantity', l_quantity, 'extendedprice', l_extendedprice, " +
            "'discount', l_discount, 'tax', l_tax) AS (measure, value)")
        .groupBy(col("l_returnflag"), col("measure"))
        .agg(count(lit(1)).as("n"),
          round(dsum(col("value")), 6).as("total"),
          round(dsum(col("value")) / count(lit(1)), 6).as("mean_v"))

    // ---- q81 variant: widen both passes (sketch build + certificate
    // re-rank). Estimates move within the ±0.02 certificate band under a
    // different merge order; the OUTPUT columns are merge-order-free.
    def q81Widened(s: SparkSession, dir: String): DataFrame = {
      graft.functions.GraftFunctions.register(s)
      val probs = Seq(0.25, 0.5, 0.75, 0.95)
      val eps = 0.02
      val narrow = Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice"))
      val ests = Tables.widenScan(narrow)
        .groupBy(col("l_returnflag"))
        .agg(graft.functions.QuantileSketch
          .kllQuantiles("l_extendedprice", probs, 256).as("qs"))
        .select(col("l_returnflag"),
          posexplode(col("qs")).as(Seq("pos", "est")))
        .withColumn("p", element_at(lit(probs.toArray), col("pos") + 1))
      Tables.widenScan(narrow)
        .join(broadcast(ests), Seq("l_returnflag"))
        .groupBy(col("l_returnflag"), col("p"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_extendedprice") < col("est"), 1L).otherwise(0L)).as("lo"),
          sum(when(col("l_extendedprice") <= col("est"), 1L).otherwise(0L)).as("hi"))
        .select(col("l_returnflag"), col("p"), col("n"),
          when(col("lo") <= (col("p") + eps) * col("n") &&
              col("hi") >= (col("p") - eps) * col("n"), lit(true))
            .otherwise(raise_error(lit("q81 widened: rank bound violated")))
            .as("rank_ok"))
    }

    if (args.contains("--plan156")) {
      // the retired (unwidened) q156 spelling, for the before-plan dump
      val before = t("lineitem")
        .selectExpr("l_returnflag",
          "stack(4, 'quantity', l_quantity, 'extendedprice', l_extendedprice, " +
            "'discount', l_discount, 'tax', l_tax) AS (measure, value)")
        .groupBy(col("l_returnflag"), col("measure"))
        .agg(count(lit(1)).as("n"),
          round(dsum(col("value")), 6).as("total"),
          round(dsum(col("value")) / count(lit(1)), 6).as("mean_v"))
      Bench.force(before)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("plans/r20/q156_unpivot_before.txt"),
        before.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      println("wrote plans/r20/q156_unpivot_before.txt")
      spark.stop()
      return
    }

    // ---- q08 variant: widenScanOn(l_orderkey) before the per-order
    // pre-aggregate — the q02 shape exactly (562 ms serial partial agg in
    // the 3-task scan stage).
    def q08Widened(s: SparkSession, dir: String): DataFrame = {
      val l = Tables.widenScanOn(Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_extendedprice")),
        col("l_orderkey"))
      val o = Tables.load(s, dir, "orders")
      val perOrder = l.groupBy(col("l_orderkey")).agg(
        count(col("l_partkey")).as("np"),
        sum(col("l_extendedprice").cast("decimal(18,6)")).as("sm"))
      perOrder.join(o, col("l_orderkey") === o("o_orderkey"))
        .where(col("o_orderdate").isNotNull)
        .groupBy(year(col("o_orderdate")).as("year"),
          month(col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("num_sorteos"),
          sum(col("np")).as("num_premios"),
          sum(col("sm")).cast("double").as("total_monto"))
    }

    // ---- q180 variant: widenScanOn(doc_id) on the TEXTS before the
    // k-gram explode — the explode + (gkey, doc_id) partial agg ran fused
    // into the 1-split documents scan (249 ms serial writing 225k gram
    // rows); partitioning by doc_id satisfies the aggregate's clustered
    // distribution, so the 21 MB gram exchange disappears and a 0.6 MB
    // text exchange takes its place below the CPU.
    def q180Widened(s: SparkSession, dir: String): DataFrame = {
      graft.functions.GraftFunctions.register(spark)
      val docs = Tables.widenScanOn(Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text")), col("doc_id"))
      val grams = docs.select(col("doc_id"),
        explode(call_function("word_shingles",
          col("text"), lit(10), lit(false))).as("gram"))
      val perDocGram = grams.select(col("doc_id"), col("gram").as("gkey"))
        .groupBy(col("gkey"), col("doc_id")).agg(count(lit(1)).as("cnt"))
      val flagged = perDocGram.withColumn("nd", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("gkey"))))
      flagged.groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("n_grams"),
          coalesce(sum(when(col("nd") >= 2, col("cnt"))), lit(0L))
            .as("n_dup_grams"))
        .select(col("doc_id"), col("n_grams"), col("n_dup_grams"),
          round(col("n_dup_grams").cast("double") / col("n_grams"), 6)
            .as("dup_frac"),
          when(col("n_dup_grams").cast("double") / col("n_grams") >= 0.5, 1)
            .otherwise(0).as("drop_doc"))
    }

    // ---- q120 / q101 variants: row-local heavy per-doc CPU (6 regex
    // passes; per-shingle md5 transform) fused into the 1-split documents
    // scan — widenScan spreads the texts (0.6 MB exchange) before the CPU.
    def q120Widened(s: SparkSession, dir: String): DataFrame =
      graft.operators.Privacy.piiRedactOf(
        Tables.widenScan(Tables.load(s, dir, "documents"), col("doc_id")))
    def q101Widened(s: SparkSession, dir: String): DataFrame = {
      graft.functions.GraftFunctions.register(s)
      graft.operators.TextOps.winnowFingerprintOf(
        Tables.widenScan(Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("text")), col("doc_id")))
    }

    val abs = Seq[(String, (SparkSession, String) => DataFrame)](
      "q120_pii_redact" -> (q120Widened _),
      "q101_winnow_fingerprint" -> (q101Widened _),
      "q08_time_series" -> (q08Widened _),
      "q180_substring_dedup" -> (q180Widened _),
      "q02_draw_summary" -> (q02Widened _),
      "q156_unpivot" -> (q156Widened _),
      "q81_kll_quantiles" -> (q81Widened _),
      // ADOPTED two-branch spelling vs the retired Expand (ledger)
      "q12_nunique_per_group" ->
        ((s: SparkSession, d: String) =>
          graft.operators.Analytics.qNuniquePerGroupExpand(s, d)))
    for ((name, widened) <- abs) {
      val shipped = SparkEntry.queries(name)
      val a = shipped(spark, sfDir)
      val b = widened(spark, sfDir)
      val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
      println(s"== $name widened exceptAll diff: $diff")
      require(diff == 0, s"$name widened spelling diverges")
      ProbeTiming.time(s"$name shipped") { Bench.force(shipped(spark, sfDir)) }
      ProbeTiming.time(s"$name widened") { Bench.force(widened(spark, sfDir)) }
      ProbeTiming.time(s"$name shipped (2nd window)") { Bench.force(shipped(spark, sfDir)) }
    }
    spark.stop()
  }
}
