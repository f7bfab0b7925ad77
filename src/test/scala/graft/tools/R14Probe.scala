package graft.tools

import org.apache.spark.sql.functions._
import graft.{Session, Tables}
import ProbeTiming.time

/** r14 decomposition probe for the q103/q114 certified-single-pass work:
  * isolates the pass-1 sketch scan (old 2-arg vs new capacity spelling),
  * the witness scan, and the bare fused-scan floor, so the BASELINE notes
  * can attribute the measured ratio to real terms.
  * Usage: Test/runMain graft.tools.R14Probe <docsDir>
  */
object R14Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Session.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    def docs = Tables.load(spark, dir, "documents")

    // bare fused-scan floor: tokenize only, no sketch
    time("scan_floor_ttc_empty")(docs.agg(sum(element_at(
      call_function("token_term_counts", col("text"),
        expr("CAST(array() AS ARRAY<STRING>)")), 1))).head())
    // pass 1, r13 spelling (cap = k = 64)
    time("p1_mg_text_k64")(docs.agg(expr("mg_freq_text(text, 64)")).head())
    // pass 1, r14 spelling (cap = 65536)
    time("p1_mg_text_cap64k")(docs.agg(expr("mg_freq_text(text, 64, 65536)")).head())
    // pass 1 + witness columns in the same agg (the q103 build shape)
    time("p1_plus_witness_cols")(docs.agg(expr("mg_freq_text(text, 64, 65536)"),
      count(lit(1)), coalesce(sum(col("n_chars")), lit(0L))).head())
    // the witness-only scan (the q103 execution shape)
    time("witness_only")(docs.agg(count(lit(1)),
      coalesce(sum(col("n_chars")), lit(0L))).head())
    // per-source pass 1 (the q114 build shape)
    time("p1_grouped")(docs.groupBy(col("source"))
      .agg(expr("mg_freq_text(text, 64, 65536)"), count(lit(1)),
        coalesce(sum(col("n_chars")), lit(0L))).collect())
    // per-source witness (the q114 execution shape)
    time("witness_grouped")(docs.groupBy(col("source"))
      .agg(count(lit(1)), coalesce(sum(col("n_chars")), lit(0L)))
      .agg(map_from_entries(collect_list(struct(col("source"),
        struct(col("count(1)")))))).collect())
    spark.stop()
  }
}

/** q177 decomposition: times the three component jobs of the batched
  * histogram-refinement selection separately on lineitem.
  * Usage: Test/runMain graft.tools.R14Probe2 <sfDir>
  */
object R14Probe2 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Session.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val l = Tables.load(spark, dir, "lineitem")
    val vals = l.select(col("l_extendedprice").cast("double").as("v"))
      .where(col("v").isNotNull)
    time("head_agg_nocache")(vals.agg(count(lit(1)), min(col("v")), max(col("v"))).head())
    vals.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("head_agg_cached")(vals.agg(count(lit(1)), min(col("v")), max(col("v"))).head())
    val bins = 8192
    val idx = greatest(lit(0), least(lit(bins - 1),
      floor((col("v") - lit(900.0)) / lit(12.0)).cast("int")))
    time("hist_cached")(vals.groupBy(idx.as("b"))
      .agg(count(lit(1)), min(col("v")), max(col("v"))).collect())
    time("leaf_collect_cached")(vals
      .select(when(idx === 100, 0).when(idx === 200, 1).when(idx === 300, 2)
        .when(idx === 400, 3).when(idx === 500, 4).when(idx === 600, 5)
        .when(idx === 700, 6).when(idx === 800, 7).when(idx === 900, 8)
        .otherwise(-1).as("t"), col("v"))
      .where(col("t") >= 0).collect())
    vals.unpersist()
    time("q177_full")(graft.SparkEntry.queries("q177_equidepth_deciles")(spark, dir).count())
    spark.stop()
  }
}

/** One-shot 100× sweep: runs each named query ONCE (cold JVM, warm FS) —
  * the right method for multi-minute scale points where Profile's
  * warmup+3-reps would quadruple the cost and the floor is irrelevant.
  * Usage: Test/runMain graft.tools.Probe100x <sfDir> <query...>
  */
object Probe100x {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Session.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      val fn = (graft.SparkEntry.queries ++ graft.SparkEntry.benchOnly)(name)
      val t0 = System.nanoTime()
      val cnt = graft.Bench.force(fn(spark, dir))
      println(f"== $name: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$cnt")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
