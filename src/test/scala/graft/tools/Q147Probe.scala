package graft.tools

import org.apache.spark.sql.functions._
import graft.{Session, Tables}

/** Dev-only stage-cost probe for q147: times the edge build and the
  * iteration chain separately.
  */
object Q147Probe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = Session.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Any): Unit =
      ProbeTiming.time(label, warm = false, prefix = "PROBE")(f)
    val docs = Tables.load(spark, dir, "documents")
    // full query (warm)
    graft.operators.Retrieval.qTokenPagerank(spark, dir).count()
    spark.catalog.clearCache()
    time("full_cold_cache") { graft.operators.Retrieval.qTokenPagerank(spark, dir).count(); spark.catalog.clearCache() }
    // edge aggregate only
    val toks = docs.select(split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= 2)
      .select(explode(expr(
        "filter(transform(sequence(0, size(toks) - 2), i -> struct(toks[i] as src, toks[i+1] as dst)), p -> p.src <> '' AND p.dst <> '')")).as("p"))
      .select(col("p.src"), col("p.dst"))
    time("edges_agg") { toks.groupBy("src", "dst").agg(count(lit(1))).count() }
    // edges + outW + e + nodes materialization
    time("edge_build_all") {
      val edges = toks.groupBy(col("src"), col("dst")).agg(count(lit(1)).as("c")).persist()
      val outW = edges.groupBy(col("src")).agg(sum(col("c")).as("out_c"))
      val e = edges.join(outW, Seq("src"))
        .select(col("src"), col("dst"), (col("c").cast("double") / col("out_c")).as("frac")).persist()
      val nodes = edges.select(col("src").as("token"))
        .union(edges.select(col("dst").as("token"))).distinct().persist()
      e.count(); nodes.count()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
