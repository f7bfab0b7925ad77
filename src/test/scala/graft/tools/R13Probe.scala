package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Session, Tables}

/** Dev-only r13 decomposition probe: where do the two-pass Misra-Gries
  * queries (q103/q114) spend their time at 10× data? Pass-by-pass
  * steady-state timings (same method as Profile: warmup + best-of-3),
  * backing the BASELINE "MG constant factor" rows. Not part of the
  * engine surface.
  */
object R13Probe {
  private def time(label: String)(mk: => DataFrame): Unit = {
    mk.count() // warmup
    System.gc()
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); mk.count(); (System.nanoTime() - t0) / 1e9
    }
    println(f"== $label: best ${ts.min}%.3fs of ${ts.map(t => f"$t%.2f").mkString(",")}")
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Session.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    def docs = Tables.load(spark, dir, "documents")

    // q103 pass 1: fused-tokenization MG sketch, one-row result
    time("p1_mg_text")(docs.agg(expr("mg_freq_text(text, 64)")))
    // q103 pass 1 (old spelling): explode + per-token mg_freq
    time("p1_explode_mg")(docs
      .select(explode(split(col("text"), " ")).as("token"))
      .where(col("token") =!= "")
      .agg(expr("mg_freq(token, 64)")))
    // bare token_term_counts scan (the floor of any fused pass)
    time("ttc_bare")(docs.agg(sum(element_at(
      call_function("token_term_counts", col("text"),
        expr("CAST(array() AS ARRAY<STRING>)")), 1))))
    // q103 pass 2 shape: 64-term fused recount + array_sum_long
    val terms64 = (1 to 64).map(i => s"term_$i")
    time("p2_ttc64_arraysum")(docs.agg(call_function("array_sum_long",
      call_function("token_term_counts", col("text"),
        array(terms64.map(lit): _*)))))
    // q114 pass 2 shape: ~768-term fused recount per source
    val terms768 = (1 to 768).map(i => s"term_$i")
    time("p2_ttc768_by_src")(docs.groupBy(col("source"))
      .agg(call_function("array_sum_long",
        call_function("token_term_counts", col("text"),
          array(terms768.map(lit): _*)))))
    // q114 pass 1: per-source fused sketch
    time("p1_mg_text_by_src")(docs.groupBy(col("source"))
      .agg(expr("mg_freq_text(text, 64)")))
    spark.stop()
  }
}
