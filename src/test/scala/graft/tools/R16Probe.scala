package graft.tools

import org.apache.spark.sql.functions._
import graft.{Session, Tables}
import ProbeTiming.time

/** r16 decomposition probe for q49 at the 100x indep corpus: the 10x dup
  * corpus and the 100x indep corpus carry the SAME ~113M-pair expansion
  * (pair work is quadratic in df: 10x-dup multiplies every df by 10,
  * 100x-indep multiplies the number of sf0.1-shaped populations by 100 —
  * both are 100x sf0.1's pair work), yet q49 measured 11.6-20.5 s at 10x
  * and ~336 s at 100x. Times each stage so the blowup is attributable:
  * posting-list build, pair aggregate (no sizes join), sizes joins +
  * top-k on top.
  * Usage: Test/runMain graft.tools.R16Probe <docsDir>
  */
object R16Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Session.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.load(spark, dir, "documents")

    // stage 1: distinct posting list (hashed variant — the scale default)
    val sh = docs
      .select(col("doc_id"), explode(call_function("word_shingles",
        col("text"), lit(3), lit(true))).as("shingle"))
      .select(col("doc_id"), xxhash64(col("shingle")).as("shingle"))
      .persist()
    time("posting_build", reps = 1, warm = false)(sh.count())

    // stage 2: hot-shingle cap + keep list
    val nDocs = docs.select(count(lit(1)).as("n_docs"))
    val hot = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .where(col("df") > col("n_docs") * 0.5)
      .select(col("shingle"))
    val keep = sh.join(broadcast(hot), Seq("shingle"), "left_anti").persist()
    time("keep_build", reps = 1, warm = false)(keep.count())

    // stage 3: pair expansion + aggregate, NO sizes joins
    val parts = 4 * spark.sparkContext.defaultParallelism
    val keyed = keep.repartition(parts, col("shingle"))
    val a = keyed.select(col("doc_id").as("doc_a"), col("shingle"))
    val b = keyed.select(col("doc_id").as("doc_b"), col("shingle")).hint("merge")
    val pairs = a.join(b, Seq("shingle")).where(col("doc_a") < col("doc_b"))
      .repartition(parts, col("doc_a"), col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("common"))
    time("pair_agg_count", reps = 1, warm = false)(println("  n_pairs=" + pairs.count()))

    // stage 4: the full gated query (sizes joins + jaccard + top-20)
    time("q49_full", reps = 1, warm = false)(graft.SparkEntry.queries("q49_jaccard_top_pairs")(spark, dir).count())
    spark.stop()
  }
}
