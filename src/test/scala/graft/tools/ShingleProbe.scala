package graft.tools

import org.apache.spark.sql.functions._
import graft.Session

/** Dev-only decomposition of the shingle-family cost: how much of the
  * x49-style hashed jaccard is shingle EXTRACTION (row-local transform +
  * array_distinct + explode) vs the posting-list self-join downstream.
  * Usage: Test/runMain graft.tools.ShingleProbe <sfDir>
  */
object ShingleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Session.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val shingleArr = expr(
      """transform(sequence(1, size(toks) - 2),
        |          i -> concat_ws(' ', toks[i - 1], toks[i], toks[i + 1]))"""
        .stripMargin)

    def time(label: String)(f: => Any): Unit =
      ProbeTiming.time(label)(f)

    val base = docs.withColumn("toks", split(col("text"), " "))
      .where(size(col("toks")) >= 3)
    time("1 scan+tokenize only") {
      base.agg(sum(size(col("toks")))).collect()
    }
    time("2 + shingle transform (no distinct)") {
      base.select(explode(shingleArr).as("s")).agg(count(lit(1))).collect()
    }
    time("3 + array_distinct + explode") {
      base.select(explode(array_distinct(shingleArr)).as("s"))
        .agg(count(lit(1))).collect()
    }
    time("4 + xxhash64 of exploded shingle") {
      base.select(col("doc_id"), explode(array_distinct(shingleArr)).as("s"))
        .select(col("doc_id"), xxhash64(col("s")).as("h"))
        .agg(count(lit(1)), sum(col("h"))).collect()
    }
    time("5 full hashed posting self-join (x49 core)") {
      val keep = base
        .select(col("doc_id"), explode(array_distinct(shingleArr)).as("s"))
        .select(col("doc_id"), xxhash64(col("s")).as("shingle"))
      val a = keep.select(col("doc_id").as("doc_a"), col("shingle"))
      val b = keep.select(col("doc_id").as("doc_b"), col("shingle"))
      a.join(b, Seq("shingle")).where(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("common"))
        .agg(count(lit(1))).collect()
    }
    time("6 x49 registered query") {
      (graft.SparkEntry.queries ++ graft.SparkEntry.benchOnly)
        .apply("x49_jaccard_xxhash")(spark, dir).count()
    }
    spark.stop()
  }
}
