package graft.tools

import org.apache.spark.sql.functions._
import graft.Session

/** Dev-only decomposition of q142's cost on a given sf dir: times the
  * raw scan, the padded-string projection, the contains prefilter, the
  * replace-based tf counts, and the single-row stats aggregate
  * separately, so a regression can be attributed to a specific pass.
  * Usage: Test/runMain graft.tools.Q142Probe <sfDir>
  */
object Q142Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Session.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val terms = Seq("join", "window", "stream", "dup")
    val spaced = replace(
      concat(lit(" "), col("text"), lit(" ")), lit(" "), lit("  "))
    def pat(q: String) = lit(" " + q + " ")

    def time(label: String)(f: => Any): Unit =
      ProbeTiming.time(label)(f)

    time("raw scan sum(length)") {
      docs.agg(sum(length(col("text")))).collect()
    }
    time("dl regexp_count only") {
      docs.agg(sum(regexp_count(col("text"), lit("[^ ]+")))).collect()
    }
    time("spaced projection sum(length(s2))") {
      docs.select(spaced.as("s2")).agg(sum(length(col("s2")))).collect()
    }
    time("spaced + 4x contains") {
      docs.select(spaced.as("s2"))
        .agg(terms.map(q => sum(contains(col("s2"), pat(q)).cast("long")))
          .reduce(_ + _).as("x")).collect()
    }
    time("spaced + 4x replace-count tf") {
      docs.select(spaced.as("s2"))
        .agg(terms.map(q => sum(length(col("s2")) - length(replace(col("s2"), pat(q)))))
          .reduce(_ + _).as("x")).collect()
    }
    time("full stats aggregate") {
      val statsBase = docs
        .where(btrim(col("text")) =!= "")
        .select(regexp_count(col("text"), lit("[^ ]+")).cast("long").as("dl"),
          spaced.as("s2"))
        .select(col("dl") +: terms.zipWithIndex.map { case (q, i) =>
          contains(col("s2"), pat(q)).cast("long").as(s"p$i") }: _*)
      statsBase.agg(count(lit(1)), sum(col("dl")), sum(col("p0"))).collect()
    }
    time("full q142") {
      graft.SparkEntry.queries("q142_bm25_topdocs")(spark, dir).count()
    }
    spark.stop()
  }
}
