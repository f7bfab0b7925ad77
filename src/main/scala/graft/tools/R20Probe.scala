package graft.tools

import graft.{Bench, Session}
import graft.operators.Analytics

/** r20 A/B probe (VERDICT r19 #1): the Expand-based GROUPING SETS / mixed-
  * distinct plans vs their partial-reuse decompositions, same JVM, same
  * window — the adjudication evidence for the suite's last two >2× rows.
  * Dev-only; the adopted spellings ship in Analytics/Gold, this probe
  * keeps the rejected alternative runnable for re-measurement.
  */
object R20Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = Session.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (args.contains("--plan")) {
      val df = Analytics.qGroupingSets(spark, sfDir)
      Bench.force(df)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      println("===== q08 =====")
      val df8 = graft.operators.Relational.qTimeSeries(spark, sfDir)
      Bench.force(df8)
      println(df8.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      spark.stop()
      return
    }

    // correctness first: the two spellings must be row-identical
    val a = Analytics.qGroupingSets(spark, sfDir)
    val b = Analytics.qGroupingSetsExpand(spark, sfDir)
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(s"== q92 partial-reuse vs expand exceptAll diff: $diff")
    require(diff == 0, "q92 spellings diverge")

    ProbeTiming.time("q92 partial-reuse (adopted)") {
      Bench.force(Analytics.qGroupingSets(spark, sfDir))
    }
    ProbeTiming.time("q92 expand (retired)") {
      Bench.force(Analytics.qGroupingSetsExpand(spark, sfDir))
    }

    val c = graft.operators.Relational.qTimeSeries(spark, sfDir)
    val d = graft.operators.Relational.qTimeSeriesExpand(spark, sfDir)
    val diff08 = c.exceptAll(d).count() + d.exceptAll(c).count()
    println(s"== q08 pre-agg vs expand exceptAll diff: $diff08")
    require(diff08 == 0, "q08 spellings diverge")
    ProbeTiming.time("q08 pre-agg (adopted)") {
      Bench.force(graft.operators.Relational.qTimeSeries(spark, sfDir))
    }
    ProbeTiming.time("q08 expand (retired)") {
      Bench.force(graft.operators.Relational.qTimeSeriesExpand(spark, sfDir))
    }
    spark.stop()
  }
}
