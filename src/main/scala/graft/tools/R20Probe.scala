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

    // r20 second batch: ROLLUP (q76) and CUBE (q83) partial-reuse
    val e = Analytics.qRollup(spark, sfDir)
    val f = Analytics.qRollupExpand(spark, sfDir)
    val diff76 = e.exceptAll(f).count() + f.exceptAll(e).count()
    println(s"== q76 partial-reuse vs expand exceptAll diff: $diff76")
    require(diff76 == 0, "q76 spellings diverge")
    ProbeTiming.time("q76 partial-reuse (adopted)") {
      Bench.force(Analytics.qRollup(spark, sfDir))
    }
    ProbeTiming.time("q76 rollup-expand (retired)") {
      Bench.force(Analytics.qRollupExpand(spark, sfDir))
    }
    val g = Analytics.qCubePartialReuse(spark, sfDir)
    val h = Analytics.qCube(spark, sfDir)
    val diff83 = g.exceptAll(h).count() + h.exceptAll(g).count()
    println(s"== q83 partial-reuse vs expand exceptAll diff: $diff83")
    require(diff83 == 0, "q83 spellings diverge")
    ProbeTiming.time("q83 partial-reuse (REJECTED)") {
      Bench.force(Analytics.qCubePartialReuse(spark, sfDir))
    }
    ProbeTiming.time("q83 cube-expand (shipped)") {
      Bench.force(Analytics.qCube(spark, sfDir))
    }
    spark.stop()
  }
}
