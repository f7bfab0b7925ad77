package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{Session, SparkEntry}

/** Dev-only plan/timing probe: runs named queries with warmup, prints
  * steady-state time and the formatted physical plan.
  * Usage: runMain graft.tools.Profile <sfDir> <query...> [--plan]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val wantPlan = args.contains("--plan")
    val names = args.drop(1).filterNot(_.startsWith("--"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Session.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = (SparkEntry.queries ++ SparkEntry.benchOnly)(name)
      graft.Bench.force(fn(spark, sfDir)) // warmup
      System.gc() // same convention as Bench: don't bill prior garbage
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); graft.Bench.force(fn(spark, sfDir)); (System.nanoTime() - t0) / 1e9
      }
      println(f"== $name: best ${times.min}%.3fs of ${times.map(t => f"$t%.2f").mkString(",")}")
      if (wantPlan) println(fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      spark.catalog.clearCache() // per-query cache policy, same as Bench
    }
    spark.stop()
  }
}
