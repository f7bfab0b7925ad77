package graft.tools

import graft.{Session, SparkEntry}

/** Dev-only scheduler-floor probe (VERDICT r11 #8): times the named
  * queries Bench-style (warmup + best-of-3, per-query clearCache) at
  * SEVERAL local[N] parallelism levels in one JVM, plus the trivial-job
  * floor at each level. Floor-dominated queries (sub-100 ms DuckDB
  * anchors) should get FASTER with fewer threads — task-launch and AQE
  * round-trip cost is proportional to parallelism while their data is
  * too small to use it — which is the measured signature separating
  * scheduler floor from plan inefficiency.
  *
  * Usage: Test/runMain graft.tools.FloorProbe <sfDir> <p1,p2,...> <query...>
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val levels = args(1).split(",").map(_.trim.toInt)
    val names = args.drop(2)
    levels.foreach { p =>
      val spark = Session.builder(s"local[$p]", p).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      spark.range(1).count()
      val floor = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); spark.range(1).count(); (System.nanoTime() - t0) / 1e9
      }.min
      println(f"FLOORPROBE p=$p floor=$floor%.4f")
      names.foreach { name =>
        val fn = (SparkEntry.queries ++ SparkEntry.benchOnly)(name)
        try {
          fn(spark, sfDir).count()
          System.gc()
          val best = (1 to 3).map { _ =>
            val t0 = System.nanoTime(); fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9
          }.min
          println(f"FLOORPROBE p=$p q=$name t=$best%.4f")
        } catch {
          case e: Throwable => println(s"FLOORPROBE p=$p q=$name ERROR ${e.getMessage}")
        } finally spark.catalog.clearCache()
      }
      spark.stop()
      // a fresh builder for the next level must not reuse this context
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
    }
  }
}
