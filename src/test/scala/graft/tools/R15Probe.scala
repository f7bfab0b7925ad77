package graft.tools

import org.apache.spark.sql.functions._
import graft.{Session, Tables}
import ProbeTiming.time

/** r15 decomposition probe for the q58 as-of spellings and the q164/q165
  * scaffold: times the compact-history pieces (build agg, probe join,
  * rollup) against the streamed union+fill spelling, and counts the jobs
  * each full query pays, so the BASELINE accept/rework note can attribute
  * the measured ratio to real terms.
  * Usage: Test/runMain graft.tools.R15Probe <temporalDir>
  */
object R15Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Session.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def jobs[A](label: String)(f: => A): Unit = {
      val sc = spark.sparkContext
      val before = sc.statusTracker.getJobIdsForGroup(null).length
      time(label)(f)
      val after = sc.statusTracker.getJobIdsForGroup(null).length
      println(s"   $label jobs=${after - before}")
    }

    val o = Tables.load(spark, dir, "orders")
      .select(col("o_custkey").as("k"),
        (unix_micros(col("o_orderdate").cast("timestamp")) * 1000).as("t_ns"),
        col("o_orderpriority").as("attr"))
    val e = Tables.load(spark, dir, "events")
      .select(col("user_id").as("k"), col("ts").as("t_ns"))

    // pieces of the compact-history spelling
    jobs("hist_agg_only")(o.groupBy(col("k"))
      .agg(sort_array(collect_list(struct(col("t_ns"), col("attr")))).as("hist"))
      .count())
    jobs("q58_compact_full")(graft.operators.Temporal.asofLatest(o, e)
      .groupBy(coalesce(col("last_attr"), lit("none")).as("p"))
      .agg(count(lit(1))).count())
    jobs("q58_streamed_full")(graft.operators.Temporal.asofLatestStreamed(o, e)
      .groupBy(coalesce(col("last_attr"), lit("none")).as("p"))
      .agg(count(lit(1))).count())
    // events-only scan floor
    jobs("events_scan")(e.agg(count(lit(1))).head())
    jobs("orders_scan")(o.agg(count(lit(1))).head())

    // q164 job count
    jobs("q164_full")(graft.SparkEntry.queries("q164_cusum_changepoint")(spark, dir).count())
    jobs("q165_full")(graft.SparkEntry.queries("q165_acf")(spark, dir).count())
    spark.stop()
  }
}

/** q49 pair-join parallelism probe: counts tasks per stage while running
  * jaccardPairs at 10x — confirms/refutes AQE coalescing collapsing the
  * posting-list self-join (whose OUTPUT is ~100x its input) to one task.
  * Usage: Test/runMain graft.tools.R15Probe2 <docsDir>
  */
object R15Probe2 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Session.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (Int, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        stages.put(i.stageId, (i.numTasks, i.taskMetrics.executorRunTime))
      }
    })
    val t0 = System.nanoTime()
    val n = graft.operators.TextOps.jaccardPairs(
      graft.Tables.load(spark, dir, "documents")).count()
    println(f"== jaccardPairs: ${(System.nanoTime() - t0) / 1e9}%.1fs rows=$n")
    stages.forEach { (id, v) =>
      println(f"   stage $id%3d tasks=${v._1}%4d runtime=${v._2}%8d ms")
    }
    spark.stop()
  }
}

/** Same as R15Probe2 but with AQE partition coalescing DISABLED — the
  * A/B for the hypothesis that size-based coalescing collapses the
  * pair-explosive self-join to one task.
  * Usage: Test/runMain graft.tools.R15Probe3 <docsDir>
  */
object R15Probe3 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Session.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val n = graft.operators.TextOps.jaccardPairs(
      graft.Tables.load(spark, dir, "documents")).count()
    println(f"== jaccardPairs(noCoalesce): ${(System.nanoTime() - t0) / 1e9}%.1fs rows=$n")
    spark.stop()
  }
}
