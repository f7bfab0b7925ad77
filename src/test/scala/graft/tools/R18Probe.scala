package graft.tools

import graft.Session

/** r18 generic warm probe: honest-forced (Bench.force — the r17
  * measurement-honesty convention) best-of-3 with per-run scheduler job
  * and stage counts, over any corpus dir and query list. Used for the
  * duplication-structure audit warm readings (VERDICT r17 #1) and the
  * q147 fused-attach before/after job-count comparison (#3).
  * Usage: Test/runMain graft.tools.R18Probe <dir> <query...>
  * SPARK_GRAFT_PROBE_REPS (default 3) sizes the warm pass — the 100×
  * duplication corpus readings use 1 (cold dominates there).
  */
object R18Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Session.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size)
        }
      })

    args.drop(1).foreach { name =>
      val fn = (graft.SparkEntry.queries ++ graft.SparkEntry.benchOnly)(name)
      try {
        val t0 = System.nanoTime()
        val rows = graft.Bench.force(fn(spark, dir)) // cold: fills persists
        val cold = (System.nanoTime() - t0) / 1e9
        System.gc()
        val runs = (1 to reps).map { _ =>
          Thread.sleep(200) // listener bus drain
          jobs.set(0); stages.set(0)
          val s0 = System.nanoTime()
          graft.Bench.force(fn(spark, dir))
          val wall = (System.nanoTime() - s0) / 1e9
          Thread.sleep(200)
          (wall, jobs.get, stages.get)
        }
        val best = runs.minBy(_._1)
        println(f"== $name: cold ${cold}%.2fs warm_best ${best._1}%.3fs " +
          f"(runs ${runs.map(r => f"${r._1}%.3f").mkString("/")}) " +
          f"jobs ${best._2} stages ${best._3} rows $rows")
      } catch {
        case e: Throwable =>
          println(s"== $name: FAILED ${Option(e.getMessage).getOrElse(e.getClass.getName).take(200)}")
      } finally spark.catalog.clearCache()
    }
    spark.stop()
  }
}

/** r18 stage decomposition under HONEST forcing: per-stage task counts,
  * summed executor time, and the longest task — locates serialized
  * compute (one long task in a wide stage) that wall-clock alone cannot
  * attribute. Usage: Test/runMain graft.tools.R18Probe2 <dir> <query...>
  */
object R18Probe2 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Session.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val stages = scala.collection.concurrent.TrieMap[Int, (Int, Long, Long, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        private val maxTask = scala.collection.concurrent.TrieMap[Int, Long]()
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          maxTask.updateWith(t.stageId)(m =>
            Some(math.max(m.getOrElse(0L), t.taskInfo.duration)))
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          stages(i.stageId) = (i.numTasks, i.taskMetrics.executorRunTime,
            maxTask.getOrElse(i.stageId, 0L), i.name.take(60))
        }
      })
    args.drop(1).foreach { name =>
      val fn = (graft.SparkEntry.queries ++ graft.SparkEntry.benchOnly)(name)
      graft.Bench.force(fn(spark, dir)) // cold / persist fill
      stages.clear()
      Thread.sleep(300)
      val t0 = System.nanoTime()
      graft.Bench.force(fn(spark, dir))
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"== $name warm $wall%.3fs")
      stages.toSeq.sortBy(_._1).foreach { case (id, (n, run, mx, nm)) =>
        println(f"   stage $id%4d tasks $n%4d run ${run / 1e3}%8.2fs maxTask ${mx / 1e3}%7.2fs  $nm")
      }
      spark.catalog.clearCache()
      stages.clear()
    }
    spark.stop()
  }
}
