package graft.tools

import graft.{Bench, Session, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd, SparkListenerStageCompleted}

/** r20 optimization profiler: run named queries (gated or bench-only) with a
  * job/stage listener attached and print, per job, wall elapsed + stage
  * breakdown (name, tasks, bytes shuffled) — the guide-§1 "where is the time
  * going" decomposition the disabled UI would otherwise give. Dev-only.
  *
  * Usage: runMain graft.tools.R20Prof <sfDir> <query>[,<query>...] [--cold]
  */
object R20Prof {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSeq
    val cold = args.contains("--cold")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Session.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class JobRec(id: Int, desc: String, var start: Long = 0L, var end: Long = 0L)
    val jobs = scala.collection.mutable.LinkedHashMap[Int, JobRec]()
    val stageLines = scala.collection.mutable.ArrayBuffer[String]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs(e.jobId) = JobRec(e.jobId, d, e.time)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.get(e.jobId).foreach(_.end = e.time)
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        stageLines += f"    stage ${si.stageId}%3d ${si.name.take(40)}%-40s tasks=${si.numTasks}%4d " +
          f"in=${m.inputMetrics.bytesRead / 1e6}%7.1fMB sr=${m.shuffleReadMetrics.totalBytesRead / 1e6}%7.1fMB " +
          f"sw=${m.shuffleWriteMetrics.bytesWritten / 1e6}%7.1fMB runMs=${m.executorRunTime}%7d " +
          f"cpuMs=${m.executorCpuTime / 1000000}%7d gcMs=${m.jvmGCTime}%6d " +
          f"deserMs=${m.executorDeserializeTime}%6d outRows=${m.outputMetrics.recordsWritten}%8d swRows=${m.shuffleWriteMetrics.recordsWritten}%9d"
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val all = SparkEntry.queries ++ SparkEntry.benchOnly
    for (name <- names) {
      val fn = all(name)
      // warmup WITHOUT clearing the cache afterwards — Bench's timed runs
      // reuse the warmup-filled persists (clearCache happens after the
      // triple), so the steady-state run is what its numbers show
      if (!cold) Bench.force(fn(spark, dir))
      // best-of-3 like Bench, so readings are bench-comparable; the
      // job/stage dump is from the LAST run
      val els = (1 to (if (cold) 1 else 3)).map { _ =>
        jobs.clear(); stageLines.clear()
        val t0 = System.nanoTime()
        spark.sparkContext.setJobDescription(name)
        Bench.force(fn(spark, dir))
        (System.nanoTime() - t0) / 1e9
      }
      val el = els.min
      Thread.sleep(300) // let listener drain
      println(f"== $name best ${el}%6.3f s of ${els.map(e => f"$e%.3f").mkString("/")}, ${jobs.size} jobs")
      jobs.values.foreach { j =>
        println(f"  job ${j.id}%3d ${(j.end - j.start) / 1e3}%7.3f s  ${j.desc.take(80)}")
      }
      stageLines.foreach(println)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
