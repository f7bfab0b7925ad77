package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._
import graft.{Session, Tables}

/** Stage-level metrics for the q49 pair expansion at a given corpus:
  * prints per-stage wall, executor CPU, shuffle read/write and spill so
  * the 10x-vs-100x blowup (same ~113M-pair output, ~15x the wall) can be
  * attributed to a concrete term.
  * Usage: Test/runMain graft.tools.R16Probe2 <docsDir>
  */
object R16Probe2 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Session.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        println(f"[stage ${si.stageId}%3d] ${si.name.take(60)}%-60s tasks=${si.numTasks}%4d " +
          f"wall=${(si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3}%8.1fs " +
          f"cpu=${m.executorCpuTime / 1e9}%8.1fs run=${m.executorRunTime / 1e3}%8.1fs " +
          f"shRead=${m.shuffleReadMetrics.totalBytesRead / 1e6}%9.1fMB " +
          f"shWrite=${m.shuffleWriteMetrics.bytesWritten / 1e6}%9.1fMB " +
          f"memSpill=${m.memoryBytesSpilled / 1e6}%9.1fMB diskSpill=${m.diskBytesSpilled / 1e6}%9.1fMB")
      }
    })

    // optional second arg: run a REGISTERED query under the listener
    // instead of the inlined pair_agg decomposition
    if (args.length > 1) {
      val name = args(1)
      val fn = (graft.SparkEntry.queries ++ graft.SparkEntry.benchOnly)(name)
      val t0 = System.nanoTime()
      val cnt = fn(spark, dir).count()
      println(f"=== $name: ${(System.nanoTime() - t0) / 1e9}%.1fs rows=$cnt ===")
      spark.stop()
      return
    }

    val docs = Tables.load(spark, dir, "documents")
    val sh = docs
      .select(col("doc_id"), explode(call_function("word_shingles",
        col("text"), lit(3), lit(true))).as("shingle"))
      .select(col("doc_id"), xxhash64(col("shingle")).as("shingle"))
      .persist()
    sh.count()
    val nDocs = docs.select(count(lit(1)).as("n_docs"))
    val hot = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .where(col("df") > col("n_docs") * 0.5)
      .select(col("shingle"))
    val keep = sh.join(broadcast(hot), Seq("shingle"), "left_anti").persist()
    keep.count()
    println("=== pair_agg stages begin ===")
    val parts = 4 * spark.sparkContext.defaultParallelism
    val keyed = keep.repartition(parts, col("shingle"))
    val a = keyed.select(col("doc_id").as("doc_a"), col("shingle"))
    val b = keyed.select(col("doc_id").as("doc_b"), col("shingle")).hint("merge")
    val t0 = System.nanoTime()
    val n = a.join(b, Seq("shingle")).where(col("doc_a") < col("doc_b"))
      .repartition(parts, col("doc_a"), col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("common"))
      .count()
    println(f"=== pair_agg: ${(System.nanoTime() - t0) / 1e9}%.1fs n=$n ===")
    spark.stop()
  }
}
