package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Session

/** Dev-only q57 shape probe: the retired r12 bucketed band self-join
  * vs the r13 window range-frame spelling now in Temporal.qRangeJoin
  * (one shuffle of n rows, no join, no explode). Same method as
  * Profile: warmup + best-of-3 within one invocation. Not part of the
  * engine surface.
  */
object Q57Probe {

  /** The r12 spelling — promoted to the operator surface in r14 as
    * `Temporal.rangeJoinBucketed` (qRangeJoin's >budget fallback);
    * delegated here so the A/B can't drift from the shipped fallback.
    */
  def bucketedJoin(s: SparkSession, dir: String): DataFrame =
    graft.operators.Temporal.rangeJoinBucketed(s, dir)

  private def time(label: String)(mk: => DataFrame): Unit = {
    mk.count() // warmup
    System.gc()
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); mk.count(); (System.nanoTime() - t0) / 1e9
    }
    println(f"== $label: best ${ts.min}%.3fs of ${ts.map(t => f"$t%.2f").mkString(",")}")
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Session.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    time("q57_bucketed_join")(bucketedJoin(spark, dir))
    time("q57_window_range")(graft.operators.Temporal.qRangeJoin(spark, dir))

    // cross-check: both spellings must produce the identical row set
    val a = bucketedJoin(spark, dir)
    val b = graft.operators.Temporal.qRangeJoin(spark, dir)
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(s"== rowset diff: $diff (0 = identical)")
    spark.stop()
  }
}
