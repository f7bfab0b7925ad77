package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Session, Tables}

/** Dev-only q57 shape probe: the retired r12 bucketed band self-join
  * vs the r13 window range-frame spelling now in Temporal.qRangeJoin
  * (one shuffle of n rows, no join, no explode). Same method as
  * Profile: warmup + best-of-3 within one invocation. Not part of the
  * engine surface.
  */
object Q57Probe {
  private val BandNs = 300L * 1000 * 1000 * 1000

  /** The r12 spelling, kept verbatim for the A/B. */
  def bucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "events").select("user_id", "ts", "event_type")
    val a = e.toDF("user_id", "ts_a", "type_a")
      .withColumn("bkt", explode(array(
        expr(s"ts_a DIV $BandNs"), expr(s"ts_a DIV $BandNs") + lit(1L))))
    val b = e.toDF("user_id_b", "ts_b", "type_b")
      .withColumn("bkt_b", expr(s"ts_b DIV $BandNs"))
    a.join(b,
        col("user_id") === col("user_id_b") && col("bkt") === col("bkt_b") &&
          col("ts_b") > col("ts_a") && col("ts_b") - col("ts_a") <= BandNs)
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

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
