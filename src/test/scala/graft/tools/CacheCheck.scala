package graft.tools

import graft.Session

/** Dev-only probe: distribution of trivial-job and cached-scan times on
  * this box — separates plan cost from scheduler/VM hiccups.
  */
object CacheCheck {
  def main(args: Array[String]): Unit = {
    val spark = Session.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def dist(label: String, n: Int)(f: => Any): Unit = {
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"DIST $label: min=${ts.head}%.3f p50=${ts(n / 2)}%.3f p90=${ts(n * 9 / 10)}%.3f max=${ts.last}%.3f")
    }
    spark.range(1).count()
    dist("trivial", 50)(spark.range(1).count())
    val cached = spark.range(5000).selectExpr("id", "id % 20 as k").cache()
    cached.count()
    dist("cached_count", 50)(cached.count())
    val shuffled = cached.groupBy("k").count()
    dist("small_shuffle", 30)(shuffled.count())
    spark.stop()
  }
}
