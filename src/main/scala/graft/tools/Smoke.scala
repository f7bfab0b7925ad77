package graft.tools

import graft.{Session, SparkEntry}

/** Dev-only replica of the driver's smoke check: entry() must return
  * rows > 0 on sf0.001 in a fresh session.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Session.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = SparkEntry.entry(spark).count()
    println(s"SMOKE entry rows=$n")
    require(n > 0, "entry() returned no rows")
    spark.stop()
  }
}
