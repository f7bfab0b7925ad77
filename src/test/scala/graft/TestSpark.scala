package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite (session startup costs
  * seconds; specs must not each build their own).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = Session.builder("local[4]", 8).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
