package graft.tools
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.Session.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(1))(spark, args(0))
    df.count()
    val p = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    println(p)
    spark.stop()
  }
}
