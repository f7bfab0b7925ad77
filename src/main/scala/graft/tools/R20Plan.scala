package graft.tools

import graft.{Bench, Session, SparkEntry}
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for named queries to plans/r20/<q>_<tag>.txt.
  * The plan is captured AFTER one forcing run (so AQE's final decisions and
  * cache substitutions are visible in the same shape the bench times).
  *
  * Usage: runMain graft.tools.R20Plan <sfDir> <outDir> <tag> <q>[,<q>...]
  */
object R20Plan {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val outDir = args(1); val tag = args(2)
    val names = args(3).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Session.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val all = SparkEntry.queries ++ SparkEntry.benchOnly
    for (name <- names) {
      val df = all(name)(spark, dir)
      Bench.force(df) // warm: fills persists, lets AQE finalize
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), txt)
      println(s"wrote $outDir/${name}_$tag.txt (${txt.length} chars)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
