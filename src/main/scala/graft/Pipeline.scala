package graft

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.SparkSession

import graft.gold.Gold
import graft.parse.Silver
import graft.sources.Writers

/** O1/O2: the end-to-end DAG driver — raw .txt draws → silver parquet →
  * seven gold tables, replacing the reference's Step Function
  * (orchestration/main.tf:115-238). Stages are plain function calls on one
  * SparkSession; the seven independent gold builds run with bounded
  * parallelism 3 (the reference's Map MaxConcurrency, main.tf:196-199) on
  * Spark's own scheduler via Futures.
  */
object Pipeline {

  val GoldConcurrency = 3

  /** Full run. Returns the per-gold-table row counts (the reference's own
    * acceptance style: "paste row counts into the PR", roadmap.md:493).
    */
  def run(spark: SparkSession, rawPath: String, outRoot: String,
      incremental: Boolean = true): Map[String, Long] = {
    // Bronze → Silver (skip already-processed draws when incremental)
    val silverSorteos = s"$outRoot/silver/sorteos"
    val silverPremios = s"$outRoot/silver/premios"
    // A raw glob matching no files is "nothing new this run" (the weekly
    // scrape may legitimately produce zero draws), not a pipeline error.
    val raw0 =
      try Silver.rawDraws(spark, rawPath)
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "PATH_NOT_FOUND" =>
          import spark.implicits._
          spark.emptyDataset[(String, String)]
      }
    val raw = if (incremental)
      Silver.skipProcessed(raw0, Silver.processedSorteos(spark, silverSorteos))
    else raw0
    // Materialize the increment ONCE and CUT its lineage (eager
    // localCheckpoint). persist() is not enough: isEmpty caches only the
    // first partition, so the premios write below could re-execute the
    // skip-processed anti-join AFTER the sorteos write — which would see
    // its own output as "already processed" and silently drop the new
    // draws' premios (write skew). The increment is bounded by arrival
    // rate, so checkpoint size is small at any corpus scale.
    val draws = Silver.parseDraws(raw).localCheckpoint()
    try {
      if (!draws.isEmpty) {
        Log.timed("silver_write", "path" -> silverSorteos) {
          Writers.writeSilverPartitioned(Silver.sorteos(draws).toDF(), silverSorteos)
          Writers.writeSilverPartitioned(Silver.premios(draws).toDF(), silverPremios)
        }
      } else Log.event("silver_write_skipped", "reason" -> "no new draws")
    } finally draws.unpersist()

    // First-run guard: no draws parsed AND no pre-existing silver → there
    // is nothing to build gold from (reading the absent path would throw).
    val fs = new org.apache.hadoop.fs.Path(silverSorteos)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(silverSorteos))) return Map.empty

    // Gold: read silver back (the canonical source), register the catalog,
    // rebuild all seven tables with bounded parallelism.
    val sorteos = spark.read.parquet(silverSorteos)
    val premios = spark.read.parquet(silverPremios)
    Writers.registerSilver(sorteos, premios)

    val pool = Executors.newFixedThreadPool(GoldConcurrency)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = Gold.builders.toSeq.map { case (name, build) =>
        Future {
          Log.timed("gold_build", "table" -> name) {
            val df = build(sorteos, premios)
            val partitioned = Set("gold_geo_winnings", "gold_vendor_leaderboard",
              "gold_time_series").contains(name)
            Writers.writeGold(df, s"$outRoot/gold/$name", partitioned)
            val rows = spark.read.parquet(s"$outRoot/gold/$name").count()
            Log.event("gold_rows", "table" -> name, "rows" -> rows)
            name -> rows
          }
        }
      }
      Await.result(Future.sequence(futures), Duration.Inf).toMap
    } finally pool.shutdown()
  }

  def main(args: Array[String]): Unit = {
    val Array(rawPath, outRoot) = args.take(2)
    val spark = Session.get(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
    val counts = Pipeline.run(spark, rawPath, outRoot)
    counts.toSeq.sortBy(_._1).foreach { case (n, c) => println(s"$n: $c rows") }
    spark.stop()
  }
}
