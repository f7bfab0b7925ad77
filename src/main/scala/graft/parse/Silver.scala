package graft.parse

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import Transformer.{Premio, SilverDraw, Sorteo}

/** Bronze → Silver: whole-file text scan, per-file atomic parse (flatMap),
  * typed silver Datasets with the enforced schema, and the incremental
  * skip-processed scan.
  *
  * Scale design: a draw file is small (KBs) and the parse is per-file
  * sequential by CONTRACT (the body fold is order-dependent,
  * reference parser.py:106-119) — so the unit of parallelism is the file.
  * `wholetext` keeps file = record; at 100 TB of draws this is a
  * many-small-files scan, which Spark packs into tasks via
  * spark.sql.files.maxPartitionBytes — no driver-side listing loops.
  */
object Silver {

  /** S1: raw text scan, one record per file with its path. */
  def rawDraws(spark: SparkSession, rawPath: String): Dataset[(String, String)] = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(rawPath)
      .select(input_file_name().as("path"), col("value").as("content"))
      .as[(String, String)]
  }

  /** S3: partition-key extraction from the path
    * (reference transformer.py:110-115 `sorteo=(\d+)/`).
    */
  val SorteoFromPath = ".*sorteo=(\\d+)/.*".r

  /** S4: incremental scan — drop raw files whose `sorteo=` path key already
    * exists in silver. Distributed anti-join on the partition value, the
    * Spark shape of the reference's processed-set check
    * (transformer.py:91-117); no driver-side set.
    */
  def skipProcessed(
      raw: Dataset[(String, String)],
      processedSorteos: DataFrame): Dataset[(String, String)] = {
    import raw.sparkSession.implicits._
    raw.toDF("path", "content")
      .withColumn("sorteo", regexp_extract(col("path"), "sorteo=(\\d+)/", 1).cast("long"))
      .join(processedSorteos.select(col("sorteo").cast("long").as("sorteo")),
        Seq("sorteo"), "left_anti")
      .select(col("path"), col("content"))
      .as[(String, String)]
  }

  /** Already-present silver partition keys (empty frame if silver doesn't
    * exist yet).
    */
  def processedSorteos(spark: SparkSession, silverSorteosPath: String): DataFrame = {
    import spark.implicits._
    // Only path-not-found means "first run, nothing processed". Any OTHER
    // read failure (corrupt footer, transient IO) must propagate: silently
    // returning the empty set would reprocess EVERYTHING into the
    // append-mode silver writer and duplicate every row.
    try spark.read.parquet(silverSorteosPath).select(col("sorteo")).distinct()
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getCondition == "PATH_NOT_FOUND" =>
        Seq.empty[Long].toDF("sorteo")
    }
  }

  /** Parse every raw file into typed silver draws. Malformed files THROW
    * (whole-file atomicity, parser.py contract) unless `lenient`, which
    * drops them — the reference logs-and-continues only for files missing
    * the path key; parse errors are hard failures.
    */
  def parseDraws(raw: Dataset[(String, String)], lenient: Boolean = false): Dataset[SilverDraw] = {
    import raw.sparkSession.implicits._
    if (lenient)
      raw.flatMap { case (_, content) =>
        scala.util.Try(Transformer.toSilver(Parser.parseDraw(content))).toOption
      }
    else raw.map { case (_, content) => Transformer.toSilver(Parser.parseDraw(content)) }
  }

  def sorteos(draws: Dataset[SilverDraw]): Dataset[Sorteo] = {
    import draws.sparkSession.implicits._
    draws.map(_.sorteo)
  }

  def premios(draws: Dataset[SilverDraw]): Dataset[Premio] = {
    import draws.sparkSession.implicits._
    draws.flatMap(_.premios)
  }
}
