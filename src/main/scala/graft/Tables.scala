package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  *
  * Each table is a single parquet file under `sfDir`. Reads are plain
  * `spark.read.parquet` so Catalyst's column pruning and filter pushdown
  * reach the scan; at cluster scale the same call works on a partitioned
  * directory unchanged.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Normalize a raw events frame to the `ts` contract: nanos-since-epoch
    * BIGINT, regardless of how the generator encoded the column. Older
    * testdata drops stored parquet timestamp[ns] (which Spark can only
    * read as long, via the nanosAsLong conf); the r10 drop stores
    * timestamp[us], which Spark reads as TIMESTAMP_NTZ — converted back
    * to nanos here (session tz is UTC, matching the oracle's epoch_ns(ts)
    * over the same files). Works on batch and streaming frames alike.
    * Scale note: filters on the derived ts don't push to the parquet
    * scan; a cluster deployment filtering a time range should filter the
    * raw timestamp column before this projection.
    */
  def eventsNanos(df: DataFrame): DataFrame =
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType) df
    else df.withColumn("ts",
      org.apache.spark.sql.functions.expr(
        "unix_micros(cast(ts as timestamp)) * 1000L"))

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") eventsNanos(df) else df
  }

  /** events with `ts` (nanos-since-epoch long, see Session nanosAsLong
    * config) plus a derived microsecond-precision `ts_utc` timestamp column.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "events")
      .withColumn("ts_utc", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))

  /** Register every table as a temp view so `spark.sql` queries work. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
