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
    * Batch loads avoid this in-plan projection entirely via the one-time
    * ingest normalization in [[load]]; this stays the streaming/fallback
    * path.
    */
  def eventsNanos(df: DataFrame): DataFrame =
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType) df
    else df.withColumn("ts",
      org.apache.spark.sql.functions.expr(
        "unix_micros(cast(ts as timestamp)) * 1000L"))

  /** Scratch location of the once-per-drop normalized events copy, keyed
    * by (source path, size, mtime) so a new generator drop re-normalizes.
    */
  private val normCache = new java.util.concurrent.ConcurrentHashMap[String, Option[String]]()

  /** One-time ingest normalization (the bronze→silver step of a real
    * lake): when the generator encodes `ts` as a physical parquet
    * timestamp, rewrite the events table ONCE per data drop into a
    * scratch copy with `ts` as physical BIGINT nanos. Every subsequent
    * batch load reads the normalized file, so time predicates push down
    * to the parquet scan (row-group min/max pruning — the property that
    * keeps a 100 TB event lake prunable) and no per-row timestamp
    * conversion runs inside queries. At cluster scale this is the ingest
    * job's write, not per-query work. Returns None (in-plan projection
    * fallback) if the scratch dir is unwritable.
    */
  private def normalizedEventsPath(spark: SparkSession, sfDir: String): Option[String] = {
    val src = new java.io.File(s"$sfDir/events.parquet")
    val key = s"${src.getAbsolutePath}:${src.length}:${src.lastModified}"
    normCache.computeIfAbsent(key, _ =>
      try {
        val digest = java.security.MessageDigest.getInstance("MD5")
          .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
        val dst = new java.io.File(
          sys.props("java.io.tmpdir"), s"graft_norm_events_$digest")
        if (!new java.io.File(dst, "_SUCCESS").exists()) {
          eventsNanos(spark.read.parquet(src.getPath))
            .write.mode("overwrite").parquet(dst.getPath)
        }
        Some(dst.getPath)
      } catch {
        case scala.util.control.NonFatal(_) => None
      })
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name != "events") return spark.read.parquet(s"$sfDir/$name.parquet")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType) raw
    else normalizedEventsPath(spark, sfDir) match {
      case Some(p) => spark.read.parquet(p)
      case None    => eventsNanos(raw)
    }
  }

  /** Raw on-disk schema of a table file, BEFORE any normalization.
    * Streaming file sources must be given this schema: a file stream
    * forced to a *different* schema (e.g. [[load]]'s post-projection
    * LONG `ts`) makes parquet silently reinterpret the physical values
    * instead of converting them.
    */
  def rawSchema(spark: SparkSession, sfDir: String, name: String): org.apache.spark.sql.types.StructType =
    spark.read.parquet(s"$sfDir/$name.parquet").schema

  /** File-source stream over `streamDir` containing copies of `name`'s
    * raw parquet files, normalized to the same contract as [[load]]
    * (events → `ts` nanos). Specs build batch/stream parity pairs through
    * this so a generator change to the physical timestamp encoding can't
    * silently desynchronize the two paths.
    */
  def loadStream(spark: SparkSession, sfDir: String, name: String,
                 streamDir: String, options: Map[String, String] = Map.empty): DataFrame = {
    val reader = options.foldLeft(spark.readStream.schema(rawSchema(spark, sfDir, name))) {
      case (r, (k, v)) => r.option(k, v)
    }
    val df = reader.parquet(streamDir)
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
