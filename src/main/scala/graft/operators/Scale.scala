package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-out utilities for the shuffle shapes that break at 100 TB:
  * key skew (one hot key funnels into one task) and repeated co-located
  * joins (bucketing amortizes the shuffle across runs).
  *
  * AQE's skew-join splitting handles sort-merge skew adaptively; explicit
  * salting remains necessary when the skewed side feeds a groupBy or when
  * the small side must be replicated (e.g. hot-key dimension joins) — so
  * both paths exist here.
  */
object Scale {

  /** Salted inner equi-join: the big (skewed) side gets a deterministic
    * salt derived from a unique column's hash; the small side is replicated
    * across all `salts` values. Result is row-identical to
    * `big.join(small, key)` — asserted in ScaleSpec — while the shuffle
    * spreads each hot key over `salts` tasks.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      uniqueCol: String, salts: Int = 16): DataFrame = {
    val bigS = big.withColumn("__salt", pmod(xxhash64(col(uniqueCol)), lit(salts)))
    val smallS = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(salts - 1L))))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }

  /** Salted aggregation: two-phase groupBy for skewed group keys — partial
    * aggregate on (key, salt), then final on key. Exposes the map-side
    * combine explicitly for aggregates where Catalyst's partial agg isn't
    * enough (e.g. exact COUNT(DISTINCT) per hot key via two-level distinct).
    */
  def saltedDistinctCount(df: DataFrame, key: String, distinctCol: String,
      salts: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(col(distinctCol)), lit(salts)))
      // phase 1: distinct within (key, salt) — each hot key spread over salts tasks
      .select(col(key), col("__salt"), col(distinctCol)).distinct()
      // phase 2: counts add up because the salt partitions the distinct values
      .groupBy(col(key)).agg(count(lit(1)).as("n_distinct"))

  /** Bucketed writer: co-locates future joins/aggregations on `key` —
    * both tables bucketed the same way join with NO shuffle (asserted on
    * the physical plan in ScaleSpec). The 100 TB pattern for fact tables
    * joined repeatedly on the same key.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key. */
  def bucketedJoin(spark: SparkSession, tableA: String, tableB: String,
      key: String): DataFrame =
    spark.table(tableA).join(spark.table(tableB), Seq(key))

  /** File-level (block) sampling: read a deterministic hash-selected
    * subset of a parquet directory's FILES instead of row-sampling the
    * whole table. `df.sample(0.01)` still SCANS 100 TB to keep 1 TB; this
    * reads ~frac of the bytes, which is the only affordable way to cut an
    * exploratory slice of a warehouse-scale table. Selection hashes file
    * names with a seed, so it is reproducible, seed-rotatable, and
    * independent of listing order. Rows within selected files are
    * complete — block sampling is cluster sampling, so per-file row
    * correlation is the documented tradeoff vs row sampling.
    */
  def sampleFiles(spark: SparkSession, path: String, frac: Double,
      seed: Long = 0L): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac must be in (0, 1], got $frac")
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    import scala.util.Using
    val files = Using.resource(Files.walk(Paths.get(path))) { s =>
      s.iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
        .map(_.toString).toSeq.sorted
    }
    // threshold on a file-name hash mapped uniformly into [0, 2^32) —
    // every file decides independently, so the sample composes across
    // partition directories and is stable as files are added
    val bound = (frac * (1L << 32)).toLong
    val picked = files.filter { f =>
      (scala.util.hashing.MurmurHash3.stringHash(s"$f:$seed").toLong
        & 0xFFFFFFFFL) < bound
    }
    if (picked.isEmpty) spark.read.parquet(path).limit(0)
    // basePath keeps key=value partition columns alive when the selected
    // files sit under a Hive-partitioned layout
    else spark.read.option("basePath", path).parquet(picked: _*)
  }
}
