package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Sinks and scans (SURVEY §2.1): Hive-partitioned and flat parquet silver
  * sinks, the overwrite gold sink (which subsumes the reference's whole
  * purge-Lambda + CTAS dance, purge_and_load.py:65-114 — S13/S14), CSV
  * scan/sink, and catalog registration.
  */
object Writers {

  /** S5: silver sink, Hive-partitioned by (year, sorteo)
    * (reference transformer.py:253-258 layout
    * `silver/{ds}/year=Y/sorteo=N/`). Append: each weekly run adds new
    * partitions; idempotency comes from the incremental scan upstream
    * ([[graft.parse.Silver.skipProcessed]]).
    */
  def writeSilverPartitioned(df: DataFrame, path: String): Unit =
    df.write.mode("append").partitionBy("year", "sorteo").parquet(path)

  /** S6: flat parquet sink (notebook convenience copies,
    * transformer.py:244-248).
    */
  def writeFlat(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** S13/S14: gold sink — full idempotent rebuild. `mode("overwrite")`
    * replaces the reference's DROP TABLE + empty-the-prefix + CTAS
    * choreography in one atomic writer call.
    */
  def writeGold(df: DataFrame, path: String, partitionByYear: Boolean = false): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionByYear) w.partitionBy("year") else w).parquet(path)
  }

  /** S14 (incremental): DYNAMIC partition overwrite — replaces only the
    * partitions present in `df`, leaving every other partition untouched.
    * This is the reprocess-one-week pattern at warehouse scale: a
    * corrected batch rewrites its own (year, sorteo) directories without
    * the read-modify-write of a full overwrite and without `append`'s
    * duplicate risk on rerun. The option is per-write, so no global
    * `partitionOverwriteMode` conf leaks into other writers.
    */
  def overwritePartitions(df: DataFrame, path: String,
      partitionCols: Seq[String] = Seq("year", "sorteo")): Unit =
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** S8: CSV scan (header + schema inference at the notebook boundary only —
    * SURVEY §1.2: inference is allowed at Bronze/notebook edges, never for
    * the silver contract).
    */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** S9: CSV sink. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** S11: session-scoped catalog registration — temp views over silver,
    * for single-session pipelines ([[registerSilverPersistent]] is the
    * metastore-backed form).
    */
  def registerSilver(sorteos: DataFrame, premios: DataFrame): Unit = {
    sorteos.createOrReplaceTempView("sorteos")
    premios.createOrReplaceTempView("premios")
  }

  /** S11 (persistent): EXTERNAL-table registration via saveAsTable —
    * metadata lands in the session's metastore (a Hive-compatible catalog,
    * [[graft.Session.builderWithCatalog]]) and survives the session; data
    * stays at `path` in the same partition layout the path-based writers
    * produce, so existing path readers keep working. This is the
    * Spark-native replacement for the reference's Glue crawler
    * (terraform/modules/catalog/main.tf:37-94): no crawl step, the write
    * IS the registration.
    */
  def saveAsExternalTable(df: DataFrame, name: String, path: String,
      partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").option("path", path)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).saveAsTable(name)
  }

  /** Persistent form of [[registerSilver]]: silver tables by name in the
    * metastore, backed by `<root>/silver/<table>`.
    */
  def registerSilverPersistent(sorteos: DataFrame, premios: DataFrame, root: String): Unit = {
    saveAsExternalTable(sorteos, "sorteos", s"$root/silver/sorteos")
    saveAsExternalTable(premios, "premios", s"$root/silver/premios")
  }

  /** Persistent form of [[writeGold]]: the gold rebuild self-registers in
    * the metastore under `name` (the reference's CTAS-self-registration
    * semantics, sql/gold/README.md:20-29) while keeping the same
    * overwrite-idempotent parquet layout at `path`.
    */
  def writeGoldTable(df: DataFrame, name: String, path: String,
      partitionByYear: Boolean = false): Unit =
    saveAsExternalTable(df, name, path, if (partitionByYear) Seq("year") else Nil)

  /** Small-file compaction: rewrite a parquet directory into
    * ceil(bytes/targetBytes) files. Incremental appends (weekly silver
    * runs, streaming sinks) accumulate files far smaller than a scan's
    * ideal split; at warehouse scale the fix is this periodic rewrite —
    * read once, `repartition(n)` (round-robin, so output files are
    * even-sized), then swap staging into place.
    *
    * UNPARTITIONED directories only: a Hive-partitioned table
    * (`key=value` subdirectories) is refused, because a flat rewrite
    * would demote the inferred partition columns to data columns and
    * destroy partition pruning — use [[compactPartitioned]], which
    * compacts each leaf partition in place. The swap is staging-write +
    * two renames (dir → `.compact-old`, staging → dir) and is NOT a
    * single atomic operation: a concurrent reader can observe a brief
    * window where `path` is absent, and a crash between the renames
    * leaves the live data at `<path>.compact-old`. The next compact()
    * run self-heals: if `path` is missing and a backup exists it
    * restores backup → path FIRST (the backup is the only copy in that
    * state — it must never be treated as stale garbage), and only when
    * the live dir is present does it clear leftover staging/backup from
    * an earlier crash. If the second rename fails the original
    * directory is restored in place, so the table never STAYS missing.
    * Returns the output file count.
    */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    import java.nio.file.{Files, Path, Paths, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    import scala.util.Using
    import scala.util.control.NonFatal
    val dir = Paths.get(path)
    val staging = Paths.get(path + ".compact-staging")
    val backup = Paths.get(path + ".compact-old")
    // crash between the two renames leaves the ONLY copy at backup with
    // `dir` absent — restore it rather than treating it as stale garbage
    if (!Files.exists(dir) && Files.exists(backup))
      Files.move(backup, dir, StandardCopyOption.ATOMIC_MOVE)
    val partitionDirs = Using.resource(Files.list(dir)) { s =>
      s.iterator().asScala
        .filter(p => Files.isDirectory(p) && p.getFileName.toString.contains("="))
        .take(1).toList
    }
    require(partitionDirs.isEmpty,
      s"compact() is for unpartitioned directories; $path has partition " +
        s"subdirectory ${partitionDirs.head.getFileName} — use compactPartitioned()")
    // the live dir is present, so leftovers from a previous crashed run
    // really are stale (a stale backup would make the dir→backup rename
    // below fail)
    deleteTree(staging); deleteTree(backup)
    val bytes = Using.resource(Files.walk(dir)) { s =>
      s.iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
        .map(Files.size).sum
    }
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    spark.read.parquet(path).repartition(n)
      .write.mode("overwrite").parquet(staging.toString)
    Files.move(dir, backup, StandardCopyOption.ATOMIC_MOVE)
    try Files.move(staging, dir, StandardCopyOption.ATOMIC_MOVE)
    catch { case NonFatal(e) =>
      // put the original back so the table path never stays missing
      Files.move(backup, dir, StandardCopyOption.ATOMIC_MOVE)
      throw e
    }
    // cleanup of the displaced originals; the table is already live, so a
    // failure here must not fail the compact — a stray .compact-old is
    // harmless and is cleared by the next run's pre-clean above
    try deleteTree(backup) catch { case NonFatal(_) => () }
    n
  }

  /** [[compact]] for Hive-partitioned tables: finds every leaf directory
    * that directly holds parquet files and compacts it in place, so the
    * `key=value` layout (and partition pruning) survives. Returns the
    * total output file count across leaves.
    */
  def compactPartitioned(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    import scala.util.Using
    val leaves = Using.resource(Files.walk(Paths.get(path))) { s =>
      s.iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
        .map(_.getParent).toSet
    }
    leaves.toSeq.sortBy(_.toString).map(p => compact(spark, p.toString, targetBytes)).sum
  }

  private def deleteTree(root: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    import scala.jdk.CollectionConverters._
    import scala.util.Using
    if (Files.exists(root))
      Using.resource(Files.walk(root)) { s =>
        s.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      }
  }

  /** Range-clustered sink: `repartitionByRange` + in-partition sort on
    * the cluster keys before writing, so each output file covers a
    * narrow, near-disjoint key range and its parquet footer min/max
    * stats actually prune — a selective key predicate then skips most
    * files/row-groups at the scan. This is the layout lever for 100 TB
    * fact tables (the poor cousin of Z-ordering, good enough when one
    * leading key dominates predicates).
    */
  def writeRangeClustered(df: DataFrame, path: String, numFiles: Int,
      clusterCols: Seq[String]): Unit = {
    val cols = clusterCols.map(org.apache.spark.sql.functions.col)
    df.repartitionByRange(numFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Morton spread: the low 31 bits of a non-negative long, with one zero
    * bit inserted between consecutive bits (2-D interleave masks — NOT the
    * every-third-bit 3-D ladder) — classic mask-and-shift, expressed in
    * Column ops so it stays inside whole-stage codegen (no UDF).
    */
  private def spreadBits(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, shiftleft}
    var x = c.bitwiseAND(lit(0x7FFFFFFFL))
    x = x.bitwiseOR(shiftleft(x, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x3333333333333333L))
    x = x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x5555555555555555L))
    x
  }

  /** Z-value (Morton interleave) of two non-negative integer columns,
    * each truncated to 31 bits. Exposed for tests.
    */
  private[sources] def zValue(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.shiftleft
    spreadBits(a.cast("long")).bitwiseOR(shiftleft(spreadBits(b.cast("long")), 1))
  }

  /** Z-order clustered sink: range-partition + sort on the Morton
    * interleave of TWO cluster keys, so each output file covers a small
    * RECTANGLE in (a, b) space and parquet footer min/max stats prune
    * selective predicates on EITHER dimension — the multi-dimensional
    * upgrade of [[writeRangeClustered]], whose single-key sort prunes
    * only its leading key. Keys must be non-negative integers under 2^31
    * (hash or bucketize wider domains first). The helper z column is
    * dropped before the write, so the on-disk schema is unchanged.
    */
  def writeZOrdered(df: DataFrame, path: String, numFiles: Int,
      colA: String, colB: String): Unit = {
    import org.apache.spark.sql.functions.col
    df.withColumn("__z", zValue(col(colA), col(colB)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
