package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Session, Tables}

/** Same-JVM A/B for the q49 sizes-join rewrite: OLD spelling (aggregate
  * pairs, then join a (doc_id, n_sh) sizes table back on twice) vs NEW
  * (n_sh rides the posting/pair shuffles, max() reads it back). Alternates
  * A,B,A,B so co-tenant drift hits both arms equally — the only reliable
  * comparison on this shared box (q58 r15 convention).
  * Usage: Test/runMain graft.tools.R16Probe3 <docsDir> [hash]
  */
object R16Probe3 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val hash = args.length > 1 && args(1) == "hash"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Session.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    def top20(p: DataFrame): DataFrame = p
      .orderBy(col("jaccard").desc, col("doc_a").asc, col("doc_b").asc)
      .limit(20).select(col("doc_a"), col("doc_b"), col("common"), col("jaccard"))

    // arm C: row-local n_sh — per-doc shingle ARRAYS survive to the
    // hot-filter, which becomes array_except against the collected
    // (bounded: ≤ ~1/maxDfFrac per corpus unit) hot set; n_sh = size(ka)
    // computed at the scan, no window exchange/sort at all
    def buildC(): DataFrame = {
      val docs = Tables.load(spark, dir, "documents")
      val arr0 = docs.select(col("doc_id"),
        call_function("word_shingles", col("text"), lit(3), lit(true)).as("arr"))
      val arr = (if (hash) arr0.select(col("doc_id"),
          expr("transform(arr, s -> xxhash64(s))").as("arr"))
        else arr0).persist()
      val nDocs = docs.select(count(lit(1)).as("n_docs"))
      val hotArr = arr.select(col("doc_id"), explode(col("arr")).as("shingle"))
        .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(nDocs))
        .where(col("df") > col("n_docs") * 0.5)
        .agg(collect_list(col("shingle")).as("hot"))
      val keepN = arr.crossJoin(broadcast(hotArr))
        .select(col("doc_id"), array_except(col("arr"), col("hot")).as("ka"))
        .select(col("doc_id"), size(col("ka")).as("n_sh"), explode(col("ka")).as("shingle"))
      val parts = 4 * spark.sparkContext.defaultParallelism
      val keyed = keepN.repartition(parts, col("shingle"))
      val a = keyed.select(col("doc_id").as("doc_a"), col("shingle"), col("n_sh").as("n_a"))
      val b = keyed.select(col("doc_id").as("doc_b"), col("shingle"), col("n_sh").as("n_b"))
        .hint("merge")
      top20(a.join(b, Seq("shingle")).where(col("doc_a") < col("doc_b"))
        .repartition(parts, col("doc_a"), col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("common"), max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"))
        .withColumn("jaccard",
          col("common").cast("double") / (col("n_a") + col("n_b") - col("common"))))
    }

    // arm D: arm C + persisted keyed frame — tests whether materializing
    // the posting exchange ONCE (AQE stage reuse demonstrably does not
    // dedupe the two identical self-join-side exchanges; R16Probe2
    // stages 13/14 ran both, 1450 MB each at 100x) beats paying it twice
    def buildD(): DataFrame = {
      val docs = Tables.load(spark, dir, "documents")
      val arr0 = docs.select(col("doc_id"),
        call_function("word_shingles", col("text"), lit(3), lit(true)).as("arr"))
      val arr = (if (hash) arr0.select(col("doc_id"),
          expr("transform(arr, s -> xxhash64(s))").as("arr"))
        else arr0).persist()
      arr.count()
      val nDocs = docs.select(count(lit(1)).as("n_docs"))
      val hotArr = arr.select(explode(col("arr")).as("shingle"))
        .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(nDocs))
        .where(col("df") > col("n_docs") * 0.5)
        .agg(collect_list(col("shingle")).as("hot"))
      val keepN = arr.crossJoin(broadcast(hotArr))
        .select(col("doc_id"), array_except(col("arr"), col("hot")).as("ka"))
        .select(col("doc_id"), size(col("ka")).as("n_sh"), explode(col("ka")).as("shingle"))
      val parts = 4 * spark.sparkContext.defaultParallelism
      val keyed = keepN.repartition(parts, col("shingle")).persist()
      keyed.count()
      val a = keyed.select(col("doc_id").as("doc_a"), col("shingle"), col("n_sh").as("n_a"))
      val b = keyed.select(col("doc_id").as("doc_b"), col("shingle"), col("n_sh").as("n_b"))
        .hint("merge")
      top20(a.join(b, Seq("shingle")).where(col("doc_a") < col("doc_b"))
        .repartition(parts, col("doc_a"), col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("common"), max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"))
        .withColumn("jaccard",
          col("common").cast("double") / (col("n_a") + col("n_b") - col("common"))))
    }

    def build(old: Boolean): DataFrame = {
      val docs = Tables.load(spark, dir, "documents")
      val shRaw = docs.select(col("doc_id"),
        explode(call_function("word_shingles", col("text"), lit(3), lit(true))).as("shingle"))
      val sh = (if (hash) shRaw.select(col("doc_id"), xxhash64(col("shingle")).as("shingle"))
        else shRaw).persist()
      val nDocs = docs.select(count(lit(1)).as("n_docs"))
      val hot = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(nDocs))
        .where(col("df") > col("n_docs") * 0.5).select(col("shingle"))
      val keep = sh.join(broadcast(hot), Seq("shingle"), "left_anti").persist()
      val parts = 4 * spark.sparkContext.defaultParallelism
      if (old) {
        val sizes = keep.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
        val keyed = keep.repartition(parts, col("shingle"))
        val a = keyed.select(col("doc_id").as("doc_a"), col("shingle"))
        val b = keyed.select(col("doc_id").as("doc_b"), col("shingle")).hint("merge")
        top20(a.join(b, Seq("shingle")).where(col("doc_a") < col("doc_b"))
          .repartition(parts, col("doc_a"), col("doc_b"))
          .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("common"))
          .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), Seq("doc_a"))
          .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), Seq("doc_b"))
          .withColumn("jaccard",
            col("common").cast("double") / (col("n_a") + col("n_b") - col("common"))))
      } else {
        val keepN = keep.withColumn("n_sh",
          count(lit(1)).over(Window.partitionBy(col("doc_id"))))
        val keyed = keepN.repartition(parts, col("shingle"))
        val a = keyed.select(col("doc_id").as("doc_a"), col("shingle"), col("n_sh").as("n_a"))
        val b = keyed.select(col("doc_id").as("doc_b"), col("shingle"), col("n_sh").as("n_b"))
          .hint("merge")
        top20(a.join(b, Seq("shingle")).where(col("doc_a") < col("doc_b"))
          .repartition(parts, col("doc_a"), col("doc_b"))
          .groupBy(col("doc_a"), col("doc_b"))
          .agg(count(lit(1)).as("common"), max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"))
          .withColumn("jaccard",
            col("common").cast("double") / (col("n_a") + col("n_b") - col("common"))))
      }
    }

    // correctness cross-check first: all three arms must agree
    val ra = build(old = true).collect().map(_.toString).sorted.toSeq
    spark.catalog.clearCache()
    val rb = build(old = false).collect().map(_.toString).sorted.toSeq
    spark.catalog.clearCache()
    val rc = buildC().collect().map(_.toString).sorted.toSeq
    spark.catalog.clearCache()
    val rd = buildD().collect().map(_.toString).sorted.toSeq
    spark.catalog.clearCache()
    require(ra == rb && rb == rc && rc == rd, s"arms disagree:\nA=$ra\nB=$rb\nC=$rc\nD=$rd")
    println("== arms agree on top-20")

    val (as, bs, cs, ds) = (scala.collection.mutable.Buffer[Double](),
      scala.collection.mutable.Buffer[Double](),
      scala.collection.mutable.Buffer[Double](),
      scala.collection.mutable.Buffer[Double]())
    (1 to 3).foreach { _ =>
      var t0 = System.nanoTime()
      build(old = true).count()
      as += (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      t0 = System.nanoTime()
      build(old = false).count()
      bs += (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      t0 = System.nanoTime()
      buildC().count()
      cs += (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      t0 = System.nanoTime()
      buildD().count()
      ds += (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
    }
    println(f"== old(sizes-joins): best ${as.min}%.2fs of ${as.map(t => f"$t%.2f").mkString(",")}")
    println(f"== new(n_sh-carry):  best ${bs.min}%.2fs of ${bs.map(t => f"$t%.2f").mkString(",")}")
    println(f"== C(row-local n):   best ${cs.min}%.2fs of ${cs.map(t => f"$t%.2f").mkString(",")}")
    println(f"== D(C + keyed persist): best ${ds.min}%.2fs of ${ds.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
