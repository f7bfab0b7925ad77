package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Session, SparkEntry}
import graft.operators.TextOps

/** r20 correctness replay at the 100× structure extremes (VERDICT r19 #4:
  * "the 100× corpora are timed but not hash-checked").
  *
  * The DuckDB oracle is infeasible here BY CONSTRUCTION — every dedup
  * oracle is the per-doc spelling, and at 100× duplication the per-doc
  * posting/banded join does ~10⁴× the content-layer's pair work (the r16
  * per-doc q49 never completed its ~11G-pair expansion; q85's recursive
  * CTE is hopeless at 500k docs). So the cross-implementation oracle is
  * the PER-DOC SPARK SPELLING (the ContentLayerSpec pattern at corpus
  * scale), which is quadratic-in-duplication but measurable (~90 s class
  * at 100× dup), plus a self-evident invariant where even per-doc cannot
  * run:
  *
  *  - q55: shipped content-layer pairs ≡ a per-doc banded-join rebuild
  *    from qSimhashBands (exact set equality via bidirectional exceptAll).
  *  - q105: shipped weighted source matrix ≡ per-doc source-pair counting
  *    over the per-doc pair frame.
  *  - q85: shipped content-graph labels ≡ connected components over the
  *    per-doc edge list.
  *  - q49: per-doc posting is the one true infeasible (the never-finished
  *    11G-pair run) — instead the top-20 invariant: every returned pair
  *    with jaccard = 1.0 must join back to IDENTICAL md5(text), count
  *    must be exactly 20, and pairs must be duplicate-free. At 100×
  *    duplication the true top-20 is all-ties-at-1.0, so this checks the
  *    threshold-collect + expansion path end-to-end against ground truth.
  *
  * Usage: runMain graft.tools.DupAudit100x <corpusDir> [checks...]
  * (default all of q49 q55 q105 q85). Exit 1 on any failure; one PASS/
  * FAIL line per check (logged to tools/dup_audit_r20_*.log by the
  * round's run convention).
  */
object DupAudit100x {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val wanted = if (args.length > 1) args.drop(1).toSet
                 else Set("q49", "q55", "q105", "q85")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Session.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var failed = false

    def check(name: String)(body: => (Boolean, String)): Unit =
      if (wanted(name)) {
        val t0 = System.nanoTime()
        val (ok, detail) =
          try body
          catch { case e: Throwable =>
            (false, s"EXCEPTION ${Option(e.getMessage).getOrElse(e.getClass.getName)}") }
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"${if (ok) "PASS" else "FAIL"} $name%-6s $sec%8.1fs  $detail")
        if (!ok) failed = true
        spark.catalog.clearCache()
      }

    /** Per-doc banded simhash near-dup pairs — the retired r18 spelling
      * rebuilt as the cross-implementation oracle (bands carried in-row,
      * hamming off the join output, exactly the shipped verification
      * semantics at doc granularity).
      */
    def perDocPairs: DataFrame = {
      val b = TextOps.qSimhashBands(spark, dir)
        .select(col("doc_id"), array((0 until 4).map(i => col(s"band$i")): _*).as("bv"))
      val banded = b.select(col("doc_id"), col("bv"),
        explode(array((0 until 4).map(i =>
          struct(lit(i).as("b"), col("bv").getItem(i).as("k"))): _*)).as("bk"))
        .select(col("doc_id"), col("bv"), col("bk.b"), col("bk.k"))
      val parts = 4 * spark.sparkContext.defaultParallelism
      val keyed = banded.repartition(parts, col("b"), col("k"))
      keyed.as("x").join(keyed.as("y").hint("shuffle_hash"),
          col("x.b") === col("y.b") && col("x.k") === col("y.k") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          (0 until 4).map(i =>
            expr(s"bit_count(x.bv[$i] ^ y.bv[$i])")).reduce(_ + _).cast("int").as("hamming"))
        .where(col("hamming") <= 3)
        .distinct()
    }

    check("q55") {
      val shipped = SparkEntry.queries("q55_simhash_near_dups")(spark, dir).persist()
      val oracle = perDocPairs.persist()
      val ns = shipped.count(); val no = oracle.count()
      val extra = shipped.exceptAll(oracle).count()
      val missing = oracle.exceptAll(shipped).count()
      (ns == no && extra == 0 && missing == 0,
        s"shipped=$ns perdoc=$no extra=$extra missing=$missing")
    }

    check("q105") {
      val src = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("source"))
      val exp = perDocPairs
        .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), Seq("doc_a"))
        .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), Seq("doc_b"))
        .groupBy(least(col("sa"), col("sb")).as("source_x"),
          greatest(col("sa"), col("sb")).as("source_y"))
        .agg(count(lit(1)).as("n_pairs"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      val got = SparkEntry.queries("q105_dup_source_matrix")(spark, dir)
        .select(col("source_x"), col("source_y"), col("n_pairs"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      (got == exp, s"cells got=${got.size} exp=${exp.size} " +
        s"diff=${(got.diff(exp) ++ exp.diff(got)).take(3).mkString(";")}")
    }

    check("q85") {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val edges = perDocPairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
      val exp = TextOps.connectedComponents(
        docs.select(col("doc_id").as("node")), edges)
        .select(col("node"), col("label").as("exp_cluster"))
      val got = SparkEntry.queries("q85_dup_clusters")(spark, dir)
        .select(col("doc_id").as("node"), col("cluster_id"))
      val joined = got.join(exp, Seq("node"))
      val n = joined.count()
      val mismatch = joined.where(col("cluster_id") =!= col("exp_cluster")).count()
      (n > 0 && mismatch == 0, s"docs=$n label_mismatch=$mismatch")
    }

    check("q49") {
      val top = SparkEntry.queries("q49_jaccard_top_pairs")(spark, dir).persist()
      val n = top.count()
      val nDistinct = top.select(col("doc_a"), col("doc_b")).distinct().count()
      val md5s = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), md5(col("text")).as("h"))
      val ties = top.where(col("jaccard") === 1.0)
      val badTies = ties
        .join(md5s.select(col("doc_id").as("doc_a"), col("h").as("ha")), Seq("doc_a"))
        .join(md5s.select(col("doc_id").as("doc_b"), col("h").as("hb")), Seq("doc_b"))
        .where(col("ha") =!= col("hb")).count()
      val nTies = ties.count()
      (n == 20 && nDistinct == 20 && badTies == 0,
        s"rows=$n distinct=$nDistinct jaccard1_pairs=$nTies md5_mismatch=$badTies")
    }

    spark.stop()
    if (failed) sys.exit(1)
  }
}
