package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hand-checked retrieval/graph semantics (the oracle gate proves
  * Spark==DuckDB; this proves both match the MATH). Expected values
  * mirror the engine's determinism pipeline exactly: per-term/-edge
  * contributions round to DECIMAL(18,9), sums accumulate as decimal,
  * reported values round on the double.
  */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def r9(x: Double): BigDecimal =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
  private def roundD(x: Double, s: Int): Double =
    BigDecimal.valueOf(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q142 BM25: hand-computed scores, rare term dominates, termless docs absent") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_bm25").toString
    // Query terms are (join, window, stream, dup). d1 has join x2 + window,
    // d2 has window only, d3 has none (must not appear).
    Seq((1L, "join join window"), (2L, "window other"), (3L, "other other other"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val n = 3.0
    val avgdl = 8.0 / 3 // total_dl / n_docs, decimal-sum exact
    def idf(df: Double) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def norm(tf: Double, dl: Double) =
      (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
    def bm25(contribs: Seq[Double]): Double =
      roundD(contribs.map(r9).sum.toDouble, 6)
    val exp1 = bm25(Seq(idf(1) * norm(2, 3), idf(2) * norm(1, 3)))
    val exp2 = bm25(Seq(idf(2) * norm(1, 2)))
    val got = Retrieval.qBm25TopDocs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    assert(got == List((1L, 2L, exp1), (2L, 1L, exp2)))
    assert(exp1 > exp2) // the rare 'join' hits outweigh d2's shorter doc
  }

  test("q145 novelty: first writer owns the shingle, copies score zero") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_novel").toString
    Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "b c d e"), (4L, "xy"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = Retrieval.qNgramNovelty(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1).toList
    // d1: {abc,bcd} both first-seen here; d2 exact copy: 0; d3: bcd seen,
    // cde novel: 1/2; d4: under 3 tokens -> no shingles, no row.
    assert(got == List((1L, 2L, 2L, 1.0), (2L, 2L, 0L, 0.0), (3L, 2L, 1L, 0.5)))
  }

  test("q145 novelty conservation: novel counts sum to the distinct-shingle count") {
    val sf = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions._
    val nov = Retrieval.qNgramNovelty(spark, sf)
    val totalNovel = nov.agg(sum("n_novel")).collect().head.getLong(0)
    val direct = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= 3)
      .select(explode(expr(
        "array_distinct(transform(sequence(0, size(toks) - 3), " +
          "i -> concat_ws(' ', slice(toks, i + 1, 3))))")).as("sh"))
      .select(countDistinct(col("sh"))).collect().head.getLong(0)
    assert(totalNovel == direct)
  }

  test("q147 PageRank: hand-iterated 2-node graph with a dangling node") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_pr").toString
    // "a a b": edges a->a (1), a->b (1); b dangles. frac = 0.5 each.
    Seq((1L, "a a b")).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val tp = (1.0 - 0.85) / 2
    def iterate(pra: Double, prb: Double): (Double, Double) = {
      val inA = r9(pra * 0.5).toDouble // only a->a feeds a
      val inB = r9(pra * 0.5).toDouble // only a->b feeds b
      (tp + 0.85 * inA, tp + 0.85 * inB)
    }
    val (a3, b3) = (1 to 3).foldLeft((0.5, 0.5)) { case ((a, b), _) => iterate(a, b) }
    val got = Retrieval.qTokenPagerank(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toList
    assert(got == List(("a", roundD(a3, 9)), ("b", roundD(b3, 9))))
    // dangling mass leaks: ranks sum strictly below 1
    assert(a3 + b3 < 1.0)
  }

  test("q147 PageRank on the corpus: 20 rows, positive, descending") {
    val got = Retrieval.qTokenPagerank(spark, "/root/testdata/sf0.001").collect()
    assert(got.length == 20)
    val prs = got.map(_.getDouble(1))
    assert(prs.forall(_ > 0))
    assert(prs.sameElements(prs.sortBy(-_.toDouble)))
  }
}
