package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Parity gates for the nine xxhash64 scale-default spellings Bench runs
  * as `x47..x180` (SparkEntry.benchOnly). The oracled queries use
  * md5-portable hashing because DuckDB can't evaluate xxhash64; these
  * specs pin the SCALE path to the oracled path so it can't silently
  * diverge (VERDICT r11 #4). Two regimes:
  *
  *  - hash-as-equality-key variants (x49, x111, x117, x154, x180): the
  *    hash only replaces string equality, so absent a 64-bit collision
  *    the output must match the raw spelling EXACTLY — asserted as full
  *    frame equality. (x49's twin assertion lives in DedupSpec and is
  *    kept there; the one here covers the bench-registered projection.)
  *
  *  - hash-as-randomness variants (x47, x48, x53, x56): the hash family
  *    defines the random bits/planes, so values legitimately differ —
  *    what must agree are the DECISIONS: identical content collides in
  *    both families, and planted near-dups are recovered by both.
  */
class XxParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  // ---- planted text corpus (DedupSpec construction: 40 base docs of 60
  // tokens, 10 near-dups with one mutated token, 2 exact dups) ----------
  private val vocab = Array("spark", "data", "join", "merge", "sort", "hash",
    "table", "scan", "row", "column", "batch", "stream", "query", "filter",
    "group", "agg", "window", "key", "value", "part", "order", "line",
    "fast", "slow", "big", "small", "the", "a")

  private lazy val docs = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val base = (0 until 40).map { i =>
      (i.toLong, (0 until 60).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val nearDups = (0 until 10).map { i =>
      val toks = base(i)._2.split(" ")
      toks(30) = "MUTATED"
      (100L + i, toks.mkString(" "))
    }
    val exactDups = Seq((200L, base(20)._2), (201L, base(21)._2))
    (base ++ nearDups ++ exactDups).toDF("doc_id", "text")
  }
  private val plantedPairs = (0 until 10).map(i => (i.toLong, 100L + i)).toSet

  // ---- planted vectors (SimilaritySpec construction: 100 random units,
  // 10 near-identical perturbations) ------------------------------------
  private val dim = 64
  private lazy val vecs = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def unit(): Array[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
      v.map(_ / n)
    }
    val base = (0 until 100).map(i => (i.toLong, unit(), i % 5))
    val nearDups = (0 until 10).map { i =>
      val v = base(i)._2.map(x => x + 0.03f * rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
      (500L + i, v.map(_ / n), i % 5)
    }
    (base ++ nearDups).toDF("vec_id", "embedding", "label")
  }
  private val plantedVecPairs = (0 until 10).map(i => (i.toLong, 500L + i)).toSet

  // =====================================================================
  // hash-as-randomness family: decision parity
  // =====================================================================

  test("x47 parity: exact dups collide and near-dups stay bandable in the xxhash64 simhash") {
    val byId = TextOps.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // identical content MUST collide in any hash family (the decision the
    // oracled md5-band q47 feeds q55 with)
    assert(byId(20L) == byId(200L) && byId(21L) == byId(201L))
    // planted near-dups must stay within the q55 blocking radius, and
    // banding must recover them — same decision the md5 family makes
    val planted = plantedPairs.map { case (a, b) =>
      java.lang.Long.bitCount(byId(a) ^ byId(b))
    }
    assert(planted.forall(_ <= 12), s"planted hamming too large: $planted")
    val found = TextOps.simhashNearDups(TextOps.simhash(docs), maxHamming = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(plantedPairs.count(found.contains) >= 8)
  }

  test("x48 parity: exact dups produce identical xxhash64 minhash signatures AND band keys") {
    val sigs = TextOps.minhashSignatures(docs)
    def sigAndBands(id: Long) = sigs.where(col("doc_id") === id)
      .drop("doc_id").collect().head.toSeq
    assert(sigAndBands(20L) == sigAndBands(200L))
    assert(sigAndBands(21L) == sigAndBands(201L))
  }

  test("x53 parity: BOTH LSH families (xxhash64 planes, md5-portable planes) recall planted vectors") {
    def recallAndSize(cands: DataFrame): (Int, Long) = {
      val set = cands.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (plantedVecPairs.count(set.contains), set.size.toLong)
    }
    val (xxRecall, xxSize) =
      recallAndSize(Similarity.lshCandidatePairs(spark, vecs))
    val (mdRecall, mdSize) = recallAndSize(
      Similarity.bandedPairs(Similarity.portableSignBuckets(spark, vecs, dim)))
    val allPairs = 110L * 109 / 2
    assert(xxRecall >= 6, s"xx family recalled only $xxRecall/10")
    assert(mdRecall >= 6, s"md5 family recalled only $mdRecall/10")
    assert(xxSize < allPairs / 2 && mdSize < allPairs / 2,
      s"bucketing pruned nothing: xx=$xxSize md5=$mdSize of $allPairs")
  }

  test("x56 parity: xxhash64 banded candidates recover planted near-dups and both exact-dup pairs") {
    val cands = TextOps.minhashCandidates(TextOps.minhashSignatures(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(plantedPairs.count(cands.contains) >= 8,
      s"xx candidates recalled only ${plantedPairs.count(cands.contains)}/10")
    // exact dups share every band in ANY family — non-probabilistic
    assert(cands.contains((20L, 200L)) && cands.contains((21L, 201L)))
  }

  // =====================================================================
  // hash-as-equality-key family: exact output parity with the raw path
  // =====================================================================

  test("x49 parity: bench-registered xxhash64 jaccard projection matches the raw spelling exactly") {
    val raw = TextOps.jaccardPairs(docs)
      .orderBy(col("jaccard").desc, col("doc_a").asc, col("doc_b").asc)
      .limit(20).select(col("doc_a"), col("doc_b"), col("common"), col("jaccard"))
    val hashed = TextOps.jaccardPairs(docs, hashShingles = true)
      .orderBy(col("jaccard").desc, col("doc_a").asc, col("doc_b").asc)
      .limit(20).select(col("doc_a"), col("doc_b"), col("common"), col("jaccard"))
    assert(rows(hashed) == rows(raw))
  }

  test("x111 parity: xxhash64 chunk dedup matches the oracled raw-string spelling exactly") {
    assert(rows(Curation.chunkDedupXx(spark, dir)) ==
      rows(Curation.qChunkDedup(spark, dir)))
  }

  test("x117 parity: xxhash64 cross-corpus dedup matches the oracled spelling exactly") {
    assert(rows(CrossCorpus.qCrossCorpusDedupXx(spark, dir)) ==
      rows(CrossCorpus.qCrossCorpusDedup(spark, dir)))
  }

  test("x154 parity: hashed-shingle source overlap matches the raw-shingle spelling exactly") {
    val d = graft.Tables.load(spark, dir, "documents")
    assert(rows(TextOps.sourceOverlap(d, hashShingles = true)) ==
      rows(TextOps.sourceOverlap(d)))
  }

  test("x180 parity: hashed-gram substring dedup matches the raw-gram spelling exactly") {
    val d = graft.Tables.load(spark, dir, "documents")
    assert(rows(Curation.substringDupStats(d, hashGrams = true)) ==
      rows(Curation.substringDupStats(d)))
  }
}
