package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the pure gate logic of [[BenchScale]] — the 10× scale gate's pass
  * rule and retry ordering — without touching Spark or the corpora.
  */
class BenchScaleSpec extends AnyFunSuite {
  private val a = BenchScale.Anchor("qx", "docs10x", duckSec = 10.0,
    sparkSecRecorded = 2.0) // recorded ratio 0.2, gate 0.3

  test("gate passes at the recorded ratio and at +50%, fails beyond") {
    assert(BenchScale.passes(a, 2.0))   // recorded
    assert(BenchScale.passes(a, 3.0))   // exactly the +50% line
    assert(!BenchScale.passes(a, 3.01)) // beyond
    assert(!BenchScale.passes(a, -1.0)) // errored run never passes
  }

  test("anchors carry sane recorded ratios and the +50% headroom") {
    assert(BenchScale.anchors.nonEmpty)
    BenchScale.anchors.foreach { an =>
      assert(an.duckSec > 0 && an.sparkSecRecorded > 0, an.query)
      assert(an.maxRatio === an.recordedRatio * 1.5, an.query)
      assert(Set("docs10x", "temporal10x")(an.corpus), an.query)
    }
    // every anchored query must exist in the gated surface — a renamed
    // query key must fail HERE, not as a KeyError mid-sweep
    val known = SparkEntry.queries.keySet
    BenchScale.anchors.foreach(an => assert(known(an.query), an.query))
    // the judge-named heavy family heads are all present
    Seq("q49_jaccard_top_pairs", "q85_dup_clusters", "q105_dup_source_matrix",
      "q154_source_overlap", "q142_bm25_topdocs", "q90_boilerplate_ngrams",
      "q119_bigram_xent", "q55_simhash_near_dups", "q56_minhash_candidates",
      "q93_unigram_xent").foreach(q =>
      assert(BenchScale.anchors.exists(_.query == q), q))
    // r18: every cliff-guarded query has a standing DUPLICATION-corpus
    // row (the corpus structure that found the q143 broadcast OOM)
    Seq("q116_fuzzy_pairs", "q139_bigram_pmi", "q117_cross_corpus_dedup",
      "q150_lsh_threshold_sweep", "q143_minhash_error_audit").foreach(q =>
      assert(BenchScale.anchors.exists(a =>
        a.query == q && a.corpus == "docs10x"), q))
  }

  test("retry order: only failing rows, worst relative overshoot first") {
    val b = BenchScale.Anchor("qy", "docs10x", 10.0, 2.0)
    val c = BenchScale.Anchor("qz", "docs10x", 10.0, 2.0)
    val rows = Seq(a -> 2.5 /* pass */, b -> 9.0 /* 3x over */,
      c -> 4.5 /* 1.5x over */)
    assert(BenchScale.retryOrder(rows).map(_.query) == Seq("qy", "qz"))
  }
}
