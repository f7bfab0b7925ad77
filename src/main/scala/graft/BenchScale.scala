package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Standing 10× scale gate (VERDICT r12 #1).
  *
  * The strongest scale evidence in this repo is the set of measured
  * "scale-collapse" rows in BASELINE.md: every heavy query family run on a
  * 10× rebuild of sf0.1, with the Spark/DuckDB ratio moving TOWARD Spark as
  * data grows. Until r13 those rows lived as prose — a plan regression in
  * the banded/fused paths (an unpersisted self-join side, a lambda creeping
  * back into the shingle family, a lost pushdown) would only surface when a
  * judge re-read BASELINE. This main promotes them into a per-round GATE:
  * it re-measures the heavy family heads on the 10× corpora and asserts
  * each ratio against its recorded anchor +50% headroom (the brief's ±50%),
  * writing one JSON line (SCALE_r{N}.json, house convention) and exiting
  * non-zero on any failure.
  *
  * The DuckDB side is a STATIC anchor (warm best-of-3, measured r12 on this
  * box — BASELINE.md "Full 10× sweep" + family tables; corpora and duckdb
  * version are fixed, so the anchor does not drift). The Spark side is
  * re-measured each round on the same corpora, rebuildable bit-identically
  * via tools/make_10x.py.
  *
  * Noise handling: this box is co-tenant noisy (same code varies 0.5–3×
  * between windows). Each query gets warmup + best-of-3; rows still above
  * their gate after the sweep get up to two DEFERRED re-measurement rounds
  * (minutes later, past a hot window — the Bench retry rationale) and the
  * overall minimum wins. A row that fails all three windows is a real
  * regression, not turbulence.
  */
object BenchScale {
  /** One gated row: recorded DuckDB anchor seconds, recorded Spark seconds
    * (idle-box best-of-3, provenance in BASELINE.md), and the gate ratio =
    * recorded ratio × 1.5.
    */
  final case class Anchor(query: String, corpus: String, duckSec: Double,
      sparkSecRecorded: Double) {
    def recordedRatio: Double = sparkSecRecorded / duckSec
    def maxRatio: Double = recordedRatio * 1.5
  }

  /** The r12-measured anchors (BASELINE.md 10× tables). `docs10x` rows use
    * the documents-×10 corpus; `temporal10x` the events+orders-×10 corpus.
    * Includes the two deliberately-sketched Misra-Gries rows (q103/q114 —
    * the only >1× ratios, bounded-state by design) so improvement OR
    * regression of their constant factor is visible in the same gate.
    */
  val anchors: Seq[Anchor] = Seq(
    // r15 re-pin (was 19.1): the pair self-join is pinned off the
    // broadcast path and both q49 exchanges are sized to the pair
    // EXPANSION (4× parallelism; raw pairs repartitioned on the pair key
    // before the aggregate, deleting the useless map-side partial). The
    // old reading lived on a memory knife-edge — a cache-timing race
    // could broadcast the posting list and collapse the 113M-pair
    // aggregate to ONE task (21 CPU-min runaway). Measured band
    // 11.6–20.5 s across two gate windows (PLANS r15); pinned midpoint.
    // r16: pin HELD through the row-local n_sh rewrite (sizes joins
    // deleted — the 100x scale fix): same-JVM A/B/C on this corpus read
    // old 15.5 s vs new 14.5 s, so the 10x level is unchanged; the only
    // idle-window-free readings since are co-tenant-inflated (50 s
    // outliers) and were not used to move the pin.
    // r19 re-pin (was 16.0, and sitting AT its own pin in the worst r18
    // window — the flagged exhausted-headroom row): the content-layer
    // rewrite collapses the posting self-join and pair aggregate to the
    // distinct-content universe and expands only the thresholded top-k
    // candidates; measured 1.59 warm (probe window) / gate windows below.
    // The old per-doc level is retired, not re-pinned — the pin question
    // is moot per VERDICT r18 #2.
    Anchor("q49_jaccard_top_pairs", "docs10x", 103.3, 1.80),
    // r19 re-pin (was 3.15, per-doc): CC now runs on the rep graph
    // (content pairs — driver union-find at every duplication factor)
    // and docs inherit their content's component label through a
    // broadcast attach. 100× dup: 86.8 → 3.1 s warm.
    // r20 re-pin (was 3.75 — taken in a window where unchanged q55 also
    // ran +20%, VERDICT r19 #6): with seven r19 gate windows on file the
    // cross-window band is 2.04–2.87 (scale_r19_dev1..7, zero retries),
    // so the pin moves to the band midpoint 2.45 — gate 3.68, ≥28%
    // headroom over the worst clean window (2.87, dev5) — guarding the
    // PLAN, not one noisy reading.
    Anchor("q85_dup_clusters", "docs10x", 224.0, 2.45),
    // r19 re-pin (was 1.55, per-doc): weighted per-source accounting on
    // content pairs (the q150 pattern) — no doc pair materialized;
    // measured 1.80 warm (probe window). 100× dup: 77.1 → 2.3 s warm.
    Anchor("q105_dup_source_matrix", "docs10x", 27.1, 1.90),
    Anchor("q154_source_overlap", "docs10x", 3.58, 0.75),
    Anchor("q142_bm25_topdocs", "docs10x", 0.379, 0.76),
    Anchor("q90_boilerplate_ngrams", "docs10x", 2.98, 0.88),
    // r17b re-pins (q119 was 1.24, q93 was 0.65, q126 was 0.433): those
    // three anchors were recorded under count()-based forcing, which
    // PRUNED each query's left-join/scoring branches (the q180/q77
    // under-billing class the r17 forcing fix closed) — the honest-forced
    // gate then read the full plans at ~2× the stale anchors and failed
    // them with no code change. Re-pinned at the midpoint of the honest
    // bands across three r17b windows (q119 2.31–2.55, q93 1.37–1.69,
    // q126 0.77–0.96; count-based re-reads in the SAME windows reproduce
    // the old levels, confirming forcing — not code and not only the
    // degraded box — as the delta). The DuckDB anchors were fetch-all
    // from day one and need no restatement.
    Anchor("q119_bigram_xent", "docs10x", 4.08, 2.43),
    // r19 re-pin (was 1.40, per-doc): the banded self-join + hamming
    // verification run per distinct text, doc pairs re-expand row-locally
    // (the q143 pattern); band 1.35–1.61 across two probe windows, pinned
    // midpoint. 100× dup: 87.6 → 2.3 s warm, same 27.87M output rows.
    Anchor("q55_simhash_near_dups", "docs10x", 30.0, 1.48),
    // r18b re-pin (was 1.25): content-dedup layer — the banded self-join
    // and pair aggregate run per distinct text (this corpus: 50k docs →
    // 5k contents); measured 1.17 at floor 0.095. The same rewrite at
    // 100× duplication: 164.9 → 6.3 s cold (BASELINE r18).
    Anchor("q56_minhash_candidates", "docs10x", 23.9, 1.17),
    Anchor("q93_unigram_xent", "docs10x", 0.64, 1.53),
    Anchor("q95_decontaminate", "docs10x", 8.15, 1.10),
    // r18 re-pin (r17b had 1.94): the content-dedup layer — the whole
    // quadratic stage (signatures, banding, pair stats) runs per DISTINCT
    // TEXT and expands to doc pairs row-locally, so THIS corpus's 10×
    // duplication collapses back to the 5k-content universe (measured
    // 0.98 warm, floor 0.083; the r17b per-doc spelling read 1.94). The
    // same shape took the 100× duplication corpus from >77 GB
    // disk-exhaustion death to 14.4 s cold (BASELINE r18).
    Anchor("q143_minhash_error_audit", "docs10x", 65.0, 0.98),
    Anchor("q147_token_pagerank", "docs10x", 2.80, 0.83),
    // r18 duplication-audit rows (VERDICT r17 #1): the four cliff-guarded
    // queries that were NOT yet gate rows on the duplication corpus —
    // q143's 11.6 GiB broadcast OOM proved scale claims are
    // corpus-STRUCTURE-dependent, so every guarded query now has a
    // standing duplication reading. DuckDB anchors measured fresh on
    // /tmp/sf01x10 (tools/dup_audit_r18_duck10x.log, warm best-of-2,
    // idle window); Spark pins are the r18 honest-forced warm
    // best-of-3 (R18Probe, same window, floor ~0.04). q117's >1×
    // recorded ratio is the q103/q114 convention: a 9-job floor-class
    // absolute (~1 s) against a 60 ms embedded-oracle bloom probe —
    // gated so constant-factor regression is visible, not because the
    // ratio is a target.
    Anchor("q116_fuzzy_pairs", "docs10x", 3.80, 1.82),
    Anchor("q139_bigram_pmi", "docs10x", 2.11, 0.38),
    Anchor("q117_cross_corpus_dedup", "docs10x", 0.06, 0.96),
    // r18b re-pin (the r18 audit row was 1.64, per-doc): the WEIGHTED
    // content-pair sweep never materializes a doc pair; measured 1.32 at
    // floor 0.095; 100× duplication 66.4 → 3.6 s cold, 49.4 → 1.2 warm.
    Anchor("q150_lsh_threshold_sweep", "docs10x", 28.38, 1.32),
    // r14 re-anchors (r13 recorded 0.78 / 0.84): the certified
    // single-pass rewrite (MgSketch err==0 exactness certificate at
    // capacity 1<<16) deleted the recount scan, the eager driver pass,
    // and the witness machinery — the whole query is ONE lazy sketch
    // aggregation. Measured 0.43–0.51 / 0.49–0.54 s across gate and
    // Profile runs (R14Probe decomposition: the fused sketch scan
    // itself is ~0.43 s of it); pinned at the band's midpoint — the
    // gate protects the new level
    Anchor("q103_heavy_hitters", "docs10x", 0.25, 0.47),
    Anchor("q114_group_heavy_hitters", "docs10x", 0.32, 0.52),
    // r13 re-anchor (was 1.98): window range-frame spelling — one shuffle
    // of n rows, no self-join, no candidate materialization (PLANS.md §q57)
    Anchor("q57_range_join", "temporal10x", 0.569, 0.76),
    // r15 re-pin (was 0.97, union+forward-fill): the compact-history
    // rewrite — build side folds to per-key arrays, probe stream never
    // sorted, shuffle-hash join (broadcast when the dimension fits).
    // Gate band 1.03–1.05, probe best 0.78; same-JVM comparison has the
    // compact spelling 1.5× faster than the retired union+fill. The >2×
    // ratio is formally ACCEPTED (BASELINE r15): the R15Probe
    // decomposition shows single-split scans (orders 0.25 s + events
    // 0.12 s, the local one-file layout) plus ~5 job floors ≈ the whole
    // reading, while DuckDB multithreads the same 27 MB scan — there is
    // no stage left to shave without baking a local-layout fix into a
    // 100 TB plan.
    Anchor("q58_asof_join", "temporal10x", 0.298, 1.03),
    // r13: event-family heads (BASELINE "Temporal-corpus 10× rows");
    // q126 re-pinned r17b with the forcing-stale trio (see q119 note)
    Anchor("q126_max_concurrency", "temporal10x", 0.292, 0.87),
    // r15 re-pin (was 0.718): one-pass span+moment fusion, stats riding
    // through the grid explode (no broadcast re-join, no second stats
    // evaluation); band 0.365–0.570 across a cool and a warm window —
    // the r14 verdict's ≤0.45 s target, met
    Anchor("q164_cusum_changepoint", "temporal10x", 0.031, 0.45),
    // r14: the batched histogram-refinement selection (one job per level,
    // not per bin) at 10× lineitem — 0.58 s sf0.1 → 0.93 s at 6M rows
    // while DuckDB's percentile_cont sort goes 0.09 → 0.95 s: the >2×
    // sf0.1 reading was scheduler floor, and at scale the plan BEATS the
    // oracle (the scale-collapse criterion the r13 verdict set for it)
    Anchor("q177_equidepth_deciles", "temporal10x", 0.946, 0.93))

  /** Pure gate rule (unit-tested in BenchScaleSpec): a measured best passes
    * when its ratio to the static anchor is within the recorded ratio plus
    * 50% headroom. Kept as a function of the anchor so the spec can pin the
    * arithmetic without Spark.
    */
  def passes(a: Anchor, measuredSec: Double): Boolean =
    measuredSec >= 0 && measuredSec / a.duckSec <= a.maxRatio

  /** Pure retry selection (unit-tested): rows still failing after a pass,
    * worst relative overshoot first — under a sweep-wide hot window every
    * row can overshoot, and the ones furthest over the line carry the most
    * information per re-measurement minute.
    */
  def retryOrder(rows: Seq[(Anchor, Double)]): Seq[Anchor] =
    rows.collect { case (a, t) if !passes(a, t) => (a, t / a.duckSec / a.maxRatio) }
      .sortBy(-_._2).map(_._1)

  def main(args: Array[String]): Unit = {
    val docsDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/sf01x10")
    val tempDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR_T", "/tmp/sf01x10t")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "scale_out.json")
    val only = sys.env.get("SPARK_GRAFT_SCALE_ONLY").map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    def dirOf(corpus: String) = if (corpus == "docs10x") docsDir else tempDir
    val missing = Seq(docsDir, tempDir).filterNot(d =>
      Files.exists(Paths.get(d, "documents.parquet")))
    if (missing.nonEmpty) {
      val line = s"""{"metric":"scale_gate","pass":false,"error":"corpus missing: ${missing.mkString(",")} — rebuild with: python3 tools/make_10x.py"}"""
      Files.writeString(Paths.get(outPath), line + "\n")
      println(line)
      sys.exit(2)
    }

    val spark = Session.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fns = SparkEntry.queries

    // Same cache hygiene as Bench: query-local persisted intermediates live
    // for warmup + timed runs, then are dropped between queries.
    def measure(a: Anchor): Double =
      try {
        val fn = fns(a.query)
        Bench.force(fn(spark, dirOf(a.corpus))) // warmup: codegen + IO + persist fills
        System.gc()
        (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          Bench.force(fn(spark, dirOf(a.corpus)))
          (System.nanoTime() - t0) / 1e9
        }.min
      } catch {
        case e: Throwable =>
          System.err.println(s"${a.query}: ${Option(e.getMessage).getOrElse(e.getClass.getName)}")
          -1.0
      } finally spark.catalog.clearCache()

    val gated = anchors.filter(a => only.forall(_.contains(a.query)))
    var best = gated.map(a => a -> measure(a)).toMap
    // Deferred retry rounds: only still-failing rows re-measure, worst first.
    var round = 0
    var retried = Map.empty[String, Int]
    while (round < 2 && gated.exists(a => !passes(a, best(a)))) {
      round += 1
      retryOrder(gated.map(a => a -> best(a))).foreach { a =>
        retried += a.query -> round
        val t = measure(a)
        if (t >= 0 && (best(a) < 0 || t < best(a))) best += a -> t
      }
    }

    spark.range(1).count()
    val floor = (1 to 5).map { _ =>
      val t0 = System.nanoTime(); spark.range(1).count(); (System.nanoTime() - t0) / 1e9
    }.min

    def num(v: Double): String =
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val allPass = gated.forall(a => passes(a, best(a)))
    val nFail = gated.count(a => !passes(a, best(a)))
    val rows = gated.map { a =>
      val t = best(a)
      val ratio = if (t >= 0) t / a.duckSec else -1.0
      s""""${a.query}":{"pass":${passes(a, t)},"spark_sec":${num(t)},"duck_sec_anchor":${num(a.duckSec)},"ratio":${num(ratio)},"recorded_ratio":${num(a.recordedRatio)},"max_ratio":${num(a.maxRatio)},"corpus":"${a.corpus}","retry_rounds":${retried.getOrElse(a.query, 0)}}"""
    }.mkString("{", ",", "}")
    // headline first, big map last (same truncation-robust order as Bench)
    val line = s"""{"metric":"scale_gate","pass":$allPass,"n_fail":$nFail,"n_rows":${gated.size},"floor_sec_per_query":${num(floor)},"docs_dir":"$docsDir","temporal_dir":"$tempDir","rows":$rows}"""
    Files.writeString(Paths.get(outPath), line + "\n")
    spark.stop()
    println(line)
    System.out.flush()
    if (!allPass) sys.exit(1)
  }
}
