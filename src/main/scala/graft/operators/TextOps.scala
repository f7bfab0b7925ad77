package graft.operators

import graft.CacheScope.PersistTracked
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import Relational.{dsum, dsumSql}

/** Large-scale training-data text operators over the `documents` table:
  * exact dedup, token analysis, quality scoring, fingerprinting, shingling,
  * simhash, minhash/LSH, and a naive-Bayes language identifier.
  *
  * Scale design: every op is expressed as explode → hash-aggregate (or
  * higher-order array functions evaluated row-local), so the only shuffles
  * are on (doc, token/shingle) keys; nothing collects to the driver and no
  * all-pairs products exist — near-dup candidate generation goes through
  * banded LSH buckets ([[TextOps.minhashCandidates]]).
  */
object TextOps {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  private def toks(c: Column): Column = split(c, " ")

  /** Distinct per-doc 3-gram shingles via the fused single-pass
    * expression (functions/WordShingles.scala): `split(text, ' ')` is
    * lossless, so every shingle is a byte substring of the text — one
    * pass, no token materialization, no interpreted lambdas. r12: the
    * shingle scan had become the dominant LINEAR term of the banded
    * dedup family at 10× once banding bounded the joins. Sub-3-token
    * docs yield an empty array (no rows after the explode), identical
    * to the old size(toks) >= 3 gate. The dedup stays row-local —
    * the first shuffle any consumer sees is its own aggregation.
    */
  private def shinglesDistinct(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(col("doc_id"),
      explode(call_function("word_shingles",
        col("text"), lit(3), lit(true))).as("shingle"))
  }

  /** Word 2-shingles of the space-run-collapsed, trimmed text — the
    * bigrams of consecutive NON-EMPTY tokens (collapsing runs IS the
    * ne filter; split on ' ' is lossless). Shared q119/q139 spelling —
    * the two queries' tokenization must stay in lockstep, so the
    * spelling lives here once. Callers split each bigram back on its
    * single interior space with substring_index.
    */
  private[operators] def neBigrams(s: SparkSession): Column = {
    graft.functions.GraftFunctions.register(s)
    call_function("word_shingles",
      trim(regexp_replace(col("text"), " +", " ")), lit(2), lit(false))
  }

  /** Value 0-15 of the j-th (1-based) hex digit of an md5 hex string.
    * Spelled via ascii() so the DuckDB oracle can evaluate the identical
    * arithmetic: ascii(c)-48 for '0'..'9', ascii(c)-87 for 'a'..'f'.
    */
  private[graft] def hexDigit(h: Column, j: Int): Column = {
    val a = ascii(substring(h, j, 1))
    when(a < 58, a - 48).otherwise(a - 87)
  }

  /** DuckDB spelling of [[hexDigit]]. */
  private[graft] def hexDigitSql(h: String, j: Int): String = hexDigitSql(h, j.toString)

  /** [[hexDigitSql]] at an arbitrary 1-based position SQL expression
    * (CAST guards DuckDB's strict substring typing on computed positions).
    */
  private[graft] def hexDigitSql(h: String, pos: String): String = {
    val c = s"ascii(substring($h, CAST($pos AS INTEGER), 1))"
    s"(CASE WHEN $c < 58 THEN $c - 48 ELSE $c - 87 END)"
  }

  /** Exact content dedup via hash group-by (the 100 TB shape: shuffle on the
    * 128-bit content hash, never a driver-side set). Emits one row per
    * distinct content with the surviving doc id and multiplicity.
    */
  def qDedupExact(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(md5(col("text").cast("binary")).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  val qDedupExactSql: String =
    """SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id,
      |  COUNT(*) AS n_copies
      |FROM documents GROUP BY 1""".stripMargin

  /** Token counting + global term frequency: whitespace tokenize, explode,
    * hash-aggregate; top-50 with token tiebreak (deterministic LIMIT set).
    */
  def qTokenFreq(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(explode(toks(col("text"))).as("token"))
      .where(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(50)

  val qTokenFreqSql: String =
    """SELECT token, COUNT(*) AS cnt FROM (
      |  SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |WHERE token <> ''
      |GROUP BY token ORDER BY cnt DESC, token ASC LIMIT 50""".stripMargin

  /** Per-document quality scoring: token count, distinct-token count,
    * mean token length, stopword ratio, and a piecewise quality label.
    * All array math is row-local higher-order functions — no shuffle at all
    * until the (absent) aggregation; scales embarrassingly.
    */
  def qDocQuality(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    // r12: Σ token length = length(text) − (n_tokens − 1) separators
    // (split on ' ' is lossless; empty tokens contribute 0 either way)
    // and the stopword count is the fused token_term_counts pass —
    // replaces two interpreted per-token lambda chains. toks survives
    // for the counts that genuinely need the token array.
    t(s, dir, "documents")
      .withColumn("toks", toks(col("text")))
      .withColumn("ttc", call_function("token_term_counts",
        col("text"), array(lit("the"), lit("a"))))
      .select(
        col("doc_id"),
        length(col("text")).as("n_chars_calc"),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_distinct_tokens"),
        ((length(col("text")) - size(col("toks")) + 1).cast("double")
          / size(col("toks"))).as("mean_token_len"),
        ((element_at(col("ttc"), 2) + element_at(col("ttc"), 3)).cast("double")
          / size(col("toks"))).as("stopword_ratio"))
      .withColumn("quality",
        when(col("n_tokens") < 20, "too_short")
          .when(col("stopword_ratio") > 0.2, "boilerplate")
          .otherwise("ok"))
  }

  val qDocQualitySql: String =
    """WITH d AS (SELECT *, string_split(text, ' ') AS toks FROM documents)
      |SELECT doc_id,
      |  length(text) AS n_chars_calc,
      |  CAST(len(toks) AS INTEGER) AS n_tokens,
      |  CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct_tokens,
      |  CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
      |    / len(toks) AS mean_token_len,
      |  CAST(len(list_filter(toks, x -> x IN ('the', 'a'))) AS DOUBLE)
      |    / len(toks) AS stopword_ratio,
      |  CASE WHEN len(toks) < 20 THEN 'too_short'
      |       WHEN CAST(len(list_filter(toks, x -> x IN ('the', 'a'))) AS DOUBLE)
      |            / len(toks) > 0.2 THEN 'boilerplate'
      |       ELSE 'ok' END AS quality
      |FROM d""".stripMargin

  /** Per-language corpus stats (A1 over text metadata + A6 + exact mean). */
  def qLangStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        (dsum(col("n_chars").cast("double")) / count(col("n_chars"))).as("mean_chars"),
        countDistinct(col("source")).as("n_sources"))

  val qLangStatsSql: String =
    s"""SELECT lang, COUNT(*) AS n_docs,
       |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       |  ${dsumSql("n_chars")} / COUNT(n_chars) AS mean_chars,
       |  COUNT(DISTINCT source) AS n_sources
       |FROM documents GROUP BY lang""".stripMargin

  /** Document fingerprinting: stable 64-bit-equivalent content fingerprint
    * (md5 prefix) per doc, plus the fingerprint-space distribution (first
    * hex byte) proving uniformity.
    */
  def qFingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(substring(md5(col("text").cast("binary")), 1, 16).as("fingerprint"))
      .groupBy(substring(col("fingerprint"), 1, 2).as("fp_prefix"))
      .agg(count(lit(1)).as("n_docs"))

  val qFingerprintSql: String =
    """SELECT substring(md5(text), 1, 2) AS fp_prefix, COUNT(*) AS n_docs
      |FROM documents GROUP BY 1""".stripMargin

  /** Word-3-gram shingling stats per document (the dedup building block).
    * Entirely row-local array math — no explode, no shuffle, no aggregate:
    * the count of shingles is `size(shingles)` and the distinct count is
    * `size(array_distinct(shingles))`, both computed inside the scan's
    * project. At 100 TB this is a pure map over the corpus. r12: shingles
    * come from the fused zero-copy expression; the ≥3-token gate stays
    * spelled on raw `text` (NOT on the projected shingle column) so
    * pushdown can't clone the expensive expression into the scan filter.
    */
  def qShingleStats(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    t(s, dir, "documents")
      .where(size(toks(col("text"))) >= 3)
      .select(col("doc_id"),
        call_function("word_shingles", col("text"), lit(3), lit(false))
          .as("shingles"))
      .select(col("doc_id"),
        size(col("shingles")).as("n_shingles"),
        size(array_distinct(col("shingles"))).as("n_distinct_shingles"))
  }

  val qShingleStatsSql: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |           WHERE len(string_split(text, ' ')) >= 3),
      |s AS (SELECT doc_id,
      |        list_transform(generate_series(1, len(toks) - 2),
      |          i -> array_to_string(toks[i:i+2], ' ')) AS shingles
      |      FROM d)
      |SELECT doc_id, CAST(len(shingles) AS INTEGER) AS n_shingles,
      |  CAST(len(list_distinct(shingles)) AS INTEGER) AS n_distinct_shingles
      |FROM s""".stripMargin

  // --------------------------------------------------------------------
  // Non-SQL-expressible ops (rows-only driver check + ScalaTest oracles)
  // --------------------------------------------------------------------

  /** 64-bit simhash per document: per-token xxhash64, each bit votes ±1,
    * sign of the vote sum becomes the bit. Entirely explode + one
    * hash-aggregate of 64 codegen'd SUMs — shuffle key is doc_id only.
    */
  def simhash(docs: DataFrame): DataFrame = {
    // repartition(doc_id) at the TEXT level (r17b, the q143 lesson): the
    // per-token hash + 64 vote partials otherwise run in the scan stage,
    // whose parallelism is the input file layout (one task on a
    // single-row-group file). Hoisting the doc_id exchange below the scan
    // keeps total exchanges at ONE — project/generate preserve the
    // hash partitioning, so the groupBy adds none — while the exchange
    // carries raw text (comparable bytes to the per-doc partials it
    // replaces) and the hash work runs at cluster parallelism on any
    // layout.
    val tok = byDoc(docs)
      .select(col("doc_id"), explode(toks(col("text"))).as("token"))
      .where(col("token") =!= "")
      .withColumn("h", xxhash64(col("token")))
    val votes = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$b")
    }
    val assembled = (0 until 64).map { b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(0L)
    }.reduce(_ + _) // distinct powers of two: addition == bitwise OR
    tok.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), assembled.as("simhash"))
  }

  /** Portable simhash for the driver oracle: identical semantics to
    * [[simhash]] but the per-token 64 bits come from the md5 hex digits
    * (md5 is the one hash both Spark and DuckDB compute identically), and
    * the output is the four 16-bit sub-bands as scalar ints — the exact
    * blocking keys the near-dup join uses, in an oracle-comparable shape.
    * The xxhash64 variant stays the scale default (one codegen'd hash per
    * token vs an md5 + string ops); the hash family is interchangeable by
    * construction — simhash only needs uniform independent bits.
    */
  def qSimhashBands(s: SparkSession, dir: String): DataFrame =
    // repartition(doc_id): layout-independent parallelism for the
    // 64-bit-vote build, one exchange total — see [[simhash]]
    simhashBandsOf(byDoc(t(s, dir, "documents")))

  /** Portable simhash band build over a caller-partitioned frame (r19):
    * the body of [[qSimhashBands]], caller owns the doc_id exchange —
    * [[qSimhashBands]] feeds it byDoc(documents); the content-layer
    * consumers ([[simhashRepPairs]]) feed it the already doc_id-keyed
    * representative frame, so the vote aggregate adds no exchange
    * (explode preserves hash partitioning) — the minhashBandsOf
    * convention.
    */
  private def simhashBandsOf(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(toks(col("text"))).as("token"))
      .where(col("token") =!= "")
      .withColumn("h", md5(col("token").cast("binary")))
    // bit g (0..63) of the token hash lives in hex digit g/4+1, bit g%4
    val votes = (0 until 64).map { g =>
      val bit = shiftright(hexDigit(col("h"), g / 4 + 1), g % 4).bitwiseAND(1)
      sum(when(bit === 1, 1).otherwise(-1)).as(s"v$g")
    }
    val agg = tok.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
    val bands = (0 until 4).map { b =>
      (0 until 16).map(i => when(col(s"v${16 * b + i}") > 0, lit(1 << i)).otherwise(0))
        .reduce(_ + _).cast("int").as(s"band$b")
    }
    agg.select(col("doc_id") +: bands: _*)
  }

  val qSimhashBandsSql: String = {
    val votes = (0 until 64).map { g =>
      val d = hexDigitSql("h", g / 4 + 1)
      s"SUM(CASE WHEN (($d >> ${g % 4}) & 1) = 1 THEN 1 ELSE -1 END) AS v$g"
    }.mkString(",\n    ")
    val bands = (0 until 4).map { b =>
      val e = (0 until 16)
        .map(i => s"(CASE WHEN v${16 * b + i} > 0 THEN ${1 << i} ELSE 0 END)")
        .mkString(" + ")
      s"CAST($e AS INTEGER) AS band$b"
    }.mkString(",\n  ")
    s"""WITH tok AS (
       |  SELECT doc_id, md5(token) AS h FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
       |  WHERE token <> ''),
       |v AS (SELECT doc_id,
       |    $votes
       |  FROM tok GROUP BY doc_id)
       |SELECT doc_id,
       |  $bands
       |FROM v""".stripMargin
  }

  /** SimHash near-dup pairs: block on maxHamming+1 contiguous sub-bands of
    * the 64-bit hash — by pigeonhole, a pair within hamming ≤ maxHamming
    * differs in at most maxHamming bands and therefore agrees exactly on at
    * least one of the maxHamming+1 band keys. (With k bands the guarantee
    * is only hamming ≤ k−1: a hamming-k pair can differ once per band.)
    * Candidates are then verified with bit_count(xor). Banded blocking,
    * never all-pairs.
    */
  def simhashNearDups(sims: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64,
      s"maxHamming must be in [0, 64), got $maxHamming")
    val nBands = maxHamming + 1
    val bounds = (0 to nBands).map(b => b * 64 / nBands)
    val bandKeys = (0 until nBands).map { b =>
      val lo = bounds(b)
      // JVM shift count is mod 64: width 64 (maxHamming=0) needs -1L, not
      // (1L << 64) - 1 == 0, which would degenerate to an all-pairs join.
      val width = bounds(b + 1) - lo
      val mask = if (width >= 64) -1L else (1L << width) - 1
      struct(lit(b).as("band"),
        shiftrightunsigned(col("simhash"), lo).bitwiseAND(mask).as("key"))
    }
    // persisted before the self-join (q56/x56 convention): otherwise the
    // caller's sims subtree — typically a corpus-sized 64-vote aggregate —
    // evaluates once per join side. Session owner clearCache releases it.
    val banded = sims
      .select(col("doc_id"), col("simhash"), explode(array(bandKeys: _*)).as("bk"))
      .select(col("doc_id"), col("simhash"), col("bk.band"), col("bk.key"))
      .persistTracked()
    banded.count() // eager fill — see minhashCandidates
    val a = banded.as("a")
    // shuffle_hash, never broadcast (r15): a banded self-join's OUTPUT is
    // quadratic in bucket df, so the plan must partition by the bucket key
    // — a size-based broadcast (the banded frame can look tiny to the
    // planner) would glue the pair expansion AND its aggregate to the
    // probe side's partitioning: one task on a single-split corpus
    val b = banded.as("b").hint("shuffle_hash")
    a.join(b, col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  private val MinhashK = 32
  private val MinhashBands = 8 // 8 bands x 4 rows

  /** Content-dedup layer (r18, found by the duplication-structure audit):
    * signature/banding/pair math in the near-dup family depends only on
    * CONTENT — identical texts have identical shingle sets, signatures,
    * and band keys — so the quadratic stages run per DISTINCT TEXT and
    * expand back to doc granularity at the end. Work becomes a function
    * of the corpus's distinct-content structure: strictly ≤ the per-doc
    * spelling under EVERY corpus structure, and duplication (the
    * realistic adversarial case — the r17b q143 OOM class) collapses to
    * the original-content universe. Returns:
    *   ids  — one row per distinct text: (rep = min doc_id, ids = sorted
    *          doc-id list), persisted (several consumers, content-sized);
    *   reps — the corpus cut to representative rows (doc_id, text),
    *          STREAMING (one full-text doc_id-keyed exchange — the same
    *          exchange the r17b repartition hoist paid, so the
    *          independent-corpus cost is one extra skinny scan+hash pass).
    * Mechanics pinned by measurement (PLANS r18): no text ever enters an
    * aggregate (a first(text) spelling fell off the codegen hash-agg path
    * into the object/sort fallback and re-sorted the corpus), and the
    * semi carries no broadcast hint (the rep set is corpus-sized under
    * independent structure — the q139 lesson; the size-based planner
    * degrades it to a shuffle join gracefully).
    * Cache contract (r19, advisor): `ids` is persisted here (several
    * consumers read it — the expansion joins, the same-content branch)
    * and consumers' banded frames persist in their own builders; none of
    * them can unpersist before returning without defeating the reuse the
    * persist exists for, so the SESSION OWNER releases them — the
    * Bench/Verify/BenchScale `clearCache()`-between-queries convention.
    * r20: embedding API users get the mechanical alternative — run the
    * query inside [[graft.CacheScope.scoped]] and every builder-persisted
    * frame (all persists go through `persistTracked()`) is released when
    * the block exits (CacheHygieneSpec).
    */
  /** CPU-dense doc_id text exchange with a PINNED partition count (r18):
    * AQE's coalescer sizes partitions by BYTES, so a small corpus's text
    * exchange collapses toward one partition and the downstream
    * 32-family/64-vote hashing runs serial — measured on q48 at sf0.1:
    * ~4.9 s with the coalesced exchange vs 0.3 s pinned, flat from 8 to
    * 32 threads (R18Probe2: one 4.6 s task in the final stage). This is
    * the R17Probe9 serialization re-entering through AQE instead of file
    * layout. An explicit numPartitions exempts the exchange from
    * coalescing; the session's shuffle parallelism is exactly the count
    * the aggregate's own exchange would have carried.
    */
  private def byDoc(docs: DataFrame): DataFrame =
    docs.repartition(
      docs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt,
      col("doc_id"))

  private[operators] def contentLayer(docs: DataFrame): (DataFrame, DataFrame) = {
    val ids = docs
      .select(md5(col("text")).as("cid"), col("doc_id"))
      .groupBy(col("cid"))
      .agg(min(col("doc_id")).as("rep"),
        sort_array(collect_list(col("doc_id"))).as("ids"))
      .select(col("rep"), col("ids"))
      .persistTracked()
    val reps = byDoc(docs.select(col("doc_id"), col("text")))
      .join(ids.select(col("rep").as("doc_id")), Seq("doc_id"), "left_semi")
    (ids, reps)
  }

  /** Degeneracy bound for the row-local pair expansions (r20, VERDICT r19
    * #2 — the one residual the r19 scaladoc documented but did not
    * enforce): an id list longer than this is sliced into ≤-this-sized
    * segments and the SEGMENT GRID is redistributed (one round-robin
    * exchange) before the element explodes, so a boilerplate content
    * duplicated 10⁵+ times parallelizes its ~10¹⁰-row expansion across
    * ceil(n/seg)² tasks instead of serializing it on one. Normal corpora
    * (every audited structure: ≤100 copies/content at 10×/100×
    * duplication) never exceed the bound — their rows take the original
    * single-generate path and the degenerate branch stays empty (its
    * per-task cost is an empty filter; the branch's exchange moves zero
    * rows).
    */
  private[operators] val ExpandSegment = 4096

  /** ≤seg-element contiguous slices of an array column. */
  private def chunks(c: Column, seg: Int): Column =
    transform(
      sequence(lit(0),
        greatest(ceil(size(c).cast("double") / lit(seg.toDouble)).cast("int"),
          lit(1)) - lit(1)),
      i => slice(c, i * lit(seg) + lit(1), lit(seg)))

  /** [[chunks]] tagged with the chunk index (for the i ≤ j same-array
    * grid). */
  private def chunkedIdx(c: Column, seg: Int): Column =
    transform(
      sequence(lit(0),
        greatest(ceil(size(c).cast("double") / lit(seg.toDouble)).cast("int"),
          lit(1)) - lit(1)),
      i => struct(i.as("i"), slice(c, i * lit(seg) + lit(1), lit(seg)).as("seg")))

  /** Doc-pair expansion of a representative-pair frame (r18): attach both
    * sorted id lists and emit one row per (least, greatest) combination —
    * two row-local generators, no doc-granularity join. `payload` columns
    * ride through unchanged (they are content-pair functions). The ids
    * joins sit ABOVE the pair aggregate by construction: pair-keyed ⨝
    * content-keyed, both bounded by the query's own output domain — the
    * shuffle-join class the r17b rule allows.
    *
    * Duplication-degree bound (r20 — mechanical, was documentation-only
    * in r19): rows where either id list exceeds [[ExpandSegment]] divert
    * to a sliced spelling — both lists chunk into ≤seg segments, the
    * segment grid explodes first (ceil(na/seg)·ceil(nb/seg) rows, each
    * carrying ≤seg² element pairs), one round-robin exchange spreads the
    * grid, and only then do the element explodes run — so ONE degenerate
    * content pair's |ids_a|·|ids_b| doc pairs land on many tasks instead
    * of one. Normal rows keep the r18 single-generate plan; on corpora
    * with NO degenerate rows the branch is elided from the plan entirely
    * (the fork-cache eager fill doubles as the driver-side probe — r20b).
    * Equivalence (exact row multiset) is pinned in
    * ContentLayerSpec at a tiny segment bound and end-to-end at the
    * default bound on a 4200-copy content.
    */
  private[operators] def expandRepPairs(pairs: DataFrame, ids: DataFrame,
      payload: Seq[String], seg: Int = ExpandSegment): DataFrame = {
    val p = payload.map(col)
    // Fork-point cache (r20b): normal/degenerate are COMPLEMENTARY filters
    // over this frame — without a cache here each branch re-executes the
    // whole pair pipeline above it (the banded self-join + verify +
    // distinct), which read +52%/+63% on the q55/q56 gate rows the day the
    // fork landed (tools/scale_r20_dev1.json; A/B in BASELINE.md r20).
    // The frame is bounded by the query's own pair-output domain.
    val joined = pairs
      .join(ids.select(col("rep").as("ra"), col("ids").as("ids_a")), Seq("ra"))
      .join(ids.select(col("rep").as("rb"), col("ids").as("ids_b")), Seq("rb"))
      .persistTracked()
    // Eager fill (see minhashCandidates) doubling as the DEGENERACY PROBE:
    // when no row exceeds the bound — every audited corpus — the degenerate
    // branch is elided from the plan entirely (no empty exchange stage, no
    // union), so normal corpora pay exactly the r18 single-generate plan
    // plus this count. Driver-side adaptivity, same pattern as q49's
    // threshold collect.
    val nDeg = joined
      .where(size(col("ids_a")) > seg || size(col("ids_b")) > seg).count()
    val normal = joined
      .where(size(col("ids_a")) <= seg && size(col("ids_b")) <= seg)
      .select(p :+ explode(col("ids_a")).as("da") :+ col("ids_b"): _*)
      .select(p :+ col("da") :+ explode(col("ids_b")).as("db"): _*)
    val parts = pairs.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    def deg = joined
      .where(size(col("ids_a")) > seg || size(col("ids_b")) > seg)
      .select(p ++ Seq(explode(chunks(col("ids_a"), seg)).as("sa"),
        col("ids_b")): _*)
      .select(p ++ Seq(col("sa"),
        explode(chunks(col("ids_b"), seg)).as("sb")): _*)
      .repartition(parts)
      .select(p ++ Seq(explode(col("sa")).as("da"), col("sb")): _*)
      .select(p :+ col("da") :+ explode(col("sb")).as("db"): _*)
    (if (nDeg == 0) normal else normal.unionByName(deg))
      .select(least(col("da"), col("db")).as("doc_a") +:
        greatest(col("da"), col("db")).as("doc_b") +: p: _*)
  }

  /** All ordered (doc_a < doc_b) pairs from each row's SORTED `ids` array,
    * payload riding — the same-content half of the expansion family.
    * Shares [[expandRepPairs]]'s mechanical degeneracy bound: arrays
    * longer than seg chunk into the indexed segment grid (i ≤ j — sound
    * because `ids` is sorted ascending and doc ids are unique, so chunk
    * i's elements all precede chunk j's for i < j and the da < db filter
    * completes the triangle exactly), redistribute, then explode.
    */
  private[operators] def sameIdPairs(rows: DataFrame, payload: Seq[String],
      seg: Int = ExpandSegment): DataFrame = {
    val p = payload.map(col)
    // Fork-point cache + degeneracy probe — same rule as expandRepPairs
    // (r20b): the probe fills the cache AND elides the degenerate branch
    // when it is empty.
    val r = rows.persistTracked()
    val nDeg = r.where(size(col("ids")) > seg).count()
    val normal = r.where(size(col("ids")) <= seg)
      .select(p :+ explode(col("ids")).as("da") :+ col("ids"): _*)
      .select(p :+ col("da") :+ explode(col("ids")).as("db"): _*)
      .where(col("da") < col("db"))
    val parts = rows.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    def deg = r.where(size(col("ids")) > seg)
      .select(p :+ chunkedIdx(col("ids"), seg).as("cs"): _*)
      .select(p :+ explode(col("cs")).as("ca") :+ col("cs"): _*)
      .select(p ++ Seq(col("ca"), explode(col("cs")).as("cb")): _*)
      .where(col("ca.i") <= col("cb.i"))
      .repartition(parts)
      .select(p ++ Seq(explode(col("ca.seg")).as("da"),
        col("cb.seg").as("sb")): _*)
      .select(p :+ col("da") :+ explode(col("sb")).as("db"): _*)
      .where(col("da") < col("db"))
    (if (nDeg == 0) normal else normal.unionByName(deg))
      .select(col("da").as("doc_a") +: col("db").as("doc_b") +: p: _*)
  }

  /** Same-content doc pairs (r18): every content with ≥2 copies yields all
    * id-list combinations — duplicates agree on every band/signature
    * component by construction. `withSig` restricts to contents that have
    * a signature (<3-token texts produce no shingles and were never
    * candidates in the per-doc spellings either). Degeneracy-bounded via
    * [[sameIdPairs]] (r20).
    */
  private def sameContentPairs(ids: DataFrame, withSig: DataFrame): DataFrame =
    sameIdPairs(
      withSig.select(col("rep"))
        .join(ids.where(size(col("ids")) >= 2), Seq("rep"))
        .select(col("ids")),
      Nil)

  /** MinHash signatures (k=32) over word-3-gram shingles, plus the 8 banded
    * LSH keys. One explode + one hash-aggregate of 32 codegen'd MINs.
    *
    * r12: the shingle string is hashed ONCE (xxhash64) and the 32
    * exchangeable families are derived from that 64-bit value by
    * re-hashing it with the family index (Broder's construction —
    * minhash only needs exchangeable uniform families, not independent
    * string hashes). 32 variable-length string hashes per posting become
    * one string hash + 32 fixed-width long hashes; the map-side partial
    * aggregate and the doc_id exchange are unchanged. Decision parity
    * with the md5-portable oracled spelling is pinned by XxParitySpec
    * (identical content collides, planted near-dups recovered).
    */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    // repartition(doc_id) at the text level: the 32 min-hash families
    // otherwise evaluate in the scan stage (file-layout parallelism);
    // one exchange total — see [[simhash]]
    val sh = shinglesDistinct(byDoc(docs))
      .select(col("doc_id"), xxhash64(col("shingle")).as("h"))
    val mins = (0 until MinhashK).map(i => min(xxhash64(lit(i), col("h"))).as(s"m$i"))
    val sig = sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
    val bandCols = (0 until MinhashBands).map { b =>
      xxhash64((b * 4 until b * 4 + 4).map(i => col(s"m$i")): _*).as(s"band$b")
    }
    sig.select(col("doc_id") +: array((0 until MinhashK).map(i => col(s"m$i")): _*).as("signature") +: bandCols: _*)
  }

  def qMinhash(s: SparkSession, dir: String): DataFrame =
    minhashSignatures(t(s, dir, "documents"))

  /** Portable MinHash for the driver oracle: same banded-LSH shape as
    * [[minhashSignatures]] but each of the 32 hash families is the
    * lexicographic MIN over md5 hex strings (salted with the family index),
    * and the output is doc_id + the 8 band keys (md5 of 4 concatenated
    * mins) — scalar string columns only, no array in the result, and every
    * step is evaluable identically by DuckDB. Hex strings compare bytewise
    * identically under Spark's UTF8 ordering and DuckDB's default VARCHAR
    * collation, so the MINs agree bit-for-bit. The xxhash64 variant stays
    * the scale default (one codegen'd 64-bit hash per token vs md5 + string
    * ops); minhash only needs exchangeable uniform hash families.
    */
  def qMinhashBands(s: SparkSession, dir: String): DataFrame = {
    // r18 content layer: the 32 md5 families run once per DISTINCT TEXT
    // (contentLayer's semi replaces the bare repartition — same full-text
    // exchange, the R17Probe9 hoist property preserved) and the per-doc
    // rows re-emerge by a row-local explode over the id lists.
    val (ids, reps) = contentLayer(t(s, dir, "documents"))
    val bandCols = (0 until MinhashBands).map(b => col(s"band$b"))
    minhashBandsOf(reps).withColumnRenamed("doc_id", "rep")
      .join(ids, Seq("rep"))
      .select(explode(col("ids")).as("doc_id") +: bandCols: _*)
  }

  /** The md5-portable signature+band build of [[qMinhashBands]] over any
    * (doc_id, text) frame — per-row keyed by whatever granularity the
    * caller feeds it (docs, or contentLayer representatives).
    */
  private def minhashBandsOf(docs: DataFrame): DataFrame = {
    val sh = shinglesDistinct(docs)
    val mins = (0 until MinhashK).map(i =>
      min(md5(concat_ws(":", lit(i), col("shingle")).cast("binary"))).as(s"m$i"))
    val sig = sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
    val bands = (0 until MinhashBands).map { b =>
      md5(concat_ws("|", (b * 4 until b * 4 + 4).map(i => col(s"m$i")): _*).cast("binary"))
        .as(s"band$b")
    }
    sig.select(col("doc_id") +: bands: _*)
  }

  val qMinhashBandsSql: String = {
    val mins = (0 until MinhashK)
      .map(i => s"MIN(md5('$i:' || shingle)) AS m$i").mkString(",\n    ")
    val bands = (0 until MinhashBands).map { b =>
      val parts = (b * 4 until b * 4 + 4).map(i => s"m$i").mkString(" || '|' || ")
      s"md5($parts) AS band$b"
    }.mkString(",\n  ")
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
       |           WHERE len(string_split(text, ' ')) >= 3),
       |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
       |         generate_series(1, len(toks) - 2),
       |         i -> array_to_string(toks[i:i+2], ' ')))) AS shingle
       |       FROM d),
       |m AS (SELECT doc_id,
       |    $mins
       |  FROM sh GROUP BY doc_id)
       |SELECT doc_id,
       |  $bands
       |FROM m""".stripMargin
  }

  /** LSH candidate pairs: docs agreeing on ≥1 of the 8 band keys.
    * The banded frame (ndocs × 8 rows) is persisted before the self-join
    * — same convention as q56's oracled spelling: without it the whole
    * corpus-sized signature aggregation under `sigs` evaluates once per
    * join side (measured ~2× on the 10× rebuild; ReuseExchange does not
    * reliably dedupe the AQE-replanned sides). The session owner
    * (Bench/Verify clearCache) releases it.
    */
  def minhashCandidates(sigs: DataFrame): DataFrame = {
    val banded = sigs.select(col("doc_id"),
      explode(array((0 until MinhashBands).map(b =>
        struct(lit(b).as("band"), col(s"band$b").as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))
      .persistTracked()
    // eager fill (q147 cold-build convention): sibling AQE stages that
    // scan an UNFILLED InMemoryRelation concurrently each recompute its
    // child plan — the self-join's two sides would race on a cold cache
    // and re-run the corpus-sized signature aggregate per side
    banded.count()
    val a = banded.as("a")
    // shuffle_hash: see qSimhashNearDupPairsGeneric — candidate self-joins
    // partition by bucket key, never broadcast
    val b = banded.as("b").hint("shuffle_hash")
    a.join(b, col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** N-gram Jaccard via an inverted shingle index (join on shingle →
    * common counts → |A∪B| = |A|+|B|-common). Bucketed by shingle; the skew
    * guard drops ubiquitous shingles (df > maxDfFrac of the corpus) like a
    * stopword filter — at 100 TB those buckets would otherwise
    * quadratically dominate. Numerator AND denominators are computed over
    * the same filtered shingle universe, so the similarity is exact
    * filtered-Jaccard (== exact Jaccard whenever the cap doesn't bite).
    *
    * Scale shape: per-doc distinct shingle ARRAYS are built ONCE and
    * persisted; the hot-shingle set is tiny by construction (≤ 1/maxDfFrac
    * distinct values per corpus-size unit), so it collapses to one
    * broadcast row and is removed ROW-LOCALLY with array_except — no
    * anti-join, and n_sh = size of the kept array is free at the scan, so
    * no sizes table ever joins back onto the pair frame (r16; see the
    * in-body note for the measured 100x failure of the join spelling).
    */
  def jaccardPairs(docs: DataFrame, maxDfFrac: Double = 0.5,
      hashShingles: Boolean = false): DataFrame = {
    // The row-local hot-set spelling is safe BECAUSE the hot set is
    // bounded by ≤ avg_shingles_per_doc/maxDfFrac members: it collapses
    // to one collect_list row and broadcasts. A tiny maxDfFrac (say
    // 0.01 on a large corpus) would grow that single row past the
    // broadcast/row limits where the retired anti-join degraded
    // gracefully — bound it rather than fail weirdly downstream
    // (advisor r16). Callers needing a more aggressive cap should
    // pre-filter the corpus instead.
    require(maxDfFrac >= 0.1 && maxDfFrac <= 1.0,
      s"maxDfFrac=$maxDfFrac outside [0.1, 1]: the broadcast hot set is " +
        "only bounded for df caps ≥ 0.1 of the corpus")
    // hashShingles is the scale default (bench x49): the posting list and
    // its self-join shuffle carry an 8-byte xxhash64 instead of the raw
    // shingle string; per-doc shingle sets stay distinct modulo ~1/2⁶⁴
    // collisions, so counts (and Jaccard) are unchanged in practice. The
    // gated q49 keeps raw strings so it is spelling-identical to DuckDB.
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val arrRaw = docs.select(col("doc_id"),
      call_function("word_shingles", col("text"), lit(3), lit(true)).as("arr"))
    val units = if (hashShingles)
        arrRaw.select(col("doc_id"), expr("transform(arr, s -> xxhash64(s))").as("arr"))
      else arrRaw
    val nDocs = docs.select(count(lit(1)).as("n_docs"))
    val (kept, pairRows) = keptShingleArrays(units, "doc_id", None, nDocs, maxDfFrac)
    postingPairAgg(kept, pairRows, "doc_id", None, "doc_a", "doc_b")
  }

  /** Hot-capped kept-shingle arrays — the shared head of the posting-join
    * pair family (per-doc jaccardPairs and the content-granularity q49).
    * Input `units`: (idCol[, weightCol], arr). Per-unit shingle ARRAYS
    * survive to the hot-filter (r16): the retired spelling exploded
    * first, anti-joined the hot set out, and later joined a sizes table
    * back onto the AGGREGATED pairs — two joins against the largest
    * frame in the query; at the 100× corpus the sizes side crossed the
    * broadcast threshold and both joins became sort-merge over the
    * 113M-pair frame (2 extra pair-frame exchanges + sorts, 6.5 GB of
    * spill, ~60% of the query's wall — R16Probe2 stage ledger,
    * tools/probe100x_r16_spark.log). Row-local instead: the hot set is
    * BOUNDED (df > maxDfFrac·n_docs ⟹ at most avg_shingles/maxDfFrac
    * members), so it collapses to one collect_list row, broadcasts, and
    * array_except drops it from each unit's array in place; n_sh =
    * size(ka) is free at the scan (R16Probe3 A/B/C: old 15.5 s, window
    * n_sh-carry 18.8 s, this 14.5 s; 100x full query 336 → ~107 s).
    * With `weightCol` (copy counts), df = sum(weight) — identical to the
    * per-doc COUNT(*) in exact integers, so the hot set is the same set.
    *
    * Caller contract: `units` is persisted and eagerly filled here (the
    * hot-set aggregate and the posting explode both read it); the
    * returned plan references it, so it cannot be unpersisted before
    * return. Session owners running many queries should clearCache()
    * between them (Bench/Verify convention).
    */
  private def keptShingleArrays(units: DataFrame, idCol: String,
      weightCol: Option[String], nDocs: DataFrame,
      maxDfFrac: Double): (DataFrame, Long) = {
    val arr = units.persistTracked()
    arr.count() // eager fill — see minhashCandidates
    val dfAgg = weightCol match {
      case Some(w) => arr.select(explode(col("arr")).as("shingle"), col(w))
        .groupBy(col("shingle"))
        .agg(sum(col(w)).as("df"), count(lit(1)).as("cnt"))
      case None => arr.select(explode(col("arr")).as("shingle"))
        .groupBy(col("shingle"))
        .agg(count(lit(1)).as("df"), count(lit(1)).as("cnt"))
    }
    // ONE driver-side pass over the df aggregate returns BOTH plan inputs
    // (r20): the bounded hot set (≤ avg_shingles/maxDfFrac members — the
    // r16 broadcast-rule bound, now a driver value instead of a lazy
    // BroadcastExchange subplan) and the EXACT posting-join output size
    // Σ cnt·(cnt−1)/2 over the kept shingles, which sizes the pair
    // exchanges to the data (postingPairAgg) instead of a 4×cores
    // constant. `cnt` counts UNITS per shingle — the self-join's row
    // expansion — independent of the copy weights that define hotness.
    // One collect job replaces one broadcast-build job; doubling it as
    // the sizing probe is the q49 threshold-collect convention.
    val stat = dfAgg.crossJoin(broadcast(nDocs)).agg(
      collect_list(when(col("df") > col("n_docs") * maxDfFrac,
        col("shingle"))).as("hot"),
      sum(when(col("df") <= col("n_docs") * maxDfFrac,
        col("cnt") * (col("cnt") - lit(1L)))).as("pairs2")).head()
    val pairRows = if (stat.isNullAt(1)) 0L else stat.getLong(1) / 2
    // the collected hot set re-enters the plan as a one-row LocalRelation
    // broadcast (no build job, no per-task literal bloat)
    val hotDf = units.sparkSession.createDataFrame(
      java.util.Collections.singletonList(org.apache.spark.sql.Row(
        stat.getSeq[Any](0))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("hot",
          org.apache.spark.sql.types.ArrayType(
            dfAgg.schema("shingle").dataType), nullable = false))))
    val lead = col(idCol) +: weightCol.map(col).toSeq
    val kept = arr.crossJoin(broadcast(hotDf))
      .select(lead :+ array_except(col("arr"), col("hot")).as("ka"): _*)
      .select(lead :+ col("ka") :+ size(col("ka")).as("n_sh"): _*)
    (kept, pairRows)
  }

  /** Posting-list self-join + pair aggregate over [[keptShingleArrays]]
    * output — the shared tail of the pair family. Output: (aName, bName,
    * common, n_a, n_b[, mult], jaccard), with mult = max(w_a·w_b) when a
    * weight column rides the rows (the content-granularity doc-pair
    * multiplicity).
    *
    * Partition count sized to the pair EXPANSION, not the input (r15):
    * the self-join's output is Σ df² — ~100× its input on a 10× corpus —
    * and the pair groups are near-distinct, so each map-side partial
    * aggregate holds ~all of its partition's pairs. At the session
    * default (cores) partitions the partial maps exceed task memory and
    * thrash through spill-rebuild cycles (measured: ~80% of the query's
    * CPU); at 4× cores each map fits and the same aggregate runs clean.
    * Explicit N also pins the join OFF the broadcast path — a size-based
    * broadcast (the corpus parquet can sit under the 10 MB threshold)
    * would glue the whole expansion to the stream side's partitioning:
    * ONE task on a single-split file, measured as a 21-CPU-minute
    * 5 GB-spill runaway. Partitioning by shingle, sized to the output,
    * is the only shape that scales. The explicit wide exchange on the
    * pair key BEFORE the aggregate exists because the session-default
    * partition count is a ceiling under AQE (it can only coalesce), so
    * the 113M-group final aggregate would otherwise run at ≤cores
    * partitions with >100 MB hash maps per task; raw pairs shuffle +22%
    * more rows, but every aggregate map fits and the useless map-side
    * partial agg (~1.2 rows/group) disappears below the exchange.
    */
  private def postingPairAgg(kept: DataFrame, pairRows: Long, idCol: String,
      weightCol: Option[String], aName: String, bName: String): DataFrame = {
    // Pair exchanges sized to the EXACT expansion (r20; was a flat
    // 4×cores): Σ cnt·(cnt−1)/2 is known from the hot-set collect, so
    // partitions = expansion / 2²⁰ rows — the r15 operating point (113M
    // pairs ran clean at 128 partitions ≈ 880k/map and thrashed at 32 ≈
    // 3.5M/map) — floored at the session parallelism and capped at 2¹⁵
    // (past ~34G pairs, raise the session parallelism with the cluster;
    // the cap only guards the driver against absurd task counts). At
    // bench SF the estimate reads ~1.3M pairs → cores partitions,
    // retiring the 128-task deser-bound stages (R20Prof: ~68 ms/task
    // deserialization, 10.9 s summed on a 21 MB stage).
    val parts = math.min(math.max(
      kept.sparkSession.sparkContext.defaultParallelism.toLong,
      (pairRows + (1L << 20) - 1) / (1L << 20)), 1L << 15).toInt
    val lead = col(idCol) +: weightCol.map(col).toSeq
    val keepN = kept.where(col("n_sh") >= 1)
      .select(lead ++ Seq(col("n_sh"), explode(col("ka")).as("shingle")): _*)
    // The posting table is persisted POST-exchange and eagerly filled:
    // both self-join sides scan the cache — AQE's exchange reuse misses
    // the two canonically-identical repartitions (the q49 before-plan ran
    // Exchange(93) AND Exchange(135), the same explode+shuffle twice;
    // plans/r20/q49_jaccard_top_pairs_before.txt, zero ReusedExchange) —
    // and InMemoryTableScan preserves the cached exchange's
    // HashPartitioning(shingle), so neither side re-shuffles. Bounded by
    // Σ postings (the same class as the `arr` cache above it); the
    // session owner / CacheScope releases it.
    val keyed = keepN.repartition(parts, col("shingle")).persistTracked()
    keyed.count() // eager fill — sibling AQE stages must not race it cold
    val a = keyed.select(Seq(col(idCol).as(aName), col("shingle"),
      col("n_sh").as("n_a")) ++ weightCol.map(w => col(w).as("w_a")): _*)
    val b = keyed.select(Seq(col(idCol).as(bName), col("shingle"),
        col("n_sh").as("n_b")) ++ weightCol.map(w => col(w).as("w_b")): _*)
      .hint("merge")
    val aggs = Seq(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b")) ++
      // n_a/n_b (and w_a/w_b) are constant within a pair group — max()
      // reads them back without widening the 16-byte group key
      weightCol.map(_ => max(col("w_a") * col("w_b")).as("mult"))
    a.join(b, Seq("shingle")).where(col(aName) < col(bName))
      .repartition(parts, col(aName), col(bName))
      .groupBy(col(aName), col(bName))
      .agg(count(lit(1)).as("common"), aggs: _*)
      .withColumn("jaccard",
        col("common").cast("double") / (col("n_a") + col("n_b") - col("common")))
  }

  /** Top-20 most-similar document pairs by 3-gram filtered-Jaccard.
    *
    * r19: rides the content-dedup layer (VERDICT r18 #2 — "a content-layer
    * rewrite making the [q49 pin-headroom] question moot"; the last heavy
    * pair family off the per-doc posting join). Everything the pair math
    * needs is a CONTENT function — identical texts have identical shingle
    * sets, so document frequency is the COPY-WEIGHTED content frequency
    * (sum(copies) ≡ the per-doc COUNT(*), exactly, in integers), the hot
    * set, kept-array and n_sh are per-content, and the posting self-join +
    * pair aggregate run on the distinct-content universe: the quadratic
    * stage is ~duplication² smaller under duplication and identical under
    * independent structure (the audited 10× dup corpus: 50k docs → 4,992
    * contents → the 113M-row pair aggregate collapses to the ~1.1M
    * content-pair frame).
    *
    * The top-20 never expands more than it must: candidate content pairs
    * (cross: copies_a·copies_b doc pairs each; same-content: C(copies,2)
    * at jaccard exactly 1) are ranked by jaccard, a driver-side
    * 20-row collect derives the threshold T = the k-th candidate's
    * jaccard where the cumulative doc-pair multiplicity first reaches 20
    * (a constant-bounded collect, the q85 budget convention), and only
    * candidates with jaccard ≥ T expand to doc pairs before the final
    * TakeOrdered. Correctness: the true 20th doc pair's jaccard j*
    * satisfies f(j*) ≥ 20 ≥ cumulative-at-T ⟹ T ≤ j*, so every true
    * top-20 doc pair survives the filter regardless of tie ordering in
    * the collect; the final (jaccard DESC, doc_a, doc_b) sort is the
    * deterministic oracle ordering. The oracle SQL is untouched.
    */
  def qJaccardTopPairs(s: SparkSession, dir: String): DataFrame =
    jaccardTopPairs(s, dir, hashShingles = false)

  /** Parameterized core of q49 / its bench twin x49 (r20, VERDICT r19
    * #5): `hashShingles = true` is the SCALE DEFAULT — the posting list
    * and its self-join shuffle carry an 8-byte xxhash64 of each shingle
    * instead of the raw string (counts, and so Jaccard, unchanged modulo
    * ~1/2⁶⁴ collisions; decision parity pinned in DedupSpec). The gated
    * q49 keeps raw strings so it is spelling-identical to DuckDB. Until
    * r19 the twin still ran the retired PER-DOC posting plan (the
    * suite's slowest row, ~2.4× its q49 sibling); it now rides the same
    * content-layer weight-parameterized core, so the twin prices exactly
    * the hash-family swap and nothing else.
    */
  def jaccardTopPairs(s: SparkSession, dir: String,
      hashShingles: Boolean): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val (ids, reps) = contentLayer(t(s, dir, "documents"))
    // per-content kept-shingle arrays + copy counts through the SHARED
    // posting-pair core (r19 review follow-up): the r15/r16 mechanics
    // (bounded one-row hot broadcast, array_except in place, n_sh riding
    // the shuffles, expansion-sized exchanges, pinned-off-broadcast
    // self-join) live once in keptShingleArrays/postingPairAgg; this
    // site supplies the copy weights — df = sum(copies) ≡ the per-doc
    // COUNT(*) in exact integers, mult = max(copies_a·copies_b) — at the
    // library-default 0.5 df cap (inside jaccardPairs' [0.1, 1] bound).
    val sizes = ids.select(col("rep"), size(col("ids")).cast("long").as("copies"))
    val arrRaw = reps.select(col("doc_id").as("rep"),
      call_function("word_shingles", col("text"), lit(3), lit(true)).as("arr"))
    val shingled = if (hashShingles)
        arrRaw.select(col("rep"), expr("transform(arr, s -> xxhash64(s))").as("arr"))
      else arrRaw
    val units = shingled.join(sizes, Seq("rep"))
    val nDocs = ids.select(sum(size(col("ids"))).as("n_docs"))
    val (ka, pairRows) = keptShingleArrays(units, "rep", Some("copies"), nDocs, 0.5)
    val cross = postingPairAgg(ka, pairRows, "rep", Some("copies"), "ra", "rb")
      .select(col("ra"), col("rb"), col("common"), col("jaccard"), col("mult"))
    // ≥2-copy contents with a nonempty kept set: all-hot or <3-token
    // contents produced no posting rows per-doc either
    val same = ka.where(col("copies") >= 2 && col("n_sh") >= 1)
      .select(col("rep").as("ra"), col("rep").as("rb"),
        col("n_sh").cast("long").as("common"), lit(1.0).as("jaccard"),
        (col("copies") * (col("copies") - 1) / lit(2)).cast("long").as("mult"))
    val cand = cross.unionByName(same).persistTracked()
    // threshold: smallest jaccard needed to cover 20 doc pairs (collect
    // is ≤20 rows by construction)
    val top = cand.select(col("jaccard"), col("mult"))
      .orderBy(col("jaccard").desc).limit(20).collect()
    var cum = 0L
    var thr = Double.NegativeInfinity
    val it = top.iterator
    while (it.hasNext && cum < 20) {
      val r = it.next()
      cum += r.getLong(1)
      thr = r.getDouble(0)
    }
    val keep = cand.where(col("jaccard") >= thr)
    val crossDocs = expandRepPairs(
      keep.where(col("ra") =!= col("rb"))
        .select(col("ra"), col("rb"), col("common"), col("jaccard")),
      ids, Seq("common", "jaccard"))
    val sameDocs = sameIdPairs(
      keep.where(col("ra") === col("rb"))
        .select(col("ra").as("rep"), col("common"), col("jaccard"))
        .join(ids, Seq("rep")),
      Seq("common", "jaccard"))
      .select(col("doc_a"), col("doc_b"), col("common"), col("jaccard"))
    crossDocs.select(col("doc_a"), col("doc_b"), col("common"), col("jaccard"))
      .unionByName(sameDocs)
      .orderBy(col("jaccard").desc, col("doc_a").asc, col("doc_b").asc)
      .limit(20)
      .select(col("doc_a"), col("doc_b"), col("common"), col("jaccard"))
  }

  val qJaccardTopPairsSql: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |           WHERE len(string_split(text, ' ')) >= 3),
      |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
      |         generate_series(1, len(toks) - 2),
      |         i -> array_to_string(toks[i:i+2], ' ')))) AS shingle
      |       FROM d),
      |hot AS (SELECT shingle FROM sh GROUP BY shingle
      |        HAVING COUNT(*) > 0.5 * (SELECT COUNT(*) FROM documents)),
      |keep AS (SELECT * FROM sh WHERE shingle NOT IN (SELECT shingle FROM hot)),
      |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM keep GROUP BY doc_id),
      |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |            CAST(COUNT(*) AS BIGINT) AS common
      |          FROM keep a JOIN keep b USING (shingle)
      |          WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
      |SELECT doc_a, doc_b, common,
      |  CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common) AS jaccard
      |FROM pairs
      |JOIN sizes sa ON sa.doc_id = doc_a
      |JOIN sizes sb ON sb.doc_id = doc_b
      |ORDER BY jaccard DESC, doc_a ASC, doc_b ASC LIMIT 20""".stripMargin

  /** Naive-Bayes language ID (n-gram/token heuristic): train token
    * likelihoods on even doc_ids, classify odd doc_ids, report per-language
    * accuracy. All joins are broadcast (vocab/profiles are small by
    * construction); the corpus side only explodes and aggregates.
    */
  def qLangId(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val langs = Seq("de", "en", "es", "fr", "zh")
    val tok = docs.select(col("doc_id"), col("lang"), explode(toks(col("text"))).as("token"))
      .where(col("token") =!= "")
    val train = tok.where(col("doc_id") % 2 === 0)
    val test = tok.where(col("doc_id") % 2 === 1)

    val langTotals = train.groupBy("lang").agg(count(lit(1)).as("lang_n"))
    val vocab = train.agg(countDistinct(col("token")).as("v"))
    // log P(token|lang) with add-one smoothing, pivoted to one row per token
    val profile = train.groupBy("lang", "token").agg(count(lit(1)).as("tf"))
      .join(broadcast(langTotals), "lang")
      .crossJoin(broadcast(vocab))
      .withColumn("logp", log((col("tf") + 1).cast("double") / (col("lang_n") + col("v"))))
      .groupBy("token").pivot("lang", langs).agg(first("logp"))
    // unseen-token default per lang: log(1 / (lang_n + V))
    val defaults = langTotals.crossJoin(vocab)
      .withColumn("logp0", log(lit(1.0) / (col("lang_n") + col("v"))))
      .groupBy().pivot("lang", langs).agg(first("logp0"))
    val defCols = langs.map(l => col(l).as(s"def_$l"))
    val scored = test
      .join(broadcast(profile.withColumnRenamed("token", "ptoken")),
        col("token") === col("ptoken"), "left")
      .crossJoin(broadcast(defaults.select(defCols: _*)))
      .select(col("doc_id") +: col("lang").as("true_lang") +:
        langs.map(l => coalesce(col(l), col(s"def_$l")).as(s"s_$l")): _*)
      .groupBy(col("doc_id"), col("true_lang"))
      .agg(langs.map(l => sum(col(s"s_$l")).as(s"sc_$l")).head,
        langs.map(l => sum(col(s"s_$l")).as(s"sc_$l")).tail: _*)
    val best = langs.map(l => struct(col(s"sc_$l").as("score"), lit(l).as("lang")))
    val pred = scored.withColumn("pred_lang", greatest(best: _*).getField("lang"))
    pred.groupBy(col("true_lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("pred_lang") === col("true_lang"), 1).otherwise(0)).as("n_correct"))
  }

  /** Shared rep-level core of q55/q105 (r19 content layer — the last two
    * per-doc pair plans, VERDICT r18 #1): the banded self-join and the
    * hamming verification run on the distinct-content universe. SimHash
    * bands and the 64-bit hamming are CONTENT functions (identical texts
    * → identical token streams → identical votes), so the quadratic
    * stage collapses to the original-content universe under duplication
    * — the structure where the per-doc spelling read 87.6 s warm at
    * 100× dup while converted siblings (q143, same 27M-pair output) read
    * 14.4 s cold. Returns (pairs, ids, sigReps): pairs = (ra, rb,
    * hamming) at representative granularity, verified hamming ≤ 3 and
    * distinct; ids/sigReps as in [[minhashRepPairs]].
    */
  private def simhashRepPairs(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val (ids, reps) = contentLayer(t(s, dir, "documents"))
    // persisted: consumed by both self-join sides — without it the 64-vote
    // aggregation over every distinct-text token recomputes per consumer
    val bands = simhashBandsOf(reps).withColumnRenamed("doc_id", "rep").persistTracked()
    bands.count() // eager fill — see minhashCandidates
    // Each banded row carries ALL four band values alongside its blocking
    // key, so the exact hamming is computable straight off the self-join
    // output — no joins back to the signature table. The payload is 4 ints
    // per row; the two verify joins it replaces each re-shuffled the whole
    // signature table.
    val banded = bands.select(col("rep"),
      array((0 until 4).map(b => col(s"band$b")): _*).as("bv"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("b"), col(s"band$b").as("k"))): _*)).as("bk"))
      .select(col("rep"), col("bv"), col("bk.b"), col("bk.k"))
    val pairs = banded.as("x").join(banded.as("y").hint("shuffle_hash"),
        col("x.b") === col("y.b") && col("x.k") === col("y.k") &&
          col("x.rep") < col("y.rep"))
      .select(col("x.rep").as("ra"), col("y.rep").as("rb"),
        col("x.bv").as("av"), col("y.bv").as("yv"))
      .withColumn("hamming", (0 until 4)
        .map(b => expr(s"bit_count(av[$b] ^ yv[$b])")).reduce(_ + _).cast("int"))
      .where(col("hamming") <= 3)
      .select(col("ra"), col("rb"), col("hamming"))
      .distinct()
      // Persisted (r20): the verified pair set is bounded by the query's
      // own pair-output domain (the r17b broadcast rule's bound), and two
      // consumers otherwise re-run the banded self-join's map stages per
      // run — q85's CC symmetrize reads it once-per-run after sym's
      // unpersist, and q105's pair broadcast rebuilds per run (broadcast
      // exchanges are never cache entries). Lazy: the first consumer
      // fills it, so single-consumer callers (q55/q56 ride their own
      // fork-point cache above this) pay one memory write, no extra job.
      .persistTracked()
    (pairs, ids, bands.select(col("rep")))
  }

  /** SimHash near-dup PAIRS over the portable md5 bands: block on band
    * equality (pigeonhole-sound for hamming ≤ 3 with 4 bands), verify with
    * the exact 64-bit hamming — reconstructed as the sum of per-band
    * bit_count(xor), since the 4 bands partition the 64 bits. Banded
    * blocking, never all-pairs; fully DuckDB-expressible.
    *
    * r19: rides the content-dedup layer ([[simhashRepPairs]]). Cross-
    * content pairs inherit the content pair's verified hamming verbatim
    * (bands are content functions); same-content pairs are hamming = 0
    * exactly, restricted to contents that HAVE bands (<1-token texts
    * produced no band row in the per-doc spelling either) — both exactly
    * what the per-doc banded self-join emitted, row by row. The oracle
    * SQL is untouched.
    */
  def qSimhashNearDupPairs(s: SparkSession, dir: String): DataFrame = {
    val (pairs, ids, sigReps) = simhashRepPairs(s, dir)
    expandRepPairs(pairs, ids, Seq("hamming"))
      .unionByName(sameContentPairs(ids, sigReps)
        .withColumn("hamming", lit(0).cast("int")))
  }

  val qSimhashNearDupPairsSql: String = {
    val ham = (0 until 4).map(b => s"bit_count(xor(av.band$b, bv.band$b))").mkString(" + ")
    s"""WITH b AS (
       |${qSimhashBandsSql.linesIterator.map("  " + _).mkString("\n")}
       |),
       |banded AS (
       |  SELECT doc_id, i AS bi,
       |    CASE i WHEN 0 THEN band0 WHEN 1 THEN band1
       |           WHEN 2 THEN band2 ELSE band3 END AS k
       |  FROM b CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i)),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM banded x JOIN banded y
       |    ON x.bi = y.bi AND x.k = y.k AND x.doc_id < y.doc_id)
       |SELECT doc_a, doc_b, CAST($ham AS INTEGER) AS hamming
       |FROM cand
       |JOIN b av ON av.doc_id = doc_a
       |JOIN b bv ON bv.doc_id = doc_b
       |WHERE $ham <= 3""".stripMargin
  }

  /** MinHash LSH candidate PAIRS over the portable md5 bands: docs agreeing
    * on ≥1 of the 8 band keys, with the agreeing-band count (an estimate of
    * signature similarity). Bucket-equality join only — never all-pairs.
    */
  /** Shared rep-level core of q56/q150 (r18 content layer): the banded
    * self-join and the band-agreement pair aggregate run on the
    * distinct-content universe. Returns (pairs, ids, sigReps):
    * pairs = (ra, rb, n_bands, mult) where ra/rb are representative
    * doc_ids, n_bands the band-agreement count (a content-pair function),
    * and mult = |ids_a|·|ids_b| the number of doc pairs each content pair
    * expands to — mult rides the pair aggregate itself (the copy count
    * attaches to the banded frame BELOW the join), so weighted consumers
    * (q150) never join anything above the pair aggregate. sigReps = the
    * reps that HAVE a signature, for the same-content branch.
    */
  private def minhashRepPairs(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val (ids, reps) = contentLayer(t(s, dir, "documents"))
    // persisted: both self-join sides read it — without it the 32-MIN
    // signature aggregation over all distinct-text shingles runs twice
    val bands = minhashBandsOf(reps).withColumnRenamed("doc_id", "rep")
      .join(ids.select(col("rep"), size(col("ids")).cast("long").as("n")), Seq("rep"))
      .persistTracked()
    bands.count() // eager fill — see minhashCandidates
    val banded = bands.select(col("rep"), col("n"),
      explode(array((0 until MinhashBands).map(b =>
        struct(lit(b).as("b"), col(s"band$b").as("k"))): _*)).as("bk"))
      .select(col("rep"), col("n"), col("bk.b"), col("bk.k"))
    val pairs = banded.as("x").join(banded.as("y").hint("shuffle_hash"),
        col("x.b") === col("y.b") && col("x.k") === col("y.k") &&
          col("x.rep") < col("y.rep"))
      .groupBy(col("x.rep").as("ra"), col("y.rep").as("rb"))
      .agg(count(lit(1)).as("n_bands"), max(col("x.n") * col("y.n")).as("mult"))
      // Persisted (r20, the simhashRepPairs rule): bounded by the query's
      // own pair-output domain. q150 consumes the pair aggregate directly
      // (no fork-point cache above it), so without this every steady-state
      // run re-ran the banded self-join's BOTH map sides (R20Prof: twin
      // 8.0 s + 4.2 s runMs stages per run). Lazy — q56 rides its
      // expandRepPairs fork cache and just pays one memory write.
      .persistTracked()
    (pairs, ids, bands.select(col("rep")))
  }

  def qMinhashCandidatePairs(s: SparkSession, dir: String): DataFrame = {
    val (pairs, ids, sigReps) = minhashRepPairs(s, dir)
    // cross-content pairs inherit the content pair's n_bands verbatim
    // (band keys are content functions); same-content pairs agree on all
    // 8 bands by construction — both exactly what the per-doc banded
    // self-join produced, row by row.
    expandRepPairs(pairs, ids, Seq("n_bands"))
      .unionByName(sameContentPairs(ids, sigReps)
        .withColumn("n_bands", lit(MinhashBands.toLong)))
  }

  val qMinhashCandidatePairsSql: String = {
    val caseK = (0 until MinhashBands)
      .map(b => s"WHEN $b THEN band$b").mkString(" ")
    s"""WITH b AS (
       |${qMinhashBandsSql.linesIterator.map("  " + _).mkString("\n")}
       |),
       |banded AS (
       |  SELECT doc_id, i AS bi, CASE i $caseK END AS k
       |  FROM b CROSS JOIN (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS i))
       |SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS n_bands
       |FROM banded x JOIN banded y
       |  ON x.bi = y.bi AND x.k = y.k AND x.doc_id < y.doc_id
       |GROUP BY 1, 2""".stripMargin
  }

  /** Connected components over an undirected edge list by iterated
    * min-label propagation: every node starts as its own label; each round
    * takes the min of its own and its neighbors' labels; fixpoint = each
    * node carries the min node id of its component (a unique, deterministic
    * labeling). Rounds are bounded by the component diameter — near-dup
    * graphs are unions of tight cliques-ish clusters, so a handful. Each
    * round is one shuffle (join + min-agg); localCheckpoint cuts the
    * otherwise-exponential lineage, and the convergence check is an exact
    * changed-count, not a guess. For adversarial long-path graphs at 100 TB
    * the same loop carries with large-star/small-star rewiring
    * (Kiveris et al., SoCC'14) — unnecessary for dedup clusters.
    *
    * Small-graph fast path: after banded pair mining the near-dup edge
    * list is metadata-sized relative to the corpus (pairs ≪ docs —
    * 312 edges over 5 000 docs at sf0.1, and the banding keeps that
    * ratio at 100 TB), so when the measured symmetric edge count is
    * within `driverBudget` the labeling short-circuits to an exact
    * driver union-find over the already-persisted edge list — the same
    * budget-bounded-collect convention as the q18/q177 histogram
    * selection. Union-by-min-root makes every set's root its minimum
    * member, so the labeling is bit-identical to the propagation
    * fixpoint. Graphs above the budget (or with non-integral node ids)
    * run the distributed loop unchanged — the switch is by measured
    * size, exactly the call AQE would make.
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxIters: Int = 20, driverBudget: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    // Symmetrize with ONE row-local explode, not a two-branch union (r20):
    // a union's branches are separate consumers of the edge frame, so an
    // uncached (often expensive — q85 hands the banded pair miner straight
    // in) edge pipeline executed TWICE per run; the exploded array emits
    // the same (a,b)/(b,a) multiset from a single pass. Measured on q85:
    // the four banded-self-join map stages in the timed run became two.
    val sym = edges.select(explode(array(
        struct(col("a").as("a"), col("b").as("b")),
        struct(col("b").as("a"), col("a").as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .distinct().persistTracked()
    // one count: materializes the (often expensive) pair miner into the
    // cache exactly once AND prices the graph for the plan choice
    val nEdges = sym.count()
    val dt = sym.schema("a").dataType
    val integral =
      dt == LongType || dt == IntegerType || dt == ShortType || dt == ByteType
    if (integral && nEdges <= driverBudget) {
      val spark = nodes.sparkSession
      import spark.implicits._
      // collect the canonical half only — sym carries both directions for
      // the distributed loop, but union-find needs each edge once
      val pairs = sym.where(col("a") < col("b"))
        .select(col("a").cast("long"), col("b").cast("long"))
        .as[(Long, Long)].collect()
      sym.unpersist()
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x // path compression
        while (c != r) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      pairs.foreach { case (a, b) =>
        if (!parent.contains(a)) parent(a) = a
        if (!parent.contains(b)) parent(b) = b
        val ra = find(a); val rb = find(b)
        if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
      }
      val labels = parent.keys.toSeq.map(k => (k, find(k)))
      val labelDf = labels.toDF("node", "label")
        .select(col("node").cast(dt).as("node"), col("label").cast(dt).as("label"))
      return nodes.select(col("node"))
        .join(broadcast(labelDf), Seq("node"), "left")
        .select(col("node"), coalesce(col("label"), col("node")).as("label"))
    }
    // Iterate ONLY over nodes that touch an edge (sym is symmetric, so the
    // a-side covers them all): isolated nodes can never change label, and
    // in a dedup graph they are the overwhelming majority — at 100 TB the
    // per-round joins run on the near-dup subgraph, not the corpus. The
    // full node set rejoins once at the end as label = own id.
    var labels = sym.select(col("a").as("node")).distinct()
      .select(col("node"), col("node").as("label")).localCheckpoint()
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIters) {
      val nbrMin = sym.join(labels, col("b") === col("node"))
        .groupBy(col("a")).agg(min(col("label")).as("nbr_label"))
      // prev rides along in the same projection, so the convergence check
      // is a filter-count on the checkpointed frame — no extra join; the
      // checkpoint is lazy so that count is the round's ONLY job
      val next = labels.join(nbrMin, col("node") === col("a"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"),
          col("label").as("prev"))
        .localCheckpoint(false)
      changed = next.where(col("label") =!= col("prev")).count()
      labels = next.select(col("node"), col("label"))
      i += 1
    }
    sym.unpersist()
    nodes.select(col("node"))
      .join(labels, Seq("node"), "left")
      .select(col("node"), coalesce(col("label"), col("node")).as("label"))
  }

  /** Connected components by alternating LARGE-STAR / SMALL-STAR rewiring
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14): converges in O(log n) rounds on ANY graph shape, where
    * [[connectedComponents]]' min-label propagation needs diameter rounds.
    * Same signature, same unique min-id labeling — the drop-in variant for
    * adversarial topologies (long chains, deep trees); for near-dup
    * graphs (tight low-diameter clusters) plain propagation does fewer,
    * cheaper shuffles per round and stays the q85 default.
    *
    *  - large-star, per node u over its full neighborhood: attach every
    *    STRICTLY LARGER neighbor to m = min(Γ(u) ∪ {u});
    *  - small-star, per node u over its smaller-or-equal neighbors:
    *    attach them and u itself to m.
    *
    * Both steps are one groupBy-min + one join each — no neighborhood
    * materialized as an array anywhere, so a 10⁹-degree hub never builds a
    * driver- or row-sized list (the skew lands in a hash aggregate, which
    * partial-aggregates map-side). Fixpoint = the edge set is a union of
    * stars centered at component minima, detected by an order-independent
    * (count, xor-of-hashes) signature instead of a second join. Throws if
    * maxIters rounds don't converge — a silent wrong labeling is worse
    * than a loud bound.
    */
  def connectedComponentsStar(nodes: DataFrame, edges: DataFrame,
      maxIters: Int = 25): DataFrame = {
    def canon(e: DataFrame) = e.where(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      .distinct()
    def signature(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), coalesce(
        expr("bit_xor(xxhash64(u, v))"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    var e = canon(edges).localCheckpoint()
    var sig = signature(e)
    var done = e.isEmpty
    var i = 0
    while (!done && i < maxIters) {
      // large-star over the SYMMETRIC neighborhood of u
      val nbrs = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val minsL = nbrs.groupBy(col("u"))
        .agg(least(min(col("v")), col("u")).as("m"))
      val afterLarge = canon(
        nbrs.join(minsL, Seq("u")).where(col("v") > col("u"))
          .select(col("v").as("a"), col("m").as("b")))
        .localCheckpoint(false)
      // small-star over the canonical (u > v) orientation: all v ≤ u
      val minsS = afterLarge.groupBy(col("u")).agg(min(col("v")).as("m"))
      val smallEdges = afterLarge.join(minsS, Seq("u"))
      val afterSmall = canon(
        smallEdges.select(col("v").as("a"), col("m").as("b"))
          .union(smallEdges.select(col("u").as("a"), col("m").as("b"))))
        .localCheckpoint(false)
      val nextSig = signature(afterSmall)
      done = nextSig == sig
      e = afterSmall
      sig = nextSig
      i += 1
    }
    if (!done)
      throw new IllegalStateException(
        s"connectedComponentsStar: no fixpoint after $maxIters rounds")
    // fixpoint: every edge is (node, component-min); centers never appear
    // on the u side (nothing is smaller than the min), so they self-label
    val lab = e.groupBy(col("u")).agg(min(col("v")).as("label"))
      .select(col("u").as("node"), col("label"))
    nodes.select(col("node"))
      .join(lab, Seq("node"), "left")
      .select(col("node"), coalesce(col("label"), col("node")).as("label"))
  }

  /** Near-dup CLUSTERS: the step after pair mining a dedup pipeline
    * actually needs — transitively close the q55 simhash near-dup pairs so
    * each document maps to a canonical cluster id (the min doc_id of its
    * component; singletons are their own cluster). Downstream "keep one
    * per cluster" is then a trivial filter on doc_id = cluster_id.
    */
  def qDupClusters(s: SparkSession, dir: String): DataFrame = {
    // r19 (content layer, the q55 follow-through): connectivity is a
    // CONTENT property — same-content docs are a hamming-0 clique, and
    // cross-content edges depend only on the two contents — so the
    // component structure over docs is the component structure over
    // distinct contents, expanded. CC runs on the rep graph (content
    // pairs, the 10×-level edge count at ANY duplication factor; at 100×
    // dup the per-doc spelling label-propagated 27.9M doc edges for
    // 86.8 s warm where the rep graph fits the driver union-find budget),
    // and each doc inherits its content's component label. The label
    // algebra survives expansion exactly: every content's min doc_id IS
    // its rep, so min-rep-in-component = min-doc-in-component, the same
    // unique labeling the per-doc fixpoint produces. Contents WITHOUT a
    // signature (<1 token — never banded, never candidates) stay
    // per-doc singletons, exactly as the per-doc spelling left them.
    val (pairs, ids, sigReps) = simhashRepPairs(s, dir)
    val repLabels = connectedComponents(
      ids.select(col("rep").as("node")),
      pairs.select(col("ra").as("a"), col("rb").as("b")))
    val withSig = ids.join(sigReps, Seq("rep"), "left_semi")
      .select(col("rep").as("node"), explode(col("ids")).as("doc_id"))
      .join(repLabels, Seq("node"))
      .select(col("doc_id"), col("label"))
    val noSig = ids.join(sigReps, Seq("rep"), "left_anti")
      .select(explode(col("ids")).as("doc_id"))
      .select(col("doc_id"), col("doc_id").as("label"))
    withSig.unionByName(noSig)
      .select(col("doc_id"), col("label").as("cluster_id"),
        (col("doc_id") === col("label")).as("is_canonical"))
  }

  /** The fixpoint labeling is unique, so the oracle recomputes it exactly:
    * transitive closure by recursive CTE over the same q55 pair SQL, then
    * min reachable node per doc.
    */
  val qDupClustersSql: String = {
    val pairsSql = qSimhashNearDupPairsSql.linesIterator.map("  " + _).mkString("\n")
    s"""WITH RECURSIVE pairs AS (
       |$pairsSql
       |),
       |edges AS (
       |  SELECT doc_a AS a, doc_b AS b FROM pairs
       |  UNION
       |  SELECT doc_b, doc_a FROM pairs),
       |reach(node, label) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.b, r.label FROM reach r JOIN edges e ON e.a = r.node)
       |SELECT node AS doc_id, MIN(label) AS cluster_id,
       |  (node = MIN(label)) AS is_canonical
       |FROM reach GROUP BY node""".stripMargin
  }

  /** DuckDB re-derivation of [[qLangId]]'s naive Bayes: same tokenization,
    * even/odd train-test split, add-one smoothing, per-(doc,lang) log-sum,
    * argmax with (score, lang) tiebreak. The log-prob sums are double
    * accumulations (order differs between engines by ulps), but the OUTPUT
    * is integer accuracy counts — stable unless two languages near-tie
    * within float noise, which add-one-smoothed scores don't.
    */
  val qLangIdSql: String =
    """WITH tok AS (
      |  SELECT doc_id, lang, token FROM (
      |    SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
      |    FROM documents)
      |  WHERE token <> ''),
      |train AS (SELECT * FROM tok WHERE doc_id % 2 = 0),
      |test AS (SELECT * FROM tok WHERE doc_id % 2 = 1),
      |lang_totals AS (SELECT lang, COUNT(*) AS lang_n FROM train GROUP BY lang),
      |vocab AS (SELECT COUNT(DISTINCT token) AS v FROM train),
      |profile AS (
      |  SELECT t.lang, t.token,
      |    ln((COUNT(*) + 1)::DOUBLE / (ANY_VALUE(lt.lang_n) + ANY_VALUE(vocab.v))) AS logp
      |  FROM train t JOIN lang_totals lt ON lt.lang = t.lang CROSS JOIN vocab
      |  GROUP BY t.lang, t.token),
      |defaults AS (
      |  SELECT lang, ln(CAST(1.0 AS DOUBLE) / (lang_n + v)) AS logp0
      |  FROM lang_totals CROSS JOIN vocab),
      |langs AS (SELECT unnest(['de', 'en', 'es', 'fr', 'zh']) AS cand),
      |scores AS (
      |  SELECT te.doc_id, te.lang AS true_lang, l.cand,
      |    COALESCE(p.logp, d.logp0) AS s
      |  FROM test te
      |  CROSS JOIN langs l
      |  LEFT JOIN profile p ON p.token = te.token AND p.lang = l.cand
      |  JOIN defaults d ON d.lang = l.cand),
      |doc_scores AS (
      |  SELECT doc_id, true_lang, cand, SUM(s) AS sc
      |  FROM scores GROUP BY doc_id, true_lang, cand),
      |pred AS (
      |  SELECT doc_id, true_lang, cand AS pred_lang
      |  FROM (SELECT *, row_number() OVER (
      |          PARTITION BY doc_id ORDER BY sc DESC, cand DESC) AS rn
      |        FROM doc_scores)
      |  WHERE rn = 1)
      |SELECT true_lang, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN pred_lang = true_lang THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
      |FROM pred GROUP BY true_lang""".stripMargin

  /** TF-IDF top terms per document (first 10 docs): tf = per-(doc,token)
    * count, idf = ln(N/df), ranked per doc by tfidf with a token tiebreak.
    * The OUTPUT is (doc_id, rank, token) — integers and strings only, so
    * engine float-ulp noise in ln can never flip a cell (ties in tfidf are
    * exact-equal (tf, df) pairs and resolve on the token). Two shuffles:
    * (doc, token) tf and token df; the per-doc window is bounded by doc
    * vocabulary.
    */
  def qTfidfTopTerms(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val n = docs.select(count(lit(1)).as("n_docs"))
    val tok = docs.select(col("doc_id"), explode(toks(col("text"))).as("token"))
      .where(col("token") =!= "")
    val tf = tok.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    // df = #docs containing the token. Deduplicating per-doc ROW-LOCALLY
    // (array_distinct before the explode) means the corpus-wide branch
    // shuffles once on (token) with map-side combine, instead of the
    // (doc_id, token) exchange + re-aggregation that a distinct-then-count
    // spelling costs — at 100 TB that's the difference between one and two
    // full-corpus shuffles (the tf branch above is filter-pruned to the
    // target docs by pushdown, so it never sees the full corpus).
    val df = docs.select(explode(array_distinct(toks(col("text")))).as("token"))
      .where(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("token").asc)
    tf.join(df, Seq("token")).crossJoin(broadcast(n))
      .where(col("doc_id") < 10)
      .withColumn("tfidf",
        col("tf") * log(col("n_docs").cast("double") / col("df")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select(col("doc_id"), col("rank"), col("token"))
  }

  val qTfidfTopTermsSql: String =
    """WITH tok AS (
      |  SELECT doc_id, token FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS token
      |    FROM documents)
      |  WHERE token <> ''),
      |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
      |df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT COUNT(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.token,
      |    tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) AS tfidf
      |  FROM tf JOIN df USING (token) CROSS JOIN n
      |  WHERE tf.doc_id < 10)
      |SELECT doc_id, CAST(rank AS INTEGER) AS rank, token FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY doc_id ORDER BY tfidf DESC, token ASC) AS rank
      |  FROM scored)
      |WHERE rank <= 5""".stripMargin

  /** Deterministic hash sampling — the 100 TB curation shape: membership is
    * a pure function of the key (first md5 hex digit < 2 ⇒ a reproducible
    * 1/8 sample), so the sample is stable across runs, engines, and
    * cluster layouts, with zero coordination — unlike rand()-based
    * sampling, which is neither reproducible nor oracle-checkable.
    */
  def qHashSample(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    docs
      .withColumn("in_sample",
        hexDigit(md5(col("doc_id").cast("string").cast("binary")), 1) < 2)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("in_sample"), 1L).otherwise(0L)).as("n_sampled"))
  }

  val qHashSampleSql: String =
    s"""SELECT lang, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN ${hexDigitSql("md5(CAST(doc_id AS VARCHAR))", 1)} < 2
       |       THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
       |FROM documents GROUP BY lang""".stripMargin

  /** Stratified deterministic sampling — the language-rebalancing move a
    * training-data pipeline applies to a skewed corpus: downsample the
    * dominant language (en → 25%) while keeping the tail (→ 75%).
    * Membership is a pure function of (doc_id, stratum rate) via two md5
    * hex digits (1/256 granularity), so the sample is reproducible,
    * coordination-free, and identical on any cluster size — no RNG state,
    * no driver involvement, no reshuffle (the decision is row-local).
    */
  def qStratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val h = md5(col("doc_id").cast("string").cast("binary"))
    val bucket = hexDigit(h, 1) * 16 + hexDigit(h, 2) // 0..255
    val threshold = when(col("lang") === "en", 64).otherwise(192) // 25% / 75%
    t(s, dir, "documents")
      .withColumn("in_sample", bucket < threshold)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("in_sample"), 1L).otherwise(0L)).as("n_sampled"))
  }

  val qStratifiedSampleSql: String = {
    val h = "md5(CAST(doc_id AS VARCHAR))"
    val bucket = s"(${hexDigitSql(h, 1)} * 16 + ${hexDigitSql(h, 2)})"
    s"""SELECT lang, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN $bucket < (CASE WHEN lang = 'en' THEN 64 ELSE 192 END)
       |       THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
       |FROM documents GROUP BY lang""".stripMargin
  }

  /** approx_count_distinct (HLL sketch) vs exact, side by side — the sketch
    * is what survives 100 TB; the exact column is the local ground truth.
    *
    * Oracle closure (r14): the raw HLL estimate is engine-specific (no
    * DuckDB spelling can reproduce Spark's sketch bit-for-bit), so the
    * estimate is published through an in-plan TOLERANCE CERTIFICATE
    * instead: `*_ok` is true iff the estimate sits within ±10% of the
    * exact count (the SimilaritySpec-pinned bound for the default 5%
    * rsd sketch), and RAISES with both numbers if it doesn't. The
    * DuckDB oracle independently recomputes the exact counts and
    * expects literal TRUE for the certificates — so the driver's
    * hash-match now verifies the exact side AND enforces the sketch
    * bound, closing the r13 `no_oracle` row without pretending the
    * sketch internals are portable.
    */
  def qApproxDistinct(s: SparkSession, dir: String): DataFrame = {
    val tol = 0.10
    def ok(approx: Column, exact: Column, label: String) =
      when(abs(approx.cast("double") - exact.cast("double"))
          <= lit(tol) * exact.cast("double"), lit(true))
        .otherwise(raise_error(concat(
          lit(s"q50 HLL tolerance violated ($label): approx "),
          approx.cast("string"), lit(" vs exact "), exact.cast("string"),
          lit(s" (bound ±${(tol * 100).toInt}%)"))))
    val l = t(s, dir, "lineitem")
    val d = t(s, dir, "documents")
    l.agg(
      approx_count_distinct(col("l_partkey")).as("ap"),
      countDistinct(col("l_partkey")).as("exact_parts"))
      .crossJoin(d.agg(
        approx_count_distinct(col("text")).as("at"),
        countDistinct(col("text")).as("exact_texts")))
      .select(col("exact_parts"), col("exact_texts"),
        ok(col("ap"), col("exact_parts"), "l_partkey").as("approx_parts_ok"),
        ok(col("at"), col("exact_texts"), "text").as("approx_texts_ok"))
  }

  val qApproxDistinctSql: String =
    """SELECT p.exact_parts, t.exact_texts,
      |  TRUE AS approx_parts_ok, TRUE AS approx_texts_ok
      |FROM (SELECT COUNT(DISTINCT l_partkey) AS exact_parts FROM lineitem) p
      |CROSS JOIN (SELECT COUNT(DISTINCT text) AS exact_texts FROM documents) t""".stripMargin

  /** Gopher-style per-document repetition signals: duplicate-token fraction
    * (1 − distinct/total, row-local) and the most frequent word-bigram with
    * its token share. `top_bigram_frac` = 2·cnt/n_tokens is the
    * overlap-INCLUSIVE ratio, not a covered-token fraction: occurrences of a
    * self-overlapping bigram ("a a" in "a a a a") count their shared token
    * twice, so the value can exceed 1.0 — by design, since a >1 reading is
    * itself a maximal-repetition signal and the monotone threshold filters
    * built on it (Gopher Table A1) are unaffected by the normalization.
    * The bigram mode is computed ROW-LOCALLY (round 6 rewrite): sort the
    * doc's bigram array, then one fold finds the longest equal-run —
    * O(L log L) per document, ZERO shuffles in the whole query, where the
    * previous spelling paid an explode → (doc, bigram) hash-count → per-doc
    * window → join chain (three exchanges). The fold closes each run as the
    * scan leaves it and replaces the best on `run >= best`, which — under
    * an ascending scan — reproduces the (cnt DESC, bigram DESC) tiebreak
    * exactly. Filters like "drop docs whose top bigram covers > 18% of
    * tokens" (Gopher Table A1) are a WHERE over this output.
    */
  def qRepetitionStats(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    // r12: bigram array via the fused zero-copy expression (n=2); the
    // sort + longest-equal-run fold over it is unchanged
    val topBigram = expr(
      """aggregate(
        |  array_sort(word_shingles(text, 2, false)),
        |  named_struct('prev', '', 'run', CAST(0 AS BIGINT),
        |               'best', CAST(0 AS BIGINT), 'bestkey', ''),
        |  (a, x) -> CASE WHEN x = a.prev
        |    THEN named_struct('prev', x, 'run', a.run + CAST(1 AS BIGINT),
        |                      'best', a.best, 'bestkey', a.bestkey)
        |    ELSE named_struct('prev', x, 'run', CAST(1 AS BIGINT),
        |      'best', CASE WHEN a.run >= a.best THEN a.run ELSE a.best END,
        |      'bestkey', CASE WHEN a.run >= a.best THEN a.prev ELSE a.bestkey END)
        |    END,
        |  a -> named_struct(
        |    'cnt', CASE WHEN a.run >= a.best THEN a.run ELSE a.best END,
        |    'bigram', CASE WHEN a.run >= a.best THEN a.prev ELSE a.bestkey END))"""
        .stripMargin)
    t(s, dir, "documents")
      .withColumn("toks", toks(col("text")))
      .where(size(col("toks")) >= 2)
      .withColumn("tb", topBigram)
      .select(col("doc_id"),
        size(col("toks")).as("n_tokens"),
        (lit(1.0) - size(array_distinct(col("toks"))).cast("double") / size(col("toks")))
          .as("dup_token_frac"),
        col("tb.bigram").as("top_bigram"), col("tb.cnt").as("top_bigram_cnt"),
        (col("tb.cnt") * 2.0 / size(col("toks"))).as("top_bigram_frac"))
  }

  val qRepetitionStatsSql: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |           WHERE len(string_split(text, ' ')) >= 2),
      |base AS (
      |  SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_tokens,
      |    1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS dup_token_frac
      |  FROM d),
      |bg AS (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
      |    i -> array_to_string(toks[i:i+1], ' '))) AS bigram
      |  FROM d),
      |cnts AS (
      |  SELECT doc_id, bigram, COUNT(*) AS cnt FROM bg GROUP BY doc_id, bigram),
      |top AS (
      |  SELECT doc_id, bigram AS top_bigram, CAST(cnt AS BIGINT) AS top_bigram_cnt
      |  FROM cnts
      |  QUALIFY row_number() OVER (PARTITION BY doc_id
      |    ORDER BY cnt DESC, bigram DESC) = 1)
      |SELECT base.doc_id, base.n_tokens, base.dup_token_frac,
      |  top.top_bigram, top.top_bigram_cnt,
      |  top.top_bigram_cnt * 2.0 / base.n_tokens AS top_bigram_frac
      |FROM base JOIN top ON top.doc_id = base.doc_id""".stripMargin

  /** Corpus-level boilerplate mining: the 3-gram shingles shared by the
    * most documents (headers/footers/navigation chrome in a web corpus
    * surface exactly here). Reuses the row-local-distinct shingle pipeline;
    * one (shingle) hash-aggregate, top-10 with full tiebreak. The document
    * frequency this emits is also the df a removal pass would broadcast.
    */
  def qBoilerplateNgrams(s: SparkSession, dir: String): DataFrame =
    shinglesDistinct(t(s, dir, "documents"))
      .groupBy(col("shingle"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("n_docs").desc, col("shingle").asc)
      .limit(10)

  val qBoilerplateNgramsSql: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |           WHERE len(string_split(text, ' ')) >= 3),
      |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
      |         generate_series(1, len(toks) - 2),
      |         i -> array_to_string(toks[i:i+2], ' ')))) AS shingle
      |       FROM d)
      |SELECT shingle, COUNT(*) AS n_docs FROM sh
      |GROUP BY shingle ORDER BY n_docs DESC, shingle ASC LIMIT 10""".stripMargin

  /** CCNet-style LM quality scoring: an add-one-smoothed unigram LM
    * trains on the even-doc_id half of the corpus and scores the odd half
    * by per-token cross-entropy — the perplexity-filter signal an LLM data
    * pipeline ranks and thresholds documents with. One (token) shuffle for
    * the LM counts, one token-key join to score (vocabulary is unbounded,
    * so the LM side is a plain shuffle join — AQE broadcasts it when it
    * measures small); the (N, V) normalizer is a broadcast 1-row frame.
    *
    * Float determinism: each token's −ln p rounds to DECIMAL(18,9)
    * (engine ln implementations agree far past 9 decimals), the per-doc
    * sum accumulates as decimal — partition-order free — and the reported
    * xent rounds to 2 decimals, so the oracle compares exactly.
    */
  def qUnigramXent(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val tok = t(s, dir, "documents")
      .select(col("doc_id"), explode(toks(col("text"))).as("token"))
      .where(col("token") =!= "")
    val train = tok.where(col("doc_id") % 2 === 0)
    val counts = train.groupBy(col("token")).agg(count(lit(1)).as("c"))
    val denom = train.agg(count(lit(1)).as("n_train"))
      .crossJoin(counts.agg(count(lit(1)).as("v")))
    tok.where(col("doc_id") % 2 === 1)
      .join(counts, Seq("token"), "left")
      .crossJoin(broadcast(denom))
      .withColumn("q",
        (-log((coalesce(col("c"), lit(0L)).cast("double") + lit(1.0)) /
          (col("n_train") + col("v")).cast("double")))
          .cast(DecimalType(18, 9)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("q")).cast("double") / count(lit(1)), 2).as("xent"))
  }

  val qUnigramXentSql: String =
    """WITH tok AS (
      |  SELECT doc_id, token FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS token
      |    FROM documents)
      |  WHERE token <> ''),
      |train AS (SELECT * FROM tok WHERE doc_id % 2 = 0),
      |counts AS (SELECT token, COUNT(*) AS c FROM train GROUP BY 1),
      |denom AS (SELECT (SELECT COUNT(*) FROM train) AS n_train,
      |                 (SELECT COUNT(*) FROM counts) AS v),
      |scored AS (
      |  SELECT tk.doc_id,
      |    CAST(-ln((CAST(COALESCE(c.c, 0) AS DOUBLE) + 1.0) /
      |             CAST(d.n_train + d.v AS DOUBLE)) AS DECIMAL(18,9)) AS q
      |  FROM tok tk
      |  LEFT JOIN counts c ON c.token = tk.token
      |  CROSS JOIN denom d
      |  WHERE tk.doc_id % 2 = 1)
      |SELECT doc_id, COUNT(*) AS n_tokens,
      |  ROUND(CAST(CAST(SUM(q) AS VARCHAR) AS DOUBLE) / COUNT(*), 2) AS xent
      |FROM scored GROUP BY doc_id""".stripMargin

  /** q119: bigram conditional cross-entropy per source — the LM-quality
    * screen one step up from q93's unigram model: score held-out (odd
    * doc_id) text under add-one-smoothed corpus bigram statistics
    * P(w2|w1) = (C(w1,w2)+1)/(C(w1·)+V) trained on even doc_ids.
    * Low-entropy sources are templated/repetitive; high-entropy ones are
    * noisy — both tails are what a mixture rebalancer downweights.
    *
    * Scale: bigrams form row-local (adjacent zip over the non-empty token
    * array — no self-join); the model tables shuffle on bigram / context
    * key with map-side combine; scoring joins are plain equi-joins AQE
    * can re-plan (the context table is |vocab|-sized — broadcastable for
    * real-world vocabularies, shuffled when not). Log terms accumulate as
    * DECIMAL(18,9) so the per-source mean is partition-order-free.
    */
  def qBigramXent(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // r12: fused bigram extraction (shared [[neBigrams]] spelling)
    // replaces two interpreted lambdas (filter + transform with
    // per-window struct allocation); each bigram splits back on its
    // single interior space with codegen'd substring_index. This frame
    // is deliberately NOT persisted: its four consumers re-scan, which
    // at 100 TB beats caching an exploded corpus-sized frame.
    val bg = t(s, dir, "documents")
      .select(col("doc_id"), col("source"), explode(neBigrams(s)).as("bg"))
      .select(col("doc_id"), col("source"),
        substring_index(col("bg"), " ", 1).as("w1"),
        substring_index(col("bg"), " ", -1).as("w2"))
    val train = bg.where(col("doc_id") % 2 === 0)
    val bgCounts = train.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val ctxCounts = train.groupBy(col("w1")).agg(count(lit(1)).as("cc"))
    val v = train.select(col("w2")).union(train.select(col("w1")))
      .distinct().agg(count(lit(1)).as("v"))
    bg.where(col("doc_id") % 2 === 1)
      .join(bgCounts, Seq("w1", "w2"), "left")
      .join(ctxCounts, Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .withColumn("q",
        (-log((coalesce(col("cb"), lit(0L)).cast("double") + lit(1.0)) /
          (coalesce(col("cc"), lit(0L)) + col("v")).cast("double")))
          .cast(DecimalType(18, 9)))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("q")).cast("double") / count(lit(1)), 2).as("xent"))
  }

  val qBigramXentSql: String =
    """WITH ne AS (
      |  SELECT doc_id, source,
      |    list_filter(string_split(text, ' '), t -> t <> '') AS ne
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, source, b[1] AS w1, b[2] AS w2 FROM (
      |    SELECT doc_id, source,
      |      unnest(list_transform(generate_series(1, len(ne) - 1),
      |        i -> [ne[i], ne[i + 1]])) AS b
      |    FROM ne WHERE len(ne) >= 2)),
      |train AS (SELECT * FROM bg WHERE doc_id % 2 = 0),
      |bgc AS (SELECT w1, w2, COUNT(*) AS cb FROM train GROUP BY 1, 2),
      |ctx AS (SELECT w1, COUNT(*) AS cc FROM train GROUP BY 1),
      |vv AS (SELECT COUNT(*) AS v FROM (
      |  SELECT DISTINCT w2 AS w FROM train
      |  UNION SELECT DISTINCT w1 AS w FROM train)),
      |scored AS (
      |  SELECT t.source,
      |    CAST(-ln((CAST(COALESCE(b.cb, 0) AS DOUBLE) + 1.0) /
      |             CAST(COALESCE(c.cc, 0) + vv.v AS DOUBLE)) AS DECIMAL(18,9)) AS q
      |  FROM bg t
      |  LEFT JOIN bgc b ON b.w1 = t.w1 AND b.w2 = t.w2
      |  LEFT JOIN ctx c ON c.w1 = t.w1
      |  CROSS JOIN vv
      |  WHERE t.doc_id % 2 = 1)
      |SELECT source, COUNT(*) AS n_bigrams,
      |  ROUND(CAST(CAST(SUM(q) AS VARCHAR) AS DOUBLE) / COUNT(*), 2) AS xent
      |FROM scored GROUP BY source""".stripMargin

  /** Benchmark decontamination scan: flag training documents sharing
    * 3-gram shingles with a held-out benchmark set (docs 0–4 stand in for
    * an eval suite) — the contamination check every serious pretraining
    * pipeline runs before training. The benchmark shingle set is BOUNDED
    * (eval suites are tiny next to a corpus), so it broadcasts; the
    * corpus side streams through the semi-join-shaped left join with one
    * (doc_id) aggregate — no corpus-side shuffle on shingle at all.
    */
  def qDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val bench = shinglesDistinct(docs.where(col("doc_id") < 5))
      .select(col("shingle")).distinct()
      .withColumn("hit", lit(1))
    shinglesDistinct(docs.where(col("doc_id") >= 5))
      .join(broadcast(bench), Seq("shingle"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0))).cast("bigint").as("n_contaminated"))
      .where(col("n_contaminated") > 0)
      .withColumn("contamination",
        round(col("n_contaminated").cast("double") / col("n_shingles"), 4))
  }

  val qDecontaminateSql: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |           WHERE len(string_split(text, ' ')) >= 3),
      |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
      |         generate_series(1, len(toks) - 2),
      |         i -> array_to_string(toks[i:i+2], ' ')))) AS shingle
      |       FROM d),
      |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 5),
      |agg AS (
      |  SELECT c.doc_id, COUNT(*) AS n_shingles,
      |    CAST(SUM(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_contaminated
      |  FROM (SELECT * FROM sh WHERE doc_id >= 5) c
      |  LEFT JOIN bench b ON b.shingle = c.shingle
      |  GROUP BY c.doc_id)
      |SELECT doc_id, n_shingles, n_contaminated,
      |  ROUND(CAST(n_contaminated AS DOUBLE) / n_shingles, 4) AS contamination
      |FROM agg WHERE n_contaminated > 0""".stripMargin

  /** Stopword scrub (text normalization): drop stopword tokens, re-join,
    * and fingerprint the scrubbed text — the cleaning step that precedes
    * dedup/tokenization in a C4-style pipeline. Entirely row-local
    * higher-order array math: no shuffle, embarrassingly parallel at any
    * corpus size; the md5 fingerprint makes the rewrite byte-auditable.
    */
  def qStopwordScrub(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("toks", toks(col("text")))
      .withColumn("kept", expr("filter(toks, x -> x NOT IN ('the', 'a'))"))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_tokens"),
        (size(col("toks")) - size(col("kept"))).as("n_removed"),
        md5(concat_ws(" ", col("kept")).cast("binary")).as("scrub_hash"),
        (size(col("kept")).cast("double") / size(col("toks"))).as("kept_frac"))

  val qStopwordScrubSql: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |k AS (SELECT doc_id, toks,
      |        list_filter(toks, x -> x NOT IN ('the', 'a')) AS kept FROM d)
      |SELECT doc_id,
      |  CAST(len(toks) AS INTEGER) AS n_tokens,
      |  CAST(len(toks) - len(kept) AS INTEGER) AS n_removed,
      |  md5(array_to_string(kept, ' ')) AS scrub_hash,
      |  CAST(len(kept) AS DOUBLE) / len(toks) AS kept_frac
      |FROM k""".stripMargin

  /** Data-mixture reweighting: per-source token shares and the sampling
    * weight that flattens the mixture to uniform-over-sources (the DoReMi /
    * Pile-style domain-balancing primitive). One hash aggregate over
    * `source` (bounded domain) + a broadcast 1-row totals frame — no
    * data-sized shuffle beyond the map-side-combined group-by.
    */
  def qMixtureWeights(s: SparkSession, dir: String): DataFrame = {
    val bySrc = t(s, dir, "documents")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(toks(col("text")))).as("n_tokens"))
    val tot = bySrc.agg(sum(col("n_tokens")).as("total_tokens"),
      count(lit(1)).as("n_sources"))
    bySrc.crossJoin(broadcast(tot))
      .select(
        col("source"), col("n_docs"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("total_tokens").cast("double"))
          .as("token_share"),
        round((col("total_tokens").cast("double") / col("n_sources").cast("double"))
          / col("n_tokens").cast("double"), 6).as("uniform_weight"))
  }

  val qMixtureWeightsSql: String =
    """WITH s AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY source),
      |t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
      |        COUNT(*) AS n_sources FROM s)
      |SELECT source, n_docs, n_tokens,
      |  CAST(n_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE) AS token_share,
      |  ROUND((CAST(total_tokens AS DOUBLE) / CAST(n_sources AS DOUBLE))
      |    / CAST(n_tokens AS DOUBLE), 6) AS uniform_weight
      |FROM s, t""".stripMargin

  /** Greedy sequence packing: documents concatenate in doc_id order into a
    * token stream chunked at 128-token context windows; a doc belongs to
    * the pack holding its first token. The running token offset is a
    * window cum-sum PARTITIONED BY source — each shard packs independently
    * and in parallel, which is how packing actually runs at corpus scale
    * (a global single stream would serialize the window).
    */
  def qSequencePack(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    t(s, dir, "documents")
      .select(col("source"), col("doc_id"), size(toks(col("text"))).as("n_toks"))
      .withColumn("cum", sum(col("n_toks")).over(w))
      .withColumn("pack_id",
        floor((col("cum") - col("n_toks")).cast("double") / 128.0).cast("bigint"))
      .groupBy(col("source"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("pack_tokens"),
        min(col("doc_id")).as("first_doc"))
  }

  val qSequencePackSql: String =
    """WITH d AS (
      |  SELECT source, doc_id,
      |    CAST(len(string_split(text, ' ')) AS INTEGER) AS n_toks
      |  FROM documents),
      |c AS (
      |  SELECT source, doc_id, n_toks,
      |    SUM(n_toks) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM d)
      |SELECT source,
      |  CAST(FLOOR(CAST(cum - n_toks AS DOUBLE) / 128.0) AS BIGINT) AS pack_id,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(n_toks) AS BIGINT) AS pack_tokens,
      |  MIN(doc_id) AS first_doc
      |FROM c GROUP BY 1, 2""".stripMargin

  /** Vocabulary Zipf fit: least-squares slope/intercept of ln(freq) over
    * ln(rank) for the top-1000 terms — the corpus-health signal that flags
    * template-generated or deduplication-damaged corpora (natural text ≈
    * slope −1). The top-1000 cut is TakeOrdered (scale-safe); ranks are
    * then a row_number over ≤1000 rows. ln values round to DECIMAL(18,9)
    * before summing (the q93 pattern) so every Σ is exact decimal — the
    * closed-form slope arithmetic then runs on bit-identical doubles in
    * both engines.
    */
  def qZipfSlope(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val topTerms = t(s, dir, "documents")
      .select(explode(toks(col("text"))).as("token"))
      .where(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(1000)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("token").asc)
    val xy = topTerms
      .withColumn("rank", row_number().over(w))
      .select(
        log(col("rank").cast("double")).cast(DecimalType(18, 9)).as("x"),
        log(col("cnt").cast("double")).cast(DecimalType(18, 9)).as("y"))
    val agg = xy.agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("x")).cast("double").as("sx"),
      sum(col("y")).cast("double").as("sy"),
      sum((col("x") * col("y")).cast(DecimalType(28, 18))).cast("double").as("sxy"),
      sum((col("x") * col("x")).cast(DecimalType(28, 18))).cast("double").as("sxx"))
    agg.select(
      col("n").cast("bigint").as("n_terms"),
      round((col("n") * col("sxy") - col("sx") * col("sy"))
        / (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
      round((col("sy") - ((col("n") * col("sxy") - col("sx") * col("sy"))
        / (col("n") * col("sxx") - col("sx") * col("sx"))) * col("sx"))
        / col("n"), 6).as("intercept"))
  }

  val qZipfSlopeSql: String =
    """WITH f AS (
      |  SELECT token, COUNT(*) AS cnt FROM (
      |    SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |  WHERE token <> ''
      |  GROUP BY token ORDER BY cnt DESC, token ASC LIMIT 1000),
      |r AS (
      |  SELECT CAST(ln(CAST(row_number() OVER (ORDER BY cnt DESC, token ASC)
      |           AS DOUBLE)) AS DECIMAL(18,9)) AS x,
      |         CAST(ln(CAST(cnt AS DOUBLE)) AS DECIMAL(18,9)) AS y
      |  FROM f),
      |a AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(CAST(SUM(x) AS VARCHAR) AS DOUBLE) AS sx,
      |    CAST(CAST(SUM(y) AS VARCHAR) AS DOUBLE) AS sy,
      |    CAST(CAST(SUM(CAST(x * y AS DECIMAL(28,18))) AS VARCHAR) AS DOUBLE) AS sxy,
      |    CAST(CAST(SUM(CAST(x * x AS DECIMAL(28,18))) AS VARCHAR) AS DOUBLE) AS sxx
      |  FROM r)
      |SELECT CAST(n AS BIGINT) AS n_terms,
      |  ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
      |  ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
      |    AS intercept
      |FROM a""".stripMargin

  /** Regex (BPE-ish) tokenization next to whitespace counting: greedy
    * ≤3-char alpha/digit runs approximate subword units, digit runs are
    * counted separately — the token-budget accounting a training pipeline
    * runs before packing. regexp_extract_all with group 0 is row-local
    * (no shuffle); the pattern sticks to plain character classes, which
    * Java regex and DuckDB's RE2 match identically.
    */
  def qRegexTokens(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).as("n_ws_tokens"),
        size(expr("regexp_extract_all(text, '[a-z]{1,3}|[0-9]{1,3}', 0)"))
          .as("n_subword_units"),
        size(expr("regexp_extract_all(text, '[0-9]+', 0)")).as("n_digit_runs"))
      .withColumn("subwords_per_token",
        col("n_subword_units").cast("double") / col("n_ws_tokens"))

  val qRegexTokensSql: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-z]{1,3}|[0-9]{1,3}')) AS INTEGER)
      |    AS n_subword_units,
      |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS INTEGER) AS n_digit_runs,
      |  CAST(len(regexp_extract_all(text, '[a-z]{1,3}|[0-9]{1,3}')) AS DOUBLE)
      |    / len(string_split(text, ' ')) AS subwords_per_token
      |FROM documents""".stripMargin

  /** Winnowing fingerprints (MOSS-style rolling-hash document signature):
    * hash each word-3-gram shingle, slide a 4-window over the hash
    * sequence, keep each window's minimum — the classic
    * position-robust substring-match signature. Entirely row-local
    * higher-order array math; the hash is the same md5-prefix integer
    * family as the q53 planes (DuckDB evaluates it digit-identically),
    * and the per-doc fingerprint set collapses to an md5 digest so the
    * oracle compares one scalar per doc.
    */
  def qWinnowFingerprint(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    // widenScan (r20, guide §2.5): the per-shingle md5 transform — the
    // query's dominant term — is row-local and ran fused into the 1-split
    // documents scan. Spreading the texts first (0.6 MB exchange) halves
    // the query: 0.57 → 0.29 s same-window (R20Probe3, exceptAll = 0).
    // No-op at real scan parallelism.
    winnowFingerprintOf(Tables.widenScan(
      t(s, dir, "documents").select(col("doc_id"), col("text")),
      col("doc_id")))
  }

  /** Builder core of q101 over any (doc_id, text) frame (r20: split out
    * so the widenScan A/B can feed it a repartitioned input).
    */
  private[graft] def winnowFingerprintOf(docs: DataFrame): DataFrame = {
    docs
      .withColumn("toks", toks(col("text")))
      .where(size(col("toks")) >= 6) // ≥4 shingles → ≥1 full window
      // r12: shingle generation through the fused zero-copy expression;
      // the per-shingle md5 lambda (the dominant term) is unchanged
      .withColumn("hs", expr(
        """transform(word_shingles(text, 3, false),
          |  s -> CAST(conv(substring(md5(CAST(s AS BINARY)), 1, 12), 16, 10) AS BIGINT))"""
          .stripMargin))
      .withColumn("fps", expr(
        "array_distinct(transform(sequence(1, size(hs) - 3), i -> array_min(slice(hs, i, 4))))"))
      .select(
        col("doc_id"),
        size(col("hs")).as("n_shingles"),
        size(col("fps")).as("n_fingerprints"),
        (size(col("fps")).cast("double") / size(col("hs"))).as("fp_density"),
        md5(expr("concat_ws(',', transform(array_sort(fps), x -> CAST(x AS STRING)))")
          .cast("binary")).as("fp_digest"))
  }

  val qWinnowFingerprintSql: String = {
    // hex-prefix integer via one cast, not 12 per-digit md5 re-evaluations
    // — keeps the anchor honest (same value, fair DuckDB speed)
    val v48 = "CAST(CAST('0x' || substring(md5(s), 1, 12) AS UBIGINT) AS BIGINT)"
    s"""WITH d AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
       |  WHERE len(string_split(text, ' ')) >= 6),
       |h AS (
       |  SELECT doc_id,
       |    list_transform(
       |      list_transform(generate_series(1, len(toks) - 2),
       |        i -> array_to_string(toks[i:i+2], ' ')),
       |      s -> $v48) AS hs
       |  FROM d),
       |f AS (
       |  SELECT doc_id, hs,
       |    list_distinct(list_transform(generate_series(1, len(hs) - 3),
       |      i -> list_min(hs[i:i+3]))) AS fps
       |  FROM h)
       |SELECT doc_id,
       |  CAST(len(hs) AS INTEGER) AS n_shingles,
       |  CAST(len(fps) AS INTEGER) AS n_fingerprints,
       |  CAST(len(fps) AS DOUBLE) / len(hs) AS fp_density,
       |  md5(array_to_string(list_sort(fps), ',')) AS fp_digest
       |FROM f""".stripMargin
  }

  /** Cross-source contamination matrix: the q55 simhash near-dup pairs
    * joined back to each side's `source`, counted per unordered source
    * pair — the report that tells a corpus curator WHERE duplication
    * comes from (mirror sites, cross-source scrapes, books republished
    * on the web) and which source to keep canonical. Rides the banded
    * q55 rep-level pipeline (never all-pairs) with weighted per-source
    * accounting on content pairs — no doc pair is ever materialized.
    */
  def qDupSourceMatrix(s: SparkSession, dir: String): DataFrame = {
    // r19 (VERDICT r18 #1, the q150 pattern): WEIGHTED per-source
    // accounting on CONTENT pairs — the matrix never materializes a doc
    // pair. The per-doc spelling expanded every near-dup doc pair and
    // joined each side's source (77 s warm at 100× dup for 171 output
    // rows, the audit's last per-doc ceiling); but the pair count per
    // unordered source pair is a function of each content's per-source
    // COPY COUNTS: a cross-content near-dup pair (ra, rb) contributes
    // cnt_a(s₁)·cnt_b(s₂) doc pairs to (s₁, s₂), and a ≥2-copy content
    // contributes cnt(s₁)·cnt(s₂) across sources and C(cnt(s), 2)
    // within one. So the quadratic stage stays at rep granularity
    // (simhashRepPairs) and the expansion is row-local source-combo
    // arithmetic over |sources|-bounded lists.
    val (pairs, ids, sigReps) = simhashRepPairs(s, dir)
    // Per-content source composition, built off the content layer's OWN
    // persisted ids frame (r19 review): exploding ids and joining the
    // two-column (doc_id, source) projection replaces a second
    // full-corpus scan of the TEXT column plus a recomputed per-doc md5 —
    // at scale the heaviest column is read once, by contentLayer. Every
    // doc_id lives in exactly one content's list, so per-(rep, source)
    // counts match the old (cid, source) grouping row for row. Persisted:
    // both the cross and the same-content branch read it. |srcs| per row
    // is bounded by the source DOMAIN.
    val repSrc = ids
      .select(col("rep"), explode(col("ids")).as("doc_id"))
      .join(t(s, dir, "documents").select(col("doc_id"), col("source")),
        Seq("doc_id"))
      .groupBy(col("rep"), col("source"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("rep"))
      .agg(collect_list(struct(col("source"), col("cnt"))).as("srcs"))
      .persistTracked()
    repSrc.count() // eager fill — see minhashCandidates
    // r17 cliff rule, carried over: only the pair KEY SET is
    // output-bounded, so only it broadcasts (the content-pair frame is
    // strictly ≤ the doc-pair frame the old spelling broadcast); the
    // content-sized repSrc STREAMS through both attach joins — zero
    // exchanges above the pair aggregate.
    val cross = broadcast(broadcast(pairs.select(col("ra"), col("rb")))
        .join(repSrc.select(col("rep").as("ra"), col("srcs").as("srcs_a")), Seq("ra")))
      .join(repSrc.select(col("rep").as("rb"), col("srcs").as("srcs_b")), Seq("rb"))
      .select(explode(col("srcs_a")).as("a"), col("srcs_b"))
      .select(col("a"), explode(col("srcs_b")).as("b"))
      .select(least(col("a.source"), col("b.source")).as("source_x"),
        greatest(col("a.source"), col("b.source")).as("source_y"),
        (col("a.cnt") * col("b.cnt")).as("w"))
    // Same-content doc pairs (hamming 0, all within one content),
    // restricted to contents that have bands — the sameContentPairs
    // domain, in weighted form. The a.source <= b.source guard emits
    // each unordered source combo once; cnt·(cnt−1) is even, so the
    // integral DIV is exact.
    val same = repSrc
      .join(sigReps, Seq("rep"), "left_semi")
      .select(explode(col("srcs")).as("a"), col("srcs"))
      .select(col("a"), explode(col("srcs")).as("b"))
      .where(col("a.source") <= col("b.source"))
      .select(col("a.source").as("source_x"), col("b.source").as("source_y"),
        when(col("a.source") === col("b.source"),
          expr("a.cnt * (a.cnt - 1) DIV 2"))
          .otherwise(col("a.cnt") * col("b.cnt")).as("w"))
    cross.unionByName(same)
      .where(col("w") > 0) // n=1 contents: the (s,s) combo weighs 0 — a
                           // group the per-doc spelling never emitted
      .groupBy(col("source_x"), col("source_y"))
      .agg(sum(col("w")).as("n_pairs"))
  }

  val qDupSourceMatrixSql: String =
    s"""WITH pairs AS (
       |${qSimhashNearDupPairsSql.linesIterator.map("  " + _).mkString("\n")}
       |)
       |SELECT least(da.source, db.source) AS source_x,
       |  greatest(da.source, db.source) AS source_y,
       |  COUNT(*) AS n_pairs
       |FROM pairs
       |JOIN documents da ON da.doc_id = pairs.doc_a
       |JOIN documents db ON db.doc_id = pairs.doc_b
       |GROUP BY 1, 2""".stripMargin

  /** CCNet-style per-language length-band filter: exact p25/p75 of the
    * token count per language, then the kept-fraction report for the
    * middle band — the pre-training length screen that drops boilerplate
    * stubs and runaway concatenations without a global (cross-language)
    * threshold. The quantile frame is |languages|-sized, so it broadcasts
    * back; at 100 TB the exact `percentile` (per-group buffered) swaps
    * for approx_percentile — the q18-documented trade — with the rest of
    * the plan unchanged.
    */
  def qLengthFilter(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), size(toks(col("text"))).as("n_tokens"))
    val qs = d.groupBy(col("lang"))
      .agg(expr("percentile(n_tokens, array(0.25, 0.75))").as("qs"))
      .select(col("lang"), col("qs")(0).as("p25"), col("qs")(1).as("p75"))
    d.join(broadcast(qs), Seq("lang"))
      .groupBy(col("lang"), col("p25"), col("p75"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_tokens") >= col("p25") && col("n_tokens") <= col("p75"), 1L)
          .otherwise(0L)).as("n_kept"))
  }

  val qLengthFilterSql: String =
    """WITH d AS (
      |  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
      |  FROM documents),
      |q AS (
      |  SELECT lang,
      |    percentile_cont(0.25) WITHIN GROUP (ORDER BY n_tokens) AS p25,
      |    percentile_cont(0.75) WITHIN GROUP (ORDER BY n_tokens) AS p75
      |  FROM d GROUP BY lang)
      |SELECT d.lang, q.p25, q.p75, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN d.n_tokens >= q.p25 AND d.n_tokens <= q.p75
      |           THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      |FROM d JOIN q ON q.lang = d.lang
      |GROUP BY d.lang, q.p25, q.p75""".stripMargin

  /** Weighted sampling WITHOUT replacement (Efraimidis-Spirakis A-ES,
    * IPL 2006) with hash-derived uniforms instead of RNG state: each doc
    * draws u ∈ (0,1] from its md5 (48-bit mantissa, exact in both
    * engines), and the top-k by key = ln(u)/weight IS a weighted sample
    * without replacement (monotone transform of u^(1/w)). Weight here is
    * the token count — the "sample long documents proportionally" move.
    * Coordination-free and reproducible on any cluster size: the key is
    * row-local, the top-k is TakeOrderedAndProject (each partition
    * forwards ≤ k rows — no global sort). Keys round to DECIMAL(18,9)
    * (the q93 ln convention) so the oracle compares exactly.
    */
  def qWeightedSample(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    t(s, dir, "documents")
      .select(col("doc_id"), size(toks(col("text"))).as("n_tokens"))
      .where(col("n_tokens") >= 1)
      .withColumn("u",
        (expr("CAST(conv(substring(md5(CAST(CAST(doc_id AS STRING) AS BINARY)), 1, 12), 16, 10) AS BIGINT)")
          .cast("double") + 1.0) / lit(281474976710656.0)) // 2^48
      .withColumn("es_key", (log(col("u")) / col("n_tokens")).cast(DecimalType(18, 9)))
      .orderBy(col("es_key").desc, col("doc_id").asc)
      .limit(20)
      .select(col("doc_id"), col("n_tokens"), col("es_key").cast("double").as("es_key"))
  }

  val qWeightedSampleSql: String =
    """WITH d AS (
      |  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
      |    (CAST(CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 12)
      |          AS UBIGINT) AS BIGINT) AS DOUBLE) + 1.0) / 281474976710656.0 AS u
      |  FROM documents
      |  WHERE len(string_split(text, ' ')) >= 1)
      |SELECT doc_id, n_tokens,
      |  CAST(CAST(CAST(ln(u) / n_tokens AS DECIMAL(18,9)) AS VARCHAR) AS DOUBLE)
      |    AS es_key
      |FROM d
      |ORDER BY CAST(ln(u) / n_tokens AS DECIMAL(18,9)) DESC, doc_id ASC
      |LIMIT 20""".stripMargin

  /** Deterministic epoch shuffle: every doc gets a salted-hash shard and
    * an in-shard position — the "global shuffle before each training
    * epoch" that needs NO global sort: shard is a row-local hash bucket,
    * position is a row_number PARTITIONED BY shard (each shard orders
    * independently, in parallel). Changing the salt ('e0:') reshuffles
    * the epoch; same salt = identical order on any cluster. Output is
    * the (doc_id → shard, position) manifest a data loader consumes.
    */
  def qShuffleShards(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = md5(concat(lit("e0:"), col("doc_id").cast("string")).cast("binary"))
    val w = Window.partitionBy(col("shard")).orderBy(col("h").asc, col("doc_id").asc)
    t(s, dir, "documents")
      .select(col("doc_id"), h.as("h"))
      .withColumn("shard", hexDigit(col("h"), 1) % 8)
      .withColumn("pos", row_number().over(w))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  val qShuffleShardsSql: String = {
    val h = "md5('e0:' || CAST(doc_id AS VARCHAR))"
    s"""WITH d AS (
       |  SELECT doc_id, $h AS h,
       |    ${hexDigitSql(h, 1)} % 8 AS shard
       |  FROM documents)
       |SELECT doc_id, shard,
       |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h ASC, doc_id ASC)
       |       AS INTEGER) AS pos
       |FROM d""".stripMargin
  }

  /** Per-source distribution-drift report: chi-square of each source's
    * token-count histogram against the corpus-wide distribution — the
    * monitoring stat a corpus pipeline alarms on when one ingestion
    * source starts emitting truncated or runaway documents. Bins are
    * row-local fixed-width (q21 family, 13 buckets); every aggregate
    * keys on a bounded domain (source, bin) and the bin/total frames
    * broadcast back, so the plan is three bounded hash aggregates plus
    * narrow math at any corpus size. Chi-square terms sum as decimals
    * ([[Relational.dsum]]) so the double is partition-order free.
    */
  def qChisqDrift(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("source"),
        least(floor(size(toks(col("text"))).cast("double") / 10), lit(12L)).as("bin"))
    val obs = d.groupBy(col("source"), col("bin")).agg(count(lit(1)).as("obs"))
    val corpus = d.groupBy(col("bin")).agg(count(lit(1)).as("cbin"))
    val totals = d.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val n = d.agg(count(lit(1)).as("n_total"))
    val diff = coalesce(col("obs"), lit(0L)).cast("double") -
      col("n_docs").cast("double") * col("cbin") / col("n_total")
    val expCnt = col("n_docs").cast("double") * col("cbin") / col("n_total")
    totals.crossJoin(broadcast(corpus))
      .join(obs, Seq("source", "bin"), "left")
      .crossJoin(broadcast(n))
      .withColumn("term", diff * diff / expCnt)
      .groupBy(col("source"), col("n_docs"))
      .agg(Relational.dsum(col("term")).as("chi2"))
      .select(col("source"), col("n_docs"), col("chi2"))
  }

  val qChisqDriftSql: String = {
    val expCnt = "CAST(n_docs AS DOUBLE) * cbin / n_total"
    s"""WITH d AS (
       |  SELECT source,
       |    LEAST(CAST(FLOOR(CAST(len(string_split(text, ' ')) AS DOUBLE) / 10)
       |               AS BIGINT), 12) AS bin
       |  FROM documents),
       |obs AS (SELECT source, bin, COUNT(*) AS obs FROM d GROUP BY 1, 2),
       |corpus AS (SELECT bin, COUNT(*) AS cbin FROM d GROUP BY 1),
       |totals AS (SELECT source, COUNT(*) AS n_docs FROM d GROUP BY 1),
       |n AS (SELECT COUNT(*) AS n_total FROM d),
       |terms AS (
       |  SELECT t.source, t.n_docs,
       |    (CAST(COALESCE(o.obs, 0) AS DOUBLE) - $expCnt)
       |      * (CAST(COALESCE(o.obs, 0) AS DOUBLE) - $expCnt) / ($expCnt) AS term
       |  FROM totals t CROSS JOIN corpus c
       |  LEFT JOIN obs o ON o.source = t.source AND o.bin = c.bin
       |  CROSS JOIN n)
       |SELECT source, n_docs, ${Relational.dsumSql("term")} AS chi2
       |FROM terms GROUP BY source, n_docs""".stripMargin
  }

  /** Exact heavy hitters — certified SINGLE pass (r14). One Misra-Gries
    * sketch over the whole corpus ([[graft.functions.MgFreqText]] — the
    * fused-tokenization aggregate; each partition ships O(cap) counters
    * instead of one partial count per distinct key), run with capacity
    * `cap = 1<<16` decoupled from the returned arity 20. The sketch
    * carries an exactness certificate ([[graft.functions.MgSketch.err]]):
    * `err == 0` proves no eviction ever fired anywhere in the merge
    * tree — the vocabulary fit the capacity, every estimate IS the
    * exact count, and no token outside the sketch was ever seen — so
    * the (est DESC, item ASC)-ordered head of the counters IS the exact
    * top-20, checked lazily INSIDE the returned plan. No second pass,
    * no eager driver collect, no snapshot semantics at all: the plan
    * re-certifies against the corpus as it stands at EVERY execution,
    * which retires the r13 build-vs-execute witness machinery rather
    * than patching it. Counter state stays a few MB per aggregation
    * buffer, constant w.r.t. data size. (The alternative lever the r13
    * verdict floated — a multi-row-group 10× layout so both engines
    * split the scan — is a ratio LOSS by arithmetic: both engines' scan
    * terms shrink ~P× but Spark's per-job scheduler floor doesn't, so
    * the quotient degrades. Deleting the second scan wins instead:
    * measured 0.75 → ~0.45 s at 10×, R14Probe decomposition in
    * BASELINE.md.)
    *
    * When the vocabulary overflows the capacity (`err > 0`) exactness
    * is unprovable from one pass and the plan REFUSES — deterministic
    * `raise_error` naming [[qHeavyHittersTwoPass]], the eager
    * sketch-then-recount spelling that stays exact for any vocabulary
    * whose top-20 clears its (far tighter than n/(k+1)) candidate
    * bound. That spelling is the documented shape for huge key domains
    * (all 5-grams of a 100 TB corpus): q41's single hash-aggregate
    * would spill on |domain| partial counts; the sketch never
    * materializes more than cap. A corpus with fewer than 20 types
    * legitimately returns fewer rows on the certified path (the
    * certificate proves the short answer is the whole answer). Oracle:
    * plain exact top-20.
    */
  def qHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val cap = 1 << 16
    t(s, dir, "documents")
      .agg(expr(s"mg_freq_text(text, 20, $cap)").as("r"))
      // the guard lives on the ARRAY, before the explode: an err > 0
      // sketch whose counters compacted to empty must still raise, not
      // vanish into a zero-row result (the posexplode of an empty
      // certified array, by contrast, is a correct empty answer)
      .select(posexplode(when(col("r.err") === 0L, col("r.items"))
        .otherwise(raise_error(concat(
          lit("q103 MG safety margin violated: sketch capacity "),
          lit(s"overflowed (err "), col("r.err").cast("string"),
          lit(s") — vocabulary exceeds $cap types, single-pass "),
          lit("exactness unprovable; use qHeavyHittersTwoPass"))))))
      .select(col("col.item").as("token"), col("col.est").as("cnt"))
  }

  /** The eager two-pass heavy-hitters spelling — the fallback for
    * corpora whose vocabulary overflows [[qHeavyHitters]]'s capacity
    * certificate. Pass 1 (eager, at build time) runs the capacity-cap
    * sketch and materializes the single result row (an O(k) collect —
    * the items array is truncated to k entries inside the aggregate's
    * eval, whatever the capacity); if the sketch certifies exact
    * (`err == 0`) the answer is baked directly with a narrow doc-count +
    * n_chars witness scan, else pass 2 recounts ONLY the ≤k candidates
    * exactly in one fused `token_term_counts` + `array_sum_long` scan
    * (no second explode, no shuffle, no join) and certifies each
    * returned count strictly above the sketch's non-candidate `bound`
    * (est(k+1th) + err — far tighter than the classic n/(k+1) since
    * cap ≫ k).
    *
    * Snapshot contract (this spelling only): pass 1 binds its result at
    * build time; executing against a corpus that changed in between is
    * detected — the recount guard cross-checks pass 2's independently
    * computed stream length against pass 1's, and the baked-exact plan
    * re-counts documents and re-sums `n_chars` in a cheap narrow scan.
    * (A corpus edit preserving those witnesses evades detection —
    * accepted, same-size substitution across a refresh is not a failure
    * mode the snapshot contract claims to cover. A corpus lacking the
    * `n_chars` column falls back to the doc-count witness alone.)
    */
  def qHeavyHittersTwoPass(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val k = 64
    val cap = 1 << 16
    val docsT = t(s, dir, "documents")
    val hasChars = docsT.columns.contains("n_chars")
    val charsAgg =
      if (hasChars) coalesce(sum(col("n_chars")), lit(0L))
      else lit(0L)
    val sk = docsT
      .agg(expr(s"mg_freq_text(text, $k, $cap)").as("r"),
        count(lit(1)).as("docs"), charsAgg.as("chars"))
      .select(col("r.n").as("n"), col("r.err").as("err"),
        col("r.bound").as("bound"),
        expr("transform(r.items, x -> x.item)").as("cands"),
        expr("transform(r.items, x -> x.est)").as("ests"),
        col("docs"), col("chars"))
      .head()
    val n = sk.getLong(0)
    val err = sk.getLong(1)
    val bound = sk.getLong(2)
    val cands = sk.getSeq[String](3)
    if (err == 0L) {
      // Certified exact at build time: bake the top-20 and verify the
      // snapshot with one narrow scan (doc count + n_chars, no text).
      val docs0 = sk.getLong(5)
      val chars0 = sk.getLong(6)
      val top = cands.zip(sk.getSeq[Long](4)).take(20)
      val baked = array(top.map { case (tok, cnt) =>
        struct(lit(tok).as("token"), lit(cnt).as("cnt")) }: _*)
        .cast("array<struct<token: string, cnt: bigint>>")
      return docsT
        .agg(count(lit(1)).as("d"), charsAgg.as("ch"))
        .select(col("d"), col("ch"), posexplode(baked))
        .select(col("col.token").as("token"),
          when(col("d") === docs0 && col("ch") === chars0, col("col.cnt"))
            .otherwise(raise_error(concat(
              lit("q103 snapshot witness violated: docs/chars "),
              col("d"), lit("/"), col("ch"),
              lit(s" vs sketch-pass $docs0/$chars0 (the corpus changed "),
              lit("between sketch and execution — rebuild the query)"))))
            .as("cnt"))
    }
    if (cands.length < 20)
      // an under-filled sketch (decrement churn on a near-uniform corpus)
      // can't certify a top-20 — refuse at execution, same contract as
      // the full guard below
      return s.range(1).select(
        lit(null).cast("string").as("token"),
        raise_error(lit(s"q103 MG safety margin violated: rows_out " +
          s"${cands.length}, bound $bound with n = $n — raise cap above $cap"))
          .cast("long").as("cnt"))
    // Pass 2 (fallback, vocabulary > cap): fused exact recount of the ≤k
    // candidates — one narrow token_term_counts scan reduced by
    // array_sum_long into a single (k+2)-long vector. No second explode,
    // no candidate shuffle, no join: element 1 of the vector is the
    // exact stream length n, the candidate counts are exact, and the MG
    // bound (non-candidates have true count <= bound) makes the top-20
    // provably exact iff every returned cnt clears it strictly. The
    // top-20 selection is an ARRAY sort over the single ≤k-element row
    // (interpreted HOF, but over 64 elements once — not the hot path),
    // not a row-level orderBy: a row sort on a 1-row frame still pays a
    // range-partition sampling job + exchange, which was a visible
    // share of the query's floor-bound absolute at 10×.
    val candsLit = array(cands.map(lit): _*)
    docsT
      .agg(call_function("array_sum_long",
        call_function("token_term_counts", col("text"), candsLit)).as("c"))
      // posexplode_outer (r14, advisor): if the corpus empties (or goes
      // all-null-text) between the passes, array_sum_long evaluates to
      // NULL and a plain posexplode would drop the one aggregate row —
      // silently returning an empty frame instead of reaching the
      // witness. The outer explode keeps the row, its NULL n fails the
      // n === $n check, and the guard raises as documented.
      .select(element_at(col("c"), 1).as("n"),
        posexplode_outer(slice(array_sort(
          zip_with(candsLit, slice(col("c"), 2, cands.length),
            (tok, cn) => struct(cn.as("cnt"), tok.as("token"))),
          (a, b) => when(a("cnt") > b("cnt"), -1)
            .when(a("cnt") < b("cnt"), 1)
            .when(a("token") < b("token"), -1)
            .when(a("token") > b("token"), 1).otherwise(0)),
          1, 20)))
      .select(col("col.token").as("token"),
        when(col("n") === n && col("col.cnt") > bound, col("col.cnt"))
          .otherwise(raise_error(concat(
            lit("q103 MG safety margin violated: cnt "),
            coalesce(col("col.cnt").cast("string"), lit("null")),
            lit(s", non-candidate bound $bound with n = "),
            coalesce(col("n").cast("string"), lit("null")),
            lit(s"; sketch-pass n = $n (a mismatch means the corpus "),
            lit("changed between sketch and recount — rebuild the query)"),
            lit(s" — raise cap above $cap if n matches")))).as("cnt"))
  }

  val qHeavyHittersSql: String =
    """SELECT token, COUNT(*) AS cnt FROM (
      |  SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |WHERE token <> ''
      |GROUP BY token ORDER BY cnt DESC, token ASC LIMIT 20""".stripMargin

  /** q130: per-source token (Shannon) entropy — the corpus-diversity
    * signal next to the cross-entropy screens (q93/q119): H = ln(n) −
    * (Σ c·ln c)/n over the source's token counts. One (source, token)
    * shuffle with map-side combine; each c·ln c term rounds to 6dp in
    * DOUBLE before the exact decimal sum (c is exact, ln(c) bit-identical
    * in both engines, so the rounded product is too).
    */
  def qSourceEntropy(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val counts = t(s, dir, "documents")
      .select(col("source"), explode(toks(col("text"))).as("token"))
      .where(col("token") =!= "")
      .groupBy(col("source"), col("token")).agg(count(lit(1)).as("c"))
    counts.groupBy(col("source")).agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(round(col("c") * log(col("c").cast("double")), 6)
          .cast(DecimalType(28, 6))).cast("double").as("sclnc"))
      .select(col("source"), col("n_tokens"), col("n_types"),
        round(log(col("n_tokens").cast("double"))
          - col("sclnc") / col("n_tokens").cast("double"), 6).as("entropy"))
  }

  val qSourceEntropySql: String =
    """WITH c AS (
      |  SELECT source, token, COUNT(*) AS c FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS token
      |    FROM documents)
      |  WHERE token <> '' GROUP BY source, token),
      |a AS (
      |  SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |    COUNT(*) AS n_types,
      |    CAST(CAST(SUM(CAST(round(c * ln(CAST(c AS DOUBLE)), 6)
      |      AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sclnc
      |  FROM c GROUP BY source)
      |SELECT source, n_tokens, n_types,
      |  ROUND(ln(CAST(n_tokens AS DOUBLE)) - sclnc / CAST(n_tokens AS DOUBLE), 6)
      |    AS entropy
      |FROM a""".stripMargin

  /** q131: one BPE counting step — the pair-frequency table a tokenizer
    * trainer builds each merge round, computed the way real BPE trainers
    * do it: aggregate the corpus to its WORD-frequency table first (the
    * shuffle moves |vocab| rows, not |corpus| tokens), then expand each
    * distinct word into its adjacent character pairs row-locally and
    * weight by word frequency. Overlapping pairs count once per position
    * ("aaa" → (a,a) twice), the standard counting phase. Top-5 by
    * (count desc, pair asc).
    */
  def qBpeMergeStep(s: SparkSession, dir: String): DataFrame = {
    val wordFreq = t(s, dir, "documents")
      .select(explode(toks(col("text"))).as("word"))
      .where(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))
    wordFreq
      // length >= 2: Spark's sequence(1, 0) runs DESCENDING, not empty
      .where(length(col("word")) >= 2)
      .select(col("wc"), explode(expr(
        "transform(sequence(1, length(word) - 1), " +
          "i -> concat(substring(word, i, 1), substring(word, i + 1, 1)))"))
        .as("pair"))
      .groupBy(col("pair")).agg(sum(col("wc")).as("n_pair"))
      .orderBy(col("n_pair").desc, col("pair").asc)
      .limit(5)
  }

  val qBpeMergeStepSql: String =
    """WITH wf AS (
      |  SELECT word, COUNT(*) AS wc FROM (
      |    SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |  WHERE word <> '' GROUP BY word),
      |pairs AS (
      |  SELECT wc, unnest(list_transform(
      |    generate_series(1, len(word) - 1),
      |    i -> substr(word, i, 2))) AS pair
      |  FROM wf WHERE len(word) >= 2)
      |SELECT pair, CAST(SUM(wc) AS BIGINT) AS n_pair
      |FROM pairs GROUP BY pair
      |ORDER BY n_pair DESC, pair ASC LIMIT 5""".stripMargin

  /** q139: collocation mining — PMI of the top-20 bigrams (by count,
    * then lexicographic): PMI(a,b) = ln(N·c_ab / (c_a·c_b)) over
    * adjacent-token pairs. The word2vec-era association signal that
    * separates true collocations from chance co-occurrence. One bigram
    * shuffle; unigram counts come from a second corpus pass semi-filtered
    * at the scan to the ≤40 tokens the top-20 pairs reference (r17 — no
    * vocabulary-wide exchange or broadcast anywhere). The PMI arithmetic
    * runs on the broadcast-sized top-20 frame with exact-integer ln
    * arguments (identical doubles both engines), rounded to 6dp.
    */
  def qBigramPmi(s: SparkSession, dir: String): DataFrame = {
    // r12: unigrams explode the raw split with a codegen'd post-explode
    // filter (no interpreted filter lambda); bigrams use the shared
    // [[neBigrams]] fused spelling, split back on the interior space.
    val docs = t(s, dir, "documents")
    val bg = docs
      .select(explode(neBigrams(s)).as("bg"))
      .select(substring_index(col("bg"), " ", 1).as("a"),
        substring_index(col("bg"), " ", -1).as("b"))
    // one bigram shuffle: total and top-20 both derive from the persisted
    // counts frame (a second corpus scan for N would double the heavy work)
    val bgCounts = bg.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
      .persistTracked()
    val nBi = bgCounts.agg(sum(col("c_ab")).as("n_bi"))
    val top = bgCounts
      .orderBy(col("c_ab").desc, col("a").asc, col("b").asc)
      .limit(20)
    // A full unigram count table is VOCABULARY-sized — it grows with the
    // corpus (r17: ~1.5M types on the 100× independent corpus,
    // unboundable at 100 TB), so broadcasting it (the pre-r17 spelling)
    // was the q49 cliff class in broadcast form: the UNBOUNDED side
    // shipped as the build table while the 20-row side streamed. Only the
    // ≤40 tokens the top-20 pairs reference ever matter, so the bounded
    // set travels the other way: a broadcast SEMI-join against those
    // tokens filters the token stream AT THE SCAN, before any exchange —
    // the vocabulary-wide unigram shuffle disappears entirely (not merely
    // un-broadcast), the surviving aggregate groups ≤40 keys, and THAT is
    // what broadcasts back onto the top frame. top and uniTop are
    // persisted because each is read from two branches (top: wanted + the
    // final join; uniTop: both attach broadcasts); both are metadata-
    // sized (20 and ≤40 rows), so the caches cost nothing at any scale.
    // Measured at the 100× independent corpus (R17Probe7): broadcast-uni
    // 4.7 s warm / semi-above-agg pivot 6.3 s / this token-level semi ≈
    // the broadcast spelling, with the hard broadcast ceiling gone.
    val topC = top.persistTracked()
    val wanted = topC.select(explode(array(col("a"), col("b"))).as("w")).distinct()
    val uniTop = docs.select(explode(toks(col("text"))).as("w"))
      .where(col("w") =!= "")
      .join(broadcast(wanted), Seq("w"), "left_semi")
      .groupBy(col("w")).agg(count(lit(1)).as("cw"))
      .persistTracked()
    topC
      .join(broadcast(uniTop.select(col("w").as("a"), col("cw").as("c_a"))), Seq("a"))
      .join(broadcast(uniTop.select(col("w").as("b"), col("cw").as("c_b"))), Seq("b"))
      .crossJoin(broadcast(nBi))
      .select(col("a"), col("b"), col("c_ab"),
        round(log(col("n_bi").cast("double") * col("c_ab").cast("double")
          / (col("c_a").cast("double") * col("c_b").cast("double"))), 6).as("pmi"))
  }

  val qBigramPmiSql: String =
    """WITH d AS (
      |  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS ne
      |  FROM documents),
      |uni AS (
      |  SELECT w, COUNT(*) AS cw FROM (SELECT unnest(ne) AS w FROM d)
      |  GROUP BY w),
      |bg AS (
      |  SELECT u.pr[1] AS a, u.pr[2] AS b FROM (
      |    SELECT unnest(list_transform(generate_series(1, len(ne) - 1),
      |      i -> [ne[i], ne[i + 1]])) AS pr
      |    FROM d WHERE len(ne) >= 2) u),
      |nb AS (SELECT COUNT(*) AS n_bi FROM bg),
      |top AS (
      |  SELECT a, b, COUNT(*) AS c_ab FROM bg GROUP BY a, b
      |  ORDER BY c_ab DESC, a ASC, b ASC LIMIT 20)
      |SELECT top.a, top.b, top.c_ab,
      |  ROUND(ln(CAST(nb.n_bi AS DOUBLE) * CAST(top.c_ab AS DOUBLE)
      |    / (CAST(ua.cw AS DOUBLE) * CAST(ub.cw AS DOUBLE))), 6) AS pmi
      |FROM top
      |JOIN uni ua ON ua.w = top.a
      |JOIN uni ub ON ub.w = top.b
      |CROSS JOIN nb""".stripMargin

  /** q140: the corpus datasheet — the one-row summary a data card
    * reports: volume, composition, length shape, and exact-dup rate.
    * Everything derives from one scan + one distinct-hash count; the
    * length median reuses the exact-percentile pairing (approx_percentile
    * is the unbounded default, as documented at q18/q113).
    */
  def qCorpusCard(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"),
        size(toks(col("text"))).cast("long").as("n_toks"),
        md5(col("text")).as("h"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        countDistinct(col("source")).as("n_sources"),
        countDistinct(col("lang")).as("n_langs"),
        round(lit(100.0) * sum(when(col("lang") === "en", 1L).otherwise(0L))
          / count(lit(1)), 2).as("pct_en"),
        round(Relational.dsum(col("n_toks")) / count(lit(1)), 6).as("mean_len"),
        expr("percentile(n_toks, 0.5D)").as("p50_len"),
        round(lit(100.0) * (count(lit(1)) - countDistinct(col("h")))
          / count(lit(1)), 4).as("pct_exact_dup"))

  val qCorpusCardSql: String =
    """SELECT COUNT(*) AS n_docs,
      |  CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
      |  COUNT(DISTINCT source) AS n_sources,
      |  COUNT(DISTINCT lang) AS n_langs,
      |  ROUND(CAST(100.0 AS DOUBLE) * SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
      |        / COUNT(*), 2) AS pct_en,
      |  ROUND(CAST(CAST(SUM(CAST(n_toks AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
      |        / COUNT(*), 6) AS mean_len,
      |  quantile_cont(n_toks, 0.5) AS p50_len,
      |  ROUND(CAST(100.0 AS DOUBLE) * (COUNT(*) - COUNT(DISTINCT h))
      |        / COUNT(*), 4) AS pct_exact_dup
      |FROM (SELECT doc_id, lang, source,
      |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
      |        md5(text) AS h
      |      FROM documents)""".stripMargin

  /** q143: MinHash estimator audit — for every LSH candidate pair (≥1 of
    * 8 band agreements, the q56 candidate set), the signature-estimated
    * Jaccard (matching components / 32) next to the EXACT shingle-set
    * Jaccard, with the absolute error. The measurement that justifies the
    * dedup threshold: MinHash theory says E[est] = J with σ = √(J(1−J)/k),
    * and this query is the empirical check — the sibling of q137's ANN
    * recall audit, for the dedup family.
    *
    * Scale shape: candidates come from band-bucket equality (never
    * all-pairs); the exact-Jaccard side is computed ONLY for docs that
    * appear in some candidate pair (semi-join cut of the posting list
    * before the shingle self-join), so its cost is |candidates|-bounded,
    * not corpus-bounded. All similarity math is exact integer ratios in
    * double (k/32 and c/(a+b−c) are single IEEE divisions — deterministic
    * without rounding, the q49 convention).
    */
  def qMinhashErrorAudit(s: SparkSession, dir: String): DataFrame = {
    // repartition(doc_id) at the TEXT level (r17b): the groupBy(doc_id)
    // needed this exchange anyway — hoisting it below the scan moves the
    // 32-family md5 evaluation from the SCAN stage (whose parallelism is
    // the input file layout: ONE task on a single-row-group fixture/scale
    // file — 39 s of single-threaded hashing at 10×, R17Probe9) to the
    // post-shuffle side, exchanging raw text instead of shingles. Same
    // exchange count, fewer bytes, order-insensitive MIN → values
    // unchanged. See [[simhash]].
    // r18 content-dedup layer (found by the 100× DUPLICATION audit, the
    // probe class VERDICT r17 #1 mandated): the r17b pair join attached
    // each side's payload (32-hash signature + shingle array, ~3.5 KB)
    // once PER PAIR — under 100× duplication every doc sits in ~100
    // pairs, so the join shuffled ~190 GB for a 2 GB corpus and died on
    // disk (the audit's 27M-pair reading). But est/jaccard depend only on
    // CONTENT: identical texts have identical signatures and shingle
    // sets, so the whole quadratic stage now runs per DISTINCT TEXT
    // (cid = md5(text)) and expands to doc pairs row-locally at the end.
    // Work is a function of the corpus's distinct-content structure —
    // strictly ≤ the per-doc spelling under EVERY corpus structure
    // (duplication: quadratic stage collapses to the original-content
    // universe; independent: cid ≈ doc_id and the plan degenerates to
    // r17b's at the same cost). Values are bit-identical; the oracle SQL
    // is untouched.
    // Dedup mechanics (v2, measured): a per-cid text aggregate
    // (first(text)) cannot run on the codegen hash-agg fast path — a
    // string-valued buffer forces the object/sort fallback, which at the
    // 100× INDEPENDENT corpus (where cid ≈ doc) re-sorted 2.3 GB of text
    // and doubled the cold reading (94.6 s vs r17b's 44.9). So no text
    // ever enters an aggregate: one SKINNY pass picks each content's
    // representative (min doc_id) and collects the doc-id list, and a
    // LeftSemi join cuts the corpus to representative rows — the same
    // single full-text doc_id-keyed exchange r17b's repartition paid, so
    // the independent-corpus cost is unchanged while duplication
    // collapses the text reaching the signature build to one copy per
    // distinct content. Pair keys are the representatives' 8-byte
    // doc_ids from here on (rep_a/rep_b), not 32-char digests.
    val (ids, reps) = contentLayer(t(s, dir, "documents"))
    val sh = shinglesDistinct(reps)
    val mins = (0 until MinhashK).map(i =>
      min(md5(concat_ws(":", lit(i), col("shingle")).cast("binary"))).as(s"m$i"))
    // The per-text distinct shingle ARRAY rides the signature aggregate
    // (r17b): the true-jaccard side needs it, and collecting it here
    // costs no extra pass (shinglesDistinct already dedups, so
    // collect_list is set-valued). No persist on sh (r18, advisor): it
    // is consumed exactly once.
    val aggs = mins :+ collect_list(col("shingle")).as("arr")
    val sig = sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
    val bands = (0 until MinhashBands).map { b =>
      md5(concat_ws("|", (b * 4 until b * 4 + 4).map(i => col(s"m$i")): _*).cast("binary"))
        .as(s"band$b")
    }
    val sigB = sig.select(col("doc_id").as("rep") +: col("arr") +:
      ((0 until MinhashK).map(i => col(s"m$i")) ++ bands): _*).persistTracked()
    val banded = sigB.select(col("rep"),
      explode(array((0 until MinhashBands).map(b =>
        struct(lit(b).as("b"), col(s"band$b").as("k"))): _*)).as("bk"))
      .select(col("rep"), col("bk.b"), col("bk.k"))
    val cand = banded.as("x").join(banded.as("y").hint("shuffle_hash"),
        col("x.b") === col("y.b") && col("x.k") === col("y.k") &&
          col("x.rep") < col("y.rep"))
      .select(col("x.rep").as("rep_a"), col("y.rep").as("rep_b"))
      .distinct()
    // r17b (the broadcast dual, measured the hard way): the first r17 fix
    // broadcast est/common/sizes on the claim "candidate-bounded". That
    // held on the independent 100× corpus but NOT under duplication —
    // `common` was pairs-sharing-a-shingle (corpus-STRUCTURE-dependent,
    // not banding-bounded) and its broadcast hit Spark's 8 GiB hard limit
    // at 11.6 GiB on the 10× duplication corpus. Only the banded pair KEY
    // SET is output-bounded, so that is the only thing that broadcasts
    // (16 B/content-pair — two rep doc_ids); each side's payload attaches by STREAMING
    // the persisted per-text frame through that broadcast, the two
    // pair-keyed sides meet in ONE co-partitioned shuffle join, and
    // est/common/jaccard are row-local array arithmetic — zip_with
    // equality count for the estimate, array_intersect size for true
    // overlap.
    val candB = cand.persistTracked()
    def side(key: String, sfx: String) = sigB
      .select(col("rep").as(key),
        array((0 until MinhashK).map(i => col(s"m$i")): _*).as(s"sig$sfx"),
        col("arr").as(s"arr$sfx"))
      .join(broadcast(candB), Seq(key))
    val stats = side("rep_a", "_a").join(side("rep_b", "_b"), Seq("rep_a", "rep_b"))
      .withColumn("matches", expr(
        "size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), h -> h))"))
      .withColumn("common", size(array_intersect(col("arr_a"), col("arr_b"))))
      .withColumn("est_jaccard", col("matches").cast("double") / lit(MinhashK))
      .withColumn("jaccard", col("common").cast("double")
        / (size(col("arr_a")) + size(col("arr_b")) - col("common")))
      .select(col("rep_a"), col("rep_b"), col("est_jaccard"), col("jaccard"))
    // Expansion back to doc pairs (expandRepPairs/sameContentPairs, the
    // shared r18 helpers): cross-content pairs carry est/jaccard verbatim
    // (content-pair functions); same-content pairs are est = jaccard = 1
    // exactly, restricted to contents that HAVE a signature.
    val cross = expandRepPairs(
      stats.select(col("rep_a").as("ra"), col("rep_b").as("rb"),
        col("est_jaccard"), col("jaccard")),
      ids, Seq("est_jaccard", "jaccard"))
    val same = sameContentPairs(ids, sigB.select(col("rep")))
      .select(col("doc_a"), col("doc_b"),
        lit(1.0).as("est_jaccard"), lit(1.0).as("jaccard"))
    cross.unionByName(same)
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"), col("jaccard"),
        abs(col("est_jaccard") - col("jaccard")).as("abs_err"))
  }

  val qMinhashErrorAuditSql: String = {
    val bandOr = (0 until MinhashBands).map(b => s"a.band$b = b.band$b").mkString(" OR ")
    val matchSum = (0 until MinhashK)
      .map(i => s"(CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END)").mkString(" + ")
    val bandDefs = (0 until MinhashBands).map { b =>
      val parts = (b * 4 until b * 4 + 4).map(i => s"m$i").mkString(" || '|' || ")
      s"md5($parts) AS band$b"
    }.mkString(",\n    ")
    val minDefs = (0 until MinhashK)
      .map(i => s"MIN(md5('$i:' || shingle)) AS m$i").mkString(",\n    ")
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
       |           WHERE len(string_split(text, ' ')) >= 3),
       |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
       |         generate_series(1, len(toks) - 2),
       |         i -> array_to_string(toks[i:i+2], ' ')))) AS shingle
       |       FROM d),
       |m AS (SELECT doc_id,
       |    $minDefs
       |  FROM sh GROUP BY doc_id),
       |sig AS (SELECT *,
       |    $bandDefs
       |  FROM m),
       |cand AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST($matchSum AS DOUBLE) / $MinhashK AS est_jaccard
       |  FROM sig a JOIN sig b
       |    ON a.doc_id < b.doc_id AND ($bandOr)),
       |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
       |com AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS common
       |  FROM sh a JOIN sh b USING (shingle)
       |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
       |SELECT c.doc_a, c.doc_b, c.est_jaccard,
       |  CAST(COALESCE(cm.common, 0) AS DOUBLE)
       |    / (sa.n_sh + sb.n_sh - COALESCE(cm.common, 0)) AS jaccard,
       |  ABS(c.est_jaccard - CAST(COALESCE(cm.common, 0) AS DOUBLE)
       |    / (sa.n_sh + sb.n_sh - COALESCE(cm.common, 0))) AS abs_err
       |FROM cand c
       |LEFT JOIN com cm ON cm.doc_a = c.doc_a AND cm.doc_b = c.doc_b
       |JOIN sizes sa ON sa.doc_id = c.doc_a
       |JOIN sizes sb ON sb.doc_id = c.doc_b""".stripMargin
  }

  /** q146: dedup survivor selection — the DECISION step after exact-dup
    * grouping: within each content-hash group keep the best document
    * (longest, then lowest doc_id — a deterministic quality proxy), and
    * report the per-source keep/remove ledger a curation run logs. One
    * hash-key window (row_number over md5(text) groups, skew-free by
    * construction — group size = dup multiplicity) and one bounded
    * source-key aggregate.
    */
  def qDedupSurvivors(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("h"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    t(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"), md5(col("text")).as("h"))
      .withColumn("rk", row_number().over(w))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("rk") === 1, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("rk") =!= 1, 1L).otherwise(0L)).as("n_removed"),
        round(lit(100.0) * sum(when(col("rk") =!= 1, 1L).otherwise(0L))
          / count(lit(1)), 4).as("pct_removed"))
  }

  val qDedupSurvivorsSql: String =
    """WITH r AS (
      |  SELECT source,
      |    row_number() OVER (PARTITION BY md5(text)
      |      ORDER BY n_chars DESC, doc_id ASC) AS rk
      |  FROM documents)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(SUM(CASE WHEN rk <> 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
      |  ROUND(CAST(100.0 AS DOUBLE) * SUM(CASE WHEN rk <> 1 THEN 1 ELSE 0 END)
      |        / COUNT(*), 4) AS pct_removed
      |FROM r GROUP BY source""".stripMargin

  /** q150: LSH threshold sweep — the candidate-pair count at every
    * band-agreement threshold t = 1..8, from the q56 candidate table.
    * The operational tuning curve for the dedup pipeline: raising the
    * required band agreements trades recall for candidate volume, and
    * this is the measurement that picks the threshold before a 100 TB
    * run. Each pair contributes one row per threshold it clears
    * (explode of sequence(1, n_bands) — row-local), so the aggregate is
    * a bounded 8-row frame; thresholds no pair reaches are absent in
    * both engines by the same construction.
    */
  def qLshThresholdSweep(s: SparkSession, dir: String): DataFrame = {
    // r18: WEIGHTED over the content-pair frame — each content pair
    // counts |ids_a|·|ids_b| doc pairs (mult rides the pair aggregate,
    // see minhashRepPairs) and each ≥2-copy content counts n·(n−1)/2
    // same-content pairs at the full 8-band agreement. The sweep never
    // materializes a doc pair at all: under 100× duplication the r17
    // spelling exploded 27M pairs × thresholds; this one aggregates a
    // content-pair-sized frame into the same exact 8-row answer.
    val (pairs, ids, sigReps) = minhashRepPairs(s, dir)
    val same = sigReps
      .join(ids.where(size(col("ids")) >= 2), Seq("rep"))
      .select(lit(MinhashBands.toLong).as("n_bands"),
        (size(col("ids")).cast("long") * (size(col("ids")) - 1) / 2).as("mult"))
    pairs.select(col("n_bands"), col("mult")).unionByName(same)
      .select(explode(expr("sequence(1, n_bands)")).as("threshold"), col("mult"))
      .groupBy(col("threshold"))
      .agg(sum(col("mult")).cast("long").as("n_pairs"))
  }

  val qLshThresholdSweepSql: String =
    s"""WITH p AS (
       |${qMinhashCandidatePairsSql.linesIterator.map("  " + _).mkString("\n")}
       |)
       |SELECT CAST(t AS BIGINT) AS threshold, COUNT(*) AS n_pairs
       |FROM (SELECT unnest(generate_series(1, CAST(n_bands AS INTEGER))) AS t FROM p)
       |GROUP BY 1""".stripMargin

  /** q152: token-weighted median document length — per source, the
    * smallest length L such that documents of length ≤ L hold at least
    * half the source's TOKENS (2·cumsum ≥ total, cross-multiplied
    * integers — no float percentile). The packing statistic a sequence-
    * packing run (q98) sizes its context windows with: the unweighted
    * median says where the median DOCUMENT is, this says where the
    * median TOKEN lives, and long-tail corpora put them far apart.
    *
    * Scale shape: one shuffle on source for the cumulative window
    * (unique (n_toks, doc_id) order), then a bounded source-key
    * aggregate; everything is exact integer arithmetic.
    */
  def qWeightedMedianLen(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_toks").asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(toks(col("text"))).cast("long").as("n_toks"))
      .withColumn("cum", sum(col("n_toks")).over(w))
      .withColumn("total",
        sum(col("n_toks")).over(Window.partitionBy(col("source"))))
      .groupBy(col("source"))
      .agg(max(col("total")).as("total_tokens"),
        min(when(col("cum") * 2 >= col("total"), col("n_toks")))
          .as("wmedian_len"))
  }

  val qWeightedMedianLenSql: String =
    """WITH x AS (
      |  SELECT doc_id, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
      |  FROM documents),
      |c AS (
      |  SELECT source, n_toks,
      |    SUM(n_toks) OVER (PARTITION BY source
      |      ORDER BY n_toks ASC, doc_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    SUM(n_toks) OVER (PARTITION BY source) AS total
      |  FROM x)
      |SELECT source, CAST(MAX(total) AS BIGINT) AS total_tokens,
      |  CAST(MIN(CASE WHEN cum * 2 >= total THEN n_toks END) AS BIGINT)
      |    AS wmedian_len
      |FROM c GROUP BY source""".stripMargin

  /** q154: cross-source n-gram containment matrix — for every source
    * pair, the distinct-3-gram overlap and both directed containments
    * (|A∩B|/|A|, |A∩B|/|B|). The source-level diversity heatmap: q105
    * counts exact-dup DOCS across sources, this measures phrase-level
    * leakage even when no document is copied whole — the signal that
    * two "different" crawls share a boilerplate substrate.
    *
    * Scale shape: ONE corpus-scale shuffle — group by shingle into the
    * set of sources containing it (set size is bounded by the source
    * DOMAIN, so partial collect_set combines map-side). Source pairs are
    * then generated ROW-LOCALLY from each sorted source set — no
    * self-join, no second corpus-scale shuffle; everything downstream is
    * |sources|- or |sources|²-bounded. The gated q154 groups on the raw
    * shingle string (spelling-identical to the DuckDB oracle, the
    * q49/x49 convention); the scale default (bench x154) xxhash64's the
    * key so the exchange carries 8 bytes — collisions merge two
    * shingles' source sets at odds ~|shingles|²/2⁶⁵, like q47/q48.
    */
  def sourceOverlap(docs: DataFrame, hashShingles: Boolean = false): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val bySh = docs
      .select(col("source"),
        explode(call_function("word_shingles",
          col("text"), lit(3), lit(true))).as("shingle"))
      .groupBy((if (hashShingles) xxhash64(col("shingle"))
                else col("shingle")).as("sh"))
      .agg(array_sort(collect_set(col("source"))).as("srcs"))
      .persistTracked()
    val sizes = bySh.select(explode(col("srcs")).as("source"))
      .groupBy(col("source")).agg(count(lit(1)).as("n_sh"))
    bySh.where(size(col("srcs")) >= 2)
      .select(explode(expr(
        "flatten(transform(srcs, (x, i) -> transform(" +
          "slice(srcs, i + 2, size(srcs)), " +
          "y -> struct(x AS source_a, y AS source_b))))")).as("p"))
      .groupBy(col("p.source_a").as("source_a"), col("p.source_b").as("source_b"))
      .agg(count(lit(1)).as("common"))
      .join(broadcast(sizes.select(col("source").as("source_a"), col("n_sh").as("n_a"))),
        Seq("source_a"))
      .join(broadcast(sizes.select(col("source").as("source_b"), col("n_sh").as("n_b"))),
        Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"), col("common"),
        round(col("common").cast("double") / col("n_a"), 6).as("containment_a"),
        round(col("common").cast("double") / col("n_b"), 6).as("containment_b"))
  }

  /** q154 gated spelling: raw-string shingle keys, oracle-identical. */
  def qSourceOverlap(s: SparkSession, dir: String): DataFrame =
    sourceOverlap(t(s, dir, "documents"))

  val qSourceOverlapSql: String =
    """WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS toks
      |           FROM documents WHERE len(string_split(text, ' ')) >= 3),
      |ss AS (SELECT DISTINCT source, shingle FROM (
      |         SELECT source, unnest(list_distinct(list_transform(
      |           generate_series(1, len(toks) - 2),
      |           i -> array_to_string(toks[i:i+2], ' ')))) AS shingle
      |         FROM d)),
      |sizes AS (SELECT source, COUNT(*) AS n_sh FROM ss GROUP BY 1),
      |pairs AS (
      |  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS common
      |  FROM ss a JOIN ss b
      |    ON a.shingle = b.shingle AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT p.source_a, p.source_b, sa.n_sh AS n_a, sb.n_sh AS n_b, p.common,
      |  ROUND(CAST(p.common AS DOUBLE) / sa.n_sh, 6) AS containment_a,
      |  ROUND(CAST(p.common AS DOUBLE) / sb.n_sh, 6) AS containment_b
      |FROM pairs p
      |JOIN sizes sa ON sa.source = p.source_a
      |JOIN sizes sb ON sb.source = p.source_b""".stripMargin

  /** q155: positional-token template screen — for each of the first 10
    * token positions, how concentrated the corpus is at that position:
    * distinct tokens, the modal token (count-desc, then lexicographic —
    * a total order, so the mode is unique), and its share. Template /
    * boilerplate detection from the front of the document: generated or
    * scraped corpora show high top-share at low positions.
    *
    * Scale shape: row-local slice of the first ≤10 tokens (explode of a
    * bounded sequence — output ≤ 10 rows/doc regardless of length), one
    * (pos, token) shuffle with map-side combine, then a window over the
    * bounded pos domain to pick the mode.
    */
  def qPositionalTemplate(s: SparkSession, dir: String): DataFrame = {
    val posTok = t(s, dir, "documents")
      .select(split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= 1)
      .select(explode(expr(
        "transform(sequence(1, least(10, size(toks))), " +
          "p -> struct(p as pos, toks[p - 1] as token))")).as("pt"))
      .select(col("pt.pos"), col("pt.token"))
      .where(col("token") =!= "")
    val counts = posTok.groupBy(col("pos"), col("token"))
      .agg(count(lit(1)).as("c"))
      .persistTracked()
    val w = Window.partitionBy(col("pos"))
      .orderBy(col("c").desc, col("token").asc)
    counts
      .withColumn("rk", row_number().over(w))
      .withColumn("n_docs", sum(col("c")).over(Window.partitionBy(col("pos"))))
      .withColumn("n_distinct", count(lit(1)).over(Window.partitionBy(col("pos"))))
      .where(col("rk") === 1)
      .select(col("pos"), col("n_docs"), col("n_distinct"),
        col("token").as("top_token"),
        round(col("c").cast("double") / col("n_docs"), 6).as("top_share"))
  }

  val qPositionalTemplateSql: String =
    """WITH pt AS (
      |  SELECT p AS pos, toks[p] AS token FROM (
      |    SELECT toks, unnest(generate_series(1, least(10, len(toks)))) AS p
      |    FROM (SELECT string_split(text, ' ') AS toks FROM documents
      |          WHERE len(string_split(text, ' ')) >= 1))
      |  WHERE toks[p] <> ''),
      |c AS (SELECT pos, token, COUNT(*) AS c FROM pt GROUP BY 1, 2),
      |r AS (
      |  SELECT pos, token, c,
      |    row_number() OVER (PARTITION BY pos ORDER BY c DESC, token ASC) AS rk,
      |    CAST(SUM(c) OVER (PARTITION BY pos) AS BIGINT) AS n_docs,
      |    COUNT(*) OVER (PARTITION BY pos) AS n_distinct
      |  FROM c)
      |SELECT CAST(pos AS INTEGER) AS pos, n_docs, n_distinct,
      |  token AS top_token,
      |  ROUND(CAST(c AS DOUBLE) / n_docs, 6) AS top_share
      |FROM r WHERE rk = 1""".stripMargin

  /** q157: pairwise Jensen–Shannon divergence between source unigram
    * distributions — the symmetric, bounded ([0, ln 2]) drift measure
    * that completes the drift family: q107's chi-square tests a single
    * categorical column, q129's KS a single numeric one; JSD compares
    * whole token DISTRIBUTIONS, the standard "how different are these
    * two corpora" number in data-mixing work.
    *
    * Decomposition (the scale trick): JSD(P,Q) = ½Σp·ln p + ½Σq·ln q −
    * Σm·ln m with m = (p+q)/2. The first two sums are per-source
    * scalars, and for tokens in only one source m·ln m = (p/2)·ln(p/2)
    * is also a per-source sum — so the pair join needs only the
    * INTERSECTION of vocabularies (inner join on token), with the
    * single-source mass folded in via per-source scalars. No full-outer
    * join, no vocabulary union materialized per pair.
    *
    * Scale shape: one (source, token) count shuffle; the token-key self
    * join fans out to ≤ C(|sources|, 2) rows per token (domain-bounded);
    * scalars are a |sources|-row broadcast. Float determinism: p is one
    * IEEE division, each ln term rounds to DECIMAL(28,9) before the
    * partition-order-free decimal sum, identical op order both engines.
    */
  def qSourceJsd(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val p = t(s, dir, "documents")
      .select(col("source"), explode(toks(col("text"))).as("token"))
      .where(col("token") =!= "")
      .groupBy(col("source"), col("token")).agg(count(lit(1)).as("c"))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("source"))))
      .select(col("source"), col("token"),
        (col("c").cast("double") / col("n")).as("p"))
      .persistTracked()
    val scalars = p.groupBy(col("source")).agg(
      sum(round(col("p") * log(col("p")), 9).cast(DecimalType(28, 9)))
        .cast("double").as("e"),
      sum(round((col("p") / 2) * log(col("p") / 2), 9).cast(DecimalType(28, 9)))
        .cast("double").as("h"))
    val cross = p.as("a").join(p.as("b"),
        col("a.token") === col("b.token") && col("a.source") < col("b.source"))
      .select(col("a.source").as("source_a"), col("b.source").as("source_b"),
        ((col("a.p") + col("b.p")) / 2).as("m"),
        col("a.p").as("pa"), col("b.p").as("pb"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(sum(round(col("m") * log(col("m"))
          - (col("pa") / 2) * log(col("pa") / 2)
          - (col("pb") / 2) * log(col("pb") / 2), 9).cast(DecimalType(28, 9)))
        .cast("double").as("x"))
    val pairs = scalars.as("sa").join(scalars.as("sb"),
        col("sa.source") < col("sb.source"))
      .select(col("sa.source").as("source_a"), col("sb.source").as("source_b"),
        col("sa.e").as("ea"), col("sa.h").as("ha"),
        col("sb.e").as("eb"), col("sb.h").as("hb"))
    pairs.join(cross, Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"),
        round(lit(0.5) * col("ea") + lit(0.5) * col("eb")
          - (col("ha") + col("hb") + coalesce(col("x"), lit(0.0))), 6)
          .as("jsd_nats"))
  }

  val qSourceJsdSql: String =
    """WITH c AS (
      |  SELECT source, token, COUNT(*) AS c FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS token
      |    FROM documents)
      |  WHERE token <> '' GROUP BY source, token),
      |p AS (
      |  SELECT source, token,
      |    CAST(c AS DOUBLE) / SUM(c) OVER (PARTITION BY source) AS p
      |  FROM c),
      |s AS (
      |  SELECT source,
      |    CAST(CAST(SUM(CAST(round(p * ln(p), 9) AS DECIMAL(28,9)))
      |      AS VARCHAR) AS DOUBLE) AS e,
      |    CAST(CAST(SUM(CAST(round((p / 2) * ln(p / 2), 9) AS DECIMAL(28,9)))
      |      AS VARCHAR) AS DOUBLE) AS h
      |  FROM p GROUP BY source),
      |x AS (
      |  SELECT a.source AS source_a, b.source AS source_b,
      |    CAST(CAST(SUM(CAST(round(
      |        (a.p + b.p) / 2 * ln((a.p + b.p) / 2)
      |        - (a.p / 2) * ln(a.p / 2)
      |        - (b.p / 2) * ln(b.p / 2), 9) AS DECIMAL(28,9)))
      |      AS VARCHAR) AS DOUBLE) AS x
      |  FROM p a JOIN p b ON a.token = b.token AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT sa.source AS source_a, sb.source AS source_b,
      |  ROUND(0.5 * sa.e + 0.5 * sb.e
      |    - (sa.h + sb.h + COALESCE(x.x, 0.0)), 6) AS jsd_nats
      |FROM s sa JOIN s sb ON sa.source < sb.source
      |LEFT JOIN x ON x.source_a = sa.source AND x.source_b = sb.source""".stripMargin

  /** q158: token-frequency Gini coefficient per source — how
    * concentrated each source's token mass is on few types (0 = every
    * type equally common, →1 = one type dominates). The inequality
    * companion to q130's entropy: entropy measures effective vocabulary
    * size, Gini measures how lopsided the head is — the quick screen for
    * "this crawl is mostly one boilerplate phrase".
    *
    * Exactness: with counts sorted ascending, G = (2·Σi·cᵢ − (n+1)·Σcᵢ)
    * / (n·Σcᵢ) — every sum is exact BIGINT (ties give the same Σi·cᵢ
    * under any tie order, and the (c, token) sort is total anyway), so
    * the only float op is the final division.
    *
    * Scale shape: one (source, token) count shuffle, then a rank window
    * partitioned by source over the per-source vocabulary (bounded by
    * type count, not corpus size), then one bounded aggregate.
    */
  def qTokenGini(s: SparkSession, dir: String): DataFrame = {
    val counts = t(s, dir, "documents")
      .select(col("source"), explode(toks(col("text"))).as("token"))
      .where(col("token") =!= "")
      .groupBy(col("source"), col("token")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("c").asc, col("token").asc)
    counts.withColumn("rk", row_number().over(w))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_types"), sum(col("c")).as("n_tokens"),
        sum(col("rk") * col("c")).as("s1"))
      .select(col("source"), col("n_types"), col("n_tokens"),
        round((lit(2L) * col("s1") - (col("n_types") + 1) * col("n_tokens"))
            .cast("double")
          / (col("n_types") * col("n_tokens")).cast("double"), 6).as("gini"))
  }

  val qTokenGiniSql: String =
    """WITH c AS (
      |  SELECT source, token, COUNT(*) AS c FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS token
      |    FROM documents)
      |  WHERE token <> '' GROUP BY source, token),
      |r AS (
      |  SELECT source, c,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY c ASC, token ASC) AS rk
      |  FROM c),
      |a AS (
      |  SELECT source, COUNT(*) AS n_types,
      |    CAST(SUM(c) AS BIGINT) AS n_tokens,
      |    CAST(SUM(rk * c) AS BIGINT) AS s1
      |  FROM r GROUP BY source)
      |SELECT source, n_types, n_tokens,
      |  ROUND(CAST(2 * s1 - (n_types + 1) * n_tokens AS DOUBLE)
      |    / CAST(n_types * n_tokens AS DOUBLE), 6) AS gini
      |FROM a""".stripMargin

  /** q166: blocked sorted-neighborhood dedup candidates — the third
    * classic near-dup blocking family next to LSH (q48/q53) and banding
    * (q47): sort each block (first token) by a normalized 40-char text
    * prefix, pair each doc with its PREDECESSOR in that sort order
    * (window w=2; wider windows are lead(k) over the same sort), score
    * the pair by prefix edit distance, and keep the global top-100
    * closest with a full (distance, doc_a, doc_b) tiebreak. Sorted-
    * neighborhood catches near-dups whose difference is a mid-string
    * edit — the case token-set LSH is blind to when the edit changes
    * shingle sets little but simhash much.
    *
    * Scale shape: candidate count is EXACTLY n − #blocks (one pair per
    * adjacent slot), never quadratic; the sort is per-block inside one
    * hash-partitioned window (block cardinality = token vocabulary, so
    * partitions stay narrow), and levenshtein runs on 40-char keys —
    * bounded cost per row. Top-100 is TakeOrderedAndProject, no global
    * sort materializes.
    */
  def qSortedNeighbors(s: SparkSession, dir: String): DataFrame = {
    val keyed = t(s, dir, "documents").select(
      col("doc_id"),
      element_at(split(col("text"), " "), 1).as("block"),
      substring(lower(col("text")), 1, 40).as("k"))
    val w = Window.partitionBy(col("block")).orderBy(col("k"), col("doc_id"))
    keyed
      .withColumn("prev_id", lag(col("doc_id"), 1).over(w))
      .withColumn("prev_k", lag(col("k"), 1).over(w))
      .where(col("prev_id").isNotNull)
      .select(col("block"), col("prev_id").as("doc_a"), col("doc_id").as("doc_b"),
        levenshtein(col("prev_k"), col("k")).as("dist"))
      .orderBy(col("dist").asc, col("doc_a").asc, col("doc_b").asc)
      .limit(100)
  }

  val qSortedNeighborsSql: String =
    """WITH keyed AS (
      |  SELECT doc_id, string_split(text, ' ')[1] AS block,
      |    substr(lower(text), 1, 40) AS k
      |  FROM documents),
      |adj AS (
      |  SELECT block, doc_id, k,
      |    lag(doc_id) OVER w AS prev_id, lag(k) OVER w AS prev_k
      |  FROM keyed
      |  WINDOW w AS (PARTITION BY block ORDER BY k, doc_id))
      |SELECT block, prev_id AS doc_a, doc_id AS doc_b,
      |  CAST(levenshtein(prev_k, k) AS INT) AS dist
      |FROM adj WHERE prev_id IS NOT NULL
      |ORDER BY dist ASC, doc_a ASC, doc_b ASC LIMIT 100""".stripMargin

  /** q167: Burrows' Delta stylometric distance between sources — z-score
    * each source's relative frequency of the corpus's top-30 tokens
    * (per million, against the across-source mean/σ of that token), then
    * Delta(a,b) = mean |z_a − z_b|: the classic authorship-attribution
    * measure, here a source-provenance screen (two "different" feeds with
    * near-zero Delta are likely the same upstream corpus relabeled —
    * complementing q157's JSD, which weighs by mass where Delta
    * deliberately weighs every marker token equally).
    *
    * Float determinism: rel-freq f = round(c·10⁶/n, 6) (exact integers →
    * one IEEE multiply+divide); token μ/σ from decimal sums of f and
    * round(f², 6); z rounds to 6; the pair mean is a decimal sum of
    * round(|Δz|, 6). Never decimal×decimal.
    *
    * Scale shape: one corpus shuffle to (source, token) counts; top-30
    * selection is a TakeOrdered over the bounded vocabulary histogram;
    * everything after runs on the sources×30 grid (bounded), and the
    * pair join is over that same bounded frame keyed by token.
    */
  def qBurrowsDelta(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val tok = t(s, dir, "documents")
      .select(col("source"), explode(toks(col("text"))).as("token"))
    val cst = tok.groupBy(col("source"), col("token")).agg(count(lit(1)).as("c"))
      .persistTracked()
    val ns = cst.groupBy(col("source")).agg(sum(col("c")).as("n_s"))
    val top = cst.groupBy(col("token")).agg(sum(col("c")).as("c_tot"))
      .orderBy(col("c_tot").desc, col("token").asc).limit(30)
    val grid = ns.crossJoin(broadcast(top.select(col("token"))))
      .join(cst, Seq("source", "token"), "left")
      .na.fill(0L, Seq("c"))
      .withColumn("f", round(col("c").cast("double") * lit(1000000.0)
        / col("n_s").cast("double"), 6))
    val kdf = ns.agg(count(lit(1)).cast("double").as("k"))
    val stats = grid.crossJoin(broadcast(kdf)).groupBy(col("token")).agg(
      (sum(col("f").cast(DecimalType(18, 6))).cast("double") / max(col("k"))).as("mu"),
      (sum(round(col("f") * col("f"), 6).cast(DecimalType(28, 6))).cast("double")
        / max(col("k"))).as("q"))
      .withColumn("variance", col("q") - col("mu") * col("mu"))
      .where(col("variance") > 0.0)
    // Persisted: z is sources×30 rows (tiny), but its lineage is the whole
    // grid/stats pipeline over the cached cst — without the persist the
    // self-join below plans that lineage twice (TakeOrdered + two broadcast
    // builds each side). Released by the session owner (Bench/Verify
    // clearCache per query).
    val z = grid.join(broadcast(stats), Seq("token"))
      .select(col("source"), col("token"),
        round((col("f") - col("mu")) / sqrt(col("variance")), 6).as("z"))
      .persistTracked()
    z.as("a").join(z.as("b"),
        col("a.token") === col("b.token") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_markers"),
        round(sum(round(abs(col("a.z") - col("b.z")), 6)
          .cast(DecimalType(28, 6))).cast("double") / count(lit(1)), 6)
          .as("delta"))
  }

  val qBurrowsDeltaSql: String =
    """WITH tok AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
      |cst AS (SELECT source, token, COUNT(*) AS c FROM tok GROUP BY 1, 2),
      |ns AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_s FROM cst GROUP BY 1),
      |top AS (
      |  SELECT token FROM (
      |    SELECT token, SUM(c) AS c_tot FROM cst GROUP BY token)
      |  ORDER BY c_tot DESC, token ASC LIMIT 30),
      |grid AS (
      |  SELECT ns.source, top.token, ns.n_s, COALESCE(cst.c, 0) AS c,
      |    round(CAST(COALESCE(cst.c, 0) AS DOUBLE) * 1000000.0
      |      / CAST(ns.n_s AS DOUBLE), 6) AS f
      |  FROM ns CROSS JOIN top
      |  LEFT JOIN cst ON cst.source = ns.source AND cst.token = top.token),
      |k AS (SELECT CAST(COUNT(*) AS DOUBLE) AS k FROM ns),
      |stats AS (
      |  SELECT token,
      |    CAST(CAST(SUM(CAST(f AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
      |      / MAX(k.k) AS mu,
      |    CAST(CAST(SUM(CAST(round(f * f, 6) AS DECIMAL(28,6))) AS VARCHAR)
      |      AS DOUBLE) / MAX(k.k) AS q
      |  FROM grid CROSS JOIN k GROUP BY token),
      |st AS (
      |  SELECT token, mu, q - mu * mu AS variance FROM stats
      |  WHERE q - mu * mu > 0.0),
      |z AS (
      |  SELECT g.source, g.token,
      |    round((g.f - st.mu) / sqrt(st.variance), 6) AS z
      |  FROM grid g JOIN st ON st.token = g.token)
      |SELECT a.source AS source_a, b.source AS source_b,
      |  COUNT(*) AS n_markers,
      |  ROUND(CAST(CAST(SUM(CAST(round(abs(a.z - b.z), 6) AS DECIMAL(28,6)))
      |    AS VARCHAR) AS DOUBLE) / COUNT(*), 6) AS delta
      |FROM z a JOIN z b ON a.token = b.token AND a.source < b.source
      |GROUP BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q166_sorted_neighbors" -> (qSortedNeighbors _),
    "q167_burrows_delta" -> (qBurrowsDelta _),
    "q154_source_overlap" -> (qSourceOverlap _),
    "q155_positional_template" -> (qPositionalTemplate _),
    "q157_source_jsd" -> (qSourceJsd _),
    "q158_token_gini" -> (qTokenGini _),
    "q150_lsh_threshold_sweep" -> (qLshThresholdSweep _),
    "q152_weighted_median_len" -> (qWeightedMedianLen _),
    "q143_minhash_error_audit" -> (qMinhashErrorAudit _),
    "q146_dedup_survivors" -> (qDedupSurvivors _),
    "q140_corpus_card" -> (qCorpusCard _),
    "q139_bigram_pmi" -> (qBigramPmi _),
    "q131_bpe_merge_step" -> (qBpeMergeStep _),
    "q130_source_entropy" -> (qSourceEntropy _),
    "q103_heavy_hitters" -> (qHeavyHitters _),
    "q105_dup_source_matrix" -> (qDupSourceMatrix _),
    "q106_length_filter" -> (qLengthFilter _),
    "q107_chisq_drift" -> (qChisqDrift _),
    "q108_weighted_sample" -> (qWeightedSample _),
    "q109_shuffle_shards" -> (qShuffleShards _),
    "q100_regex_tokens" -> (qRegexTokens _),
    "q101_winnow_fingerprint" -> (qWinnowFingerprint _),
    "q96_stopword_scrub" -> (qStopwordScrub _),
    "q97_mixture_weights" -> (qMixtureWeights _),
    "q98_sequence_pack" -> (qSequencePack _),
    "q99_zipf_slope" -> (qZipfSlope _),
    "q93_unigram_xent" -> (qUnigramXent _),
    "q119_bigram_xent" -> (qBigramXent _),
    "q95_decontaminate" -> (qDecontaminate _),
    "q89_repetition_stats" -> (qRepetitionStats _),
    "q90_boilerplate_ngrams" -> (qBoilerplateNgrams _),
    "q40_dedup_exact" -> (qDedupExact _),
    "q41_token_freq" -> (qTokenFreq _),
    "q42_doc_quality" -> (qDocQuality _),
    "q43_lang_stats" -> (qLangStats _),
    "q44_fingerprint" -> (qFingerprint _),
    "q45_shingle_stats" -> (qShingleStats _),
    "q46_langid" -> (qLangId _),
    "q47_simhash" -> (qSimhashBands _),
    "q48_minhash" -> (qMinhashBands _),
    "q49_jaccard_top_pairs" -> (qJaccardTopPairs _),
    "q50_approx_distinct" -> (qApproxDistinct _),
    "q55_simhash_near_dups" -> (qSimhashNearDupPairs _),
    "q56_minhash_candidates" -> (qMinhashCandidatePairs _),
    "q59_tfidf_top_terms" -> (qTfidfTopTerms _),
    "q73_hash_sample" -> (qHashSample _),
    "q82_stratified_sample" -> (qStratifiedSample _),
    "q85_dup_clusters" -> (qDupClusters _))

  val oracle: Map[String, String] = Map(
    "q50_approx_distinct" -> qApproxDistinctSql,
    "q166_sorted_neighbors" -> qSortedNeighborsSql,
    "q167_burrows_delta" -> qBurrowsDeltaSql,
    "q154_source_overlap" -> qSourceOverlapSql,
    "q155_positional_template" -> qPositionalTemplateSql,
    "q157_source_jsd" -> qSourceJsdSql,
    "q158_token_gini" -> qTokenGiniSql,
    "q150_lsh_threshold_sweep" -> qLshThresholdSweepSql,
    "q152_weighted_median_len" -> qWeightedMedianLenSql,
    "q143_minhash_error_audit" -> qMinhashErrorAuditSql,
    "q146_dedup_survivors" -> qDedupSurvivorsSql,
    "q140_corpus_card" -> qCorpusCardSql,
    "q139_bigram_pmi" -> qBigramPmiSql,
    "q131_bpe_merge_step" -> qBpeMergeStepSql,
    "q130_source_entropy" -> qSourceEntropySql,
    "q103_heavy_hitters" -> qHeavyHittersSql,
    "q105_dup_source_matrix" -> qDupSourceMatrixSql,
    "q106_length_filter" -> qLengthFilterSql,
    "q107_chisq_drift" -> qChisqDriftSql,
    "q108_weighted_sample" -> qWeightedSampleSql,
    "q109_shuffle_shards" -> qShuffleShardsSql,
    "q100_regex_tokens" -> qRegexTokensSql,
    "q101_winnow_fingerprint" -> qWinnowFingerprintSql,
    "q96_stopword_scrub" -> qStopwordScrubSql,
    "q97_mixture_weights" -> qMixtureWeightsSql,
    "q98_sequence_pack" -> qSequencePackSql,
    "q99_zipf_slope" -> qZipfSlopeSql,
    "q93_unigram_xent" -> qUnigramXentSql,
    "q119_bigram_xent" -> qBigramXentSql,
    "q95_decontaminate" -> qDecontaminateSql,
    "q89_repetition_stats" -> qRepetitionStatsSql,
    "q90_boilerplate_ngrams" -> qBoilerplateNgramsSql,
    "q40_dedup_exact" -> qDedupExactSql,
    "q41_token_freq" -> qTokenFreqSql,
    "q42_doc_quality" -> qDocQualitySql,
    "q43_lang_stats" -> qLangStatsSql,
    "q44_fingerprint" -> qFingerprintSql,
    "q45_shingle_stats" -> qShingleStatsSql,
    "q46_langid" -> qLangIdSql,
    "q47_simhash" -> qSimhashBandsSql,
    "q48_minhash" -> qMinhashBandsSql,
    "q49_jaccard_top_pairs" -> qJaccardTopPairsSql,
    "q55_simhash_near_dups" -> qSimhashNearDupPairsSql,
    "q56_minhash_candidates" -> qMinhashCandidatePairsSql,
    "q59_tfidf_top_terms" -> qTfidfTopTermsSql,
    "q73_hash_sample" -> qHashSampleSql,
    "q82_stratified_sample" -> qStratifiedSampleSql,
    "q85_dup_clusters" -> qDupClustersSql)
}
