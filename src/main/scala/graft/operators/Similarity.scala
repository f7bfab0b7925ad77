package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import Relational.dsum

/** Similarity search over the `embeddings` table (Array[Float] vectors).
  *
  * Two paths, as a 100 TB design requires:
  *  - brute-force cosine top-k for an explicit (small) query set — cost is
  *    |queries| × N, linear in the corpus, queries broadcast;
  *  - LSH-bucketed candidate generation (random-hyperplane sign bands) for
  *    corpus-wide near-neighbor mining — never an all-pairs product; the
  *    only join is bucket-equality on band keys.
  *
  * All vector math is double-precision higher-order array expressions
  * (zip_with/aggregate) inside whole-stage codegen — no UDFs.
  */
object Similarity {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Sequential-fold double dot product of two float-array columns —
    * bit-reproducible at any parallelism (per-row computation). Interpreted
    * (higher-order functions don't codegen); kept as the composable
    * reference implementation that [[graft.functions.CosineSimilarity]]
    * must match bit-for-bit (asserted in SimilaritySpec).
    */
  def dotExpr(a: String, b: String): Column = expr(
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, x) -> acc + x)")

  def normExpr(a: String): Column = sqrt(dotExpr(a, a))

  /** Fused codegen cosine (custom Catalyst Expression, registered
    * per-session; identical numerics to dotExpr/normExpr composition).
    */
  private def cosineCol(s: SparkSession, a: String, b: String): Column = {
    graft.functions.GraftFunctions.register(s)
    call_function("cosine_similarity", col(a), col(b))
  }

  /** Brute-force cosine top-k: query vectors (vec_id < 10) broadcast against
    * the full corpus; rank per query with deterministic tiebreak.
    */
  def qAnnBruteForce(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val q = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val pairs = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("nvec"))
      .crossJoin(broadcast(q))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosineCol(s, "qvec", "nvec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  val qAnnBruteForceSql: String =
    """WITH q AS (SELECT vec_id AS query_id, embedding AS qvec
      |           FROM embeddings WHERE vec_id < 10),
      |p AS (
      |  SELECT q.query_id, e.vec_id AS neighbor_id,
      |    list_sum(list_transform(generate_series(1, len(q.qvec)),
      |      i -> CAST(q.qvec[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
      |    / (sqrt(list_sum(list_transform(generate_series(1, len(q.qvec)),
      |         i -> CAST(q.qvec[i] AS DOUBLE) * CAST(q.qvec[i] AS DOUBLE))))
      |     * sqrt(list_sum(list_transform(generate_series(1, len(e.embedding)),
      |         i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))))
      |    AS cosine
      |  FROM embeddings e, q WHERE e.vec_id <> q.query_id)
      |SELECT query_id,
      |  CAST(row_number() OVER (PARTITION BY query_id
      |       ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank,
      |  neighbor_id, cosine
      |FROM p QUALIFY rank <= 5""".stripMargin

  /** Per-label centroids via posexplode + decimal-exact component means —
    * the "multi-column avg" over a vector column; one shuffle on
    * (label, pos).
    */
  def qCentroids(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos0", "v")))
      .groupBy(col("label"), (col("pos0") + 1).cast("int").as("pos"))
      .agg((dsum(col("v").cast("double")) / count(lit(1))).as("centroid"),
        count(lit(1)).as("n_vectors"))

  val qCentroidsSql: String =
    """WITH x AS (
      |  SELECT label, CAST(generate_subscripts(embedding, 1) AS INTEGER) AS pos,
      |    unnest(embedding) AS v
      |  FROM embeddings)
      |SELECT label, pos,
      |  CAST(CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
      |    / COUNT(*) AS centroid,
      |  COUNT(*) AS n_vectors
      |FROM x GROUP BY 1, 2""".stripMargin

  private val Planes = 16 // 2 bands x 8 hyperplanes

  /** Deterministic pseudo-random hyperplanes: weight(plane, dim) derived
    * from xxhash64 — reproducible across runs and cluster sizes with no
    * driver-side RNG state.
    */
  def hyperplanes(s: SparkSession, dim: Int): DataFrame = {
    import s.implicits._
    (0 until Planes).flatMap(p => (0 until dim).map(d => (p, d)))
      .toDF("plane", "dim0")
      .withColumn("w",
        (xxhash64(lit("plane"), col("plane"), col("dim0")) % 1000001L).cast("double") / 1000000.0)
  }

  /** Random-hyperplane sign buckets: 2 band keys of 8 sign bits per vector.
    * posexplode ⋈ broadcast(planes) → per-(vec, plane) projection sign →
    * per-vec band keys. Linear work, one shuffle on vec_id.
    */
  def signBuckets(s: SparkSession, e: DataFrame, dim: Int): DataFrame = {
    val proj = e
      .select(col("vec_id"), col("label"), posexplode(col("embedding")).as(Seq("dim0", "v")))
      .join(broadcast(hyperplanes(s, dim)), Seq("dim0"))
      .groupBy(col("vec_id"), col("plane"))
      .agg(sum(col("v").cast("double") * col("w")).as("proj"))
      .withColumn("bit", when(col("proj") > 0, 1L).otherwise(0L))
    proj.groupBy(col("vec_id"))
      .agg(
        sum(when(col("plane") < 8, expr("shiftleft(bit, plane)")).otherwise(0L)).as("band0"),
        sum(when(col("plane") >= 8, expr("shiftleft(bit, plane - 8)")).otherwise(0L)).as("band1"))
  }

  /** LSH ANN: candidates share ≥1 sign-band bucket; exact cosine re-rank of
    * candidates only. Returns the top-k most similar candidate pairs.
    */
  def lshCandidatePairs(s: SparkSession, e: DataFrame): DataFrame = {
    val dim = 64
    val buckets = signBuckets(s, e, dim)
    val banded = buckets.select(col("vec_id"),
      explode(array(
        struct(lit(0).as("band"), col("band0").as("key")),
        struct(lit(1).as("band"), col("band1").as("key")))).as("bk"))
      .select(col("vec_id"), col("bk.band"), col("bk.key"))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .distinct()
  }

  /** LSH-bucketed near-neighbor mining: top-20 candidate pairs by exact
    * cosine (embedding-cosine near-dup surface; rows-only check, recall
    * validated in SimilaritySpec against brute force).
    */
  def qAnnLsh(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val vecs = e.select(col("vec_id"), col("embedding"))
    lshCandidatePairs(s, e)
      .join(vecs.select(col("vec_id").as("id_a"), col("embedding").as("va")), Seq("id_a"))
      .join(vecs.select(col("vec_id").as("id_b"), col("embedding").as("vb")), Seq("id_b"))
      .withColumn("cosine", cosineCol(s, "va", "vb"))
      .orderBy(col("cosine").desc, col("id_a").asc, col("id_b").asc)
      .limit(20)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Coarse-quantizer centroids as reassembled float vectors, one per
    * cluster id (here the `label` column; in a real corpus a clustering
    * pass produces it — the IVF mechanics are identical).
    */
  def centroidVectors(e: DataFrame): DataFrame =
    e.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("v").cast("double")).as("m"))
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, m))), x -> CAST(x.m AS FLOAT))")
        .as("cvec"))

  /** IVF-style ANN: queries rank the (tiny, broadcast) centroid table,
    * probe the nProbe nearest inverted lists, and re-rank ONLY those
    * lists' vectors exactly. Work = |queries| × (corpus/nClusters × nProbe)
    * instead of |queries| × corpus — the standard coarse-quantization
    * scale path next to LSH (q53).
    */
  def annIvf(s: SparkSession, e: DataFrame, k: Int = 5, nProbe: Int = 2): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val cents = centroidVectors(e)
    val q = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("cscore").desc, col("label").asc)
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("cscore", call_function("cosine_similarity", col("qvec"), col("cvec")))
      .withColumn("crank", row_number().over(probeW))
      .where(col("crank") <= nProbe)
      .select(col("query_id"), col("qvec"), col("label"))
    val cands = probes.join(e.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("nvec"), col("label")), Seq("label"))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", call_function("cosine_similarity", col("qvec"), col("nvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    cands.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  def qAnnIvf(s: SparkSession, dir: String): DataFrame =
    annIvf(s, t(s, dir, "embeddings"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q51_ann_brute_force" -> (qAnnBruteForce _),
    "q52_centroids" -> (qCentroids _),
    "q53_ann_lsh" -> (qAnnLsh _),
    "q54_ann_ivf" -> (qAnnIvf _))

  val oracle: Map[String, String] = Map(
    "q51_ann_brute_force" -> qAnnBruteForceSql,
    "q52_centroids" -> qCentroidsSql)
}
