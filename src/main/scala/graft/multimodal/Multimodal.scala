package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column plumbing: image/audio/video payloads as opaque binary
  * columns with typed metadata, and per-partition batch feature extraction.
  *
  * The Spark-side mechanics here are real and tested — schema, typed
  * Dataset encoders, partition-preserving mapPartitions batch shape,
  * downstream aggregation. The DECODE step is a deterministic STUB
  * ([[Multimodal.stubDecode]]): this container has no image/audio codecs,
  * so a real deployment swaps `stubDecode` for an actual decoder (JNI/
  * JavaCV/etc.) with the identical signature — nothing else changes.
  */
object Multimodal {

  final case class MediaMeta(source: String, lang: String, n_bytes: Long)
  final case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      features: Array[Float])

  /** Build a media table from `documents`: the text bytes stand in for an
    * encoded image/audio payload; metadata is typed, payload is opaque
    * binary (the schema a 100 TB multimodal lake would carry).
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      // deterministic kind assignment in lieu of a real modality column
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      struct(col("source"), col("lang"), octet_length(col("text")).cast("long").as("n_bytes"))
        .as("meta"))
      .as[MediaRecord]
  }

  /** STUB decoder: a real implementation would decode the payload
    * (image resize / audio resample / frame sample) and emit a feature
    * vector. This deterministic fake derives `dim` floats from payload
    * bytes so tests can assert exact reproducibility. Swap this function
    * for the real codec — the signature IS the integration contract.
    *
    * The arithmetic is integer-only until the final widening (per-lane
    * byte sums, integer division by the lane width), so every feature is
    * exactly representable in float32 and the whole decode → aggregate
    * path is re-derivable by the DuckDB oracle (q63) — no float-order
    * nondeterminism anywhere.
    */
  def stubDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Long](dim)
    var i = 0
    while (i < payload.length) {
      acc(i % dim) += (payload(i) & 0xff)
      i += 1
    }
    val div = math.max(1, payload.length / dim)
    Array.tabulate(dim)(d => (acc(d) / div).toFloat)
  }

  /** Batch feature extraction: one decoder invocation per partition
    * iterator (the Spark shape under which a real decoder amortizes model/
    * codec init per batch, like mapInPandas/mapInArrow batches). Narrow —
    * preserves partitioning, no shuffle.
    */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // per-partition init would go here (decoder/model load — stubbed)
      batch.map(r =>
        MediaFeatures(r.media_id, r.kind, r.meta.n_bytes, stubDecode(r.payload, dim)))
    }
  }

  /** Per-kind rollup of the extracted signal (first feature lane, total
    * bytes) — proves the binary → decode → aggregate path end-to-end.
    * Oracle-gated: [[stubDecode]] is integer arithmetic over the payload
    * bytes, so [[qMultimodalFeaturesSql]] re-derives the identical lane
    * values from the hex dump of the UTF-8 bytes in DuckDB.
    */
  def qMultimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    val feats = extractFeatures(mediaFromDocuments(Tables.load(s, dir, "documents"))).toDF()
    feats
      .select(col("kind"), col("n_bytes"), element_at(col("features"), 1).as("f0"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        graft.operators.Relational.dsum(col("f0").cast("double")).as("sum_f0"))
  }

  final case class FrameFeature(media_id: Long, kind: String, frame_no: Int, signature: Long)

  /** Frame sampling: slice each payload into fixed-size frames and keep
    * every `every`-th one, emitting ONE ROW PER SAMPLED FRAME — the 1→N
    * expansion shape of video processing (a real decoder samples keyframes;
    * the stub's frame signature is the frame's byte sum, integer-exact in
    * both engines). flatMap keeps it narrow: no shuffle until a consumer
    * aggregates, and a 100 TB video table fans out to frame rows without
    * ever materializing per-media state.
    */
  def sampleFrames(media: Dataset[MediaRecord], frameBytes: Int = 64,
      every: Int = 4): Dataset[FrameFeature] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val nFrames = r.payload.length / frameBytes
      (0 until nFrames).withFilter(_ % every == 0).map { f =>
        var s = 0L
        var i = f * frameBytes
        val end = i + frameBytes
        while (i < end) { s += (r.payload(i) & 0xff); i += 1 }
        FrameFeature(r.media_id, r.kind, f, s)
      }
    }
  }

  /** Per-kind rollup of the sampled-frame signal — proves the binary →
    * frame-sample → aggregate path end-to-end (q63's sibling for the 1→N
    * expansion). All integer math; oracle re-derives every sampled frame
    * from the hex dump.
    */
  def qFrameSample(s: SparkSession, dir: String): DataFrame = {
    val frames = sampleFrames(mediaFromDocuments(Tables.load(s, dir, "documents"))).toDF()
    frames.groupBy(col("kind"))
      .agg(count(lit(1)).as("n_frames"),
        sum(col("signature")).as("total_signature"),
        max(col("signature")).as("max_signature"))
  }

  /** DuckDB re-derivation of [[qFrameSample]]: frame f covers bytes
    * [64f+1, 64f+64] of the UTF-8 payload (hex digits 2p−1, 2p); sampled
    * frames are f ≡ 0 (mod 4) below the full-frame count. The signature
    * is a ROW-LOCAL list_sum over the frame's positions — not a per-byte
    * unnest + join + re-group, which computes the same value ~7× slower
    * (the anchor must not be flattered by a slow oracle spelling).
    */
  val qFrameSampleSql: String = {
    def hexv(pos: String) = graft.operators.TextOps.hexDigitSql("h", pos)
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CASE CAST(doc_id % 3 AS INTEGER)
       |      WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       |    lower(hex(encode(text))) AS h,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS n
       |  FROM documents),
       |fr AS (
       |  SELECT doc_id, kind, h,
       |    unnest(generate_series(0, n // 64 - 1, 4)) AS f
       |  FROM d WHERE n >= 64),
       |sig AS (
       |  SELECT doc_id, kind, f,
       |    CAST(list_sum(list_transform(generate_series(f * 64 + 1, f * 64 + 64),
       |      p -> 16 * ${hexv("2 * p - 1")} + ${hexv("2 * p")})) AS BIGINT)
       |      AS signature
       |  FROM fr)
       |SELECT kind, COUNT(*) AS n_frames,
       |  CAST(SUM(signature) AS BIGINT) AS total_signature,
       |  MAX(signature) AS max_signature
       |FROM sig GROUP BY kind""".stripMargin
  }

  /** DuckDB re-derivation of the stub decode's lane 0: byte p of the UTF-8
    * payload is hex digits (2p−1, 2p) of `hex(encode(text))`; lane 0 sums
    * bytes at 1-based positions 1, 9, 17, … and integer-divides by the lane
    * width — all integer math, identical in both engines.
    */
  val qMultimodalFeaturesSql: String = {
    def hexv(pos: String) = graft.operators.TextOps.hexDigitSql("d.h", pos)
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CASE CAST(doc_id % 3 AS INTEGER)
       |      WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       |    lower(hex(encode(text))) AS h,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS n
       |  FROM documents),
       |pos AS (
       |  SELECT doc_id, unnest(generate_series(1, n, 8)) AS p FROM d),
       |lane AS (
       |  SELECT pos.doc_id,
       |    SUM(16 * ${hexv("2 * pos.p - 1")} + ${hexv("2 * pos.p")}) AS lane0
       |  FROM pos JOIN d ON d.doc_id = pos.doc_id
       |  GROUP BY pos.doc_id),
       |f AS (
       |  SELECT d.doc_id, d.kind, d.n,
       |    CAST(COALESCE(lane.lane0, 0) // GREATEST(1, d.n // 8) AS DOUBLE) AS f0
       |  FROM d LEFT JOIN lane ON lane.doc_id = d.doc_id)
       |SELECT kind, COUNT(*) AS n_media, CAST(SUM(n) AS BIGINT) AS total_bytes,
       |  ${graft.operators.Relational.dsumSql("f0")} AS sum_f0
       |FROM f GROUP BY kind""".stripMargin
  }
}
