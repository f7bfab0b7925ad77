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
      struct(col("source"), col("lang"), length(col("text")).cast("long").as("n_bytes"))
        .as("meta"))
      .as[MediaRecord]
  }

  /** STUB decoder: a real implementation would decode the payload
    * (image resize / audio resample / frame sample) and emit a feature
    * vector. This deterministic fake derives `dim` floats from payload
    * bytes so tests can assert exact reproducibility. Swap this function
    * for the real codec — the signature IS the integration contract.
    */
  def stubDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    var d = 0
    while (d < dim) { out(d) = out(d) / math.max(1, payload.length / dim); d += 1 }
    out
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

  /** Rows-only query surface: features + per-kind rollup of the extracted
    * signal (mean first component, total bytes) — proves the binary →
    * decode → aggregate path end-to-end.
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
}
