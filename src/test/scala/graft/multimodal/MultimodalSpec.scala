package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import Multimodal._

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("media table: opaque binary payload + typed metadata schema") {
    val media = mediaFromDocuments(Tables.load(spark, dir, "documents"))
    val schema = media.toDF().schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    val first = media.head()
    assert(first.meta.n_bytes == first.payload.length)
    assert(Set("image", "audio", "video").contains(first.kind))
  }

  test("feature extraction is deterministic, batch-shaped, partition-preserving") {
    val media = mediaFromDocuments(Tables.load(spark, dir, "documents")).repartition(4)
    val f1 = extractFeatures(media)
    assert(f1.rdd.getNumPartitions == 4) // narrow op: no shuffle
    val a = f1.collect().map(r => r.media_id -> r.features.toSeq).toMap
    val b = extractFeatures(media).collect().map(r => r.media_id -> r.features.toSeq).toMap
    assert(a == b)
    assert(a.values.forall(_.length == 8))
    assert(a.values.forall(_.forall(v => v >= 0 && !v.isNaN)))
  }

  test("frame sampling: 1->N expansion, every 4th frame, signatures recomputable") {
    val media = mediaFromDocuments(Tables.load(spark, dir, "documents")).repartition(4)
    val frames = sampleFrames(media)
    assert(frames.rdd.getNumPartitions == 4) // flatMap is narrow
    val byMedia = frames.collect().groupBy(_.media_id)
    val payloads = media.collect().map(r => r.media_id -> r.payload).toMap
    assert(byMedia.nonEmpty)
    byMedia.foreach { case (id, fs) =>
      val payload = payloads(id)
      val nFrames = payload.length / 64
      val expected = (0 until nFrames).count(_ % 4 == 0)
      assert(fs.length == expected, s"media $id: ${fs.length} != $expected frames")
      fs.foreach { f =>
        assert(f.frame_no % 4 == 0)
        val sig = payload.slice(f.frame_no * 64, f.frame_no * 64 + 64)
          .map(b => (b & 0xff).toLong).sum
        assert(f.signature == sig)
      }
    }
  }

  test("binary -> decode -> aggregate query runs end-to-end per kind") {
    val out = Multimodal.qMultimodalFeatures(spark, dir).collect()
    assert(out.map(_.getString(0)).toSet == Set("image", "audio", "video"))
    assert(out.map(_.getAs[Long]("n_media")).sum == 500)
    assert(out.forall(_.getAs[Double]("sum_f0") > 0))
  }
}
