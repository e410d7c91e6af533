package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal
import graft.sources.TableCatalog

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("media table carries byte-exact payloads with typed metadata") {
    val docs = TableCatalog.load(spark, TestSpark.sfDir, "documents")
    val media = Multimodal.asMediaTable(docs, "doc_id", "text", "text/plain")
    val row = media.filter(_.asset_id == 0L).head()
    assert(row.media_type == "text/plain")
    assert(row.n_bytes == row.payload.length)
  }

  test("decode stub is deterministic and partition-shape independent") {
    val docs = TableCatalog.load(spark, TestSpark.sfDir, "documents")
    val media = Multimodal.asMediaTable(docs, "doc_id", "text", "text/plain")
    val f1 = Multimodal.decodeFeatures(media)
      .collect().map(f => f.asset_id -> f.features.toSeq).toMap
    val f2 = Multimodal.decodeFeatures(media, targetPartitions = 7)
      .collect().map(f => f.asset_id -> f.features.toSeq).toMap
    assert(f1 == f2, "features must not depend on partitioning")
    assert(f1.values.forall(_.length == 4))
  }

  test("byte-budget task sizing: partitions track total payload bytes") {
    val docs = TableCatalog.load(spark, TestSpark.sfDir, "documents")
    val media = Multimodal.asMediaTable(docs, "doc_id", "text", "text/plain")
    val total = media.collect().map(_.n_bytes).sum
    val p = Multimodal.partitionsForBytes(media, targetBytesPerPartition = 10000)
    assert(p == ((total + 9999) / 10000).toInt, s"p=$p total=$total")
    assert(Multimodal.partitionsForBytes(media, Long.MaxValue) == 1)
    assert(Multimodal.partitionsForBytes(media, 1, maxPartitions = 64) == 64)
    val sized = Multimodal.decodeFeaturesSized(media, 10000)
      .rdd.getNumPartitions
    assert(sized == p)
    // empty input sizes to one partition instead of NPEing on a null sum
    assert(Multimodal.partitionsForBytes(
      media.filter(_.asset_id < 0), 10000) == 1)
  }

  test("frame sampling emits strided payload chunks, byte-exact") {
    val spark2 = spark
    import spark2.implicits._
    val payload = Array.tabulate(2500)(_.toByte)
    val media = Seq(Multimodal.MediaRow(7L, "video/raw", 2500L, payload))
      .toDS()
    val frames = Multimodal.sampleFrames(media, frameBytes = 1000, stride = 2)
      .collect().sortBy(_.frame_idx)
    // chunks 0,1,2 (1000,1000,500 bytes); stride 2 keeps chunk 0 and 2
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2))
    assert(frames(0).frame.toSeq == payload.slice(0, 1000).toSeq)
    assert(frames(1).frame.toSeq == payload.slice(2000, 2500).toSeq)
  }

  test("resize scales dimensions into the box preserving aspect ratio") {
    val spark2 = spark
    import spark2.implicits._
    val feats = Seq(
      Multimodal.MediaFeatures(1L, "image/x", 10L, 640, 480, Array(0f)),
      Multimodal.MediaFeatures(2L, "image/x", 10L, 100, 50, Array(0f)),
      Multimodal.MediaFeatures(3L, "image/x", 10L, 0, 0, Array(0f)))
      .toDS()
    val out = Multimodal.resizeTo(feats, 320, 320)
      .select("asset_id", "out_width", "out_height")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(out(1L) == ((320, 240)), out(1L).toString)
    assert(out(2L) == ((100, 50)), "already inside the box stays unscaled")
    assert(out(3L) == ((1, 1)), "degenerate dims clamp to 1")
  }
}
