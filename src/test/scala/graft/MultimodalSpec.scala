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
}
