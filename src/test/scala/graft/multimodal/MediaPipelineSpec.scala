package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import MediaPipeline._

class MediaPipelineSpec extends SparkTestBase {

  private def mediaDf = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "hello world"),
      (2L, "x" * 200), // 200 bytes -> 4 blocks of 64 (last partial)
      (3L, "")
    ).toDF("id", "txt").withColumn("payload", col("txt").cast("binary"))
  }

  test("toMediaFrame computes metadata without decode") {
    val m = toMediaFrame(mediaDf, "id", "payload", "text")
    val rows = m.select(col("media_id"), col("meta.n_bytes"), col("meta.content_md5"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    assert(rows(0)._2 == 11L)
    // md5("hello world")
    assert(rows(0)._3 == "5eb63bbbe01eeed093cb22bb8f5acdc3")
    assert(rows(1)._2 == 200L)
    assert(rows(2)._2 == 0L)
  }

  test("StubDecoder emits one frame per 64-byte block with golden features") {
    val payload = Array.tabulate(130)(i => (i % 251).toByte) // 3 blocks
    val frames = StubDecoder.decode(7L, payload).toSeq
    assert(frames.map(_.frameIdx) == Seq(0, 1, 2))
    assert(frames.forall(_.mediaId == 7L))
    assert(frames.forall(_.feature.length == 8))
    // reference fold for block 0, dim 0: bytes 0,8,16,...,56
    var acc = 17L
    (0 until 64 by 8).foreach(i => acc = (acc * 31 + (payload(i) & 0xff)) % 1000000007L)
    assert(frames.head.feature(0) == (acc % 1000L).toFloat / 1000f)
    // last partial block: 130 - 128 = 2 bytes -> dims 0,1 fold one byte,
    // dims 2..7 stay at seed
    assert(frames(2).feature(7) == (17L % 1000L).toFloat / 1000f)
  }

  test("decodeFeatures runs the decoder per partition over the frame") {
    val feats = decodeFeatures(
      toMediaFrame(mediaDf, "id", "payload", "text"), StubDecoder)
    val byMedia = feats.groupBy(col("media_id")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(byMedia(1L) == 1L) // 11 bytes -> 1 block
    assert(byMedia(2L) == 4L) // 200 bytes -> 4 blocks
    assert(!byMedia.contains(3L)) // empty payload -> no frames
  }

  test("sampleBlocks keeps every stride-th block reference") {
    val m = toMediaFrame(mediaDf, "id", "payload", "text")
    val sampled = sampleBlocks(m, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // media 2: 200 bytes -> blocks 0..3 -> sampled 0, 2
    assert(sampled.contains((2L, 0L)) && sampled.contains((2L, 2L)))
    assert(!sampled.contains((2L, 1L)) && !sampled.contains((2L, 3L)))
  }

  test("repartitionByBytes sizes partitions by payload bytes") {
    val m = toMediaFrame(mediaDf, "id", "payload", "text")
    // 211 total bytes at a 100-byte budget -> 2 partitions
    assert(repartitionByBytes(m, 100L).rdd.getNumPartitions == 2)
  }
}
