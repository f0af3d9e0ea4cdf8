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

  test("syntheticPayload emits deterministic true-binary md5 blocks") {
    val s = spark
    import s.implicits._
    val df = Seq(5L, 9L).toDF("id")
      .select(col("id"), syntheticPayload(col("id"), lit(3)).as("payload"))
    val rows = df.collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
      .sortBy(_._1).toSeq
    // 3 blocks x 16 bytes, and block 0 of id=5 IS unhex(md5("5:0"))
    assert(rows.forall(_._2.length == 48))
    val md5_5_0 = java.security.MessageDigest.getInstance("MD5")
      .digest("5:0".getBytes("UTF-8"))
    assert(rows.head._2.take(16).toSeq == md5_5_0.toSeq)
    // genuinely non-ASCII binary (a text-cast column can't produce this)
    assert(rows.exists(_._2.exists(b => (b & 0xff) > 127)))
    // deterministic across evaluations
    val again = df.collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
      .sortBy(_._1).toSeq
    assert(rows.map(_._2.toSeq) == again.map(_._2.toSeq))
  }

  test("synthetic payloads flow through decode with the block contract") {
    val s = spark
    import s.implicits._
    val media = toMediaFrame(
      Seq(1L, 2L).toDF("id")
        .select(col("id"), syntheticPayload(col("id"), lit(9)).as("payload")),
      "id", "payload", "synthetic")
    // 9 blocks x 16 = 144 bytes -> ceil(144/64) = 3 decode frames
    val frames = decodeFeatures(media, StubDecoder)
      .groupBy(col("media_id")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(frames == Map(1L -> 3L, 2L -> 3L))
  }
}
