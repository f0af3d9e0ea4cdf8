package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads ride as opaque `binary` columns with a typed metadata
  * struct; decode / feature-extraction runs per-partition behind a
  * [[MediaDecoder]] interface.
  *
  * The container has no image/audio codecs, so the shipped decoder is a
  * clearly-marked DETERMINISTIC STUB ([[StubDecoder]]) — the Spark-side
  * contract (schema, batch shape, partition sizing, metadata extraction)
  * is the real, tested surface; swapping in a JNI/JavaCV decoder is a
  * one-class change.
  *
  * Scale design: payload rows are wide (MBs), so operators here
  * repartition BY BYTE BUDGET, not row count — a fixed per-partition byte
  * budget keeps executor memory flat whether payloads are 10 KB thumbnails
  * or 100 MB clips.
  */
object MediaPipeline {

  /** Canonical media record shape. */
  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("media_type", StringType),
      StructField("n_bytes", LongType),
      StructField("content_md5", StringType))))))

  /** Wrap an id + binary payload into the canonical shape; metadata is
    * computed with codegen'd built-ins (no decode needed for routing,
    * dedup, or size accounting).
    */
  def toMediaFrame(df: DataFrame, idCol: String, payloadCol: String, mediaType: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("payload"),
      struct(
        lit(mediaType).as("media_type"),
        length(col(payloadCol).cast("binary")).cast("long").as("n_bytes"),
        md5(col(payloadCol).cast("binary")).as("content_md5")).as("meta"))

  /** Repartition so each partition holds ~`bytesPerPartition` of payload:
    * count bytes cheaply, derive the partition count, hash-distribute.
    * At 100 TB this is the difference between a flat memory profile and
    * an OOM on the first skewed shard.
    */
  def repartitionByBytes(media: DataFrame, bytesPerPartition: Long): DataFrame = {
    // sum() over zero rows is NULL → coalesce to 0 and leave an empty
    // frame untouched (a getLong on the null cell would NPE)
    val totalBytes =
      media.agg(coalesce(sum(col("meta.n_bytes")), lit(0L))).head.getLong(0)
    if (totalBytes == 0L) media
    else {
      val parts = math.max(1, (totalBytes / bytesPerPartition).toInt)
      media.repartition(parts, col("media_id"))
    }
  }

  /** One decoded unit (an image, an audio window, a sampled frame). */
  final case class DecodedFeature(
      mediaId: Long,
      frameIdx: Int,
      feature: Array[Float])

  /** Decode interface — the only non-built-in surface. Implementations
    * must be serializable (instantiated per executor, reused per
    * partition).
    */
  trait MediaDecoder extends Serializable {
    def decode(mediaId: Long, payload: Array[Byte]): Iterator[DecodedFeature]
  }

  /** DETERMINISTIC STUB decoder (no codecs in this environment): emits one
    * fake "frame" per 64-byte block (as a real frame-sampler would emit one
    * per GOP), each with an 8-dim feature folded from the block bytes in
    * modular arithmetic (no overflow — reproducible on any platform).
    * Replace with a real codec-backed implementation in production.
    */
  object StubDecoder extends MediaDecoder {
    private val M = 1000000007L
    override def decode(mediaId: Long, payload: Array[Byte]): Iterator[DecodedFeature] =
      payload.grouped(64).zipWithIndex.map { case (block, idx) =>
        val feat = Array.tabulate(8) { d =>
          var acc = 17L
          var i = d
          while (i < block.length) { acc = (acc * 31 + (block(i) & 0xff)) % M; i += 8 }
          (acc % 1000L).toFloat / 1000f
        }
        DecodedFeature(mediaId, idx, feat)
      }
  }

  /** Distributed decode: per-partition iteration through the decoder —
    * the Scala analogue of `mapInPandas` batch processing. Input stays
    * columnar until here; output is a narrow typed frame ready for the
    * embedding/similarity operators.
    */
  def decodeFeatures(media: DataFrame, decoder: MediaDecoder): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) => decoder.decode(id, payload) })
      .toDF("mediaId", "frameIdx", "feature")
      .select(
        col("mediaId").as("media_id"),
        col("frameIdx").as("frame_idx"),
        col("feature"))
  }

  /** Frame sampling without decode: keep every `stride`-th 64-byte block
    * reference (media_id, block_idx) — pure built-ins, no UDF; the decode
    * step then touches only sampled blocks.
    */
  def sampleBlocks(media: DataFrame, stride: Int): DataFrame =
    media.select(
      col("media_id"),
      explode(sequence(lit(0),
        greatest(ceil(col("meta.n_bytes") / 64d).cast("long") - 1, lit(0)),
        lit(stride.toLong))).as("block_idx"))

  /** Deterministic synthetic BINARY payload for an id column: `nBlocks`
    * 16-byte blocks, block i = unhex(md5(id || ':' || i)) — true
    * non-ASCII bytes, reproducible on any engine that agrees on md5 (so
    * an external oracle can re-derive the exact byte stream in hex
    * space). This is the test-scale stand-in for reading a real media
    * bucket: everything downstream of [[toMediaFrame]] — byte-budget
    * repartitioning, the decoder iteration contract, block sampling —
    * exercises the same code path a codec-backed payload would.
    *
    * Pure codegen'd built-ins (sequence → transform → concat_ws →
    * unhex), so payload synthesis runs inside the scan's
    * WholeStageCodegen span — no UDF, no driver data.
    */
  def syntheticPayload(id: Column, nBlocks: Column): Column =
    call_function("graft_synth_payload", id.cast("long"), nBlocks.cast("int"))

  /** HOF spec for [[syntheticPayload]] (`graft_synth_payload` kernel
    * parity is asserted against this in NativeTextExpressionsSpec): the
    * raw md5 digest IS unhex(md5hex), so the kernel emits digests
    * directly instead of paying an interpreted per-block lambda plus a
    * hex round-trip.
    */
  def syntheticPayloadHof(id: Column, nBlocks: Column): Column =
    unhex(concat_ws("",
      transform(sequence(lit(0), nBlocks.cast("int") - 1),
        i => md5(concat(id.cast("string"), lit(":"), i.cast("string"))))))
}
