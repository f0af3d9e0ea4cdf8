package graft.queries

import org.apache.spark.sql.functions._

import graft.multimodal.MediaPipeline
import Tables.t

/** Multimodal-column operators: binary payload plumbing over the
  * `documents` table standing in for media blobs (this environment ships
  * no codecs — the decode step is MediaPipeline.StubDecoder, a documented
  * deterministic fake; the schema/partitioning/batch plumbing is real).
  */
object MultimodalOps {

  def qs: Seq[Q] = Seq(
    Q(
      "mm1_media_metadata",
      (s, dir) => {
        val media = MediaPipeline.toMediaFrame(
          t(s, dir, "documents").withColumn("payload", col("text").cast("binary")),
          "doc_id", "payload", "text")
        media.select(
          col("media_id"),
          col("meta.media_type").as("media_type"),
          col("meta.n_bytes").as("n_bytes"),
          col("meta.content_md5").as("content_md5"))
      },
      Some("""SELECT doc_id AS media_id, 'text' AS media_type,
              octet_length(encode(text)) AS n_bytes,
              md5(text) AS content_md5
              FROM documents"""),
      doc = "Multimodal: binary payload metadata (size + content hash, no decode)"),

    Q(
      "mm2_decode_features",
      // no SQL oracle: the stub decoder's per-block byte fold is
      // Scala-side; covered by MediaPipelineSpec golden values instead.
      // Aggregate so the result is small and stable at any scale factor.
      (s, dir) => {
        val media = MediaPipeline.toMediaFrame(
          t(s, dir, "documents").withColumn("payload", col("text").cast("binary")),
          "doc_id", "payload", "text")
        val feats = MediaPipeline.decodeFeatures(media, MediaPipeline.StubDecoder)
        feats.groupBy(col("media_id"))
          .agg(count(lit(1)).as("n_frames"),
            sum(element_at(col("feature"), 1).cast("double")).as("sum_f0"))
      },
      None,
      doc = "Multimodal: per-partition stub decode -> per-media frame features")
  )
}
