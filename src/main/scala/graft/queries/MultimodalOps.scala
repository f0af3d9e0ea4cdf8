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
      // The stub decoder's per-block modular byte fold IS SQL-expressible
      // (the corpus is ASCII, so bytes == code points), so even the decode
      // path gets an exact oracle. Features are floats of exact milliunits
      // (x/1000f, x < 1000): round(f*1000) recovers x losslessly, keeping
      // the aggregate in integer space — no float-summation-order risk.
      (s, dir) => {
        val media = MediaPipeline.toMediaFrame(
          t(s, dir, "documents").withColumn("payload", col("text").cast("binary")),
          "doc_id", "payload", "text")
        val feats = MediaPipeline.decodeFeatures(media, MediaPipeline.StubDecoder)
        feats.groupBy(col("media_id"))
          .agg(count(lit(1)).as("n_frames"),
            sum(round(element_at(col("feature"), 1).cast("double") * 1000)
              .cast("long")).as("sum_f0_milli"))
      },
      Some("""WITH b AS (
                SELECT doc_id, text, octet_length(encode(text)) AS n,
                       unnest(range(0, (octet_length(encode(text)) + 63) // 64)) AS bi
                FROM documents),
              f AS (
                SELECT doc_id, bi,
                  list_reduce(
                    list_prepend(17::BIGINT,
                      [ascii(substring(text, (bi*64 + p)::INT + 1, 1))::BIGINT
                       for p in range(0, least(64, n - bi*64), 8)]),
                    (acc, x) -> (acc * 31 + x) % 1000000007) % 1000 AS f0_milli
                FROM b)
              SELECT doc_id AS media_id, count(*) AS n_frames,
                     sum(f0_milli)::BIGINT AS sum_f0_milli
              FROM f GROUP BY 1"""),
      doc = "Multimodal: per-partition stub decode -> per-media frame features"),

    Q(
      "mm3_sampled_blocks",
      // frame sampling WITHOUT decode: every 4th 64-byte block reference
      // (MediaPipeline.sampleBlocks, pure built-ins) — the oracle
      // recomputes the sampled index set arithmetically.
      (s, dir) => {
        val media = MediaPipeline.toMediaFrame(
          t(s, dir, "documents").withColumn("payload", col("text").cast("binary")),
          "doc_id", "payload", "text")
        MediaPipeline.sampleBlocks(media, 4)
          .groupBy(col("media_id"))
          .agg(count(lit(1)).as("n_sampled"), sum(col("block_idx")).as("sum_idx"))
      },
      Some("""SELECT doc_id AS media_id, count(*) AS n_sampled,
              sum(bi)::BIGINT AS sum_idx
              FROM (SELECT doc_id,
                      unnest(range(0, greatest((octet_length(encode(text)) + 63) // 64, 1), 4)) AS bi
                    FROM documents)
              GROUP BY 1"""),
      doc = "Multimodal: stride-4 block sampling (decode-free frame selection)"),

    Q(
      "mm4_synthetic_decode",
      // REAL BINARY payloads (mm1–mm3 stand text bytes in for blobs; this
      // query runs the decode path over true non-ASCII binary):
      // MediaPipeline.syntheticPayload derives each payload as 16-byte
      // md5 blocks keyed on (doc_id, block) — codegen'd built-ins, so the
      // bytes are synthesized inside the scan stage exactly where a media
      // bucket read would sit. Sizes are deliberately skewed (every 97th
      // doc is a 4 KB "clip" among 128–496 B "thumbnails") so the
      // byte-budget repartition actually redistributes, then the stub
      // decoder folds each 64-byte block into 8 features per the
      // MediaDecoder contract. The oracle re-derives the identical byte
      // stream IN HEX SPACE (DuckDB agrees on md5) and replays the
      // modular fold on two of the eight feature lanes — the decode
      // arithmetic is checked end-to-end, not just row counts.
      (s, dir) => {
        def blocksOf(id: org.apache.spark.sql.Column) =
          when(id % 97 === 0, lit(256)).otherwise(lit(8) + id % 24)
        val src = t(s, dir, "documents").select(
          col("doc_id"),
          MediaPipeline.syntheticPayload(col("doc_id"), blocksOf(col("doc_id")))
            .as("payload"))
        val media = MediaPipeline.toMediaFrame(src, "doc_id", "payload", "synthetic")
        val sized = MediaPipeline.repartitionByBytes(media, 1L << 20)
        def fMilli(d: Int) =
          sum(round(element_at(col("feature"), d + 1).cast("double") * 1000)
            .cast("long"))
        MediaPipeline.decodeFeatures(sized, MediaPipeline.StubDecoder)
          .groupBy(col("media_id"))
          .agg(count(lit(1)).as("n_frames"),
            fMilli(0).as("sum_f0_milli"),
            fMilli(7).as("sum_f7_milli"))
          .withColumn("n_bytes", blocksOf(col("media_id")) * 16L)
      },
      Some("""WITH n AS (SELECT doc_id,
                  CASE WHEN doc_id % 97 = 0 THEN 256 ELSE 8 + doc_id % 24 END AS nb
                FROM documents),
              p AS (SELECT doc_id, nb * 16 AS n_bytes,
                  array_to_string([md5(doc_id::VARCHAR || ':' || i::VARCHAR)
                                   for i in range(0, nb)], '') AS hex
                FROM n),
              b AS (SELECT doc_id, n_bytes, hex,
                      unnest(range(0, (n_bytes + 63) // 64)) AS bi
                FROM p),
              f AS (SELECT doc_id, n_bytes,
                  list_reduce(list_prepend(17::BIGINT,
                    [('0x' || substr(hex, (bi*64 + j)*2 + 1, 2))::BIGINT
                     for j in range(0, least(64, n_bytes - bi*64), 8)]),
                    (acc, x) -> (acc*31 + x) % 1000000007) % 1000 AS f0_milli,
                  list_reduce(list_prepend(17::BIGINT,
                    [('0x' || substr(hex, (bi*64 + j)*2 + 1, 2))::BIGINT
                     for j in range(7, least(64, n_bytes - bi*64), 8)]),
                    (acc, x) -> (acc*31 + x) % 1000000007) % 1000 AS f7_milli
                FROM b)
              SELECT doc_id AS media_id, count(*) AS n_frames,
                sum(f0_milli)::BIGINT AS sum_f0_milli,
                sum(f7_milli)::BIGINT AS sum_f7_milli,
                max(n_bytes)::BIGINT AS n_bytes
              FROM f GROUP BY doc_id"""),
      doc = "Multimodal: end-to-end decode over true synthetic binary payloads"),

    Q(
      "mm5_chunk_dedup",
      (s, dir) => {
        // CHUNK-LEVEL STORAGE DEDUP over binary media (the object-store
        // capacity question a multimodal corpus asks before ingest: how
        // many bytes are actually NEW?): split every payload into fixed
        // 64-byte chunks, hash each chunk, and report the corpus-wide
        // dedup ledger — total vs distinct chunks, stored-vs-logical
        // bytes, dedup permille. Fixed-size chunking is the
        // deterministic baseline of the CDC (content-defined chunking)
        // family; the plan shape — explode to chunks inside the scan
        // stage, one map-side-combined hash aggregate, one single-row
        // summary — is identical for a rolling-hash chunker, which
        // would only change the boundary expression.
        //
        // Payload content is keyed on doc_id % 50 (50 distinct block
        // streams) while LENGTH stays per-doc skewed, so residue-mates
        // share prefixes and the dedup finds real cross-media repeats
        // at any sf — the stand-in for near-identical clips/re-encodes.
        // SCALE: chunk volume is linear in payload bytes; the only
        // data-sized shuffle carries (chunk-md5, partial count) with
        // map-side combine, and the summary is one row. At 100 TB the
        // exact distinct-chunk ledger is the point (it IS the dedup
        // index); a13's HLL sketch is the cheap-estimate alternative.
        def blocksOf(id: org.apache.spark.sql.Column) =
          when(id % 97 === 0, lit(256)).otherwise(lit(8) + id % 24)
        val src = t(s, dir, "documents").select(
          col("doc_id"),
          MediaPipeline.syntheticPayload(col("doc_id") % 50, blocksOf(col("doc_id")))
            .as("payload"))
        val media = MediaPipeline.toMediaFrame(src, "doc_id", "payload", "synthetic")
        // r15: chunk digests ride the graft_chunk_hashes kernel (one
        // JIT'd pass, reused digest) — the HOF form paid an interpreted
        // substring+md5 lambda per chunk; the old sequence/transform
        // tree stays documented in the kernel's contract comment
        val chunks = media
          .select(explode(call_function("graft_chunk_hashes", col("payload"))).as("c"))
          .select(col("c.h").as("h"), col("c.sz").as("sz"))
        chunks.groupBy(col("h"))
          .agg(count(lit(1)).as("copies"), max(col("sz")).as("sz"))
          .agg(
            sum(col("copies")).as("total_chunks"),
            count(lit(1)).as("distinct_chunks"),
            sum(col("copies") * col("sz")).as("logical_bytes"),
            sum(col("sz")).as("stored_bytes"))
          .select(col("total_chunks"), col("distinct_chunks"),
            col("logical_bytes"), col("stored_bytes"),
            floor((col("logical_bytes") - col("stored_bytes")) * 1000 /
              col("logical_bytes")).cast("long").as("dedup_permille"))
      },
      Some("""WITH n AS (SELECT doc_id,
                  CASE WHEN doc_id % 97 = 0 THEN 256 ELSE 8 + doc_id % 24 END AS nb
                FROM documents),
              p AS (SELECT doc_id, nb * 16 AS n_bytes,
                  array_to_string([md5((doc_id % 50)::VARCHAR || ':' || i::VARCHAR)
                                   for i in range(0, nb)], '') AS hex
                FROM n),
              c AS (SELECT substr(hex, ci*128 + 1, 128) AS h,
                      least(64, n_bytes - ci*64)::BIGINT AS sz
                FROM (SELECT doc_id, n_bytes, hex,
                        unnest(range(0, (n_bytes + 63) // 64)) AS ci
                      FROM p)),
              g AS (SELECT h, count(*)::BIGINT AS copies, max(sz)::BIGINT AS sz
                FROM c GROUP BY h)
              SELECT sum(copies)::BIGINT AS total_chunks,
                count(*)::BIGINT AS distinct_chunks,
                sum(copies * sz)::BIGINT AS logical_bytes,
                sum(sz)::BIGINT AS stored_bytes,
                floor((sum(copies * sz) - sum(sz)) * 1000.0 / sum(copies * sz))::BIGINT
                  AS dedup_permille
              FROM g"""),
      doc = "Multimodal: chunk-level storage dedup ledger over binary payloads")
  )
}
