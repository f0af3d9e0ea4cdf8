package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import Tables.t

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * Three paths, as a production pipeline would ship them, plus the recall
  * harness that keeps them honest:
  *  - `sim1_brute_topk`: exact cosine top-k — the correctness baseline.
  *    The query set is tiny and broadcast; the candidate scan is a single
  *    narrow pass, ranking is a per-query window. At 100 TB this is the
  *    "re-rank the candidates" kernel, not the full-corpus path.
  *  - `sim2_lsh_ann`: banded random-hyperplane LSH — the full-corpus scale
  *    path. Bucketing is a narrow map + one shuffle; only bucket-mates are
  *    scored. Recall tunes with bands x planes.
  *  - `sim3_ivf_ann`: inverted-file index — the other production scale
  *    path. A small coarse quantizer partitions the corpus into cells;
  *    queries probe their `nprobe` nearest cells and score only those
  *    members. At 100 TB the cell id is the table's partition key, so a
  *    probe is a partition-pruned scan, not a shuffle.
  *  - `sim4_ann_recall`: per-query recall@k of both ANN paths against the
  *    brute-force truth — the quality metric an ANN deployment monitors
  *    when tuning bands/planes/nprobe.
  *
  * All scores are computed over integer-quantized vectors (see
  * VectorFunctions) so both engines produce bit-identical doubles.
  */
object SimilarityOps {

  private val QuerySetSql = "vec_id < 10"
  private val K = 5
  // IVF coarse quantizer: cells seeded from corpus vectors 10..17 — a
  // deterministic stand-in for k-means training (centroid CHOICE only
  // affects recall, never correctness of the in-cell exact scoring)
  private val CentSetSql = "vec_id >= 10 AND vec_id < 18"
  private val NProbe = 2

  /** Exact top-k per query as a two-phase rank. A single window
    * partitioned by query_id alone caps parallelism at the query-batch
    * size and routes each query's ENTIRE candidate list through one task
    * (corpus-sized for the brute-force path). Phase 1 ranks within
    * (query_id, hash(vec_id)%64) shards — a query-wide top-k row is
    * top-k within its own shard, so the shard winners are a superset of
    * the answer — and phase 2 re-ranks the ≤64·k survivors per query.
    * Output is identical to the one-window form (same total order).
    */
  private def topkPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val ord = Seq(col("cosine").desc, col("vec_id"))
    val w1 = Window.partitionBy(col("query_id"), pmod(hash(col("vec_id")), lit(64)))
      .orderBy(ord: _*)
    val w = Window.partitionBy(col("query_id")).orderBy(ord: _*)
    scored.withColumn("__r1", row_number().over(w1)).filter(col("__r1") <= k)
      .drop("__r1")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Exact brute-force cosine top-k (sim1; also sim4's ground truth). */
  private def bruteTopk(s: SparkSession, dir: String): DataFrame = {
    // norms are computed per VECTOR (narrow map before the join), not
    // per pair — scoring is one dot + one divide, same expression
    // order as cosineQ so the doubles stay bit-identical
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), quantizeN(col("embedding")).as("q"))
      .withColumn("nrm", sqrt(dotQN(col("q"), col("q")).cast("double")))
    val queries = e.filter(expr(QuerySetSql))
      .select(col("vec_id").as("query_id"), col("q").as("qq"), col("nrm").as("qn"))
    val cands = e.filter(!expr(QuerySetSql))
    val scored = cands.crossJoin(broadcast(queries))
      .select(col("query_id"), col("vec_id"),
        (dotQN(col("qq"), col("q")).cast("double") /
          (col("qn") * col("nrm"))).as("cosine"))
    topkPerQuery(scored, K)
  }

  /** Banded hyperplane LSH top-k (sim2): score only bucket-mates. */
  private def lshTopk(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), quantizeN(col("embedding")).as("q"))
      .withColumn("nrm", sqrt(dotQN(col("q"), col("q")).cast("double")))
      .withColumn("band_key", explode(call_function("graft_lsh_bands",
        col("q"), lit(4), lit(4), lit(64))))
    val queries = e.filter(expr(QuerySetSql))
      .select(col("band_key"), col("vec_id").as("query_id"),
        col("q").as("qq"), col("nrm").as("qn"))
    val cands = e.filter(!expr(QuerySetSql))
    val scored = cands.join(queries, Seq("band_key"))
      .select(col("query_id"), col("vec_id"),
        (dotQN(col("qq"), col("q")).cast("double") /
          (col("qn") * col("nrm"))).as("cosine"))
      .distinct()
    topkPerQuery(scored, K)
  }

  /** Nearest `keep` cells per vector by quantized cosine against a
    * (cent_id, cq, cn) centroid frame — the probe/assignment kernel the
    * fixed-seed IVF (sim3) and the trained IVF (sim5) share.
    */
  private def nearestCells(side: DataFrame, cents: DataFrame, keep: Int): DataFrame = {
    val scored = side.crossJoin(cents)
      .select(col("vec_id"), col("q"), col("nrm"), col("cent_id"),
        (dotQN(col("q"), col("cq")).cast("double") /
          (col("nrm") * col("cn"))).as("ccos"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cent_id"))
    scored.withColumn("crank", row_number().over(w))
      .filter(col("crank") <= keep)
  }

  /** IVF nprobe top-k (sim3): broadcast coarse quantizer, per-cell exact
    * scoring inside the probed cells only.
    */
  private def ivfTopk(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), quantizeN(col("embedding")).as("q"))
      .withColumn("nrm", sqrt(dotQN(col("q"), col("q")).cast("double")))
    val cents = broadcast(e.filter(expr(CentSetSql))
      .select(col("vec_id").as("cent_id"), col("q").as("cq"), col("nrm").as("cn")))
    val assigned = nearestCells(e.filter(!expr(QuerySetSql)), cents, 1)
      .select(col("cent_id"), col("vec_id"), col("q"), col("nrm"))
    val probes = nearestCells(e.filter(expr(QuerySetSql)), cents, NProbe)
      .select(col("cent_id"), col("vec_id").as("query_id"),
        col("q").as("qq"), col("nrm").as("qn"))
    // probes are |queryset| x nprobe rows BY CONSTRUCTION — broadcast
    // explicitly (post-window stats are unknown, so without the hint the
    // pre-AQE plan sort-merges the whole assigned corpus on cent_id)
    val scored = assigned.join(broadcast(probes), Seq("cent_id"))
      .select(col("query_id"), col("vec_id"),
        (dotQN(col("qq"), col("q")).cast("double") /
          (col("qn") * col("nrm"))).as("cosine"))
      .distinct() // a vector probed via both cells scores once
    topkPerQuery(scored, K)
  }

  // ---- oracle SQL (composed into sim4's oracle as CTE bodies) ----------

  private val Sim1Sql =
    s"""WITH e AS (SELECT vec_id,
          list_transform(embedding, x -> round(x::DOUBLE*1000)::BIGINT) AS q
          FROM embeddings),
        scored AS (SELECT qs.vec_id AS query_id, c.vec_id,
          list_dot_product(qs.q, c.q) /
          (sqrt(list_dot_product(qs.q, qs.q)) * sqrt(list_dot_product(c.q, c.q))) AS cosine
          FROM e qs JOIN e c ON qs.$QuerySetSql AND NOT c.$QuerySetSql)
        SELECT query_id, vec_id, cosine, rank FROM
          (SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY cosine DESC, vec_id) AS rank FROM scored)
        WHERE rank <= $K"""

  private val Sim2Sql =
    s"""WITH e AS (SELECT vec_id,
          list_transform(embedding, x -> round(x::DOUBLE*1000)::BIGINT) AS q
          FROM embeddings),
        b AS (SELECT vec_id, q,
          unnest([ bb || '#' ||
            list_sum([ CASE WHEN list_dot_product(q,
                [ (('0x'||substr(md5((bb*4+j)||'|'||d),1,15))::BIGINT % 2001) - 1000
                  for d in range(0,64) ]) > 0
              THEN (1::BIGINT << j) ELSE 0 END for j in range(0,4) ])::BIGINT
            for bb in range(0,4) ]) AS band_key FROM e),
        scored AS (SELECT DISTINCT qs.vec_id AS query_id, c.vec_id,
          list_dot_product(qs.q, c.q) /
          (sqrt(list_dot_product(qs.q, qs.q)) * sqrt(list_dot_product(c.q, c.q))) AS cosine
          FROM b qs JOIN b c USING (band_key)
          WHERE qs.$QuerySetSql AND NOT c.$QuerySetSql)
        SELECT query_id, vec_id, cosine, rank FROM
          (SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY cosine DESC, vec_id) AS rank FROM scored)
        WHERE rank <= $K"""

  private val Sim3Sql =
    s"""WITH e AS (SELECT vec_id,
          list_transform(embedding, x -> round(x::DOUBLE*1000)::BIGINT) AS q
          FROM embeddings),
        n AS (SELECT vec_id, q, sqrt(list_dot_product(q, q)) AS nrm FROM e),
        cents AS (SELECT vec_id AS cent_id, q AS cq, nrm AS cn
          FROM n WHERE $CentSetSql),
        cell AS (SELECT vec_id, q, nrm, cent_id, crank FROM
          (SELECT n.vec_id, n.q, n.nrm, cents.cent_id,
             row_number() OVER (PARTITION BY n.vec_id ORDER BY
               list_dot_product(n.q, cents.cq) / (n.nrm * cents.cn) DESC,
               cents.cent_id) AS crank
           FROM n, cents)),
        assigned AS (SELECT cent_id, vec_id, q, nrm FROM cell
          WHERE crank = 1 AND NOT ($QuerySetSql)),
        probes AS (SELECT cent_id, vec_id AS query_id, q AS qq, nrm AS qn
          FROM cell WHERE crank <= $NProbe AND $QuerySetSql),
        scored AS (SELECT DISTINCT query_id, a.vec_id,
          list_dot_product(qq, a.q) / (qn * a.nrm) AS cosine
          FROM assigned a JOIN probes USING (cent_id))
        SELECT query_id, vec_id, cosine, rank FROM
          (SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY cosine DESC, vec_id) AS rank FROM scored)
        WHERE rank <= $K"""

  /** One unrolled Lloyd iteration as oracle CTEs: assignment = argmin of
    * the integer reduced score |c|²−2·q·c with lowest-index tie-break
    * (exactly [[graft.functions.KMeansQuantizer.assignCell]] — the
    * integer dots are ≤2^30, so DuckDB's double `list_dot_product` is
    * exact); update = per-(cell,dim) `floor(sum/count + 0.5)` (Java
    * `Math.round`, the trainer's rounding), with empty cells carrying the
    * previous centroid forward. Three fixed iterations need no recursion —
    * just three chained copies.
    */
  private def lloydCtes(i: Int): String = {
    val prev = s"c${i - 1}"
    s"""a$i AS (SELECT vec_id, q, cell FROM (
          SELECT s.vec_id, s.q, c.cent_id AS cell,
            row_number() OVER (PARTITION BY s.vec_id ORDER BY
              list_dot_product(c.cq, c.cq) - 2*list_dot_product(s.q, c.cq) ASC, c.cent_id) AS rn
          FROM sample s, $prev c) WHERE rn = 1),
        c$i AS (
          SELECT cent_id, list(val ORDER BY dim) AS cq FROM (
            SELECT cell AS cent_id, dim,
              CAST(floor(sum(v)::DOUBLE / count(*)::DOUBLE + 0.5) AS BIGINT) AS val
            FROM (SELECT cell, unnest(q) AS v, unnest(range(1, len(q)+1)) AS dim FROM a$i)
            GROUP BY cell, dim) GROUP BY cent_id
          UNION ALL
          SELECT p.cent_id, p.cq FROM $prev p
          WHERE p.cent_id NOT IN (SELECT DISTINCT cell FROM a$i))"""
  }

  /** sim5's oracle: k-means training unrolled (init = the 8 lowest-id
    * sample vectors, 3 Lloyd stages), then the sim3-shaped
    * assign/probe/score over the TRAINED centroids.
    */
  private val Sim5Sql =
    s"""WITH e AS (SELECT vec_id,
          list_transform(embedding, x -> round(x::DOUBLE*1000)::BIGINT) AS q
          FROM embeddings),
        n AS (SELECT vec_id, q, sqrt(list_dot_product(q, q)) AS nrm FROM e),
        sample AS (SELECT vec_id, q FROM e
          WHERE NOT ($QuerySetSql) AND vec_id % 10 = 0),
        c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cent_id, q AS cq
               FROM (SELECT vec_id, q FROM sample ORDER BY vec_id LIMIT 8)),
        ${lloydCtes(1)},
        ${lloydCtes(2)},
        ${lloydCtes(3)},
        cents AS (SELECT cent_id, cq, sqrt(list_dot_product(cq, cq)) AS cn FROM c3),
        cell AS (SELECT vec_id, q, nrm, cent_id, crank FROM
          (SELECT n.vec_id, n.q, n.nrm, cents.cent_id,
             row_number() OVER (PARTITION BY n.vec_id ORDER BY
               list_dot_product(n.q, cents.cq) / (n.nrm * cents.cn) DESC,
               cents.cent_id) AS crank
           FROM n, cents)),
        assigned AS (SELECT cent_id, vec_id, q, nrm FROM cell
          WHERE crank = 1 AND NOT ($QuerySetSql)),
        probes AS (SELECT cent_id, vec_id AS query_id, q AS qq, nrm AS qn
          FROM cell WHERE crank <= $NProbe AND $QuerySetSql),
        scored AS (SELECT DISTINCT query_id, a.vec_id,
          list_dot_product(qq, a.q) / (qn * a.nrm) AS cosine
          FROM assigned a JOIN probes USING (cent_id))
        SELECT query_id, vec_id, cosine, rank FROM
          (SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY cosine DESC, vec_id) AS rank FROM scored)
        WHERE rank <= $K"""

  def qs: Seq[Q] = Seq(
    Q(
      "sim1_brute_topk",
      (s, dir) => bruteTopk(s, dir),
      Some(Sim1Sql),
      doc = "ANN baseline: exact brute-force cosine top-k (broadcast queries)"),

    Q(
      "sim2_lsh_ann",
      (s, dir) => lshTopk(s, dir),
      Some(Sim2Sql),
      doc = "ANN scale path: banded hyperplane LSH bucket join + in-bucket rank"),

    Q(
      "sim3_ivf_ann",
      (s, dir) => ivfTopk(s, dir),
      Some(Sim3Sql),
      doc = "ANN scale path 2: IVF cell assignment + nprobe partition-pruned search"),

    Q(
      "sim5_ivf_trained",
      (s, dir) => {
        // the PRODUCTION IVF composition: train the coarse quantizer with
        // distributed k-means (KMeansQuantizer — deterministic integer
        // Lloyd), assign the corpus, probe each query's nearest cells,
        // exact cosine inside probed cells only. The 3 fixed Lloyd
        // iterations unroll into the oracle as chained CTE stages
        // (Sim5Sql), so training determinism is hash-checked end to end,
        // not just spec-asserted.
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), quantizeN(col("embedding")).as("q"))
          .withColumn("nrm", sqrt(dotQN(col("q"), col("q")).cast("double")))
          .localCheckpoint(false) // feeds training, assignment, and probing
        // quantizers train on a SAMPLE (standard IVF practice — the
        // centroids only steer recall); deterministic 1-in-10 by id.
        // Training cost is then 10% of corpus per Lloyd iteration while
        // assignment still covers every vector.
        val (cents, _) = graft.functions.KMeansQuantizer.train(
          e.filter(!expr(QuerySetSql) && col("vec_id") % 10 === 0),
          "vec_id", "q", k = 8, iters = 3)
        import s.implicits._
        val centDf = broadcast(
          cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
            .toDF("cent_id", "cq")
            .withColumn("cn", sqrt(dotQN(col("cq"), col("cq")).cast("double"))))
        val assigned = nearestCells(e.filter(!expr(QuerySetSql)), centDf, 1)
          .select(col("cent_id"), col("vec_id"), col("q"), col("nrm"))
        val probes = nearestCells(e.filter(expr(QuerySetSql)), centDf, NProbe)
          .select(col("cent_id"), col("vec_id").as("query_id"),
            col("q").as("qq"), col("nrm").as("qn"))
        val scored = assigned.join(broadcast(probes), Seq("cent_id"))
          .select(col("query_id"), col("vec_id"),
            (dotQN(col("qq"), col("q")).cast("double") /
              (col("qn") * col("nrm"))).as("cosine"))
          .distinct()
        topkPerQuery(scored, K)
      },
      Some(Sim5Sql),
      doc = "ANN production path: k-means-trained IVF (train + assign + probe)"),

    Q(
      "sim4_ann_recall",
      (s, dir) => {
        // recall@k per query point: |ANN-top-k ∩ true-top-k| via left-semi
        // joins on (query_id, vec_id); counts stay integers so the compare
        // is hash-exact. Ground truth is computed once and reused for both
        // ANN paths (localCheckpoint — three consumers).
        // every frame here is |queries| x k rows by construction —
        // broadcast the join sides so nothing sort-merges pre-AQE
        val truth = bruteTopk(s, dir)
          .select(col("query_id"), col("vec_id")).localCheckpoint(false)
        def hits(ann: DataFrame, name: String) =
          truth.join(broadcast(ann.select(col("query_id"), col("vec_id"))),
              Seq("query_id", "vec_id"), "left_semi")
            .groupBy(col("query_id")).agg(count(lit(1)).as(name))
        truth.groupBy(col("query_id")).agg(count(lit(1)).as("n_true"))
          .join(broadcast(hits(lshTopk(s, dir), "n_lsh")), Seq("query_id"), "left")
          .join(broadcast(hits(ivfTopk(s, dir), "n_ivf")), Seq("query_id"), "left")
          .select(
            col("query_id"), col("n_true"),
            coalesce(col("n_lsh"), lit(0L)).as("n_lsh"),
            coalesce(col("n_ivf"), lit(0L)).as("n_ivf"))
      },
      Some(s"""WITH brute AS ($Sim1Sql),
              lsh AS ($Sim2Sql),
              ivf AS ($Sim3Sql)
              SELECT b.query_id, count(*) AS n_true,
                count(*) FILTER (WHERE EXISTS (SELECT 1 FROM lsh l
                  WHERE l.query_id = b.query_id AND l.vec_id = b.vec_id)) AS n_lsh,
                count(*) FILTER (WHERE EXISTS (SELECT 1 FROM ivf i
                  WHERE i.query_id = b.query_id AND i.vec_id = b.vec_id)) AS n_ivf
              FROM brute b GROUP BY b.query_id"""),
      doc = "ANN quality: per-query recall@k of LSH and IVF vs exact truth"),

    Q(
      "sim6_knn_graph",
      (s, dir) => {
        // k-NN GRAPH over LSH candidates (k=3): each vector's top-k
        // nearest band-sharing neighbors by exact quantized cosine —
        // the neighbor-list build that SemDeDup-style semantic dedup and
        // embedding clustering start from. Rides d6's family-cached
        // group/band frames (identical-vector collapse), and applies the
        // collapse philosophy to RANKING: candidates are truncated to
        // k+2 per group BEFORE member expansion. That bound is exact,
        // not approximate — a source group's members all share one
        // rep-level cosine and tie-break by vec_id, so a member's top-k
        // can use at most k of them (k+1 with self, +1 slack), and the
        // group-level top-(k+2) therefore contains every entry any
        // member's top-k can reference. Expansion cost is members x
        // (k+2): LINEAR in the duplication factor where the naive
        // per-vector candidate join is quadratic. Both windows partition
        // on high-cardinality keys (rep / vec_id), so no straggler
        // partition at any scale; bucket-bounded candidate generation is
        // d6's, unchanged.
        val groups = DedupOps.materialized(s, dir, "embedgroups") {
          t(s, dir, "embeddings")
            .select(col("vec_id"), quantizeN(col("embedding")).as("q"))
            .groupBy(col("q"))
            .agg(min(col("vec_id")).as("rep"),
              sort_array(collect_list(col("vec_id"))).as("members"))
            .withColumn("nrm", sqrt(dotQN(col("q"), col("q")).cast("double")))
        }
        val bands = DedupOps.materialized(s, dir, "embedfpbands") {
          groups.select(col("rep"),
            explode(call_function("graft_lsh_bands",
              col("q"), lit(4), lit(4), lit(64))).as("band_key"))
        }
        val kk = 3
        val repPairs = bands.select(col("band_key"), col("rep").as("rep_a"))
          .join(bands.select(col("band_key"), col("rep").as("rep_b")), Seq("band_key"))
          .filter(col("rep_a") =!= col("rep_b"))
          .select(col("rep_a"), col("rep_b")).distinct()
        val cross = repPairs
          .join(groups.select(col("rep").as("rep_a"), col("q").as("q_a"),
            col("nrm").as("n_a")), Seq("rep_a"))
          .join(groups.select(col("rep").as("rep_b"), col("q").as("q_b"),
            col("nrm").as("n_b"), col("members").as("ms_b")), Seq("rep_b"))
          .select(col("rep_a"), slice(col("ms_b"), 1, kk + 2).as("cand"),
            (dotQN(col("q_a"), col("q_b")).cast("double") / (col("n_a") * col("n_b"))).as("cosine"))
        val twins = groups.filter(size(col("members")) >= 2)
          .select(col("rep").as("rep_a"), slice(col("members"), 1, kk + 2).as("cand"),
            (dotQN(col("q"), col("q")).cast("double") / (col("nrm") * col("nrm"))).as("cosine"))
        val wg = Window.partitionBy(col("rep_a"))
          .orderBy(col("cosine").desc, col("cand_id"))
        val groupTop = cross.unionByName(twins)
          .select(col("rep_a"), explode(col("cand")).as("cand_id"), col("cosine"))
          .withColumn("__gr", row_number().over(wg)).filter(col("__gr") <= kk + 2)
          .drop("__gr")
        // r15: per-vector ranking WITHOUT a second window. The old form
        // exploded members against groupTop rows and ran row_number over
        // (vec_id) — a second exchange + sort keyed on vec_id. Instead the
        // group's candidates aggregate into ONE ordered array per rep
        // (this groupBy is keyed on rep_a, the SAME key wg just
        // partitioned by, so it reuses that exchange), and each member's
        // top-k is array arithmetic: drop self, keep the first k. The
        // comparator reproduces the window's (cosine desc, cand_id asc)
        // order including Spark's NaN-largest double ordering (a zero
        // vector's self-cosine is NaN and must rank first, exactly as
        // row_number ordered it).
        val cmp = (l: org.apache.spark.sql.Column, r: org.apache.spark.sql.Column) => {
          val (lc, rc) = (l.getField("cosine"), r.getField("cosine"))
          val (li, ri) = (l.getField("cand_id"), r.getField("cand_id"))
          when(isnan(lc) && isnan(rc),
              when(li < ri, -1).when(li > ri, 1).otherwise(0))
            .when(isnan(lc), -1)
            .when(isnan(rc), 1)
            .when(lc > rc, -1).when(lc < rc, 1)
            .when(li < ri, -1).when(li > ri, 1).otherwise(0)
        }
        val topArr = groupTop.groupBy(col("rep_a"))
          .agg(collect_list(struct(col("cosine"), col("cand_id"))).as("cands"))
          .select(col("rep_a"), array_sort(col("cands"), cmp).as("cands"))
        groups.select(col("rep").as("rep_a"), explode(col("members")).as("vec_id"))
          .join(topArr, Seq("rep_a"))
          .select(col("vec_id"), posexplode(
            slice(filter(col("cands"),
              c => c.getField("cand_id") =!= col("vec_id")), 1, kk))
            .as(Seq("__pos", "__c")))
          .select(col("vec_id"), col("__c.cand_id").as("neighbor_id"),
            col("__c.cosine").as("cosine"), (col("__pos") + 1).cast("long").as("rank"))
      },
      // COLLAPSED oracle (r11, VERDICT r10 #3): the old per-vector form
      // enumerated every band-sharing candidate pair before ranking —
      // quadratic in the duplication factor at sf>=1 (the oracle's cost;
      // the engine's k+2 truncation was always linear). This mirrors the
      // engine's collapse: rep-level candidate groups, target member
      // rosters sliced to the first 5 (k+2 — a dropped 6th member shares
      // its group's cosine and trails >=4 smaller-id twins, so it can
      // rank at best 5th and never enters a top-3), then per-vector
      // expansion and ranking. Prototype-checked old == new on a
      // dup-heavy corpus before landing.
      Some(s"""WITH ${DedupOps.EmbedCtes},
              rp AS (SELECT DISTINCT a.rep AS ra, b.rep AS rb
                     FROM bands a JOIN bands b USING (band_key)
                     WHERE a.rep <> b.rep),
              cg AS (
                SELECT rp.ra AS rep_s, gb.members[1:5] AS cand,
                       list_dot_product(ga.q, gb.q) / (ga.nrm * gb.nrm) AS cosine
                FROM rp JOIN grpr ga ON ga.rep = rp.ra
                        JOIN grpr gb ON gb.rep = rp.rb
                UNION ALL
                SELECT rep, members[1:5], list_dot_product(q, q) / (nrm * nrm)
                FROM grpr WHERE len(members) >= 2),
              src AS (SELECT rep, unnest(members) AS vec_id FROM grpr),
              cand AS (SELECT vec_id, neighbor_id, cosine FROM (
                  SELECT vec_id, unnest(cand) AS neighbor_id, cosine FROM (
                    SELECT src.vec_id, cg.cand, cg.cosine
                    FROM src JOIN cg ON cg.rep_s = src.rep))
                WHERE neighbor_id <> vec_id)
              SELECT vec_id, neighbor_id, cosine, rank::BIGINT AS rank FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id) AS rank
                FROM cand)
              WHERE rank <= 3"""),
      doc = "ANN: per-vector top-k neighbor graph over LSH candidates (SemDeDup prep)"),

    Q(
      "sim7_pq_adc",
      (s, dir) => {
        // PRODUCT QUANTIZATION + ADC — the FAISS-style memory-scale path:
        // each corpus vector compresses to M=4 one-byte codes (argmin
        // ||subvector - centroid||^2 per subspace, integer-exact), and
        // query scoring is an Asymmetric Distance Computation: the query
        // precomputes dot(q_m, c) per (subspace, centroid) and each
        // candidate costs M table lookups — the scored frame carries 4
        // ints per vector instead of 64 longs, a 32x candidate-stream
        // shrink. Codebook = subvectors of 8 deterministic seed vectors
        // (training-free; sim5 already hash-checks TRAINED quantizers —
        // this query checks the encode/ADC machinery). Every score is
        // integer arithmetic, so the oracle is hash-exact, and the whole
        // corpus path is one narrow pass: encode in the scan, broadcast
        // the query batch, two-phase top-k.
        import s.implicits._
        val M = 4; val S = 16; val J = 8
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), quantizeN(col("embedding")).as("q"))
        val seeds: Array[Seq[Long]] =
          e.filter(!expr(QuerySetSql) && col("vec_id") % 10 === 0)
            .orderBy("vec_id").limit(J).select("q").as[Seq[Long]].collect()
        require(seeds.length == J && seeds.head.length == M * S,
          s"PQ codebook needs $J seeds of dim ${M * S}")
        val cb: Array[Array[Array[Long]]] =
          Array.tabulate(M, J)((m, j) => seeds(j).slice(m * S, m * S + S).toArray)

        def subv(q: org.apache.spark.sql.Column, m: Int) = slice(q, m * S + 1, S)
        // native integer dot against a literal centroid (DotMilli kernel):
        // bit-identical to the zip_with/aggregate HOF spec, one codegen'd
        // loop instead of a 16-element interpreted lambda walk — the encode
        // evaluates 32 of these per corpus row (r15, guide §4)
        def dotLit(sub: org.apache.spark.sql.Column, c: Array[Long]) =
          call_function("graft_dot_milli", sub, typedlit(c.toSeq))
        def code(q: org.apache.spark.sql.Column, m: Int) = {
          val costs = array((0 until J).map { j =>
            lit(cb(m)(j).map(x => x * x).sum) - lit(2L) * dotLit(subv(q, m), cb(m)(j))
          }: _*)
          (array_position(costs, array_min(costs)) - 1).cast("int")
        }

        val corpus = e.filter(!expr(QuerySetSql))
          .select(col("vec_id"),
            array((0 until M).map(m => code(col("q"), m)): _*).as("codes"))
        // r15: the ADC is now an actual table lookup, as the doc comment
        // always promised. The broadcast query side precomputes the
        // (subspace, centroid) dot table — J native dots per subspace per
        // QUERY row — and each corpus candidate costs M element_at
        // lookups, instead of re-deriving M 16-element dot products per
        // (candidate, query) pair through interpreted zip_with/aggregate
        // lambdas. Same integers (tab_m[code] IS dot(subv(qq,m),
        // cb(m)(code))), so the oracle hash is unchanged.
        val queries = e.filter(expr(QuerySetSql))
          .select(col("vec_id").as("query_id"), col("q").as("qq"))
          .select(col("query_id") +: (0 until M).map { m =>
            array((0 until J).map(j => dotLit(subv(col("qq"), m), cb(m)(j))): _*)
              .as(s"tab_$m")
          }: _*)
        val scored = corpus.crossJoin(broadcast(queries))
          .select(col("query_id"), col("vec_id"),
            (0 until M).map { m =>
              element_at(col(s"tab_$m"), col("codes")(m) + 1)
            }.reduce(_ + _).as("adc_score"))

        val ord = Seq(col("adc_score").desc, col("vec_id"))
        val w1 = Window.partitionBy(col("query_id"), pmod(hash(col("vec_id")), lit(64)))
          .orderBy(ord: _*)
        val w = Window.partitionBy(col("query_id")).orderBy(ord: _*)
        scored.withColumn("__r1", row_number().over(w1)).filter(col("__r1") <= K)
          .drop("__r1")
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= K)
      },
      Some(s"""WITH e AS (SELECT vec_id,
                  list_transform(embedding, x -> round(x::DOUBLE*1000)::BIGINT) AS q
                FROM embeddings),
              seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, q
                FROM (SELECT vec_id, q FROM e
                      WHERE NOT ($QuerySetSql) AND vec_id % 10 = 0
                      ORDER BY vec_id LIMIT 8)),
              ms AS (SELECT unnest([0,1,2,3]) AS m),
              cb AS (SELECT m, j, q[m*16+1 : m*16+16] AS c FROM seeds, ms),
              corpus AS (SELECT vec_id, q FROM e WHERE NOT ($QuerySetSql)),
              costs AS (SELECT corpus.vec_id, cb.m, cb.j,
                  list_dot_product(cb.c, cb.c)::BIGINT
                    - 2*list_dot_product(corpus.q[cb.m*16+1 : cb.m*16+16], cb.c)::BIGINT AS cost
                FROM corpus, cb),
              codes AS (SELECT vec_id, m, j AS code FROM
                 (SELECT *, row_number() OVER (PARTITION BY vec_id, m
                    ORDER BY cost, j) AS r FROM costs) WHERE r = 1),
              queries AS (SELECT vec_id AS query_id, q AS qq FROM e WHERE $QuerySetSql),
              part AS (SELECT q.query_id, codes.vec_id,
                  list_dot_product(q.qq[codes.m*16+1 : codes.m*16+16], cb.c)::BIGINT AS sc
                FROM queries q, codes JOIN cb ON cb.m = codes.m AND cb.j = codes.code),
              scored AS (SELECT query_id, vec_id, sum(sc)::BIGINT AS adc_score
                FROM part GROUP BY query_id, vec_id)
              SELECT query_id, vec_id, adc_score, rank FROM
               (SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY adc_score DESC, vec_id) AS rank FROM scored)
              WHERE rank <= $K"""),
      doc = "ANN memory scale: product-quantization codes + integer ADC top-k")
  )
}
