package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables.t

/** Learned-filter operators for training-data curation: an in-engine
  * quality-classifier trainer (hashed-unigram Naive-Bayes log-odds
  * initialization refined by unrolled gradient steps — the
  * fasttext-style quality filter of CCNet/LLaMA-class pipelines,
  * distilled from a rule-based teacher) and DSIR-style importance
  * scoring (hashed-n-gram log-likelihood ratio of a target domain
  * against the raw corpus, Xie et al. 2023).
  *
  * Scale shape shared by both: model state is BUCKETS-sized (64/256
  * longs), never data-sized, so it collects to the driver and rides
  * back into the plan as a literal array — scoring and margin passes
  * are pure row-local projections with ZERO joins, and the only
  * shuffles anywhere are bucket-count aggregations (≤ B groups,
  * map-side combined). Per-token math is integer-quantized (micro-nats
  * / milli-errors) BEFORE any sum so every aggregate is an
  * order-independent long sum — the engine's determinism story — and
  * the DuckDB oracles replay training end-to-end (the NB closed form
  * plus each unrolled gradient step as chained CTEs, the sim5/bpe1
  * pattern).
  */
object ModelOps {

  private val B = 64

  private val Stops = Seq("the", "a", "of", "and", "in", "to", "is")

  /** md5-prefix hash bucket of a token — 4 hex chars mod `n`, the same
    * arithmetic the oracles replay with `instr` digit folding (ds3's
    * split hash pattern).
    */
  private def bucket(tok: Column, n: Int): Column =
    pmod(conv(substring(md5(tok), 1, 4), 16, 10).cast("long"), lit(n.toLong))

  /** Shared milli-rounding: Spark `round` is HALF_UP (away from zero),
    * matching DuckDB's `round` — all boundary rounding happens on
    * integer-valued or measure-zero inputs (see qc1 notes).
    */
  private def rndLong(c: Column): Column = round(c).cast("long")

  /** Driver-side HALF_UP to mirror `rndLong` exactly when model state is
    * updated on the driver (away from zero at .5, like Spark/DuckDB
    * `round` on doubles).
    */
  private def rnd(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue

  /** The qc1 oracle's per-step CTE block: margin → milli-error → bucket
    * gradient → weight/bias update, numerically identical to the Spark
    * side (same double-division order, same floor, same rounding).
    */
  private def gdStepSql(i: Int): String = {
    val p = i - 1
    s"""m$i AS (SELECT fb.doc_id, sum(fb.m*w$p.w)::BIGINT AS mg
       FROM fb JOIN w$p USING (b) GROUP BY 1),
     e$i AS (SELECT y.doc_id,
         round((1/(1+exp(-(coalesce(m$i.mg,0)+b$p.bw)::DOUBLE/1e6)) - y.y)*1000)::BIGINT AS err
       FROM y LEFT JOIN m$i USING (doc_id) CROSS JOIN b$p),
     g$i AS (SELECT fb.b, sum(e$i.err*fb.m)::BIGINT AS g
       FROM fb JOIN e$i USING (doc_id) GROUP BY 1),
     gb$i AS (SELECT sum(err)::BIGINT AS g FROM e$i),
     w$i AS (SELECT w$p.b, (w$p.w - floor(coalesce(g$i.g,0)::DOUBLE / nn.n / 10))::BIGINT AS w
       FROM w$p LEFT JOIN g$i USING (b) CROSS JOIN nn),
     b$i AS (SELECT (b$p.bw - floor(gb$i.g::DOUBLE / nn.n / 10))::BIGINT AS bw
       FROM b$p CROSS JOIN gb$i CROSS JOIN nn)"""
  }

  /** Shared feature/label CTE head for the qc1 oracle: token
    * multiplicities, stopword-teacher label, md5-bucketed per-doc
    * counts.
    */
  private val QcHeadSql =
    s"""tok AS (SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS tok
       FROM documents),
     p AS (SELECT doc_id, tok, count(*)::BIGINT AS m FROM tok GROUP BY 1, 2),
     y AS (SELECT doc_id,
         (CASE WHEN count(*) FILTER (WHERE list_contains(
            ['the','a','of','and','in','to','is'], tok)) * 1000 // count(*) >= 61
          THEN 1 ELSE 0 END)::BIGINT AS y
       FROM tok GROUP BY 1),
     fb AS (SELECT p.doc_id,
         (((instr('0123456789abcdef', substr(md5(p.tok), 1, 1)) - 1) * 4096
          + (instr('0123456789abcdef', substr(md5(p.tok), 2, 1)) - 1) * 256
          + (instr('0123456789abcdef', substr(md5(p.tok), 3, 1)) - 1) * 16
          + (instr('0123456789abcdef', substr(md5(p.tok), 4, 1)) - 1)) % 64)::BIGINT AS b,
         sum(p.m)::BIGINT AS m
       FROM p GROUP BY 1, 2),
     cls AS (SELECT fb.doc_id, fb.b, fb.m, y.y FROM fb JOIN y USING (doc_id)),
     cnt AS (SELECT b,
         sum(CASE WHEN y = 1 THEN m ELSE 0 END)::BIGINT AS cpos,
         sum(CASE WHEN y = 0 THEN m ELSE 0 END)::BIGINT AS cneg
       FROM cls GROUP BY 1),
     tot AS (SELECT sum(cpos)::BIGINT AS tpos, sum(cneg)::BIGINT AS tneg FROM cnt),
     nn AS (SELECT count(*) FILTER (WHERE y = 1)::BIGINT AS npos,
                   count(*) FILTER (WHERE y = 0)::BIGINT AS nneg,
                   count(*)::DOUBLE AS n FROM y),
     w0 AS (SELECT r.b::BIGINT AS b,
         round((ln((coalesce(cnt.cpos, 0) + 1)::DOUBLE / (tot.tpos + 64))
              - ln((coalesce(cnt.cneg, 0) + 1)::DOUBLE / (tot.tneg + 64))) * 1e6)::BIGINT AS w
       FROM range(64) r(b) LEFT JOIN cnt ON r.b = cnt.b CROSS JOIN tot),
     b0 AS (SELECT round(ln(npos::DOUBLE / nneg::DOUBLE) * 1e6)::BIGINT AS bw FROM nn)"""

  def qs: Seq[Q] = Seq(
    Q(
      "qc1_quality_classifier",
      (s, dir) => {
        // IN-ENGINE QUALITY-CLASSIFIER TRAINING (the CCNet/LLaMA-family
        // fasttext filter, distilled from a rule-based teacher): label
        // every doc by the t2 stopword-ratio heuristic (y=1 iff
        // stopword permille >= 61 — the corpus median splits ~54/46),
        // featurize as hashed-unigram counts (64 md5 buckets), train a
        // logistic model by Naive-Bayes log-odds INITIALIZATION (the
        // closed form — one bucket-count aggregate, no iteration)
        // refined by 2 full-batch gradient steps, and score every doc
        // with the trained weights. NB init reaches the feature space's
        // ceiling (~0.89 accuracy vs the 0.54 majority class, asserted
        // in ModelOpsSpec); the gradient steps are the trainable-model
        // machinery, hash-checked end to end by unrolling each step
        // into the oracle's CTE chain (plain GD from zero needs
        // hundreds of steps to move — measured — so closed-form init +
        // refinement is both the faster and the more accurate design).
        //
        // SCALE SHAPE: the feature frame (doc_id, y, 64-long dense
        // bucket vector) is built row-local in one kernel pass and
        // localCheckpointed (text is never re-parsed); model state is
        // 65 longs, collected and re-broadcast as a LITERAL each step,
        // so margins and errors are pure projections; each step's only
        // shuffle is the 64-group gradient aggregate (map-side
        // combined). Work per step = one scan of the checkpointed
        // features — at 100 TB that is 3 cheap scans total after the
        // one feature-build pass.
        //
        // DETERMINISM: per-doc errors quantize to milli BEFORE the
        // gradient sum (long sums are order-independent), weights live
        // in integer micro-nats, updates are floor(g/N/lr) (floor is
        // engine-identical; the only HALF_UP roundings sit on
        // measure-zero boundaries, e.g. margin=0 -> err exactly ±500.0,
        // which is integer-valued and rounds identically everywhere).
        val pairs = call_function("graft_token_counts", col("text"))
        val nTok = aggregate(pairs, lit(0L), (a, p) => a + p.getField("m"))
        val nStop = aggregate(
          filter(pairs, p => p.getField("tok").isin(Stops.map(x => x: Any): _*)),
          lit(0L), (a, p) => a + p.getField("m"))
        val yCol = when(floor(nStop * lit(1000) / nTok) >= 61, 1L).otherwise(0L)
        // dense feature vector via the one-pass kernel; `bucket` on
        // token-counts pairs is the column-form spec it must match
        // (NativeTextExpressionsSpec pins the parity). The naive HOF
        // form — transform(0..63, i -> aggregate(filter(bp, b==i))) —
        // gets its md5 subtree CollapseProject'd into all 64 bucket
        // lambdas: 64 digests per token, 91 s at sf1 vs ~1 s here.
        val mv = call_function("graft_bucket_counts", col("text"), lit(B))
        val features = t(s, dir, "documents")
          .select(col("doc_id"), yCol.as("y"), mv.as("mv"), nTok.as("nt"))
          .filter(col("nt") > 0).drop("nt")
          .localCheckpoint(false) // feeds NB counts, 2 GD steps, final scoring
        // NB closed form: per-bucket class counts (64 groups). Class sizes
        // ride the SAME aggregate (r15): mv is dense, so every doc emits
        // one exploded row per bucket and each bucket's class-1 row count
        // IS nPos — the separate features.groupBy(y).count() pass (one
        // full scan of the checkpointed features per rep) folds away.
        // Density is asserted the same way the bias gradient's is below.
        val cRows = features
          .select(col("y"), posexplode(col("mv")).as(Seq("b", "m")))
          .groupBy(col("b"))
          .agg(sum(when(col("y") === 1, col("m")).otherwise(0L)).as("cpos"),
            sum(when(col("y") === 0, col("m")).otherwise(0L)).as("cneg"),
            sum(when(col("y") === 1, 1L).otherwise(0L)).as("np"),
            count(lit(1)).as("nt"))
          .collect()
        val cAgg = cRows.map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
        require(cRows.isEmpty || (cRows.length == B &&
          cRows.map(_.getLong(3)).toSet.size == 1 &&
          cRows.map(_.getLong(4)).toSet.size == 1),
          s"qc1 class sizes need a dense $B-bucket feature vector")
        val nPos = if (cRows.isEmpty) 0L else cRows.head.getLong(3)
        val nNeg = if (cRows.isEmpty) 0L else cRows.head.getLong(4) - cRows.head.getLong(3)
        val nDocs = (nPos + nNeg).toDouble
        val tPos = cAgg.valuesIterator.map(_._1).sum
        val tNeg = cAgg.valuesIterator.map(_._2).sum
        var w = Array.tabulate(B) { b =>
          val (cp, cn) = cAgg.getOrElse(b, (0L, 0L))
          rnd((math.log((cp + 1).toDouble / (tPos + B)) -
            math.log((cn + 1).toDouble / (tNeg + B))) * 1e6)
        }
        var bias = rnd(math.log(nPos.toDouble / nNeg.toDouble) * 1e6)
        // native integer dot (DotMilli) of the dense bucket vector with the
        // literal weight array — bit-identical to the zip_with/aggregate
        // HOF form (the kernel's pinned spec), but one codegen'd loop
        // instead of 64 interpreted lambda evaluations per doc per pass
        // (this margin runs in all 3 post-init scans: 2 GD steps + scoring)
        def marginOf(wts: Array[Long], bw: Long): Column =
          call_function("graft_dot_milli", col("mv"), typedlit(wts.toSeq)) + lit(bw)
        def errOf(m: Column): Column =
          rndLong((lit(1.0) / (lit(1.0) + exp(-m.cast("double") / lit(1e6))) -
            col("y").cast("double")) * 1000)
        for (_ <- 1 to 2) {
          // dense mv: every doc emits all 64 positions, so bucket 0's
          // sum(err) is exactly the per-doc bias gradient. err MUST be
          // computed in its own select BELOW the generator: a select
          // that mixes err with posexplode puts err in the Project
          // ABOVE the Generate, re-evaluating the 64-lambda margin once
          // per EXPLODED row (x64 — measured 12 s/step at sf1 vs ~1 s
          // here); as a bare attribute it cannot be inlined through the
          // Generate
          val g = features
            .select(col("mv"), errOf(marginOf(w, bias)).as("err"))
            .select(col("err"), posexplode(col("mv")).as(Seq("b", "m")))
            .groupBy(col("b"))
            .agg(sum(col("err") * col("m")).as("g"), sum(col("err")).as("ge"))
            .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
          // the bias gradient is read from ONE bucket's sum(err), valid
          // only while graft_bucket_counts stays dense (every doc emits
          // all B positions, so each bucket's ge is the full per-doc err
          // sum). Assert the invariant on the frame just collected —
          // dense ⟺ all B buckets present with IDENTICAL ge — so a
          // sparse-kernel change fails here, not as a silent per-bucket
          // partial sum that only the oracle would catch (ADVICE r8).
          require(g.isEmpty || (g.size == B && g.valuesIterator.map(_._2).toSet.size == 1),
            s"qc1 bias gradient needs a dense ${B}-bucket feature vector: " +
              s"got ${g.size} buckets, ge values ${g.valuesIterator.map(_._2).toSet}")
          w = Array.tabulate(B) { b =>
            w(b) - math.floor(g.getOrElse(b, (0L, 0L))._1.toDouble / nDocs / 10).toLong
          }
          bias -= math.floor(g.getOrElse(0, (0L, 0L))._2.toDouble / nDocs / 10).toLong
        }
        val mFinal = marginOf(w, bias)
        features.select(col("doc_id"), col("y"),
          mFinal.as("margin_micro"),
          rndLong(lit(1000.0) / (lit(1.0) + exp(-mFinal.cast("double") / lit(1e6))))
            .as("pred_milli"))
      },
      Some(s"""WITH $QcHeadSql,
              ${gdStepSql(1)},
              ${gdStepSql(2)},
              mf AS (SELECT fb.doc_id, sum(fb.m*w2.w)::BIGINT AS mg
                FROM fb JOIN w2 USING (b) GROUP BY 1)
              SELECT y.doc_id, y.y,
                (coalesce(mf.mg, 0) + b2.bw)::BIGINT AS margin_micro,
                round(1000/(1+exp(-(coalesce(mf.mg, 0) + b2.bw)::DOUBLE/1e6)))::BIGINT AS pred_milli
              FROM y LEFT JOIN mf USING (doc_id) CROSS JOIN b2"""),
      doc = "Model: quality-classifier training (NB log-odds init + 2 unrolled GD steps)"),

    Q(
      "dsir1_importance_score",
      (s, dir) => {
        // DSIR-STYLE DATA SELECTION (Xie et al. 2023, hashed-n-gram
        // importance weights): score every corpus doc by the
        // log-likelihood ratio of a TARGET-domain unigram LM (docs from
        // sources src1/src2 — the "quality domain" stand-in) against
        // the RAW-corpus LM, both over 256 md5 hash buckets with
        // add-one smoothing. High scores = docs whose token mix looks
        // like the target domain; downstream, tp4's deterministic
        // weighted sampler resamples by these weights (importance
        // RESAMPLING is the composition of this op and tp4 — kept
        // separate so each stays oracle-checkable).
        //
        // SCALE SHAPE: two bucket-count aggregates (256 groups each,
        // map-side combined — the target one scans only the target
        // slice), 256 per-bucket log-ratios quantized to micro-nats on
        // the driver, baked into the scoring pass as a LITERAL array:
        // scoring is one row-local projection over the corpus, zero
        // joins, zero shuffles. Per-token contributions are integer
        // micro-nats so doc sums are order-independent longs.
        // r15: the per-token work rides the dense graft_bucket_counts
        // kernel (one JIT'd split+md5 pass per doc) instead of
        // graft_token_counts + an interpreted transform whose lambda
        // re-evaluated the md5-bucket COLUMN EXPRESSION per distinct
        // token. Dense zero-count buckets add 0 to every sum, so tc/rc
        // and the lam table are bit-identical; the column `bucket` form
        // stays the spec (and the oracle's definition) — kernel parity
        // is pinned by NativeTextExpressionsSpec.
        val nB = 256
        val bc = call_function("graft_bucket_counts", col("text"), lit(nB))
        val docs = t(s, dir, "documents")
        val isTarget = col("source").isin("src1", "src2")
        val byBucket = docs
          .select(isTarget.as("tgt"), posexplode(bc).as(Seq("b", "m")))
          .groupBy(col("b"))
          .agg(sum(when(col("tgt"), col("m")).otherwise(0L)).as("tc"),
            sum(col("m")).as("rc"))
          .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
        val tTot = byBucket.valuesIterator.map(_._1).sum
        val rTot = byBucket.valuesIterator.map(_._2).sum
        val lam = Array.tabulate(nB) { b =>
          val (tc, rc) = byBucket.getOrElse(b, (0L, 0L))
          rnd((math.log((tc + 1).toDouble / (tTot + nB)) -
            math.log((rc + 1).toDouble / (rTot + nB))) * 1e6)
        }
        // scoring = native dot of the dense bucket vector with the literal
        // lam table: sum_b cnt_b * lam_b == sum_tok m * lam[bucket(tok)]
        // (same longs, regrouped — order-independent). n_toks = total
        // multiplicity = the tok-stats kernel's n_tokens.
        val lamLit = typedlit(lam.toSeq)
        val score = call_function("graft_dot_milli", bc, lamLit)
        val nTok = call_function("graft_tok_stats", col("text")).getField("n_tokens")
        docs.select(col("doc_id"), col("source"), nTok.as("n_toks"),
            score.as("lw_micro"))
          .filter(col("n_toks") > 0)
      },
      Some("""WITH tok AS (SELECT doc_id, source,
                unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS tok
              FROM documents),
              p AS (SELECT doc_id, source, tok, count(*)::BIGINT AS m
                FROM tok GROUP BY 1, 2, 3),
              pb AS (SELECT doc_id, source,
                (((instr('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 4096
                 + (instr('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) * 256
                 + (instr('0123456789abcdef', substr(md5(tok), 3, 1)) - 1) * 16
                 + (instr('0123456789abcdef', substr(md5(tok), 4, 1)) - 1)) % 256)::BIGINT AS b,
                m FROM p),
              cnt AS (SELECT b,
                sum(CASE WHEN source IN ('src1','src2') THEN m ELSE 0 END)::BIGINT AS tc,
                sum(m)::BIGINT AS rc
                FROM pb GROUP BY 1),
              tot AS (SELECT sum(tc)::BIGINT AS tt, sum(rc)::BIGINT AS rt FROM cnt),
              lam AS (SELECT r.b::BIGINT AS b,
                round((ln((coalesce(cnt.tc, 0) + 1)::DOUBLE / (tot.tt + 256))
                     - ln((coalesce(cnt.rc, 0) + 1)::DOUBLE / (tot.rt + 256))) * 1e6)::BIGINT AS w
                FROM range(256) r(b) LEFT JOIN cnt ON r.b = cnt.b CROSS JOIN tot)
              SELECT pb.doc_id, any_value(pb.source) AS source,
                sum(pb.m)::BIGINT AS n_toks,
                sum(pb.m * lam.w)::BIGINT AS lw_micro
              FROM pb JOIN lam USING (b)
              GROUP BY pb.doc_id"""),
      doc = "Model: DSIR importance scoring (target-vs-raw hashed-unigram LLR, micro-nats)")
  )
}
