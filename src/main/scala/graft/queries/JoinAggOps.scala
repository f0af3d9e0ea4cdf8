package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.validate.GraphValidator
import Tables.t

/** Join + aggregation operators (SURVEY.md §2.5 / §2.6) over the synthetic
  * star schema. Each query is the generic form of a reference operator:
  * J1 id-list rollups, J2 broadcast dim joins, J5/J7 semi/anti probes,
  * A2 duplicate-id detection, A4/A5 top-1-per-group windows, A7
  * first-occurrence-wins dedup.
  *
  * Scale notes (100 TB thinking): dims are explicitly `broadcast()`; the
  * fact-side aggregations partial-aggregate map-side before their single
  * shuffle; windows partition by the natural key (user/order) so skew is
  * bounded by per-key cardinality, and AQE skew-join handles hot keys.
  */
object JoinAggOps {
  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  def qs: Seq[Q] = Seq(
    Q(
      "j1_rollup_ids",
      (s, dir) => {
        // A1/J1: parent accumulates sorted child-id list (GraphLinker shape:
        // one shuffle, map-side combined; left join keeps childless parents)
        // id lists surface as ';'-joined strings: the driver's pandas
        // compare can't sort/hash array cells, and the reference's report
        // sinks are delimited strings anyway (SURVEY §2.2 K3)
        val rollup = t(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(
            array_join(sort_array(collect_list(col("o_orderkey"))), ";").as("order_ids"),
            count(lit(1)).as("n_orders"))
        t(s, dir, "customer")
          .join(rollup, col("c_custkey") === col("o_custkey"), "left")
          .select(
            col("c_custkey"),
            col("c_name"),
            coalesce(col("order_ids"), lit("")).as("order_ids"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      },
      Some("""SELECT c_custkey, c_name,
              COALESCE(r.order_ids, '') AS order_ids,
              COALESCE(r.n_orders, 0) AS n_orders
              FROM customer
              LEFT JOIN (SELECT o_custkey,
                         string_agg(o_orderkey::VARCHAR, ';' ORDER BY o_orderkey) AS order_ids,
                         count(*) AS n_orders
                         FROM orders GROUP BY o_custkey) r
              ON c_custkey = o_custkey"""),
      doc = "A1/J1: per-parent sorted child-id rollup with childless parents kept"),

    Q(
      "j2_broadcast_enrich",
      (s, dir) =>
        t(s, dir, "lineitem")
          .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
          .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("p_brand"), col("s_name"))
          .agg(
            sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
              .cast("double").as("revenue"),
            count(lit(1)).as("n_lines")),
      Some("""SELECT p_brand, s_name,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
              COUNT(*) AS n_lines
              FROM lineitem
              JOIN part ON l_partkey = p_partkey
              JOIN supplier ON l_suppkey = s_suppkey
              GROUP BY p_brand, s_name"""),
      doc = "J2/J4: fact enriched via two broadcast dimension joins"),

    Q(
      "j5_semi_probe",
      (s, dir) =>
        t(s, dir, "customer")
          .join(
            t(s, dir, "orders").filter(col("o_orderstatus") === "F"),
            col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment")),
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
              WHERE EXISTS (SELECT 1 FROM orders
                            WHERE o_custkey = c_custkey AND o_orderstatus = 'F')"""),
      doc = "J5/J7: left-semi membership probe"),

    Q(
      "j7_anti_orphans",
      (s, dir) =>
        t(s, dir, "customer")
          .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name")),
      Some("""SELECT c_custkey, c_name FROM customer
              WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"""),
      doc = "J7/A9: anti-join referential orphan check (GraphValidator shape)"),

    Q(
      "a2_duplicate_ids",
      (s, dir) =>
        GraphValidator.duplicateIds(t(s, dir, "lineitem"), "l_orderkey")
          .orderBy(col("id")),
      Some("""SELECT l_orderkey AS id, count(*) AS occurrences
              FROM lineitem GROUP BY 1 HAVING count(*) > 1"""),
      doc = "A2: duplicate-id detection via graft.validate.GraphValidator"),

    Q(
      "a4_latest_per_group",
      (s, dir) => {
        // A4/A5: top-1-per-group with priority semantics (latest-survival /
        // primary-follow-up): any 'error' event wins with the EARLIEST ts,
        // else the LATEST event overall; event_id breaks ties.
        //
        // Shaped as min(struct(orderingKey..., payload...)) rather than a
        // row_number window: struct comparison is lexicographic, so the
        // minimum struct IS the top-1 row, and a hash aggregate partial-
        // aggregates map-side — the shuffle carries one candidate per user
        // per map partition instead of sorting every event (the window form
        // went superlinear in the second measured decade, SCALE.md).
        // event_id is unique, so the trailing payload fields never decide.
        val e = t(s, dir, "events")
        val prio = when(col("event_type") === "error", lit(0)).otherwise(lit(1))
        val tsOrd = when(prio === 0, unix_micros(col("ts")))
          .otherwise(-unix_micros(col("ts")))
        e.groupBy(col("user_id"))
          .agg(min(struct(
            prio.as("p"), tsOrd.as("o"), col("event_id"),
            col("event_type"), col("ts"))).as("__top"))
          .select(
            col("user_id"), col("__top.event_id").as("event_id"),
            col("__top.event_type").as("event_type"),
            date_format(col("__top.ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"))
      },
      Some("""SELECT user_id, event_id, event_type,
              strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str
              FROM (SELECT *, row_number() OVER (
                      PARTITION BY user_id
                      ORDER BY CASE WHEN event_type = 'error' THEN 0 ELSE 1 END,
                               CASE WHEN event_type = 'error' THEN epoch_us(ts)
                                    ELSE -epoch_us(ts) END,
                               event_id) AS rn
                    FROM events)
              WHERE rn = 1"""),
      doc = "A4/A5: priority top-1-per-group window (latest-survival semantics)"),

    Q(
      "a7_dedup_first_wins",
      (s, dir) => {
        // A7: cross-file dedup — two overlapping extracts, first
        // transformation wins per content key; report per-source survivors.
        // min(ord) per key instead of a row_number window: both shuffles
        // partial-aggregate map-side and nothing gets sorted. The two
        // extracts filter one base table, so instead of a self-union (two
        // scans, two hashes per overlapping row) the scan is shared, and
        // each row contributes ONE (key, best-possible-ord) pair: a row in
        // both extracts would contribute ords {1,2}, but under min() the 2
        // is redundant, so no explode and no row doubling — min per key
        // over the single-ord rows is identical. The content key is the
        // normalized content COLUMNS themselves (Deduper.contentKey
        // rationale): hashing them first — the reference's dict-key idiom —
        // buys nothing in a distributed group-by, costs a crypto digest
        // per row (the r5 suite ceiling at sf100), and trades exactness
        // for collision odds. Group-by on the raw triple is bytewise-exact
        // and pure codegen.
        t(s, dir, "lineitem")
          .filter(col("l_quantity") > 10)
          .select(
            struct(col("l_orderkey"), col("l_linenumber"), col("l_quantity")).as("__key"),
            when(col("l_quantity") > 25, lit(1)).otherwise(lit(2)).as("__ord"))
          .groupBy(col("__key")).agg(min(col("__ord")).as("__won"))
          .groupBy(when(col("__won") === 1, lit("xform_a"))
            .otherwise(lit("xform_b")).as("__src"))
          .agg(count(lit(1)).as("survivors"))
      },
      Some("""WITH u AS (
                SELECT *, 1 AS ord FROM lineitem WHERE l_quantity > 25
                UNION ALL
                SELECT *, 2 AS ord FROM lineitem WHERE l_quantity > 10),
              k AS (SELECT l_orderkey, l_linenumber, l_quantity,
                    min(ord) AS won FROM u GROUP BY 1, 2, 3)
              SELECT CASE WHEN won = 1 THEN 'xform_a' ELSE 'xform_b' END AS __src,
                     count(*) AS survivors FROM k GROUP BY 1"""),
      doc = "A7: first-occurrence-wins content-hash dedup across sources"),

    Q(
      "a10_rollup_revenue",
      (s, dir) => {
        // ROLLUP grouping sets over the enriched fact: per (brand, supplier),
        // per brand, and grand total. The fact is FIRST aggregated to the
        // finest grouping set, then the rollup's Expand runs over those
        // ~2.5k partial rows instead of replicating every fact row per
        // grouping level — at 100 TB that's the difference between
        // expanding billions of rows x levels and expanding thousands.
        // Decimal partials keep the re-aggregation exact (sum of sums).
        // NULL group labels are coalesced to 'ALL' so the grouping level is
        // explicit alongside the grouping_id bitmask.
        val perPair = t(s, dir, "lineitem")
          .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
          .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("p_brand"), col("s_name"))
          .agg(
            sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
              .as("rev_d"),
            count(lit(1)).as("n"))
        perPair
          .rollup(col("p_brand"), col("s_name"))
          .agg(
            sum(col("rev_d")).cast("double").as("revenue"),
            sum(col("n")).as("n_lines"),
            grouping_id().as("gid"))
          .select(
            coalesce(col("p_brand"), lit("ALL")).as("brand"),
            coalesce(col("s_name"), lit("ALL")).as("supplier"),
            col("revenue"), col("n_lines"), col("gid"))
      },
      Some("""SELECT coalesce(p_brand, 'ALL') AS brand,
              coalesce(s_name, 'ALL') AS supplier,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
              COUNT(*) AS n_lines,
              GROUPING_ID(p_brand, s_name)::BIGINT AS gid
              FROM lineitem
              JOIN part ON l_partkey = p_partkey
              JOIN supplier ON l_suppkey = s_suppkey
              GROUP BY ROLLUP(p_brand, s_name)"""),
      doc = "ROLLUP grouping sets: multi-level aggregate in one Expand pass"),

    Q(
      "a12_exact_percentiles",
      (s, dir) =>
        // exact (not sketched) quartiles per group — the other HOLISTIC
        // aggregate family: per-group sort inside the aggregate, one
        // shuffle on the group key. Quartile fractions are exact binary
        // fractions over integer-valued data, so linear interpolation is
        // bit-identical across engines.
        // (r15 A/B: the array-fraction form — one shared buffer via
        // percentile(col, array(.25,.5,.75)) — measured ~15% SLOWER than
        // three scalar percentiles at sf0.1 under green sentinels
        // (0.360 vs 0.310 noop-actioned); Spark 4.1's array-fraction
        // path loses more on update than the shared sort saves. Kept the
        // scalar form.)
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            percentile(col("l_quantity"), lit(0.25)).as("p25"),
            percentile(col("l_quantity"), lit(0.5)).as("p50"),
            percentile(col("l_quantity"), lit(0.75)).as("p75"),
            count(lit(1)).as("n")),
      Some("""SELECT l_returnflag,
              quantile_cont(l_quantity, 0.25) AS p25,
              quantile_cont(l_quantity, 0.50) AS p50,
              quantile_cont(l_quantity, 0.75) AS p75,
              COUNT(*) AS n
              FROM lineitem GROUP BY l_returnflag"""),
      doc = "Holistic exact per-group quartiles (bit-stable interpolation)"),

    Q(
      "a11_salted_rollup",
      (s, dir) =>
        // the salted two-phase path for HOLISTIC aggregates on skewed keys
        // (graft.functions.SkewFunctions): a hot parent's collect_list work
        // spreads over 8 shard-reducers, the merge shuffle carries 8
        // pre-aggregated rows per key. Values collected as strings so the
        // canonical sort is one lexicographic order on both engines.
        graft.functions.SkewFunctions.saltedCollectList(
            t(s, dir, "orders"), col("o_custkey"),
            col("o_orderkey").cast("string"), 8)
          .select(col("key").as("o_custkey"),
            array_join(col("values"), ";").as("order_ids")),
      Some("""SELECT o_custkey,
              string_agg(o_orderkey::VARCHAR, ';' ORDER BY o_orderkey::VARCHAR) AS order_ids
              FROM orders GROUP BY o_custkey"""),
      doc = "Skew: salted two-phase collect_list rollup, oracle-equal to direct"),

    Q(
      "a13_sketch_profile",
      (s, dir) => {
        // SKETCH PROFILING with an engine-side error-contract check: a
        // 100 TB cardinality/quantile profile runs on sketches
        // (approx_count_distinct = HyperLogLog++, approx_percentile =
        // rank-error-bounded), never on exact holistic aggregates (a
        // count-distinct expand or per-group sort over 100 TB is the
        // plan you ship AROUND). No other engine reproduces a sketch
        // bit-for-bit, so the oracle contract is the error envelope:
        // this query computes sketch AND exact in one pass and emits
        // booleans asserting the sketch landed inside its documented
        // bound (3x the requested rsd for HLL, a value bracket around
        // the requested rank for the percentile); the oracle recomputes
        // the exact values and expects the booleans TRUE. At production
        // scale you drop the exact columns and keep the sketches — the
        // contract they were verified against here is what licenses
        // that swap.
        // r15: countDistinct is split into its OWN aggregate, joined back
        // on the 3-row group key. In the fused form its rewrite wraps the
        // whole aggregate in an Expand that doubles every input row, so
        // each holistic percentile buffer (an interpreted
        // TypedImperativeAggregate — the expensive part of this query:
        // 7.9 s noop-actioned at sf0.1 vs 0.19 s count-actioned) streamed
        // 2x the rows. The split keeps the percentile pass Expand-free
        // and lets the count/countDistinct pass run as a plain
        // HashAggregate. Same inputs to every function, bit-identical
        // outputs; the join is a 3-row broadcast.
        // (A/B'd: array-fraction percentile(col, array(...)) measured
        // SLOWER than scalar buffers — see a12 — so the three exact
        // percentiles stay scalar.)
        val o = t(s, dir, "orders")
        val cards = o.groupBy(col("o_orderstatus"))
          .agg(
            count(lit(1)).as("n"),
            countDistinct(col("o_custkey")).as("exact_custs"),
            approx_count_distinct(col("o_custkey"), 0.02).as("hll_custs"))
        val pcts = o.groupBy(col("o_orderstatus"))
          .agg(
            percentile(col("o_custkey"), lit(0.5)).as("p50_exact"),
            approx_percentile(col("o_custkey"), lit(0.5), lit(10000)).as("ap50"),
            percentile(col("o_custkey"), lit(0.48)).as("lo"),
            percentile(col("o_custkey"), lit(0.52)).as("hi"))
        // null-safe join key (ADVICE r15): both aggregates emit a NULL
        // group if o_orderstatus is ever null; a null-unsafe inner join
        // would silently drop that group while the pre-split fused
        // aggregate emitted it. TPC-H never nulls o_orderstatus, so the
        // outputs are unchanged — this keeps the split's "bit-identical
        // under ANY input" claim true instead of data-dependent.
        cards.join(broadcast(pcts.withColumnRenamed("o_orderstatus", "__os")),
            col("o_orderstatus") <=> col("__os"))
          .select(
            col("o_orderstatus"), col("n"), col("exact_custs"),
            (abs(col("hll_custs") - col("exact_custs"))
              <= col("exact_custs") * 0.06 + 4).as("hll_ok"),
            col("p50_exact"),
            (col("ap50") >= col("lo") && col("ap50") <= col("hi")).as("p50_ok"))
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
              count(DISTINCT o_custkey) AS exact_custs,
              TRUE AS hll_ok,
              quantile_cont(o_custkey, 0.5) AS p50_exact,
              TRUE AS p50_ok
              FROM orders GROUP BY o_orderstatus"""),
      doc = "Sketches: HLL++ cardinality + approx percentile vs exact, contract-checked"),

    Q(
      "a9_behavior_audit",
      (s, dir) => {
        // A9: users with a 'purchase' event but no 'signup' (treatment-
        // response-without-treatment audit shape): aggregate + anti join
        val e = t(s, dir, "events")
        val purchasers = e.filter(col("event_type") === "purchase")
          .select(col("user_id")).distinct()
        val signups = e.filter(col("event_type") === "signup")
          .select(col("user_id")).distinct()
        purchasers.join(signups, Seq("user_id"), "left_anti")
          .orderBy(col("user_id"))
      },
      Some("""SELECT DISTINCT user_id FROM events e
              WHERE event_type = 'purchase'
              AND NOT EXISTS (SELECT 1 FROM events s
                              WHERE s.user_id = e.user_id AND s.event_type = 'signup')"""),
      doc = "A9: distinct-membership anti-join audit"),

    Q(
      "j8_asof_join",
      (s, dir) => {
        // AS-OF (point-in-time) join: each purchase gets the latest click
        // STRICTLY before it, per user — the feature-generation join every
        // training pipeline needs (no leakage from same-instant or future
        // events). Scale shape: NOT a range join (whose candidate set
        // explodes as span × density) — one tagged union, one shuffle on
        // user_id, and a running last() over the per-user time order.
        // Ordering (ts, is_click, event_id) puts a purchase BEFORE any
        // click at the same instant, so the preceding-rows frame excludes
        // exactly the same rows DuckDB's `p.ts > c.ts` ASOF bound does.
        // Tie contract: two CLICKS at the same (user_id, ts) would break
        // to the max event_id here while ASOF picks an arbitrary tied
        // row — safe because (user_id, ts) is unique in the events table
        // (micro-timestamps; asserted in PlanAssertionsSpec so a testdata
        // change with collisions fails loudly).
        import org.apache.spark.sql.expressions.Window
        val tagged = t(s, dir, "events")
          .filter(col("event_type").isin("purchase", "click"))
          .select(col("event_id"), col("user_id"), col("ts"), col("value"),
            (col("event_type") === "click").cast("int").as("is_click"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("is_click"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        // ONE window over a (ts, value) struct, both output fields pulled
        // from it: two independent last(ignoreNulls) windows would source
        // click_ts and click_value from DIFFERENT clicks whenever the
        // latest prior click carries a NULL value (the ts window would
        // still see it, the value window would skip past it) — an ASOF
        // divergence invisible until a null lands in `value`.
        tagged
          .withColumn("click",
            last(when(col("is_click") === 1, struct(col("ts"), col("value"))),
              ignoreNulls = true).over(w))
          .filter(col("is_click") === 0)
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("ts").as("purchase_ts"),
            col("click.ts").as("click_ts"), col("click.value").as("click_value"))
      },
      Some("""WITH p AS (SELECT event_id, user_id, ts, value FROM events
                         WHERE event_type = 'purchase'),
                   c AS (SELECT user_id, ts, value FROM events
                         WHERE event_type = 'click')
              SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
                     c.ts AS click_ts, c.value AS click_value
              FROM p ASOF LEFT JOIN c
                ON p.user_id = c.user_id AND p.ts > c.ts"""),
      doc = "As-of join: latest-strictly-prior event per key via one partitioned window"),

    Q(
      "j9_range_bin_join",
      (s, dir) => {
        // RANGE join, bucketized: per purchase, aggregate the clicks in
        // the preceding hour — UNKEYED, so the naive plan is a nested-loop
        // over purchases × clicks (candidate set grows as span × density).
        // Scale shape: bin the time axis at the window width; a click
        // lands in one bin, a probe covers exactly two, so the range
        // predicate rides a HASH join on bin and the per-bin candidate
        // set is bounded by local density. Hot bins (flash traffic) are
        // ordinary skew-join work for AQE. The decimal(18,2) aggregation
        // keeps the sum engine-exact (no double partial-agg order issues).
        val W = 3600L * 1000000L // window = bin width, epoch micros
        val ev = t(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(floor(unix_micros(col("ts")).cast("double") / W).cast("long").as("bin"),
            unix_micros(col("ts")).as("c_us"), col("value"))
        val probes = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), unix_micros(col("ts")).as("p_us"))
          .withColumn("bin", explode(array(
            floor((col("p_us") - W).cast("double") / W).cast("long"),
            floor(col("p_us").cast("double") / W).cast("long"))))
        probes.join(clicks,
            probes("bin") === clicks("bin") &&
              col("c_us") >= col("p_us") - W && col("c_us") < col("p_us"),
            "left")
          .groupBy(col("purchase_id"))
          .agg(
            count(col("c_us")).as("n_prior_clicks"),
            coalesce(sum(col("value").cast("decimal(18,2)")),
              lit(0).cast("decimal(18,2)")).cast("double").as("click_sum"))
      },
      Some("""WITH p AS (SELECT event_id, ts FROM events WHERE event_type = 'purchase'),
                   c AS (SELECT ts, value FROM events WHERE event_type = 'click')
              SELECT p.event_id AS purchase_id,
                     count(c.ts)::BIGINT AS n_prior_clicks,
                     coalesce(sum(c.value::DECIMAL(18,2)), 0)::DOUBLE AS click_sum
              FROM p LEFT JOIN c
                ON c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
              GROUP BY p.event_id"""),
      doc = "Range join: bounded-interval aggregate via time-bin bucketed hash join"),

    Q(
      // renamed from j10_salted_join in r11 (ADVICE r10): since the r10
      // A/B flipped the default to the plain AQE join, the old name
      // described the non-default variant — and r10's gate numbers
      // silently measured a different algorithm than r9's under the same
      // key. Round-over-round artifact readers: j10_salted_join (≤ r10,
      // salted through r9, AQE in r10) ≡ j10_skew_join (r11+, AQE).
      "j10_skew_join",
      (s, dir) => {
        // SKEW-AWARE JOIN (A/B'd r10): enrich a
        // fact stream whose key is hot (150 users across the whole events
        // log — every key is a straggler candidate) against a dimension,
        // under the no-broadcast regime of a dimension too large to ship.
        // The dim replicates across 16 shards, each fact row probes its
        // deterministic shard, and the shuffle_hash hint pins the plan a
        // huge dim would force anyway. Result is oracle-equal to the
        // plain join; the salt must vanish from the output.
        val ev = t(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("value"), col("event_id"))
        val dim = t(s, dir, "customer")
          .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
        // DEFAULT: plain sort-merge join in the no-broadcast regime,
        // relying on AQE's reactive skew handling. The r10 A/B measured
        // static salting 1.7–4.1× SLOWER here (sf100 19.3 vs 11.4 s,
        // sf10 20.3 vs 5.0 s, bench/j10_*_r10.json): this workload's
        // hotness is UNIFORM — all 150 user keys are equally hot, so
        // after the shuffle every partition is the same size, AQE has
        // nothing to split, and the 16× dimension replication plus the
        // wider join key are pure overhead. Salting (SkewFunctions
        // .saltedJoin, SPARK_GRAFT_J10_VARIANT=salted) remains the right
        // tool for its actual premise — ONE pathological key (a null
        // surrogate, an "unknown user") funneling a partition — which
        // this table does not exhibit; SkewFunctionsSpec pins those
        // semantics and the A/B stays reproducible via the toggle.
        val joined = sys.env.get("SPARK_GRAFT_J10_VARIANT") match {
          case Some("salted") => graft.functions.SkewFunctions
            .saltedJoin(ev, dim, "user_id", col("event_id"), 16)
          case _ => ev.join(dim.hint("merge"), Seq("user_id"))
        }
        joined
          .groupBy(col("c_mktsegment"), col("event_type"))
          .agg(
            count(lit(1)).as("n_events"),
            sum(dec(col("value"))).cast("double").as("value_sum"))
      },
      Some("""SELECT c_mktsegment, event_type, count(*) AS n_events,
                     sum(value::DECIMAL(18,2))::DOUBLE AS value_sum
              FROM events JOIN customer ON user_id = c_custkey
              GROUP BY c_mktsegment, event_type"""),
      doc = "Skew: AQE join in the no-broadcast regime (salted variant A/B'd, kept via env)"),

    Q(
      "a14_mergeable_sketches",
      (s, dir) => {
        // MERGEABLE SKETCH STATE — the incremental-profile pattern a13
        // verifies pointwise, completed: per-shard (here per-event_type)
        // HLL sketches are built ONCE, kept as binary columns, and the
        // corpus-level cardinality comes from MERGING the sketches
        // (`hll_union_agg`), never from re-scanning the shards. At
        // 100 TB this is how a daily profile absorbs a new partition:
        // sketch the increment, union with the stored state — cost is
        // sketch-count, not corpus size. HLL union of same-config
        // sketches is lossless, so the merged estimate carries the same
        // error envelope as a direct global sketch; the exact sides
        // (countDistinct per group + global) exist here to CHECK both
        // envelopes, and the oracle recomputes them and expects every
        // contract boolean TRUE (sketches are engine-specific; their
        // CONTRACT is what an independent engine can verify).
        val e = t(s, dir, "events")
        // (r15 A/B: splitting countDistinct from the sketch aggregate —
        // the a13 Expand-removal pattern — measured SLOWER here (0.75 vs
        // 0.48 s noop-actioned at sf0.1): HLL sketch updates are cheap
        // enough that the Expand's doubled rows cost less than the extra
        // aggregate + join stages. Kept fused; the pattern pays only
        // when the co-resident buffers are expensive holistic ones.)
        val per = e.groupBy(col("event_type"))
          .agg(
            hll_sketch_agg(col("user_id"), 14).as("sk"),
            countDistinct(col("user_id")).as("n_users"))
        val perOut = per.select(
          col("event_type"), col("n_users"),
          (abs(hll_sketch_estimate(col("sk")) - col("n_users"))
            <= col("n_users") * 0.05 + 4).as("hll_ok"))
        val merged = per.agg(
            hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
          .crossJoin(e.agg(countDistinct(col("user_id")).as("n_users")))
          .select(
            lit("__all__").as("event_type"), col("n_users"),
            (abs(col("est") - col("n_users"))
              <= col("n_users") * 0.05 + 4).as("hll_ok"))
        perOut.unionByName(merged)
      },
      Some("""SELECT event_type, count(DISTINCT user_id) AS n_users, TRUE AS hll_ok
              FROM events GROUP BY event_type
              UNION ALL
              SELECT '__all__', count(DISTINCT user_id), TRUE FROM events"""),
      doc = "Sketches: per-shard HLL state merged via hll_union_agg, both envelopes contract-checked")
  )
}
