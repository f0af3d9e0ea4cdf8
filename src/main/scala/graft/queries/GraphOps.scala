package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables.t

/** Graph analytics over the synthetic star schema: PageRank on the
  * customer↔supplier co-purchase graph (who bought from whom, via
  * orders ⋈ lineitem).
  *
  * Engine-extension rationale: a corpus pipeline ranks domains/authors by
  * link structure for quality priors (Common-Crawl-style harvesting); the
  * operator shape — iterated sparse-matrix-vector products as edge joins —
  * is the same.
  */
object GraphOps {

  /** Fixed-point PageRank: ranks are BIGINT trillionths, every step is
    * integer floor arithmetic (`div`), so partial-aggregation order can
    * never move a bit and the DuckDB oracle hash-matches exactly. (The
    * floors leak ~1 unit of mass per node per iteration — a 1e-12-scale
    * bias identical in both engines; classic double-precision PageRank
    * would instead be non-reproducible ACROSS RUNS of the same engine.)
    *
    * Scale shape: the rank vector is |nodes| rows; each iteration is one
    * join of edges (partitioned by src) against it plus a map-side-
    * combined sum over dst. Three fixed iterations unroll into the plan —
    * at 100 TB you'd checkpoint between them; the shape per iteration is
    * unchanged.
    */
  def pagerank(edges: DataFrame, iters: Int): DataFrame = {
    val spark = edges.sparkSession
    // GraphX/Pregel layout: the adjacency list (outdeg folded in) is
    // hash-partitioned by src ONCE and checkpointed; each iteration then
    // shuffles only the |nodes|-sized rank vector into that partitioning
    // (localCheckpoint preserves outputPartitioning, so EnsureRequirements
    // inserts no exchange on the edge side). The per-iteration edge
    // re-shuffle this replaces was the dominant sf100 cost — the
    // contribution aggregation's dst exchange is the one irreducible
    // |edges| shuffle per iteration (that IS the sparse matrix-vector
    // product). An earlier form also checkpointed the full directed
    // STRING-keyed edge list, which blew local disk at sf100.
    val e = edges.select(col("src"), col("dst"))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // the src-join's own output partitioning (hash on src) survives the
    // checkpoint, and HashPartitioning(src, anyN) satisfies the iteration
    // joins' ClusteredDistribution — EnsureRequirements shuffles only the
    // rank side, at the checkpoint's partition count
    val adj = e.join(deg, "src").localCheckpoint(false)
    // nodes/deg re-read the src-partitioned checkpoint: distinct(src)
    // needs no exchange there, and nothing recomputes the edge derivation
    val nodes = adj.select(col("src").as("id")).distinct().localCheckpoint(false)
    val n = nodes.count()
    val teleport = (150000000000L / n) * 1L // 0.15 * 1e12, floored once
    var pr = nodes.select(col("id"), lit(1000000000000L / n).as("pr"))
    for (_ <- 1 to iters) {
      val inflow = adj.join(pr, pr("id") === adj("src"))
        .select(col("dst"), expr("pr div outdeg").as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("inflow"))
      pr = nodes.join(inflow, nodes("id") === inflow("dst"), "left")
        .select(nodes("id"),
          (lit(teleport) + expr("(85 * coalesce(inflow, 0L)) div 100")).as("pr"))
    }
    pr
  }

  def qs: Seq[Q] = Seq(
    Q(
      "g1_pagerank",
      (s, dir) => {
        // undirected bipartite co-purchase graph: c<->s whenever customer
        // c ordered a line from supplier s. Integer namespacing (2k for
        // customers, 2k+1 for suppliers) keeps the key spaces disjoint at
        // 16 bytes/edge — the string form ("c123") cost ~2.5x the block
        // store and hit disk-full at sf100. The distinct pair set is
        // checkpointed because pagerank's adjacency build consumes the
        // edge frame twice (degree + probe); pagerank then pins the
        // src-partitioned adjacency for the iterations.
        val ce = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
          .join(t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey").cast("long") * 2).as("c"),
            (col("l_suppkey").cast("long") * 2 + 1).as("s"))
          .distinct()
          .localCheckpoint(false)
        val edges = ce.select(col("c").as("src"), col("s").as("dst"))
          .unionAll(ce.select(col("s").as("src"), col("c").as("dst")))
        pagerank(edges, 3)
      },
      Some("""WITH ce AS (SELECT DISTINCT 2 * o_custkey AS c, 2 * l_suppkey + 1 AS s
                FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
              edges AS (SELECT c AS src, s AS dst FROM ce
                        UNION ALL SELECT s AS src, c AS dst FROM ce),
              nodes AS (SELECT DISTINCT src AS id FROM edges),
              nn AS (SELECT count(*) AS n FROM nodes),
              deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
              p0 AS (SELECT id, (1000000000000 // nn.n) AS pr FROM nodes, nn),
              c1 AS (SELECT e.dst AS id, sum(p.pr // d.outdeg) AS inflow
                     FROM edges e JOIN deg d ON d.src = e.src
                          JOIN p0 p ON p.id = e.src GROUP BY e.dst),
              p1 AS (SELECT nodes.id,
                       ((150000000000 // nn.n) + (85 * coalesce(c1.inflow, 0)) // 100) AS pr
                     FROM nodes CROSS JOIN nn LEFT JOIN c1 ON c1.id = nodes.id),
              c2 AS (SELECT e.dst AS id, sum(p.pr // d.outdeg) AS inflow
                     FROM edges e JOIN deg d ON d.src = e.src
                          JOIN p1 p ON p.id = e.src GROUP BY e.dst),
              p2 AS (SELECT nodes.id,
                       ((150000000000 // nn.n) + (85 * coalesce(c2.inflow, 0)) // 100) AS pr
                     FROM nodes CROSS JOIN nn LEFT JOIN c2 ON c2.id = nodes.id),
              c3 AS (SELECT e.dst AS id, sum(p.pr // d.outdeg) AS inflow
                     FROM edges e JOIN deg d ON d.src = e.src
                          JOIN p2 p ON p.id = e.src GROUP BY e.dst),
              p3 AS (SELECT nodes.id,
                       ((150000000000 // nn.n) + (85 * coalesce(c3.inflow, 0)) // 100) AS pr
                     FROM nodes CROSS JOIN nn LEFT JOIN c3 ON c3.id = nodes.id)
              SELECT id, CAST(pr AS BIGINT) AS pr FROM p3"""),
      doc = "Graph: fixed-point integer PageRank (3 unrolled iterations, hash-exact)"))
}
