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
    val e = edges.select(col("src"), col("dst")).localCheckpoint(false)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val nodes = e.select(col("src").as("id")).distinct().localCheckpoint(false)
    val n = nodes.count()
    val teleport = (150000000000L / n) * 1L // 0.15 * 1e12, floored once
    var pr = nodes.select(col("id"), lit(1000000000000L / n).as("pr"))
    for (_ <- 1 to iters) {
      val inflow = e.join(deg, "src").join(pr, pr("id") === e("src"))
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
        // c ordered a line from supplier s. Namespaced string ids keep the
        // two key spaces disjoint.
        val ce = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
          .join(t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select(concat(lit("c"), col("o_custkey")).as("c"),
            concat(lit("s"), col("l_suppkey")).as("s"))
          .distinct()
        val edges = ce.select(col("c").as("src"), col("s").as("dst"))
          .unionAll(ce.select(col("s").as("src"), col("c").as("dst")))
        pagerank(edges, 3)
      },
      Some("""WITH ce AS (SELECT DISTINCT 'c' || o_custkey AS c, 's' || l_suppkey AS s
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
              SELECT id, pr FROM p3"""),
      doc = "Graph: fixed-point integer PageRank (3 unrolled iterations, hash-exact)"))
}
