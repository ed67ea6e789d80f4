package graft.ops

import graft.{Caches, QueryDef, Tables}
import graft.Dsl._
import org.apache.spark.sql.functions._

/** Iterative graph analytics (round 5): weighted PageRank over the
  * customer-nation → supplier-nation trade graph.
  *
  * This is the canonical "big edge list, small node table" distributed
  * graph shape: the 100 TB-heavy step is ONE aggregation of the raw fact
  * table down to weighted node-pair edges (a single hash shuffle on
  * (src, dst)); the K rank iterations then run on the node-sized relation
  * and join back through a BROADCAST of the rank table, so no iteration
  * ever reshuffles the edges. With a node table too big to broadcast the
  * same loop runs as K hash joins on src — the edge aggregation still
  * dominates.
  *
  * Determinism (rules D2/D11/D12): all rank arithmetic is exact int64 in
  * 1e-6 units — rank' = 150000 + (85 · Σ_u floor(rank_u · w(u,v) /
  * outw(u))) div 100, every operand non-negative so Spark's truncating
  * `div` and DuckDB's floor `//` agree — and the oracle unrolls the SAME
  * K=3 iterations, so parity holds by construction (the q_dedup_components
  * fixed-K pattern). No libm anywhere. Magnitude bound: total rank mass ≤
  * nodes · 10^6 and rank·w stays < 2^63 while per-edge weights are below
  * ~3.7e11 — beyond that, widen the contribution product to DECIMAL(38,0)
  * on both engines (the q_sim_centroid moment pattern).
  */
object Graph {

  private val pagerank = QueryDef(
    "q_graph_pagerank",
    (s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      val c = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
      val sup = Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
      // the one heavy pass: fact table → ≤ nations² weighted edges
      val edges = li
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
        .agg(count(lit(1)).as("w"))
      val outw = edges.groupBy(col("src")).agg(sum(col("w")).as("outw"))
      // scoped persist: WITHOUT it each unrolled iteration re-derives the
      // edge relation from the fact table — 3 full corpus passes for a
      // ≤ n²-row relation (seen in the r5 plan dump). Cached, the fact
      // table is read once and iterations touch only node-sized data.
      val ew = Caches.scoped(edges.join(outw, "src"))
      val nodes = Tables.nation(s, d).select(col("n_nationkey").as("node"))
      var ranks = nodes.select(col("node"), lit(1000000L).as("r"))
      for (_ <- 1 to 3) {
        val contrib = ew.join(broadcast(ranks), col("src") === col("node"))
          .select(col("dst"), expr("(r * w) div outw").as("cv"))
        val sums = contrib.groupBy(col("dst")).agg(sum(col("cv")).as("sv"))
        ranks = nodes.join(sums, col("node") === col("dst"), "left")
          .select(col("node"),
            expr("150000 + (85 * coalesce(sv, bigint(0))) div 100").as("r"))
      }
      ranks
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
          col("node") === col("n_nationkey"))
        .select(col("n_name"), col("r").as("rank_e6"))
        .orderBy(ascf("n_name"))
    },
    Some("""WITH edges AS (
           |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
           |         count(*) AS w
           |  FROM lineitem l
           |  JOIN orders o ON l.l_orderkey = o.o_orderkey
           |  JOIN customer c ON o.o_custkey = c.c_custkey
           |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
           |  GROUP BY 1, 2),
           |outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS outw
           |  FROM edges GROUP BY src),
           |ew AS (SELECT e.src, e.dst, e.w, o.outw
           |  FROM edges e JOIN outw o ON e.src = o.src),
           |r0 AS (SELECT n_nationkey AS node, CAST(1000000 AS BIGINT) AS r
           |  FROM nation),
           |s1 AS (SELECT ew.dst, CAST(sum((r0.r * ew.w) // ew.outw) AS BIGINT) AS sv
           |  FROM ew JOIN r0 ON ew.src = r0.node GROUP BY ew.dst),
           |r1 AS (SELECT n.n_nationkey AS node,
           |    CAST(150000 + (85 * coalesce(s1.sv, 0)) // 100 AS BIGINT) AS r
           |  FROM nation n LEFT JOIN s1 ON n.n_nationkey = s1.dst),
           |s2 AS (SELECT ew.dst, CAST(sum((r1.r * ew.w) // ew.outw) AS BIGINT) AS sv
           |  FROM ew JOIN r1 ON ew.src = r1.node GROUP BY ew.dst),
           |r2 AS (SELECT n.n_nationkey AS node,
           |    CAST(150000 + (85 * coalesce(s2.sv, 0)) // 100 AS BIGINT) AS r
           |  FROM nation n LEFT JOIN s2 ON n.n_nationkey = s2.dst),
           |s3 AS (SELECT ew.dst, CAST(sum((r2.r * ew.w) // ew.outw) AS BIGINT) AS sv
           |  FROM ew JOIN r2 ON ew.src = r2.node GROUP BY ew.dst),
           |r3 AS (SELECT n.n_nationkey AS node,
           |    CAST(150000 + (85 * coalesce(s3.sv, 0)) // 100 AS BIGINT) AS r
           |  FROM nation n LEFT JOIN s3 ON n.n_nationkey = s3.dst)
           |SELECT n.n_name, r3.r AS rank_e6
           |FROM r3 JOIN nation n ON r3.node = n.n_nationkey
           |ORDER BY n_name ASC NULLS FIRST""".stripMargin))

  def defs: Seq[QueryDef] = Seq(pagerank)
}
