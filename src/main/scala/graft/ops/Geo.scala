package graft.ops

import graft.{QueryDef, Tables}
import graft.Dsl._
import org.apache.spark.sql.functions._

/** Spatial analytics (round 7): grid-bucketed proximity joins.
  *
  * The fixtures carry no coordinate columns, so planar positions are
  * SYNTHESIZED deterministically from entity keys (the q_fn_url pattern:
  * derive the exercised column from fixture data so the oracle computes
  * the identical input): integer positions on a 10000×10000 micro-grid
  * via fixed multiplier-mod maps. All geometry is exact int64 — squared
  * Euclidean distances, no sqrt, no floating point anywhere (D2).
  *
  * The operator shape is the standard distributed spatial-join pattern:
  * bucket space into cells, replicate one (small) side into its 3×3 cell
  * neighborhood, equi-join on the cell id, THEN do exact distance math
  * on the cell-bounded candidate set — never an all-pairs theta join.
  * This is how a 100 TB point corpus joins against a facility table:
  * candidates per point are bounded by cell occupancy, the equi-join
  * shuffles on the cell key (or broadcasts the replicated small side),
  * and the distance predicate runs codegen'd on candidates only.
  */
object Geo {

  /** Cell width: 500 micro-units → a 20×20 grid over the synthetic
    * plane. A supplier within `Cell` of a customer is ALWAYS in the
    * customer's 3×3 cell neighborhood, so "nearest within one cell
    * radius" is exact for the neighborhood join (documented semantics:
    * candidates beyond one cell are out of scope, the classic bounded-
    * radius NN).
    */
  private val Cell = 500L

  private val geoGrid = QueryDef(
    "q_geo_grid",
    (s, d) => {
      val cust = Tables.customer(s, d).select(col("c_custkey"),
          col("c_nationkey"),
          pmod(col("c_custkey") * 48271, lit(10000L)).as("xc"),
          pmod(col("c_custkey") * 69621, lit(10000L)).as("yc"))
      val c = graft.Caches.scoped(cust
        .withColumn("gx", expr(s"xc div $Cell"))
        .withColumn("gy", expr(s"yc div $Cell")))
      val sup = Tables.supplier(s, d).select(col("s_suppkey"),
        pmod(col("s_suppkey") * 40503, lit(10000L)).as("xs"),
        pmod(col("s_suppkey") * 65539, lit(10000L)).as("ys"))
      // replicate the SMALL side into its 9 neighbor cells; the big
      // side keeps exactly one row per point
      val sn = sup
        .withColumn("dx", explode(sequence(lit(-1L), lit(1L))))
        .withColumn("dy", explode(sequence(lit(-1L), lit(1L))))
        .select(col("s_suppkey"), col("xs"), col("ys"),
          (expr(s"xs div $Cell") + col("dx")).as("gx"),
          (expr(s"ys div $Cell") + col("dy")).as("gy"))
      val cand = c.join(broadcast(sn), Seq("gx", "gy"))
        .select(col("c_custkey"),
          ((col("xc") - col("xs")) * (col("xc") - col("xs")) +
            (col("yc") - col("ys")) * (col("yc") - col("ys"))).as("d2"))
      // min, not a window rank: the census grades the DISTANCE, so the
      // per-point reduction is a partial-aggregable min (map-side
      // combine on the candidate set, no per-point sort)
      val best = cand.groupBy(col("c_custkey")).agg(min(col("d2")).as("d2"))
      c.join(best, Seq("c_custkey"), "left")
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
          sum(when(col("d2").isNotNull, 1L).otherwise(0L)).as("n_matched"),
          coalesce(sum(col("d2")), lit(0L)).as("sum_d2"),
          coalesce(max(col("d2")), lit(0L)).as("max_d2"))
        .orderBy(ascf("n_name"))
    },
    Some(s"""WITH c AS (SELECT c_custkey, c_nationkey,
           |    (c_custkey * 48271) % 10000 AS xc,
           |    (c_custkey * 69621) % 10000 AS yc
           |  FROM customer),
           |cg AS (SELECT c.*, xc // $Cell AS gx, yc // $Cell AS gy FROM c),
           |s AS (SELECT s_suppkey,
           |    (s_suppkey * 40503) % 10000 AS xs,
           |    (s_suppkey * 65539) % 10000 AS ys
           |  FROM supplier),
           |sn AS (SELECT s.s_suppkey, s.xs, s.ys,
           |    xs // $Cell + dx.d AS gx, ys // $Cell + dy.d AS gy
           |  FROM s
           |  CROSS JOIN (SELECT unnest(range(-1, 2)) AS d) dx
           |  CROSS JOIN (SELECT unnest(range(-1, 2)) AS d) dy),
           |cand AS (SELECT cg.c_custkey, cg.c_nationkey, sn.s_suppkey,
           |    (cg.xc - sn.xs) * (cg.xc - sn.xs)
           |      + (cg.yc - sn.ys) * (cg.yc - sn.ys) AS d2
           |  FROM cg JOIN sn ON cg.gx = sn.gx AND cg.gy = sn.gy),
           |best AS (SELECT c_custkey, min(d2) AS d2
           |  FROM cand GROUP BY c_custkey),
           |j AS (SELECT cg.c_nationkey, b.d2
           |  FROM cg LEFT JOIN best b ON cg.c_custkey = b.c_custkey)
           |SELECT n.n_name,
           |  CAST(count(*) AS BIGINT) AS n_customers,
           |  CAST(sum(CASE WHEN d2 IS NULL THEN 0 ELSE 1 END) AS BIGINT)
           |    AS n_matched,
           |  CAST(coalesce(sum(d2), 0) AS BIGINT) AS sum_d2,
           |  CAST(coalesce(max(d2), 0) AS BIGINT) AS max_d2
           |FROM j JOIN nation n ON j.c_nationkey = n.n_nationkey
           |GROUP BY n.n_name
           |ORDER BY n_name ASC NULLS FIRST""".stripMargin))

  /** Trajectory length census (round 7): treat each order's lineitems
    * as a route visiting its suppliers' positions in line-number order,
    * and measure the Manhattan path length — the GPS-trace /
    * delivery-route aggregation shape (per-entity ordered waypoints →
    * consecutive-segment geometry → per-entity reduction → census).
    *
    * Scale: waypoint ordering is a window partitioned by the route key
    * — routes sort independently and in parallel, nothing crosses
    * routes; the supplier position map rides a broadcast; the final
    * census is year-sized. One corpus shuffle (on l_orderkey), shared
    * by the window and the per-route aggregate.
    *
    * Determinism (D1/D2): Manhattan distance |dx|+|dy| is exact int64
    * (no sqrt); waypoints order by (l_linenumber, s_suppkey) which is
    * value-deterministic — remaining full-duplicate rows are
    * interchangeable and leave every segment length unchanged.
    */
  private val geoTrajectory = QueryDef(
    "q_geo_trajectory",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val sup = Tables.supplier(s, d).select(col("s_suppkey"),
        pmod(col("s_suppkey") * 40503, lit(10000L)).as("xs"),
        pmod(col("s_suppkey") * 65539, lit(10000L)).as("ys"))
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(ascf("l_linenumber"), ascf("s_suppkey"))
      val segs = li
        .withColumn("px", lag(col("xs"), 1).over(w))
        .withColumn("py", lag(col("ys"), 1).over(w))
        .withColumn("seg", when(col("px").isNull, lit(0L))
          .otherwise(abs(col("xs") - col("px")) + abs(col("ys") - col("py"))))
      val routes = segs.groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_stops"), sum(col("seg")).as("len"))
      routes.join(Tables.orders(s, d)
          .select(col("o_orderkey"),
            year(col("o_orderdate")).cast("long").as("yr")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("yr"))
        .agg(count(lit(1)).as("n_routes"),
          sum(col("n_stops")).as("n_stops"),
          sum(col("len")).as("total_len"),
          max(col("len")).as("max_len"))
        .orderBy(ascf("yr"))
    },
    Some("""WITH sup AS (SELECT s_suppkey,
           |    (s_suppkey * 40503) % 10000 AS xs,
           |    (s_suppkey * 65539) % 10000 AS ys
           |  FROM supplier),
           |li AS (SELECT l.l_orderkey, l.l_linenumber, sup.s_suppkey,
           |    sup.xs, sup.ys
           |  FROM lineitem l JOIN sup ON l.l_suppkey = sup.s_suppkey),
           |segs AS (SELECT l_orderkey,
           |    CASE WHEN lag(xs) OVER w IS NULL THEN 0
           |      ELSE abs(xs - lag(xs) OVER w) + abs(ys - lag(ys) OVER w)
           |      END AS seg
           |  FROM li WINDOW w AS (PARTITION BY l_orderkey
           |    ORDER BY l_linenumber ASC, s_suppkey ASC)),
           |routes AS (SELECT l_orderkey, count(*) AS n_stops,
           |    sum(seg) AS len
           |  FROM segs GROUP BY l_orderkey)
           |SELECT CAST(year(o.o_orderdate) AS BIGINT) AS yr,
           |  CAST(count(*) AS BIGINT) AS n_routes,
           |  CAST(sum(r.n_stops) AS BIGINT) AS n_stops,
           |  CAST(sum(r.len) AS BIGINT) AS total_len,
           |  CAST(max(r.len) AS BIGINT) AS max_len
           |FROM routes r JOIN orders o ON r.l_orderkey = o.o_orderkey
           |GROUP BY 1
           |ORDER BY yr ASC NULLS FIRST""".stripMargin))

  def defs: Seq[QueryDef] = Seq(geoGrid, geoTrajectory)
}
