package graft.ops

import graft.{Caches, QueryDef}
import graft.Dsl._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic k-means over the quantized embedding table (round 6 —
  * VERDICT r5 #5: the semantic-dedup / topic-balance clustering pass a
  * curation pipeline runs, previously the one missing iterative op).
  *
  * Exactly gradeable by construction (the q_graph_pagerank fixed-K
  * pattern applied to clustering):
  *  - vectors are the 1e-6-quantized int64 arrays (VecOps.quantized,
  *    rule D3), so every distance is an exact int64 sum;
  *  - K seed centroids are the vectors with the smallest values of the
  *    deterministic mix hash (vec_id · 2654435761) mod 1000000007
  *    (vec_id tiebreak) — data-derived, order-free, and replicated
  *    verbatim in the oracle;
  *  - each round reassigns by exact integer argmin (distance, then
  *    cluster id on ties) and recomputes centroids with TRUNCATING
  *    integer division (Spark `div` and DuckDB `//` both truncate
  *    toward zero — verified, including negative sums — so centroids
  *    stay exact int64 and bit-identical across engines);
  *  - both engines run exactly `kmeansRounds` identical rounds, so
  *    parity holds by construction; the convergence claim itself is
  *    pinned by PropertiesSpec against a scalar replica (oracle
  *    lockstep is blind to algorithmic drift, as components taught).
  *
  * Scale shape: per round, assignment is MAP-SIDE — the K×64 centroid
  * table collapses to ONE broadcast row and the argmin runs as an
  * array HOF inside the scan (no per-cluster join, no shuffle) — and
  * the update is a single (cluster, dim) partial aggregation whose
  * shuffle carries K·64 rows per partition. The only corpus-sized
  * exchange per round is that update shuffle; nothing is ever
  * vec_id-keyed. Each round's K-row centroid relation is cached
  * scoped (its PLAN embeds all previous rounds — uncached, every
  * reference would recompute the full chain, the 2^K blowup the
  * components loop documents).
  */
object Clustering {

  /** Single source of truth for K and the round count — the Spark loop,
    * the oracle unroll, and the PropertiesSpec replica all read these.
    */
  private[graft] val kmeansK = 8
  private[graft] val kmeansRounds = 3

  /** Seed hash, spelled identically in the oracle. */
  private val seedHashSql = "(vec_id * 2654435761) % 1000000007"

  /** Fit: returns (final centroids (cluster, carr), final assignment
    * (vec_id, v, cluster, dist)) after `rounds` reassign+update rounds
    * plus one closing assignment under the final centroids. `emb` must
    * be (vec_id, v: array<bigint>); dims uniform. Extracted so the spec
    * can replay it on toy data against a scalar replica.
    */
  private[graft] def kmeansFit(emb: DataFrame, k: Int, rounds: Int)
      : (DataFrame, DataFrame) = {
    // top-K by (hash, vec_id) is a distributed TakeOrdered; the window
    // then ranks only the K survivors (never a global single-partition
    // window over the corpus)
    val seeds = emb
      .withColumn("h", expr(seedHashSql))
      .orderBy(ascf("h"), ascf("vec_id")).limit(k)
    var cent = Caches.scoped(seeds
      .withColumn("cluster",
        (row_number().over(Window.orderBy(ascf("h"), ascf("vec_id"))) - 1)
          .cast("long"))
      .select(col("cluster"), col("v").as("carr")))
    // argmin over the single collected centroid row: distances via
    // zip_with/aggregate (codegen'd), strict < keeps the smallest
    // cluster id on ties because cs is sorted by cluster
    def assign(c: DataFrame): DataFrame = {
      val cs = c.agg(array_sort(
        collect_list(struct(col("cluster").as("c"), col("carr").as("a"))))
        .as("cs"))
      emb.crossJoin(broadcast(cs))
        .withColumn("best", expr(
          """aggregate(
            |  transform(cs, x -> struct(x.c as c,
            |    aggregate(zip_with(v, x.a, (p, q) -> (p - q) * (p - q)),
            |      bigint(0), (s, t) -> s + t) as d)),
            |  struct(bigint(-1) as c, bigint(9223372036854775807) as d),
            |  (acc, x) -> IF(x.d < acc.d, x, acc))""".stripMargin))
        .select(col("vec_id"), col("v"),
          col("best.c").as("cluster"), col("best.d").as("dist"))
    }
    for (_ <- 1 to rounds) {
      val asg = assign(cent)
      val sums = asg
        .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cluster"), col("pos"))
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("cnt"))
        .withColumn("cx", expr("sx div cnt"))
      val upd = sums.groupBy(col("cluster"))
        .agg(array_sort(collect_list(struct(col("pos"), col("cx")))).as("pc"))
        .select(col("cluster"),
          transform(col("pc"), p => p.getField("cx")).as("next"))
      // empty clusters carry their centroid forward (cent always holds
      // all K rows, so the left join preserves the full cluster list)
      cent = Caches.scoped(cent
        .join(upd, Seq("cluster"), "left")
        .select(col("cluster"),
          coalesce(col("next"), col("carr")).as("carr")))
    }
    (cent, assign(cent))
  }

  /** Per-cluster census after the fixed rounds: member count, exact
    * int64 centroid checksum, and total inertia (per-vector distances
    * summed in DECIMAL(38,0)/HUGEINT — n·maxdist can brush int64 —
    * then pinned to double, rule D9/D11).
    */
  private val kmeans = QueryDef(
    "q_ml_kmeans",
    (s, d) => {
      val emb = Caches.scoped(
        VecOps.quantized(s, d).select(col("vec_id"), col("v")))
      val (cent, asg) = kmeansFit(emb, kmeansK, kmeansRounds)
      val census = asg.groupBy(col("cluster"))
        .agg(count(lit(1)).as("n_vecs"),
          sum(col("dist").cast(DecimalType(38, 0))).as("inertia"))
      cent.join(census, Seq("cluster"), "left")
        .select(col("cluster"),
          coalesce(col("n_vecs"), lit(0L)).as("n_vecs"),
          expr("aggregate(carr, bigint(0), (s, t) -> s + t)")
            .as("centroid_checksum"),
          coalesce(col("inertia").cast("double"), lit(0.0)).as("inertia"))
        .orderBy(ascf("cluster"))
    },
    Some {
      // unrolled rounds, every level MATERIALIZED: each centroid CTE is
      // referenced by the next assignment AND the carry-forward join,
      // so inlining would re-run the chain 2^K times (the components
      // oracle lesson)
      val k = kmeansK
      val assignStep = (t: Int, cIn: String, out: String) =>
        s"""${out}0 AS (SELECT n.vec_id AS vec_id, n.v AS v,
           |    c.cluster AS cluster,
           |    CAST(list_sum(list_transform(range(1, 65),
           |      k -> (n.v[k] - c.carr[k]) * (n.v[k] - c.carr[k])))
           |      AS BIGINT) AS dist
           |  FROM n, $cIn c),
           |$out AS MATERIALIZED (SELECT vec_id, v, cluster, dist FROM (
           |    SELECT vec_id, v, cluster, dist, row_number() OVER (
           |      PARTITION BY vec_id ORDER BY dist ASC, cluster ASC) AS rn
           |    FROM ${out}0) WHERE rn = 1)""".stripMargin
      val updateStep = (t: Int) =>
        s"""u$t AS (SELECT cluster, list(cx ORDER BY pos) AS carr FROM (
           |    SELECT cluster, k AS pos,
           |      CAST(sum(a$t.v[k]) // count(*) AS BIGINT) AS cx
           |    FROM a$t, range(1, 65) t(k) GROUP BY cluster, k)
           |  GROUP BY cluster),
           |c$t AS MATERIALIZED (SELECT p.cluster AS cluster,
           |    coalesce(u$t.carr, p.carr) AS carr
           |  FROM c${t - 1} p LEFT JOIN u$t ON p.cluster = u$t.cluster)""".stripMargin
      val rounds = (1 to kmeansRounds).map(t =>
        assignStep(t, s"c${t - 1}", s"a$t") + ",\n" + updateStep(t))
        .mkString(",\n")
      graft.ops.VecOps.oracleQuantized +
        s""",
           |sd AS (SELECT vec_id, v, $seedHashSql AS h FROM n),
           |c0 AS MATERIALIZED (SELECT rn - 1 AS cluster, v AS carr FROM (
           |    SELECT v, row_number() OVER (ORDER BY h ASC, vec_id ASC) AS rn
           |    FROM sd) WHERE rn <= $k),
           |$rounds,
           |${assignStep(kmeansRounds + 1, s"c$kmeansRounds", "af")},
           |g AS (SELECT cluster, count(*) AS n_vecs, sum(dist) AS inertia
           |  FROM af GROUP BY cluster)
           |SELECT c.cluster AS cluster,
           |  CAST(coalesce(g.n_vecs, 0) AS BIGINT) AS n_vecs,
           |  CAST(list_sum(c.carr) AS BIGINT) AS centroid_checksum,
           |  CAST(coalesce(g.inertia, 0) AS DOUBLE) AS inertia
           |FROM c$kmeansRounds c LEFT JOIN g ON c.cluster = g.cluster
           |ORDER BY cluster ASC NULLS FIRST""".stripMargin
    })

  def defs: Seq[QueryDef] = Seq(kmeans)
}
