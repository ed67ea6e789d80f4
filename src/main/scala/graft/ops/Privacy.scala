package graft.ops

import graft.{QueryDef, Tables}
import graft.Dsl._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy / statistical-disclosure-control operators (round 11): the
  * compliance steps a training-data pipeline runs before data leaves
  * the curated zone — re-identification risk census (k-anonymity),
  * attribute-disclosure census (l-diversity), per-user contribution
  * capping (the deterministic prep step of user-level DP accounting),
  * and small-cell suppression with complementary suppression (the
  * classic SDC publish gate for cross-tabulations).
  *
  * House rules apply throughout: exact integer math only (money via
  * DECIMAL(18,2)→cents), total output order with explicit null
  * placement, census-grain outputs whose row count is value-bounded —
  * class-SIZE histograms and cell tables, never per-row dumps — so the
  * graded surface is scale-invariant while the scan underneath is the
  * full corpus.
  */
object Privacy {

  /** k-anonymity census over the customer quasi-identifier
    * (nation, market segment, $1000 account-balance bucket): the
    * size histogram of QI equivalence classes. A released row is
    * k-anonymous iff its class holds ≥ k rows, so this histogram IS
    * the re-identification risk report — `n_rows` at class_size 1 are
    * unique individuals, class_size < 5 is the conventional "at risk"
    * band. `rep_checksum` (sum of each class's minimum custkey) pins
    * exactly WHICH classes landed in each size bucket, not just how
    * many.
    *
    * Scale: one shuffle to QI grain (partial aggs map-side), then a
    * census to size grain — the output is bounded by the number of
    * DISTINCT class sizes (≤ √(2·rows): sizes are distinct positive
    * integers summing to the row count), not by rows or classes.
    *
    * Determinism: bal_bucket floor-divides exact cents (negative
    * balances floor toward −∞ on both engines via the pmod
    * construction — DuckDB `//` truncates toward zero and must not be
    * used bare on signed cents).
    */
  private val privKanon = QueryDef(
    "q_priv_kanon",
    (s, d) => {
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
          floorDiv((dec(col("c_acctbal")) * 100).cast("long"), 100000L)
            .as("bal_bucket"))
      val classes = cust
        .groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_bucket"))
        .agg(count(lit(1)).as("class_size"),
          min(col("c_custkey")).as("rep_key"))
      classes.groupBy(col("class_size"))
        .agg(count(lit(1)).as("n_classes"),
          // mod-sum checksum: a raw sum of corpus-scale keys over ~1e9
          // classes crosses int64, where Spark wraps and DuckDB widens
          // to HUGEINT — divergent failure modes. The decimal-staged
          // mod keeps the pin exact and bounded at every scale.
          expr("cast(sum(cast(rep_key as decimal(38,0))) % 1000000007" +
            " as bigint)").as("rep_checksum"))
        .withColumn("n_rows", col("class_size") * col("n_classes"))
        .select(col("class_size"), col("n_classes"), col("n_rows"),
          col("rep_checksum"))
        .orderBy(ascf("class_size"))
    },
    Some("""WITH q AS (SELECT c_custkey, c_nationkey, c_mktsegment,
           |    (cents - ((cents % 100000 + 100000) % 100000)) // 100000
           |      AS bal_bucket
           |  FROM (SELECT c_custkey, c_nationkey, c_mktsegment,
           |      CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
           |        AS cents FROM customer)),
           |cls AS (SELECT c_nationkey, c_mktsegment, bal_bucket,
           |    CAST(count(*) AS BIGINT) AS class_size,
           |    min(c_custkey) AS rep_key
           |  FROM q GROUP BY 1, 2, 3)
           |SELECT class_size, CAST(count(*) AS BIGINT) AS n_classes,
           |  class_size * CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(sum(CAST(rep_key AS HUGEINT)) % 1000000007 AS BIGINT)
           |    AS rep_checksum
           |FROM cls GROUP BY class_size
           |ORDER BY class_size ASC NULLS FIRST""".stripMargin))

  /** l-diversity census: orders joined to their customers, QI class =
    * the SAME (nation, market segment, $1000 balance bucket) triple
    * q_priv_kanon censuses, sensitive attribute = order priority.
    * A class is l-diverse iff it contains ≥ l distinct sensitive
    * values; classes with small l leak the attribute ("everyone in
    * this cell ordered URGENT") even when k-anonymity holds — the
    * standard second check after q_priv_kanon, run on the same QI so
    * the two reports compose. Output: histogram of classes by their
    * exact distinct-priority count l, with order volume and a
    * min-orderkey checksum per band.
    *
    * Scale: the orders→customer join shuffles on the join key once;
    * the distinct count runs at (nation, seg, priority) grain FIRST
    * (map-side partials collapse duplicate priorities early, the
    * two-level distinct-aggregation shape), so no per-class set state
    * ever materializes. Output bounded by l ≤ 5 priorities.
    */
  private val privLdiv = QueryDef(
    "q_priv_ldiv",
    (s, d) => {
      val oc = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
        .join(Tables.customer(s, d)
            .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
              floorDiv((dec(col("c_acctbal")) * 100).cast("long"), 100000L)
                .as("bal_bucket")),
          col("o_custkey") === col("c_custkey"))
      val cell = oc
        .groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_bucket"),
          col("o_orderpriority"))
        .agg(count(lit(1)).as("n_ord"), min(col("o_orderkey")).as("mk"))
      val cls = cell
        .groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_bucket"))
        .agg(count(lit(1)).as("l"), sum(col("n_ord")).as("n_orders"),
          min(col("mk")).as("rep_key"))
      cls.groupBy(col("l"))
        .agg(count(lit(1)).as("n_classes"),
          sum(col("n_orders")).as("n_rows"),
          // mod-sum checksum (see q_priv_kanon)
          expr("cast(sum(cast(rep_key as decimal(38,0))) % 1000000007" +
            " as bigint)").as("rep_checksum"))
        .orderBy(ascf("l"))
    },
    Some("""WITH cust AS (SELECT c_custkey, c_nationkey, c_mktsegment,
           |    (cents - ((cents % 100000 + 100000) % 100000)) // 100000
           |      AS bal_bucket
           |  FROM (SELECT c_custkey, c_nationkey, c_mktsegment,
           |      CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
           |        AS cents FROM customer)),
           |cell AS (SELECT c_nationkey, c_mktsegment, bal_bucket,
           |    o_orderpriority,
           |    CAST(count(*) AS BIGINT) AS n_ord,
           |    min(o_orderkey) AS mk
           |  FROM orders JOIN cust ON o_custkey = c_custkey
           |  GROUP BY 1, 2, 3, 4),
           |cls AS (SELECT c_nationkey, c_mktsegment, bal_bucket,
           |    CAST(count(*) AS BIGINT) AS l,
           |    CAST(sum(n_ord) AS BIGINT) AS n_orders,
           |    min(mk) AS rep_key
           |  FROM cell GROUP BY 1, 2, 3)
           |SELECT l, CAST(count(*) AS BIGINT) AS n_classes,
           |  CAST(sum(n_orders) AS BIGINT) AS n_rows,
           |  CAST(sum(CAST(rep_key AS HUGEINT)) % 1000000007 AS BIGINT)
           |    AS rep_checksum
           |FROM cls GROUP BY l ORDER BY l ASC NULLS FIRST""".stripMargin))

  /** Per-user contribution capping (DP prep): keep each user's FIRST
    * C = 20 events in (ts, event_id) order and census the kept stream
    * per event type against the raw one. User-level differential
    * privacy bounds each individual's influence on every released
    * statistic BEFORE noise is calibrated — the capping itself must be
    * deterministic and order-stable or the sensitivity bound is a lie
    * under re-partitioning; first-C-by-time is that rule (a sampled or
    * arrival-order cap changes across runs). The capped/raw deltas per
    * type are exactly the statistic a privacy engineer inspects to
    * pick C.
    *
    * Scale: ONE window partitioned by user_id (never a global order);
    * heavy users are single-partition-bounded by their own event
    * counts, and the census is a partial-agg rollup to the ≤5 event
    * types.
    */
  private val privClip = QueryDef(
    "q_priv_clip",
    (s, d) => {
      val C = 20
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          (dec(col("value")) * 100).cast("long").as("cents"), col("ts"))
      val ranked = ev.withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id"))
          .orderBy(ascf(col("ts")), ascf("event_id"))))
      ranked.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_raw"),
          sum((col("rn") <= C).cast("long")).as("n_capped"),
          sum(col("cents")).as("cents_raw"),
          sum(when(col("rn") <= C, col("cents")).otherwise(0L))
            .as("cents_capped"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(ascf("event_type"))
    },
    Some("""WITH r AS (SELECT event_type, user_id,
           |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
           |    row_number() OVER (PARTITION BY user_id
           |      ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST)
           |      AS rn
           |  FROM events)
           |SELECT event_type, CAST(count(*) AS BIGINT) AS n_raw,
           |  CAST(sum(CASE WHEN rn <= 20 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_capped,
           |  CAST(sum(cents) AS BIGINT) AS cents_raw,
           |  CAST(sum(CASE WHEN rn <= 20 THEN cents ELSE 0 END) AS BIGINT)
           |    AS cents_capped,
           |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
           |FROM r GROUP BY event_type
           |ORDER BY event_type ASC NULLS FIRST""".stripMargin))

  /** Small-cell suppression with complementary suppression: the
    * nation × market-segment cross-tabulation of customers, published
    * only where the cell holds ≥ k = 10 individuals. Primary
    * suppression alone is insufficient — when a nation has exactly ONE
    * suppressed cell, its value is recoverable by subtracting the
    * published cells from the nation margin, so the smallest published
    * cell (ties broken by segment name) is suppressed WITH it. All
    * suppressed cells of a nation collapse into one 'SUPPRESSED' row
    * carrying their combined count and cents, so the published margins
    * stay exactly consistent — the property q_priv_suppress's spec
    * asserts and the classic SDC requirement.
    *
    * Scale: cells grain is |nations|×|segments| (value-bounded); both
    * windows run at cell grain. The corpus pass is the one groupBy.
    */
  private val privSuppress = QueryDef(
    "q_priv_suppress",
    (s, d) => {
      val k = 10
      val cells = Tables.customer(s, d)
        .select(col("c_nationkey"), col("c_mktsegment"),
          (dec(col("c_acctbal")) * 100).cast("long").as("cents"))
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
      val wNat = Window.partitionBy(col("c_nationkey"))
      val marked = cells
        .withColumn("prim", (col("n") < k).cast("long"))
        .withColumn("n_supp", sum(col("prim")).over(wNat))
        // published cells (prim = 0) rank first, smallest n first
        .withColumn("rk", row_number().over(wNat.orderBy(
          ascf("prim"), ascf("n"), ascf("c_mktsegment"))))
        .withColumn("supp",
          (col("prim") === 1L ||
            (col("n_supp") === 1L && col("prim") === 0L && col("rk") === 1L))
            .cast("long"))
      marked
        .withColumn("segment",
          when(col("supp") === 1L, lit("SUPPRESSED"))
            .otherwise(col("c_mktsegment")))
        .groupBy(col("c_nationkey"), col("segment"))
        .agg(sum(col("n")).as("n"), sum(col("cents")).as("cents"),
          count(lit(1)).as("n_cells"))
        .orderBy(ascf("c_nationkey"), ascf("segment"))
    },
    Some("""WITH cells AS (SELECT c_nationkey, c_mktsegment,
           |    CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
           |      AS BIGINT)) AS BIGINT) AS cents
           |  FROM customer GROUP BY 1, 2),
           |m AS (SELECT *,
           |    CASE WHEN n < 10 THEN 1 ELSE 0 END AS prim,
           |    CAST(sum(CASE WHEN n < 10 THEN 1 ELSE 0 END)
           |      OVER (PARTITION BY c_nationkey) AS BIGINT) AS n_supp,
           |    row_number() OVER (PARTITION BY c_nationkey
           |      ORDER BY CASE WHEN n < 10 THEN 1 ELSE 0 END ASC,
           |        n ASC, c_mktsegment ASC NULLS FIRST) AS rk
           |  FROM cells),
           |s AS (SELECT c_nationkey, n, cents,
           |    CASE WHEN prim = 1 OR (n_supp = 1 AND prim = 0 AND rk = 1)
           |      THEN 'SUPPRESSED' ELSE c_mktsegment END AS segment
           |  FROM m)
           |SELECT c_nationkey, segment, CAST(sum(n) AS BIGINT) AS n,
           |  CAST(sum(cents) AS BIGINT) AS cents,
           |  CAST(count(*) AS BIGINT) AS n_cells
           |FROM s GROUP BY 1, 2
           |ORDER BY c_nationkey ASC NULLS FIRST,
           |  segment ASC NULLS FIRST""".stripMargin))

  /** Keyed consistent pseudonymization with a referential-integrity
    * proof: customer keys and order foreign keys are INDEPENDENTLY
    * mapped through the same keyed hash chain (two mod-prime
    * xor-shift rounds packed into a 62-bit pseudonym — the q_sketch_kmv
    * chain with a second lane), the original key is dropped, and the
    * pseudonymized fact joins the pseudonymized dimension ON THE
    * PSEUDONYM ONLY. The graded census proves what a GDPR-style
    * pipeline must prove: the mapping is consistent across tables
    * (every order matches — an orphan would surface as a NULL-segment
    * row and break the hash) and injective on the key domain
    * (n_cust = n_pid per segment; a collision would shrink n_pid and
    * fan the join out). pid_checksum pins the exact mapping.
    *
    * Scale: one shuffle join on the pseudonym (same co-partitioned
    * shape as the raw-key join — pseudonymization must not change the
    * join plan, and this proves it doesn't); censuses are partial-agg
    * rollups. The 62-bit space keeps birthday collisions ~n²/2⁶³ —
    * ~5e-5 expected at 1e9 customers (and a collision is DETECTED by
    * the census, not silently absorbed).
    *
    * Determinism: pure integer hash both engines mirror exactly.
    */
  private val privPseudonym = QueryDef(
    "q_priv_pseudonym",
    (s, d) => {
      val P = 2147483647L
      def pid(k: String): String = {
        val g1 = s"((($k % $P) * 15485863 + 101) % $P)"
        val h1 = s"((($g1 ^ ($g1 div 8192)) * 32452843 + 1009) % $P)"
        val g2 = s"((($k % $P) * 15485867 + 211) % $P)"
        val h2 = s"((($g2 ^ ($g2 div 8192)) * 32452867 + 2003) % $P)"
        s"($h1 * 2147483648L + $h2)"
      }
      val dim = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))
        .withColumn("pid", expr(pid("c_custkey")))
        .select(col("pid"), col("c_mktsegment"))
      val fact = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"))
        .withColumn("pid", expr(pid("o_custkey")))
        .select(col("o_orderkey"), col("pid"))
      val matched = fact.join(dim, Seq("pid"), "left")
      val custCensus = dim
        .groupBy(col("c_mktsegment").as("seg2"))
        .agg(count(lit(1)).as("n_cust"),
          countDistinct(col("pid")).as("n_pid"),
          sum(pmod(col("pid"), lit(1000003L))).as("pid_checksum"))
      matched
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          // mod-sum checksum (see q_priv_kanon)
          expr("cast(sum(cast(o_orderkey as decimal(38,0))) % 1000000007" +
            " as bigint)").as("order_checksum"))
        .join(custCensus, col("c_mktsegment") === col("seg2"), "full")
        .select(coalesce(col("c_mktsegment"), col("seg2")).as("segment"),
          col("n_orders"),
          col("order_checksum"), col("n_cust"), col("n_pid"),
          col("pid_checksum"))
        .orderBy(ascf("segment"))
    },
    Some("""WITH dim AS (SELECT c_mktsegment,
           |    ((xor((((c_custkey % 2147483647) * 15485863 + 101)
           |          % 2147483647),
           |        (((c_custkey % 2147483647) * 15485863 + 101)
           |          % 2147483647) // 8192)
           |      * 32452843 + 1009) % 2147483647) * 2147483648
           |    + ((xor((((c_custkey % 2147483647) * 15485867 + 211)
           |          % 2147483647),
           |        (((c_custkey % 2147483647) * 15485867 + 211)
           |          % 2147483647) // 8192)
           |      * 32452867 + 2003) % 2147483647) AS pid
           |  FROM customer),
           |fact AS (SELECT o_orderkey,
           |    ((xor((((o_custkey % 2147483647) * 15485863 + 101)
           |          % 2147483647),
           |        (((o_custkey % 2147483647) * 15485863 + 101)
           |          % 2147483647) // 8192)
           |      * 32452843 + 1009) % 2147483647) * 2147483648
           |    + ((xor((((o_custkey % 2147483647) * 15485867 + 211)
           |          % 2147483647),
           |        (((o_custkey % 2147483647) * 15485867 + 211)
           |          % 2147483647) // 8192)
           |      * 32452867 + 2003) % 2147483647) AS pid
           |  FROM orders),
           |m AS (SELECT fact.o_orderkey, dim.c_mktsegment
           |  FROM fact LEFT JOIN dim ON fact.pid = dim.pid),
           |oc AS (SELECT c_mktsegment AS seg1,
           |    CAST(count(*) AS BIGINT) AS n_orders,
           |    CAST(sum(CAST(o_orderkey AS HUGEINT)) % 1000000007
           |      AS BIGINT) AS order_checksum
           |  FROM m GROUP BY 1),
           |cc AS (SELECT c_mktsegment AS seg2,
           |    CAST(count(*) AS BIGINT) AS n_cust,
           |    CAST(count(DISTINCT pid) AS BIGINT) AS n_pid,
           |    CAST(sum(pid % 1000003) AS BIGINT) AS pid_checksum
           |  FROM dim GROUP BY 1)
           |SELECT coalesce(seg1, seg2) AS segment, n_orders,
           |  order_checksum, n_cust, n_pid, pid_checksum
           |FROM oc FULL JOIN cc ON seg1 = seg2
           |ORDER BY segment ASC NULLS FIRST""".stripMargin))

  /** Differentially-private release DRY-RUN: the geometric mechanism
    * applied to the contribution-capped per-type event histogram, with
    * the noise draw made REPRODUCIBLE by seeding the uniform from a
    * keyed hash of the release cell — exactly how production DP
    * engines audit a release before shipping it (same pipeline, fixed
    * seed, so the privacy engineer can diff runs; the production draw
    * swaps the seed for entropy and nothing else changes).
    *
    * Mechanism: two-sided geometric noise = G(u1) − G(u2) with
    * G(u) = floor((ln u − ln 2³¹)/ln α), α = 9/10 — the discrete
    * analogue of Laplace; with per-user contribution capped at C = 20
    * (q_priv_clip's rule) the release satisfies ε = C·ln(1/α) ≈ 2.1
    * user-level DP when the uniforms are real entropy. u1/u2 come from
    * the keyed two-round mod-prime chain on the cell id; ln is
    * DetMath.lnInt (D12 — no libm on the graded surface; the α and 2³¹
    * constants inline as lnIntScalar literals, bit-identical to the
    * column tree).
    *
    * Scale: the corpus pass is the clip window + rollup; everything
    * after runs on the ≤5-row cell census (the tiny window sits above
    * an aggregate — value-bounded per the plan rule).
    */
  private val privDpRelease = QueryDef(
    "q_priv_dp_release",
    (s, d) => {
      val C = 20
      val P = 2147483647L
      val lnM = graft.functions.DetMath.lnIntScalar(2147483648L)
      val lnA = graft.functions.DetMath.lnIntScalar(9L) -
        graft.functions.DetMath.lnIntScalar(10L)
      val epsE6 = math.floor(C * -lnA * 1000000).toLong
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts"))
      val ranked = ev.withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id"))
          .orderBy(ascf(col("ts")), ascf("event_id"))))
      val cells = ranked.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_raw"),
          sum((col("rn") <= C).cast("long")).as("n_capped"))
        .withColumn("cid", row_number().over(
          Window.orderBy(ascf("event_type"))).cast("long"))
      def lane(seedExpr: String): String = {
        val g1 = s"((($seedExpr) % $P) * 15485863 + 101) % $P"
        s"((((($g1) ^ (($g1) div 8192)) * 32452843 + 1009) % $P) + 1)"
      }
      val noised = cells
        .withColumn("u1", expr(lane("cid * 2 + 777")))
        .withColumn("u2", expr(lane("cid * 2 + 778")))
        .withColumn("g1v", floor(
          (graft.functions.DetMath.lnInt(col("u1")) - lit(lnM)) / lit(lnA))
          .cast("long"))
        .withColumn("g2v", floor(
          (graft.functions.DetMath.lnInt(col("u2")) - lit(lnM)) / lit(lnA))
          .cast("long"))
        .withColumn("noise", col("g1v") - col("g2v"))
        .withColumn("released",
          greatest(lit(0L), col("n_capped") + col("noise")))
      noised.select(col("event_type"), col("n_raw"), col("n_capped"),
          col("noise"), col("released"), lit(epsE6).as("eps_e6"))
        .orderBy(ascf("event_type"))
    },
    Some {
      val P = 2147483647L
      val lnM = graft.functions.DetMath.lnIntScalar(2147483648L)
      val lnA = graft.functions.DetMath.lnIntScalar(9L) -
        graft.functions.DetMath.lnIntScalar(10L)
      val epsE6 = math.floor(20 * -lnA * 1000000).toLong
      import graft.functions.DetMath.{kSql, mSql, zSql, hornerSql, lnSql}
      def laneSql(seed: String): String = {
        val g1 = s"((($seed) % $P) * 15485863 + 101) % $P"
        s"(((xor(($g1), ($g1) // 8192) * 32452843 + 1009) % $P) + 1)"
      }
      s"""WITH r AS (SELECT event_type,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST)
         |      AS rn
         |  FROM events),
         |cells AS (SELECT event_type,
         |    CAST(count(*) AS BIGINT) AS n_raw,
         |    CAST(sum(CASE WHEN rn <= 20 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_capped
         |  FROM r GROUP BY event_type),
         |cid AS (SELECT *, CAST(row_number() OVER
         |    (ORDER BY event_type ASC NULLS FIRST) AS BIGINT) AS cid
         |  FROM cells),
         |us AS (SELECT *, ${laneSql("cid * 2 + 777")} AS u1,
         |    ${laneSql("cid * 2 + 778")} AS u2 FROM cid),
         |k1 AS (SELECT *, ${kSql("u1")} AS ka, ${kSql("u2")} AS kb
         |  FROM us),
         |m1 AS (SELECT *, ${mSql("u1", "ka")} AS ma,
         |    ${mSql("u2", "kb")} AS mb FROM k1),
         |z1 AS (SELECT *, ${zSql("ma")} AS za, ${zSql("mb")} AS zb
         |  FROM m1),
         |z2 AS (SELECT *, (za * za) AS za2, (zb * zb) AS zb2 FROM z1),
         |h1 AS (SELECT *, ${hornerSql("za2")} AS ha,
         |    ${hornerSql("zb2")} AS hb FROM z2),
         |ln1 AS (SELECT *, ${lnSql("ka", "za", "ha")} AS lua,
         |    ${lnSql("kb", "zb", "hb")} AS lub FROM h1),
         |g AS (SELECT *,
         |    CAST(floor((lua - CAST('$lnM' AS DOUBLE))
         |      / CAST('$lnA' AS DOUBLE)) AS BIGINT) AS g1v,
         |    CAST(floor((lub - CAST('$lnM' AS DOUBLE))
         |      / CAST('$lnA' AS DOUBLE)) AS BIGINT) AS g2v
         |  FROM ln1)
         |SELECT event_type, n_raw, n_capped,
         |  (g1v - g2v) AS noise,
         |  greatest(CAST(0 AS BIGINT), n_capped + (g1v - g2v))
         |    AS released,
         |  CAST($epsE6 AS BIGINT) AS eps_e6
         |FROM g ORDER BY event_type ASC NULLS FIRST""".stripMargin
    })

  def defs: Seq[QueryDef] =
    Seq(privKanon, privLdiv, privClip, privSuppress, privPseudonym,
      privDpRelease)
}
