package graft.ops

import graft.{QueryDef, Tables}
import graft.Dsl._
import org.apache.spark.sql.functions._

/** Oracle-checkable sketches (round 5).
  *
  * The surface's other sketches (`q_agg_approx_distinct`,
  * `q_dedup_fuzzy_minhash`, `q_dedup_simhash`) are engine-hash-specific
  * and therefore graded by property suites only. A count-min sketch has
  * no such excuse: its hash family can be spelled out as plain integer
  * arithmetic that BOTH engines evaluate bit-identically, which turns
  * the whole sketch — build AND probe — into an exact, hash-graded
  * contract entry. That is the point of this key: the heavy-hitter
  * estimation pattern with the same cross-engine guarantee as any
  * relational query.
  */
object Sketch {

  /** d=4 pairwise-independent-ish rows of w=256 columns. Row hashes are
    * h_i(u) = ((u mod P) · A_i + B_i) mod P mod 256 with P = 2³¹−1 and
    * prime multipliers A_i < 2³¹, so every intermediate stays below 2⁶²
    * — exact int64 on both engines, no overflow wrap in either (DuckDB
    * ERRORS on BIGINT overflow rather than wrapping, so staying in
    * bounds is correctness, not just determinism).
    */
  private val P = 2147483647L
  private val CaseA =
    "CASE i WHEN 0 THEN 1299721 WHEN 1 THEN 15485863 WHEN 2 THEN 32452843 ELSE 49979687 END"
  private val CaseB =
    "CASE i WHEN 0 THEN 7 WHEN 1 THEN 101 WHEN 2 THEN 1009 ELSE 10007 END"
  private val HashExpr =
    s"((u % $P) * ($CaseA) + ($CaseB)) % $P % 256"

  /** Count-min heavy hitters (round 5): build the 4×256 sketch over the
    * event stream's user ids, then probe it with the exact top-10 users
    * and report true vs estimated counts side by side (est ≥ true by
    * construction; the gap IS the sketch's collision error, graded
    * exactly since both engines run identical arithmetic).
    *
    * Scale: the build is one explode(×4) → partial agg — the shuffle
    * carries at most 4·256 cells per map partition regardless of corpus
    * size, which is the entire reason a sketch beats an exact groupBy at
    * 100 TB (the exact top-10 here is the verification harness, not the
    * production path; production reads the 1024-cell relation alone).
    * The probe side is 40 rows joined against the 1024-cell sketch.
    */
  private val countmin = QueryDef(
    "q_sketch_countmin",
    (s, d) => {
      val ev = Tables.events(s, d).select(col("user_id").as("u"))
      val lanes = explode(array((0 until 4).map(i => lit(i)): _*)).as("i")
      val sketch = ev.select(col("u"), lanes)
        .withColumn("h", expr(HashExpr))
        .groupBy(col("i"), col("h"))
        .agg(count(lit(1)).as("cell"))
      val top = ev.groupBy(col("u")).agg(count(lit(1)).as("true_cnt"))
        .orderBy(descl("true_cnt"), ascf("u"))
        .limit(10)
      top.select(col("u"), col("true_cnt"), lanes)
        .withColumn("h", expr(HashExpr))
        .join(sketch, Seq("i", "h"))
        .groupBy(col("u"), col("true_cnt"))
        .agg(min(col("cell")).as("est_cnt"))
        .select(col("u").as("user_id"), col("true_cnt"), col("est_cnt"))
        .orderBy(descl("true_cnt"), ascf("user_id"))
    },
    Some(s"""WITH ev AS (SELECT user_id AS u FROM events),
           |r AS (SELECT u, i FROM ev CROSS JOIN range(4) t(i)),
           |hh AS (SELECT u, i, $HashExpr AS h FROM r),
           |sk AS (SELECT i, h, count(*) AS cell FROM hh GROUP BY i, h),
           |top AS (SELECT u, count(*) AS true_cnt FROM ev GROUP BY u
           |  ORDER BY true_cnt DESC, u ASC LIMIT 10),
           |p AS (SELECT u, true_cnt, i FROM top CROSS JOIN range(4) t(i)),
           |ph AS (SELECT u, true_cnt, i, $HashExpr AS h FROM p)
           |SELECT ph.u AS user_id, ph.true_cnt,
           |  CAST(min(sk.cell) AS BIGINT) AS est_cnt
           |FROM ph JOIN sk ON ph.i = sk.i AND ph.h = sk.h
           |GROUP BY ph.u, ph.true_cnt
           |ORDER BY true_cnt DESC NULLS LAST, user_id ASC NULLS FIRST""".stripMargin))

  /** HLL hash: mod-prime round → xor-shift → mod-prime round. ONE
    * linear round is not enough here (unlike count-min, where only
    * per-cell collision COUNTS matter): sequential ids form an
    * arithmetic progression, a linear map sends it to another
    * arithmetic progression, and the trailing-zero MAX over a
    * progression is biased (+64% measured on 1..1500 — the ADVICE-r4
    * degenerate-hyperplane lesson again). The xor-shift between rounds
    * breaks linearity; measured raw-branch error on sequential /
    * random / 30k-sequential ids is +1% / +10% / +2.6%, inside the
    * 1.04/√256 ≈ 6.5%-σ envelope. No 64-bit wrap anywhere: g < 2³¹ and
    * both multipliers < 2²⁶, so products stay < 2⁵⁷ (DuckDB ERRORS on
    * BIGINT overflow, so in-bounds is correctness, not style).
    */
  private val HllHash1 = s"((u % $P) * 15485863 + 101) % $P"
  private def hllHash2(g: String) = s"(($g) * 32452843 + 1009) % $P"

  /** HyperLogLog distinct-count per event type (round 5): the SECOND
    * sketch graded exactly cross-engine. `q_agg_approx_distinct` uses
    * Spark's engine HLL (engine-specific hash ⇒ declared no-oracle);
    * this key spells the whole estimator out in arithmetic BOTH engines
    * evaluate bit-identically, so build AND estimate are hash-graded
    * like any relational query — the count-min argument applied to
    * cardinality estimation:
    *
    *  - m = 256 registers; register = h mod 256, rank input w = h div
    *    256 ∈ [0, 2²³);
    *  - rank ρ = trailing zeros of w + 1 (the trailing-zero variant of
    *    Flajolet's leftmost-1 — same geometric distribution), EXACT via
    *    `bit_count((w & −w) − 1) + 1`, ρ(0) ≔ 24 caps the tail;
    *  - S = Σ_r 2^(30−M_r) — the harmonic-mean denominator as an exact
    *    int64 (2³⁰-scaled: M_r ≤ 24 so every term ≥ 2⁶, empty register
    *    contributes 2³⁰); raw estimate α·m²·2³⁰/S with α_e6 = 718273
    *    (= 0.7213/(1 + 1.079/256), the standard m = 256 bias constant)
    *    via one DECIMAL(38,0)/HUGEINT staged division (numerator
    *    ≈ 5·10¹⁹ overflows int64);
    *  - small-range correction: est < 5m/2 = 640 with V > 0 empty
    *    registers switches to linear counting m·ln(m/V) = 256·(8·LN2 −
    *    lnInt(V)) — ln 256 IS 8·LN2 exactly under the `DetMath.lnInt`
    *    construction (mantissa 1 ⇒ z = 0), and floor of a product of
    *    bit-identical doubles is bit-identical. Both branches are
    *    exercised across the fixture scales (sf0.001 linear-counts,
    *    sf0.1 takes the raw branch).
    *
    * The exact distinct count rides alongside as the verification
    * harness (the m = 256 estimator's expected rel. error is
    * 1.04/√256 ≈ 6.5%); production reads the 256-cell relation alone.
    *
    * Scale: register maxima partial-aggregate on the scan — the shuffle
    * carries ≤ types·256 rows per map partition at ANY corpus size,
    * and register relations from disjoint shards MERGE by max (the
    * incremental-maintenance property q_agg_incremental grades for
    * algebraic aggregates, inherited by the sketch for free).
    */
  private val hll = QueryDef(
    "q_sketch_hll",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"), col("user_id").as("u"))
      val regMax = ev
        .withColumn("h1", expr(HllHash1))
        .withColumn("g", expr("h1 ^ shiftright(h1, 15)"))
        .withColumn("hv", expr(hllHash2("g")))
        .withColumn("r", expr("hv % 256"))
        .withColumn("w", expr("hv div 256"))
        .withColumn("rho", expr(
          "CASE WHEN w = 0 THEN 24L ELSE CAST(bit_count((w & -w) - 1) + 1 AS BIGINT) END"))
        .groupBy(col("event_type"), col("r"))
        .agg(max(col("rho")).as("mr"))
      val grid = ev.select(col("event_type")).distinct()
        .select(col("event_type"),
          explode(sequence(lit(0L), lit(255L))).as("r"))
      val stats = grid.join(regMax, Seq("event_type", "r"), "left")
        .withColumn("m", coalesce(col("mr"), lit(0L)))
        .groupBy(col("event_type"))
        .agg(
          sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(30 - m AS INT))"))
            .as("s_scaled"),
          sum(when(col("m") === 0, lit(1L)).otherwise(lit(0L)))
            .as("n_zero_regs"))
      val est = stats
        .withColumn("est_raw", expr(
          "CAST(718273 AS DECIMAL(38,0)) * 65536 * 1073741824 div s_scaled div 1000000"))
        // lnInt(256) ≡ 8·LN2 exactly (mantissa 1 ⇒ z = 0): the literal
        // is DetMath's nearest-double Ln2
        .withColumn("lc", floor(lit(256.0) *
          (lit(8.0) * lit(0.6931471805599453)
            - graft.functions.DetMath.lnInt(col("n_zero_regs"))))
          .cast("long"))
        .withColumn("est_distinct",
          when(col("est_raw") < 640 && col("n_zero_regs") > 0, col("lc"))
            .otherwise(col("est_raw")))
      val truth = ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_items"),
          countDistinct(col("u")).as("true_distinct"))
      truth.join(est, "event_type")
        .select(col("event_type"), col("n_items"), col("true_distinct"),
          col("n_zero_regs"), col("est_distinct"))
        .orderBy(ascf("event_type"))
    },
    Some {
      import graft.functions.DetMath._
      s"""WITH ev AS (SELECT event_type, user_id AS u FROM events),
         |h0 AS (SELECT event_type, $HllHash1 AS h1 FROM ev),
         |h0g AS (SELECT event_type, xor(h1, h1 >> 15) AS g FROM h0),
         |h1x AS (SELECT event_type, ${hllHash2("g")} AS hv FROM h0g),
         |h2 AS (SELECT event_type, hv % 256 AS r, hv // 256 AS w FROM h1x),
         |h3 AS (SELECT event_type, r, CASE WHEN w = 0 THEN CAST(24 AS BIGINT)
         |    ELSE CAST(bit_count((w & (-w)) - 1) + 1 AS BIGINT) END AS rho
         |  FROM h2),
         |rm AS (SELECT event_type, r, max(rho) AS mr FROM h3 GROUP BY 1, 2),
         |grid AS (SELECT t.event_type, g.r
         |  FROM (SELECT DISTINCT event_type FROM events) t
         |  CROSS JOIN range(256) g(r)),
         |regs AS (SELECT grid.event_type, coalesce(rm.mr, 0) AS m
         |  FROM grid LEFT JOIN rm
         |  ON grid.event_type = rm.event_type AND grid.r = rm.r),
         |ag AS (SELECT event_type,
         |    CAST(sum((CAST(1 AS BIGINT) << CAST(30 - m AS INTEGER)))
         |      AS BIGINT) AS s_scaled,
         |    CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_zero_regs
         |  FROM regs GROUP BY 1),
         |l1 AS (SELECT *, ${kSql("n_zero_regs")} AS kv FROM ag),
         |l2 AS (SELECT *, ${mSql("n_zero_regs", "kv")} AS mv FROM l1),
         |l3 AS (SELECT *, ${zSql("mv")} AS zv FROM l2),
         |l4 AS (SELECT *, zv * zv AS z2v FROM l3),
         |l5 AS (SELECT *, ${hornerSql("z2v")} AS hzv FROM l4),
         |e AS (SELECT event_type, n_zero_regs,
         |    CAST(CAST(718273 AS HUGEINT) * 65536 * 1073741824
         |      // s_scaled // 1000000 AS BIGINT) AS est_raw,
         |    CAST(floor(CAST(256 AS DOUBLE) *
         |      (CAST(8 AS DOUBLE) * CAST('0.6931471805599453' AS DOUBLE)
         |       - ${lnSql("kv", "zv", "hzv")})) AS BIGINT) AS lc
         |  FROM l5),
         |tru AS (SELECT event_type, count(*) AS n_items,
         |    count(DISTINCT u) AS true_distinct FROM ev GROUP BY 1)
         |SELECT t.event_type, t.n_items, t.true_distinct, e.n_zero_regs,
         |  CASE WHEN e.est_raw < 640 AND e.n_zero_regs > 0 THEN e.lc
         |    ELSE e.est_raw END AS est_distinct
         |FROM tru t JOIN e ON t.event_type = e.event_type
         |ORDER BY t.event_type ASC NULLS FIRST""".stripMargin
    })

  /** Incremental/streaming HLL maintenance (round 5): registers built
    * PER DAY SLICE (the micro-batch grain of the streaming runtime),
    * then MERGED by register-wise max — and the ORACLE is the direct
    * whole-corpus computation, so the hash match GRADES the identity
    * merge(sketch(slice₁), …, sketch(sliceₖ)) ≡ sketch(corpus), the
    * property that makes HLL maintainable under streaming ingest with
    * 2 KiB of state per group (q_agg_incremental's algebraic-merge
    * grading applied to a sketch). n_slices rides along as merge
    * provenance (how many daily partials fed each type's registers).
    *
    * Scale: the nightly cost is one batch-slice scan + a (type, r)-
    * grain max-merge — never a history re-scan; a register table from
    * yesterday merges with today's partial by the same max. This is
    * the q_stream_upsert keyed-state shape with sketch registers as
    * the state value.
    */
  private val hllMerge = QueryDef(
    "q_sketch_hll_merge",
    (s, d) => {
      val DayUs = 86400000000L
      val ev = Tables.events(s, d)
        .select(col("event_type"), col("user_id").as("u"),
          graft.Dsl.floorDiv(unix_micros(col("ts")), DayUs).as("slice"))
      val sliceReg = ev
        .withColumn("h1", expr(HllHash1))
        .withColumn("g", expr("h1 ^ shiftright(h1, 15)"))
        .withColumn("hv", expr(hllHash2("g")))
        .withColumn("r", expr("hv % 256"))
        .withColumn("w", expr("hv div 256"))
        .withColumn("rho", expr(
          "CASE WHEN w = 0 THEN 24L ELSE CAST(bit_count((w & -w) - 1) + 1 AS BIGINT) END"))
        .groupBy(col("event_type"), col("slice"), col("r"))
        .agg(max(col("rho")).as("mr"))
      // the streaming-maintenance step under grade: register-wise max
      // over per-slice partial sketches
      val regMax = sliceReg.groupBy(col("event_type"), col("r"))
        .agg(max(col("mr")).as("mr"))
      val slices = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("slice")).as("n_slices"))
      val grid = ev.select(col("event_type")).distinct()
        .select(col("event_type"),
          explode(sequence(lit(0L), lit(255L))).as("r"))
      val est = grid.join(regMax, Seq("event_type", "r"), "left")
        .withColumn("m", coalesce(col("mr"), lit(0L)))
        .groupBy(col("event_type"))
        .agg(
          sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(30 - m AS INT))"))
            .as("s_scaled"),
          sum(when(col("m") === 0, lit(1L)).otherwise(lit(0L)))
            .as("n_zero_regs"))
        .withColumn("est_raw", expr(
          "CAST(718273 AS DECIMAL(38,0)) * 65536 * 1073741824 div s_scaled div 1000000"))
        .withColumn("lc", floor(lit(256.0) *
          (lit(8.0) * lit(0.6931471805599453)
            - graft.functions.DetMath.lnInt(col("n_zero_regs"))))
          .cast("long"))
        .withColumn("est_distinct",
          when(col("est_raw") < 640 && col("n_zero_regs") > 0, col("lc"))
            .otherwise(col("est_raw")))
      slices.join(est, "event_type")
        .select(col("event_type"), col("n_slices"), col("n_zero_regs"),
          col("est_distinct"))
        .orderBy(ascf("event_type"))
    },
    Some {
      import graft.functions.DetMath._
      // DIRECT whole-corpus computation — no slice level on purpose:
      // the hash match proves slice-merge ≡ direct
      s"""WITH ev AS (SELECT event_type, user_id AS u,
         |    epoch_us(ts) // 86400000000 AS slice FROM events),
         |h0 AS (SELECT event_type, $HllHash1 AS h1 FROM ev),
         |h0g AS (SELECT event_type, xor(h1, h1 >> 15) AS g FROM h0),
         |h1x AS (SELECT event_type, ${hllHash2("g")} AS hv FROM h0g),
         |h2 AS (SELECT event_type, hv % 256 AS r, hv // 256 AS w FROM h1x),
         |h3 AS (SELECT event_type, r, CASE WHEN w = 0 THEN CAST(24 AS BIGINT)
         |    ELSE CAST(bit_count((w & (-w)) - 1) + 1 AS BIGINT) END AS rho
         |  FROM h2),
         |rm AS (SELECT event_type, r, max(rho) AS mr FROM h3 GROUP BY 1, 2),
         |grid AS (SELECT t.event_type, g.r
         |  FROM (SELECT DISTINCT event_type FROM events) t
         |  CROSS JOIN range(256) g(r)),
         |regs AS (SELECT grid.event_type, coalesce(rm.mr, 0) AS m
         |  FROM grid LEFT JOIN rm
         |  ON grid.event_type = rm.event_type AND grid.r = rm.r),
         |ag AS (SELECT event_type,
         |    CAST(sum((CAST(1 AS BIGINT) << CAST(30 - m AS INTEGER)))
         |      AS BIGINT) AS s_scaled,
         |    CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_zero_regs
         |  FROM regs GROUP BY 1),
         |l1 AS (SELECT *, ${kSql("n_zero_regs")} AS kv FROM ag),
         |l2 AS (SELECT *, ${mSql("n_zero_regs", "kv")} AS mv FROM l1),
         |l3 AS (SELECT *, ${zSql("mv")} AS zv FROM l2),
         |l4 AS (SELECT *, zv * zv AS z2v FROM l3),
         |l5 AS (SELECT *, ${hornerSql("z2v")} AS hzv FROM l4),
         |e AS (SELECT event_type, n_zero_regs,
         |    CAST(CAST(718273 AS HUGEINT) * 65536 * 1073741824
         |      // s_scaled // 1000000 AS BIGINT) AS est_raw,
         |    CAST(floor(CAST(256 AS DOUBLE) *
         |      (CAST(8 AS DOUBLE) * CAST('0.6931471805599453' AS DOUBLE)
         |       - ${lnSql("kv", "zv", "hzv")})) AS BIGINT) AS lc
         |  FROM l5),
         |sl AS (SELECT event_type, count(DISTINCT slice) AS n_slices
         |  FROM ev GROUP BY 1)
         |SELECT sl.event_type, sl.n_slices, e.n_zero_regs,
         |  CASE WHEN e.est_raw < 640 AND e.n_zero_regs > 0 THEN e.lc
         |    ELSE e.est_raw END AS est_distinct
         |FROM sl JOIN e ON sl.event_type = e.event_type
         |ORDER BY sl.event_type ASC NULLS FIRST""".stripMargin
    })

  def defs: Seq[QueryDef] = Seq(countmin, hll, hllMerge)
}
