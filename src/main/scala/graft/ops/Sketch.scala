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

  private val BloomHash =
    s"((x % $P) * ($CaseA) + ($CaseB)) % $P % 65536"

  /** Bloom-filter membership sketch (round 6): build a k=3, m=2¹⁶-bit
    * filter over a reference key set (part keys supplied by the
    * suppkey≡0 mod 10 supplier slice), probe it with a disjoint-ish key
    * set, and grade the EXACT false-positive census — the gap between
    * bloom-positive and true membership IS the filter's error, computed
    * identically on both engines because the hash family is the
    * count-min mod-prime arithmetic (first 3 lanes). The filter is
    * represented as its set-bit RELATION (distinct positions) — the
    * form that scales: at 100 TB the build is one distinct + a
    * ≤m-row aggregate per partition, the probe is a broadcast join of
    * ≤m rows, and a production plan would ship exactly this relation as
    * the runtime filter (q_join_bloom is the consumer-side exhibit; this
    * key grades the sketch itself). m is sized 2¹⁶ so the sf0.1 build
    * (~19k keys) fills ~58% of the bits — a real graded FP operating
    * point (FP ≈ 0.2), neither saturated nor trivially zero.
    */
  private val bloom = QueryDef(
    "q_sketch_bloom",
    (s, d) => {
      val lanes = explode(array((0 until 3).map(i => lit(i)): _*)).as("i")
      val ref = Tables.lineitem(s, d)
        .filter(pmod(col("l_suppkey"), lit(10)) === 0)
        .select(col("l_partkey").cast("long").as("x")).distinct()
      val bits = graft.Caches.scoped(ref.select(col("x"), lanes)
        .withColumn("pos", expr(BloomHash))
        .select(col("pos")).distinct())
      val probes = Tables.part(s, d)
        .filter(pmod(col("p_partkey"), lit(3)) === 0)
        .select(col("p_partkey").cast("long").as("x")).distinct()
      val hits = probes.select(col("x"), lanes)
        .withColumn("pos", expr(BloomHash))
        .join(broadcast(bits.withColumn("present", lit(1L))),
          Seq("pos"), "left")
        .groupBy(col("x"))
        .agg(sum(coalesce(col("present"), lit(0L))).as("nhit"))
      val flagged = hits
        .join(ref.withColumn("mem", lit(1L)), Seq("x"), "left")
        .withColumn("mem", coalesce(col("mem"), lit(0L)))
        .withColumn("bpos", when(col("nhit") === 3L, 1L).otherwise(0L))
      val census = flagged.agg(
        count(lit(1)).as("n_probes"),
        sum(col("mem")).as("n_members"),
        sum(col("bpos")).as("n_bloom_pos"),
        sum(when(col("bpos") === 1L && col("mem") === 0L, 1L).otherwise(0L))
          .as("n_false_pos"),
        sum(when(col("bpos") === 1L && col("mem") === 0L, col("x"))
          .otherwise(0L)).as("fp_id_checksum"))
      census
        .crossJoin(ref.agg(count(lit(1)).as("n_ref")))
        .crossJoin(bits.agg(count(lit(1)).as("n_bits_set")))
        .select(col("n_ref"), col("n_bits_set"), col("n_probes"),
          col("n_members"), col("n_bloom_pos"), col("n_false_pos"),
          col("fp_id_checksum"))
        .orderBy(ascf("n_ref"))
    },
    Some(s"""WITH ref AS (SELECT DISTINCT CAST(l_partkey AS BIGINT) AS x
           |  FROM lineitem WHERE l_suppkey % 10 = 0),
           |bits AS (SELECT DISTINCT ($BloomHash) AS pos
           |  FROM ref CROSS JOIN range(0, 3) t(i)),
           |pr AS (SELECT DISTINCT CAST(p_partkey AS BIGINT) AS x
           |  FROM part WHERE p_partkey % 3 = 0),
           |pp AS (SELECT x, ($BloomHash) AS pos
           |  FROM pr CROSS JOIN range(0, 3) t(i)),
           |hits AS (SELECT pp.x AS x,
           |    sum(CASE WHEN b.pos IS NULL THEN 0 ELSE 1 END) AS nhit
           |  FROM pp LEFT JOIN bits b ON pp.pos = b.pos GROUP BY 1),
           |fl AS (SELECT h.x AS x,
           |    CASE WHEN h.nhit = 3 THEN 1 ELSE 0 END AS bpos,
           |    CASE WHEN r.x IS NULL THEN 0 ELSE 1 END AS mem
           |  FROM hits h LEFT JOIN ref r ON h.x = r.x)
           |SELECT (SELECT CAST(count(*) AS BIGINT) FROM ref) AS n_ref,
           |  (SELECT CAST(count(*) AS BIGINT) FROM bits) AS n_bits_set,
           |  CAST(count(*) AS BIGINT) AS n_probes,
           |  CAST(sum(mem) AS BIGINT) AS n_members,
           |  CAST(sum(bpos) AS BIGINT) AS n_bloom_pos,
           |  CAST(sum(CASE WHEN bpos = 1 AND mem = 0 THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_false_pos,
           |  CAST(sum(CASE WHEN bpos = 1 AND mem = 0 THEN x ELSE 0 END)
           |    AS BIGINT) AS fp_id_checksum
           |FROM fl""".stripMargin))

  /** Mergeable equi-width histogram quantile sketch (round 6): the
    * quantile family member next to count-distinct (HLL), frequency
    * (count-min) and membership (bloom). 256 integer bins over the
    * data-derived [lo, hi] cent range of l_extendedprice; the sketch is
    * the (bin, count) relation — mergeable across partitions/days by
    * plain addition, which is why production systems ship it instead of
    * sorting. Estimates for p50/p90/p99 come from the first bin whose
    * cumulative count reaches ⌈k·N/100⌉ (midpoint reconstruction);
    * the EXACT quantile (value-grain cumsum, the q_profile_depth
    * definition) rides along, so the graded output pins estimate, truth
    * and the signed error — the sketch's accuracy contract, not just
    * its mechanics. All arithmetic is integer (cents, truncating div on
    * non-negative operands).
    *
    * Scale: bin assignment is codegen'd per-row math; the sketch agg
    * carries ≤ 256 cells per map partition at ANY size; only the
    * verification side (value-grain cumsum) grows with distinct values
    * — and it is the harness, not the production path.
    */
  private val quantile = QueryDef(
    "q_sketch_quantile",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val v = Tables.lineitem(s, d)
        .select((dec(col("l_extendedprice")) * 100).cast("long").as("v"))
      val bounds = v.agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
        count(lit(1)).as("n"))
      val binned = v.crossJoin(broadcast(bounds))
        .withColumn("bin", expr("((v - lo) * 256) div (hi - lo + 1)"))
      val sketch = binned.groupBy(col("bin")).agg(count(lit(1)).as("c"))
      val cum = sketch.withColumn("cum",
        sum(col("c")).over(Window.orderBy(ascf("bin"))))
      val targets = bounds.crossJoin(
          s.range(3).select(element_at(array(lit(50L), lit(90L), lit(99L)),
            (col("id") + 1).cast("int")).as("k")))
        .withColumn("target", expr("(k * n + 99) div 100"))
      val est = cum.crossJoin(broadcast(targets))
        .filter(col("cum") >= col("target"))
        .groupBy(col("k"), col("target"), col("lo"), col("hi"))
        .agg(min(col("bin")).as("ebin"))
        .withColumn("est_cents",
          expr("lo + ((2 * ebin + 1) * (hi - lo + 1)) div 512"))
      val vg = v.groupBy(col("v")).agg(count(lit(1)).as("c"))
        .withColumn("cumv", sum(col("c")).over(Window.orderBy(ascf("v"))))
      val exact = vg.crossJoin(broadcast(targets.select(col("k"),
          col("target").as("t2"))))
        .filter(col("cumv") >= col("t2"))
        .groupBy(col("k")).agg(min(col("v")).as("exact_cents"))
      est.join(exact, "k")
        .select(col("k"), col("target").as("target_rank"),
          col("est_cents"), col("exact_cents"),
          (col("est_cents") - col("exact_cents")).as("err_cents"))
        .orderBy(ascf("k"))
    },
    Some("""WITH v AS (SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2))
           |      * 100 AS BIGINT) AS v FROM lineitem),
           |bounds AS (SELECT min(v) AS lo, max(v) AS hi,
           |    count(*) AS n FROM v),
           |binned AS (SELECT ((v.v - b.lo) * 256) // (b.hi - b.lo + 1)
           |    AS bin FROM v, bounds b),
           |sk AS (SELECT bin, count(*) AS c FROM binned GROUP BY bin),
           |cum AS (SELECT bin, sum(c) OVER (ORDER BY bin ASC
           |    ROWS UNBOUNDED PRECEDING) AS cum FROM sk),
           |ks AS (SELECT unnest([50, 90, 99]) AS k),
           |tg AS (SELECT CAST(ks.k AS BIGINT) AS k,
           |    (ks.k * b.n + 99) // 100 AS target, b.lo AS lo, b.hi AS hi
           |  FROM ks, bounds b),
           |est AS (SELECT tg.k AS k, tg.target AS target,
           |    tg.lo + ((2 * min(cum.bin) + 1) * (tg.hi - tg.lo + 1)) // 512
           |      AS est_cents
           |  FROM cum, tg WHERE cum.cum >= tg.target
           |  GROUP BY tg.k, tg.target, tg.lo, tg.hi),
           |vg AS (SELECT v, count(*) AS c FROM v GROUP BY v),
           |cv AS (SELECT v, sum(c) OVER (ORDER BY v ASC
           |    ROWS UNBOUNDED PRECEDING) AS cumv FROM vg),
           |ex AS (SELECT tg.k AS k, min(cv.v) AS exact_cents
           |  FROM cv, tg WHERE cv.cumv >= tg.target GROUP BY tg.k)
           |SELECT est.k AS k, CAST(est.target AS BIGINT) AS target_rank,
           |  CAST(est.est_cents AS BIGINT) AS est_cents,
           |  CAST(ex.exact_cents AS BIGINT) AS exact_cents,
           |  CAST(est.est_cents - ex.exact_cents AS BIGINT) AS err_cents
           |FROM est JOIN ex ON est.k = ex.k
           |ORDER BY k ASC NULLS FIRST""".stripMargin))

  /** KMV (k-minimum-values) distinct sketch with SET OPERATIONS
    * (round 7): the member of the sketch family HLL cannot provide —
    * besides cardinality, a KMV synopsis supports union (merge the two
    * min-k sets, keep the k smallest) and INTERSECTION estimation (the
    * fraction of the union sketch's members belonging to both sets,
    * scaled by the union estimate) — the audience-overlap / join-size
    * estimator.
    *
    * Sets: distinct customers with open ('O') vs fulfilled ('F')
    * orders. Hash = mod-prime round → xor-shift(13) → mod-prime round
    * (the q_sketch_hll anti-progression construction: sequential keys
    * under one linear round keep their ordering structure, biasing the
    * minima the estimator divides by). k = 64; estimate = (k−1)·P div
    * h(k) — all exact int64 ((k−1)·P ≈ 1.4·10¹¹), floor division
    * truncates identically on both engines (operands non-negative).
    *
    * The exact distinct counts and exact intersection ride alongside as
    * the verification harness (expected rel. error ~1/√(k−1) ≈ 13%);
    * production reads the 64-row sketch relations alone.
    *
    * Scale: the min-k selection is planned as TakeOrderedAndProject —
    * per-partition k-heaps merged at one reducer, never a global sort
    * (and never a single-partition window); the base relation is one
    * distinct-key aggregation with map-side partials. KMV merges by
    * "union the synopses, keep k smallest" — the same algebraic-merge
    * property every sketch in this family grades.
    */
  private val kmv = QueryDef(
    "q_sketch_kmv",
    (s, d) => {
      val K = 64
      val base = graft.Caches.scoped(Tables.orders(s, d)
        .filter(col("o_orderstatus").isin("O", "F"))
        .groupBy(col("o_custkey").as("k"))
        .agg(max(when(col("o_orderstatus") === "O", 1L).otherwise(0L))
          .as("in_a"),
          max(when(col("o_orderstatus") === "F", 1L).otherwise(0L))
            .as("in_b"))
        .withColumn("g1",
          (pmod(col("k"), lit(P)) * 15485863L + 101L) % P)
        .withColumn("g2",
          expr("g1 ^ (g1 div 8192)"))
        .withColumn("h", (col("g2") * 32452843L + 1009L) % P))
      def sketch(flag: String) = base.filter(col(flag) === 1)
        .orderBy(ascf("h"), ascf("k")).limit(K)
        .agg(max(col("h")).as(s"kth_$flag"))
      val su = base.orderBy(ascf("h"), ascf("k")).limit(K)
        .agg(max(col("h")).as("kth_u"),
          sum(col("in_a") * col("in_b")).as("c_both"))
      val exact = base.agg(sum(col("in_a")).as("exact_a"),
        sum(col("in_b")).as("exact_b"),
        count(lit(1)).as("exact_union"),
        sum(col("in_a") * col("in_b")).as("exact_inter"))
      sketch("in_a").crossJoin(sketch("in_b")).crossJoin(su)
        .crossJoin(exact)
        .select(
          // (k−1)·P is spliced as ONE long literal: written as `63 *
          // 2147483647` both factors parse as INT and the multiply
          // overflows int32 under ANSI (caught at sf0.001)
          expr(s"${(K - 1).toLong * P}L div kth_in_a").as("est_a"),
          col("exact_a"),
          expr(s"${(K - 1).toLong * P}L div kth_in_b").as("est_b"),
          col("exact_b"),
          expr(s"${(K - 1).toLong * P}L div kth_u").as("est_union"),
          col("exact_union"),
          expr(s"(c_both * (${(K - 1).toLong * P}L div kth_u)) div $K")
            .as("est_inter"),
          col("exact_inter"))
        .orderBy(ascf("est_a"))
    },
    Some(s"""WITH base AS (SELECT o_custkey AS k,
            |    CAST(max(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
            |      AS BIGINT) AS in_a,
            |    CAST(max(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
            |      AS BIGINT) AS in_b
            |  FROM orders WHERE o_orderstatus IN ('O', 'F')
            |  GROUP BY o_custkey),
            |hashed AS (SELECT k, in_a, in_b,
            |    ((((k % $P) * 15485863 + 101) % $P)) AS g1
            |  FROM base),
            |h2 AS (SELECT k, in_a, in_b,
            |    ((xor(g1, g1 // 8192)) * 32452843 + 1009) % $P AS h
            |  FROM hashed),
            |ska AS (SELECT max(h) AS kth_a FROM
            |  (SELECT h FROM h2 WHERE in_a = 1
            |   ORDER BY h ASC NULLS FIRST, k ASC NULLS FIRST LIMIT 64)),
            |skb AS (SELECT max(h) AS kth_b FROM
            |  (SELECT h FROM h2 WHERE in_b = 1
            |   ORDER BY h ASC NULLS FIRST, k ASC NULLS FIRST LIMIT 64)),
            |sku AS (SELECT max(h) AS kth_u,
            |    CAST(sum(in_a * in_b) AS BIGINT) AS c_both FROM
            |  (SELECT h, in_a, in_b FROM h2
            |   ORDER BY h ASC NULLS FIRST, k ASC NULLS FIRST LIMIT 64)),
            |ex AS (SELECT CAST(sum(in_a) AS BIGINT) AS exact_a,
            |    CAST(sum(in_b) AS BIGINT) AS exact_b,
            |    CAST(count(*) AS BIGINT) AS exact_union,
            |    CAST(sum(in_a * in_b) AS BIGINT) AS exact_inter
            |  FROM h2)
            |SELECT CAST((CAST(63 AS BIGINT) * $P) // kth_a AS BIGINT) AS est_a, exact_a,
            |  CAST((CAST(63 AS BIGINT) * $P) // kth_b AS BIGINT) AS est_b, exact_b,
            |  CAST((CAST(63 AS BIGINT) * $P) // kth_u AS BIGINT) AS est_union, exact_union,
            |  CAST((c_both * ((CAST(63 AS BIGINT) * $P) // kth_u)) // 64 AS BIGINT)
            |    AS est_inter,
            |  exact_inter
            |FROM ska, skb, sku, ex
            |ORDER BY est_a ASC NULLS FIRST""".stripMargin))

  /** AMS second-moment (F2) sketch (round 7): estimate Σ f_k² — the
    * SELF-JOIN SIZE of lineitem on l_partkey, the statistic a join
    * planner wants before committing to a shuffle — in the PRODUCTION
    * median-of-means shape: 96 ±1-sign counters Z_j = Σ_rows
    * sign_j(key) in 6 groups of 16, est = median of the 6 group means
    * of Z² (Alon–Matias–Szegedy; E[Z²] = F2 exactly; a basic 8-lane
    * mean measured 53% error — within the √(2/8) theory bound and
    * exactly why real deployments take medians of means). The exact F2
    * and the absolute e-4 error are graded alongside — the sketch's
    * honesty columns.
    *
    * Scale: ONE scan, 96 conditional sums in one aggregate with
    * map-side partials — sketch state is 96 int64 cells per partition
    * at any data size, and Z-counters MERGE BY ADDITION (what makes
    * AMS a distributed sketch); the exact F2 costs the full key
    * group-by the sketch exists to avoid.
    *
    * Determinism (D2): signs are the POPCOUNT parity of the HLL-style
    * mod-prime→xor-shift→mod-prime hash at 96 lane offsets — the low
    * bit alone is measurably biased across nearby keys (0.63·F2 over
    * 768 lanes) while the popcount parity XORs every output bit and
    * measured unbiased (0.96 ± 0.05); all int64 (Z² ≤ (6e5)² ≪ 2⁶³);
    * the 6-value median is element 3 of a sorted literal array,
    * identical in both engines.
    */
  private val ams = QueryDef(
    "q_sketch_ams",
    (s, d) => {
      def lane(j: Int): String = {
        val h1 = s"(((l_partkey + ${j * 1000003}) % $P) * 15485863 + 101) % $P"
        val g = s"(($h1) ^ shiftright(($h1), 15))"
        // POPCOUNT parity, not bit 0: the low bit of an affine-mod-P
        // value correlates across nearby keys (measured 0.63·F2 bias
        // over 768 lanes); the popcount parity XORs every output bit
        // and measured 0.96 ± 0.05 — unbiased
        s"1 - 2 * (bit_count((($g) * 32452843 + 1009) % $P) & 1)"
      }
      val li = Tables.lineitem(s, d).select(col("l_partkey"))
      val zs = li.agg(
        count(lit(1)).as("n_rows"),
        (0 until 96).map(j => sum(expr(lane(j))).as(s"z$j")): _*)
      val exact = li.groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("f"))
        .agg(sum(col("f") * col("f")).as("exact_f2"))
      val means = (0 until 6).map { g =>
        (0 until 16).map(k => s"z${g * 16 + k} * z${g * 16 + k}")
          .mkString("(", " + ", ") div 16")
      }.mkString("array(", ", ", ")")
      zs.crossJoin(broadcast(exact))
        .select(col("n_rows"), col("exact_f2"),
          expr(s"element_at(sort_array($means), 3)").as("est_f2"),
          expr((0 until 96).map(j => s"abs(z$j)").mkString(" + "))
            .as("z_abs_checksum"))
        .select(col("n_rows"), col("exact_f2"), col("est_f2"),
          col("z_abs_checksum"),
          expr("(abs(est_f2 - exact_f2) * 10000) div exact_f2")
            .as("err_e4"))
        .orderBy(ascf("n_rows"))
    },
    Some {
      def lane(j: Int): String = {
        val h1 = s"(((l_partkey + ${j * 1000003}) % $P) * 15485863 + 101) % $P"
        val g = s"xor(($h1), ($h1) >> 15)"
        s"1 - 2 * (bit_count((($g) * 32452843 + 1009) % $P) & 1)"
      }
      val zsum = (0 until 96)
        .map(j => s"CAST(sum(${lane(j)}) AS BIGINT) AS z$j")
        .mkString(",\n|    ")
      val means = (0 until 6).map { g =>
        (0 until 16).map(k => s"z${g * 16 + k} * z${g * 16 + k}")
          .mkString("(", " + ", ") // 16")
      }.mkString("[", ", ", "]")
      s"""WITH z AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
         |    $zsum
         |  FROM lineitem),
         |ex AS (SELECT CAST(sum(f * f) AS BIGINT) AS exact_f2 FROM (
         |    SELECT count(*) AS f FROM lineitem GROUP BY l_partkey)),
         |j AS (SELECT z.n_rows, ex.exact_f2,
         |    list_sort($means)[3] AS est_f2,
         |    ${(0 until 96).map(j => s"abs(z$j)").mkString(" + ")}
         |      AS z_abs_checksum
         |  FROM z CROSS JOIN ex)
         |SELECT n_rows, exact_f2, CAST(est_f2 AS BIGINT) AS est_f2,
         |  CAST(z_abs_checksum AS BIGINT) AS z_abs_checksum,
         |  CAST((abs(est_f2 - exact_f2) * 10000) // exact_f2 AS BIGINT)
         |    AS err_e4
         |FROM j
         |ORDER BY n_rows ASC NULLS FIRST""".stripMargin
    })

  def defs: Seq[QueryDef] = Seq(countmin, hll, hllMerge, bloom, quantile,
    kmv, ams)
}
