package graft.ops

import graft.{QueryDef, Tables}
import graft.Dsl._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization (round 5): resample an irregular event
  * stream onto a fixed hourly grid and forward-fill gaps — the shape
  * every metrics/feature pipeline needs before feeding models that
  * assume regular sampling.
  *
  * Scale: the grid is generated PER KEY from that key's own [min, max]
  * hour span (`sequence` + `explode` — no driver-side loop, no global
  * calendar table), the gap join is a hash join on (key, hour), and the
  * fill is one window pass per key. Everything partitions by user_id;
  * the output is one census row per user.
  *
  * Determinism: hours are exact epoch-µs floor-division cells (D5);
  * observed values enter as floor(value·1e6) int64 — `floor` of the
  * deterministic IEEE product is bit-identical on both engines, where a
  * half-up `round` would sit on the D11 tie boundary. Per-cell collision
  * resolution is max() (order-free). The first grid hour of every user
  * is observed by construction (the span starts at the user's own first
  * event), so the forward-fill never reads before the first value and
  * the checksum never sees a null.
  */
object TimeSeries {

  private val HourUs = 3600000000L

  private val gapfill = QueryDef(
    "q_win_gapfill",
    (s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("event_type") === "purchase" && col("user_id") < 50)
        .select(col("user_id"),
          floorDiv(unix_micros(col("ts")), HourUs).as("hr"),
          floor(col("value") * lit(1000000.0)).cast("long").as("v_e6"))
      val hourly = ev.groupBy(col("user_id"), col("hr"))
        .agg(max(col("v_e6")).as("obs"))
      val grid = hourly.groupBy(col("user_id"))
        .agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
        .select(col("user_id"),
          explode(sequence(col("h0"), col("h1"))).as("hr"))
      val w = Window.partitionBy(col("user_id")).orderBy(ascf("hr"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(hourly, Seq("user_id", "hr"), "left")
        .withColumn("fv", last(col("obs"), ignoreNulls = true).over(w))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_hours"),
          count(col("obs")).as("n_observed"),
          (count(lit(1)) - count(col("obs"))).as("n_filled"),
          sum(col("fv")).as("fill_checksum"))
        .orderBy(ascf("user_id"))
    },
    Some("""WITH e AS (SELECT user_id,
           |    epoch_us(ts) // 3600000000 AS hr,
           |    CAST(floor(value * 1000000) AS BIGINT) AS v_e6
           |  FROM events WHERE event_type = 'purchase' AND user_id < 50),
           |h AS (SELECT user_id, hr, max(v_e6) AS obs
           |  FROM e GROUP BY user_id, hr),
           |g AS (SELECT user_id,
           |    unnest(generate_series(min(hr), max(hr))) AS hr
           |  FROM h GROUP BY user_id),
           |j AS (SELECT g.user_id, g.hr, h.obs
           |  FROM g LEFT JOIN h ON g.user_id = h.user_id AND g.hr = h.hr),
           |f AS (SELECT user_id, obs,
           |    last_value(obs IGNORE NULLS) OVER (PARTITION BY user_id
           |      ORDER BY hr ASC
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fv
           |  FROM j)
           |SELECT user_id, count(*) AS n_hours,
           |  count(obs) AS n_observed,
           |  count(*) - count(obs) AS n_filled,
           |  CAST(sum(fv) AS BIGINT) AS fill_checksum
           |FROM f GROUP BY user_id
           |ORDER BY user_id ASC NULLS FIRST""".stripMargin))

  /** Time-boxed cohort funnel with STRICT event ordering (round 5): a
    * user converts only via view → later click → later purchase, all
    * within 24 hours of their FIRST VIEW (the product-analytics sequence
    * MATCH with a conversion window — not the three-independent-mins
    * approximation that counts a click BEFORE the first view, and not
    * the unbounded funnel that saturates to 100% on any long history).
    * Expressed as stacked running windows over one (user, time) sort:
    * fv carries the running first-view time, an in-box click after it
    * becomes click_after_view, its running max arms the in-box purchase
    * check. Users roll up into first-view-hour cohorts.
    *
    * Scale: ONE shuffle + sort per user partition computes all stages
    * (the windows share a frame spec, so Catalyst runs them in a single
    * Window operator); cohort rollup is two grain-sized aggs.
    * Determinism: (ts_us, event_id) is a total order within user; flags
    * are exact int64; hour cells via floorDiv (D5); null fv (no view
    * yet) falls to the CASE else-branch identically on both engines.
    */
  private val BoxUs = 86400000000L // 24-hour conversion window

  private val funnelCohort = QueryDef(
    "q_win_funnel_cohort",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(ascf("ts_us"), ascf("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val staged = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"))
        .withColumn("fv",
          min(when(col("event_type") === "view", col("ts_us"))).over(w))
        .withColumn("cav",
          when(col("event_type") === "click" && col("fv").isNotNull &&
            col("ts_us") <= col("fv") + lit(BoxUs), 1L).otherwise(0L))
        .withColumn("c_seen", max(col("cav")).over(w))
        .withColumn("conv",
          when(col("event_type") === "purchase" && col("c_seen") === 1 &&
            col("ts_us") <= col("fv") + lit(BoxUs), 1L).otherwise(0L))
      val perUser = staged.groupBy(col("user_id"))
        .agg(floorDiv(min(when(col("event_type") === "view", col("ts_us"))),
            HourUs).as("cohort_hr"),
          max(col("cav")).as("clicked_in_box"),
          max(col("conv")).as("converted"))
        .filter(col("cohort_hr").isNotNull)
      perUser.groupBy(col("cohort_hr"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("clicked_in_box")).as("n_clicked"),
          sum(col("converted")).as("n_converted"),
          sum(col("user_id") * col("converted")).as("conv_checksum"))
        .orderBy(ascf("cohort_hr"))
    },
    Some("""WITH e AS (SELECT user_id, event_id, event_type,
           |    epoch_us(ts) AS ts_us FROM events),
           |st AS (SELECT user_id, event_id, event_type, ts_us,
           |    min(CASE WHEN event_type = 'view' THEN ts_us END)
           |      OVER w AS fv
           |  FROM e WINDOW w AS (PARTITION BY user_id
           |    ORDER BY ts_us ASC, event_id ASC
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
           |st2 AS (SELECT *, CASE WHEN event_type = 'click'
           |      AND fv IS NOT NULL AND ts_us <= fv + 86400000000
           |      THEN 1 ELSE 0 END AS cav FROM st),
           |st3 AS (SELECT *, max(cav) OVER w AS c_seen
           |  FROM st2 WINDOW w AS (PARTITION BY user_id
           |    ORDER BY ts_us ASC, event_id ASC
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
           |st4 AS (SELECT *, CASE WHEN event_type = 'purchase'
           |      AND c_seen = 1 AND ts_us <= fv + 86400000000
           |      THEN 1 ELSE 0 END AS conv FROM st3),
           |pu AS (SELECT user_id,
           |    min(CASE WHEN event_type = 'view' THEN ts_us END)
           |      // 3600000000 AS cohort_hr,
           |    CAST(max(cav) AS BIGINT) AS clicked_in_box,
           |    CAST(max(conv) AS BIGINT) AS converted
           |  FROM st4 GROUP BY user_id)
           |SELECT cohort_hr, count(*) AS n_users,
           |  CAST(sum(clicked_in_box) AS BIGINT) AS n_clicked,
           |  CAST(sum(converted) AS BIGINT) AS n_converted,
           |  CAST(sum(user_id * converted) AS BIGINT) AS conv_checksum
           |FROM pu WHERE cohort_hr IS NOT NULL
           |GROUP BY cohort_hr
           |ORDER BY cohort_hr ASC NULLS FIRST""".stripMargin))

  /** N-day retention cohorts (round 5): cohort = each user's first active
    * day; for every later active day within a week, count the cohort's
    * users still active k days in — the (cohort_day, k) retention matrix
    * every product-analytics stack computes nightly.
    *
    * Scale: one distinct on (user, day) collapses the event grain to the
    * activity grain BEFORE any join (the matrix never sees raw events);
    * the cohort relation is user-grain; the join is a hash join on
    * user_id; output is ≤ 8 rows per cohort day. All grain reductions
    * happen map-side-partial first, so the shuffles carry activity rows,
    * not event rows.
    *
    * Determinism: days are exact epoch-µs floor-division cells (D5);
    * counts and id checksums are exact int64; (user, day) is unique after
    * the distinct so count(*) IS the retained-user count.
    */
  private val DayUs = 86400000000L

  private val retention = QueryDef(
    "q_win_retention",
    (s, d) => {
      val act = Tables.events(s, d)
        .select(col("user_id"),
          floorDiv(unix_micros(col("ts")), DayUs).as("day"))
        .distinct()
      val coh = act.groupBy(col("user_id")).agg(min(col("day")).as("c0"))
      act.join(coh, "user_id")
        .withColumn("k", col("day") - col("c0"))
        .filter(col("k") <= 7)
        .groupBy(col("c0").as("cohort_day"), col("k"))
        .agg(count(lit(1)).as("n_active"),
          sum(col("user_id")).as("uid_checksum"))
        .orderBy(ascf("cohort_day"), ascf("k"))
    },
    Some("""WITH a AS (SELECT DISTINCT user_id,
           |    epoch_us(ts) // 86400000000 AS day FROM events),
           |c AS (SELECT user_id, min(day) AS c0 FROM a GROUP BY user_id)
           |SELECT c.c0 AS cohort_day, a.day - c.c0 AS k,
           |  count(*) AS n_active,
           |  CAST(sum(a.user_id) AS BIGINT) AS uid_checksum
           |FROM a JOIN c ON a.user_id = c.user_id
           |WHERE a.day - c.c0 <= 7
           |GROUP BY 1, 2
           |ORDER BY cohort_day ASC NULLS FIRST, k ASC NULLS FIRST""".stripMargin))

  /** Exponentially weighted smoothing over the metric stream (round 5):
    * per event type, the hourly event count smoothed with α = 1/4 over an
    * 8-observation lookback — the standard trend-vs-noise signal feeding
    * alerting and forecasting, made EXACT: the truncated EWMA
    * α·Σ_{j<8} (1−α)^j·c_{t−j} scaled by 4^8 has integer weights
    * w_j = 3^j·4^(7−j) (16384, 12288, … 2187), so the smoothed series is
    * pure int64 arithmetic — no float accumulation, no libm (D12), no
    * truncation-order ambiguity. The lookback is observation-based (the
    * last 8 OBSERVED hours), which is the lag() semantics both engines
    * share; a calendar-based decay would first gap-fill (q_win_gapfill).
    *
    * Scale: hourly partial agg on the scan is the only corpus-sized
    * shuffle; the lag chain is one window pass over the hour-grain
    * relation (5 types × hours rows); census output is type-grain.
    */
  private val ewma = QueryDef(
    "q_ts_ewma",
    (s, d) => {
      val hourly = Tables.events(s, d)
        .select(col("event_type"),
          floorDiv(unix_micros(col("ts")), HourUs).as("hr"))
        .groupBy(col("event_type"), col("hr"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("event_type")).orderBy(ascf("hr"))
      val weights = Seq(16384L, 12288L, 9216L, 6912L, 5184L, 3888L, 2916L, 2187L)
      val smoothed = weights.zipWithIndex.map { case (wt, j) =>
        coalesce(if (j == 0) col("c") else lag(col("c"), j).over(w), lit(0L)) * lit(wt)
      }.reduce(_ + _)
      hourly.withColumn("s", smoothed)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_hours"),
          max(col("s")).as("max_ewma_x65536"),
          sum(col("s")).as("sum_ewma_x65536"))
        .orderBy(ascf("event_type"))
    },
    Some("""WITH h AS (SELECT event_type,
           |    epoch_us(ts) // 3600000000 AS hr, count(*) AS c
           |  FROM events GROUP BY 1, 2),
           |l AS (SELECT event_type,
           |    c * 16384
           |      + coalesce(lag(c, 1) OVER w, 0) * 12288
           |      + coalesce(lag(c, 2) OVER w, 0) * 9216
           |      + coalesce(lag(c, 3) OVER w, 0) * 6912
           |      + coalesce(lag(c, 4) OVER w, 0) * 5184
           |      + coalesce(lag(c, 5) OVER w, 0) * 3888
           |      + coalesce(lag(c, 6) OVER w, 0) * 2916
           |      + coalesce(lag(c, 7) OVER w, 0) * 2187 AS s
           |  FROM h WINDOW w AS (PARTITION BY event_type ORDER BY hr ASC))
           |SELECT event_type, count(*) AS n_hours,
           |  CAST(max(s) AS BIGINT) AS max_ewma_x65536,
           |  CAST(sum(s) AS BIGINT) AS sum_ewma_x65536
           |FROM l GROUP BY event_type
           |ORDER BY event_type ASC NULLS FIRST""".stripMargin))

  /** Hourly OHLC resampling of the purchase stream (round 5): open /
    * high / low / close / volume per hour — the canonical downsampling
    * of a tick stream to bar data, and the time-series twin of
    * q_agg_incremental's partials (each bar is mergeable downstream).
    *
    * Scale: one window pass per hour cell picks open/close (row_number
    * over the in-cell total order, both directions in ONE Window operator
    * since the specs share partitioning), then a hash partial-agg to the
    * bar grain. No self-joins, no arg-max subqueries.
    *
    * Determinism: values enter as floor(value·1e6) int64 (the
    * q_win_gapfill rule — floor of the deterministic IEEE product is
    * bit-identical cross-engine, no D11 tie); (ts_us, event_id) totally
    * orders each cell so open/close are unambiguous under ts collisions.
    */
  private val ohlc = QueryDef(
    "q_ts_ohlc",
    (s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(floorDiv(unix_micros(col("ts")), HourUs).as("hr"),
          unix_micros(col("ts")).as("ts_us"), col("event_id"),
          floor(col("value") * lit(1000000.0)).cast("long").as("v_e6"))
      val wAsc = Window.partitionBy(col("hr"))
        .orderBy(ascf("ts_us"), ascf("event_id"))
      val wDesc = Window.partitionBy(col("hr"))
        .orderBy(descl("ts_us"), descl("event_id"))
      ev.withColumn("rn_a", row_number().over(wAsc))
        .withColumn("rn_d", row_number().over(wDesc))
        .groupBy(col("hr"))
        .agg(max(when(col("rn_a") === 1, col("v_e6"))).as("open_e6"),
          max(col("v_e6")).as("high_e6"),
          min(col("v_e6")).as("low_e6"),
          max(when(col("rn_d") === 1, col("v_e6"))).as("close_e6"),
          count(lit(1)).as("n_ticks"),
          sum(col("v_e6")).as("vol_e6"))
        .orderBy(ascf("hr"))
    },
    Some("""WITH e AS (SELECT epoch_us(ts) // 3600000000 AS hr,
           |    epoch_us(ts) AS ts_us, event_id,
           |    CAST(floor(value * 1000000) AS BIGINT) AS v_e6
           |  FROM events WHERE event_type = 'purchase'),
           |r AS (SELECT *,
           |    row_number() OVER (PARTITION BY hr
           |      ORDER BY ts_us ASC, event_id ASC) AS rn_a,
           |    row_number() OVER (PARTITION BY hr
           |      ORDER BY ts_us DESC, event_id DESC) AS rn_d
           |  FROM e)
           |SELECT hr,
           |  CAST(max(CASE WHEN rn_a = 1 THEN v_e6 END) AS BIGINT) AS open_e6,
           |  CAST(max(v_e6) AS BIGINT) AS high_e6,
           |  CAST(min(v_e6) AS BIGINT) AS low_e6,
           |  CAST(max(CASE WHEN rn_d = 1 THEN v_e6 END) AS BIGINT) AS close_e6,
           |  count(*) AS n_ticks,
           |  CAST(sum(v_e6) AS BIGINT) AS vol_e6
           |FROM r GROUP BY hr
           |ORDER BY hr ASC NULLS FIRST""".stripMargin))

  /** Rolling 24-hour time-window aggregates (round 5): moving sum /
    * max / count / mean of the hourly event count per type, with a
    * RANGE frame over the hour value — so calendar gaps shrink the
    * window (the time-series semantics) instead of silently widening
    * it the way a ROWS frame would on sparse hours.
    *
    * Scale: hourly partial agg on the scan, then ONE window pass over
    * the hour-grain relation; output grows with the time span, not the
    * corpus. Determinism: exact int64 counts; the mean is all-positive
    * integer division in 1e6 units (truncate == floor on both engines).
    */
  private val moving = QueryDef(
    "q_ts_moving",
    (s, d) => {
      val hourly = Tables.events(s, d)
        .select(col("event_type"),
          floorDiv(unix_micros(col("ts")), HourUs).as("hr"))
        .groupBy(col("event_type"), col("hr"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
        .rangeBetween(-23, Window.currentRow)
      hourly
        .withColumn("mov_sum", sum(col("c")).over(w))
        .withColumn("mov_max", max(col("c")).over(w))
        .withColumn("mov_n", count(lit(1)).over(w))
        .withColumn("mov_avg_e6", expr("(mov_sum * 1000000) div mov_n"))
        .orderBy(ascf("event_type"), ascf("hr"))
    },
    Some("""WITH h AS (SELECT event_type,
           |    epoch_us(ts) // 3600000000 AS hr, count(*) AS c
           |  FROM events GROUP BY 1, 2)
           |SELECT event_type, hr, c,
           |  CAST(sum(c) OVER w AS BIGINT) AS mov_sum,
           |  CAST(max(c) OVER w AS BIGINT) AS mov_max,
           |  CAST(count(*) OVER w AS BIGINT) AS mov_n,
           |  CAST((sum(c) OVER w * 1000000) // count(*) OVER w AS BIGINT)
           |    AS mov_avg_e6
           |FROM h WINDOW w AS (PARTITION BY event_type ORDER BY hr ASC
           |  RANGE BETWEEN 23 PRECEDING AND CURRENT ROW)
           |ORDER BY event_type ASC NULLS FIRST, hr ASC NULLS FIRST""".stripMargin))

  /** Least-squares trend slope per metric (round 5): the OLS slope of
    * hourly event count against the hour index, per event type — the
    * "is this metric growing" number behind every dashboard sparkline,
    * computed EXACTLY: slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) in
    * 1e6 units, all moments integer, quantized by true FLOOR division.
    * The numerator CAN be negative, where BOTH engines' native integer
    * division truncates toward zero (Spark `div`; DuckDB's integer `//`
    * too — verified -7 // 2 = -3, its floor semantics are float-only) —
    * so BOTH sides spell out floor as the Dsl.floorDiv construction
    * generalized to a column divisor: (num − pmod(num, den)) is an
    * exact multiple of den with pmod non-negative, making the division
    * exact and the floor explicit, identically on each engine.
    *
    * x is re-based to each type's first hour (slope is shift-invariant;
    * re-basing keeps every moment < 2⁶³ for spans to ~10⁵ hours and
    * hourly counts to ~10⁹ — beyond that, widen the moments to
    * DECIMAL(38,0), the q_sim_centroid pattern).
    *
    * Scale: hourly partial agg on the scan; moments are a second
    * type-grain partial agg; everything after runs on 5 rows.
    */
  private val trend = QueryDef(
    "q_ts_trend",
    (s, d) => {
      val hourly = Tables.events(s, d)
        .select(col("event_type"),
          floorDiv(unix_micros(col("ts")), HourUs).as("hr"))
        .groupBy(col("event_type"), col("hr"))
        .agg(count(lit(1)).as("y"))
      val h0 = hourly.groupBy(col("event_type")).agg(min(col("hr")).as("h0"))
      val m = hourly.join(h0, "event_type")
        .withColumn("x", col("hr") - col("h0"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .withColumn("num", expr("1000000 * (n * sxy - sx * sy)"))
        .withColumn("den", expr("n * sxx - sx * sx"))
        .filter(col("den") > 0)
      m.select(col("event_type"), col("n").as("n_hours"),
          ((col("num") - pmod(col("num"), col("den")))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0))
            / col("den")).cast("long").as("slope_e6"))
        .orderBy(ascf("event_type"))
    },
    Some("""WITH h AS (SELECT event_type,
           |    epoch_us(ts) // 3600000000 AS hr, count(*) AS y
           |  FROM events GROUP BY 1, 2),
           |h0 AS (SELECT event_type, min(hr) AS h0 FROM h GROUP BY 1),
           |m AS (SELECT h.event_type, count(*) AS n,
           |    sum(h.hr - h0.h0) AS sx, sum(h.y) AS sy,
           |    sum((h.hr - h0.h0) * h.y) AS sxy,
           |    sum((h.hr - h0.h0) * (h.hr - h0.h0)) AS sxx
           |  FROM h JOIN h0 ON h.event_type = h0.event_type
           |  GROUP BY h.event_type),
           |nd AS (SELECT event_type, n,
           |    1000000 * (n * sxy - sx * sy) AS num,
           |    n * sxx - sx * sx AS den
           |  FROM m WHERE n * sxx - sx * sx > 0)
           |-- DuckDB's integer // TRUNCATES toward zero (verified:
           |-- -7 // 2 = -3), so true floor needs the same pmod
           |-- construction as the Spark side: subtract the non-negative
           |-- remainder, then divide exactly.
           |SELECT event_type, n AS n_hours,
           |  CAST((num - ((num % den) + den) % den) // den AS BIGINT)
           |    AS slope_e6
           |FROM nd
           |ORDER BY event_type ASC NULLS FIRST""".stripMargin))

  /** Lag-1 autocorrelation of the hourly count series per metric (round
    * 5): the "is this metric bursty or mean-reverting" number — r² in
    * 1e-6 units plus the sign of the covariance, over consecutive-hour
    * pairs only (a gap in the grid does NOT fabricate a pair, so the
    * statistic is well-defined on irregular data without imputation).
    *
    * Determinism: the series is integer counts, so every moment (Σx, Σy,
    * Σxy, Σx², Σy²) is exact int64; the combination covn = n·Σxy−Σx·Σy
    * and the variances stay int64 (bound: hourly counts < ~3·10⁶ over
    * ~10⁴ hours; beyond that widen the MOMENTS too), while covn² and
    * varx·vary widen to DECIMAL(38,0)/HUGEINT — the q_sim_centroid
    * pattern — since they square to ~10²³ at sf0.1 already. r²·1e6
    * floor-divides exactly via the pmod construction (numerator
    * non-negative, but the division must still be EXACT, hence
    * subtract-remainder-then-divide rather than decimal `/` whose
    * engine-specific result scale would round).
    *
    * Scale: hourly partial agg on the scan; the lead() window and the
    * moment agg run on the hour-grain relation; final math on 5 rows.
    */
  private val autocorr = QueryDef(
    "q_ts_autocorr",
    (s, d) => {
      val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val hourly = Tables.events(s, d)
        .select(col("event_type"),
          floorDiv(unix_micros(col("ts")), HourUs).as("hr"))
        .groupBy(col("event_type"), col("hr"))
        .agg(count(lit(1)).as("y"))
      val w = Window.partitionBy(col("event_type")).orderBy(ascf("hr"))
      val pairs = hourly
        .withColumn("nhr", lead(col("hr"), 1).over(w))
        .withColumn("ny", lead(col("y"), 1).over(w))
        .filter(col("nhr") === col("hr") + 1)
      val m = pairs.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("y")).as("sx"), sum(col("ny")).as("sy"),
          sum(col("y") * col("ny")).as("sxy"),
          sum(col("y") * col("y")).as("sxx"),
          sum(col("ny") * col("ny")).as("syy"))
        .withColumn("covn", expr("n * sxy - sx * sy"))
        .withColumn("varx", expr("n * sxx - sx * sx"))
        .withColumn("vary", expr("n * syy - sy * sy"))
        .filter(col("varx") > 0 && col("vary") > 0)
        .withColumn("num",
          col("covn").cast(dec38) * col("covn") * lit(1000000L))
        .withColumn("den", col("varx").cast(dec38) * col("vary"))
      m.select(col("event_type"), col("n").as("n_pairs"),
          when(col("covn") < 0, lit(-1L)).otherwise(
            when(col("covn") > 0, lit(1L)).otherwise(lit(0L)))
            .as("r_sign"),
          ((col("num") - pmod(col("num"), col("den"))) / col("den"))
            .cast("long").as("r2_e6"))
        .orderBy(ascf("event_type"))
    },
    Some("""WITH h AS (SELECT event_type,
           |    epoch_us(ts) // 3600000000 AS hr, count(*) AS y
           |  FROM events GROUP BY 1, 2),
           |p AS (SELECT event_type, y,
           |    lead(hr) OVER w AS nhr, lead(y) OVER w AS ny, hr
           |  FROM h WINDOW w AS (PARTITION BY event_type ORDER BY hr ASC)),
           |pp AS (SELECT * FROM p WHERE nhr = hr + 1),
           |m AS (SELECT event_type, count(*) AS n,
           |    sum(y) AS sx, sum(ny) AS sy, sum(y * ny) AS sxy,
           |    sum(y * y) AS sxx, sum(ny * ny) AS syy
           |  FROM pp GROUP BY event_type),
           |c AS (SELECT event_type, n,
           |    n * sxy - sx * sy AS covn,
           |    n * sxx - sx * sx AS varx,
           |    n * syy - sy * sy AS vary
           |  FROM m WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0),
           |nd AS (SELECT event_type, n, covn,
           |    CAST(covn AS HUGEINT) * covn * 1000000 AS num,
           |    CAST(varx AS HUGEINT) * vary AS den
           |  FROM c)
           |SELECT event_type, n AS n_pairs,
           |  CAST(CASE WHEN covn < 0 THEN -1 WHEN covn > 0 THEN 1
           |       ELSE 0 END AS BIGINT) AS r_sign,
           |  CAST((num - num % den) // den AS BIGINT) AS r2_e6
           |FROM nd
           |ORDER BY event_type ASC NULLS FIRST""".stripMargin))

  /** CUSUM changepoint detection per metric (round 5): the hour k that
    * maximizes the cumulative-sum deviation |n·S_k − k·S_n| over the
    * observed hourly-count series — the standard single-changepoint
    * locator (the argmax of the CUSUM statistic is the maximum-
    * likelihood mean-shift split under a Gaussian model). direction > 0
    * means the pre-split mean exceeds the post-split mean (load fell),
    * < 0 the reverse. Gaps in the grid are allowed: k indexes OBSERVED
    * hours (the statistic is well-defined on irregular series; a
    * calendar-grid variant would compose with q_win_gapfill).
    *
    * Determinism: everything is exact int64 — n·S_k ≤ n_hours·total
    * events ≈ 10⁵·10¹² = 10¹⁷ < 2⁶³ at 100 TB (beyond that widen to
    * DECIMAL(38,0) per the q_ts_autocorr pattern); ties on |D_k| break
    * to the EARLIEST hour (D1).
    *
    * Scale: hourly partial agg on the scan; both running and whole-
    * partition window aggregates share ONE (event_type, hr) sort; the
    * argmax is a second window over the same hour-grain relation.
    */
  private val changepoint = QueryDef(
    "q_ts_changepoint",
    (s, d) => {
      val hourly = Tables.events(s, d)
        .select(col("event_type"),
          floorDiv(unix_micros(col("ts")), HourUs).as("hr"))
        .groupBy(col("event_type"), col("hr"))
        .agg(count(lit(1)).as("y"))
      val wOrd = Window.partitionBy(col("event_type")).orderBy(ascf("hr"))
      val wAll = Window.partitionBy(col("event_type"))
      val c = hourly
        .withColumn("k", row_number().over(wOrd).cast("long"))
        .withColumn("sk", sum(col("y")).over(wOrd))
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("sn", sum(col("y")).over(wAll))
        .withColumn("dk", col("n") * col("sk") - col("k") * col("sn"))
      val wPick = Window.partitionBy(col("event_type"))
        .orderBy(descl(abs(col("dk"))), ascf("hr"))
      c.withColumn("rn", row_number().over(wPick))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("n").as("n_hours"),
          col("hr").as("chg_hr"), abs(col("dk")).as("cusum_dev"),
          when(col("dk") > 0, lit(1L)).when(col("dk") < 0, lit(-1L))
            .otherwise(lit(0L)).as("direction"))
        .orderBy(ascf("event_type"))
    },
    Some("""WITH h AS (SELECT event_type,
           |    epoch_us(ts) // 3600000000 AS hr, count(*) AS y
           |  FROM events GROUP BY 1, 2),
           |c AS (SELECT event_type, hr,
           |    CAST(row_number() OVER w AS BIGINT) AS k,
           |    CAST(sum(y) OVER w AS BIGINT) AS sk,
           |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
           |    CAST(sum(y) OVER (PARTITION BY event_type) AS BIGINT) AS sn
           |  FROM h WINDOW w AS (PARTITION BY event_type ORDER BY hr ASC)),
           |d AS (SELECT event_type, hr, n, n * sk - k * sn AS dk FROM c),
           |p AS (SELECT *, row_number() OVER (PARTITION BY event_type
           |    ORDER BY abs(dk) DESC, hr ASC) AS rn FROM d)
           |SELECT event_type, n AS n_hours, hr AS chg_hr,
           |  CAST(abs(dk) AS BIGINT) AS cusum_dev,
           |  CAST(CASE WHEN dk > 0 THEN 1 WHEN dk < 0 THEN -1 ELSE 0 END
           |    AS BIGINT) AS direction
           |FROM p WHERE rn = 1
           |ORDER BY event_type ASC NULLS FIRST""".stripMargin))

  /** Hour-of-day seasonality profile per metric (round 5): the 24-slot
    * diurnal index — idx_e6 = slot share × 24 in 1e-6 units (1e6 =
    * flat) — the periodic-structure census that complements
    * q_ts_changepoint (level shifts) and q_ts_autocorr (persistence).
    * A training pipeline reads it to schedule scrapes/compaction off
    * the peak slots; an anomaly gate normalizes by it before the 3σ
    * rule.
    *
    * hod = (epoch_µs div 3600·10⁶) mod 24 is UTC-midnight-aligned on
    * both engines (epoch 0 is 00:00); all arithmetic exact int64, with
    * the n·24·10⁶ product widened to DECIMAL(38,0)/HUGEINT (overflows
    * int64 past ~4·10¹¹ events per slot — exactly the 100 TB regime).
    *
    * Scale: (type, hod) partial agg on the scan — ≤ types·24 groups
    * per map partition; the per-type total re-aggregates the 120-row
    * relation, never the corpus.
    */
  private val seasonality = QueryDef(
    "q_ts_seasonality",
    (s, d) => {
      val slots = Tables.events(s, d)
        .select(col("event_type"),
          (floorDiv(unix_micros(col("ts")), HourUs) % 24).as("hod"))
        .groupBy(col("event_type"), col("hod"))
        .agg(count(lit(1)).as("n_events"))
      val wT = Window.partitionBy(col("event_type"))
      slots
        .withColumn("total", sum(col("n_events")).over(wT))
        .withColumn("idx_e6", expr(
          "CAST(n_events AS DECIMAL(38,0)) * 24000000 div total"))
        .select(col("event_type"), col("hod"), col("n_events"),
          col("idx_e6"))
        .orderBy(ascf("event_type"), ascf("hod"))
    },
    Some("""WITH sl AS (SELECT event_type,
           |    (epoch_us(ts) // 3600000000) % 24 AS hod,
           |    count(*) AS n_events
           |  FROM events GROUP BY 1, 2),
           |t AS (SELECT event_type, hod, n_events,
           |    sum(n_events) OVER (PARTITION BY event_type) AS total
           |  FROM sl)
           |SELECT event_type, hod, n_events,
           |  CAST(CAST(n_events AS HUGEINT) * 24000000 // total AS BIGINT)
           |    AS idx_e6
           |FROM t
           |ORDER BY event_type ASC NULLS FIRST, hod ASC NULLS FIRST""".stripMargin))

  /** Seasonal-naive forecast backtest (round 6): predict each hour of
    * the LAST 7 observed days by the same hour one week earlier
    * (ŷ(h) = y(h − 168)) and score it — the baseline every capacity-
    * planning / anomaly-thresholding forecast must beat, and the
    * backtest harness shape (train-window → predict → error census)
    * that evaluating ANY forecaster needs. The backtest grid is DENSE:
    * all 168 window hours per type (built with `sequence`, the
    * q_win_gapfill pattern), with both actual and prediction defaulting
    * to 0 on empty hours — restricting to observed hours would
    * silently skip exactly the hours where a forecast fails hardest.
    * The window boundary is data-derived (global max observed hour), so
    * the key is fixture-regeneration-proof.
    *
    * Scale: one hour-grain partial agg on the scan; the grid is
    * types·168 rows; both joins are grid-keyed (broadcast-sized here,
    * key-grain shuffles at any size). All errors exact int64.
    */
  private val forecast = QueryDef(
    "q_ts_forecast",
    (s, d) => {
      val counts = graft.Caches.scoped(Tables.events(s, d)
        .select(col("event_type"),
          floorDiv(unix_micros(col("ts")), HourUs).as("hr"))
        .groupBy(col("event_type"), col("hr"))
        .agg(count(lit(1)).as("c")))
      val maxHr = counts.agg(max(col("hr")).as("mx"))
      val grid = counts.select(col("event_type")).distinct()
        .crossJoin(broadcast(maxHr))
        .select(col("event_type"),
          explode(expr("sequence(mx - 167, mx)")).as("hr"))
      val actual = counts.select(col("event_type"), col("hr"),
        col("c").as("a"))
      val prior = counts.select(col("event_type"),
        (col("hr") + 168L).as("hr"), col("c").as("p"))
      grid.join(actual, Seq("event_type", "hr"), "left")
        .join(prior, Seq("event_type", "hr"), "left")
        .select(col("event_type"),
          coalesce(col("a"), lit(0L)).as("a"),
          coalesce(col("p"), lit(0L)).as("p"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_hours"),
          sum(col("a")).as("sum_actual"),
          sum(col("p")).as("sum_pred"),
          sum(abs(col("a") - col("p"))).as("sum_abs_err"),
          max(abs(col("a") - col("p"))).as("max_abs_err"))
        .orderBy(ascf("event_type"))
    },
    Some("""WITH c AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
           |    count(*) AS c FROM events GROUP BY 1, 2),
           |mx AS (SELECT max(hr) AS mx FROM c),
           |g AS (SELECT t.event_type, u.hr FROM
           |  (SELECT DISTINCT event_type FROM c) t
           |  CROSS JOIN (SELECT unnest(generate_series(
           |    (SELECT mx FROM mx) - 167, (SELECT mx FROM mx))) AS hr) u),
           |j AS (SELECT g.event_type AS event_type,
           |    coalesce(a.c, 0) AS a, coalesce(p.c, 0) AS p
           |  FROM g
           |  LEFT JOIN c a ON g.event_type = a.event_type AND g.hr = a.hr
           |  LEFT JOIN c p ON g.event_type = p.event_type
           |    AND g.hr = p.hr + 168)
           |SELECT event_type, count(*) AS n_hours,
           |  CAST(sum(a) AS BIGINT) AS sum_actual,
           |  CAST(sum(p) AS BIGINT) AS sum_pred,
           |  CAST(sum(abs(a - p)) AS BIGINT) AS sum_abs_err,
           |  CAST(max(abs(a - p)) AS BIGINT) AS max_abs_err
           |FROM j GROUP BY event_type
           |ORDER BY event_type ASC NULLS FIRST""".stripMargin))

  /** Linear interpolation of missing hours (round 6): q_win_gapfill
    * carries the last observation forward; this key fills each interior
    * gap hour h between consecutive OBSERVED hours (h0,v0),(h1,v1) with
    * the linear blend (v0·(h1−h) + v1·(h−h0)) / (h1−h0) — the resample
    * step a feature pipeline runs before a model that cannot see NULLs.
    *
    * All arithmetic is exact integer: hourly values are cents
    * (DECIMAL(18,2) sums ×100 → int64, rule D2 — never a
    * double-accumulation), the blend numerator is int64, and the
    * division is a single truncating int div on a scaled (×1e4)
    * numerator — every operand non-negative, so Spark `div` and
    * DuckDB `//` agree. No doubles anywhere (D11/D12 trivially hold).
    *
    * Shape at 100 TB: one hour-grain partial agg on the scan (the heavy
    * step), one lead() window per type, and the gap explode is
    * calendar-bounded (≤ observed-span hours per type), never
    * corpus-sized.
    */
  private val interp = QueryDef(
    "q_ts_interp",
    (s, d) => {
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"),
          floorDiv(unix_micros(col("ts")), HourUs).as("hr"))
        .agg((sum(dec(col("value"))) * 100).cast("long").as("vc"))
      val w = Window.partitionBy(col("event_type")).orderBy(ascf("hr"))
      val seg = hourly
        .withColumn("h1", lead(col("hr"), 1).over(w))
        .withColumn("v1", lead(col("vc"), 1).over(w))
      val gaps = seg.filter(col("h1").isNotNull && col("h1") > col("hr") + 1)
        .select(col("event_type"), col("hr").as("h0"), col("vc").as("v0"),
          col("h1"), col("v1"),
          explode(expr("sequence(hr + 1, h1 - 1)")).as("h"))
        .withColumn("interp_e4",
          expr("((v0 * (h1 - h) + v1 * (h - h0)) * 10000) div (h1 - h0)"))
      val gapAgg = gaps.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_gap_hours"),
          sum(col("interp_e4")).as("interp_checksum"))
      val obsAgg = seg.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_obs"),
          max(when(col("h1").isNotNull, col("h1") - col("hr") - 1))
            .as("max_gap"))
      obsAgg.join(gapAgg, Seq("event_type"), "left")
        .select(col("event_type"), col("n_obs"),
          coalesce(col("n_gap_hours"), lit(0L)).as("n_gap_hours"),
          coalesce(col("max_gap"), lit(0L)).as("max_gap"),
          coalesce(col("interp_checksum"), lit(0L)).as("interp_checksum"))
        .orderBy(ascf("event_type"))
    },
    Some("""WITH h AS (SELECT event_type,
           |    epoch_us(ts) // 3600000000 AS hr,
           |    CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS vc
           |  FROM events GROUP BY 1, 2),
           |seg AS (SELECT event_type, hr AS h0, vc AS v0,
           |    lead(hr) OVER (PARTITION BY event_type ORDER BY hr ASC) AS h1,
           |    lead(vc) OVER (PARTITION BY event_type ORDER BY hr ASC) AS v1
           |  FROM h),
           |gp AS (SELECT event_type,
           |    ((v0 * (h1 - u.h) + v1 * (u.h - h0)) * 10000) // (h1 - h0)
           |      AS interp_e4
           |  FROM seg, LATERAL unnest(generate_series(h0 + 1, h1 - 1)) u(h)
           |  WHERE h1 IS NOT NULL AND h1 > h0 + 1),
           |ga AS (SELECT event_type, count(*) AS n_gap_hours,
           |    CAST(sum(interp_e4) AS BIGINT) AS interp_checksum
           |  FROM gp GROUP BY 1),
           |oa AS (SELECT event_type, count(*) AS n_obs,
           |    max(CASE WHEN h1 IS NOT NULL THEN h1 - h0 - 1 END) AS max_gap
           |  FROM seg GROUP BY 1)
           |SELECT oa.event_type AS event_type,
           |  CAST(oa.n_obs AS BIGINT) AS n_obs,
           |  CAST(coalesce(ga.n_gap_hours, 0) AS BIGINT) AS n_gap_hours,
           |  CAST(coalesce(oa.max_gap, 0) AS BIGINT) AS max_gap,
           |  CAST(coalesce(ga.interp_checksum, 0) AS BIGINT) AS interp_checksum
           |FROM oa LEFT JOIN ga ON oa.event_type = ga.event_type
           |ORDER BY event_type ASC NULLS FIRST""".stripMargin))

  /** Holt double-exponential smoothing (round 7) — level + trend state,
    * the step up from q_ts_ewma (level only) and the recurrence behind
    * q_ts_forecast-style projections: per event type, the daily count
    * series folded through l_t = α·x_t + (1−α)(l+b), b_t = β(l_t−l)
    * + (1−β)b with dyadic α=β=1/2, carried as EXACT int64 in 4096ths —
    * every step one truncating halving (Spark `div` ≡ DuckDB `//`,
    * both toward zero, verified incl. negatives — trend goes negative
    * on declining days). Unlike the ewma key's fixed-lag truncation,
    * this is the TRUE infinite-memory recurrence: inherently
    * sequential, so the engines diverge unless the fold order is
    * pinned — which is the point of grading it.
    *
    * Spark has no recursive SQL; the fold runs as an `aggregate` HOF
    * over each type's day-sorted array — per-group state is
    * series-length-bounded (≤ days, ~30 here; a year is 365 — fine; a
    * tick-grain series would first downsample via q_ts_ohlc, which is
    * how production Holt-Winters runs anyway). DuckDB grades it with a
    * RECURSIVE CTE computing the same recurrence row-by-row — two
    * maximally-different executions of one integer fold.
    *
    * Scale: the day-grain partial agg is the only corpus-sized
    * shuffle; the fold touches type-grain rows (5 arrays). Output:
    * final level/trend, a 7-day linear forecast, and the level-path
    * checksum (Σ l_t — pins every intermediate state, not just the
    * endpoint).
    */
  private val holt = QueryDef(
    "q_ts_holt",
    (s, d) => {
      val daily = Tables.events(s, d)
        .select(col("event_type"),
          floorDiv(unix_micros(col("ts")), DayUs).as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("c"))
      daily.groupBy(col("event_type"))
        .agg(array_sort(collect_list(struct(col("day"), col("c"))))
          .as("xs"))
        .withColumn("st", expr(
          """aggregate(xs,
            |  named_struct('l', 0L, 'b', 0L, 'suml', 0L, 'n', 0L),
            |  (st, x) -> CASE WHEN st.n = 0
            |    THEN named_struct('l', x.c * 4096L, 'b', 0L,
            |      'suml', x.c * 4096L, 'n', 1L)
            |    ELSE named_struct(
            |      'l', (x.c * 4096L + st.l + st.b) div 2L,
            |      'b', (st.b + ((x.c * 4096L + st.l + st.b) div 2L)
            |            - st.l) div 2L,
            |      'suml', st.suml + ((x.c * 4096L + st.l + st.b) div 2L),
            |      'n', st.n + 1L) END)""".stripMargin))
        .select(col("event_type"), col("st.n").as("n_days"),
          col("st.l").as("level_x4096"), col("st.b").as("trend_x4096"),
          (col("st.l") + lit(7L) * col("st.b")).as("forecast7_x4096"),
          col("st.suml").as("suml_x4096"))
        .orderBy(ascf("event_type"))
    },
    Some("""WITH RECURSIVE h AS (SELECT event_type,
           |    epoch_us(ts) // 86400000000 AS day, count(*) AS c
           |  FROM events GROUP BY 1, 2),
           |hr AS (SELECT event_type, c, row_number() OVER (
           |    PARTITION BY event_type ORDER BY day ASC) AS rn FROM h),
           |s AS (
           |  SELECT event_type, rn, c * 4096 AS l, CAST(0 AS BIGINT) AS b,
           |    c * 4096 AS suml
           |  FROM hr WHERE rn = 1
           |  UNION ALL
           |  SELECT hr.event_type, hr.rn,
           |    (hr.c * 4096 + s.l + s.b) // 2,
           |    (s.b + ((hr.c * 4096 + s.l + s.b) // 2) - s.l) // 2,
           |    s.suml + ((hr.c * 4096 + s.l + s.b) // 2)
           |  FROM s JOIN hr ON hr.event_type = s.event_type
           |    AND hr.rn = s.rn + 1),
           |fin AS (SELECT s.*, row_number() OVER (
           |    PARTITION BY event_type ORDER BY rn DESC) AS rr FROM s)
           |SELECT event_type, CAST(rn AS BIGINT) AS n_days,
           |  CAST(l AS BIGINT) AS level_x4096,
           |  CAST(b AS BIGINT) AS trend_x4096,
           |  CAST(l + 7 * b AS BIGINT) AS forecast7_x4096,
           |  CAST(suml AS BIGINT) AS suml_x4096
           |FROM fin WHERE rr = 1
           |ORDER BY event_type ASC NULLS FIRST""".stripMargin))

  /** Theil–Sen robust trend per metric (round 7): the median of all
    * pairwise slopes over the DAILY count series — the outlier-immune
    * sibling of q_ts_trend's OLS slope (one corrupt day moves OLS
    * arbitrarily but shifts a median of 435 slopes by one rank).
    *
    * Scale: the pair enumeration is CALENDAR²-bounded, not corpus-
    * bounded — the daily series has span-many points per metric (30
    * here; 3 650 for a decade), so pairs are ≤ span²/2 per metric no
    * matter how many raw events collapse into each day. The corpus-
    * sized work is exactly one day-grain partial aggregation on the
    * scan; everything downstream runs on the tiny series relation.
    *
    * Determinism: each pairwise slope is quantized to an int64
    * slope_e6 = floor(10⁶·Δy / Δx) via the subtract-pmod-then-divide
    * construction (Δy may be negative; DuckDB `//` truncates, Spark has
    * no integer floor-div — the q_ts_trend lesson), so the median runs
    * over INTEGERS: Spark `percentile` and DuckDB `quantile_cont` both
    * interpolate midpoints of exactly-representable int64s ≪ 2⁵³, and
    * round(4) absorbs any last-ulp formula drift (q_agg_percentile
    * precedent).
    */
  private val theilSen = QueryDef(
    "q_ts_theil_sen",
    (s, d) => {
      // scoped persist: the self-join would otherwise re-execute the
      // corpus-sized day-grain aggregation on BOTH sides (the r7 plan
      // dump showed two parquet scans) — with the tiny series relation
      // materialized once, the pair join reads memory twice and the
      // corpus exactly once
      val daily = graft.Caches.scoped(Tables.events(s, d)
        .select(col("event_type"),
          floorDiv(unix_micros(col("ts")), DayUs).as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("y")))
      val a = daily.select(col("event_type"), col("day").as("xi"),
        col("y").as("yi"))
      val b = daily.select(col("event_type"), col("day").as("xj"),
        col("y").as("yj"))
      val pairs = a.join(b, Seq("event_type"))
        .filter(col("xj") > col("xi"))
        .select(col("event_type"),
          (lit(1000000L) * (col("yj") - col("yi"))).as("num"),
          (col("xj") - col("xi")).as("den"))
        .select(col("event_type"),
          ((col("num") - pmod(col("num"), col("den")))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0))
            / col("den")).cast("long").as("slope_e6"))
      pairs.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_pairs"),
          round(expr("percentile(slope_e6, 0.5)"), 4).as("ts_slope_e6"))
        .orderBy(ascf("event_type"))
    },
    Some("""WITH h AS (SELECT event_type,
           |    epoch_us(ts) // 86400000000 AS day, count(*) AS y
           |  FROM events GROUP BY 1, 2),
           |p AS (SELECT a.event_type,
           |    1000000 * (b.y - a.y) AS num, b.day - a.day AS den
           |  FROM h a JOIN h b ON a.event_type = b.event_type
           |    AND b.day > a.day),
           |sl AS (SELECT event_type,
           |    CAST((num - ((num % den) + den) % den) // den AS BIGINT)
           |      AS slope_e6
           |  FROM p)
           |SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
           |  round(quantile_cont(slope_e6, 0.5), 4) AS ts_slope_e6
           |FROM sl GROUP BY event_type
           |ORDER BY event_type ASC NULLS FIRST""".stripMargin))

  /** Multi-touch purchase attribution (round 7): the marketing-
    * analytics read — for every purchase, which preceding touch (click
    * or view) gets the credit under the FIRST-touch and LAST-touch
    * models, with purchase counts and cent-exact revenue per
    * (model, touch-type) cell.
    *
    * The touch lookup is the PACKED-window trick: each touch encodes
    * (row_number·10 + type_code) and the preceding-frame max/min then
    * selects the latest/earliest touch AND its type in one window pass —
    * `max` skips NULLs in both engines by SQL definition, so no
    * IGNORE NULLS syntax (which the engines spell differently) is
    * needed, and no self-join back to the touch row either.
    *
    * Scale: ONE window pass partitioned by user (the natural shuffle
    * key; user histories are human-bounded) + a 4-row aggregation.
    * Determinism: rn orders by (ts, event_id) — event_id is unique —
    * and revenue is exact cents (rule D2).
    */
  private val attrib = QueryDef(
    "q_win_attrib",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(ascf("ts"), ascf("event_id"))
      val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
      val e = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"),
          (dec(col("value")) * 100).cast("long").as("cents"))
        .withColumn("rn", row_number().over(w))
        .withColumn("packed",
          when(col("event_type") === "click", col("rn") * 10 + 1)
            .when(col("event_type") === "view", col("rn") * 10 + 2))
      val purchases = e
        .withColumn("last_packed", max(col("packed")).over(wPrev))
        .withColumn("first_packed", min(col("packed")).over(wPrev))
        .filter(col("event_type") === "purchase" &&
          col("last_packed").isNotNull)
      // one window pass feeds BOTH models: each purchase explodes into
      // its (model, packed) pair before the census — a union of two
      // aggregations would re-run the whole scan+window pipeline per
      // branch (the r7 plan dump showed exactly that)
      purchases
        .select(col("cents"), explode(expr(
          """array(struct('first' AS model, first_packed AS packed),
            |      struct('last' AS model, last_packed AS packed))"""
            .stripMargin)).as("mp"))
        .groupBy(col("mp.model").as("model"),
          when(pmod(col("mp.packed"), lit(10)) === 1, lit("click"))
            .otherwise(lit("view")).as("touch"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(col("cents")).as("cents"))
        .orderBy(ascf("model"), ascf("touch"))
    },
    Some("""WITH e AS (SELECT user_id, ts, event_id, event_type,
           |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
           |      AS cents,
           |    row_number() OVER
           |      (PARTITION BY user_id
           |       ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST)
           |      AS rn
           |  FROM events),
           |p AS (SELECT user_id, ts, event_id, event_type, cents, rn,
           |    CASE WHEN event_type = 'click' THEN rn * 10 + 1
           |         WHEN event_type = 'view' THEN rn * 10 + 2 END
           |      AS packed
           |  FROM e),
           |wp AS (SELECT event_type, cents,
           |    max(packed) OVER
           |      (PARTITION BY user_id
           |       ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST
           |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           |      AS last_packed,
           |    min(packed) OVER
           |      (PARTITION BY user_id
           |       ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST
           |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           |      AS first_packed
           |  FROM p),
           |pur AS (SELECT * FROM wp
           |  WHERE event_type = 'purchase' AND last_packed IS NOT NULL),
           |cells AS (
           |  SELECT 'first' AS model,
           |    CASE WHEN first_packed % 10 = 1 THEN 'click'
           |         ELSE 'view' END AS touch,
           |    count(*) AS n_purchases, sum(cents) AS cents
           |  FROM pur GROUP BY 1, 2
           |  UNION ALL
           |  SELECT 'last' AS model,
           |    CASE WHEN last_packed % 10 = 1 THEN 'click'
           |         ELSE 'view' END AS touch,
           |    count(*) AS n_purchases, sum(cents) AS cents
           |  FROM pur GROUP BY 1, 2)
           |SELECT model, touch, CAST(n_purchases AS BIGINT) AS n_purchases,
           |  CAST(cents AS BIGINT) AS cents
           |FROM cells
           |ORDER BY model ASC NULLS FIRST, touch ASC NULLS FIRST"""
      .stripMargin))

  /** Next-event transition matrix (round 7): the first-order Markov
    * census over per-user event streams — for every (from, to) pair of
    * consecutive events, the count and the conditional transition
    * probability in 1e-6 units. This is the behavioral-model read
    * behind "what do users do after an error?" and the input to any
    * sequence-anomaly or next-action model.
    *
    * Scale: ONE user-partitioned lead() window pass (user histories
    * human-bounded — the same shuffle key every per-user op reuses)
    * collapsing to a type²-bounded census (≤25 rows here); the
    * conditional denominator re-aggregates the census itself, never the
    * event stream.
    *
    * Determinism: the sequence orders by (ts, event_id unique); p_e6
    * floor-divides exactly via the subtract-pmod construction
    * (numerator non-negative, but the division must be EXACT — the
    * q_ts_trend lesson).
    */
  private val transitions = QueryDef(
    "q_ts_transitions",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(ascf("ts"), ascf("event_id"))
      val census = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("nxt", lead(col("event_type"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy(col("event_type").as("from_type"),
          col("nxt").as("to_type"))
        .agg(count(lit(1)).as("n"))
      val wf = Window.partitionBy(col("from_type"))
      census
        .withColumn("tot", sum(col("n")).over(wf))
        .withColumn("num", col("n") * 1000000L)
        .select(col("from_type"), col("to_type"), col("n"),
          ((col("num") - pmod(col("num"), col("tot")))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0))
            / col("tot")).cast("long").as("p_e6"))
        .orderBy(ascf("from_type"), ascf("to_type"))
    },
    Some("""WITH seq AS (SELECT event_type,
           |    lead(event_type) OVER
           |      (PARTITION BY user_id
           |       ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST)
           |      AS nxt
           |  FROM events),
           |c AS (SELECT event_type AS from_type, nxt AS to_type,
           |    CAST(count(*) AS BIGINT) AS n
           |  FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
           |t AS (SELECT from_type, to_type, n,
           |    sum(n) OVER (PARTITION BY from_type) AS tot,
           |    n * 1000000 AS num
           |  FROM c)
           |SELECT from_type, to_type, n,
           |  CAST((num - ((num % tot) + tot) % tot) // tot AS BIGINT)
           |    AS p_e6
           |FROM t
           |ORDER BY from_type ASC NULLS FIRST, to_type ASC NULLS FIRST"""
      .stripMargin))

  /** Visual downsampling by largest-triangle selection (round 7): per
    * metric, keep the ONE point per 5-day bucket whose triangle with
    * its actual neighbors has the largest area — the LTOB
    * (largest-triangle-one-bucket) variant of Steinarsson's LTTB, the
    * standard dashboard decimation that preserves spikes where naive
    * every-Nth sampling erases them. (LTTB proper chains on the
    * previously SELECTED point — an inherently sequential fold; LTOB
    * uses fixed actual neighbors, which windows express exactly, and is
    * the published fallback with near-identical visual fidelity.)
    *
    * Scale: one day-grain partial agg on the scan, one lag/lead window
    * and one per-bucket argmax on the calendar-bounded series — the
    * output is bucket-sized no matter the event volume.
    *
    * Determinism: twice-the-area is exact integer cross-product
    * arithmetic; the per-bucket argmax order (area2 DESC, x ASC) is
    * total.
    */
  private val downsample = QueryDef(
    "q_ts_downsample",
    (s, d) => {
      // scoped persist: d0 re-derives from daily, which would otherwise
      // re-execute the corpus-sized day-grain aggregation on both sides
      // of the join (the theil_sen plan-dump lesson, same round)
      val daily = graft.Caches.scoped(Tables.events(s, d)
        .select(col("event_type"),
          floorDiv(unix_micros(col("ts")), DayUs).as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("y")))
      val d0 = daily.groupBy(col("event_type")).agg(min(col("day")).as("d0"))
      val w = Window.partitionBy(col("event_type")).orderBy(ascf("x"))
      val tri = daily.join(d0, "event_type")
        .withColumn("x", col("day") - col("d0"))
        .withColumn("xp", lag(col("x"), 1).over(w))
        .withColumn("yp", lag(col("y"), 1).over(w))
        .withColumn("xn", lead(col("x"), 1).over(w))
        .withColumn("yn", lead(col("y"), 1).over(w))
        .filter(col("xp").isNotNull && col("xn").isNotNull)
        .withColumn("area2", abs((col("xp") - col("xn"))
          * (col("y") - col("yp"))
          - (col("xp") - col("x")) * (col("yn") - col("yp"))))
        .withColumn("bucket", floorDiv(col("x"), 5L))
      val wb = Window.partitionBy(col("event_type"), col("bucket"))
        .orderBy(descl("area2"), ascf("x"))
      tri.withColumn("rn", row_number().over(wb))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("bucket"), col("x").as("x_kept"),
          col("y").as("y_kept"), col("area2"))
        .orderBy(ascf("event_type"), ascf("bucket"))
    },
    Some("""WITH h AS (SELECT event_type,
           |    epoch_us(ts) // 86400000000 AS day, count(*) AS y
           |  FROM events GROUP BY 1, 2),
           |d0 AS (SELECT event_type, min(day) AS d0 FROM h GROUP BY 1),
           |x0 AS (SELECT h.event_type, h.day - d0.d0 AS x, h.y
           |  FROM h JOIN d0 ON h.event_type = d0.event_type),
           |tri AS (SELECT event_type, x, y,
           |    lag(x) OVER win AS xp, lag(y) OVER win AS yp,
           |    lead(x) OVER win AS xn, lead(y) OVER win AS yn
           |  FROM x0
           |  WINDOW win AS (PARTITION BY event_type
           |    ORDER BY x ASC NULLS FIRST)),
           |ar AS (SELECT event_type, x, y,
           |    abs((xp - xn) * (y - yp) - (xp - x) * (yn - yp)) AS area2,
           |    x // 5 AS bucket
           |  FROM tri WHERE xp IS NOT NULL AND xn IS NOT NULL),
           |rk AS (SELECT *, row_number() OVER (
           |    PARTITION BY event_type, bucket
           |    ORDER BY area2 DESC NULLS LAST, x ASC NULLS FIRST) AS rn
           |  FROM ar)
           |SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
           |  CAST(x AS BIGINT) AS x_kept, CAST(y AS BIGINT) AS y_kept,
           |  CAST(area2 AS BIGINT) AS area2
           |FROM rk WHERE rn = 1
           |ORDER BY event_type ASC NULLS FIRST, bucket ASC NULLS FIRST"""
      .stripMargin))

  /** Forecast backtest on a holdout window (round 7): the evaluation
    * half of the forecasting workflow — hold out each metric's last 7
    * days, predict them with the SEASONAL-NAIVE baseline (ŷ(d) =
    * y(d−7), the standard yardstick every published forecast must
    * beat), and report WAPE and signed bias in 1e-6 units. A forecast
    * key without an eval key is a model nobody can ship.
    *
    * Determinism: the split is data-derived (per-metric max day − 7);
    * predictions come from an explicit self-join on day−7 (no
    * contiguity assumption); WAPE floor-divides non-negative int64s,
    * and the SIGNED bias uses the subtract-pmod floor construction
    * (Σ(ŷ−y) may be negative — the q_ts_trend lesson).
    *
    * Scale: one day-grain partial agg on the scan (scoped-persisted —
    * the split bound and the join both re-derive from it), then
    * everything runs on the calendar-bounded series.
    */
  private val evalWape = QueryDef(
    "q_ts_eval_wape",
    (s, d) => {
      val daily = graft.Caches.scoped(Tables.events(s, d)
        .select(col("event_type"),
          floorDiv(unix_micros(col("ts")), DayUs).as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("y")))
      val split = daily.groupBy(col("event_type"))
        .agg((max(col("day")) - 7).as("split"))
      val holdout = daily.join(split, "event_type")
        .filter(col("day") > col("split"))
      val pred = daily.select(col("event_type"),
        (col("day") + 7).as("day"), col("y").as("yhat"))
      val j = holdout.join(pred, Seq("event_type", "day"))
        .select(col("event_type"), col("y"), col("yhat"),
          abs(col("y") - col("yhat")).as("abs_err"),
          (col("yhat") - col("y")).as("err"))
      j.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_eval"),
          sum(col("abs_err")).as("sae"), sum(col("y")).as("sy"),
          sum(col("err")).as("se"))
        .select(col("event_type"), col("n_eval"),
          expr("(sae * 1000000L) div sy").as("wape_e6"),
          ((col("se") * 1000000L
            - pmod(col("se") * 1000000L, col("sy")))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0))
            / col("sy")).cast("long").as("bias_e6"))
        .orderBy(ascf("event_type"))
    },
    Some("""WITH h AS (SELECT event_type,
           |    epoch_us(ts) // 86400000000 AS day, count(*) AS y
           |  FROM events GROUP BY 1, 2),
           |sp AS (SELECT event_type, max(day) - 7 AS split
           |  FROM h GROUP BY 1),
           |ho AS (SELECT h.event_type, h.day, h.y
           |  FROM h JOIN sp ON h.event_type = sp.event_type
           |  WHERE h.day > sp.split),
           |pr AS (SELECT event_type, day + 7 AS day, y AS yhat FROM h),
           |j AS (SELECT ho.event_type, ho.y, pr.yhat,
           |    abs(ho.y - pr.yhat) AS abs_err, pr.yhat - ho.y AS err
           |  FROM ho JOIN pr
           |    ON ho.event_type = pr.event_type AND ho.day = pr.day),
           |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_eval,
           |    CAST(sum(abs_err) AS BIGINT) AS sae,
           |    CAST(sum(y) AS BIGINT) AS sy,
           |    CAST(sum(err) AS BIGINT) AS se
           |  FROM j GROUP BY 1)
           |SELECT event_type, n_eval,
           |  CAST((sae * 1000000) // sy AS BIGINT) AS wape_e6,
           |  CAST((se * 1000000
           |      - (((se * 1000000) % sy) + sy) % sy) // sy AS BIGINT)
           |    AS bias_e6
           |FROM m ORDER BY event_type ASC NULLS FIRST""".stripMargin))

  /** Time-to-convert latency distribution (round 7): for every user who
    * signs up and later purchases, the signup→first-purchase latency —
    * the activation metric product teams steer by — summarized as
    * median/p90 (exact interpolated percentiles over integer seconds)
    * plus conversion counts.
    *
    * Scale: one user-grain aggregate computes both anchor timestamps
    * (min signup, min purchase-after via conditional min over ONE pass
    * — no self-join), then the percentile runs over the converted-user
    * relation, which is user-bounded, not event-bounded.
    *
    * Determinism: latencies are exact integer seconds (µs floor-div);
    * percentile ↔ quantile_cont interpolate exactly-representable ints
    * with round(4) absorbing last-ulp drift (q_agg_percentile).
    *
    * Ordering subtlety: purchases BEFORE the user's first signup must
    * not count, so each purchase row reads the running min of signup
    * timestamps UP TO ITSELF (a user-partitioned preceding-frame
    * window) — null until the first signup, constant afterwards. One
    * shuffle serves both the window and the per-user aggregate.
    */
  private val latency = QueryDef(
    "q_win_latency",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(ascf("ts"), ascf("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val e = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("tus"))
        .withColumn("signup_min",
          min(when(col("event_type") === "signup", col("tus"))).over(w))
      val conv = e
        .filter(col("event_type") === "purchase" &&
          col("signup_min").isNotNull)
        .groupBy(col("user_id"))
        .agg(min(col("tus") - col("signup_min")).as("lat_us"))
        .select(col("user_id"),
          floorDiv(col("lat_us"), 1000000L).as("lat_s"))
      conv.agg(count(lit(1)).as("n_converted"),
          round(expr("percentile(lat_s, 0.5)"), 4).as("p50_s"),
          round(expr("percentile(lat_s, 0.9)"), 4).as("p90_s"),
          max(col("lat_s")).as("max_s"))
        .orderBy(ascf("n_converted"))
    },
    Some("""WITH e AS (SELECT user_id, event_id, event_type,
           |    epoch_us(ts) AS tus,
           |    min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
           |      OVER (PARTITION BY user_id
           |        ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      AS signup_min
           |  FROM events),
           |conv AS (SELECT user_id,
           |    CAST(min(tus - signup_min) AS BIGINT) // 1000000 AS lat_s
           |  FROM e
           |  WHERE event_type = 'purchase' AND signup_min IS NOT NULL
           |  GROUP BY user_id)
           |SELECT CAST(count(*) AS BIGINT) AS n_converted,
           |  round(quantile_cont(lat_s, 0.5), 4) AS p50_s,
           |  round(quantile_cont(lat_s, 0.9), 4) AS p90_s,
           |  CAST(max(lat_s) AS BIGINT) AS max_s
           |FROM conv
           |ORDER BY n_converted ASC NULLS FIRST""".stripMargin))

  /** Dominant-period detection (round 7): for each metric, the lag
    * L ∈ 1..10 whose lag-L autocorrelation is strongest — the
    * periodicity finder behind seasonal model selection (q_ts_autocorr
    * measures persistence at lag 1; q_ts_seasonality ASSUMES the
    * 24-hour period; this key DISCOVERS the period).
    *
    * Determinism: per (metric, lag) the signed score is
    * sign(cov)·cov²·10⁶ / (varx·vary), computed entirely in
    * DECIMAL(38,0)/HUGEINT (cov² reaches ~10²¹ at the 10× probe —
    * int64 is out of the question, the q_ts_autocorr widening); the
    * argmax order (score DESC, lag ASC) is total.
    *
    * Scale: ONE equi-join builds all ten lag-pair sets — the daily
    * relation crosses the 10-row lag spine keyed on (type, day−L), so
    * adding lags widens the spine, never adds a corpus pass; moments
    * partial-aggregate per (type, lag); the argmax runs on ≤ 10 rows
    * per metric.
    */
  private val period = QueryDef(
    "q_ts_period",
    (s, d) => {
      val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val daily = graft.Caches.scoped(Tables.events(s, d)
        .select(col("event_type"),
          floorDiv(unix_micros(col("ts")), DayUs).as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("y")))
      val lagged = daily
        .select(col("event_type"), col("day"), col("y").as("x"),
          explode(sequence(lit(1L), lit(10L))).as("lag"))
        .withColumn("pday", col("day") - col("lag"))
      val pairs = lagged.join(
        daily.select(col("event_type"), col("day").as("pday"),
          col("y").as("yp")),
        Seq("event_type", "pday"))
      val m = pairs.groupBy(col("event_type"), col("lag"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("yp")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("yp") * col("yp")).as("syy"),
          sum(col("x") * col("yp")).as("sxy"))
        .withColumn("num", col("n") * col("sxy") - col("sx") * col("sy"))
        .withColumn("vx", col("n") * col("sxx") - col("sx") * col("sx"))
        .withColumn("vy", col("n") * col("syy") - col("sy") * col("sy"))
        .filter(col("vx") > 0 && col("vy") > 0)
        .withColumn("score_e6",
          (when(col("num") < 0, lit(-1L)).otherwise(lit(1L))) *
            expr("""CAST(CAST(num AS DECIMAL(38,0)) * num * 1000000
                   | div (CAST(vx AS DECIMAL(38,0)) * vy)
                   | AS BIGINT)""".stripMargin))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
        .orderBy(descl("score_e6"), ascf("lag"))
      m.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("event_type"), col("lag").as("best_lag"), col("n"),
          col("score_e6"))
        .orderBy(ascf("event_type"))
    },
    Some("""WITH h AS (SELECT event_type,
           |    epoch_us(ts) // 86400000000 AS day, count(*) AS y
           |  FROM events GROUP BY 1, 2),
           |lg AS (SELECT h.event_type, h.day, h.y AS x,
           |    unnest(generate_series(1, 10)) AS lag
           |  FROM h),
           |pr AS (SELECT lg.event_type, lg.lag, lg.x, b.y AS yp
           |  FROM lg JOIN h b ON lg.event_type = b.event_type
           |    AND lg.day - lg.lag = b.day),
           |m AS (SELECT event_type, lag, CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(yp) AS BIGINT) AS sy,
           |    CAST(sum(x * x) AS BIGINT) AS sxx,
           |    CAST(sum(yp * yp) AS BIGINT) AS syy,
           |    CAST(sum(x * yp) AS BIGINT) AS sxy
           |  FROM pr GROUP BY 1, 2),
           |c AS (SELECT event_type, lag, n,
           |    n * sxy - sx * sy AS num,
           |    n * sxx - sx * sx AS vx, n * syy - sy * sy AS vy
           |  FROM m),
           |sc AS (SELECT event_type, lag, n,
           |    (CASE WHEN num < 0 THEN -1 ELSE 1 END) *
           |      CAST(CAST(num AS HUGEINT) * num * 1000000
           |        // (CAST(vx AS HUGEINT) * vy) AS BIGINT) AS score_e6
           |  FROM c WHERE vx > 0 AND vy > 0),
           |rk AS (SELECT *, row_number() OVER (PARTITION BY event_type
           |    ORDER BY score_e6 DESC NULLS LAST, lag ASC NULLS FIRST)
           |      AS rn
           |  FROM sc)
           |SELECT event_type, CAST(lag AS BIGINT) AS best_lag, n,
           |  CAST(score_e6 AS BIGINT) AS score_e6
           |FROM rk WHERE rn = 1
           |ORDER BY event_type ASC NULLS FIRST""".stripMargin))

  /** Cross-correlation function between two signals (round 7): the full
    * CCF table of the hourly click series against the purchase series
    * shifted by 0..6 hours — the lead-lag discovery primitive (which lag
    * maximizes |r| IS the estimated response delay between the driver
    * signal and the outcome signal). Unlike [[period]] (self-lag argmax
    * per series) this correlates two DIFFERENT series and reports every
    * lag, so downstream can see the whole response curve, not one peak.
    *
    * Scale: the corpus collapses to two hour-grain censuses in one
    * filtered partial agg (time-bounded: rows = observed hours, never
    * event-sized); all 7 lags ride ONE equi-join of the lag-exploded
    * click series against the purchase series (the q_ts_period shape),
    * and the purchase side is hour-count-sized so Spark broadcasts it.
    * Pairs exist only where both series observed the hour (CCF over
    * co-observed points; compose with q_win_gapfill for a gridded
    * variant).
    *
    * Determinism (D2/D12): exact int64 moments; r² in 1e-6 units via the
    * DECIMAL(38,0)/HUGEINT widening (covn² at 10× data overflows int64 —
    * the q_ts_period/q_ts_autocorr moment pattern), sign factored out so
    * truncating div on a non-negative ratio agrees across engines.
    */
  private val crossCorr = QueryDef(
    "q_ts_cross_corr",
    (s, d) => {
      val hourly = graft.Caches.scoped(Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_type"),
          floorDiv(unix_micros(col("ts")), HourUs).as("hr"))
        .groupBy(col("event_type"), col("hr"))
        .agg(count(lit(1)).as("c")))
      val hx = hourly.filter(col("event_type") === "click")
        .select(col("hr"), col("c").as("x"),
          explode(sequence(lit(0L), lit(6L))).as("lag"))
      val hy = hourly.filter(col("event_type") === "purchase")
        .select(col("hr").as("yhr"), col("c").as("y"))
      val pairs = hx.join(broadcast(hy), col("yhr") === col("hr") + col("lag"))
      val m = pairs.groupBy(col("lag"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .withColumn("covn", expr("n * sxy - sx * sy"))
        .withColumn("vx", expr("n * sxx - sx * sx"))
        .withColumn("vy", expr("n * syy - sy * sy"))
        .filter(col("vx") > 0 && col("vy") > 0)
      m.select(col("lag"), col("n").as("n_pairs"),
          when(col("covn") < 0, lit(-1L))
            .when(col("covn") > 0, lit(1L)).otherwise(lit(0L)).as("r_sign"),
          expr("""CAST(CAST(covn AS DECIMAL(38,0)) * covn * 1000000
                 | div (CAST(vx AS DECIMAL(38,0)) * vy)
                 | AS BIGINT)""".stripMargin).as("r2_e6"))
        .orderBy(ascf("lag"))
    },
    Some("""WITH h AS (SELECT event_type,
           |    epoch_us(ts) // 3600000000 AS hr, count(*) AS c
           |  FROM events WHERE event_type IN ('click', 'purchase')
           |  GROUP BY 1, 2),
           |hx AS (SELECT hr, c AS x, l.lag
           |  FROM h CROSS JOIN (SELECT unnest(range(0, 7)) AS lag) l
           |  WHERE event_type = 'click'),
           |hy AS (SELECT hr AS yhr, c AS y FROM h
           |  WHERE event_type = 'purchase'),
           |p AS (SELECT hx.lag, hx.x, hy.y
           |  FROM hx JOIN hy ON hy.yhr = hx.hr + hx.lag),
           |m AS (SELECT lag, count(*) AS n,
           |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
           |    sum(x * x) AS sxx, sum(y * y) AS syy
           |  FROM p GROUP BY lag),
           |c AS (SELECT lag, n,
           |    n * sxy - sx * sy AS covn,
           |    n * sxx - sx * sx AS vx,
           |    n * syy - sy * sy AS vy
           |  FROM m WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0)
           |SELECT CAST(lag AS BIGINT) AS lag, n AS n_pairs,
           |  CAST(CASE WHEN covn < 0 THEN -1 WHEN covn > 0 THEN 1
           |       ELSE 0 END AS BIGINT) AS r_sign,
           |  CAST(CAST(covn AS HUGEINT) * covn * 1000000
           |    // (CAST(vx AS HUGEINT) * vy) AS BIGINT) AS r2_e6
           |FROM c
           |ORDER BY lag ASC NULLS FIRST""".stripMargin))

  /** Exact rolling median (round 7): per event type and hour, the lower
    * median of the hourly counts in the ±3-hour window — the robust
    * moving smoother ([[moving]]'s mean/max follow spikes; the median
    * ignores them). Spark has no exact order-statistic window aggregate,
    * so the operator composes from primitives: a bounded range self-join
    * of the hour-grain census against itself (each center hour gathers
    * ≤ 7 neighbor rows) and the tie-invariant value-at-rank reduction
    * (the q_profile_mad pattern) per center.
    *
    * Scale: the self-join runs on the hour-grain census — time-bounded
    * (rows = observed hours × types), never event-sized — and fans out
    * ≤ 7× before the rank pass, which partitions by center hour and
    * sorts ≤ 7-row groups. The corpus is touched exactly once, by the
    * census partial agg. Gaps in the grid shrink the window (median of
    * observed neighbors; compose with q_win_gapfill for calendar
    * semantics).
    *
    * Determinism (D1/D2): exact int64 counts; row_number ties at equal
    * counts are value-invariant at the graded rank.
    */
  private val movingMedian = QueryDef(
    "q_ts_moving_median",
    (s, d) => {
      val hourly = graft.Caches.scoped(Tables.events(s, d)
        .select(col("event_type"),
          floorDiv(unix_micros(col("ts")), HourUs).as("hr"))
        .groupBy(col("event_type"), col("hr"))
        .agg(count(lit(1)).as("c")))
      val nb = hourly.as("a").join(hourly.as("b"),
          col("a.event_type") === col("b.event_type") &&
            col("b.hr") >= col("a.hr") - 3 && col("b.hr") <= col("a.hr") + 3)
        .select(col("a.event_type").as("event_type"), col("a.hr").as("hr"),
          col("b.c").as("nc"), col("b.hr").as("nhr"))
      val w = Window.partitionBy(col("event_type"), col("hr"))
        .orderBy(ascf("nc"), ascf("nhr"))
      val wn = Window.partitionBy(col("event_type"), col("hr"))
      nb.withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wn))
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("event_type"), col("hr"), col("n").as("n_window"),
          col("nc").as("med"))
        .orderBy(ascf("event_type"), ascf("hr"))
    },
    Some("""WITH h AS (SELECT event_type,
           |    epoch_us(ts) // 3600000000 AS hr, count(*) AS c
           |  FROM events GROUP BY 1, 2),
           |nb AS (SELECT a.event_type, a.hr, b.c AS nc, b.hr AS nhr
           |  FROM h a JOIN h b ON a.event_type = b.event_type
           |    AND b.hr BETWEEN a.hr - 3 AND a.hr + 3),
           |r AS (SELECT event_type, hr, nc,
           |    row_number() OVER (PARTITION BY event_type, hr
           |      ORDER BY nc ASC, nhr ASC) AS rn,
           |    count(*) OVER (PARTITION BY event_type, hr) AS n
           |  FROM nb)
           |SELECT event_type, hr, n AS n_window, nc AS med
           |FROM r WHERE rn = (n + 1) // 2
           |ORDER BY event_type ASC NULLS FIRST, hr ASC NULLS FIRST""".stripMargin))

  /** Counter-reset-aware rate reconstruction (round 7): the
    * observability `rate()` primitive — given sampled values of a
    * monotone counter that periodically RESETS to zero (process restart,
    * modulo wrap), reconstruct per-interval increases: a negative delta
    * means a reset happened, and the increase since the previous sample
    * is taken as the current value (the Prometheus extrapolation-free
    * rule; mass accumulated between the reset and the next sample is
    * inherently unobservable — documented semantics, not a bug).
    *
    * The exposed counter is SYNTHESIZED as the running hourly-count sum
    * mod 4096 per event type (both engines build the identical series
    * from the fixture, the q_fn_url pattern), so resets really occur and
    * the graded reconstruction path — delta, reset detection, rule
    * application — is what parity certifies.
    *
    * Scale: the corpus collapses to the hour-grain census in one partial
    * agg; cumsum, delta and the reset rule are two window passes over
    * the time-bounded series, partitioned by type.
    */
  private val tsRate = QueryDef(
    "q_ts_rate",
    (s, d) => {
      val hourly = Tables.events(s, d)
        .select(col("event_type"),
          floorDiv(unix_micros(col("ts")), HourUs).as("hr"))
        .groupBy(col("event_type"), col("hr"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("event_type")).orderBy(ascf("hr"))
      val counter = hourly
        .withColumn("cum", sum(col("c")).over(w))
        .withColumn("ctr", pmod(col("cum"), lit(4096L)))
      val recon = counter
        .withColumn("prev", lag(col("ctr"), 1).over(w))
        .filter(col("prev").isNotNull)
        .withColumn("delta", col("ctr") - col("prev"))
        .withColumn("inc",
          when(col("delta") < 0, col("ctr")).otherwise(col("delta")))
      recon.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_samples"),
          sum(when(col("delta") < 0, 1L).otherwise(0L)).as("n_resets"),
          sum(col("inc")).as("total_increase"),
          max(col("inc")).as("max_inc"))
        .orderBy(ascf("event_type"))
    },
    Some("""WITH h AS (SELECT event_type,
           |    epoch_us(ts) // 3600000000 AS hr, count(*) AS c
           |  FROM events GROUP BY 1, 2),
           |ctr AS (SELECT event_type, hr,
           |    sum(c) OVER w % 4096 AS ctr
           |  FROM h WINDOW w AS (PARTITION BY event_type ORDER BY hr ASC
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
           |rec AS (SELECT event_type,
           |    ctr - lag(ctr) OVER w AS delta, ctr
           |  FROM ctr WINDOW w AS (PARTITION BY event_type
           |    ORDER BY hr ASC)),
           |inc AS (SELECT event_type, delta,
           |    CASE WHEN delta < 0 THEN ctr ELSE delta END AS inc
           |  FROM rec WHERE delta IS NOT NULL)
           |SELECT event_type,
           |  CAST(count(*) AS BIGINT) AS n_samples,
           |  CAST(sum(CASE WHEN delta < 0 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_resets,
           |  CAST(sum(inc) AS BIGINT) AS total_increase,
           |  CAST(max(inc) AS BIGINT) AS max_inc
           |FROM inc GROUP BY event_type
           |ORDER BY event_type ASC NULLS FIRST""".stripMargin))

  /** Banded dynamic time warping (round 7): DTW distance with a
    * Sakoe-Chiba band of radius 1 between each event type's daily count
    * series and the purchase series on the shared day spine — the
    * shape-similarity measure that tolerates small time shifts where
    * plain L1 (reported alongside) punishes them; the signal whose
    * shape best "leads into" purchases under a ±1-day warp scores
    * lowest. Production DTW always runs banded (the unconstrained DP
    * is O(n·m) memory AND lets pathological warps match anything).
    *
    * With radius 1 the whole DP state per step is THREE scalars —
    * d(i,i−1), d(i,i), d(i,i+1) — so the sequential recurrence runs as
    * one `aggregate` HOF fold over each type's day-ordered array
    * (Spark has no recursive SQL; the q_ts_holt pattern), and the
    * oracle runs the IDENTICAL recurrence as a DuckDB RECURSIVE CTE —
    * two maximally different executions of one integer DP, which is
    * precisely what the grade pins. The fold recurrence was verified
    * against a reference full-DP implementation on 2000 random series
    * before grading (dev-loop, not shipped).
    *
    * Scale: the corpus collapses to the (type, day) census in one
    * partial agg; the spine/lag/lead prep and the fold are
    * day-count-bounded per type. Band radius is a knob: radius r keeps
    * 2r+1 scalars of state — same fold, wider struct.
    *
    * Determinism (D1/D2): all int64; INF sentinel 1e15 (costs are
    * bounded by day counts, so no overflow through +); arrays sorted
    * by the distinct day index.
    */
  private val dtw = QueryDef(
    "q_ts_dtw",
    (s, d) => {
      val INF = "1000000000000000L"
      val days = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      val spineI = days.select(col("day")).distinct()
        .withColumn("i", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(ascf("day"))))
      val purch = spineI.join(
          days.filter(col("event_type") === "purchase")
            .select(col("day").as("pd"), col("cnt").as("b")),
          col("day") === col("pd"), "left")
        .select(col("i"), coalesce(col("b"), lit(0L)).as("b0"))
      val typ = days.filter(col("event_type") =!= "purchase")
        .select(col("event_type").as("t")).distinct()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("t")).orderBy(ascf("i"))
      val ser = typ.crossJoin(spineI)
        .join(days.select(col("day").as("dd"), col("event_type").as("dt"),
            col("cnt").as("a0")),
          col("day") === col("dd") && col("t") === col("dt"), "left")
        .join(broadcast(purch), Seq("i"))
        .select(col("t"), col("i"),
          coalesce(col("a0"), lit(0L)).as("a"), col("b0"))
        .withColumn("bm", lag(col("b0"), 1).over(w))
        .withColumn("bp", lead(col("b0"), 1).over(w))
      // the three-cell banded recurrence; d0 needs this step's dm and
      // dp needs this step's d0, and HOF lambdas have no LET — so the
      // subexpressions are inlined (codegen CSE re-shares them)
      val dmE = s"IF(r.bm IS NULL, $INF, " +
        "abs(r.a - r.bm) + least(st.dm, st.d0))"
      val d0E = s"abs(r.a - r.b0) + least(st.d0, st.dp, $dmE)"
      val dpE = s"IF(r.bp IS NULL, $INF, " +
        s"abs(r.a - r.bp) + least(st.dp, $d0E))"
      ser.groupBy(col("t"))
        .agg(count(lit(1)).as("n_days"),
          sum(abs(col("a") - col("b0"))).as("l1"),
          expr(
            s"""aggregate(
               |  sort_array(collect_list(struct(i, a, b0, bm, bp))),
               |  named_struct('dm', $INF, 'd0', 0L, 'dp', $INF),
               |  (st, r) -> named_struct(
               |    'dm', $dmE, 'd0', $d0E, 'dp', $dpE),
               |  st -> st.d0)""".stripMargin).as("dtw_band1"))
        .select(col("t").as("event_type"), col("n_days"), col("l1"),
          col("dtw_band1"))
        .orderBy(ascf("event_type"))
    },
    Some("""WITH RECURSIVE
           |days AS (SELECT CAST(date_trunc('day', ts::TIMESTAMP) AS DATE)
           |    AS day, event_type, count(*) AS cnt
           |  FROM events GROUP BY 1, 2),
           |spine_i AS (SELECT day, row_number() OVER (ORDER BY day) AS i
           |  FROM (SELECT DISTINCT day FROM days)),
           |purch AS (SELECT s.i, coalesce(d.cnt, 0) AS b0
           |  FROM spine_i s LEFT JOIN days d
           |  ON d.day = s.day AND d.event_type = 'purchase'),
           |typ AS (SELECT DISTINCT event_type AS t FROM days
           |  WHERE event_type <> 'purchase'),
           |ser AS (SELECT typ.t, s.i, coalesce(d.cnt, 0) AS a, p.b0,
           |    lag(p.b0) OVER (PARTITION BY typ.t ORDER BY s.i) AS bm,
           |    lead(p.b0) OVER (PARTITION BY typ.t ORDER BY s.i) AS bp
           |  FROM typ CROSS JOIN spine_i s
           |  LEFT JOIN days d ON d.day = s.day AND d.event_type = typ.t
           |  JOIN purch p ON p.i = s.i),
           |nmax AS (SELECT max(i) AS n FROM spine_i),
           |dp AS (
           |  SELECT t, CAST(0 AS BIGINT) AS i,
           |    CAST(1000000000000000 AS BIGINT) AS dm,
           |    CAST(0 AS BIGINT) AS d0,
           |    CAST(1000000000000000 AS BIGINT) AS dpp
           |  FROM typ
           |  UNION ALL
           |  SELECT s.t, s.i,
           |    CASE WHEN s.bm IS NULL THEN 1000000000000000
           |      ELSE abs(s.a - s.bm) + least(dp.dm, dp.d0) END,
           |    abs(s.a - s.b0) + least(dp.d0, dp.dpp,
           |      CASE WHEN s.bm IS NULL THEN 1000000000000000
           |        ELSE abs(s.a - s.bm) + least(dp.dm, dp.d0) END),
           |    CASE WHEN s.bp IS NULL THEN 1000000000000000
           |      ELSE abs(s.a - s.bp) + least(dp.dpp,
           |        abs(s.a - s.b0) + least(dp.d0, dp.dpp,
           |          CASE WHEN s.bm IS NULL THEN 1000000000000000
           |            ELSE abs(s.a - s.bm) + least(dp.dm, dp.d0) END))
           |      END
           |  FROM dp JOIN ser s ON s.t = dp.t AND s.i = dp.i + 1),
           |l1t AS (SELECT t, CAST(count(*) AS BIGINT) AS n_days,
           |    CAST(sum(abs(a - b0)) AS BIGINT) AS l1
           |  FROM ser GROUP BY t)
           |SELECT dp.t AS event_type, l1t.n_days, l1t.l1,
           |  CAST(dp.d0 AS BIGINT) AS dtw_band1
           |FROM dp CROSS JOIN nmax
           |JOIN l1t ON l1t.t = dp.t
           |WHERE dp.i = nmax.n
           |ORDER BY event_type ASC NULLS FIRST""".stripMargin))

  /** Robust anomaly detection via median/MAD (round 7): flag the hours
    * whose event count deviates from the type's MEDIAN by more than
    * 3×MAD — the monitoring detector immune to the very outliers it
    * hunts (q_ts_anomaly's mean/σ fences are dragged by a single
    * extreme hour; median/MAD shift by at most one rank). Exact lower
    * medians via the value-at-rank pattern (tie-invariant, no rounding
    * rule at all — the q_profile_mad discipline on the time axis).
    *
    * Scale: the corpus collapses to the hour-grain census in one
    * partial agg; both rank passes partition by event type (parallel
    * per-type sorts over time-bounded series). MAD=0 series (constant
    * counts) flag any deviation — the standard convention, pinned by
    * CASE on both engines.
    *
    * Determinism (D1/D2): all int64; |x−med|·1 vs 3·MAD compares
    * integers exactly; census ordered by type.
    */
  private val anomalyMad = QueryDef(
    "q_ts_anomaly_mad",
    (s, d) => {
      val hours = graft.Caches.scoped(Tables.events(s, d)
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("cnt")))
      val wv = Window.partitionBy(col("event_type")).orderBy(ascf("cnt"))
      val wn = Window.partitionBy(col("event_type"))
      val med = hours
        .withColumn("rn", row_number().over(wv))
        .withColumn("n", count(lit(1)).over(wn))
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("event_type"), col("n"), col("cnt").as("med"))
      val dev = hours.join(broadcast(med), "event_type")
        .select(col("event_type"), col("hr"), col("cnt"), col("n"),
          col("med"), abs(col("cnt") - col("med")).as("ad"))
      val wd = Window.partitionBy(col("event_type")).orderBy(ascf("ad"))
      val mad = dev
        .withColumn("rn", row_number().over(wd))
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("event_type").as("mt"), col("ad").as("mad"))
      dev.join(broadcast(mad), col("event_type") === col("mt"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_hours"),
          max(col("med")).as("med_cnt"),
          max(col("mad")).as("mad_cnt"),
          sum(when(col("ad") > col("mad") * 3, 1L).otherwise(0L))
            .as("n_anomalies"),
          coalesce(sum(when(col("ad") > col("mad") * 3,
            unix_micros(col("hr")))), lit(0L)).as("anomaly_hr_checksum"))
        .orderBy(ascf("event_type"))
    },
    Some("""WITH h AS (SELECT event_type,
           |    date_trunc('hour', ts::TIMESTAMP) AS hr, count(*) AS cnt
           |  FROM events GROUP BY 1, 2),
           |r AS (SELECT event_type, hr, cnt,
           |    row_number() OVER (PARTITION BY event_type
           |      ORDER BY cnt ASC) AS rn,
           |    count(*) OVER (PARTITION BY event_type) AS n
           |  FROM h),
           |med AS (SELECT event_type, n, cnt AS med
           |  FROM r WHERE rn = (n + 1) // 2),
           |dev AS (SELECT h.event_type, h.hr, h.cnt, m.n, m.med,
           |    abs(h.cnt - m.med) AS ad
           |  FROM h JOIN med m ON h.event_type = m.event_type),
           |r2 AS (SELECT event_type, hr, cnt, n, med, ad,
           |    row_number() OVER (PARTITION BY event_type
           |      ORDER BY ad ASC) AS rn
           |  FROM dev),
           |mad AS (SELECT event_type, ad AS mad
           |  FROM r2 WHERE rn = (n + 1) // 2)
           |SELECT d.event_type AS event_type,
           |  CAST(count(*) AS BIGINT) AS n_hours,
           |  CAST(max(d.med) AS BIGINT) AS med_cnt,
           |  CAST(max(m.mad) AS BIGINT) AS mad_cnt,
           |  CAST(sum(CASE WHEN d.ad > 3 * m.mad THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_anomalies,
           |  CAST(coalesce(sum(CASE WHEN d.ad > 3 * m.mad
           |    THEN epoch_us(d.hr) END), 0) AS BIGINT)
           |    AS anomaly_hr_checksum
           |FROM dev d JOIN mad m ON d.event_type = m.event_type
           |GROUP BY d.event_type
           |ORDER BY d.event_type ASC NULLS FIRST""".stripMargin))

  /** Bollinger-style band breakouts (round 7): per event type, hours
    * whose count leaves the trailing-20-hour mean ± 2σ band — the
    * rolling-volatility breakout detector (the trading-chart band, and
    * operationally the adaptive alert threshold that tightens in quiet
    * periods and widens in noisy ones — where q_ts_anomaly's GLOBAL σ
    * fence is one fixed width forever).
    *
    * The band test is EXACT integer arithmetic, no division anywhere:
    * x outside mean ± 2σ ⇔ (x·n − S)² > 4·(n·SS − S²) over the window's
    * count n, sum S, and sum-of-squares SS — the cross-multiplied form
    * of (x − S/n)² > 4·(nSS − S²)/n², shared verbatim with the oracle.
    *
    * Scale: corpus → hour census in one partial agg; the rolling
    * moments are ONE window pass (three aggregates, same frame) per
    * type; magnitudes: counts ≤ ~1e4/hour ⇒ (x·n−S)² ≤ ~(2e5·20)² < 2⁵³.
    *
    * Determinism (D1/D2): all int64; windows need ≥ 2 trailing hours
    * (n ≥ 2 pinned by CASE — a 1-point window has σ undefined and
    * flags nothing on both engines).
    */
  private val bollinger = QueryDef(
    "q_ts_bollinger",
    (s, d) => {
      val hours = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(ascf(col("hr")))
        .rowsBetween(-20, -1)
      val banded = hours
        .withColumn("n", count(col("cnt")).over(w))
        .withColumn("sw", sum(col("cnt")).over(w))
        .withColumn("ss", sum(col("cnt") * col("cnt")).over(w))
        .withColumn("outside", when(col("n") >= 2 &&
          (col("cnt") * col("n") - col("sw")) *
            (col("cnt") * col("n") - col("sw")) >
            (col("n") * col("ss") - col("sw") * col("sw")) * 4,
          1L).otherwise(0L))
      banded.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_hours"),
          sum(when(col("n") >= 2, 1L).otherwise(0L)).as("n_tested"),
          sum(col("outside")).as("n_breakouts"),
          coalesce(sum(when(col("outside") === 1,
            unix_micros(col("hr")))), lit(0L)).as("breakout_checksum"))
        .orderBy(ascf("event_type"))
    },
    Some("""WITH h AS (SELECT event_type,
           |    date_trunc('hour', ts::TIMESTAMP) AS hr, count(*) AS cnt
           |  FROM events GROUP BY 1, 2),
           |m AS (SELECT event_type, hr, cnt,
           |    count(cnt) OVER w AS n,
           |    sum(cnt) OVER w AS sw,
           |    sum(cnt * cnt) OVER w AS ss
           |  FROM h
           |  WINDOW w AS (PARTITION BY event_type ORDER BY hr ASC
           |    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
           |b AS (SELECT event_type, hr, n,
           |    CASE WHEN n >= 2 AND
           |      (cnt * n - sw) * (cnt * n - sw)
           |        > (n * ss - sw * sw) * 4
           |      THEN 1 ELSE 0 END AS outside
           |  FROM m)
           |SELECT event_type,
           |  CAST(count(*) AS BIGINT) AS n_hours,
           |  CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_tested,
           |  CAST(sum(outside) AS BIGINT) AS n_breakouts,
           |  CAST(coalesce(sum(CASE WHEN outside = 1
           |    THEN epoch_us(hr) END), 0) AS BIGINT) AS breakout_checksum
           |FROM b GROUP BY event_type
           |ORDER BY event_type ASC NULLS FIRST""".stripMargin))

  /** Additive trend/seasonal/residual decomposition (round 7, the STL
    * shape with exact arithmetic): per event type's daily series —
    * trend = centered ±3-day moving average (e6 floor), seasonal = the
    * per-day-of-cycle mean of the detrended series (7-day cycle),
    * residual = what's left. The graded census pins the trend mass,
    * the seasonal AMPLITUDE (max−min over the 7 cycle positions — the
    * "how strong is the weekly pattern" number), and the residual
    * magnitude — the decomposition every capacity model runs before
    * forecasting.
    *
    * Day-of-cycle is days-since-epoch mod 7, NOT dayofweek (rule D7:
    * Spark and DuckDB number weekdays differently; an epoch offset is
    * engine-neutral and cycle-equivalent).
    *
    * Scale: corpus → day census in one partial agg; one centered
    * window per type; seasonal means are a 7×types-bounded aggregate
    * re-joined by broadcast. All grids time-bounded.
    *
    * Determinism (D2/D12): everything int64 in e6 units; signed floors
    * via subtract-pmod (detrended values go negative).
    */
  private val decompose = QueryDef(
    "q_ts_decompose",
    (s, d) => {
      val days = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("pos", pmod(datediff(col("day"),
          lit("1995-01-01").cast("date")), lit(7)).cast("long"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(ascf(col("day"))).rowsBetween(-3, 3)
      val trended = days
        .withColumn("n", count(col("cnt")).over(w))
        .withColumn("sw", sum(col("cnt")).over(w))
        .withColumn("trend_e6", expr("(sw * 1000000) div n"))
        .withColumn("det", col("cnt") * 1000000L - col("trend_e6"))
      val seas = trended.groupBy(col("event_type").as("st"),
          col("pos").as("sp"))
        .agg(sum(col("det")).as("ds"), count(lit(1)).as("dn"))
        .withColumn("seasonal_e6",
          expr("(ds - ((ds % dn + dn) % dn)) div dn"))
      val joined = trended.join(broadcast(seas),
          col("event_type") === col("st") && col("pos") === col("sp"))
        .withColumn("resid", col("det") - col("seasonal_e6"))
      joined.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("trend_e6")).as("trend_mass_e6"),
          (max(col("seasonal_e6")) - min(col("seasonal_e6")))
            .as("seasonal_amplitude_e6"),
          sum(abs(col("resid"))).as("resid_abs_e6"))
        .orderBy(ascf("event_type"))
    },
    Some("""WITH days AS (SELECT event_type,
           |    CAST(date_trunc('day', ts::TIMESTAMP) AS DATE) AS day,
           |    count(*) AS cnt
           |  FROM events GROUP BY 1, 2),
           |p AS (SELECT event_type, day, cnt,
           |    CAST(((datediff('day', DATE '1995-01-01', day) % 7) + 7) % 7
           |      AS BIGINT) AS pos
           |  FROM days),
           |tr AS (SELECT event_type, day, cnt, pos,
           |    (sum(cnt) OVER w * 1000000) // count(cnt) OVER w AS trend_e6
           |  FROM p
           |  WINDOW w AS (PARTITION BY event_type ORDER BY day ASC
           |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
           |dt AS (SELECT event_type, day, pos, trend_e6,
           |    cnt * 1000000 - trend_e6 AS det
           |  FROM tr),
           |se AS (SELECT event_type, pos,
           |    (sum(det) - ((sum(det) % count(*) + count(*)) % count(*)))
           |      // count(*) AS seasonal_e6
           |  FROM dt GROUP BY 1, 2)
           |SELECT dt.event_type AS event_type,
           |  CAST(count(*) AS BIGINT) AS n_days,
           |  CAST(sum(dt.trend_e6) AS BIGINT) AS trend_mass_e6,
           |  CAST(max(se.seasonal_e6) - min(se.seasonal_e6) AS BIGINT)
           |    AS seasonal_amplitude_e6,
           |  CAST(sum(abs(dt.det - se.seasonal_e6)) AS BIGINT)
           |    AS resid_abs_e6
           |FROM dt JOIN se ON dt.event_type = se.event_type
           |  AND dt.pos = se.pos
           |GROUP BY dt.event_type
           |ORDER BY dt.event_type ASC NULLS FIRST""".stripMargin))

  /** Period-over-period growth census (round 7): monthly order revenue
    * with the previous month's value and the signed growth rate in e6
    * units — the month-over-month table every business review opens
    * with (q_win_rank_delta tracks RANK movement between periods; this
    * tracks the VALUES). First month reports null-free 0 growth by
    * pinned CASE.
    *
    * Scale: corpus → month-grain partial agg; lag is one window over
    * the month-count-sized series. Growth = (cur−prev)·1e6 div prev
    * with the signed subtract-pmod floor (declines are negative).
    *
    * Determinism (D1/D2): exact cents; months are a total order.
    */
  private val growth = QueryDef(
    "q_ts_growth",
    (s, d) => {
      val m = Tables.orders(s, d)
        .groupBy(date_trunc("month", col("o_orderdate")).as("mo"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long"))
          .as("rev_cents"))
      val w = Window.orderBy(ascf(col("mo")))
      m.withColumn("prev", lag(col("rev_cents"), 1).over(w))
        .select(epochUs(col("mo")).as("month_us"), col("rev_cents"),
          coalesce(col("prev"), lit(0L)).as("prev_cents"),
          when(col("prev").isNull || col("prev") === 0, 0L)
            .otherwise(expr(
              """((rev_cents - prev) * 1000000
                | - ((((rev_cents - prev) * 1000000) % prev + prev) % prev))
                | div prev""".stripMargin)).as("growth_e6"))
        .orderBy(ascf("month_us"))
    },
    Some("""WITH m AS (SELECT date_trunc('month', o_orderdate) AS mo,
           |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
           |      AS BIGINT)) AS BIGINT) AS rev_cents
           |  FROM orders GROUP BY 1),
           |l AS (SELECT mo, rev_cents,
           |    lag(rev_cents) OVER (ORDER BY mo ASC) AS prev
           |  FROM m)
           |SELECT epoch_us(mo) AS month_us, rev_cents,
           |  CAST(coalesce(prev, 0) AS BIGINT) AS prev_cents,
           |  CAST(CASE WHEN prev IS NULL OR prev = 0 THEN 0
           |    ELSE ((rev_cents - prev) * 1000000
           |      - ((((rev_cents - prev) * 1000000) % prev + prev) % prev))
           |      // prev END AS BIGINT) AS growth_e6
           |FROM l
           |ORDER BY month_us ASC NULLS FIRST""".stripMargin))

  /** DAU/MAU stickiness (round 7): per month, the mean daily active
    * users over the monthly actives — the engagement ratio every
    * product dashboard tracks (1/30 = everyone shows once; 1 =
    * everyone every day). Exact integers: stickiness_e6 =
    * ΣDAU·1e6 div (n_days·MAU).
    *
    * Scale: one (day, user) distinct collapses the corpus; DAU and
    * MAU re-aggregate it at two grains (the month re-distinct is a
    * second pass over the day-distinct relation, never the corpus).
    *
    * Determinism (D1/D2): all int64; months total-ordered.
    */
  private val dauMau = QueryDef(
    "q_ts_dau_mau",
    (s, d) => {
      val du = graft.Caches.scoped(Tables.events(s, d)
        .select(date_trunc("month", col("ts")).as("mo"),
          to_date(col("ts")).as("day"), col("user_id"))
        .distinct())
      val dau = du.groupBy(col("mo")).agg(
        countDistinct(col("day")).as("n_days"),
        count(lit(1)).as("sum_dau"))
      val mau = du.select(col("mo").as("mo2"), col("user_id")).distinct()
        .groupBy(col("mo2")).agg(count(lit(1)).as("mau"))
      dau.join(mau, col("mo") === col("mo2"))
        .select(epochUs(col("mo")).as("month_us"), col("n_days"),
          col("sum_dau"), col("mau"),
          expr("(sum_dau * 1000000) div (n_days * mau)")
            .as("stickiness_e6"))
        .orderBy(ascf("month_us"))
    },
    Some("""WITH du AS (SELECT DISTINCT
           |    date_trunc('month', ts::TIMESTAMP) AS mo,
           |    CAST(date_trunc('day', ts::TIMESTAMP) AS DATE) AS day,
           |    user_id
           |  FROM events),
           |dau AS (SELECT mo, CAST(count(DISTINCT day) AS BIGINT)
           |      AS n_days,
           |    CAST(count(*) AS BIGINT) AS sum_dau
           |  FROM du GROUP BY mo),
           |mau AS (SELECT mo, CAST(count(DISTINCT user_id) AS BIGINT)
           |      AS mau
           |  FROM du GROUP BY mo)
           |SELECT epoch_us(dau.mo) AS month_us, dau.n_days, dau.sum_dau,
           |  mau.mau,
           |  CAST((dau.sum_dau * 1000000) // (dau.n_days * mau.mau)
           |    AS BIGINT) AS stickiness_e6
           |FROM dau JOIN mau ON dau.mo = mau.mo
           |ORDER BY month_us ASC NULLS FIRST""".stripMargin))

  /** SAX symbolization census (round 7): each event type's activity
    * series compressed to one 4-symbol WORD per day — PAA over four
    * 6-hour segments, each segment's total symbolized into an
    * equal-depth quartile alphabet (1..4; an absent segment reads 0).
    * Symbolic Aggregate approXimation is the standard front-end for
    * series indexing/motif discovery/anomaly flagging at scale: words
    * are joinable integers, so "find days shaped like this" becomes a
    * hash join instead of a distance scan (the time-series analogue of
    * what q_dedup_minhash_exact does for documents).
    *
    * Equal-depth (empirical-quartile) breakpoints rather than the
    * classic Gaussian table: rank-based, so symbolization is exact
    * integer work — no mean/stddev normalization, no float breakpoint
    * literals to keep in sync across engines. Segment TOTALS stand in
    * for PAA means (equal-width segments ⇒ same order, and missing
    * hours count 0 implicitly).
    *
    * Scale: the corpus collapses to hour-grain counts in one partial
    * agg; segments, ntile symbolization, day-words, and the census all
    * run on that sketch (per-type windows over ≤ hours/6 rows — range-
    * partitioned prefix ranks at fleet scale). Output per type: day
    * and distinct-word counts, the modal word (argmax count, min-word
    * tiebreak), and Σ word as a path checksum pinning every symbol.
    *
    * Determinism (D1/D12): ntile over the total order (ssum, seg) is
    * engine-identical (standard SQL first-buckets-larger split); words
    * are 4-digit ints; ties in the modal word break on the total order
    * (n DESC, word ASC).
    */
  private val sax = QueryDef(
    "q_ts_sax",
    (s, d) => {
      val hourly = Tables.events(s, d)
        .select(col("event_type"),
          floorDiv(unix_micros(col("ts")), HourUs).as("hr"))
        .groupBy(col("event_type"), col("hr"))
        .agg(count(lit(1)).as("c"))
      val seg = hourly
        .groupBy(col("event_type"), floorDiv(col("hr"), 6L).as("seg"))
        .agg(sum(col("c")).as("ssum"))
      val wq = Window.partitionBy(col("event_type"))
        .orderBy(ascf("ssum"), ascf("seg"))
      val words = seg
        .withColumn("sym", ntile(4).over(wq).cast("long"))
        .groupBy(col("event_type"), floorDiv(col("seg"), 4L).as("day"))
        .agg(sum(col("sym") *
          expr("cast(pow(10, 3 - (seg % 4)) as bigint)")).as("word"))
      val counts = words.groupBy(col("event_type"), col("word"))
        .agg(count(lit(1)).as("n"))
      val wTop = Window.partitionBy(col("event_type"))
        .orderBy(descl("n"), ascf("word"))
      val top = counts.withColumn("rk", row_number().over(wTop))
        .filter(col("rk") === 1)
        .select(col("event_type"), col("word").as("top_word"),
          col("n").as("top_word_n"))
      words.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          count_distinct(col("word")).as("n_words"),
          sum(col("word")).as("words_checksum"))
        .join(top, Seq("event_type"))
        .orderBy(ascf("event_type"))
    },
    Some("""WITH h AS (SELECT event_type,
           |    epoch_us(ts) // 3600000000 AS hr, count(*) AS c
           |  FROM events GROUP BY 1, 2),
           |seg AS (SELECT event_type, hr // 6 AS seg,
           |    CAST(sum(c) AS BIGINT) AS ssum
           |  FROM h GROUP BY 1, 2),
           |sym AS (SELECT event_type, seg,
           |    CAST(ntile(4) OVER (PARTITION BY event_type
           |      ORDER BY ssum ASC, seg ASC) AS BIGINT) AS sym
           |  FROM seg),
           |words AS (SELECT event_type, seg // 4 AS day,
           |    CAST(sum(sym * CAST(pow(10, 3 - (seg % 4)) AS BIGINT))
           |      AS BIGINT) AS word
           |  FROM sym GROUP BY 1, 2),
           |wc AS (SELECT event_type, word, count(*) AS n
           |  FROM words GROUP BY 1, 2),
           |top AS (SELECT event_type, word AS top_word,
           |    CAST(n AS BIGINT) AS top_word_n
           |  FROM (SELECT event_type, word, n, row_number() OVER (
           |      PARTITION BY event_type ORDER BY n DESC, word ASC) AS rk
           |    FROM wc)
           |  WHERE rk = 1),
           |census AS (SELECT event_type, count(*) AS n_days,
           |    CAST(count(DISTINCT word) AS BIGINT) AS n_words,
           |    CAST(sum(word) AS BIGINT) AS words_checksum
           |  FROM words GROUP BY 1)
           |SELECT c.event_type, c.n_days, c.n_words, c.words_checksum,
           |  t.top_word, t.top_word_n
           |FROM census c JOIN top t ON c.event_type = t.event_type
           |ORDER BY c.event_type ASC NULLS FIRST""".stripMargin))

  /** Permutation entropy census (round 7): the Shannon entropy of
    * order-3 ORDINAL patterns over each event type's hourly count
    * series — the standard complexity/regularity statistic (Bandt &
    * Pompe): a flat/periodic series concentrates on few up/down shapes
    * (low PE), noise spreads over all of them (high PE). The shape
    * complement of q_ts_autocorr's linear memory — PE sees nonlinear
    * structure correlation misses, and it is rank-based, so the
    * symbolization is exact integer work (no normalization).
    *
    * Patterns include ties as their own symbols: code = 9·s(c₂−c₁) +
    * 3·s(c₃−c₂) + s(c₃−c₁) with s ∈ {0 below, 1 equal, 2 above} —
    * 27 codes, of which the 13 consistent orderings occur. Windows
    * slide over consecutive PRESENT hours (the sampled-series
    * convention; absent hours are gaps, not zeros — the zero-filled
    * variant is q_win_gapfill's domain).
    *
    * Scale: one hour-grain partial agg collapses the corpus; the lag
    * windows, the 27-row-per-type pattern census, and the entropy sum
    * all run on that sketch. ln through [[graft.functions.DetMath]]
    * (D12: bit-identical staged series on both engines).
    */
  private val permEntropy = QueryDef(
    "q_ts_perm_entropy",
    (s, d) => {
      import graft.functions.DetMath
      def sgn(x: org.apache.spark.sql.Column) =
        when(x < 0, 0L).when(x === 0, 1L).otherwise(2L)
      val hourly = Tables.events(s, d)
        .select(col("event_type"),
          floorDiv(unix_micros(col("ts")), HourUs).as("hr"))
        .groupBy(col("event_type"), col("hr"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("event_type")).orderBy(ascf("hr"))
      val pat = hourly
        .withColumn("c1", lag(col("c"), 2).over(w))
        .withColumn("c2", lag(col("c"), 1).over(w))
        .filter(col("c1").isNotNull)
        .select(col("event_type"),
          (sgn(col("c2") - col("c1")) * 9
            + sgn(col("c") - col("c2")) * 3
            + sgn(col("c") - col("c1"))).as("code"))
      val cnt = graft.Caches.scoped(pat
        .groupBy(col("event_type"), col("code"))
        .agg(count(lit(1)).as("pc")))
      val tot = cnt.groupBy(col("event_type")).agg(sum(col("pc")).as("n"))
      val wTop = Window.partitionBy(col("event_type"))
        .orderBy(descl("pc"), ascf("code"))
      val top = cnt.withColumn("rk", row_number().over(wTop))
        .filter(col("rk") === 1)
        .select(col("event_type"), col("code").as("top_code"),
          col("pc").as("top_code_n"))
      cnt.join(tot, "event_type")
        .withColumn("term_e6",
          floor((DetMath.lnInt(col("n")) - DetMath.lnInt(col("pc")))
            * lit(1000000.0) * col("pc").cast("double")).cast("long"))
        .groupBy(col("event_type"), col("n"))
        .agg(count(lit(1)).as("n_patterns"),
          sum(col("term_e6")).as("se"))
        .select(col("event_type"), col("n").as("n_windows"),
          col("n_patterns"), expr("se div n").as("pe_e6"))
        .join(top, Seq("event_type"))
        .orderBy(ascf("event_type"))
    },
    Some {
      import graft.functions.DetMath._
      s"""WITH h AS (SELECT event_type,
         |    epoch_us(ts) // 3600000000 AS hr, count(*) AS c
         |  FROM events GROUP BY 1, 2),
         |lagd AS (SELECT event_type,
         |    lag(c, 2) OVER w AS c1, lag(c, 1) OVER w AS c2, c AS c3
         |  FROM h WINDOW w AS (PARTITION BY event_type ORDER BY hr ASC)),
         |pat AS (SELECT event_type,
         |    (CASE WHEN c2 < c1 THEN 0 WHEN c2 = c1 THEN 1 ELSE 2 END) * 9
         |    + (CASE WHEN c3 < c2 THEN 0 WHEN c3 = c2 THEN 1 ELSE 2 END) * 3
         |    + (CASE WHEN c3 < c1 THEN 0 WHEN c3 = c1 THEN 1 ELSE 2 END)
         |      AS code
         |  FROM lagd WHERE c1 IS NOT NULL),
         |cnt AS (SELECT event_type, code, count(*) AS pc
         |  FROM pat GROUP BY 1, 2),
         |tot AS (SELECT event_type, CAST(sum(pc) AS BIGINT) AS n
         |  FROM cnt GROUP BY 1),
         |top AS (SELECT event_type, CAST(code AS BIGINT) AS top_code,
         |    CAST(pc AS BIGINT) AS top_code_n
         |  FROM (SELECT event_type, code, pc, row_number() OVER (
         |      PARTITION BY event_type ORDER BY pc DESC, code ASC) AS rk
         |    FROM cnt)
         |  WHERE rk = 1),
         |j AS (SELECT cnt.event_type, cnt.pc, tot.n
         |  FROM cnt JOIN tot ON cnt.event_type = tot.event_type),
         |r1 AS (SELECT *, ${kSql("n")} AS kn, ${kSql("pc")} AS kc FROM j),
         |r2 AS (SELECT *, ${mSql("n", "kn")} AS mn,
         |    ${mSql("pc", "kc")} AS mc FROM r1),
         |r3 AS (SELECT *, ${zSql("mn")} AS zn, ${zSql("mc")} AS zc FROM r2),
         |r4 AS (SELECT *, zn * zn AS z2n, zc * zc AS z2c FROM r3),
         |r5 AS (SELECT *, ${hornerSql("z2n")} AS hn,
         |    ${hornerSql("z2c")} AS hc FROM r4),
         |tm AS (SELECT event_type, n, CAST(floor(
         |    (${lnSql("kn", "zn", "hn")} - ${lnSql("kc", "zc", "hc")})
         |      * CAST(1000000 AS DOUBLE) * CAST(pc AS DOUBLE)) AS BIGINT)
         |    AS term_e6 FROM r5),
         |pe AS (SELECT event_type, n AS n_windows,
         |    count(*) AS n_patterns,
         |    CAST(sum(term_e6) // n AS BIGINT) AS pe_e6
         |  FROM tm GROUP BY event_type, n)
         |SELECT pe.event_type, pe.n_windows,
         |  CAST(pe.n_patterns AS BIGINT) AS n_patterns, pe.pe_e6,
         |  top.top_code, top.top_code_n
         |FROM pe JOIN top ON pe.event_type = top.event_type
         |ORDER BY pe.event_type ASC NULLS FIRST""".stripMargin
    })

  /** Markov entropy-rate census (round 7): how predictable is the NEXT
    * event given the current one? Per state: the conditional entropy
    * H(next | from) of the empirical transition row (0 = deterministic
    * follow-on, ln(#types) = uniform), plus the chain's entropy rate
    * Σ_s π(s)·H(·|s) under the empirical state weights — which
    * collapses to (Σ all terms)/N exactly, so the rate needs no
    * separate π estimate. The one-number sequel to q_ts_transitions
    * (the matrix) and the sequential complement of q_agg_entropy's
    * marginal: a skewed marginal can still be perfectly predictable
    * step-to-step, and only the rate sees that.
    *
    * Scale: the (from, to) census is one lead-window + partial agg
    * (the q_ts_transitions plan, shared scoped build); entropy terms
    * run on the types²-bounded relation through [[graft.functions
    * .DetMath]] (D12).
    */
  private val entropyRate = QueryDef(
    "q_ts_entropy_rate",
    (s, d) => {
      import graft.functions.DetMath
      val w = Window.partitionBy(col("user_id"))
        .orderBy(ascf("ts"), ascf("event_id"))
      val census = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("nxt", lead(col("event_type"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy(col("event_type").as("from_type"),
          col("nxt").as("to_type"))
        .agg(count(lit(1)).as("n"))
      val tot = census.groupBy(col("from_type")).agg(sum(col("n")).as("tot"))
      val terms = census.join(tot, "from_type")
        .withColumn("term_e6",
          floor((DetMath.lnInt(col("tot")) - DetMath.lnInt(col("n")))
            * lit(1000000.0) * col("n").cast("double")).cast("long"))
      val perFrom = terms.groupBy(col("from_type"), col("tot"))
        .agg(count(lit(1)).as("n_succ"), sum(col("term_e6")).as("se"))
        .withColumn("h_e6", expr("se div tot"))
      val rate = perFrom.agg(sum(col("se")).as("se_all"),
        sum(col("tot")).as("n_all"))
        .select(expr("se_all div n_all").as("rate_e6"))
      perFrom.crossJoin(broadcast(rate))
        .select(col("from_type"), col("tot"), col("n_succ"), col("h_e6"),
          col("rate_e6"))
        .orderBy(ascf("from_type"))
    },
    Some {
      import graft.functions.DetMath._
      s"""WITH seq AS (SELECT event_type,
         |    lead(event_type) OVER
         |      (PARTITION BY user_id
         |       ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST)
         |      AS nxt
         |  FROM events),
         |c AS (SELECT event_type AS from_type, nxt AS to_type,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
         |t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tot
         |  FROM c GROUP BY 1),
         |j AS (SELECT c.from_type, c.n, t.tot
         |  FROM c JOIN t ON c.from_type = t.from_type),
         |r1 AS (SELECT *, ${kSql("tot")} AS kt, ${kSql("n")} AS kn FROM j),
         |r2 AS (SELECT *, ${mSql("tot", "kt")} AS mt,
         |    ${mSql("n", "kn")} AS mn FROM r1),
         |r3 AS (SELECT *, ${zSql("mt")} AS zt, ${zSql("mn")} AS zn FROM r2),
         |r4 AS (SELECT *, zt * zt AS z2t, zn * zn AS z2n FROM r3),
         |r5 AS (SELECT *, ${hornerSql("z2t")} AS ht,
         |    ${hornerSql("z2n")} AS hn FROM r4),
         |tm AS (SELECT from_type, tot, CAST(floor(
         |    (${lnSql("kt", "zt", "ht")} - ${lnSql("kn", "zn", "hn")})
         |      * CAST(1000000 AS DOUBLE) * CAST(n AS DOUBLE)) AS BIGINT)
         |    AS term_e6 FROM r5),
         |pf AS (SELECT from_type, tot, count(*) AS n_succ,
         |    CAST(sum(term_e6) AS BIGINT) AS se
         |  FROM tm GROUP BY from_type, tot),
         |rt AS (SELECT CAST(sum(se) // sum(tot) AS BIGINT) AS rate_e6
         |  FROM pf)
         |SELECT pf.from_type, pf.tot, CAST(pf.n_succ AS BIGINT) AS n_succ,
         |  CAST(pf.se // pf.tot AS BIGINT) AS h_e6, rt.rate_e6
         |FROM pf CROSS JOIN rt
         |ORDER BY pf.from_type ASC NULLS FIRST""".stripMargin
    })

  /** One-sided CUSUM change detection (round 7): per event type, the
    * Page cumulative-sum statistic S_t = max(0, S_{t−1} + (x_t − μ))
    * over the daily count series — the classic sequential detector for
    * SUSTAINED upward shifts that point detectors miss (q_ts_anomaly*
    * flag single outlier days; a 20-day drift of +5%/day never trips a
    * z-score but accumulates linearly here). Breach when S_t exceeds
    * one mean-day's mass.
    *
    * The recursive max(0, ·+·) fold is NOT window-expressible directly,
    * but the textbook identity S_t = P_t − min(0, min_{j≤t} P_j) (P =
    * prefix sum of deviations) turns it into TWO running-frame windows
    * — running sum then running min — so the whole detector stays on
    * WindowExec's O(1)-per-row path with no UDAF fold and no driver
    * loop (the q_win_ratelimit problem, solved algebraically instead).
    *
    * Integers throughout: deviations are scaled by D (days) so μ = T/D
    * never divides — dev_t = x_t·D − T, exact int64 (|P| ≤ T·D ≈ 7e7
    * at the 10× probe). Threshold = T/10 (a tenth of a mean day,
    * scaled) — a sensitivity CHOICE like every CUSUM allowance, picked
    * so the breach branch actually fires on the fixtures' near-uniform
    * synthetic counts at all SFs (at threshold = T nothing ever
    * breaches and the conditional-min path would grade a constant).
    *
    * Scale: corpus → (type, day) grain in one partial agg; the tiny
    * per-type totals broadcast back; two window passes partitioned by
    * type; census re-aggregates day grain.
    *
    * Determinism (D1): all int64; first breach day is a conditional
    * MIN over unique days (no argmin tie); types total-ordered.
    */
  private val cusum = QueryDef(
    "q_ts_cusum",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("x"))
      val tot = daily.groupBy(col("event_type").as("et2"))
        .agg(sum(col("x")).as("tt"), count(lit(1)).as("dd"))
      val w = Window.partitionBy(col("event_type")).orderBy(ascf(col("day")))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.join(broadcast(tot), col("event_type") === col("et2"))
        .withColumn("dev", col("x") * col("dd") - col("tt"))
        .withColumn("pp", sum(col("dev")).over(w))
        .withColumn("mn", min(col("pp")).over(w))
        .withColumn("cu", col("pp") - least(lit(0L), col("mn")))
        .groupBy(col("event_type"), col("tt"), col("dd"))
        .agg(max(col("cu")).as("max_cusum"),
          sum(when(col("cu") > expr("tt div 10"), 1L).otherwise(0L))
            .as("n_breach"),
          coalesce(min(when(col("cu") > expr("tt div 10"),
            epochUs(col("day")))), lit(0L)).as("first_breach_us"))
        .select(col("event_type"), col("dd").as("n_days"),
          col("tt").as("total_events"), col("max_cusum"),
          col("n_breach"), col("first_breach_us"))
        .orderBy(ascf("event_type"))
    },
    Some("""WITH daily AS (SELECT event_type,
           |    CAST(date_trunc('day', ts::TIMESTAMP) AS DATE) AS day,
           |    CAST(count(*) AS BIGINT) AS x
           |  FROM events GROUP BY 1, 2),
           |tot AS (SELECT event_type AS et2, CAST(sum(x) AS BIGINT) AS tt,
           |    CAST(count(*) AS BIGINT) AS dd
           |  FROM daily GROUP BY 1),
           |p AS (SELECT event_type, day, tt, dd, x * dd - tt AS dev
           |  FROM daily JOIN tot ON event_type = et2),
           |c AS (SELECT *, sum(dev) OVER (PARTITION BY event_type
           |    ORDER BY day ASC ROWS UNBOUNDED PRECEDING) AS pp
           |  FROM p),
           |m AS (SELECT *, min(pp) OVER (PARTITION BY event_type
           |    ORDER BY day ASC ROWS UNBOUNDED PRECEDING) AS mn
           |  FROM c),
           |s AS (SELECT *, pp - least(0, mn) AS cu FROM m)
           |SELECT event_type, dd AS n_days, tt AS total_events,
           |  CAST(max(cu) AS BIGINT) AS max_cusum,
           |  CAST(sum(CASE WHEN cu > tt // 10 THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_breach,
           |  CAST(coalesce(min(CASE WHEN cu > tt // 10
           |      THEN epoch_us(CAST(day AS TIMESTAMP)) END), 0) AS BIGINT)
           |    AS first_breach_us
           |FROM s GROUP BY event_type, dd, tt
           |ORDER BY event_type ASC NULLS FIRST""".stripMargin))

  /** Partial autocorrelation function, lags 1–3, per event type (round
    * 7): the Durbin–Levinson PACF over the hourly count series — the
    * AR-order selector (q_ts_autocorr answers "how much memory", PACF
    * answers "how many AR TERMS explain it": an AR(p) process has
    * nonzero PACF exactly through lag p, so pacf2≈0 with r1 large says
    * one lag suffices — the readout Box–Jenkins model identification
    * actually reads).
    *
    * Two layers, each deterministic its own way. Layer 1 (exact
    * integers): deviations are mean-scaled d_t = n·x_t − S so the mean
    * never divides; lag products stay int64 (|d| ≲ n·max(x) ≈ 10⁸ at
    * the 10× probe, squares ≤ 10¹⁶) and their sums widen to
    * DECIMAL(38,0)/HUGEINT; r_k·1e6 floor-divides EXACTLY by c₀ via the
    * subtract-pmod construction (numerator can be negative — the
    * q_ts_trend spelling, not q_ts_autocorr's non-negative shortcut).
    * Layer 2 (pinned IEEE): the Durbin–Levinson recursion on the three
    * QUANTIZED ratios runs in doubles through the identical +,−,×,÷
    * tree on both engines — every input int is < 2⁵³ so the double
    * conversions are exact, every later op is correctly rounded over
    * bit-identical operands (the q_profile_corr discipline), and the
    * final floor(·1e6) of a bit-identical double is bit-identical.
    *
    * Lag pairs are OBSERVED-index neighbors (lead(y,k) over the hour
    * sort): PACF of the observed series, well-defined on irregular
    * data; a calendar-grid variant composes with q_win_gapfill.
    *
    * Scale: corpus → (type, hr) partial agg; all three leads share ONE
    * window sort; moments partial-aggregate; the recursion runs on 5
    * rows. Degenerate guards are integer-exact: |r1|=1 (φ22 pole) and
    * the φ33 denominator's exact-zero test behave identically because
    * the doubles they test are bit-identical.
    */
  private val pacf = QueryDef(
    "q_ts_pacf",
    (s, d) => {
      val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val hourly = Tables.events(s, d)
        .select(col("event_type"),
          floorDiv(unix_micros(col("ts")), HourUs).as("hr"))
        .groupBy(col("event_type"), col("hr"))
        .agg(count(lit(1)).as("y"))
      val tot = hourly.groupBy(col("event_type").as("et2"))
        .agg(sum(col("y")).as("ss"), count(lit(1)).as("nn"))
      val w = Window.partitionBy(col("event_type")).orderBy(ascf("hr"))
      val led = hourly
        .withColumn("y1", lead(col("y"), 1).over(w))
        .withColumn("y2", lead(col("y"), 2).over(w))
        .withColumn("y3", lead(col("y"), 3).over(w))
        .join(broadcast(tot), col("event_type") === col("et2"))
        .withColumn("d0", col("y") * col("nn") - col("ss"))
        .withColumn("d1", col("y1") * col("nn") - col("ss"))
        .withColumn("d2", col("y2") * col("nn") - col("ss"))
        .withColumn("d3", col("y3") * col("nn") - col("ss"))
      val m = led.groupBy(col("event_type"), col("nn"))
        .agg(sum((col("d0") * col("d0")).cast(dec38)).as("c0"),
          sum((col("d0") * col("d1")).cast(dec38)).as("c1"),
          sum((col("d0") * col("d2")).cast(dec38)).as("c2"),
          sum((col("d0") * col("d3")).cast(dec38)).as("c3"))
        .filter(col("nn") >= 4 && col("c0") > 0)
      def rE6(ck: org.apache.spark.sql.Column,
          c0: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
        val num = ck * lit(1000000L)
        ((num - pmod(num, c0)) / c0).cast("long")
      }
      val r = m
        .withColumn("r1_e6", rE6(col("c1"), col("c0")))
        .withColumn("r2_e6", rE6(col("c2"), col("c0")))
        .withColumn("r3_e6", rE6(col("c3"), col("c0")))
      val r1 = col("r1_e6").cast("double") / lit(1000000.0)
      val r2 = col("r2_e6").cast("double") / lit(1000000.0)
      val r3 = col("r3_e6").cast("double") / lit(1000000.0)
      val den2 = lit(1.0) - r1 * r1
      val p22 = (r2 - r1 * r1) / den2
      val p21 = r1 - p22 * r1
      val den3 = lit(1.0) - p21 * r1 - p22 * r2
      val p33 = (r3 - p21 * r2 - p22 * r1) / den3
      val pole2 = col("r1_e6") * col("r1_e6") === lit(1000000000000L)
      r.select(col("event_type"), col("nn").as("n_hours"),
          col("r1_e6"), col("r2_e6"), col("r3_e6"),
          when(pole2, lit(0L))
            .otherwise(floor(p22 * lit(1000000.0)).cast("long"))
            .as("pacf2_e6"),
          when(pole2 || den3 === lit(0.0), lit(0L))
            .otherwise(floor(p33 * lit(1000000.0)).cast("long"))
            .as("pacf3_e6"))
        .orderBy(ascf("event_type"))
    },
    Some("""WITH h AS (SELECT event_type,
           |    epoch_us(ts) // 3600000000 AS hr, CAST(count(*) AS BIGINT) AS y
           |  FROM events GROUP BY 1, 2),
           |t AS (SELECT event_type AS et2, CAST(sum(y) AS BIGINT) AS ss,
           |    CAST(count(*) AS BIGINT) AS nn
           |  FROM h GROUP BY 1),
           |l AS (SELECT event_type, y,
           |    lead(y, 1) OVER w AS y1, lead(y, 2) OVER w AS y2,
           |    lead(y, 3) OVER w AS y3
           |  FROM h WINDOW w AS (PARTITION BY event_type ORDER BY hr ASC)),
           |dv AS (SELECT l.event_type, t.nn,
           |    y * nn - ss AS d0, y1 * nn - ss AS d1,
           |    y2 * nn - ss AS d2, y3 * nn - ss AS d3
           |  FROM l JOIN t ON l.event_type = t.et2),
           |m AS (SELECT event_type, nn,
           |    sum(CAST(d0 * d0 AS HUGEINT)) AS c0,
           |    sum(CAST(d0 * d1 AS HUGEINT)) AS c1,
           |    sum(CAST(d0 * d2 AS HUGEINT)) AS c2,
           |    sum(CAST(d0 * d3 AS HUGEINT)) AS c3
           |  FROM dv GROUP BY 1, 2),
           |f AS (SELECT * FROM m WHERE nn >= 4 AND c0 > 0),
           |rr AS (SELECT event_type, nn,
           |    CAST((c1 * 1000000 - ((c1 * 1000000 % c0) + c0) % c0) // c0
           |      AS BIGINT) AS r1_e6,
           |    CAST((c2 * 1000000 - ((c2 * 1000000 % c0) + c0) % c0) // c0
           |      AS BIGINT) AS r2_e6,
           |    CAST((c3 * 1000000 - ((c3 * 1000000 % c0) + c0) % c0) // c0
           |      AS BIGINT) AS r3_e6
           |  FROM f),
           |dbl AS (SELECT *,
           |    CAST(r1_e6 AS DOUBLE) / CAST(1000000 AS DOUBLE) AS r1,
           |    CAST(r2_e6 AS DOUBLE) / CAST(1000000 AS DOUBLE) AS r2,
           |    CAST(r3_e6 AS DOUBLE) / CAST(1000000 AS DOUBLE) AS r3
           |  FROM rr),
           |s2 AS (SELECT *,
           |    (r2 - r1 * r1) / (CAST(1 AS DOUBLE) - r1 * r1) AS p22
           |  FROM dbl),
           |s3 AS (SELECT *, r1 - p22 * r1 AS p21 FROM s2),
           |s4 AS (SELECT *,
           |    CAST(1 AS DOUBLE) - p21 * r1 - p22 * r2 AS den3 FROM s3)
           |SELECT event_type, nn AS n_hours, r1_e6, r2_e6, r3_e6,
           |  CAST(CASE WHEN r1_e6 * r1_e6 = 1000000000000 THEN 0
           |    ELSE floor(p22 * CAST(1000000 AS DOUBLE)) END AS BIGINT)
           |    AS pacf2_e6,
           |  CAST(CASE WHEN r1_e6 * r1_e6 = 1000000000000
           |      OR den3 = CAST(0 AS DOUBLE) THEN 0
           |    ELSE floor(((r3 - p21 * r2 - p22 * r1) / den3)
           |      * CAST(1000000 AS DOUBLE)) END AS BIGINT) AS pacf3_e6
           |FROM s4
           |ORDER BY event_type ASC NULLS FIRST""".stripMargin))

  /** 1-D Kalman filter over daily counts per type (round 7): the
    * ADAPTIVE-gain smoother — q_ts_ewma and q_ts_holt apply FIXED
    * blending weights; a Kalman filter carries a variance state p and
    * derives the gain g = p/(p+R) from it each step, so it starts
    * maximally trusting the data (p₀ = R ⇒ g = 0.5) and relaxes to the
    * steady-state Riccati gain (≈ 0.22 at Q/R = 1/16) as evidence
    * accumulates — the sensor-fusion / metric-smoothing recurrence.
    *
    * Same execution shape as q_ts_holt: the recurrence is inherently
    * sequential per key, so it runs as ONE `aggregate` HOF fold over
    * the per-type day array (day grain: calendar-bounded, ~30 elements
    * — collect_list of a corpus-sized series would be wrong, stated)
    * vs a recursive-CTE oracle — two engines, one integer recurrence,
    * plus a third plain-Scala replica in Round7Spec.
    *
    * Integer recurrence (e6-scaled estimate, Q = 2²⁰, R = 2²⁴ in
    * variance units): p⁺ = p + Q; g_e6 = p⁺·10⁶ div (p⁺ + R);
    * x += g·(z·10⁶ − x) div 10⁶; p = p⁺·(10⁶ − g) div 10⁶ — every
    * step exact int64 (z·10⁶ ≤ 10¹¹ at the probe, ×g ≤ 10¹⁷), `div`
    * truncation identical in both engines on the possibly-negative
    * innovation product. Innovation |z·10⁶ − x_pred| accumulates as a
    * checksum so EVERY intermediate x is load-bearing, not just the
    * final state.
    */
  private val kalman = QueryDef(
    "q_ts_kalman",
    (s, d) => {
      val daily = Tables.events(s, d)
        .select(col("event_type"),
          floorDiv(unix_micros(col("ts")), DayUs).as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("c"))
      daily.groupBy(col("event_type"))
        .agg(array_sort(collect_list(struct(col("day"), col("c"))))
          .as("xs"))
        .withColumn("st", expr(
          """aggregate(xs,
            |  named_struct('x', 0L, 'p', 0L, 'n', 0L, 'ic', 0L, 'g', 0L),
            |  (st, e) -> CASE WHEN st.n = 0
            |    THEN named_struct('x', e.c * 1000000L, 'p', 16777216L,
            |      'n', 1L, 'ic', 0L, 'g', 0L)
            |    ELSE named_struct(
            |      'x', st.x + (((st.p + 1048576L) * 1000000L
            |              div (st.p + 1048576L + 16777216L))
            |            * (e.c * 1000000L - st.x)) div 1000000L,
            |      'p', ((st.p + 1048576L) * (1000000L
            |              - ((st.p + 1048576L) * 1000000L
            |                 div (st.p + 1048576L + 16777216L))))
            |            div 1000000L,
            |      'n', st.n + 1L,
            |      'ic', st.ic + abs(e.c * 1000000L - st.x),
            |      'g', (st.p + 1048576L) * 1000000L
            |             div (st.p + 1048576L + 16777216L)) END)"""
            .stripMargin))
        .select(col("event_type"), col("st.n").as("n_days"),
          col("st.x").as("x_e6"), col("st.p").as("p_final"),
          col("st.g").as("gain_e6"), col("st.ic").as("innov_checksum"))
        .orderBy(ascf("event_type"))
    },
    Some("""WITH RECURSIVE h AS (SELECT event_type,
           |    epoch_us(ts) // 86400000000 AS day, CAST(count(*) AS BIGINT) AS c
           |  FROM events GROUP BY 1, 2),
           |hr AS (SELECT event_type, c, row_number() OVER (
           |    PARTITION BY event_type ORDER BY day ASC) AS rn FROM h),
           |s AS (
           |  SELECT event_type, rn, c * 1000000 AS x,
           |    CAST(16777216 AS BIGINT) AS p, CAST(0 AS BIGINT) AS ic,
           |    CAST(0 AS BIGINT) AS g
           |  FROM hr WHERE rn = 1
           |  UNION ALL
           |  SELECT hr.event_type, hr.rn,
           |    s.x + (((s.p + 1048576) * 1000000
           |        // (s.p + 1048576 + 16777216))
           |      * (hr.c * 1000000 - s.x)) // 1000000,
           |    ((s.p + 1048576) * (1000000 - ((s.p + 1048576) * 1000000
           |        // (s.p + 1048576 + 16777216)))) // 1000000,
           |    s.ic + abs(hr.c * 1000000 - s.x),
           |    (s.p + 1048576) * 1000000 // (s.p + 1048576 + 16777216)
           |  FROM s JOIN hr ON hr.event_type = s.event_type
           |    AND hr.rn = s.rn + 1),
           |fin AS (SELECT s.*, row_number() OVER (
           |    PARTITION BY event_type ORDER BY rn DESC) AS rr FROM s)
           |SELECT event_type, CAST(rn AS BIGINT) AS n_days,
           |  CAST(x AS BIGINT) AS x_e6, CAST(p AS BIGINT) AS p_final,
           |  CAST(g AS BIGINT) AS gain_e6,
           |  CAST(ic AS BIGINT) AS innov_checksum
           |FROM fin WHERE rr = 1
           |ORDER BY event_type ASC NULLS FIRST""".stripMargin))

  /** Rescaled-range Hurst exponent over hourly counts per type (round
    * 7): the LONG-MEMORY estimator — autocorr measures lag-1 memory,
    * permutation entropy local complexity; the Hurst H asks whether
    * deviations COMPOUND across scales (H > 0.5 trending/persistent,
    * < 0.5 mean-reverting, = 0.5 memoryless), read off the slope of
    * ln(R/S) against ln(window) over dyadic windows w ∈ {16,32,64,128}
    * — the statistic capacity planning uses to decide whether load
    * bursts aggregate away or stack.
    *
    * Exactness layering: within each full w-sized segment (observed-
    * index, the PACF convention) deviations are mean-SCALED d = w·x −
    * S_seg (exact int64), the cumulative range R is an integer window
    * max−min, and the variance w·Σx²−S² is exact; rs_e6 =
    * floor(R·10⁶ / sqrt(var)) is one correctly-rounded sqrt+div over
    * identical ints. ln(rs) goes through the D12 staged ladder and
    * floors to e6; per-(type,w) means are trunc-divs. The final slope
    * collapses to a CLOSED FORM because the four ln w are equally
    * spaced in ln 2, so the OLS slope reduces to H_e6 =
    * floor((3(y₁₂₈−y₁₆) + (y₆₄−y₃₂)) / (10·ln 2)) with 10·ln 2 the
    * literal 6.931471805599453 — one double division by a constant,
    * no regression machinery.
    *
    * Scale: one hour-grain partial agg; segmentation, windows, and ln
    * chains run on the ≤ span-sized series relation (segments ≈
    * span/16 rows); nothing corpus-sized past the first shuffle.
    */
  private val hurst = QueryDef(
    "q_ts_hurst",
    (s, d) => {
      import graft.functions.DetMath
      val hourly = graft.Caches.scoped(Tables.events(s, d)
        .select(col("event_type"),
          floorDiv(unix_micros(col("ts")), HourUs).as("hr"))
        .groupBy(col("event_type"), col("hr"))
        .agg(count(lit(1)).as("x"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("event_type")).orderBy(ascf("hr")))))
      // Round 11 (stage-count collapse): the four window sizes used to
      // run four parallel seg→stats→join→window→rollup sub-pipelines
      // over the tiny hourly census, then inner-join the four outputs —
      // ~20 micro-stages and a 4-way join. One EXPLODED pipeline keyed
      // by (event_type, w, sg) computes the identical per-size math in
      // a single chain; the final conditional aggregation replicates
      // the old inner join's semantics exactly (an event_type missing
      // any size dropped out of the 4-way join → the nw = 4 filter).
      val sizes = Seq(16L, 32L, 64L, 128L)
      val seg = hourly
        .withColumn("w", explode(array(sizes.map(lit): _*)))
        .withColumn("sg", expr("(rn - 1) div w"))
      val stats = seg.groupBy(col("event_type"), col("w"), col("sg"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("ss"),
          sum(col("x") * col("x")).as("sxx"))
        .filter(col("n") === col("w") &&
          col("sxx") * col("w") - col("ss") * col("ss") > 0)
      val wcum = Window.partitionBy(col("event_type"), col("w"), col("sg"))
        .orderBy(ascf("rn"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val dev = seg
        .join(stats.select(col("event_type").as("et2"), col("w").as("w2"),
          col("sg").as("sg2"), col("ss"), col("sxx")),
          col("event_type") === col("et2") && col("w") === col("w2") &&
            col("sg") === col("sg2"))
        .withColumn("cd", sum(col("x") * col("w") - col("ss")).over(wcum))
      val rs = dev.groupBy(col("event_type"), col("w"), col("sg"),
          col("ss"), col("sxx"))
        .agg((max(col("cd")) - min(col("cd"))).as("rr"))
        .withColumn("rs_e6", floor(col("rr").cast("double")
          * lit(1000000.0)
          / sqrt((col("sxx") * col("w") - col("ss") * col("ss"))
            .cast("double")))
          .cast("long"))
        .filter(col("rs_e6") >= 1)
      val per = rs.withColumn("lnrs_e6",
          floor(DetMath.lnInt(col("rs_e6")) * lit(1000000.0)).cast("long"))
        .groupBy(col("event_type"), col("w"))
        .agg(count(lit(1)).as("n"),
          expr("cast(sum(lnrs_e6) div count(*) as bigint)").as("y"))
      per.groupBy(col("event_type"))
        .agg(count(lit(1)).as("nw"),
          sum(col("n")).cast("long").as("n_segments"),
          max(when(col("w") === 16L, col("y"))).as("y16"),
          max(when(col("w") === 32L, col("y"))).as("y32"),
          max(when(col("w") === 64L, col("y"))).as("y64"),
          max(when(col("w") === 128L, col("y"))).as("y128"))
        .filter(col("nw") === 4)
        .select(col("event_type"), col("n_segments"),
          col("y16"), col("y32"), col("y64"), col("y128"),
          floor(((col("y128") - col("y16")) * lit(3L) +
            (col("y64") - col("y32"))).cast("double")
            / lit(6.931471805599453)).cast("long").as("h_e6"))
        .orderBy(ascf("event_type"))
    },
    Some {
      import graft.functions.DetMath._
      def wCte(w: Int): String =
        s"""sg$w AS (SELECT event_type, (rn - 1) // $w AS sg, rn, x
           |  FROM hourly),
           |st$w AS (SELECT event_type, sg, CAST(sum(x) AS BIGINT) AS ss,
           |    CAST(sum(x * x) AS BIGINT) AS sxx
           |  FROM sg$w GROUP BY 1, 2
           |  HAVING count(*) = $w AND sum(x * x) * $w - sum(x) * sum(x) > 0),
           |dv$w AS (SELECT g.event_type, g.sg, g.rn, t.ss, t.sxx,
           |    sum(g.x * $w - t.ss) OVER (PARTITION BY g.event_type, g.sg
           |      ORDER BY g.rn ASC ROWS UNBOUNDED PRECEDING) AS cd
           |  FROM sg$w g JOIN st$w t ON g.event_type = t.event_type
           |    AND g.sg = t.sg),
           |rr$w AS (SELECT event_type, sg, ss, sxx,
           |    CAST(max(cd) - min(cd) AS BIGINT) AS rr
           |  FROM dv$w GROUP BY 1, 2, 3, 4),
           |rs$w AS (SELECT event_type,
           |    CAST(floor(CAST(rr AS DOUBLE) * CAST(1000000 AS DOUBLE)
           |      / sqrt(CAST(sxx * $w - ss * ss AS DOUBLE))) AS BIGINT)
           |      AS rs_e6
           |  FROM rr$w),
           |rf$w AS (SELECT event_type, rs_e6 AS x FROM rs$w
           |  WHERE rs_e6 >= 1),
           |l1$w AS (SELECT event_type, x, ${kSql("x")} AS k FROM rf$w),
           |l2$w AS (SELECT *, ${mSql("x", "k")} AS m FROM l1$w),
           |l3$w AS (SELECT *, ${zSql("m")} AS z FROM l2$w),
           |l4$w AS (SELECT *, z * z AS z2 FROM l3$w),
           |l5$w AS (SELECT *, ${hornerSql("z2")} AS h FROM l4$w),
           |yy$w AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n$w,
           |    CAST(sum(CAST(floor(${lnSql("k", "z", "h")}
           |      * CAST(1000000 AS DOUBLE)) AS BIGINT)) // count(*)
           |      AS BIGINT) AS y$w
           |  FROM l5$w GROUP BY 1)""".stripMargin
      s"""WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
         |    CAST(count(*) AS BIGINT) AS x
         |  FROM events GROUP BY 1, 2),
         |hourly AS MATERIALIZED (SELECT event_type, x, row_number() OVER (
         |    PARTITION BY event_type ORDER BY hr ASC) AS rn FROM h),
         |${Seq(16, 32, 64, 128).map(wCte).mkString(",\n")}
         |SELECT yy16.event_type,
         |  CAST(n16 + n32 + n64 + n128 AS BIGINT) AS n_segments,
         |  y16, y32, y64, y128,
         |  CAST(floor(CAST((y128 - y16) * 3 + (y64 - y32) AS DOUBLE)
         |    / CAST('6.931471805599453' AS DOUBLE)) AS BIGINT) AS h_e6
         |FROM yy16 JOIN yy32 USING (event_type)
         |  JOIN yy64 USING (event_type) JOIN yy128 USING (event_type)
         |ORDER BY event_type ASC NULLS FIRST""".stripMargin
    })

  /** MACD crossover detection (round 7): the chained-EMA momentum
    * indicator — fast EMA(12) minus slow EMA(26) gives the MACD line, a
    * third EMA(9) of THAT line gives the signal, and sign changes of
    * (macd − signal) are the buy/sell crossings every momentum monitor
    * (finance or infra-capacity) alerts on. The step up from q_ts_holt:
    * not one recurrence but three, the third consuming the difference
    * of the first two — state is a 3-EMA tuple plus the previous
    * divergence for crossing detection, and the divergence checksum
    * pins every intermediate step of all three chains at once.
    *
    * Exact integer contract: counts ×4096, each EMA step the truncating
    * rational e' = (2·x + (n−1)·e) div (n+1) with n = 12/26/9 (α =
    * 2/(n+1), the standard EMA smoothing, no floats anywhere); both
    * EMAs seed at the first observation, the signal seeds at 0 and
    * folds from the second day (documented convention — both engines
    * spell the identical CASE). Spark `div` ≡ DuckDB `//` toward zero,
    * verified on negative divergences (declining series make macd < 0,
    * the q_ts_holt precedent).
    *
    * Spark has no recursive SQL: the fold runs as one `aggregate` HOF
    * over each type's day-sorted array vs a recursive-CTE oracle — two
    * maximally-different executions of the same integer recurrence,
    * both generated from ONE Scala template so the arithmetic cannot
    * drift between engines.
    *
    * Scale: the day-grain partial agg is the only corpus-sized shuffle;
    * the fold touches type-grain arrays (≤ days elements). A tick-grain
    * series downsamples through q_ts_ohlc first — exactly how
    * production MACD is computed.
    */
  private val macd: QueryDef = {
      // one template, two engines: s/`x`/day count/, s/`st.`/state./
      def e12(x: String, st: String) = s"((2L*$x*4096L + 11L*$st.e12) div 13L)"
      def e26(x: String, st: String) = s"((2L*$x*4096L + 25L*$st.e26) div 27L)"
      def macdN(x: String, st: String) = s"(${e12(x, st)} - ${e26(x, st)})"
      def sigN(x: String, st: String) =
        s"((2L*${macdN(x, st)} + 8L*$st.sig) div 10L)"
      def diffN(x: String, st: String) =
        s"(${macdN(x, st)} - ${sigN(x, st)})"
      val build = (s: org.apache.spark.sql.SparkSession, d: String) => {
        val daily = Tables.events(s, d)
          .select(col("event_type"),
            floorDiv(unix_micros(col("ts")), DayUs).as("day"))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("c"))
        val (x, st) = ("x.c", "st")
        daily.groupBy(col("event_type"))
          .agg(array_sort(collect_list(struct(col("day"), col("c"))))
            .as("xs"))
          .withColumn("st", expr(
            s"""aggregate(xs,
               |  named_struct('e12', 0L, 'e26', 0L, 'sig', 0L, 'pd', 0L,
               |    'cr', 0L, 'sd', 0L, 'n', 0L),
               |  (st, x) -> CASE WHEN st.n = 0L THEN named_struct(
               |      'e12', x.c * 4096L, 'e26', x.c * 4096L, 'sig', 0L,
               |      'pd', 0L, 'cr', 0L, 'sd', 0L, 'n', 1L)
               |    ELSE named_struct(
               |      'e12', ${e12(x, st)}, 'e26', ${e26(x, st)},
               |      'sig', ${sigN(x, st)},
               |      'pd', ${diffN(x, st)},
               |      'cr', st.cr + CASE WHEN (${diffN(x, st)} > 0L
               |          AND st.pd < 0L) OR (${diffN(x, st)} < 0L
               |          AND st.pd > 0L) THEN 1L ELSE 0L END,
               |      'sd', st.sd + ${diffN(x, st)},
               |      'n', st.n + 1L) END)""".stripMargin))
          .select(col("event_type"), col("st.n").as("n_days"),
            (col("st.e12") - col("st.e26")).as("macd_x4096"),
            col("st.sig").as("signal_x4096"),
            col("st.pd").as("diff_x4096"),
            col("st.cr").as("n_cross"),
            col("st.sd").as("diff_checksum"))
          .orderBy(ascf("event_type"))
      }
      // SQL spelling of the same template: x → hr.c, state → s, div → //
      def sql(t: (String, String) => String) =
        t("hr.c", "s").replace(" div ", " // ").replace("L", "")
      QueryDef("q_ts_macd", build, Some(
        s"""WITH RECURSIVE h AS (SELECT event_type,
           |    epoch_us(ts) // 86400000000 AS day, count(*) AS c
           |  FROM events GROUP BY 1, 2),
           |hr AS (SELECT event_type, c, row_number() OVER (
           |    PARTITION BY event_type ORDER BY day ASC) AS rn FROM h),
           |s AS (
           |  SELECT event_type, rn, c * 4096 AS e12, c * 4096 AS e26,
           |    CAST(0 AS BIGINT) AS sig, CAST(0 AS BIGINT) AS pd,
           |    CAST(0 AS BIGINT) AS cr, CAST(0 AS BIGINT) AS sd
           |  FROM hr WHERE rn = 1
           |  UNION ALL
           |  SELECT hr.event_type, hr.rn,
           |    ${sql(e12)}, ${sql(e26)}, ${sql(sigN)}, ${sql(diffN)},
           |    s.cr + CASE WHEN (${sql(diffN)} > 0 AND s.pd < 0)
           |      OR (${sql(diffN)} < 0 AND s.pd > 0) THEN 1 ELSE 0 END,
           |    s.sd + ${sql(diffN)}
           |  FROM s JOIN hr ON hr.event_type = s.event_type
           |    AND hr.rn = s.rn + 1),
           |fin AS (SELECT s.*, row_number() OVER (
           |    PARTITION BY event_type ORDER BY rn DESC) AS rr FROM s)
           |SELECT event_type, CAST(rn AS BIGINT) AS n_days,
           |  CAST(e12 - e26 AS BIGINT) AS macd_x4096,
           |  CAST(sig AS BIGINT) AS signal_x4096,
           |  CAST(pd AS BIGINT) AS diff_x4096,
           |  CAST(cr AS BIGINT) AS n_cross,
           |  CAST(sd AS BIGINT) AS diff_checksum
           |FROM fin WHERE rr = 1
           |ORDER BY event_type ASC NULLS FIRST""".stripMargin))
    }

  /** Kaplan–Meier survival curve (round 7): the churn/lifetime
    * estimator — per (user, event-type) subject,
    * lifetime = days between its first and last event; subjects still active on the corpus's final day are CENSORED
    * (we know their lifetime is ≥ t, not = t — simply dropping them is
    * the classic churn-analysis bias KM exists to fix: censored users
    * leave the at-risk denominator without counting as churn). At each
    * observed lifetime t: n_risk = users with lifetime ≥ t, n_churn =
    * uncensored lifetimes = t, and the survival estimate folds
    * S ← S·(n_risk−n_churn)/n_risk. q_win_retention grades fixed
    * day-k return RATES; this grades the lifetime DISTRIBUTION with
    * censoring handled correctly.
    *
    * Scale: one corpus pass to user grain, one partial agg to lifetime
    * grain (≤ span days rows); n_risk is a descending cumulative window
    * and the survival product is an `aggregate` HOF fold over the
    * span-bounded array vs a recursive-CTE oracle (the q_ts_holt
    * two-engines-one-recurrence pattern). The global max day rides a
    * windowless 1-row broadcast.
    *
    * Determinism (D2): integer epoch-day lifetimes; the product is
    * e6-scaled with a truncating div at every step (documented
    * convention, same both engines); surv_e6 is non-increasing by
    * construction — pinned in Round7Spec.
    */
  private val survival = QueryDef(
    "q_ts_survival",
    (s, d) => {
      val days = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          floorDiv(unix_micros(col("ts")), DayUs).as("day"))
      val users = days.groupBy(col("user_id"), col("event_type"))
        .agg(min(col("day")).as("f"), max(col("day")).as("l"))
      val mx = users.agg(max(col("l")).as("mxd"))
      val dur = users.crossJoin(broadcast(mx))
        .select((col("l") - col("f")).as("t"),
          when(col("l") === col("mxd"), 1L).otherwise(0L).as("c"))
        .groupBy(col("t"))
        .agg(count(lit(1)).as("nu"),
          sum(lit(1L) - col("c")).as("n_churn"),
          sum(col("c")).as("n_censored"))
      // ≤ span-days rows from here on: the single-partition window and
      // the fold run on the lifetime-grain sketch, never the corpus
      val risk = dur.withColumn("n_risk", sum(col("nu")).over(
        Window.orderBy(ascf("t"))
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      risk.agg(array_sort(collect_list(struct(col("t"), col("n_risk"),
          col("n_churn"), col("n_censored")))).as("xs"))
        .select(explode(expr(
          """aggregate(xs,
            |  named_struct('s', 1000000L,
            |    'out', cast(array() as array<struct<t:bigint,
            |      n_risk:bigint,n_churn:bigint,n_censored:bigint,
            |      surv_e6:bigint>>)),
            |  (st, x) -> named_struct(
            |    's', (st.s * (x.n_risk - x.n_churn)) div x.n_risk,
            |    'out', array_append(st.out, named_struct(
            |      't', x.t, 'n_risk', x.n_risk, 'n_churn', x.n_churn,
            |      'n_censored', x.n_censored,
            |      'surv_e6',
            |      (st.s * (x.n_risk - x.n_churn)) div x.n_risk))),
            |  st -> st.out)""".stripMargin)).as("r"))
        .select(col("r.t").as("t_days"), col("r.n_risk"),
          col("r.n_churn"), col("r.n_censored"), col("r.surv_e6"))
        .orderBy(ascf("t_days"))
    },
    Some("""WITH RECURSIVE u AS (SELECT user_id, event_type,
           |    min(epoch_us(ts) // 86400000000) AS f,
           |    max(epoch_us(ts) // 86400000000) AS l
           |  FROM events GROUP BY 1, 2),
           |m AS (SELECT max(l) AS mxd FROM u),
           |du AS (SELECT l - f AS t,
           |    CASE WHEN l = m.mxd THEN 1 ELSE 0 END AS c FROM u, m),
           |dur AS (SELECT t, count(*) AS nu,
           |    CAST(sum(1 - c) AS BIGINT) AS ch,
           |    CAST(sum(c) AS BIGINT) AS ce
           |  FROM du GROUP BY t),
           |rk AS (SELECT t, nu, ch, ce,
           |    CAST(sum(nu) OVER (ORDER BY t DESC
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      AS BIGINT) AS nrisk,
           |    row_number() OVER (ORDER BY t ASC) AS rn
           |  FROM dur),
           |s AS (
           |  SELECT t, nu, ch, ce, nrisk, rn,
           |    (1000000 * (nrisk - ch)) // nrisk AS surv
           |  FROM rk WHERE rn = 1
           |  UNION ALL
           |  SELECT rk.t, rk.nu, rk.ch, rk.ce, rk.nrisk, rk.rn,
           |    (s.surv * (rk.nrisk - rk.ch)) // rk.nrisk
           |  FROM s JOIN rk ON rk.rn = s.rn + 1)
           |SELECT t AS t_days, nrisk AS n_risk, ch AS n_churn,
           |  ce AS n_censored, CAST(surv AS BIGINT) AS surv_e6
           |FROM s
           |ORDER BY t_days ASC NULLS FIRST""".stripMargin))

  /** Holt–Winters additive triple smoothing (round 7): the top of the
    * exponential ladder — q_ts_ewma carries LEVEL, q_ts_holt adds
    * TREND, this adds a 7-slot weekly SEASONAL state: per event type,
    * the day-count series folds through
    *   l' = ((x − s_slot) + (l + b)) div 2          (α = 1/2)
    *   b' = (b + l' − l) div 2                      (β = 1/2)
    *   s_slot' = ((x − l') + s_slot) div 2          (γ = 1/2)
    * with slot = n mod 7, all in exact int64 4096ths, folded UNIFORMLY
    * from the zero state (no init special case — a documented
    * convention both engines spell identically; the first cycle's
    * seasonal slots warm up from 0). The state is now a STRUCT WITH AN
    * ARRAY — each step rewrites one seasonal slot — which is exactly
    * what makes HW the interesting grade: a slot-index bug preserves
    * level/trend but breaks the per-slot checksums.
    *
    * Spark: one `aggregate` HOF whose accumulator carries the 7-element
    * array; DuckDB: a recursive CTE carrying a LIST column, updated via
    * list_transform — the two most different spellings of stateful
    * seasonal smoothing these engines can express, generated from one
    * Scala template (the q_ts_macd discipline) so the arithmetic cannot
    * drift.
    *
    * Scale: the day-grain partial agg is the only corpus-sized shuffle;
    * the fold touches type-grain arrays.
    */
  private val holtWinters: QueryDef = {
    // template pieces; `x` = the day count ref, `st` = state ref,
    // `slot` = this step's seasonal slot value ref
    def lN(x: String, slot: String, st: String) =
      s"(($x*4096L - $slot + $st.l + $st.b) div 2L)"
    def bN(x: String, slot: String, st: String) =
      s"(($st.b + ${lN(x, slot, st)} - $st.l) div 2L)"
    def sN(x: String, slot: String, st: String) =
      s"(($x*4096L - ${lN(x, slot, st)} + $slot) div 2L)"
    val build = (s: org.apache.spark.sql.SparkSession, d: String) => {
      val daily = Tables.events(s, d)
        .select(col("event_type"),
          floorDiv(unix_micros(col("ts")), DayUs).as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("c"))
      val slot = "element_at(st.sa, int(st.n % 7L) + 1)"
      val (x, st) = ("x.c", "st")
      daily.groupBy(col("event_type"))
        .agg(array_sort(collect_list(struct(col("day"), col("c"))))
          .as("xs"))
        .withColumn("st", expr(
          s"""aggregate(xs,
             |  named_struct('l', 0L, 'b', 0L,
             |    'sa', array(0L, 0L, 0L, 0L, 0L, 0L, 0L),
             |    'suml', 0L, 'n', 0L),
             |  (st, x) -> named_struct(
             |    'l', ${lN(x, slot, st)},
             |    'b', ${bN(x, slot, st)},
             |    'sa', transform(sequence(0, 6), i ->
             |      CASE WHEN i = int(st.n % 7L)
             |        THEN ${sN(x, slot, st)}
             |        ELSE element_at(st.sa, i + 1) END),
             |    'suml', st.suml + ${lN(x, slot, st)},
             |    'n', st.n + 1L))""".stripMargin))
        .select(col("event_type"), col("st.n").as("n_days"),
          col("st.l").as("level_x4096"), col("st.b").as("trend_x4096"),
          expr("aggregate(st.sa, 0L, (a, v) -> a + v)")
            .as("season_sum_x4096"),
          expr("aggregate(st.sa, 0L, (a, v) -> a + abs(v))")
            .as("season_abs_x4096"),
          col("st.suml").as("suml_x4096"))
        .orderBy(ascf("event_type"))
    }
    // SQL spelling: x → hr.c, state fields → s.…, slot → the list cell
    def sql(t: (String, String, String) => String) =
      t("hr.c", "s.sa[CAST(s.n % 7 AS INTEGER) + 1]", "s")
        .replace(" div ", " // ").replace("L", "")
        .replace("s.sa[CAST(s.n % 7 AS INTEGER) + 1]",
          "s.sa[CAST(s.n % 7 AS INTEGER) + 1]")
    QueryDef("q_ts_holt_winters", build, Some(
      s"""WITH RECURSIVE h AS (SELECT event_type,
         |    epoch_us(ts) // 86400000000 AS day, count(*) AS c
         |  FROM events GROUP BY 1, 2),
         |hr AS (SELECT event_type, c, row_number() OVER (
         |    PARTITION BY event_type ORDER BY day ASC) AS rn FROM h),
         |z AS (SELECT DISTINCT event_type, CAST(0 AS BIGINT) AS l,
         |    CAST(0 AS BIGINT) AS b,
         |    [CAST(0 AS BIGINT), 0, 0, 0, 0, 0, 0] AS sa,
         |    CAST(0 AS BIGINT) AS suml, CAST(0 AS BIGINT) AS n
         |  FROM h),
         |s AS (
         |  SELECT event_type, l, b, sa, suml, n FROM z
         |  UNION ALL
         |  SELECT hr.event_type,
         |    ${sql(lN)},
         |    ${sql(bN)},
         |    list_transform(range(0, 7), i ->
         |      CASE WHEN i = s.n % 7 THEN ${sql(sN)}
         |        ELSE s.sa[CAST(i AS INTEGER) + 1] END),
         |    s.suml + ${sql(lN)},
         |    s.n + 1
         |  FROM s JOIN hr ON hr.event_type = s.event_type
         |    AND hr.rn = s.n + 1),
         |fin AS (SELECT s.*, row_number() OVER (
         |    PARTITION BY event_type ORDER BY n DESC) AS rr FROM s)
         |SELECT event_type, CAST(n AS BIGINT) AS n_days,
         |  CAST(l AS BIGINT) AS level_x4096,
         |  CAST(b AS BIGINT) AS trend_x4096,
         |  CAST(list_sum(sa) AS BIGINT) AS season_sum_x4096,
         |  CAST(list_sum(list_transform(sa, v -> abs(v))) AS BIGINT)
         |    AS season_abs_x4096,
         |  CAST(suml AS BIGINT) AS suml_x4096
         |FROM fin WHERE rr = 1
         |ORDER BY event_type ASC NULLS FIRST""".stripMargin))
  }

  /** New-vs-returning daily split (round 7): the acquisition census
    * every growth dashboard leads with — per day, how many active users
    * are seen for the FIRST time vs returning, plus the running total
    * of distinct users ever seen. Completes the engagement tier:
    * q_ts_dau_mau grades stickiness, q_win_retention day-k return
    * rates, q_ts_survival lifetime distributions — this grades the
    * acquisition/repeat split those all condition on.
    *
    * Scale: one corpus pass to (user, day) grain with map-side combine;
    * first-seen day is a per-user min folded in the same aggregate; the
    * day census and the cumulative window run on the ≤ span-days
    * relation. The classic two-level shape — nothing user-grain ever
    * shuffles twice.
    *
    * Determinism (D1/D2): integer epoch days; pure counting;
    * new_share_e6 trunc-div.
    */
  private val newReturning = QueryDef(
    "q_ts_new_returning",
    (s, d) => {
      val ud = Tables.events(s, d)
        .select(col("user_id"),
          floorDiv(unix_micros(col("ts")), DayUs).as("day"))
        .groupBy(col("user_id"), col("day"))
        .agg(count(lit(1)).as("n_ev"))
      val withFirst = ud.withColumn("first_day",
        min(col("day")).over(Window.partitionBy(col("user_id"))))
      val daily = withFirst.groupBy(col("day"))
        .agg(count(lit(1)).as("n_active"),
          sum(when(col("day") === col("first_day"), 1L).otherwise(0L))
            .as("n_new"),
          sum(when(col("day") =!= col("first_day"), 1L).otherwise(0L))
            .as("n_returning"),
          sum(col("n_ev")).as("n_events"))
      daily.withColumn("cum_users", sum(col("n_new")).over(
          Window.orderBy(ascf("day"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("new_share_e6", expr("n_new * 1000000 div n_active"))
        .orderBy(ascf("day"))
    },
    Some("""WITH ud AS (SELECT user_id,
           |    epoch_us(ts) // 86400000000 AS day, count(*) AS n_ev
           |  FROM events GROUP BY 1, 2),
           |f AS (SELECT *, min(day) OVER (PARTITION BY user_id)
           |    AS first_day FROM ud),
           |daily AS (SELECT day, CAST(count(*) AS BIGINT) AS n_active,
           |    CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END)
           |      AS BIGINT) AS n_new,
           |    CAST(sum(CASE WHEN day <> first_day THEN 1 ELSE 0 END)
           |      AS BIGINT) AS n_returning,
           |    CAST(sum(n_ev) AS BIGINT) AS n_events
           |  FROM f GROUP BY day)
           |SELECT day, n_active, n_new, n_returning, n_events,
           |  CAST(sum(n_new) OVER (ORDER BY day ASC
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |    AS BIGINT) AS cum_users,
           |  CAST(n_new * 1000000 // n_active AS BIGINT) AS new_share_e6
           |FROM daily
           |ORDER BY day ASC NULLS FIRST""".stripMargin))

  /** AR(1) fit + in-sample one-step backtest (round 10): the lag-1
    * autoregression y_{t+1} = c + φ·y_t fitted by exact least squares on
    * the adjacent-hour pairs of each event-type's hourly count series —
    * φ = (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²) is a RATIONAL (q_ts_autocorr's
    * r needs a sqrt; the regression slope does not), the intercept
    * follows from the means, and the fitted model is immediately
    * backtested: WAPE of the one-step forecasts against the observed
    * next-hour counts. The simplest member of the model-fit family that
    * q_ts_holt/holt_winters/kalman extend — and the one whose fit AND
    * eval are both exactly oracle-able end to end.
    *
    * Determinism (D1/D2/D12): moments exact int64; the slope numerator,
    * the intercept numerator c1, and the backtest error sum all stage
    * through DECIMAL(38,0)/HUGEINT (covn·1e6 passes 2⁶³ around 100× the
    * fixture's hourly volumes; c1 and Σerr are ~1e6·events-per-type and
    * wrap near 9·10¹² events — ADVICE r10); signed floor division via
    * the subtract-normalized-mod idiom on both engines; forecast errors
    * and WAPE are integer arithmetic on the e6-scaled model.
    *
    * Scale: hourly partial agg on the scan; ONE (event_type, hr) sort
    * shared by the lead() pairing; moments and model are |types|-grain;
    * the backtest re-joins the broadcast 8-row model to the pair
    * relation (scoped-cached, built once).
    */
  private val ar1 = QueryDef(
    "q_ts_ar1",
    (s, d) => {
      val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val hourly = Tables.events(s, d)
        .select(col("event_type"),
          floorDiv(unix_micros(col("ts")), HourUs).as("hr"))
        .groupBy(col("event_type"), col("hr"))
        .agg(count(lit(1)).as("y"))
      val w = Window.partitionBy(col("event_type")).orderBy(ascf("hr"))
      val pairs = graft.Caches.scoped(hourly
        .withColumn("nhr", lead(col("hr"), 1).over(w))
        .withColumn("ny", lead(col("y"), 1).over(w))
        .filter(col("nhr") === col("hr") + 1)
        .select(col("event_type"), col("y"), col("ny")))
      val model = pairs.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("y")).as("sx"), sum(col("ny")).as("sy"),
          sum(col("y") * col("ny")).as("sxy"),
          sum(col("y") * col("y")).as("sxx"))
        .withColumn("covn", expr("n * sxy - sx * sy"))
        .withColumn("varx", expr("n * sxx - sx * sx"))
        .filter(col("varx") > 0)
        .withColumn("num", col("covn").cast(dec38) * lit(1000000L))
        .withColumn("phi_e6",
          expr("""cast((num - ((num % varx + varx) % varx)) / varx
                 |  as bigint)""".stripMargin))
        // c1 staged through DECIMAL(38,0) like phi's numerator (ADVICE
        // r10): sy·1e6 and phi_e6·sx are both ~1e6·(events per type),
        // which wraps int64 near 9·10¹² events — the same volume class
        // where covn·1e6 already needed the staging
        .withColumn("c1",
          col("sy").cast(dec38) * lit(1000000L)
            - col("phi_e6").cast(dec38) * col("sx"))
        .withColumn("intercept_e6",
          expr("cast((c1 - ((c1 % n + n) % n)) div n as bigint)"))
        .select(col("event_type"), col("n").as("n_pairs"),
          col("phi_e6"), col("intercept_e6"))
      pairs.join(broadcast(model), Seq("event_type"))
        .withColumn("err",
          abs(col("ny") * 1000000L
            - (col("intercept_e6") + col("phi_e6") * col("y"))))
        .groupBy(col("event_type"), col("n_pairs"), col("phi_e6"),
          col("intercept_e6"))
        // per-pair err (~ny·1e6) fits int64; only its corpus-length SUM
        // crosses 2⁶³ (~9·10¹² events per type), so the accumulator is
        // the decimal (ADVICE r10) — DuckDB's integer sum() is already
        // HUGEINT, so this also re-aligns the two engines' failure modes
        .agg(sum(col("err").cast(dec38)).as("serr"),
          sum(col("ny")).as("sny"))
        .select(col("event_type"), col("n_pairs"), col("phi_e6"),
          col("intercept_e6"),
          expr("cast(serr div sny as bigint)").as("wape_e6"))
        .orderBy(ascf("event_type"))
    },
    Some("""WITH h AS (SELECT event_type,
           |    epoch_us(ts) // 3600000000 AS hr, count(*) AS y
           |  FROM events GROUP BY 1, 2),
           |p AS (SELECT event_type, y,
           |    lead(hr) OVER w AS nhr, lead(y) OVER w AS ny, hr
           |  FROM h WINDOW w AS (PARTITION BY event_type ORDER BY hr ASC)),
           |pp AS (SELECT event_type, y, ny FROM p WHERE nhr = hr + 1),
           |m AS (SELECT event_type, count(*) AS n,
           |    CAST(sum(y) AS BIGINT) AS sx, CAST(sum(ny) AS BIGINT) AS sy,
           |    CAST(sum(y * ny) AS BIGINT) AS sxy,
           |    CAST(sum(y * y) AS BIGINT) AS sxx
           |  FROM pp GROUP BY event_type),
           |c AS (SELECT event_type, n,
           |    n * sxy - sx * sy AS covn, n * sxx - sx * sx AS varx,
           |    sx, sy
           |  FROM m WHERE n * sxx - sx * sx > 0),
           |f AS (SELECT event_type, n, sx, sy, varx,
           |    CAST(CAST(covn AS HUGEINT) * 1000000 AS HUGEINT) AS num
           |  FROM c),
           |md AS (SELECT event_type, n AS n_pairs, sx, sy,
           |    CAST((num - ((num % varx + varx) % varx)) // varx AS BIGINT)
           |      AS phi_e6
           |  FROM f),
           |md1 AS (SELECT event_type, n_pairs, phi_e6,
           |    CAST(sy AS HUGEINT) * 1000000
           |      - CAST(phi_e6 AS HUGEINT) * sx AS c1
           |  FROM md),
           |md2 AS (SELECT event_type, n_pairs, phi_e6,
           |    CAST((c1 - ((c1 % n_pairs + n_pairs) % n_pairs))
           |      // n_pairs AS BIGINT) AS intercept_e6
           |  FROM md1),
           |bt AS (SELECT pp.event_type, md2.n_pairs, md2.phi_e6,
           |    md2.intercept_e6,
           |    abs(pp.ny * 1000000
           |      - (md2.intercept_e6 + md2.phi_e6 * pp.y)) AS err,
           |    pp.ny AS ny
           |  FROM pp JOIN md2 ON pp.event_type = md2.event_type)
           |SELECT event_type, n_pairs, phi_e6, intercept_e6,
           |  CAST(sum(CAST(err AS HUGEINT)) // sum(ny) AS BIGINT)
           |    AS wape_e6
           |FROM bt GROUP BY event_type, n_pairs, phi_e6, intercept_e6
           |ORDER BY event_type ASC NULLS FIRST""".stripMargin))

  /** Exact daily-cycle spectrum (round 11): DFT power at 1, 2 and 3
    * cycles per day over each event type's hour-of-day profile — the
    * periodicity detector that separates "diurnal traffic" (power
    * concentrated at k=1) from "shift-change twice-daily" (k=2) or
    * flat noise, complementing q_ts_period's autocorrelation view with
    * the frequency-domain one. The trig comes from a LITERAL e6 cosine
    * table of the 24 angles (the q_ml_ndcg literal-table rule: runtime
    * cos() can differ in the last ulp between libm and the JVM; a
    * shared literal table cannot — the table IS the metric's spec,
    * symmetric by construction). sin(15°·m) = cos-table[(m+18) mod 24].
    *
    * Scale: one fact scan → (type, hour-of-day) partial agg — the
    * exchange carries ≤ |types|·24 rows at any corpus size; the
    * spectrum arithmetic runs on that census. Power = sx²+sy² stages
    * through DECIMAL(38,0) (sx ~ events·1e6, the square crosses 2⁶³
    * immediately at any real volume).
    *
    * Determinism (D1/D2/D12): integer counts × literal table entries;
    * the only division is the final e6 floor, identical on both
    * engines.
    */
  private val dft24 = QueryDef(
    "q_ts_dft24",
    (s, d) => {
      val cosE6 = Seq(1000000L, 965925L, 866025L, 707106L, 500000L,
        258819L, 0L, -258819L, -500000L, -707106L, -866025L, -965925L,
        -1000000L, -965925L, -866025L, -707106L, -500000L, -258819L, 0L,
        258819L, 500000L, 707106L, 866025L, 965925L)
      val tbl = array(cosE6.map(lit): _*)
      val h = Tables.events(s, d)
        .select(col("event_type"),
          (floorDiv(unix_micros(col("ts")), HourUs) % 24).as("hod"))
        .groupBy(col("event_type"), col("hod"))
        .agg(count(lit(1)).as("x"))
      def sxy(k: Int) = Seq(
        sum(col("x") * element_at(tbl,
          (pmod(lit(k.toLong) * col("hod"), lit(24L)) + 1).cast("int")))
          .as(s"sx$k"),
        sum(col("x") * element_at(tbl,
          (pmod(lit(k.toLong) * col("hod") + 18, lit(24L)) + 1).cast("int")))
          .as(s"sy$k"))
      val aggs = sum(col("x")).as("n_events") +: (1 to 3).flatMap(sxy)
      h.groupBy(col("event_type"))
        .agg(aggs.head, aggs.tail: _*)
        .select(col("event_type") +: col("n_events") +: (1 to 3).map(k =>
          expr(s"""cast((cast(sx$k as decimal(38,0)) * sx$k
                  |  + cast(sy$k as decimal(38,0)) * sy$k)
                  |  div 1000000 as bigint)""".stripMargin)
            .as(s"p${k}_e6")): _*)
        .orderBy(ascf("event_type"))
    },
    Some("""WITH h AS (SELECT event_type,
           |    (epoch_us(ts) // 3600000000) % 24 AS hod, count(*) AS x
           |  FROM events GROUP BY 1, 2),
           |m AS (SELECT event_type, k,
           |    CAST(sum(x * ([1000000, 965925, 866025, 707106, 500000,
           |      258819, 0, -258819, -500000, -707106, -866025, -965925,
           |      -1000000, -965925, -866025, -707106, -500000, -258819,
           |      0, 258819, 500000, 707106, 866025, 965925])
           |      [1 + CAST((k * hod) % 24 AS INT)]) AS BIGINT) AS sx,
           |    CAST(sum(x * ([1000000, 965925, 866025, 707106, 500000,
           |      258819, 0, -258819, -500000, -707106, -866025, -965925,
           |      -1000000, -965925, -866025, -707106, -500000, -258819,
           |      0, 258819, 500000, 707106, 866025, 965925])
           |      [1 + CAST((k * hod + 18) % 24 AS INT)]) AS BIGINT) AS sy
           |  FROM h CROSS JOIN (VALUES (1), (2), (3)) AS kk(k)
           |  GROUP BY 1, 2),
           |tot AS (SELECT event_type, CAST(sum(x) AS BIGINT) AS n_events
           |  FROM h GROUP BY 1),
           |p AS (SELECT event_type, k,
           |    CAST((CAST(sx AS HUGEINT) * sx + CAST(sy AS HUGEINT) * sy)
           |      // 1000000 AS BIGINT) AS pk
           |  FROM m)
           |SELECT tot.event_type AS event_type, n_events,
           |  CAST(max(CASE WHEN k = 1 THEN pk END) AS BIGINT) AS p1_e6,
           |  CAST(max(CASE WHEN k = 2 THEN pk END) AS BIGINT) AS p2_e6,
           |  CAST(max(CASE WHEN k = 3 THEN pk END) AS BIGINT) AS p3_e6
           |FROM tot JOIN p ON tot.event_type = p.event_type
           |GROUP BY 1, 2
           |ORDER BY event_type ASC NULLS FIRST""".stripMargin))

  def defs: Seq[QueryDef] =
    Seq(gapfill, funnelCohort, retention, ewma, ohlc, moving, trend,
      autocorr, changepoint, seasonality, forecast, interp, holt,
      theilSen, attrib, transitions, downsample, evalWape, latency,
      period, crossCorr, movingMedian, tsRate, dtw, anomalyMad, bollinger,
      decompose, growth, dauMau, sax, permEntropy, entropyRate, cusum,
      pacf, kalman, hurst, macd, survival, holtWinters, newReturning, ar1,
      dft24)
}
