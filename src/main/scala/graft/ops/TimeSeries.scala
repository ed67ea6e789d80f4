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

  def defs: Seq[QueryDef] = Seq(gapfill, funnelCohort)
}
