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

  def defs: Seq[QueryDef] = Seq(gapfill)
}
