package graft.ops

import graft.{QueryDef, Tables}
import graft.Dsl._
import org.apache.spark.sql.functions._

/** Incremental-maintenance + monitoring operators (round 5): the two
  * "keep a resident aggregate alive" shapes a long-running ingestion
  * service needs — ALGEBRAIC PARTIAL-AGG MERGE (fold a new batch into
  * yesterday's aggregates without re-scanning history) and metric
  * ANOMALY DETECTION over the maintained series.
  */
object Incremental {

  private val DayUs = 86400000000L
  private val HourUs = 3600000000L

  /** Incremental aggregation maintenance: the resident state is the
    * per-(event_type, day) partial aggregate of all history (here days
    * with epoch-day < 25 in Jan 2024); a new batch (days ≥ 25) is
    * partially aggregated ALONE and the two partial relations are
    * merged by re-aggregation — count/sum/max are algebraic, so
    * merge(partial(A), partial(B)) ≡ full(A ∪ B) and the oracle grades
    * exactly that equivalence by recomputing from the raw table. At
    * 100 TB this is the production ETL contract: the nightly job costs
    * one batch scan + a merge over day-grain partials, never a history
    * re-scan; a non-mergeable formulation (count distinct over raw
    * rows, say) would fail the hash here.
    *
    * Values enter as floor(value·1e6) int64 (same D11-safe quantization
    * as q_win_gapfill) so every merged sum is exact.
    */
  private val aggIncremental = QueryDef(
    "q_agg_incremental",
    (s, d) => {
      val ev = Tables.events(s, d).select(col("event_type"),
        floorDiv(unix_micros(col("ts")), DayUs).as("day"),
        floor(col("value") * lit(1000000.0)).cast("long").as("v_e6"))
      def partial(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("cnt"), sum(col("v_e6")).as("sv"),
            max(col("v_e6")).as("mx"))
      // resident history and the incoming batch are disjoint day ranges;
      // each is reduced to day-grain partials independently
      val resident = partial(ev.filter(col("day") < 19747L)) // < 2024-01-25
      val batch = partial(ev.filter(col("day") >= 19747L))
      resident.union(batch)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("cnt")).as("n_events"),
          sum(col("sv")).as("sum_v_e6"),
          max(col("mx")).as("max_v_e6"))
        .orderBy(ascf("event_type"))
    },
    // the oracle IS the full recompute: grading pins the algebraic
    // identity merge(partial(old), partial(new)) == full(all)
    Some("""WITH e AS (SELECT event_type,
           |    epoch_us(ts) // 86400000000 AS day,
           |    CAST(floor(value * 1000000) AS BIGINT) AS v_e6
           |  FROM events)
           |SELECT event_type,
           |  count(DISTINCT day) AS n_days,
           |  count(*) AS n_events,
           |  CAST(sum(v_e6) AS BIGINT) AS sum_v_e6,
           |  CAST(max(v_e6) AS BIGINT) AS max_v_e6
           |FROM e GROUP BY event_type
           |ORDER BY event_type ASC NULLS FIRST""".stripMargin))

  /** Metric anomaly detection: flag hours whose event count sits more
    * than 3 sigma above/below the per-type mean over OBSERVED hours
    * (empty hours are not part of the population — stated, and exactly
    * mirrored in the oracle). The z-test runs entirely in integer
    * cross-multiplication — z² > 9  ⇔  (n·c − S)² > 9·(n·Q − S²) with
    * S = Σc, Q = Σc² — so there is no division, no sqrt, no double
    * anywhere (rule D12). Magnitude bound: needs (n·c)² < 2^63 —
    * holds through ~3e9 rows per (type, hour-span); past that the
    * squares widen to DECIMAL(38,0) (q_sim_centroid pattern).
    *
    * Scale: hourly partial agg on the scan (one shuffle), per-type
    * moments on the hour-grain relation (tiny), broadcast back. The
    * 100 TB plan is identical because everything after the first
    * aggregation is hour-grain.
    */
  private val tsAnomaly = QueryDef(
    "q_ts_anomaly",
    (s, d) => {
      val hourly = Tables.events(s, d)
        .select(col("event_type"),
          floorDiv(unix_micros(col("ts")), HourUs).as("hr"))
        .groupBy(col("event_type"), col("hr"))
        .agg(count(lit(1)).as("c"))
      val stats = hourly.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("c")).as("sS"),
          sum(col("c") * col("c")).as("qQ"))
      hourly.join(broadcast(stats), "event_type")
        .withColumn("lhs",
          (col("n") * col("c") - col("sS")) * (col("n") * col("c") - col("sS")))
        .withColumn("rhs",
          lit(9L) * (col("n") * col("qQ") - col("sS") * col("sS")))
        .groupBy(col("event_type"))
        .agg(max(col("n")).as("n_hours"),
          sum(when(col("lhs") > col("rhs"), 1L).otherwise(0L))
            .as("n_anomalous"),
          sum(when(col("lhs") > col("rhs"), col("hr")).otherwise(0L))
            .as("hr_checksum"),
          max(when(col("lhs") > col("rhs"), col("c")).otherwise(lit(null)
            .cast("long"))).as("max_anomalous_count"))
        .orderBy(ascf("event_type"))
    },
    Some("""WITH h AS (SELECT event_type,
           |    epoch_us(ts) // 3600000000 AS hr, count(*) AS c
           |  FROM events GROUP BY event_type, hr),
           |st AS (SELECT event_type, count(*) AS n,
           |    CAST(sum(c) AS BIGINT) AS sS,
           |    CAST(sum(c * c) AS BIGINT) AS qQ
           |  FROM h GROUP BY event_type),
           |z AS (SELECT h.event_type, h.hr, h.c, st.n,
           |    (st.n * h.c - st.sS) * (st.n * h.c - st.sS) AS lhs,
           |    9 * (st.n * st.qQ - st.sS * st.sS) AS rhs
           |  FROM h JOIN st ON h.event_type = st.event_type)
           |SELECT event_type, max(n) AS n_hours,
           |  CAST(sum(CASE WHEN lhs > rhs THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_anomalous,
           |  CAST(sum(CASE WHEN lhs > rhs THEN hr ELSE 0 END) AS BIGINT)
           |    AS hr_checksum,
           |  CAST(max(CASE WHEN lhs > rhs THEN c END) AS BIGINT)
           |    AS max_anomalous_count
           |FROM z GROUP BY event_type
           |ORDER BY event_type ASC NULLS FIRST""".stripMargin))

  /** Incremental JOIN-view maintenance (round 6): q_agg_incremental's
    * algebraic-merge contract extended to a JOIN view — the resident
    * state is revenue-per-nation over orders ⋈ customer for all history
    * (orders before 2001-01-01); the nightly delta (orders on/after) is
    * joined and aggregated ALONE and merged into the resident partials.
    * The identity being graded: because the enrichment dimension is
    * STATIC, the join distributes over the fact union —
    * V(H ∪ Δ) = merge(V(H), V(Δ)) — so the nightly cost is one
    * Δ-sized broadcast join + a key-grain merge, never a history
    * re-join. The oracle recomputes the view DIRECTLY from the whole
    * join, so the hash match grades exactly that maintenance identity
    * (a non-distributive formulation — a median, a distinct-count over
    * raw rows — would fail here). A dimension UPDATE invalidates this
    * identity by design; that path is q_lake_merge's upsert contract.
    *
    * Determinism: o_totalprice enters as floor(·100) int64 cents
    * (identical double multiply then floor on both engines); counts/
    * sums/maxes are the algebraic merge set.
    */
  private val joinIncremental = QueryDef(
    "q_join_incremental",
    (s, d) => {
      val splitUs = 978307200000000L // 2001-01-01 UTC
      val ords = Tables.orders(s, d).select(col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("us"),
        floor(col("o_totalprice") * 100).cast("long").as("v"))
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey").cast("long")
          .as("nation"))
      def view(df: org.apache.spark.sql.DataFrame) =
        df.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .groupBy(col("nation"))
          .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sv"),
            max(col("v")).as("mx"))
      val resident = view(ords.filter(col("us") < splitUs))
      val delta = view(ords.filter(col("us") >= splitUs))
      resident.union(delta)
        .groupBy(col("nation"))
        .agg(sum(col("cnt")).as("n_orders"),
          sum(col("sv")).as("revenue_c2"),
          max(col("mx")).as("max_order_c2"))
        .orderBy(ascf("nation"))
    },
    // the oracle IS the direct whole-history join — grading pins
    // V(H ∪ Δ) == merge(V(H), V(Δ))
    Some("""WITH o AS (SELECT o_custkey,
           |    CAST(floor(o_totalprice * 100) AS BIGINT) AS v
           |  FROM orders),
           |j AS (SELECT CAST(c.c_nationkey AS BIGINT) AS nation, o.v AS v
           |  FROM o JOIN customer c ON o.o_custkey = c.c_custkey)
           |SELECT nation, count(*) AS n_orders,
           |  CAST(sum(v) AS BIGINT) AS revenue_c2,
           |  CAST(max(v) AS BIGINT) AS max_order_c2
           |FROM j GROUP BY nation ORDER BY nation ASC NULLS FIRST""".stripMargin))

  def defs: Seq[QueryDef] = Seq(aggIncremental, tsAnomaly, joinIncremental)
}
