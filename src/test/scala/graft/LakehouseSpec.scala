package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** Round-5 lakehouse / graph / time-series operator tests: the semantic
  * invariants the DuckDB oracle can't see (plan shape, bucket layout on
  * disk) plus merge/fill sanity on the smoke fixtures.
  */
class LakehouseSpec extends SparkSpec {

  test("q_lake_merge: updates replace, inserts add, residents survive") {
    val out = Registry.queries("q_lake_merge")(spark, sfDir).collect()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val total = docs.count()
    // merged rows = residents (updates replace in place) + inserts
    assert(out.map(_.getAs[Long]("n_rows")).sum >
      0, "merge produced no rows")
    val nUpd = out.map(_.getAs[Long]("n_updated")).sum
    val nIns = out.map(_.getAs[Long]("n_inserted")).sum
    assert(out.map(_.getAs[Long]("n_rows")).sum == total + nIns,
      s"row conservation: ${out.map(_.getAs[Long]("n_rows")).sum} != $total + $nIns")
    // the 10% bucket slice is non-empty at every sf, as is the 2% insert
    assert(nUpd > 0 && nIns > 0, s"vacuous merge: upd=$nUpd ins=$nIns")
    // every updated row's n_chars moved by +7: check via total drift
    val baseChars = docs.agg(sum(col("n_chars"))).head.getLong(0)
    val bucket = graft.ops.Sampling.bucket(col("doc_id"))
    val insChars = docs.filter(bucket >= 10 && bucket < 12)
      .agg(sum(col("n_chars"))).head.getLong(0)
    assert(out.map(_.getAs[Long]("sum_chars")).sum ==
      baseChars + insChars + 7 * nUpd, "n_chars drift != +7 per update")
  }

  test("q_join_bucketed: both scans expose bucketing; join has no shuffle") {
    // broadcast off so the bucketed sort-merge path (the 100 TB shape)
    // is what the assertion sees, not a small-fixture broadcast plan
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Registry.queries("q_join_bucketed")(spark, sfDir)
      df.collect()
      def all(p: SparkPlan): Seq[SparkPlan] = {
        val nested = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec => Seq(q.plan)
          case _ => Seq.empty
        }
        Seq(p) ++ (p.children ++ nested).flatMap(all)
      }
      val nodes = all(df.queryExecution.executedPlan)
      val smj = nodes.collect { case j: SortMergeJoinExec => j }
      assert(smj.nonEmpty, "expected a sort-merge join over bucketed scans")
      // the join subtree must contain NO shuffle: bucket layout IS the
      // partitioning. (The post-join groupBy aggregation may shuffle.)
      val joinSubtree = all(smj.head)
      assert(!joinSubtree.exists(_.isInstanceOf[ShuffleExchangeLike]),
        "bucketed join re-shuffled its inputs")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q_win_gapfill: grid covers every hour span; fill is complete") {
    val out = Registry.queries("q_win_gapfill")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val hours = r.getAs[Long]("n_hours")
      val obs = r.getAs[Long]("n_observed")
      val filled = r.getAs[Long]("n_filled")
      assert(hours == obs + filled, s"partition of grid broken: $r")
      assert(obs >= 1, s"user with no observations in grid: $r")
    }
    // the grid genuinely densifies: more hours than raw observed cells
    assert(out.map(_.getAs[Long]("n_hours")).sum >
      out.map(_.getAs[Long]("n_observed")).sum, "gap-fill was vacuous")
  }

  test("q_agg_incremental: partial-merge result equals a direct full agg") {
    val out = Registry.queries("q_agg_incremental")(spark, sfDir)
    // independent full recompute through a DIFFERENT plan (no partials)
    val full = graft.Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("(unix_micros(ts) - pmod(unix_micros(ts), 86400000000)) / 86400000000")
          .cast("long").as("day"),
        floor(col("value") * lit(1000000.0)).cast("long").as("v_e6"))
      .groupBy(col("event_type"))
      .agg(countDistinct(col("day")).as("n_days"),
        count(lit(1)).as("n_events"),
        sum(col("v_e6")).as("sum_v_e6"),
        max(col("v_e6")).as("max_v_e6"))
    assert(out.exceptAll(full).isEmpty && full.exceptAll(out).isEmpty,
      "merge(partial(old), partial(new)) != full recompute")
  }

  test("q_ts_anomaly: anomalies are non-vacuous and bounded by the grid") {
    val out = Registry.queries("q_ts_anomaly")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_anomalous") <= r.getAs[Long]("n_hours"), r.toString)
    }
    assert(out.map(_.getAs[Long]("n_anomalous")).sum > 0,
      "no anomalies anywhere — threshold test is vacuous")
  }

  test("q_graph_pagerank: edge relation is cached, not re-derived per iteration") {
    val df = Registry.queries("q_graph_pagerank")(spark, sfDir)
    try {
      df.collect()
      def all(p: org.apache.spark.sql.execution.SparkPlan):
          Seq[org.apache.spark.sql.execution.SparkPlan] = {
        val nested = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec => Seq(q.plan)
          case _ => Seq.empty
        }
        Seq(p) ++ (p.children ++ nested).flatMap(all)
      }
      val scans = all(df.queryExecution.executedPlan).count(
        _.isInstanceOf[org.apache.spark.sql.execution.columnar.InMemoryTableScanExec])
      // 3 iterations + the final-output path each read the CACHED edge
      // relation; zero InMemoryTableScans means the scoped persist was
      // dropped and every iteration re-aggregates the fact table
      assert(scans >= 3,
        s"expected >= 3 cached-edge scans, got $scans — edges re-derived per iteration")
    } finally Caches.releaseScoped()
  }

  test("q_graph_pagerank: ranks bounded, mass sane, deterministic") {
    val a = Registry.queries("q_graph_pagerank")(spark, sfDir).collect()
    val b = Registry.queries("q_graph_pagerank")(spark, sfDir).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
      "pagerank not run-to-run deterministic")
    val ranks = a.map(_.getAs[Long]("rank_e6"))
    assert(ranks.forall(_ >= 150000L), "rank below teleport floor")
    // total mass can't exceed the initial mass (floors only lose mass)
    assert(ranks.sum <= a.length * 1000000L + a.length * 150000L,
      s"rank mass blew up: ${ranks.sum}")
    // the graph is non-trivial: ranks differentiate across nations
    assert(ranks.distinct.length > 1, "all ranks identical — vacuous graph")
  }

  test("q_graph_bfs matches an independent queue-based BFS on the same edges") {
    val und = ops.Graph.undirectedTop3(spark, sfDir)
      .collect().map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
    val adj = (und ++ und.map(_.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    // classic frontier BFS, capped at 3 hops — a different algorithm
    // than the query's unrolled min-relax joins
    var dist = Map(0L -> 0L)
    var frontier = Set(0L)
    for (h <- 1L to 3L) {
      frontier = frontier.flatMap(adj.getOrElse(_, Set.empty))
        .filterNot(dist.contains)
      dist ++= frontier.map(_ -> h)
    }
    val got = Registry.queries("q_graph_bfs")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nations = spark.read.parquet(s"$sfDir/nation.parquet")
      .select(col("n_nationkey"), col("n_name")).collect()
      .map(r => r.getAs[Number](0).longValue -> r.getString(1)).toMap
    nations.foreach { case (k, name) =>
      assert(got(name) == dist.getOrElse(k, -1L),
        s"node $name: query says ${got(name)}, reference BFS says " +
          s"${dist.getOrElse(k, -1L)}")
    }
    Caches.releaseScoped()
  }

  test("q_graph_triangles matches brute-force enumeration on the same edges") {
    val und = ops.Graph.undirectedTop3(spark, sfDir)
      .collect().map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue)).toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val per = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      a <- nodes; b <- nodes if a < b && und((a, b))
      c <- nodes if b < c && und((b, c)) && und((a, c))
    } { per(a) += 1; per(b) += 1; per(c) += 1 }
    val got = Registry.queries("q_graph_triangles")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nations = spark.read.parquet(s"$sfDir/nation.parquet")
      .select(col("n_nationkey"), col("n_name")).collect()
      .map(r => r.getAs[Number](0).longValue -> r.getString(1)).toMap
    nations.foreach { case (k, name) =>
      assert(got(name) == per(k),
        s"node $name: query says ${got(name)}, brute force says ${per(k)}")
    }
    Caches.releaseScoped()
  }
}
