package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Sort, UnaryNode}

/** Harness conformance (SURVEY.md §5.6): the contract maps are
  * structurally sound and every query obeys determinism rule D1.
  */
class RegistrySpec extends SparkSpec {

  test("every oracleSql key has a queries entry") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle-only keys: ${o.diff(q)}")
  }

  test("registry has no duplicate names and covers all op families") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size)
    val families = Seq("q_scan_", "q_filter_", "q_join_", "q_subq_", "q_agg_",
      "q_win_", "q_sort_", "q_union_", "q_fn_", "q_arr_", "q_map_", "q_text_",
      "q_dedup_", "q_sim_", "q_mm_", "q_stream_", "q_ud")
    families.foreach { f =>
      assert(names.exists(_.startsWith(f)), s"no queries in family $f")
    }
  }

  test("every query's plan ends in an explicit total order (rule D1)") {
    // single-row global aggregates need no order; limits sit above sorts
    val exemptSingleRow = Set("q_agg_global")
    val passThrough = Set("GlobalLimit", "LocalLimit", "Offset", "Project")
    @annotation.tailrec
    def strip(p: LogicalPlan): LogicalPlan = p match {
      case u: UnaryNode if passThrough.contains(u.nodeName) => strip(u.child)
      case other => other
    }
    Registry.all.filterNot(q => exemptSingleRow.contains(q.name)).foreach { q =>
      val top = strip(q.build(spark, sfDir).queryExecution.analyzed)
      assert(top.isInstanceOf[Sort], s"${q.name}: top operator is " +
        s"${top.getClass.getSimpleName}, expected Sort")
    }
    exemptSingleRow.foreach { n =>
      val plan = Registry.all.find(_.name == n).get
        .build(spark, sfDir).queryExecution.analyzed
      val agg = plan.collectFirst { case a: Aggregate => a }
      assert(agg.exists(_.groupingExpressions.isEmpty),
        s"$n exempt from D1 only as a global aggregate")
    }
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
