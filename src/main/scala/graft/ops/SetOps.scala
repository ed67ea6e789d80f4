package graft.ops

import graft.{QueryDef, Tables}
import graft.Dsl._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Set operations (SURVEY.md §2.8) over two overlapping customer slices.
  *
  * Spark's intersect/except are DISTINCT semantics, matching SQL
  * INTERSECT/EXCEPT; union is bag semantics, matching UNION ALL.
  * Physically these are hash-aggregates/joins on the full row — they
  * shuffle once on all columns, so at scale keep the projected column
  * set narrow (done here: two columns).
  */
object SetOps {

  private def sliceA(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_name"))

  private def sliceB(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).filter(col("c_acctbal") > 5000)
      .select(col("c_custkey"), col("c_name"))

  private val sqlA = "SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'"
  private val sqlB = "SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000"

  private val unionAll = QueryDef(
    "q_union_all",
    (s, d) => sliceA(s, d).unionAll(sliceB(s, d))
      .orderBy(ascf("c_custkey"), ascf("c_name")),
    Some(s"""($sqlA) UNION ALL ($sqlB)
            |ORDER BY c_custkey ASC NULLS FIRST, c_name ASC NULLS FIRST""".stripMargin))

  private val unionDistinct = QueryDef(
    "q_union_distinct",
    (s, d) => sliceA(s, d).union(sliceB(s, d)).distinct()
      .orderBy(ascf("c_custkey"), ascf("c_name")),
    Some(s"""($sqlA) UNION ($sqlB)
            |ORDER BY c_custkey ASC NULLS FIRST, c_name ASC NULLS FIRST""".stripMargin))

  private val intersect = QueryDef(
    "q_intersect",
    (s, d) => sliceA(s, d).intersect(sliceB(s, d))
      .orderBy(ascf("c_custkey"), ascf("c_name")),
    Some(s"""($sqlA) INTERSECT ($sqlB)
            |ORDER BY c_custkey ASC NULLS FIRST, c_name ASC NULLS FIRST""".stripMargin))

  private val except = QueryDef(
    "q_except",
    (s, d) => sliceA(s, d).except(sliceB(s, d))
      .orderBy(ascf("c_custkey"), ascf("c_name")),
    Some(s"""($sqlA) EXCEPT ($sqlB)
            |ORDER BY c_custkey ASC NULLS FIRST, c_name ASC NULLS FIRST""".stripMargin))

  def defs: Seq[QueryDef] = Seq(unionAll, unionDistinct, intersect, except)
}
