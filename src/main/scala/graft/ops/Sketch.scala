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

  def defs: Seq[QueryDef] = Seq(countmin)
}
