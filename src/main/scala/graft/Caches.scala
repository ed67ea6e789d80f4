package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Cache lifecycle for operator internals (VERDICT r4 #1).
  *
  * Operators persist intermediates that several branches of ONE query
  * consume (signature tables, set-group relations). Left resident, those
  * persists accumulate across a 100+-query session until memory pressure
  * makes the "warm" pass slower than the cold one — the r4 bench
  * inversion (108.9 s warm vs 85.5 s cold). Two lifetimes fix it:
  *
  *  - `scoped(df)`: a within-query intermediate. The harness (Bench,
  *    Verify, JobServer) calls `releaseScoped()` the moment a query
  *    finishes, so nothing leaks into the next query's memory budget.
  *  - `shared(key)(build)`: a session-lifetime relation reused by SEVERAL
  *    contract queries (SURVEY.md §7.5 recurring-workload reuse — e.g.
  *    the exact-Jaccard pair graph feeds q_sim_jaccard_pairs,
  *    q_text_levenshtein and q_dedup_components). Computed once per
  *    (session, input dir), MEMORY_AND_DISK so a 100 TB run spills
  *    instead of evicting, released by `releaseShared()` at session end
  *    (or between cold-pass queries, where reuse must not flatter the
  *    per-query numbers).
  *
  * Unpersisting is always correctness-neutral in Spark — a released
  * relation silently recomputes — so the worst failure mode here is
  * wasted time, never a wrong result.
  */
object Caches {

  // keyed by builder thread: a query builds (and its harness releases)
  // on one thread, so per-thread scoping makes releaseScoped() release
  // exactly the finishing query's persists. A single global list meant
  // any concurrently-finishing JobServer job released EVERY in-flight
  // job's scoped caches (review r5) — correctness-neutral but paying
  // the recompute the persist exists to avoid, on every overlap.
  private val scopedLive = scala.collection.mutable
    .HashMap.empty[Long, scala.collection.mutable.ArrayBuffer[DataFrame]]

  /** Persist a within-query intermediate; freed by the `releaseScoped()`
    * that runs on this thread when the query finishes.
    */
  def scoped(df: DataFrame): DataFrame = synchronized {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    scopedLive.getOrElseUpdate(Thread.currentThread().getId,
      scala.collection.mutable.ArrayBuffer.empty) += df
    df
  }

  /** Release the CURRENT thread's scoped persists. */
  def releaseScoped(): Unit = synchronized {
    scopedLive.remove(Thread.currentThread().getId).foreach(_.foreach(df =>
      try df.unpersist(blocking = false)
      catch { case scala.util.control.NonFatal(_) => }))
  }

  /** Release every thread's scoped persists — session teardown only. */
  def releaseScopedAll(): Unit = synchronized {
    scopedLive.valuesIterator.foreach(_.foreach(df =>
      try df.unpersist(blocking = false)
      catch { case scala.util.control.NonFatal(_) => }))
    scopedLive.clear()
  }

  private val sharedLive = scala.collection.mutable.HashMap.empty[String, DataFrame]

  /** Memoized session-lifetime relation. Callers key by everything the
    * plan depends on (query family + session identity + input dir) so a
    * test session and a bench session can never cross-serve.
    */
  def shared(key: String)(build: => DataFrame): DataFrame = synchronized {
    sharedLive.getOrElseUpdate(key, {
      val df = build
      df.persist(StorageLevel.MEMORY_AND_DISK)
      df
    })
  }

  /** Stable per-session cache-key prefix: the Spark application id (one
    * per SparkContext) — NOT System.identityHashCode, which can collide
    * across a stopped-and-recreated session and hand a later session a
    * DataFrame bound to a dead context (review r5).
    */
  def sessionKey(s: org.apache.spark.sql.SparkSession): String =
    s"${s.sparkContext.applicationId}:${s.sparkContext.startTime}"

  def releaseShared(): Unit = synchronized {
    sharedLive.values.foreach(df =>
      try df.unpersist(blocking = false)
      catch { case scala.util.control.NonFatal(_) => })
    sharedLive.clear()
  }
}
