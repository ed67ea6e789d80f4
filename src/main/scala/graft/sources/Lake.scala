package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partition-pruned lake layout (SURVEY.md §7.5): the write/read pair a
  * 100 TB deployment uses instead of the flat per-table files the test
  * fixtures ship.
  *
  * Writing date-partitioned parquet (`partitionBy`) turns time-range
  * predicates into PARTITION PRUNING — the scan lists only matching
  * directories, so a one-day query over a 3-year lake touches ~0.1% of
  * files before a single row is read. RuntimeSpec asserts the executed scan
  * carries PartitionFilters and reads only the matching partition.
  */
object Lake {

  /** Write `df` date-partitioned on the given timestamp column. */
  def writeDatePartitioned(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("p_date", to_date(col(tsCol)))
      .write.mode("overwrite")
      .partitionBy("p_date")
      .parquet(path)

  /** Read back with a date predicate that prunes at the partition level. */
  def readDay(spark: SparkSession, path: String, day: String): DataFrame =
    spark.read.parquet(path).filter(col("p_date") === lit(day).cast("date"))

  /** Small-file compaction — the maintenance job every streaming-fed lake
    * needs: micro-batch sinks leave one file per (trigger × partition),
    * and a year of 1-minute triggers is ~500k files per partition — list
    * + open overhead starts to dominate scans long before data volume
    * does. Rewrites the lake so each `p_date` partition holds ONE file
    * (hash-repartition on p_date routes every date to exactly one of
    * `parallelism` write tasks; raise `parallelism` for write
    * concurrency across dates — it never splits a date). Stages into a
    * sibling directory then swaps — atomic enough for a single-writer
    * lake (write staged → move old → move staged → delete old).
    * Returns (files_before, files_after). Content is preserved
    * row-for-row (RuntimeSpec round-trips a checksum through it);
    * readers see the same rows, partition pruning is untouched because
    * the layout column is re-derived from the directory structure.
    * A date too big for one file is the signal to partition finer
    * (hour grain), not to split files — pruning granularity is the
    * point of the layout.
    */
  def compact(spark: SparkSession, path: String,
      parallelism: Int = 8): (Long, Long) = {
    def dataFiles(p: java.io.File): Seq[java.io.File] = {
      val kids = Option(p.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      kids.filter(_.isFile).filter(_.getName.endsWith(".parquet")) ++
        kids.filter(_.isDirectory).flatMap(dataFiles)
    }
    val root = new java.io.File(path)
    val before = dataFiles(root).size.toLong
    val staged = path.stripSuffix("/") + "__compacting"
    spark.read.parquet(path)
      .repartition(parallelism, col("p_date"))
      .write.mode("overwrite").partitionBy("p_date").parquet(staged)
    val old = new java.io.File(path.stripSuffix("/") + "__old")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    // a crashed earlier compaction may have left __old behind; clear it
    // or the rename below fails forever (review r5 — the upsert sink
    // had this guard, compact was missing it)
    rm(old)
    require(root.renameTo(old), s"compact: could not stage out $path")
    require(new java.io.File(staged).renameTo(root),
      s"compact: could not swap in $staged (old layout kept at $old)")
    rm(old)
    (before, dataFiles(root).size.toLong)
  }
}
