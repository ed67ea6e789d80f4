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
}
