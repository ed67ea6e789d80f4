package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-pinned loaders for the driver-generated parquet tables
  * (schemas in FIXTURES.md). Owns the events ns→µs normalization
  * (SURVEY.md §1.3) so no query can forget it.
  *
  * At 100 TB these reads become partition-pruned lake scans; keeping every
  * scan behind one loader is what lets us later swap in bucketing /
  * partition layout without touching the 67 query definitions.
  */
object Tables {
  private def p(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = p(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = p(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = p(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = p(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = p(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = p(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = p(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = p(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = p(s, d, "embeddings")

  /** events.ts is parquet timestamp[ns], which stock Spark 4.x refuses to
    * read ([PARQUET_TYPE_ILLEGAL]). Read it as raw long ns via the legacy
    * conf (runtime-settable — verified) and truncate to µs; verified
    * byte-equal to DuckDB's epoch_us on the same rows (SURVEY.md §1.3).
    * The conf must be set here because the driver-owned harness builds the
    * session without it and query functions only receive (spark, sfDir).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    p(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
