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

  /** events.ts has shipped in two physical forms across fixture
    * generations: parquet timestamp[ns] (rounds 1–4), which stock Spark 4.x
    * refuses to read ([PARQUET_TYPE_ILLEGAL]) and must come in as raw long
    * ns via the legacy conf + µs truncation, and parquet timestamp[us]
    * (round-5 regeneration), which reads natively as TIMESTAMP_NTZ. The
    * loader adapts to whichever is on disk and always emits a µs TIMESTAMP
    * column: the NTZ→TIMESTAMP cast is value-preserving under the UTC
    * session TZ (pinned here, runtime-settable — verified), matching
    * DuckDB's naive epoch_us on the same rows (SURVEY.md §1.3).
    * The confs must be set here because the driver-owned harness builds the
    * session without them and query functions only receive (spark, sfDir).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The NTZ→TIMESTAMP cast below is value-preserving ONLY under a UTC
    // session TZ. This used to be enforced by silently setting the conf
    // here — a load-time side effect that rewrote timestamp rendering
    // for a library consumer's WHOLE session (ADVICE r6). Every graft
    // entry point (Bench, Verify, JobServer.main, SparkSpec) pins UTC at
    // session construction; a consumer who hasn't gets a loud
    // misconfiguration error instead of a mutated session.
    val tz = s.conf.get("spark.sql.session.timeZone")
    require(tz == "UTC" || tz == "Etc/UTC",
      s"graft.Tables.events requires spark.sql.session.timeZone=UTC " +
        s"(found '$tz'): set it at SparkSession construction; the events " +
        s"ts column is naive-UTC and any other zone shifts every instant")
    val raw = p(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
}
