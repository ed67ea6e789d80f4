package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared exact-arithmetic vector helpers (rule D3, SURVEY.md §2.12):
  * embeddings quantize to 1e-6-resolution BIGINT so dot products and
  * norms are EXACT int64 sums — order-independent under parallel
  * aggregation and bit-identical across engines. Only the final cosine
  * (two exact ints through sqrt/divide) is double, and the oracle spells
  * out the identical formula.
  */
private[ops] object VecOps {

  /** Quantize a float column to exact 1e-6-resolution BIGINT. */
  def e6(c: Column): Column = round(c.cast("double") * 1000000, 0).cast("long")

  /** embeddings with v = quantized vector, nn = exact int self-dot. */
  def quantized(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => e6(x)).as("v"))
      .withColumn("nn", dot(col("v"), col("v")))

  /** Exact int64 dot product of two quantized vectors — the native
    * codegen'd expression (ascending-index summation, bit-identical to
    * the aggregate/zip_with HOF formulation it replaced).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotLongArrays.of(a, b)

  /** cosine from exact int dot/norms — identical formula in the oracle. */
  def cosine(dotc: Column, na: Column, nb: Column): Column =
    dotc.cast("double") / (sqrt(na.cast("double")) * sqrt(nb.cast("double")))

  /** DuckDB CTE mirroring `quantized` — prepend to vector oracles. */
  val oracleQuantized: String =
    """WITH e AS (SELECT vec_id, label,
      |  list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000000, 0) AS BIGINT)) AS v
      |  FROM embeddings),
      |n AS (SELECT vec_id, label, v,
      |  CAST(list_sum(list_transform(v, x -> x*x)) AS BIGINT) AS nn FROM e)""".stripMargin

  /** DuckDB exact int dot product of rows `a`/`b` from the `n` CTE. */
  def oracleDot(a: String, b: String): String =
    s"CAST(list_sum(list_transform(range(1, 65), k -> $a.v[k] * $b.v[k])) AS DOUBLE)"

  def oracleCosine(a: String, b: String): String =
    s"${oracleDot(a, b)} / (sqrt(CAST($a.nn AS DOUBLE)) * sqrt(CAST($b.nn AS DOUBLE)))"
}
