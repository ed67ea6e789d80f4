package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic cross-engine `ln` for INTEGER inputs (ADVICE r4 on
  * q_text_tfidf): `round(ln(nd/df)·1e6)` through two different libm
  * implementations can differ by one ulp near a 0.5·1e-6 quantization
  * boundary and flip a ranking. This replaces the library `ln` with a
  * construction both engines evaluate BIT-IDENTICALLY, because it uses
  * only operations IEEE 754 fully determines (integer compares, and
  * correctly-rounded double +, −, ×, ÷):
  *
  *   1. range-reduce n = 2^k · m with k = bitlength(n) − 1 (exact
  *      integer, via the length of the binary-digit string — `bin()` in
  *      Spark, `printf('%b')` in DuckDB; a 62-branch CASE ladder gave
  *      the same k but broke whole-stage codegen and tripled the tfidf
  *      bench time) and m = n / 2^k ∈ [1, 2) — an EXACT double division
  *      by a power of two (2^k via integer shift, never `pow`);
  *   2. z = (m−1)/(m+1) ∈ [0, 1/3); ln(m) = 2·atanh(z) by a FIXED
  *      16-term Horner series (truncation error < 1e-16 relative — and
  *      truncation is identical on both engines, so it cannot drift);
  *   3. ln(n) = k·LN2 + 2·z·h with LN2 the nearest-double literal.
  *
  * The Spark `Column` tree and the DuckDB SQL are generated from the
  * same coefficient loop below, so the operation ORDER — the only
  * remaining degree of freedom IEEE 754 leaves — is pinned equal by
  * construction. FunctionsSpec checks the column agrees with a scalar
  * Scala replica bit-for-bit and with `Math.log` to < 1e-14 relative.
  *
  * `idf = ln(nd) − ln(df)` then quantizes to the same BIGINT on both
  * engines for EVERY input, not just away from boundaries.
  */
object DetMath {

  private val Ln2 = "0.6931471805599453" // nearest double to ln 2
  /** Odd reciprocals 31, 29, …, 1 — Horner from the smallest term. */
  private val HornerDenoms: Seq[Int] = 31 to 1 by -2

  // ---- Spark side -------------------------------------------------------

  /** Deterministic ln(n) as a Column, for an integer column n ≥ 1. */
  def lnInt(n: Column): Column = {
    val k = length(bin(n)) - lit(1) // floor(log2 n), exact int
    val p2 = call_function("shiftleft", lit(1L), k) // 2^k, exact long
    val m = n.cast("double") / p2.cast("double")
    val z = (m - lit(1.0)) / (m + lit(1.0))
    val z2 = z * z
    var h: Column = lit(1.0) / lit(HornerDenoms.head.toDouble)
    for (dnm <- HornerDenoms.tail)
      h = lit(1.0) / lit(dnm.toDouble) + z2 * h
    k.cast("double") * lit(Ln2.toDouble) + lit(2.0) * z * h
  }

  // ---- DuckDB side (same structure, staged through named columns so the
  // SQL stays linear-size — callers splice these into chained CTEs) ------

  /** floor(log2(e)) as BIGINT: binary-digit-string length − 1. */
  def kSql(e: String): String =
    s"(CAST(length(printf('%b', $e)) AS BIGINT) - 1)"

  /** Exact mantissa from (value, staged-k columns): e / 2^k. */
  def mSql(e: String, k: String): String =
    s"(CAST($e AS DOUBLE) / CAST((CAST(1 AS BIGINT) << $k) AS DOUBLE))"

  /** z from a mantissa column m: (m−1)/(m+1), doubles throughout (bare
    * `1.0` would be DECIMAL in DuckDB and change the arithmetic).
    */
  def zSql(m: String): String =
    s"(($m - CAST(1 AS DOUBLE)) / ($m + CAST(1 AS DOUBLE)))"

  /** Horner series in a named z2 column — linear size, same coefficient
    * order as the Column builder.
    */
  def hornerSql(z2: String): String =
    HornerDenoms.tail.foldLeft(
      s"(CAST(1 AS DOUBLE) / CAST(${HornerDenoms.head} AS DOUBLE))") {
      (acc, dnm) =>
        s"(CAST(1 AS DOUBLE) / CAST($dnm AS DOUBLE) + $z2 * $acc)"
    }

  /** ln(n) from staged k/z/h columns: k·LN2 + 2·z·h. */
  def lnSql(k: String, z: String, h: String): String =
    s"($k * CAST('$Ln2' AS DOUBLE) + CAST(2 AS DOUBLE) * $z * $h)"

  // ---- scalar replica (tests pin the Column tree to this, bit-exact) ---

  def lnIntScalar(n: Long): Double = {
    require(n >= 1)
    val k = 63 - java.lang.Long.numberOfLeadingZeros(n)
    val m = n.toDouble / (1L << k).toDouble
    val z = (m - 1.0) / (m + 1.0)
    val z2 = z * z
    var h = 1.0 / HornerDenoms.head
    for (dnm <- HornerDenoms.tail) h = 1.0 / dnm + z2 * h
    k * Ln2.toDouble + 2.0 * z * h
  }
}
