package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resistant equi-join (SURVEY.md §7.5): when one join key carries
  * a disproportionate share of rows, a plain shuffle join sends the
  * whole hot key to one task. Salting splits the hot side's key into
  * `salts` sub-keys and replicates the other side once per salt, so the
  * hot key spreads across `salts` tasks.
  *
  * AQE's skew-join splitting handles many cases at runtime; this helper
  * is the explicit fallback for keys skewed beyond what AQE rebalances
  * (or when AQE is off). Semantics are exactly `left.join(right,
  * Seq(key), "inner")` — SaltedJoinSpec asserts equality with the plain
  * join. Any salt assignment is correct (the join still requires key
  * equality; the right side carries every salt, so each left row matches
  * exactly its key's rows once) — the hash spread only balances tasks.
  */
object SaltedJoin {

  def inner(left: DataFrame, right: DataFrame, key: String,
      salts: Int = 8): DataFrame = {
    val rightCols = right.columns.filterNot(_ == key)
    val salted = left.withColumn("__lsalt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
    val replicated = right
      .withColumnRenamed(key, "__rkey")
      .withColumn("__rsalt", explode(sequence(lit(0L), lit(salts - 1L))))
    salted.join(replicated,
        col(key) === col("__rkey") && col("__lsalt") === col("__rsalt"),
        "inner")
      .select(left.columns.map(col) ++ rightCols.map(col): _*)
  }
}
