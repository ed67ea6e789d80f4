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
  * Seq(key), "inner")` — RuntimeSpec asserts equality with the plain
  * join. Any salt assignment is correct (the join still requires key
  * equality; the right side carries every salt, so each left row matches
  * exactly its key's rows once) — the hash spread only balances tasks.
  */
object SaltedJoin {

  def inner(left: DataFrame, right: DataFrame, key: String,
      salts: Int = 8): DataFrame = {
    // helper columns are namespaced and checked (ADVICE r3: bare-name
    // output resolution threw on any non-key column name shared between
    // the two sides, and __lsalt/__rsalt could collide with user columns)
    val (saltL, saltR) = ("__graft_salt_l", "__graft_salt_r")
    require(!(left.columns ++ right.columns).exists(Set(saltL, saltR)),
      s"input columns may not use the reserved names $saltL/$saltR")
    val salted = left.alias("l").withColumn(saltL,
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
    val replicated = right.alias("r")
      .withColumn(saltR, explode(sequence(lit(0L), lit(salts - 1L))))
    salted.join(replicated,
        col(s"l.$key") === col(s"r.$key") && col(saltL) === col(saltR),
        "inner")
      .select(left.columns.map(c => col(s"l.$c")) ++
        right.columns.filterNot(_ == key).map(c => col(s"r.$c")): _*)
  }
}
