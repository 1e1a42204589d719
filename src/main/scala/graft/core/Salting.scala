package graft.core

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Skew-guarded equi-join (SURVEY.md §4 scale notes): when one join key
  * carries a disproportionate share of the big side, the shuffle sends
  * that whole key to ONE reducer and the stage runs at the speed of its
  * hottest partition. Salting splits each key into `salts` sub-keys:
  * the big side tags every row with a salt in [0, salts), the small
  * side is exploded `salts`× so every (key, salt) combination exists,
  * and the join runs on (key, salt) — the hot key's rows spread across
  * `salts` reducers.
  *
  * Exactness: each big row keeps exactly one salt and meets exactly the
  * small rows carrying its key (whatever the salt value), so the output
  * multiset equals the unsalted join for ANY salt assignment — which is
  * why a nondeterministic-under-retry salt source is safe here. AQE's
  * skew-join handles sort-merge skew adaptively at runtime; this is the
  * explicit form for when the skew is known up front, the join feeds a
  * custom operator, or AQE is unavailable.
  */
object Salting {

  /** Inner/left equi-join of `big` with `small` on `key`, salted
    * `salts` ways. `small` is replicated `salts`× — keep it dimension-
    * sized. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    val b = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    b.join(s, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Salt only the LISTED hot keys (from a skew probe or prior runs):
    * everything else joins unsalted — the small side replicates only
    * for the hot keys instead of `salts`× its full size. */
  def saltedJoinHotKeys(big: DataFrame, small: DataFrame, key: String,
      hotKeys: Seq[Any], salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    val isHot: Column => Column = c => c.isInCollection(hotKeys)
    val b = big.withColumn("__salt",
      when(isHot(col(key)),
        pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
        .otherwise(lit(0L)))
    val s = small.withColumn("__salt",
      explode(when(isHot(col(key)),
        sequence(lit(0L), lit(salts.toLong - 1)))
        .otherwise(array(lit(0L)))))
    b.join(s, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
