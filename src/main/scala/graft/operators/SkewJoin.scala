package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A shuffled equi-join sends every row of a key to one reducer; a heavy key
  * (celebrity user, null-ish default, hot document cluster) turns into one
  * straggler task that dominates the stage at scale. Salting splits each
  * left-side key into `saltFactor` sub-keys and replicates the (smaller)
  * right side once per salt, so the heavy key's rows spread across
  * `saltFactor` tasks. For the supported join types (inner/left/semi/anti —
  * enforced below) the result is EXACTLY the plain join: each left row
  * matches exactly the right replica carrying its salt. Right/full-outer
  * are rejected because their unmatched right rows would surface once per
  * replica.
  *
  * Cost model: right side is materialized `saltFactor`× — use on joins where
  * the right side is much smaller than the skewed left side but too big to
  * broadcast outright. For broadcast-able right sides, `broadcast()` already
  * avoids the skew; AQE's skew-join splitting handles moderate cases —
  * salting is the deterministic heavy-artillery option.
  */
object SkewJoin {

  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    // Only salt-safe join types: the right side is replicated saltFactor
    // times, so any type that can emit UNMATCHED right rows ("right",
    // "full_outer", "right_semi", ...) would surface each of them
    // saltFactor times — no longer "exactly the plain join".
    val saltSafe = Set("inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti")
    require(saltSafe.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left/semi/anti join types only, got '$joinType' " +
        "(unmatched right rows would be duplicated saltFactor times)")
    // any deterministic per-row value works for correctness; hashing the
    // whole row spreads a heavy key's rows across salts
    val saltedLeft = left.withColumn(
      "__salt", pmod(hash(left.columns.map(col): _*), lit(saltFactor)))
    val saltedRight = right.withColumn(
      "__salt", explode(array((0 until saltFactor).map(lit): _*)))
    saltedLeft
      .join(saltedRight,
        saltedLeft(leftKey) === saltedRight(rightKey) &&
          saltedLeft("__salt") === saltedRight("__salt"),
        joinType)
      .drop("__salt")
  }
}
