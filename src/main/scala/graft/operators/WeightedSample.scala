package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextHash, TopKAggregate, VectorExpressions}

/** Weighted sampling WITHOUT replacement, exact k, no float `pow` — the
  * integer-portable equivalent of the Efraimidis–Spirakis / A-ExpJ scheme.
  *
  * ES draws keys `u_i^(1/w_i)` (u uniform) and keeps the k largest; A-ExpJ
  * is its reservoir skip form. Both need float `pow`/`log`, whose last-ulp
  * behavior differs across engines — not oracle-portable. This operator
  * ranks by a different key with the IDENTICAL sampling distribution:
  *
  *   key_i = min over j in 1..w_i of  md5(id_i || "#" || j) % mod
  *
  * i.e. each item runs w_i independent uniform "trials" and keeps its best.
  * Why the ascending order of these keys IS the ES weighted order: with
  * E_ij = -ln(1 - U_ij) ~ Exp(1), monotonicity gives
  * `min_j U_ij = 1 - exp(-min_j E_ij)`, and `min_j E_ij ~ Exp(w_i)` — so
  * ranking by key ascending is the exponential race, the textbook
  * equivalent of ES (P(item i wins) = w_i / Σw, then recursively on the
  * rest — the without-replacement PPS draw). The transform `1 - e^{-x}` is
  * the same strictly increasing map for EVERY item, so the integer keys
  * realize the exact joint order distribution with pure md5 arithmetic,
  * replayable bit-for-bit in DuckDB (`list_min` over `range`).
  *
  * Scale shape: the key is one map-side codegen'd expression (O(w) digests
  * per row — weights must be SMALL integers; quantize large weights, the
  * resolution loss is the documented trade), and selection is the bounded
  * [[graft.functions.TopKByScore]] aggregate — the shuffle carries k rows
  * per partition, never the corpus. `mod = 2^40` keeps keys exact in the
  * aggregate's double score (q56 precedent) while leaving collisions
  * negligible (birthday bound ~n²/2^41) and tie-broken by id.
  */
object WeightedSample {

  /** 2^40 — key domain; exact in a double, collision-safe at driver scales. */
  val Mod: Long = 1L << 40

  /** The race key (see object doc). `weight` must be integral ≥ 1 (values
    * < 1 clamp to 1; fractional weights must be quantized by the caller). */
  def raceKey(id: Column, weight: Column): Column =
    VectorExpressions.minTrialHash(id.cast("string"), weight.cast("long"), Mod)

  /** DuckDB replay of [[raceKey]] — lockstep md5 trials, `range` end is
    * exclusive so `1..w`, `greatest` mirrors the clamp. */
  def raceKeySql(id: String, weight: String): String = {
    val h = TextHash.md5LongSql(s"($id || '#' || j::VARCHAR)")
    s"list_min(list_transform(range(1, greatest($weight, 1) + 1), j -> ($h % $Mod)))"
  }

  /** Exact-k weighted sample: the k items with the smallest race keys
    * (ties by id ascending). Output `(id, weight, rank)`, rank 1 = first
    * drawn. One scan + one bounded aggregate; the weight column rides the
    * payload join-back (k rows, broadcast). */
  def sampleK(df: DataFrame, idCol: String, weightCol: String, k: Int): DataFrame = {
    val keyed = df.select(col(idCol).as("id"),
      raceKey(col(idCol), col(weightCol)).as("rk"))
    val top = keyed
      .agg(TopKAggregate.topK((-col("rk")).cast("double"), col("id"), k).as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("t.payload").as("id"), (col("pos") + 1).cast("int").as("rank"))
    // weight join-back reads the raw columns only — no key recompute
    broadcast(top).join(
        df.select(col(idCol).as("id"), col(weightCol).cast("long").as("weight")), Seq("id"))
      .select(col("id"), col("weight"), col("rank"))
  }
}
