package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}

/** Cross-engine-deterministic decimal rounding.
  *
  * The engines' `round()` DISAGREE when a double lands exactly on a .5
  * decimal boundary: Spark rounds the shortest-decimal string
  * (`BigDecimal.valueOf`), DuckDB rounds the binary value — 0.5075 splits
  * into 0.508 vs 0.507 (observed at sf0.1, 2 of 91 queries). For any
  * value computed by the SAME scalar formula on both engines (divisions,
  * products, sqrt — all correctly-rounded IEEE ops), the pre-round double
  * is bit-identical, so `floor(x·10^k + 0.5)/10^k` — floor and IEEE
  * multiply/divide being exact on both engines — cannot split.
  *
  * NOT a fix for float AGGREGATES (sum/avg of doubles): there the inputs
  * to the round already differ by summation-order ulps; exact integer
  * accumulation (cents/micro units) is the remedy for those.
  */
object PortableMath {

  def roundPortable(c: Column, k: Int): Column = {
    val p = math.pow(10, k)
    floor(c * lit(p) + 0.5) / lit(p)
  }

  def roundPortableSql(e: String, k: Int): String = {
    val p = math.pow(10, k).toLong
    s"(floor(($e) * $p + 0.5) / $p)"
  }

  /** Integer MILLI-LOG2 of a positive int64: `1000·floor(log2 x)` from the
    * binary-string length plus a linearly interpolated fractional part —
    * `(x − 2^e)·1000 div 2^e`. Pure int64 ops on both engines (`bin()`
    * string length, shifts, floor division of non-negatives), so unlike
    * IEEE `ln`/`log2` the result is hash-exact cross-engine. Monotone in
    * x, within ~0.086 bits of true log2 — the right primitive wherever a
    * RATIO of probabilities feeds a ranking (importance weights,
    * surprisal) and the gate must check scores bit-for-bit.
    *
    * Domain: 1 ≤ x < 2^43 (the `(x − 2^e)·1000` intermediate must stay
    * double-exact for the final exact division). Counts always qualify.
    */
  def mlog2(c: Column): Column = {
    import org.apache.spark.sql.functions.{bin, call_function, length}
    val x = c.cast("long")
    val e = (length(bin(x)) - 1).cast("int")
    val pw = call_function("shiftleft", lit(1L), e)
    val rem = (x - pw) * lit(1000L)
    // (rem - rem % pw) is exactly divisible by pw -> the double division is
    // exact (quotient < 1000, dividend < 2^53 over the documented domain).
    e.cast("long") * lit(1000L) + ((rem - (rem % pw)) / pw).cast("long")
  }

  /** DuckDB lockstep of [[mlog2]]. `x` is re-evaluated several times —
    * pass a simple column reference or cheap arithmetic, never a subquery. */
  def mlog2Sql(x: String): String = {
    val xb = s"(($x)::BIGINT)"
    val e = s"(length(bin($xb)) - 1)"
    val pw = s"(1::BIGINT << $e)"
    s"(1000 * $e + (($xb - $pw) * 1000) // $pw)"
  }

  /** Column form of [[graft.operators.KMeansIVF.roundHalfAway]]: integer
    * micro-units rounding half AWAY FROM ZERO, matching DuckDB's
    * std::round-based `CAST(round(x * 1000000) AS BIGINT)` exactly. NOT
    * `floor(y + 0.5)`: that addition itself rounds (0.49999999999999994 +
    * 0.5 == 1.0), diverging half-ulp below each boundary; `y − floor(y)` /
    * `ceil(y) − y` are exact (operands within 2×, Sterbenz). */
  def microHalfAway(c: Column): Column = {
    import org.apache.spark.sql.functions.{ceil, when}
    val y = c * lit(1000000L)
    when(y >= 0,
      when(y - floor(y) >= 0.5, floor(y) + 1).otherwise(floor(y)))
      .otherwise(
        when(ceil(y) - y >= 0.5, ceil(y) - 1).otherwise(ceil(y)))
      .cast("long")
  }
}
