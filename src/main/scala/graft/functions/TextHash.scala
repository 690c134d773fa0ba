package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable deterministic text hashing and shingling.
  *
  * Every primitive here exists in TWO lockstep forms: a Spark `Column`
  * expression and a DuckDB SQL fragment generator. The pair lets LSH-style
  * operators (MinHash, SimHash, fingerprints) ship with a full DuckDB oracle
  * that replicates the exact pipeline — the correctness gate then validates
  * the whole probabilistic chain, not just row counts.
  *
  * The base hash is the first 15 hex chars (60 bits, always positive) of
  * md5 — md5 is bit-identical everywhere, unlike murmur/xxhash whose seeds
  * differ across engines. All built-ins, fully codegen'd; no UDFs.
  */
object TextHash {

  /** Modulus for MinHash permutations: 2^31 - 1 (Mersenne prime). Keeping
    * hashes < 2^31 means `a*h + b` stays < 2^62 — no 64-bit overflow on
    * either engine. */
  val P: Long = 2147483647L

  /** Fixed affine-permutation constants (nonzero mod P, deterministic). */
  def permA(i: Int): Long = (2654435761L * (i + 1) + 1) % P
  def permB(i: Int): Long = (40503L * (i + 1) * (i + 7) + 97L) % P

  /** KMV sketch hash domain: 2^53 — every hash is double-exact (usable as
    * a TopKByScore score) and (k−1)·M stays in int64 for k ≤ 1024. THE
    * single source of truth for every KMV consumer (q143/q151/q207/q234,
    * StreamingDistinctWindows): the Spark and DuckDB forms below MUST stay
    * lockstep, and estimator constants must derive from this M. */
  val KmvM: Long = 9007199254740992L

  /** The KMV id hash: salted md5, reduced mod [[KmvM]]. */
  def kmvHash(id: Column): Column =
    pmod(md5Long(concat(lit("kmv:"), id.cast("string"))), lit(KmvM))

  /** DuckDB lockstep of [[kmvHash]] (md5Long is 60-bit non-negative, so
    * plain `%` equals `pmod`). */
  def kmvHashSql(e: String): String =
    s"(${md5LongSql(s"'kmv:' || ($e)::VARCHAR")} % $KmvM)"

  // --- 60-bit md5 base hash -------------------------------------------------

  /** Native codegen'd digest path (see [[Md5Long]]); value-identical to the
    * portable formulation `conv(substring(md5(x),1,15),16,10)`. */
  def md5Long(c: Column): Column = VectorExpressions.md5Long(c)

  /** The pure-built-in formulation (kept as the reference semantics and for
    * cross-checking the native expression in tests). */
  def md5LongBuiltins(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  def md5LongSql(e: String): String =
    s"(('0x' || substr(md5($e), 1, 15))::BIGINT)"

  /** Base hash reduced mod P (input to the MinHash permutations). */
  def baseHash(c: Column): Column = md5Long(c) % P
  def baseHashSql(e: String): String = s"(${md5LongSql(e)} % $P)"

  /** i-th affine permutation of an already-mod-P hash. */
  def perm(h: Column, i: Int): Column = (h * permA(i) + permB(i)) % P
  def permSql(h: String, i: Int): String =
    s"((${permA(i)} * $h + ${permB(i)}) % $P)"

  /** ±1 hyperplane component for random-projection LSH, derived from md5 of
    * `"p:d"` — reproducible on any engine that has md5. Computed driver-side
    * here; the SQL generator below emits the equivalent expression. */
  def planeSign(p: Int, d: Int): Double =
    if (Md5LongUtil.hashBytes(s"$p:$d".getBytes("UTF-8")) % 2 == 1) 1.0 else -1.0

  /** DuckDB expression for [[planeSign]] given SQL expressions for p and d
    * (same md5Long-parity definition as the Scala form). */
  def planeSignSql(p: String, d: String): String =
    s"(CASE WHEN (${md5LongSql(s"($p || ':' || $d)")} % 2) = 1 THEN 1.0 ELSE -1.0 END)"

  // --- tokenization & shingles ---------------------------------------------

  def tokens(text: Column): Column = split(trim(text), "\\s+")
  def tokensSql(e: String): String = s"string_split_regex(trim($e), '\\s+')"

  /** Distinct word n-gram shingles; a doc shorter than n words contributes
    * its whole text as one shingle (so every doc has >= 1 shingle). */
  def wordShingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    array_distinct(
      when(size(t) >= n,
        transform(sequence(lit(0), size(t) - n),
          i => concat_ws(" ", slice(t, i + lit(1), lit(n)))))
        .otherwise(array(concat_ws(" ", t))))
  }

  def wordShinglesSql(e: String, n: Int): String = {
    val t = tokensSql(e)
    s"""list_distinct(CASE WHEN len($t) >= $n THEN list_transform(range(0, len($t) - ${n - 1}), i -> array_to_string(list_slice($t, i + 1, i + $n), ' ')) ELSE [array_to_string($t, ' ')] END)"""
  }

  /** Distinct character n-gram shingles of the trimmed text. */
  def charShingles(text: Column, n: Int): Column = {
    val t = trim(text)
    array_distinct(
      when(length(t) >= n,
        transform(sequence(lit(0), length(t) - n), i => t.substr(i + lit(1), lit(n))))
        .otherwise(array(t)))
  }

  def charShinglesSql(e: String, n: Int): String =
    s"""list_distinct(CASE WHEN length(trim($e)) >= $n THEN list_transform(range(0, length(trim($e)) - ${n - 1}), i -> substr(trim($e), i + 1, $n)) ELSE [trim($e)] END)"""

  /** Strided character n-grams (winnowing-style sampling: every `stride`-th
    * window) — 1/stride the hashing cost of the dense variant while still
    * covering the whole document. */
  def charShinglesStrided(text: Column, n: Int, stride: Int): Column = {
    val t = trim(text)
    array_distinct(
      when(length(t) >= n,
        transform(sequence(lit(0), length(t) - n, lit(stride)),
          i => t.substr(i + lit(1), lit(n))))
        .otherwise(array(t)))
  }

  def charShinglesStridedSql(e: String, n: Int, stride: Int): String =
    s"""list_distinct(CASE WHEN length(trim($e)) >= $n THEN list_transform(range(0, length(trim($e)) - ${n - 1}, $stride), i -> substr(trim($e), i + 1, $n)) ELSE [trim($e)] END)"""
}
