package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable SOUNDEX — the phonetic blocking key for entity resolution
  * ([[graft.operators.FuzzyJoin]]): names that SOUND alike block together,
  * so misspellings that first-token/prefix blocking separates (including a
  * changed first VOWEL or doubled consonants) still meet in one block.
  *
  * This is classic American Soundex minus the H/W-separator rule (the same
  * simplification MySQL ships), defined as pure string primitives with
  * IDENTICAL semantics on Spark and DuckDB so the oracle replays it
  * lockstep (the TextHash discipline):
  *
  *   1. `clean` = upper-cased letters A–Z only, truncated to 32 chars
  *      (bounds the run-collapse unroll; names are far shorter);
  *   2. `digits` = `translate(clean, A..Z, "01230120022455012623010202")`
  *      — the standard letter→code table, vowels/H/W/Y → 0;
  *   3. collapse adjacent equal digits (the doubled-letter rule AND the
  *      first-letter's-own-code rule in one step, e.g. PFISTER → P236):
  *      five `replace(dd → d)` passes per digit collapse runs up to 2³²
  *      — bounded, branch-free, engine-identical (no regex backreferences,
  *      which RE2/DuckDB lacks);
  *   4. code = first letter of `clean` + first three non-zero collapsed
  *      digits AFTER the first position, right-padded with '0';
  *      empty `clean` → "0000".
  *
  * ROBERT→R163, PFISTER→P236, JACKSON→J250, TYMCZAK→T522 (all equal to
  * full Soundex); ASHCRAFT→A226 vs full Soundex's A261 — the documented
  * H/W deviation.
  */
object Phonetic {

  private val Letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
  private val Codes = "01230120022455012623010202"

  /** Spark column form; codegen-friendly (translate/replace/substring). */
  def soundex(name: Column): Column = {
    val clean = substring(
      regexp_replace(upper(name), "[^A-Z]", ""), 1, 32)
    var d = translate(clean, Letters, Codes)
    for (digit <- '0' to '6'; _ <- 1 to 5)
      d = regexp_replace(d, s"$digit$digit", s"$digit") // plain pair collapse
    val tail = substring(d, 2, 32)
    val digitsOnly = translate(tail, "0", "")
    when(length(clean) === 0, lit("0000"))
      .otherwise(concat(substring(clean, 1, 1),
        substring(concat(digitsOnly, lit("000")), 1, 3)))
  }

  /** DuckDB lockstep replay of [[soundex]] over `expr`. */
  def soundexSql(expr: String): String = {
    val clean = s"substr(regexp_replace(upper($expr), '[^A-Z]', '', 'g'), 1, 32)"
    var d = s"translate($clean, '$Letters', '$Codes')"
    for (digit <- '0' to '6'; _ <- 1 to 5)
      d = s"replace($d, '$digit$digit', '$digit')"
    val digitsOnly = s"replace(substr($d, 2, 32), '0', '')"
    s"(CASE WHEN length($clean) = 0 THEN '0000' " +
      s"ELSE substr($clean, 1, 1) || substr($digitsOnly || '000', 1, 3) END)"
  }
}
