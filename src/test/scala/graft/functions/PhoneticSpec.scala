package graft.functions

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Portable soundex: classic reference codes, the documented H/W
  * deviation, and parity with a direct Scala implementation of the spec
  * over fuzzed strings (the collapse unroll is the bug surface). */
class PhoneticSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(names: Seq[String]): Map[String, String] =
    names.toDF("n").select(col("n"), Phonetic.soundex(col("n")).as("s"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("classic soundex reference values") {
    val got = run(Seq("Robert", "Rupert", "Pfister", "Jackson", "Tymczak",
      "ashcraft", "O'Brien", "  ", "42", "a", "HW"))
    assert(got("Robert") === "R163")
    assert(got("Rupert") === "R163")
    assert(got("Pfister") === "P236") // first-letter's-own-code rule
    assert(got("Jackson") === "J250")
    assert(got("Tymczak") === "T522")
    // DOCUMENTED deviation: full soundex (H/W separator rule) gives A261
    assert(got("ashcraft") === "A226")
    assert(got("O'Brien") === "O165")
    assert(got("  ") === "0000")
    assert(got("42") === "0000")
    assert(got("a") === "A000")
    assert(got("HW") === "H000")
  }

  test("vowel moves and doubled letters keep the code (the blocking point)") {
    val got = run(Seq("goldenrod", "goldnerod", "golldenrrod", "soldenrod"))
    assert(got("goldenrod") === got("goldnerod"), "vowel transposition")
    assert(got("goldenrod") === got("golldenrrod"), "doubled consonants")
    assert(got("goldenrod") !== got("soldenrod"), "first letter is kept")
  }

  test("matches a direct Scala implementation of the documented spec (fuzz)") {
    val codes = "01230120022455012623010202"
    def ref(name: String): String = {
      val clean = name.toUpperCase.filter(c => c >= 'A' && c <= 'Z').take(32)
      if (clean.isEmpty) "0000"
      else {
        val d = clean.map(c => codes(c - 'A'))
        val collapsed = d.foldLeft(new StringBuilder) { (b, c) =>
          if (b.nonEmpty && b.last == c) b else b.append(c)
        }.toString
        val digits = collapsed.drop(1).filter(_ != '0')
        clean.take(1) + (digits + "000").take(3)
      }
    }
    val rnd = new scala.util.Random(11)
    val alphabet = "abcdefghijklmnopqrstuvwxyzAEIOU '-7 "
    val fuzz = (0 until 400).map(_ =>
      (0 until (1 + rnd.nextInt(24))).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    val got = run(fuzz.distinct)
    for (n <- fuzz.distinct)
      assert(got(n) === ref(n), s"input '$n'")
  }
}
