package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def link(rows: Seq[String], maxDist: Int = 3) =
    FuzzyJoin.selfLinkage(
      rows.toDF("p_name"), "p_name",
      name => split(name, " ").getItem(0), maxDist)
      .as[(String, String, Int, Long, Long)].collect().toSet

  test("within-block pair at dist 1, with row support counts") {
    val out = link(Seq("blue anvil", "blue anvi", "blue anvil", "red bolt"))
    assert(out === Set(("blue anvi", "blue anvil", 1, 1L, 2L)))
  }

  test("threshold boundary: dist == maxDist kept, maxDist+1 dropped") {
    // "blue abcd" vs "blue wxyz": 4 substitutions
    assert(link(Seq("blue abcd", "blue wxyz"), maxDist = 4).map(_._3) === Set(4))
    assert(link(Seq("blue abcd", "blue wxyz"), maxDist = 3).isEmpty)
  }

  test("blocking recall boundary: cross-block near-match is unseen") {
    // dist 1 but different first tokens -> different blocks -> not reported
    assert(link(Seq("blue anvil", "glue anvil")).isEmpty)
  }

  test("pairs are canonical (name_a < name_b) and deduped to the vocabulary") {
    val out = link(Seq.fill(5)("hot gear") ++ Seq.fill(7)("hot gears"))
    assert(out === Set(("hot gear", "hot gears", 1, 5L, 7L)))
  }

  test("soundex blocking finds the first-token misspelling that token blocking misses") {
    // "goldenrod" vs "goldnerod": a vowel transposition INSIDE the first
    // token (dist 2). Any edit in the first token changes the token — the
    // first-token block separates the pair — but soundex absorbs vowel
    // moves, so the phonetic block reunites it.
    val rows = Seq("goldenrod lace", "goldnerod lace", "navy bolt")
    assert(link(rows).isEmpty, "first-token blocking must miss the planted pair")
    val phonetic = FuzzyJoin.selfLinkage(
        rows.toDF("p_name"), "p_name",
        name => graft.functions.Phonetic.soundex(name), maxDist = 3)
      .as[(String, String, Int, Long, Long)].collect().toSet
    assert(phonetic === Set(("goldenrod lace", "goldnerod lace", 2, 1L, 1L)))
  }
}
