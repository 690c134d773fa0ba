package graft.functions

import scala.util.Random

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class JaroWinklerSpec extends AnyFunSuite {

  private def jw(a: String, b: String): Double =
    JaroWinklerUtil.jw(UTF8String.fromString(a), UTF8String.fromString(b))

  test("textbook values match DuckDB's jaro_winkler_similarity bit-for-bit") {
    // reference doubles captured from DuckDB v1.0.0 (the q105 oracle)
    assert(jw("MARTHA", "MARHTA") == 0.9611111111111111)
    assert(jw("DIXON", "DICKSONX") == 0.8133333333333332)
    assert(jw("JELLYFISH", "SMELLYFISH") == 0.8962962962962964)
    assert(jw("ABCVWXYZ", "CABVWXYZ") == 0.9583333333333334) // transpositions, no prefix boost
  }

  test("edge cases: identity, empty, disjoint, boost threshold") {
    assert(jw("apple", "apple") == 1.0)
    assert(jw("", "") == 1.0) // equal strings short-circuit, like DuckDB
    assert(jw("apple", "") == 0.0)
    assert(jw("abc", "xyz") == 0.0)
    // below the 0.7 jaro threshold no prefix boost applies: a pair with a
    // shared prefix but low jaro returns plain jaro
    val low = jw("abcdefgh", "abzzzzzzzzzzzzzz")
    assert(low < 0.7 + 1e-9)
  }

  test("symmetry and bounds on random strings") {
    val rng = new Random(99)
    for (_ <- 1 to 300) {
      val a = Random.alphanumeric.take(rng.nextInt(12)).mkString
      val b = Random.alphanumeric.take(rng.nextInt(12)).mkString
      val x = jw(a, b)
      assert(x >= 0.0 && x <= 1.0)
      assert(x == jw(b, a), s"asymmetric on '$a' '$b'")
    }
  }
}
