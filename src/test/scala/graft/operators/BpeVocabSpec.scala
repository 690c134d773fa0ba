package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.BpeExpressions.WordEnd

/** BPE learning/tokenization vs a pure-Scala reference implementation of
  * the classic algorithm — exact merge-sequence and token equality. */
class BpeVocabSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // --- reference (greedy, deterministic ties by (count desc, pair asc)) ---

  private def refInit(text: String): Vector[String] =
    text.trim.split("\\s+").filter(_.nonEmpty)
      .flatMap(t => t.map(_.toString) :+ WordEnd).toVector

  private def refMerge(s: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < s.length) {
      if (i < s.length - 1 && s(i) == a && s(i + 1) == b) { out += (a + b); i += 2 }
      else { out += s(i); i += 1 }
    }
    out.result()
  }

  private def refLearn(corpus: Seq[String], k: Int, minCount: Long = 2L): Seq[(String, String, Long)] = {
    var docs = corpus.map(refInit).filter(_.length >= 2)
    val merges = Seq.newBuilder[(String, String, Long)]
    var n = 0
    var continue = true
    while (continue && n < k) {
      val counts = docs.flatMap(d => d.zip(d.drop(1)))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val best = counts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.headOption
      best.filter(_._2 >= minCount) match {
        case None => continue = false
        case Some(((a, b), c)) =>
          merges += ((a, b, c)); n += 1
          docs = docs.map(refMerge(_, a, b))
      }
    }
    merges.result()
  }

  private val corpus = Seq(
    "low low low lower lower",
    "newest newest newest newest",
    "widest widest wider low")

  test("learnMerges == reference merge sequence (order, pairs, counts)") {
    val got = BpeVocab.learnMerges(corpus.toDF("text"), "text", numMerges = 8)
      .map(m => (m.a, m.b, m.count))
    assert(got === refLearn(corpus, 8))
    assert(got.nonEmpty)
  }

  test("applyMerges tokenization == reference application per doc") {
    val merges = BpeVocab.learnMerges(corpus.toDF("text"), "text", numMerges = 6)
    val got = corpus.toDF("text")
      .select(BpeVocab.applyMerges(col("text"), merges).as("toks"))
      .as[Seq[String]].collect().toSeq
    val want = corpus.map(t =>
      merges.foldLeft(refInit(t))((s, m) => refMerge(s, m.a, m.b)).toSeq)
    assert(got === want)
  }

  test("greedy non-overlapping merge: aaa + (a,a) -> [aa, a]") {
    val out = Seq("aaa").toDF("text")
      .select(graft.functions.BpeExpressions.mergePair(
        array(lit("a"), lit("a"), lit("a")), lit("a"), lit("a")).as("m"))
      .as[Seq[String]].head()
    assert(out === Seq("aa", "a"))
  }

  test("learning is deterministic across runs (tie-break is total)") {
    val df = corpus.toDF("text")
    assert(BpeVocab.learnMerges(df, "text", 5) === BpeVocab.learnMerges(df, "text", 5))
  }

  test("minCount stops learning before degenerate singleton merges") {
    // every pair unique -> nothing reaches minCount=2 -> no merges
    assert(BpeVocab.learnMerges(Seq("abcdefg").toDF("text"), "text", 4).isEmpty)
  }

  test("zip_with null padding cannot win the argmax (no (</w>, null) merge)") {
    // each doc's last symbol pairs with the null pad: corpus-wide count 3
    // would beat every real pair if unfiltered (reference finds no merges)
    val corpus = Seq("ab", "cd", "ef")
    assert(refLearn(corpus, 4).isEmpty)
    assert(BpeVocab.learnMerges(corpus.toDF("text"), "text", 4).isEmpty)
  }

  test("non-space whitespace (tabs/newlines) matches the reference init") {
    val tricky = Seq("\nlow low\t", "lowlow")
    val merges = BpeVocab.learnMerges(tricky.toDF("text"), "text", 3)
    assert(merges.map(m => (m.a, m.b, m.count)) === refLearn(tricky, 3))
    val got = tricky.toDF("text")
      .select(BpeVocab.applyMerges(col("text"), merges).as("t")).as[Seq[String]].collect().toSeq
    val want = tricky.map(t => merges.foldLeft(refInit(t))((s, m) => refMerge(s, m.a, m.b)).toSeq)
    assert(got === want)
  }
}
