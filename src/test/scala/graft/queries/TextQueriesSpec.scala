package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.functions.TextHash

class TextQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val small = "/root/testdata/sf0.01"

  test("q257 PR curve: classifier-theoretic invariants hold at every threshold") {
    val rows = TextQueries.queries("q257_pr_curve")(spark, small).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(_._1)
    assert(rows.length > 10, "score domain should have many occupied thresholds")
    val nPos = rows.head._2 + rows.head._4 // tp + fn is constant
    for ((score, tp, fp, fn, pBp, rBp, f1Bp) <- rows) {
      assert(tp + fn == nPos, s"t=$score: tp+fn must equal the positive count")
      assert(tp >= 0 && fp >= 0 && fn >= 0)
      assert(pBp == tp * 10000 / (tp + fp) && rBp == tp * 10000 / nPos)
      assert(f1Bp == 2 * tp * 10000 / (tp + fp + nPos))
    }
    // recall is non-increasing in the threshold; tp+fp (predicted) too
    val byT = rows.map(r => (r._1, r._2, r._2 + r._3))
    for (Array((_, tp1, pr1), (_, tp2, pr2)) <- byT.sliding(2).map(_.toArray)) {
      assert(tp2 <= tp1 && pr2 <= pr1, "raising the threshold can only shrink predictions")
    }
    // the lowest occupied threshold predicts everything: recall = 100%
    assert(rows.head._6 == 10000, "lowest threshold must have full recall")
  }

  test("q262 conformal: threshold is the exact order statistic; audit identities hold") {
    val r = TextQueries.queries("q262_conformal_threshold")(spark, small).collect().head
    val (nCal, rank, thr) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (nTestPos, covered, nTest, predPos, covBp, effBp) =
      (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))
    // direct replay: scores + split from the shared primitives
    def md5l(s: String) = graft.functions.Md5LongUtil.hashBytes(s.getBytes("UTF-8"))
    val docs = Tables.documents(spark, small)
      .select(col("doc_id"), col("text")).collect()
      .map { row =>
        val (id, text) = (row.getLong(0), row.getString(1))
        val toks = text.trim.split("\\s+").toSeq
        val score = toks.map { t =>
          val b = md5l(t) % 4096
          md5l("w:" + b) % 2001 - 1000
        }.sum
        (id, score, toks.length >= 60, md5l("cal:" + id) % 100 < 50)
      }
    val calPos = docs.filter(d => d._4 && d._3).map(_._2).sorted
    assert(nCal == calPos.length.toLong)
    assert(rank == (9 * (nCal + 1) + 9) / 10)
    val kth = nCal - rank + 1
    val wantThr = if (kth < 1) -1000000000000000L else calPos(kth.toInt - 1)
    assert(thr == wantThr, "threshold must be the exact order statistic")
    val test = docs.filterNot(_._4)
    assert(nTest == test.length.toLong)
    assert(nTestPos == test.count(_._3).toLong)
    assert(covered == test.count(d => d._3 && d._2 >= thr).toLong)
    assert(predPos == test.count(_._2 >= thr).toLong)
    assert(covBp == covered * 10000 / nTestPos && effBp == predPos * 10000 / nTest)
    // the conformal guarantee is in expectation; deterministic data sits
    // comfortably near it (measured 92% at sf0.01)
    assert(covBp > 8500, s"coverage $covBp unexpectedly far below the 9000 target")
  }

  test("q259 vocab growth: cumulative curve is monotone and ends at the true totals") {
    val rows = TextQueries.queries("q259_vocab_growth")(spark, small).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0L to 9L))
    for (Array(a, b) <- rows.sliding(2).map(_.toArray)) {
      assert(b._2 >= a._2 && b._3 >= a._3 && b._4 >= a._4, "cumulatives must be monotone")
    }
    val docs = Tables.documents(spark, small)
      .select(col("doc_id"), TextHash.tokens(col("text")).as("toks"))
    val totalDocs = docs.count()
    val totalTokens = docs.agg(sum(size(col("toks")))).collect().head.getLong(0)
    val totalVocab = docs.select(explode(col("toks"))).distinct().count()
    val last = rows.last
    assert(last._2 == totalDocs && last._3 == totalTokens && last._4 == totalVocab)
    assert(last._5 == totalVocab * 1000000L / totalTokens)
    // Heaps: vocabulary grows sublinearly — the first decile contributes
    // a disproportionate share of the final vocabulary
    assert(rows.head._4 * 10 > totalVocab,
      "first decile should exceed a 1/10 pro-rata vocabulary share")
  }

  test("q277 isotonic fit equals pure-Scala PAVA and is monotone non-increasing in bin") {
    val rows = TextQueries.queries("q277_isotonic_calibration")(spark, small)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5)))
      .sortBy(-_._1) // idx order = bin DESC
    spark.catalog.clearCache()
    assert(rows.nonEmpty)
    // PAVA reference with exact BigInt rationals: pool adjacent violators
    // until means are non-decreasing in idx order
    case class Pool(var num: BigInt, var den: BigInt)
    val stack = scala.collection.mutable.ArrayBuffer.empty[(Pool, Int)] // (pool, span)
    for ((_, n, c, _, _) <- rows) {
      var (p, span) = (Pool(BigInt(c), BigInt(n)), 1)
      while (stack.nonEmpty && stack.last._1.num * p.den > p.num * stack.last._1.den) {
        val (q, s2) = stack.remove(stack.length - 1)
        p = Pool(p.num + q.num, p.den + q.den); span += s2
      }
      stack += ((p, span))
    }
    val pavaFit = stack.flatMap { case (p, span) => Seq.fill(span)((p.num, p.den)) }
    assert(pavaFit.length == rows.length)
    for (((bin, _, _, fn, fd), (pn, pd)) <- rows.zip(pavaFit)) {
      assert(BigInt(fn) * pd == pn * BigInt(fd),
        s"bin=$bin minimax fit $fn/$fd != PAVA $pn/$pd")
    }
    // monotone non-increasing in bin (non-decreasing in idx order is the
    // same statement on the reversed axis)
    val vals = rows.map { case (_, _, _, fn, fd) => (BigInt(fn), BigInt(fd)) }
    for (w <- vals.sliding(2) if w.length == 2) {
      val ((a, b), (c2, d2)) = (w(0), w(1))
      assert(a * d2 <= c2 * b, "fit must be non-decreasing along idx")
    }
  }
}
