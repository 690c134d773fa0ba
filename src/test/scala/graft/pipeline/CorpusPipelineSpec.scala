package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.MinHashDedup

class CorpusPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again today ok"

  test("normalize -> filter -> exact dedup -> fuzzy dedup keeps one doc per cluster") {
    val docs = Seq(
      (1L, base),
      (2L, "  " + base.toUpperCase + "  "),   // exact dup after normalization
      (3L, base + " extra"),                  // near dup of 1 -> same cluster
      (4L, "completely different text about spark shuffles and partitions here"),
      (5L, "too short"),                      // filtered by minTokens
      (6L, base)                              // exact dup of 1
    ).toDF("doc_id", "text")
    val res = CorpusPipeline.run(docs,
      CorpusPipeline.Config(minTokens = 5, minhash = MinHashDedup.Config(16, 8, 0.5)))
    val kept = res.corpus.select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L), s"stats=${res.stats}")
    assert(res.stats("input") == 6)
    assert(res.stats("after_norm") == 5)     // doc 5 dropped
    assert(res.stats("after_exact") == 3)    // docs 2,6 collapse into 1
    assert(res.stats("after_fuzzy") == 2)    // doc 3 collapses into 1
    val fp = res.corpus.filter($"doc_id" === 1L).select("fingerprint").head().getLong(0)
    assert(fp != 0L)
  }

  test("fuzzy cluster transitivity: chain of near-dups collapses to one") {
    // a-b similar, b-c similar (a-c maybe less so) -> one cluster via the fixpoint
    val t1 = base
    val t2 = base + " one"
    val t3 = base + " one two"
    val docs = Seq((10L, t1), (11L, t2), (12L, t3)).toDF("doc_id", "text")
    val res = CorpusPipeline.run(docs,
      CorpusPipeline.Config(minTokens = 5, minhash = MinHashDedup.Config(16, 8, 0.5)))
    val kept = res.corpus.select("doc_id").as[Long].collect().toSet
    assert(kept == Set(10L))
  }

  test("star component collapses even without the indirect pair") {
    // 20-21 and 20-22 are near-dups via shared core; 21 and 22 differ more.
    // True connected component {20,21,22} must keep ONLY 20.
    val core = base
    val docs = Seq(
      (20L, core),
      (21L, core + " alpha beta gamma"),
      (22L, core + " delta epsilon zeta")
    ).toDF("doc_id", "text")
    val res = CorpusPipeline.run(docs,
      CorpusPipeline.Config(minTokens = 5, minhash = MinHashDedup.Config(16, 8, 0.4)))
    val kept = res.corpus.select("doc_id").as[Long].collect().toSet
    assert(kept == Set(20L), s"stats=${res.stats}")
  }
}
