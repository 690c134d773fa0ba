package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.functions.TextHash
import graft.operators.MinHashDedup

/** Post-append health audits for the two banded/blocked index families:
  * the LSH recall-drift audit (banded hits vs exact truth on a
  * deterministic batch sample) and the Hamming candidate-volume drift
  * (probe-cost skew — recall is pigeonhole-lossless and can't drift). */
class IndexAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  private def fresh(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"idx_audit_$tag").toString

  private val wordCfg =
    MinHashDedup.Config(numHashes = 16, bands = 8, jaccardThreshold = 0.8)
  // the deliberately WEAK q231 geometry: 2 bands of 8 rows — per-band hit
  // at j≈0.9 is j^8≈0.43, so single-probe recall is imperfect by design
  private val weakCfg =
    MinHashDedup.Config(numHashes = 16, bands = 2, jaccardThreshold = 0.8)

  private def sh = graft.functions.VectorExpressions
    .wordShingleHashes(col("text"), 3, TextHash.P)

  test("LSH recall audit: full-geometry index finds every sampled truth pair") {
    val docs = Tables.documents(spark, dir)
    val idx = fresh("lsh_full")
    LshIndex.write(docs.filter(col("doc_id") % 2 === 0), "doc_id", sh, idx, wordCfg)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    LshIndex.append(spark, batch, "doc_id", sh, idx, wordCfg)
    val r = LshIndex.appendRecallAudit(spark, idx, batch, "doc_id", sh, wordCfg)
      .head()
    assert(r.getAs[Long]("n_truth") > 0, "the planted near-dups must yield truth pairs")
    assert(r.getAs[Long]("n_hits") == r.getAs[Long]("n_truth"),
      "8 bands x 2 rows at j>=0.8 must find every truth pair on this corpus")
    assert(r.getAs[Long]("n_found") == r.getAs[Long]("n_hits"),
      "FOUND must be a subset of TRUTH (same jaccard arithmetic)")
    assert(r.getAs[Long]("recall_bp") == 10000L && !r.getAs[Boolean]("degraded"))
    spark.catalog.clearCache()
  }

  test("LSH recall audit: the weak 2-band geometry degrades measurably") {
    val docs = Tables.documents(spark, dir)
    val idx = fresh("lsh_weak")
    LshIndex.write(docs.filter(col("doc_id") % 2 === 0), "doc_id", sh, idx, weakCfg)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    LshIndex.append(spark, batch, "doc_id", sh, idx, weakCfg)
    val r = LshIndex.appendRecallAudit(spark, idx, batch, "doc_id", sh, weakCfg)
      .head()
    assert(r.getAs[Long]("n_truth") > 0)
    assert(r.getAs[Long]("n_hits") < r.getAs[Long]("n_truth"),
      s"q231 measured this geometry imperfect at j~0.9; audit must see it: $r")
    assert(r.getAs[Long]("recall_bp") < 10000L)
    spark.catalog.clearCache()
  }

  test("LSH recall audit: a batch with no truth pairs yields NULL recall, not degraded") {
    val corpus = (0L until 40L)
      .map(i => (i, s"unique corpus text number $i with words w${i}a w${i}b w${i}c w${i}d"))
      .toDF("doc_id", "text")
    val batch = (100L until 110L)
      .map(i => (i, s"totally unrelated batch item $i alpha$i beta$i gamma$i delta$i"))
      .toDF("doc_id", "text")
    val idx = fresh("lsh_none")
    LshIndex.write(corpus, "doc_id", sh, idx, wordCfg)
    LshIndex.append(spark, batch, "doc_id", sh, idx, wordCfg)
    val r = LshIndex.appendRecallAudit(spark, idx, batch, "doc_id", sh, wordCfg)
      .head()
    assert(r.getAs[Long]("n_truth") == 0L)
    assert(r.isNullAt(r.fieldIndex("recall_bp")),
      "no truth pairs => recall undefined, emitted as NULL on both engines")
    assert(!r.getAs[Boolean]("degraded"))
    spark.catalog.clearCache()
  }

  test("Hamming candidate drift: iid batch passes, constant-fingerprint batch flags skew") {
    // fingerprints spread over the 56-bit space: iid halves collide rarely
    def fps(ids: Seq[Long]) = ids
      .map(i => (i, graft.functions.Md5LongUtil.hashBytes(
        s"fp:$i".getBytes("UTF-8")) & ((1L << 56) - 1)))
      .toDF("doc_id", "fp")
    val idx = fresh("ham_iid")
    HammingIndex.write(fps(0L until 64L).filter(col("doc_id") % 2 === 0),
      "doc_id", "fp", idx, bits = 56)
    HammingIndex.append(spark,
      fps(0L until 64L).filter(col("doc_id") % 2 === 1), "doc_id", "fp", idx)
    val iid = HammingIndex.candidateDrift(spark, idx, col("id") % 2 === 1).head()
    assert(!iid.getAs[Boolean]("skewed"), s"iid batch must not flag: $iid")

    // a degenerate batch (every fingerprint identical — silent audio /
    // black frames) piles into one bucket per chunk: each batch doc sees
    // every other batch doc as a candidate, the mean explodes
    val idx2 = fresh("ham_skew")
    HammingIndex.write(fps(0L until 64L), "doc_id", "fp", idx2, bits = 56)
    val flat = (1000L until 1064L).map(i => (i, 12345L)).toDF("doc_id", "fp")
    HammingIndex.append(spark, flat, "doc_id", "fp", idx2)
    val bad = HammingIndex.candidateDrift(spark, idx2, col("id") >= 1000L).head()
    assert(bad.getAs[Boolean]("skewed") && bad.getAs[Long]("drift_bp") > 20000L,
      s"constant-fingerprint batch must flag candidate skew: $bad")
    spark.catalog.clearCache()
  }

  test("Hamming candidate drift: zero collisions anywhere is a clean 10000 bp, not skewed") {
    // base fingerprints pairwise distant in every chunk => zero candidates
    val base = (0 until 8).map(i => (i.toLong,
      (0 until 4).map(c => ((i * 7 + c + 1).toLong & 0x3FFFL) << (14 * c)).sum))
      .toDF("doc_id", "fp")
    val batch = (100 until 104).map(i => (i.toLong,
      (0 until 4).map(c => ((i * 11 + c + 3).toLong & 0x3FFFL) << (14 * c)).sum))
      .toDF("doc_id", "fp")
    val idx = fresh("ham_zero")
    HammingIndex.write(base, "doc_id", "fp", idx, bits = 56)
    HammingIndex.append(spark, batch, "doc_id", "fp", idx)
    val r = HammingIndex.candidateDrift(spark, idx, col("id") >= 100L).head()
    assert(r.getAs[Long]("prev_cand") == 0L,
      "construction: every chunk value is unique across the whole index")
    // +1-smoothed milli-means: 0/0 collisions => (0+1)*10^4 div (0+1)
    assert(r.getAs[Long]("drift_bp") == 10000L)
    assert(!r.getAs[Boolean]("skewed"))
    spark.catalog.clearCache()
  }
}
