package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.{AudioDedup, Multimodal}

class HammingIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fps(ids: Seq[Long]) =
    AudioDedup.fingerprints(
      Multimodal.withWavPayloadScaled(ids.toDF("doc_id"), "doc_id"),
      "doc_id", "payload")

  test("probe == brute force over the indexed corpus (lossless), partition-pruned") {
    val idx = java.nio.file.Files.createTempDirectory("ham_idx").toString
    // group 1 (ids 8..15) STRADDLES the split, so cross pairs must exist
    val corpusIds = 12L until 96L
    val batchIds = 0L until 12L
    val all = fps(corpusIds ++ batchIds)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    HammingIndex.write(fps(corpusIds), "id", "peak_hash", idx, bits = 56)

    val got = HammingIndex.probe(spark, fps(batchIds), "id", "peak_hash", idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = (for {
      q <- batchIds; c <- corpusIds
      h = java.lang.Long.bitCount(all(q) ^ all(c)) if h <= 3
    } yield (q, c, h)).toSet
    assert(got == brute, "index probe must equal the flat pair join")
    assert(got.nonEmpty, "planted groups straddle the split — pairs must exist")
  }

  test("crashed rebuild (no _ready marker) refuses probes, appends and drift audits") {
    val idx = java.nio.file.Files.createTempDirectory("ham_idxr").toString
    HammingIndex.write(fps(0L until 16L), "id", "peak_hash", idx, bits = 56)
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$idx/_ready"))
    val e1 = intercept[IllegalArgumentException] {
      HammingIndex.probe(spark, fps(16L until 20L), "id", "peak_hash", idx).collect()
    }
    assert(e1.getMessage.contains("_ready"))
    val e2 = intercept[IllegalArgumentException] {
      HammingIndex.append(spark, fps(16L until 20L), "id", "peak_hash", idx)
    }
    assert(e2.getMessage.contains("_ready"))
    val e3 = intercept[IllegalArgumentException] {
      HammingIndex.candidateDrift(spark, idx, col("id") >= 8).collect()
    }
    assert(e3.getMessage.contains("_ready"))
    // a completed rebuild restores the marker and serving resumes
    HammingIndex.write(fps(0L until 16L), "id", "peak_hash", idx, bits = 56)
    HammingIndex.probe(spark, fps(16L until 20L), "id", "peak_hash", idx).collect()
    spark.catalog.clearCache()
  }

  test("geometry rides meta.json; probes reuse it (no caller-side bits drift)") {
    val idx = java.nio.file.Files.createTempDirectory("ham_idx2").toString
    HammingIndex.write(fps(0L until 8L), "id", "peak_hash", idx, bits = 56, nParts = 8)
    val txt = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$idx/meta.json"))
    assert(txt.contains("\"bits\":56") && txt.contains("\"nParts\":8"))
    // a batch overlapping the corpus never pairs with itself
    val self = HammingIndex.probe(spark, fps(0L until 8L), "id", "peak_hash", idx)
      .filter(col("query_id") === col("corpus_id")).count()
    assert(self == 0)
  }

  test("append: incremental batches probe identically to a fresh rebuild; collisions abort") {
    val idx = java.nio.file.Files.createTempDirectory("ham_idx4").toString
    val rebuilt = java.nio.file.Files.createTempDirectory("ham_idx5").toString
    HammingIndex.write(fps(12L until 48L), "id", "peak_hash", idx, bits = 56)
    HammingIndex.append(spark, fps(48L until 96L), "id", "peak_hash", idx)
    HammingIndex.write(fps(12L until 96L), "id", "peak_hash", rebuilt, bits = 56)
    def pairsOf(d: String) =
      HammingIndex.probe(spark, fps(0L until 12L), "id", "peak_hash", d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairsOf(idx) == pairsOf(rebuilt),
      "append must converge to the rebuilt index's probe results")
    // overlapping re-ingest aborts loudly (G3), even with a changed fp
    intercept[IllegalArgumentException] {
      HammingIndex.append(spark, fps(Seq(20L)), "id", "peak_hash", idx)
    }
  }

  test("streaming dedup ingest: survivors drop corpus + smaller-id batch dups; replay no-ops") {
    val idx = java.nio.file.Files.createTempDirectory("ham_idx6").toString
    // corpus = groups 2..5 fully; batch = group 0 fully (internal dups
    // only) + the straddling half of group 1 (corpus dups)
    HammingIndex.write(fps(12L until 48L), "id", "peak_hash", idx, bits = 56)
    val batch = fps(0L until 12L).persist()
    val sv = HammingIndex.processDedupBatch(
      spark, batch, "id", "peak_hash", idx, batchId = 1L).get
    val svIds = sv.select(col("id")).collect().map(_.getLong(0)).toSet
    // ids 8..11 have corpus near-dups (group 1's other half is indexed);
    // of ids 0..7 (group 0) only the smallest id survives canonical keep
    assert(svIds == Set(0L), s"expected only the canonical group-0 head, got $svIds")
    spark.catalog.clearCache()
    // survivors are now indexed: a fresh probe of the same batch finds them
    val found = HammingIndex.probe(spark, batch, "id", "peak_hash", idx)
      .filter(col("corpus_id") === 0L).count()
    assert(found > 0, "the admitted survivor must be probe-visible")
    // exactly-once: redelivery of the committed batch no-ops
    assert(HammingIndex.processDedupBatch(
      spark, batch, "id", "peak_hash", idx, batchId = 1L).isEmpty)
    // a new batch of already-admitted ids fully dedups (ids gate holds)
    val sv2 = HammingIndex.processDedupBatch(
      spark, fps(Seq(0L)), "id", "peak_hash", idx, batchId = 2L).get
    assert(sv2.isEmpty, "an exact re-send of an admitted id must not survive")
    spark.catalog.clearCache()
  }

  test("append serializes on the index lock; stale lock fails loudly") {
    val idx = java.nio.file.Files.createTempDirectory("ham_idx7").toString
    HammingIndex.write(fps(12L until 48L), "id", "peak_hash", idx, bits = 56)
    val lock = java.nio.file.Paths.get(s"$idx/append.lock")
    java.nio.file.Files.createFile(lock) // a rival append (or its corpse)
    val e = intercept[IllegalStateException] {
      HammingIndex.append(spark, fps(48L until 60L), "id", "peak_hash", idx)
    }
    assert(e.getMessage.contains("append.lock"))
    java.nio.file.Files.delete(lock)
    HammingIndex.append(spark, fps(48L until 60L), "id", "peak_hash", idx)
    assert(!java.nio.file.Files.exists(lock), "append must release the lock")
    // the lock is released on the ABORT path too (finally), so a failed
    // append never wedges the index
    intercept[IllegalArgumentException] {
      HammingIndex.append(spark, fps(Seq(20L)), "id", "peak_hash", idx)
    }
    assert(!java.nio.file.Files.exists(lock),
      "an aborted append must release the lock")
    spark.catalog.clearCache()
    graft.TempDirs.deleteRecursively(new java.io.File(idx))
  }

  test("null fingerprints are skipped on both sides") {
    val idx = java.nio.file.Files.createTempDirectory("ham_idx3").toString
    val withNull = fps(0L until 8L).unionByName(
      Seq((999L, null.asInstanceOf[java.lang.Long])).toDF("id", "peak_hash"))
    HammingIndex.write(withNull, "id", "peak_hash", idx, bits = 56)
    val out = HammingIndex.probe(spark, withNull, "id", "peak_hash", idx)
    assert(!out.collect().exists(r => r.getLong(0) == 999L || r.getLong(1) == 999L))
  }
}
