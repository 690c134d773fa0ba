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

  test("null fingerprints are skipped on both sides") {
    val idx = java.nio.file.Files.createTempDirectory("ham_idx3").toString
    val withNull = fps(0L until 8L).unionByName(
      Seq((999L, null.asInstanceOf[java.lang.Long])).toDF("id", "peak_hash"))
    HammingIndex.write(withNull, "id", "peak_hash", idx, bits = 56)
    val out = HammingIndex.probe(spark, withNull, "id", "peak_hash", idx)
    assert(!out.collect().exists(r => r.getLong(0) == 999L || r.getLong(1) == 999L))
  }
}
