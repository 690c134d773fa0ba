package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.TextHash
import graft.operators.MinHashDedup

/** Persisted LSH index: the probe must equal the flat batch×corpus LSH
  * pipeline exactly (same bands, same prune, same Jaccard), and the
  * layout/meta contracts must hold. */
class LshIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cfg = MinHashDedup.Config(numHashes = 16, bands = 8, jaccardThreshold = 0.8)

  private def docs = {
    // corpus of near-identical templates + distinct noise; batch shares
    // the template family so cross near-dups exist
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val rows = (0 until 20).map { i =>
      (i.toLong, if (i % 4 == 0) base + s" suffix$i" else s"unique text nr $i " + ("filler " * i))
    }
    rows.toDF("doc_id", "text")
  }

  private def shingles = graft.functions.VectorExpressions
    .wordShingleHashes(col("text"), 3, TextHash.P)

  test("probe == flat LSH pipeline restricted to batch×corpus pairs") {
    val dir = java.nio.file.Files.createTempDirectory("lshidx").toString
    val corpus = docs.filter(col("doc_id") >= 10)
    val batch = docs.filter(col("doc_id") < 10)
    LshIndex.write(corpus, "doc_id", shingles, dir, cfg)
    val got = LshIndex.probe(spark, batch, "doc_id", shingles, dir, cfg)
      .as[(Long, Long, Double)].collect().toSet
    val flat = MinHashDedup.pairs(docs, "doc_id", shingles, cfg)
      .filter(col("id_a") < 10 && col("id_b") >= 10)
      .as[(Long, Long, Double)].collect().toSet
    assert(got === flat)
    assert(got.nonEmpty, "test corpus must produce at least one cross pair")
    spark.catalog.clearCache()
    graft.TempDirs.deleteRecursively(new java.io.File(dir))
  }

  test("bands and docs datasets are bucket-partitioned on disk") {
    val dir = java.nio.file.Files.createTempDirectory("lshidx").toString
    LshIndex.write(docs, "doc_id", shingles, dir, cfg, nParts = 8)
    def parts(sub: String) = new java.io.File(s"$dir/$sub").listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq
    assert(parts("bands").nonEmpty && parts("bands").forall(_.startsWith("pk=")))
    assert(parts("docs").nonEmpty && parts("docs").forall(_.startsWith("hb=")))
    assert(parts("bands").size <= 8 && parts("docs").size <= 8)
    spark.catalog.clearCache()
    graft.TempDirs.deleteRecursively(new java.io.File(dir))
  }

  test("append then probe == one-shot index over the full corpus") {
    val dirA = java.nio.file.Files.createTempDirectory("lshidx").toString
    val dirB = java.nio.file.Files.createTempDirectory("lshidx").toString
    val first = docs.filter(col("doc_id") >= 14) // split the corpus in two
    val second = docs.filter(col("doc_id") >= 10 && col("doc_id") < 14)
    val batch = docs.filter(col("doc_id") < 10)
    LshIndex.write(first, "doc_id", shingles, dirA, cfg)
    LshIndex.append(spark, second, "doc_id", shingles, dirA, cfg)
    LshIndex.write(docs.filter(col("doc_id") >= 10), "doc_id", shingles, dirB, cfg)
    val inc = LshIndex.probe(spark, batch, "doc_id", shingles, dirA, cfg)
      .as[(Long, Long, Double)].collect().toSet
    val full = LshIndex.probe(spark, batch, "doc_id", shingles, dirB, cfg)
      .as[(Long, Long, Double)].collect().toSet
    assert(inc === full)
    assert(inc.nonEmpty, "cross pairs must span the appended half")
    // a pair against an APPENDED doc must be present (doc 12 is a template)
    assert(inc.exists { case (_, cid, _) => cid >= 10 && cid < 14 })
    spark.catalog.clearCache()
    graft.TempDirs.deleteRecursively(new java.io.File(dirA))
    graft.TempDirs.deleteRecursively(new java.io.File(dirB))
  }

  test("append aborts on id collision before writing anything") {
    val dir = java.nio.file.Files.createTempDirectory("lshidx").toString
    LshIndex.write(docs, "doc_id", shingles, dir, cfg)
    val before = spark.read.parquet(s"$dir/docs").count()
    val e = intercept[IllegalArgumentException] {
      LshIndex.append(spark, docs.filter(col("doc_id") === 5), "doc_id",
        shingles, dir, cfg)
    }
    assert(e.getMessage.contains("duplicate"))
    assert(spark.read.parquet(s"$dir/docs").count() === before)
    spark.catalog.clearCache()
    graft.TempDirs.deleteRecursively(new java.io.File(dir))
  }

  test("dedup batch: corpus near-dups dropped, batchmate canonical kept, replay is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("lshidx").toString
    // corpus holds templates 12, 16; batch offers templates 0, 4 (near-dups
    // of the corpus AND of each other) plus unique docs 1, 2
    LshIndex.write(docs.filter(col("doc_id") >= 10), "doc_id", shingles, dir, cfg)
    val batch = docs.filter(col("doc_id") < 5)
    val sv = LshIndex.processDedupBatch(spark, batch, "doc_id", shingles, dir, cfg, 0L)
    assert(sv.isDefined)
    val kept = sv.get.select("doc_id").as[Long].collect().toSet
    assert(!kept.contains(0L) && !kept.contains(4L),
      s"corpus near-dups must be dropped, kept=$kept")
    assert(kept.contains(1L) && kept.contains(2L) && kept.contains(3L))
    // survivors are indexed: a fresh unique doc probes clean, a survivor
    // near-dup (doc 1's exact text) now collides with the index
    val docsN = spark.read.parquet(s"$dir/docs").count()
    assert(docsN === 10L + kept.size)
    // replay of the committed batch: no-op, nothing duplicated
    assert(LshIndex.processDedupBatch(spark, batch, "doc_id", shingles, dir, cfg, 0L).isEmpty)
    assert(spark.read.parquet(s"$dir/docs").count() === docsN)
    spark.catalog.clearCache()
    graft.TempDirs.deleteRecursively(new java.io.File(dir))
  }

  test("re-run after a lost marker converges: docs never duplicate, probes stay exact") {
    val dir = java.nio.file.Files.createTempDirectory("lshidx").toString
    LshIndex.write(docs.filter(col("doc_id") >= 10), "doc_id", shingles, dir, cfg)
    val batch = docs.filter(col("doc_id") < 5)
    LshIndex.processDedupBatch(spark, batch, "doc_id", shingles, dir, cfg, 7L)
    val docsN = spark.read.parquet(s"$dir/docs").count()
    val probeBefore = LshIndex.probe(spark,
        docs.filter(col("doc_id") === 8), "doc_id", shingles, dir, cfg)
      .as[(Long, Long, Double)].collect().toSet
    // simulate the replay of a crash AFTER the appends but BEFORE the
    // marker: delete the marker and reprocess the same batch
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$dir/commits/batch-7"))
    val sv2 = LshIndex.processDedupBatch(spark, batch, "doc_id", shingles, dir, cfg, 7L)
    assert(sv2.isDefined)
    assert(spark.read.parquet(s"$dir/docs").count() === docsN,
      "doc rows must not duplicate on replay")
    // duplicated band rows are benign: the probe result is unchanged
    val probeAfter = LshIndex.probe(spark,
        docs.filter(col("doc_id") === 8), "doc_id", shingles, dir, cfg)
      .as[(Long, Long, Double)].collect().toSet
    assert(probeAfter === probeBefore)
    assert(probeAfter.nonEmpty, "template doc 8 must match indexed templates")
    spark.catalog.clearCache()
    graft.TempDirs.deleteRecursively(new java.io.File(dir))
  }

  test("startDedupStream end to end: markers written, survivors reported") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("lshidx").toString
    val ckpt = java.nio.file.Files.createTempDirectory("lshidx_ck").toString
    LshIndex.write(docs.filter(col("doc_id") >= 10), "doc_id", shingles, dir, cfg)
    val mem = MemoryStream[(Long, String)]
    val seen = scala.collection.mutable.Set[Long]()
    val q = LshIndex.startDedupStream(spark, mem.toDF().toDF("doc_id", "text"),
      "doc_id", shingles, dir, ckpt, cfg,
      (sv, _) => seen ++= sv.select("doc_id").as[Long].collect())
    try {
      mem.addData(docs.filter(col("doc_id") < 5)
        .as[(Long, String)].collect().toSeq: _*)
      q.processAllAvailable()
      mem.addData(docs.filter(col("doc_id") >= 5 && col("doc_id") < 10)
        .as[(Long, String)].collect().toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(!seen.contains(0L) && !seen.contains(4L) && !seen.contains(8L),
      s"template docs must dedup against the corpus: $seen")
    assert(Set(1L, 2L, 3L, 5L, 6L, 7L, 9L).subsetOf(seen), s"uniques survive: $seen")
    assert(new java.io.File(s"$dir/commits").listFiles().nonEmpty)
    spark.catalog.clearCache()
    graft.TempDirs.deleteRecursively(new java.io.File(dir))
    graft.TempDirs.deleteRecursively(new java.io.File(ckpt))
  }

  test("multi-probe ingest finds at least the single-probe dups (survivors subset)") {
    // small index (2 bands × 8 rows) so multi-probe has recall headroom;
    // a dup found only via a perturbed bucket still exact-verifies, so
    // multi-probe survivors are a SUBSET of single-probe survivors
    val cfg2 = MinHashDedup.Config(numHashes = 16, bands = 2, jaccardThreshold = 0.8)
    val batch = docs.filter(col("doc_id") < 10)
    def survivorsWith(mp: Int): Set[Long] = {
      val dir = java.nio.file.Files.createTempDirectory("lshidx").toString
      LshIndex.write(docs.filter(col("doc_id") >= 10), "doc_id", shingles, dir, cfg2)
      val sv = LshIndex.processDedupBatch(spark, batch, "doc_id", shingles,
        dir, cfg2, 0L, multiProbe = mp).get
        .select("doc_id").as[Long].collect().toSet
      spark.catalog.clearCache()
      graft.TempDirs.deleteRecursively(new java.io.File(dir))
      sv
    }
    val s0 = survivorsWith(0)
    val s3 = survivorsWith(3)
    assert(s3.subsetOf(s0), s"multi-probe may only DROP more: $s3 vs $s0")
    assert(s3.nonEmpty, "uniques must still survive")
  }

  test("rival-claimed batch: waits for the rival's commit, then no-ops") {
    val dir = java.nio.file.Files.createTempDirectory("lshidx").toString
    LshIndex.write(docs.filter(col("doc_id") >= 10), "doc_id", shingles, dir, cfg)
    val batch = docs.filter(col("doc_id") > 0 && col("doc_id") < 4) // uniques
    val commits = java.nio.file.Paths.get(s"$dir/commits")
    java.nio.file.Files.createDirectories(commits)
    java.nio.file.Files.createFile(commits.resolve("claim-9")) // rival holds it
    val docsN = spark.read.parquet(s"$dir/docs").count()
    val t = new Thread(() => { // the rival commits while we wait
      Thread.sleep(300)
      java.nio.file.Files.createFile(commits.resolve("batch-9"))
    })
    t.start()
    val sv = LshIndex.processDedupBatch(spark, batch, "doc_id", shingles, dir,
      cfg, 9L, rivalWaitMs = 5000L)
    t.join()
    assert(sv.isEmpty, "losing the claim must defer to the rival's commit")
    assert(spark.read.parquet(s"$dir/docs").count() === docsN,
      "the loser must not append docs")
    spark.catalog.clearCache()
    graft.TempDirs.deleteRecursively(new java.io.File(dir))
  }

  test("stale claim (crashed rival) fails loudly instead of duplicating docs") {
    val dir = java.nio.file.Files.createTempDirectory("lshidx").toString
    LshIndex.write(docs.filter(col("doc_id") >= 10), "doc_id", shingles, dir, cfg)
    val batch = docs.filter(col("doc_id") > 0 && col("doc_id") < 4)
    val commits = java.nio.file.Paths.get(s"$dir/commits")
    java.nio.file.Files.createDirectories(commits)
    java.nio.file.Files.createFile(commits.resolve("claim-11"))
    val docsN = spark.read.parquet(s"$dir/docs").count()
    val e = intercept[IllegalStateException] {
      LshIndex.processDedupBatch(spark, batch, "doc_id", shingles, dir,
        cfg, 11L, rivalWaitMs = 200L)
    }
    assert(e.getMessage.contains("claim"))
    assert(spark.read.parquet(s"$dir/docs").count() === docsN)
    // operator removes the stale claim: the replay then converges
    java.nio.file.Files.delete(commits.resolve("claim-11"))
    assert(LshIndex.processDedupBatch(spark, batch, "doc_id", shingles, dir,
      cfg, 11L).isDefined)
    assert(spark.read.parquet(s"$dir/docs").count() === docsN + 3)
    spark.catalog.clearCache()
    graft.TempDirs.deleteRecursively(new java.io.File(dir))
  }

  test("append serializes on the index lock; stale lock fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("lshidx").toString
    LshIndex.write(docs.filter(col("doc_id") >= 14), "doc_id", shingles, dir, cfg)
    val lock = java.nio.file.Paths.get(s"$dir/append.lock")
    java.nio.file.Files.createFile(lock) // a rival append (or its corpse)
    val e = intercept[IllegalStateException] {
      LshIndex.append(spark, docs.filter(col("doc_id") >= 10 && col("doc_id") < 14),
        "doc_id", shingles, dir, cfg)
    }
    assert(e.getMessage.contains("append.lock"))
    java.nio.file.Files.delete(lock)
    LshIndex.append(spark, docs.filter(col("doc_id") >= 10 && col("doc_id") < 14),
      "doc_id", shingles, dir, cfg)
    assert(!java.nio.file.Files.exists(lock), "append must release the lock")
    assert(spark.read.parquet(s"$dir/docs").count() === 10L)
    spark.catalog.clearCache()
    graft.TempDirs.deleteRecursively(new java.io.File(dir))
  }

  test("multi-probe pairs are a superset of single-probe pairs, all verified exact") {
    val dir = java.nio.file.Files.createTempDirectory("lshidx").toString
    // small index (2 bands of 8 rows) so single-probe has room to miss
    val cfg2 = MinHashDedup.Config(numHashes = 16, bands = 2, jaccardThreshold = 0.8)
    val corpus = docs.filter(col("doc_id") >= 10)
    val batch = docs.filter(col("doc_id") < 10)
    LshIndex.write(corpus, "doc_id", shingles, dir, cfg2)
    val single = LshIndex.probe(spark, batch, "doc_id", shingles, dir, cfg2)
      .as[(Long, Long, Double)].collect().toSet
    val multi = LshIndex.probe(spark, batch, "doc_id", shingles, dir, cfg2, multiProbe = 3)
      .as[(Long, Long, Double)].collect().toSet
    assert(single.subsetOf(multi),
      s"multi-probe may only ADD pairs: ${single -- multi} missing")
    // every multi-probe pair is exact-verified at/above the threshold
    assert(multi.forall(_._3 >= cfg2.jaccardThreshold - 0.0005))
    spark.catalog.clearCache()
    graft.TempDirs.deleteRecursively(new java.io.File(dir))
  }

  test("second-minimum signature matches a direct per-permutation recompute") {
    val sh = MinHashDedup.hashed(docs, "doc_id", shingles)
    val sig2 = MinHashDedup.withSignature2(MinHashDedup.withSignature(sh, cfg), cfg)
    val rows = sig2.collect()
    val as = (0 until cfg.numHashes).map(TextHash.permA)
    val bs = (0 until cfg.numHashes).map(TextHash.permB)
    for (r <- rows) {
      val hashes = r.getSeq[Long](r.fieldIndex("hashes"))
      for (i <- 0 until cfg.numHashes) {
        val perms = hashes.map(h => (as(i) * h + bs(i)) % TextHash.P).sorted
        val expectMin = perms.head
        val expect2 = if (perms.length >= 2) perms(1) else perms.head
        assert(r.getLong(r.fieldIndex(s"s$i")) == expectMin)
        assert(r.getLong(r.fieldIndex(s"t$i")) == expect2, s"perm $i")
      }
    }
    spark.catalog.clearCache()
  }

  test("crashed rebuild (no _ready marker) refuses probes and appends; rebuild restores") {
    val dir = java.nio.file.Files.createTempDirectory("lshidx").toString
    LshIndex.write(docs, "doc_id", shingles, dir, cfg)
    // simulate the crash window: write() revokes _ready before its first
    // overwrite and recreates it after meta.json — absence means the data
    // trees and geometry sidecar may be MIXED generations
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$dir/_ready"))
    val batch = docs.filter(col("doc_id") < 5)
    val e1 = intercept[IllegalArgumentException] {
      LshIndex.probe(spark, batch, "doc_id", shingles, dir, cfg).collect()
    }
    assert(e1.getMessage.contains("_ready"))
    val e2 = intercept[IllegalArgumentException] {
      LshIndex.append(spark, batch, "doc_id", shingles, dir, cfg)
    }
    assert(e2.getMessage.contains("_ready"))
    // markReady = the pre-gate-index migration: an operator who KNOWS the
    // tree is consistent restores service without a rebuild
    LshIndex.markReady(dir)
    assert(LshIndex.probe(spark, batch, "doc_id", shingles, dir, cfg)
      .collect() != null)
    // a completed rebuild also recreates the marker
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$dir/_ready"))
    LshIndex.write(docs, "doc_id", shingles, dir, cfg)
    assert(LshIndex.probe(spark, batch, "doc_id", shingles, dir, cfg)
      .collect() != null)
    spark.catalog.clearCache()
    graft.TempDirs.deleteRecursively(new java.io.File(dir))
  }

  test("probe with mismatched band geometry is rejected") {
    val dir = java.nio.file.Files.createTempDirectory("lshidx").toString
    LshIndex.write(docs, "doc_id", shingles, dir, cfg)
    val bad = cfg.copy(bands = 4)
    val e = intercept[IllegalArgumentException] {
      LshIndex.probe(spark, docs, "doc_id", shingles, dir, bad)
    }
    assert(e.getMessage.contains("index meta"))
    spark.catalog.clearCache()
    graft.TempDirs.deleteRecursively(new java.io.File(dir))
  }
}
