package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Bloom file index: point probes skip most files even on a RANDOM layout
  * (where zone maps prune nothing), results stay exact through false
  * positives, and an absent key reads (almost) nothing. */
class BloomFileIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // key-uncorrelated layout: every file spans the full key range
  private def writeRandomLayout(): String = {
    val dir = Files.createTempDirectory("graft_bf").toString + "/t"
    (0 until 4000).map(i => (i.toLong, s"r$i")).toDF("k", "payload")
      .repartition(16, col("payload"))
      .write.parquet(dir)
    dir
  }

  test("point probe on random layout: few files touched, rows exact") {
    val dir = writeRandomLayout()
    val full = spark.read.parquet(dir)
    val stats = BloomFileIndex.build(full, "k").persist()
    assert(stats.count() === 16L)

    // zone maps are useless here: every file's [min,max] covers the probe
    val zm = ZoneMapIndex.stats(full, "k")
    assert(ZoneMapIndex.candidateFiles(zm, lit(1234L), lit(1234L)).length === 16)

    // the bloom accepts the ONE file holding k=1234 (+ rare false positives)
    val cand = BloomFileIndex.candidateFiles(stats, lit(1234L))
    assert(cand.nonEmpty && cand.length <= 3,
      s"expected ~1 of 16 files, got ${cand.length}")
    val got = BloomFileIndex.readPoint(spark, stats, "k", lit(1234L))
      .as[(Long, String)].collect()
    assert(got.toSeq === Seq((1234L, "r1234")))
    stats.unpersist()
  }

  test("absent key: candidates are only false positives, result is empty") {
    val dir = writeRandomLayout()
    val stats = BloomFileIndex.build(spark.read.parquet(dir), "k").persist()
    val cand = BloomFileIndex.candidateFiles(stats, lit(999999L))
    assert(cand.length <= 3, s"absent key accepted by ${cand.length} of 16 blooms")
    assert(BloomFileIndex.readPoint(spark, stats, "k", lit(999999L)).count() === 0L)
    stats.unpersist()
  }

  test("mismatched probe geometry is rejected, never a silent miss") {
    val dir = writeRandomLayout()
    val stats = BloomFileIndex.build(spark.read.parquet(dir), "k", numBits = 1 << 17)
    val e = intercept[IllegalArgumentException] {
      BloomFileIndex.candidateFiles(stats, lit(1234L)) // default 1 << 16
    }
    assert(e.getMessage.contains("geometry"))
  }

  test("stats table unioned from two geometries is rejected on every row") {
    val dir = writeRandomLayout()
    val full = spark.read.parquet(dir)
    // a first-row-only check would PASS this union (first row matches the
    // probe) while the 2^17 rows silently produce bloom false negatives
    val mixed = BloomFileIndex.build(full, "k")
      .unionByName(BloomFileIndex.build(full, "k", numBits = 1 << 17))
    val e = intercept[IllegalArgumentException] {
      BloomFileIndex.candidateFiles(mixed, lit(1234L))
    }
    assert(e.getMessage.contains("mixes"))
  }

  test("string keys hash consistently between build and probe") {
    val dir = Files.createTempDirectory("graft_bf").toString + "/t"
    (0 until 1000).map(i => (s"id_$i", i)).toDF("k", "v")
      .repartition(8, col("v"))
      .write.parquet(dir)
    val stats = BloomFileIndex.build(spark.read.parquet(dir), "k")
    val got = BloomFileIndex.readPoint(spark, stats, "k", lit("id_42"))
      .as[(String, Int)].collect()
    assert(got.toSeq === Seq(("id_42", 42)))
  }
}
