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
