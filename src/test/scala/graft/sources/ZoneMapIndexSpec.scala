package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Zone-map skipping: a range-clustered layout prunes most files; a random
  * layout prunes none — and in both cases the pruned read is value-equal
  * to the full filter. */
class ZoneMapIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeLayout(clustered: Boolean): String = {
    val dir = Files.createTempDirectory("graft_zm").toString + "/t"
    val df = (0 until 4000).map(i => (i.toLong, s"r$i")).toDF("k", "payload")
    val laid =
      if (clustered) df.repartitionByRange(8, col("k"))
      else df.repartition(8, col("payload")) // key-uncorrelated layout
    laid.write.parquet(dir)
    dir
  }

  test("range-clustered layout: narrow range touches few files, same rows") {
    val dir = writeLayout(clustered = true)
    val full = spark.read.parquet(dir)
    val stats = ZoneMapIndex.stats(full, "k").persist()
    val nFiles = stats.count()
    assert(nFiles === 8L)
    val cand = ZoneMapIndex.candidateFiles(stats, lit(1000L), lit(1100L))
    assert(cand.length <= 2, s"expected <=2 of $nFiles files, got ${cand.length}")
    val got = ZoneMapIndex.readRange(spark, stats, "k", lit(1000L), lit(1100L))
      .as[(Long, String)].collect().sortBy(_._1)
    val want = full.filter(col("k").between(1000L, 1100L))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(got === want)
    stats.unpersist()
  }

  test("random layout: zone maps prune nothing but stay correct") {
    val dir = writeLayout(clustered = false)
    val full = spark.read.parquet(dir)
    val stats = ZoneMapIndex.stats(full, "k").persist()
    val cand = ZoneMapIndex.candidateFiles(stats, lit(1000L), lit(1100L))
    assert(cand.length === 8) // every file spans ~the full key range
    val got = ZoneMapIndex.readRange(spark, stats, "k", lit(1000L), lit(1100L)).count()
    assert(got === 101L)
    stats.unpersist()
  }

  test("empty intersection returns an empty, schema-preserving relation") {
    val dir = writeLayout(clustered = true)
    val stats = ZoneMapIndex.stats(spark.read.parquet(dir), "k")
    val out = ZoneMapIndex.readRange(spark, stats, "k", lit(99999L), lit(100000L))
    assert(out.count() === 0L)
    assert(out.columns.toSeq === Seq("k", "payload"))
  }
}
