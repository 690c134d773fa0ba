package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Persisted IVF index: bucket-partitioned layout, centroid sidecar,
  * partition-pruned query scans. */
class IvfIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("index round-trip equals the inline k-means ANN, with bucket-pruned scans") {
    val idx = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    val e = Tables.embeddings(spark, dir)
    val cents = KMeansIVF.writeIndex(e, "vec_id", "embedding", idx)
    assert(cents.length == 10 && KMeansIVF.readCentroids(idx).map(_.toSeq).toSeq ==
      cents.map(_.toSeq).toSeq, "centroid sidecar must round-trip exactly")

    val q = e.filter(col("vec_id") < 10)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val inline = rows(KMeansIVF.ivfTopK(q, e, "vec_id", "embedding", k = 3, nprobe = 2))
    val fromIndex = KMeansIVF.indexTopK(q, idx, "vec_id", "embedding", k = 3, nprobe = 2)
    assert(rows(fromIndex) == inline,
      "same deterministic fit => identical results from the persisted index")

    // the scan must carry a partition filter on bucket (pruned directories)
    val plan = fromIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"expected bucket partition pruning in:\n${plan.take(2000)}")
  }

  test("nprobe=nClusters index query degenerates to the exact scan") {
    val idx = java.nio.file.Files.createTempDirectory("ivf_idx_full").toString
    val e = Tables.embeddings(spark, dir)
    KMeansIVF.writeIndex(e, "vec_id", "embedding", idx)
    val q = e.filter(col("vec_id") < 5)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(VectorOps.topK(q, e, "vec_id", "embedding", k = 3))
    val full = pairs(KMeansIVF.indexTopK(q, idx, "vec_id", "embedding", k = 3, nprobe = 10))
    assert(full == exact)
  }

  test("selfTopK: all-corpus kNN graph with NO corpus-sized broadcast (q301's build)") {
    val e = Tables.embeddings(spark, dir)
    val self = KMeansIVF.selfTopK(e, "vec_id", "embedding",
      k = 3, nprobe = 2, sampleCap = 100)

    // plan pin on the PRE-AQE sparkPlan (the adaptive wrapper hides
    // exchanges): the probe x assignment join must be a shuffled hash
    // join — broadcasting EITHER side means broadcasting the corpus,
    // the plan that OOMs at 100 TB
    val plan = self.queryExecution.sparkPlan.toString
    assert(!plan.contains("BroadcastHashJoin") && !plan.contains("BroadcastExchange"),
      s"corpus-derived side must not broadcast:\n${plan.take(3000)}")
    assert(plan.contains("ShuffledHashJoin"),
      s"expected the pinned shuffle hash join:\n${plan.take(3000)}")

    // result parity: same fit, same probes, same rank cut as the
    // broadcast formulation — only the physical join strategy differs
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val viaBroadcast = rows(KMeansIVF.ivfTopK(e, e, "vec_id", "embedding",
      k = 3, nprobe = 2, sampleCap = 100))
    assert(rows(self) == viaBroadcast)
  }
}
