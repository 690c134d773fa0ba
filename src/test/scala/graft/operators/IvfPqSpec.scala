package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Composed IVF+PQ index: codes-only partitioned layout, partition-pruned
  * ADC probe, exact re-rank parity with brute force when nothing is
  * pruned. */
class IvfPqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("index stores codes only — no vector column — and sidecars round-trip") {
    val idx = java.nio.file.Files.createTempDirectory("ivfpq_idx").toString
    val e = Tables.embeddings(spark, dir)
    val (cents, cb) = IvfPq.writeIndex(e, "vec_id", "embedding", idx,
      ivfSampleCap = 100, pqSampleCap = 500)
    assert(KMeansIVF.readCentroids(idx).map(_.toSeq).toSeq ==
      cents.map(_.toSeq).toSeq)
    val rcb = IvfPq.readCodebooks(idx)
    assert(rcb.map(_.map(_.toSeq).toSeq).toSeq == cb.map(_.map(_.toSeq).toSeq).toSeq,
      "codebook sidecar must round-trip exactly")
    val schema = spark.read.parquet(s"$idx/data").schema
    assert(schema.fieldNames.sorted.toSeq == Seq("bucket", "codes", "neighbor_id"),
      s"index schema must be codes-only, got ${schema.fieldNames.toSeq}")
  }

  test("interrupted (re)build leaves no _ready; probes fail loudly, not on stale sidecars") {
    val idx = java.nio.file.Files.createTempDirectory("ivfpq_ready").toString
    val e = Tables.embeddings(spark, dir)
    IvfPq.writeIndex(e, "vec_id", "embedding", idx,
      ivfSampleCap = 100, pqSampleCap = 500)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$idx/_ready")),
      "a completed build must commit the readiness marker")
    // simulate a rebuild that crashed after the data write but before the
    // sidecars: the marker is revoked first, so the probe must abort
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$idx/_ready"))
    val q = e.filter(col("vec_id") < 3)
    val ex = intercept[IllegalArgumentException] {
      IvfPq.probeTopK(q, e, idx, "vec_id", "embedding",
        k = 3, nprobe = 2, shortlist = 10)
    }
    assert(ex.getMessage.contains("_ready"))
  }

  test("probe plan carries a bucket partition filter and scans no vector column") {
    val idx = java.nio.file.Files.createTempDirectory("ivfpq_probe").toString
    val e = Tables.embeddings(spark, dir)
    IvfPq.writeIndex(e, "vec_id", "embedding", idx,
      ivfSampleCap = 100, pqSampleCap = 500)
    val q = e.filter(col("vec_id") < 5)
    val res = IvfPq.probeTopK(q, e, idx, "vec_id", "embedding",
      k = 3, nprobe = 2, shortlist = 10)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"expected bucket partition pruning in:\n${plan.take(3000)}")
    // the INDEX scan (the parquet under idx) must read only id + codes;
    // the re-rank scan over the primary store legitimately reads vectors
    val idxScans = plan.linesIterator.filter(_.contains(idx)).mkString("\n")
    assert(idxScans.nonEmpty && !idxScans.contains("embedding") &&
      !idxScans.contains("cvq"),
      s"index scan must not read a vector column:\n$idxScans")
    assert(res.count() > 0)
  }

  test("nprobe=all + shortlist=corpus degenerates to the exact integer top-k") {
    val idx = java.nio.file.Files.createTempDirectory("ivfpq_exact").toString
    val e = Tables.embeddings(spark, dir)
    val n = e.count().toInt
    IvfPq.writeIndex(e, "vec_id", "embedding", idx,
      ivfSampleCap = 100, pqSampleCap = 500)
    val q = e.filter(col("vec_id") < 3)
    val res = IvfPq.probeTopK(q, e, idx, "vec_id", "embedding",
        k = 3, nprobe = 10, shortlist = n)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    // brute-force exact integer micro² L2 reference
    val cm = e.select(col("vec_id"),
      ProductQuantizer.micro(col("embedding")).as("vq"))
    val all = cm.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val brute = for {
      qid <- Seq(0L, 1L, 2L).filter(all.contains)
      qv = all(qid)
      (rank, (nid, d2)) <- all.toSeq.filter(_._1 != qid)
        .map { case (nid, v) =>
          var d = 0L; var i = 0
          while (i < v.length) { val df = qv(i) - v(i); d += df * df; i += 1 }
          (nid, d)
        }
        .sortBy { case (nid, d) => (d, nid) }.take(3).zipWithIndex.map(_.swap)
    } yield (qid, rank + 1, nid, d2)
    assert(res == brute.toSet,
      "unpruned probe must equal the exact integer top-k")
  }
}
