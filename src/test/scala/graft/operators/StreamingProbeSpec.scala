package graft.operators

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Streaming ANN probes == batch probes of the same queries, under random
  * micro-batch slicing, for all three persisted index families. */
class StreamingProbeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  private lazy val e = Tables.embeddings(spark, dir)

  /** Drive `queries` through a probe stream in random slices; collect
    * every emitted row alongside the per-batch query attribution. */
  private def drive[T](
      rows: Seq[T], slices: Int, seed: Int)(
      startFn: (org.apache.spark.sql.DataFrame, (org.apache.spark.sql.DataFrame, Long) => Unit)
        => org.apache.spark.sql.streaming.StreamingQuery)(
      implicit enc: org.apache.spark.sql.Encoder[T]): Seq[org.apache.spark.sql.Row] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[T]
    val out = mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    val q = startFn(mem.toDF(), (res, _) => out.synchronized {
      out ++= res.collect()
    })
    try {
      val rng = new Random(seed)
      var rest = rows
      while (rest.nonEmpty) {
        val take = 1 + rng.nextInt(math.max(1, math.min(slices, rest.size)))
        mem.addData(rest.take(take): _*)
        q.processAllAvailable()
        rest = rest.drop(take)
      }
    } finally q.stop()
    out.toSeq
  }

  test("IVF probe stream == batch indexTopK under random slicing") {
    val idx = java.nio.file.Files.createTempDirectory("sp_ivf").toString
    KMeansIVF.writeIndex(e, "vec_id", "embedding", idx, sampleCap = 100)
    val queries = e.filter(col("vec_id") < 12)
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("embedding"))
      .as[(Long, Seq[Double])].collect().toSeq
    val ck = java.nio.file.Files.createTempDirectory("sp_ivf_ck").toString
    val got = drive(queries, slices = 4, seed = 7) { (df, cb) =>
      StreamingProbe.startIvf(
        df.toDF("vec_id", "embedding"), idx, "vec_id", "embedding",
        k = 3, nprobe = 2, ck, cb)
    }.map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val want = KMeansIVF.indexTopK(e.filter(col("vec_id") < 12), idx,
        "vec_id", "embedding", k = 3, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(got == want)
  }

  test("NSW probe stream == batch indexSearch under random slicing") {
    val p = NswGraph.Params()
    val idx = java.nio.file.Files.createTempDirectory("sp_nsw").toString
    NswGraph.writeIndex(e, "vec_id", "embedding", idx, p)
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("embedding"))
      .as[(Long, Seq[Double])].collect().toSeq
    val ck = java.nio.file.Files.createTempDirectory("sp_nsw_ck").toString
    val got = drive(queries, slices = 3, seed = 11) { (df, cb) =>
      StreamingProbe.startNsw(
        df.toDF("vec_id", "embedding"), idx, "vec_id", "embedding",
        k = 4, p, ck, cb)
    }.map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val want = NswGraph.indexSearch(e.filter(col("vec_id") < 10), idx,
        "vec_id", "embedding", k = 4, p)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(got == want)
  }

  test("IVF append stream: N micro-batches == one batch append; replay = original verdict") {
    val base = e.filter(col("vec_id") % 2 === 0)
    val odds = e.filter(col("vec_id") % 2 =!= 0)
    val idx = java.nio.file.Files.createTempDirectory("sp_ivfapp").toString
    KMeansIVF.writeIndex(base, "vec_id", "embedding", idx, sampleCap = 100)

    val chunk1 = odds.filter(col("vec_id") % 8 === 1)
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("embedding"))
      .as[(Long, Seq[Double])].collect().toSeq
    val chunk2 = odds.filter(col("vec_id") % 8 === 3)
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("embedding"))
      .as[(Long, Seq[Double])].collect().toSeq
    val chunk3 = odds.filter(col("vec_id") % 8 === 5 || col("vec_id") % 8 === 7)
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("embedding"))
      .as[(Long, Seq[Double])].collect().toSeq

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Double])]
    val verdicts = mutable.ArrayBuffer.empty[(KMeansIVF.AppendResult, Long)]
    val compactions = mutable.ArrayBuffer.empty[Long]
    val ck = java.nio.file.Files.createTempDirectory("sp_ivfapp_ck").toString
    val q = StreamingProbe.startIvfAppend(
      mem.toDF().toDF("vec_id", "embedding"), idx, "vec_id", "embedding", ck,
      (v, bid) => verdicts.synchronized { verdicts += ((v, bid)) },
      compactEvery = 2,
      cnt => compactions.synchronized { compactions += cnt })
    try {
      mem.addData(chunk1: _*); q.processAllAvailable()
      mem.addData(chunk2: _*); q.processAllAvailable()
      mem.addData(chunk3: _*); q.processAllAvailable()
    } finally q.stop()

    assert(verdicts.map(_._2).toSeq == Seq(0L, 1L, 2L))
    assert(verdicts.map(_._1.nBatch).sum == odds.count())
    // EDGE trigger: fires at the crossing (committed = 2), stays silent on
    // the next batch (committed = 3 — a level trigger would re-signal an
    // operator that already compacted and is waiting to repoint)
    assert(compactions.toSeq == Seq(2L),
      "the compaction trigger must fire exactly once per threshold crossing")

    // probe-equivalence: the streamed tree serves exactly what ONE batch
    // append of the same rows serves (same deterministic base fit)
    val ref = java.nio.file.Files.createTempDirectory("sp_ivfapp_ref").toString
    KMeansIVF.writeIndex(base, "vec_id", "embedding", ref, sampleCap = 100)
    KMeansIVF.appendIndex(odds, "vec_id", "embedding", ref, "b1")
    val qs = e.filter(col("vec_id") < 10)
    def probeSet(d: String) = KMeansIVF.indexTopK(qs, d, "vec_id", "embedding",
        k = 3, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(probeSet(idx) == probeSet(ref),
      "N streamed appends must serve the same index as one batch append")

    // exactly-once under retry: a redelivery of batch 0 (same batchId)
    // writes nothing and returns the ORIGINAL verdict verbatim
    val replay = KMeansIVF.appendIndex(
      chunk1.toDF("vec_id", "embedding"), "vec_id", "embedding", idx, "s0")
    assert(replay == verdicts.head._1,
      "checkpoint replay must return the persisted verdict, not recompute")
  }

  test("IVF+PQ and NSW append streams: N micro-batches == one batch append") {
    val base = e.filter(col("vec_id") % 2 === 0)
    val odds = e.filter(col("vec_id") % 2 =!= 0)
    val chunk1 = odds.filter(col("vec_id") % 4 === 1)
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("embedding"))
      .as[(Long, Seq[Double])].collect().toSeq
    val chunk2 = odds.filter(col("vec_id") % 4 === 3)
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("embedding"))
      .as[(Long, Seq[Double])].collect().toSeq
    implicit val sqlCtx = spark.sqlContext
    val qs = e.filter(col("vec_id") < 10)

    // IVF+PQ family
    val pqIdx = java.nio.file.Files.createTempDirectory("sp_pqapp").toString
    IvfPq.writeIndex(base, "vec_id", "embedding", pqIdx,
      ivfSampleCap = 100, pqSampleCap = 500)
    val pqVerdicts = mutable.ArrayBuffer.empty[IvfPq.AppendResult]
    val memPq = MemoryStream[(Long, Seq[Double])]
    val qPq = StreamingProbe.startIvfPqAppend(
      memPq.toDF().toDF("vec_id", "embedding"), pqIdx, "vec_id", "embedding",
      java.nio.file.Files.createTempDirectory("sp_pqapp_ck").toString,
      (v, _) => pqVerdicts.synchronized { pqVerdicts += v })
    try {
      memPq.addData(chunk1: _*); qPq.processAllAvailable()
      memPq.addData(chunk2: _*); qPq.processAllAvailable()
    } finally qPq.stop()
    assert(pqVerdicts.map(_.nBatch).sum == odds.count())
    val pqRef = java.nio.file.Files.createTempDirectory("sp_pqapp_ref").toString
    IvfPq.writeIndex(base, "vec_id", "embedding", pqRef,
      ivfSampleCap = 100, pqSampleCap = 500)
    IvfPq.appendIndex(odds, "vec_id", "embedding", pqRef, "b1")
    def pqProbe(d: String) = IvfPq.probeTopK(qs, e, d, "vec_id", "embedding",
        k = 3, nprobe = 2, shortlist = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(pqProbe(pqIdx) == pqProbe(pqRef))

    // NSW family
    val p = NswGraph.Params(hubCap = 32, m = 4, beamWidth = 3, rounds = 3,
      nprobe = 4, nEntries = 4)
    val nswIdx = java.nio.file.Files.createTempDirectory("sp_nswapp").toString
    NswGraph.writeIndex(base, "vec_id", "embedding", nswIdx, p)
    val nswVerdicts = mutable.ArrayBuffer.empty[KMeansIVF.AppendResult]
    val memNsw = MemoryStream[(Long, Seq[Double])]
    val qNsw = StreamingProbe.startNswAppend(
      memNsw.toDF().toDF("vec_id", "embedding"), nswIdx, "vec_id", "embedding",
      java.nio.file.Files.createTempDirectory("sp_nswapp_ck").toString,
      (v, _) => nswVerdicts.synchronized { nswVerdicts += v })
    try {
      memNsw.addData(chunk1: _*); qNsw.processAllAvailable()
      memNsw.addData(chunk2: _*); qNsw.processAllAvailable()
    } finally qNsw.stop()
    assert(nswVerdicts.map(_.nBatch).sum == odds.count())
    val nswRef = java.nio.file.Files.createTempDirectory("sp_nswapp_ref").toString
    NswGraph.writeIndex(base, "vec_id", "embedding", nswRef, p)
    NswGraph.appendIndex(odds, "vec_id", "embedding", nswRef, "b1")
    def nswSearch(d: String) = NswGraph.indexSearch(qs, d, "vec_id", "embedding", k = 3, p)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(nswSearch(nswIdx) == nswSearch(nswRef))
  }

  test("hierarchical NSW probe stream == batch indexSearchHier under random slicing") {
    val p = NswGraph.Params()
    val hp = NswGraph.HierParams(superCap = 8, superEntries = 2,
      superRounds = 2, hubRounds = 3)
    val idx = java.nio.file.Files.createTempDirectory("sp_nswh").toString
    NswGraph.writeIndex(e, "vec_id", "embedding", idx, p)
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("embedding"))
      .as[(Long, Seq[Double])].collect().toSeq
    val ck = java.nio.file.Files.createTempDirectory("sp_nswh_ck").toString
    val got = drive(queries, slices = 3, seed = 19) { (df, cb) =>
      StreamingProbe.startNswHier(
        df.toDF("vec_id", "embedding"), idx, "vec_id", "embedding",
        k = 4, p, hp, ck, cb)
    }.map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val want = NswGraph.indexSearchHier(e.filter(col("vec_id") < 10), idx,
        "vec_id", "embedding", k = 4, p, hp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(got == want)
  }

  test("Hamming probe stream == batch probe under random slicing") {
    val idx = java.nio.file.Files.createTempDirectory("sp_ham").toString
    val corpus = (1L to 30L).map(i => (i, i * 16L + 5L)).toDF("doc_id", "fp")
    graft.sources.HammingIndex.write(corpus, "doc_id", "fp", idx, bits = 56)
    val queries = (1L to 30L).map(i => (i, i * 16L + 5L))
    val ck = java.nio.file.Files.createTempDirectory("sp_ham_ck").toString
    val got = drive(queries, slices = 5, seed = 13) { (df, cb) =>
      StreamingProbe.startHamming(
        df.toDF("doc_id", "fp"), idx, "doc_id", "fp", maxHamming = 3, ck, cb)
    }.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = graft.sources.HammingIndex.probe(
        spark, queries.toDF("doc_id", "fp"), "doc_id", "fp", idx, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want)
    assert(got.nonEmpty, "the 16i+5 fingerprint family plants near-dups")
  }
}
