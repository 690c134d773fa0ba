package graft.operators

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.Md5LongUtil

/** Streaming weighted reservoir: deterministic min-of-trials race keys,
  * batch == stream on any micro-batch slicing, replay idempotence, and
  * agreement with the global [[WeightedSample.sampleK]] on one group. */
class StreamingWeightedSampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val k = 4
  // weights cycle 1..5, deterministic per id
  private val records: Seq[(String, Long, Long)] =
    (1L to 60L).map(i => (if (i % 2 == 0) "even" else "odd", i, 1L + i % 5))

  private def key(id: Long, w: Long): Long =
    Md5LongUtil.minTrial(
      org.apache.spark.unsafe.types.UTF8String.fromString(id.toString),
      w, WeightedSample.Mod)

  private def refSample(rows: Seq[(String, Long, Long)]): Map[String, Seq[Long]] =
    rows.groupBy(_._1).view.mapValues { rs =>
      rs.map(r => (r._2, r._3)).distinct
        .sortBy { case (id, w) => (key(id, w), id) }
        .take(k).map(_._1)
    }.toMap

  test("batch weighted bottom-k == pure reference") {
    val got = StreamingWeightedSample.batchWeightedBottomK(
        records.toDF("key", "id", "weight"), "key", "id", "weight", k)
      .as[(String, Seq[Long])].collect().toMap
    assert(got === refSample(records))
  }

  test("stream final sample == batch, for any micro-batch slicing") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    for (sliceAt <- Seq(1, 17, 59)) {
      val mem = MemoryStream[(String, Long, Long)]
      val q = StreamingWeightedSample.sampled(
          mem.toDF().toDF("key", "id", "weight").as[StreamingWeightedSample.Rec], k)
        .writeStream.format("memory").queryName(s"wbk_$sliceAt")
        .outputMode("update").start()
      try {
        val (a, b) = records.splitAt(sliceAt)
        mem.addData(a); q.processAllAvailable()
        mem.addData(b); q.processAllAvailable()
        val got = spark.table(s"wbk_$sliceAt").as[StreamingWeightedSample.Sample]
          .collect().groupBy(_.key).view.mapValues(_.last.ids.toSeq).toMap
        assert(got === refSample(records), s"sliceAt=$sliceAt")
      } finally q.stop()
    }
  }

  test("replayed records are no-ops, even claiming a different weight") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val q = StreamingWeightedSample.sampled(
        mem.toDF().toDF("key", "id", "weight").as[StreamingWeightedSample.Rec], k)
      .writeStream.format("memory").queryName("wbk_dup")
      .outputMode("update").start()
    try {
      mem.addData(records); q.processAllAvailable()
      // exact replay of a prefix: keys recompute identically, all no-ops
      mem.addData(records.take(10)); q.processAllAvailable()
      // and an id currently IN the sample re-arriving with an inflated
      // weight is ALSO a no-op (the id guard: weight is an id property;
      // only evicted ids would recompute, and those keep their weight)
      val ref = refSample(records)
      val inflated = records
        .filter { case (g, id, _) => ref(g).contains(id) }
        .map { case (g, id, w) => (g, id, w + 50) }
      mem.addData(inflated); q.processAllAvailable()
      val got = spark.table("wbk_dup").as[StreamingWeightedSample.Sample]
        .collect().groupBy(_.key).view.mapValues(_.last.ids.toSeq).toMap
      assert(got === refSample(records))
    } finally q.stop()
  }

  test("single group batch path agrees with WeightedSample.sampleK") {
    val one = records.map { case (_, id, w) => ("all", id, w) }
    val viaBottomK = StreamingWeightedSample.batchWeightedBottomK(
        one.toDF("key", "id", "weight"), "key", "id", "weight", k)
      .as[(String, Seq[Long])].collect().head._2
    val viaSampleK = WeightedSample.sampleK(
        one.toDF("key", "id", "weight"), "id", "weight", k)
      .orderBy("rank").as[(Long, Long, Int)].collect().map(_._1).toSeq
    assert(viaBottomK == viaSampleK)
  }
}
