package graft.operators

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.Md5LongUtil

/** Bottom-k-hash stream sampling: deterministic (no RNG), batch == stream
  * on any micro-batch slicing, uniform winners fixed by the hash alone. */
class StreamingSampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val k = 3
  private val records: Seq[(String, Long)] =
    (1L to 40L).map(i => (if (i % 2 == 0) "even" else "odd", i))

  private def refSample(rows: Seq[(String, Long)]): Map[String, Seq[Long]] =
    rows.groupBy(_._1).view.mapValues { rs =>
      rs.map(_._2).distinct
        .sortBy(id => Md5LongUtil.hashBytes(id.toString.getBytes("UTF-8")))
        .take(k)
    }.toMap

  test("batch bottom-k == pure reference (exact long ordering)") {
    val got = StreamingSample.batchBottomK(records.toDF("key", "id"), "key", "id", k)
      .as[(String, Seq[Long])].collect().toMap
    assert(got === refSample(records))
  }

  test("stream final sample == batch, for any micro-batch slicing") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    for (sliceAt <- Seq(1, 13, 39)) {
      val mem = MemoryStream[(String, Long)]
      val q = StreamingSample.sampled(
          mem.toDF().toDF("key", "id").as[StreamingSample.Rec], k)
        .writeStream.format("memory").queryName(s"bk_$sliceAt")
        .outputMode("update").start()
      try {
        val (a, b) = records.splitAt(sliceAt)
        mem.addData(a); q.processAllAvailable()
        mem.addData(b); q.processAllAvailable()
        // last emitted row per key is the current sample
        val got = spark.table(s"bk_$sliceAt").as[StreamingSample.Sample]
          .collect().groupBy(_.key).view.mapValues(_.last.ids.toSeq).toMap
        assert(got === refSample(records), s"sliceAt=$sliceAt")
      } finally q.stop()
    }
  }

  test("a replayed record cannot change the sample (set semantics, both paths)") {
    val withDups = records ++ records.take(10)
    val batch = StreamingSample.batchBottomK(withDups.toDF("key", "id"), "key", "id", k)
      .as[(String, Seq[Long])].collect().toMap
    assert(batch === refSample(records))
    // streaming: fold the duplicated feed through the state logic directly
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val q = StreamingSample.sampled(
        mem.toDF().toDF("key", "id").as[StreamingSample.Rec], k)
      .writeStream.format("memory").queryName("bk_dup")
      .outputMode("update").start()
    try {
      mem.addData(records); q.processAllAvailable()
      mem.addData(records.take(10)); q.processAllAvailable() // replay
      val got = spark.table("bk_dup").as[StreamingSample.Sample]
        .collect().groupBy(_.key).view.mapValues(_.last.ids.toSeq).toMap
      assert(got === refSample(records))
    } finally q.stop()
  }
}
