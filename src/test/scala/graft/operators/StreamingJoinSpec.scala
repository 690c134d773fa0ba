package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class StreamingJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // offset well past epoch 0: the initial watermark is epoch 0 and rows AT
  // the watermark sit on the eviction boundary
  private def ts(min: Long): Timestamp = new Timestamp((1440 + min) * 60000L)

  test("stream-stream interval join matches within the lookback only") {
    implicit val sqlCtx = spark.sqlContext
    val errMem = MemoryStream[(Long, Timestamp, String)]
    val purMem = MemoryStream[(Long, Timestamp, Double)]
    val errors = errMem.toDF().toDF("user_id", "e_ts", "err_tag")
    val purchases = purMem.toDF().toDF("p_user", "p_ts", "amount")

    val joined = StreamingJoin.withinLookback(
      errors, purchases.withColumnRenamed("p_user", "user_id"),
      "user_id", "e_ts", "p_ts", lookbackSeconds = 3600, watermark = "30 minutes")
      .select(errors("user_id"), $"err_tag", $"amount")

    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()
    try {
      purMem.addData((1L, ts(0), 10.0), (1L, ts(30), 20.0), (2L, ts(10), 99.0))
      errMem.addData((1L, ts(45), "e1"))   // both purchases within 60 min
      q.processAllAvailable()
      purMem.addData((1L, ts(200), 30.0))
      errMem.addData((1L, ts(290), "e2"))  // 90 min after -> outside lookback
      q.processAllAvailable()
      val out = spark.table("ssj_out").as[(Long, String, Double)].collect().toSet
      assert(out == Set((1L, "e1", 10.0), (1L, "e1", 20.0)))
    } finally q.stop()
  }

  test("batch mode: same operator, plain conditional join") {
    val errors = Seq((1L, ts(45), "e1")).toDF("user_id", "e_ts", "err_tag")
    val purchases = Seq((1L, ts(0), 10.0), (1L, ts(44), 20.0), (1L, ts(46), 30.0))
      .toDF("user_id", "p_ts", "amount")
    val out = StreamingJoin.withinLookback(
      errors, purchases, "user_id", "e_ts", "p_ts", lookbackSeconds = 3600)
      .select("err_tag", "amount").collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(out == Set(("e1", 10.0), ("e1", 20.0))) // 46 is after the error
  }
}
