package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class StatefulSessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def us(min: Long): Long = (1440 + min) * 60000000L
  private def ts(min: Long): Timestamp = new Timestamp((1440 + min) * 60000L)

  test("custom-state sessionizer matches the batch gap semantics incl. timeout emission") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val evs = mem.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "10 minutes")
      .as[StatefulSessionize.Ev]
    val q = StatefulSessionize.sessions(evs, gapSeconds = 1800)
      .writeStream.outputMode("append").format("memory").queryName("ss_out").start()
    try {
      // user 1: session A (0,10), then 40-min gap -> session B (50,60)
      mem.addData((1L, ts(0), 1.0), (1L, ts(10), 2.0))
      q.processAllAvailable()
      mem.addData((1L, ts(50), 3.0), (1L, ts(60), 4.0))
      q.processAllAvailable()
      // watermark far ahead -> session B times out and is emitted
      mem.addData((99L, ts(5000), 0.0))
      q.processAllAvailable()
      mem.addData((99L, ts(20000), 0.0))
      q.processAllAvailable()

      val out = spark.table("ss_out")
        .filter(col("user_id") === 1)
        .as[StatefulSessionize.SessionOut].collect()
        .map(s => (s.session_start_us, s.session_end_us, s.n_events, s.sum_value)).toSet
      assert(out == Set(
        (us(0), us(10), 2L, 3.0),
        (us(50), us(60), 2L, 7.0)))
    } finally q.stop()
  }
}
