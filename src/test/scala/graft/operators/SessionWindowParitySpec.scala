package graft.operators

import java.sql.Timestamp

import scala.util.Random

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q167's operator under STREAMING: Spark's built-in `session_window`
  * aggregation run over a MemoryStream in append mode must finalize
  * exactly the sessions the same aggregation computes in batch —
  * regardless of how the input is sliced into micro-batches or ordered
  * within the watermark allowance. (Append mode emits a session only
  * after the watermark passes it, so every emission is final — the
  * exactly-once discipline the other Streaming* operators prove.)
  */
class SessionWindowParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Long): Timestamp = new Timestamp((1440 + min) * 60000L)

  test("built-in session_window: streaming append == batch (random order + slicing)") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new Random(20260814L)
    val events = for (u <- 1L to 5L; _ <- 1 to 40)
      yield (u, ts(rnd.nextInt(600)), rnd.nextInt(1000).toLong)

    val batch = events.toDF("user_id", "ts", "cents")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sc"))
      .select(col("user_id"), col("sw.start"), col("sw.end"), col("n"), col("sc"))
      .as[(Long, Timestamp, Timestamp, Long, Long)].collect().toSet

    val mem = MemoryStream[(Long, Timestamp, Long)]
    // watermark delay exceeds the whole event span: random arrival order
    // can never be late, so streaming must reproduce batch EXACTLY
    val q = mem.toDF().toDF("user_id", "ts", "cents")
      .withWatermark("ts", "700 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sc"))
      .select(col("user_id"), col("sw.start"), col("sw.end"), col("n"), col("sc"))
      .writeStream.outputMode("append").format("memory").queryName("sw_out").start()
    try {
      val shuffled = rnd.shuffle(events)
      var rest = shuffled
      while (rest.nonEmpty) {
        val k = 1 + rnd.nextInt(60)
        mem.addData(rest.take(k))
        q.processAllAvailable()
        rest = rest.drop(k)
      }
      // flush: watermark advances at batch END, and finalization happens on
      // the NEXT trigger — so two far-future rounds (the fMGWS spec trap
      // applies to the built-in operator too)
      mem.addData((99L, ts(100000), 0L))
      q.processAllAvailable()
      mem.addData((99L, ts(200000), 0L))
      q.processAllAvailable()

      val streamed = spark.table("sw_out")
        .filter(col("user_id") =!= 99L)
        .as[(Long, Timestamp, Timestamp, Long, Long)].collect()
      assert(streamed.length == streamed.toSet.size, "duplicate emissions")
      assert(streamed.toSet == batch)
    } finally q.stop()
  }
}
