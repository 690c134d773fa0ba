package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Streaming CUSUM: the 2-long closed form equals the textbook max(0, ·)
  * recursion event-for-event, and emissions are invariant to micro-batch
  * slicing (in-order delivery). */
class StreamingCusumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private case class In(key: String, eventId: Long, sec: Long, x: Long)

  // key "a" drifts up mid-stream (alarm expected), key "b" stays on
  // target with negative excursions (runmin < 0 exercised, no alarm)
  private val feed: Seq[In] = {
    val a = Seq(10L, 9L, 11L, 30L, 32L, 31L, 33L).zipWithIndex.map {
      case (v, i) => In("a", 100L + i, 10L * i, v)
    }
    val b = Seq(5L, 3L, 4L, 6L, 2L, 5L).zipWithIndex.map {
      case (v, i) => In("b", 200L + i, 7L * i, v)
    }
    (a ++ b).sortBy(_.sec)
  }

  private val (target, slack, threshold) = (10L, 2L, 40L)

  /** Textbook recursion: S_t = max(0, S_{t-1} + (x - µ - κ)). */
  private def refStats(rows: Seq[In]): Map[Long, (Long, Boolean)] =
    rows.groupBy(_.key).flatMap { case (_, rs) =>
      var s = 0L
      rs.sortBy(r => (r.sec, r.eventId)).map { r =>
        s = math.max(0L, s + (r.x - target - slack))
        r.eventId -> ((s, s > threshold))
      }
    }

  private def toDf(rows: Seq[In]) =
    rows.map(r => (r.key, r.eventId, new Timestamp(r.sec * 1000L), r.x))
      .toDF("key", "event_id", "ts", "x")

  test("batch stats == textbook max(0,·) recursion; drift alarms, noise doesn't") {
    val got = StreamingCusum.stats(toDf(feed), target, slack, threshold)
      .collect().map(o => o.eventId -> ((o.s, o.alarm))).toMap
    assert(got === refStats(feed))
    assert(got.filter(_._2._2).keySet.nonEmpty, "the drift must alarm")
    assert(feed.filter(_.key == "b").forall(r => !got(r.eventId)._2),
      "on-target key must never alarm")
  }

  test("streaming: emissions invariant to micro-batch slicing, state is 2 longs") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    for (sliceAt <- Seq(1, 5, 9)) {
      val mem = MemoryStream[(String, Long, Timestamp, Long)]
      val q = StreamingCusum.stats(
          mem.toDF().toDF("key", "event_id", "ts", "x"), target, slack, threshold)
        .writeStream.format("memory").queryName(s"cusum_$sliceAt")
        .outputMode("append").start()
      try {
        val (a, b) = feed.map(r =>
          (r.key, r.eventId, new Timestamp(r.sec * 1000L), r.x)).splitAt(sliceAt)
        mem.addData(a); q.processAllAvailable()
        mem.addData(b); q.processAllAvailable()
        val got = spark.table(s"cusum_$sliceAt")
          .as[StreamingCusum.Out]
          .collect().map(o => o.eventId -> ((o.s, o.alarm))).toMap
        assert(got === refStats(feed), s"sliceAt=$sliceAt")
      } finally q.stop()
    }
  }

  test("streaming: sub-watermark late rows are dropped, not folded out of order") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Long, Timestamp, Long)]
    val q = StreamingCusum.stats(
        mem.toDF().toDF("key", "event_id", "ts", "x")
          .withWatermark("ts", "10 seconds"), target, slack, threshold)
      .writeStream.format("memory").queryName("cusum_late")
      .outputMode("append").start()
    try {
      def ts(sec: Long) = new Timestamp(sec * 1000L)
      mem.addData(("a", 1L, ts(100), 20L), ("a", 2L, ts(110), 20L))
      q.processAllAvailable() // watermark now 110 - 10 = 100 s
      // event 3 is 50 s old (< wm): must be dropped; event 4 is on time
      mem.addData(("a", 3L, ts(50), 999L), ("a", 4L, ts(120), 20L))
      q.processAllAvailable()
      val got = spark.table("cusum_late").as[StreamingCusum.Out]
        .collect().map(o => o.eventId -> o.s).toMap
      // fold over events 1,2,4 only: dev = 20-10-2 = 8 each
      assert(got === Map(1L -> 8L, 2L -> 16L, 4L -> 24L),
        "the late row must neither emit nor perturb later emissions")
    } finally q.stop()
  }

  test("streaming: expireAfterUs expires idle keys; a re-appearing key restarts at zero") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Long, Timestamp, Long)]
    val q = StreamingCusum.stats(
        mem.toDF().toDF("key", "event_id", "ts", "x")
          .withWatermark("ts", "10 seconds"), target, slack, threshold,
        expireAfterUs = Some(5L * 1000L * 1000L))
      .writeStream.format("memory").queryName("cusum_ttl")
      .outputMode("append").start()
    try {
      def ts(sec: Long) = new Timestamp(sec * 1000L)
      mem.addData(("a", 1L, ts(100), 50L)) // s = 38; timeout at 105 s
      q.processAllAvailable()
      mem.addData(("b", 2L, ts(200), 10L)) // advances wm to 190 s
      q.processAllAvailable()
      mem.addData(("b", 3L, ts(210), 10L)) // wm 190 > 105: "a" times out
      q.processAllAvailable()
      mem.addData(("a", 4L, ts(220), 50L)) // fresh state: s = 38, not 76
      q.processAllAvailable()
      val got = spark.table("cusum_ttl").as[StreamingCusum.Out]
        .collect().map(o => o.eventId -> o.s).toMap
      assert(got(1L) === 38L)
      assert(got(4L) === 38L, "expired key must restart its CUSUM from zero")
    } finally q.stop()
  }
}
