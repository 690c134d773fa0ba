package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Online 2σ outlier stream: verdicts equal a pure prefix-fold reference,
  * are invariant to micro-batch slicing (in-order delivery), and the state
  * is exactly the three prefix moments. */
class StreamingAnomalySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private case class In(userId: Long, eventId: Long, sec: Long, value: Double)

  // steady values then a spike per user; interleaved users; u2 carries a
  // NEGATIVE exact-binary half cent (-0.125 * 100 = -12.5 exactly) to pin
  // the rounding convention: Spark round is HALF_UP = away from zero
  // (-12.5 -> -13), scala math.round is half-toward-+inf (-12.5 -> -12) —
  // a reference using math.round diverges on exactly this value
  private val feed: Seq[In] = {
    val u1 = Seq(10.0, 10.2, 9.8, 10.1, 50.0, 10.0).zipWithIndex.map {
      case (v, i) => In(1L, 100L + i, 10L * i, v)
    }
    val u2 = Seq(-0.125, -5.0, -5.015, -4.9, -5.0).zipWithIndex.map {
      case (v, i) => In(2L, 200L + i, 7L * i, v)
    }
    (u1 ++ u2).sortBy(_.sec)
  }

  /** Spark's round(): BigDecimal HALF_UP of the double — away from zero. */
  private def sparkRoundCents(v: Double): Long =
    BigDecimal(v * 100).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  private def refVerdicts(rows: Seq[In]): Map[Long, (Long, Boolean)] =
    rows.groupBy(_.userId).flatMap { case (_, rs) =>
      var m = StreamingAnomaly.Moments(0L, 0L, 0L)
      rs.sortBy(r => (r.sec, r.eventId)).map { r =>
        val cents = sparkRoundCents(r.value)
        val v = (r.eventId, (m.n, StreamingAnomaly.isOutlier(m, cents)))
        m = StreamingAnomaly.fold(m, cents)
        v
      }
    }

  private def toDf(rows: Seq[In]) =
    rows.map(r => (r.userId, r.eventId, new Timestamp(r.sec * 1000L), r.value))
      .toDF("user_id", "event_id", "ts", "value")

  test("the spike is flagged; steady values are not (prefix semantics)") {
    val got = StreamingAnomaly.verdicts(toDf(feed))
      .collect().map(v => v.eventId -> v.isOutlier).toMap
    assert(got(104L)) // the 50.0 spike after 4 steady values
    assert(!got(100L) && !got(101L) && !got(103L) && !got(205L - 1L))
    // the event AFTER the spike is judged against spike-inflated variance
    assert(!got(105L))
  }

  test("batch verdicts == pure prefix-fold reference") {
    val got = StreamingAnomaly.verdicts(toDf(feed))
      .collect().map(v => v.eventId -> ((v.nBefore, v.isOutlier))).toMap
    assert(got === refVerdicts(feed))
  }

  test("streaming: verdicts invariant to micro-batch slicing, state is 3 longs") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    for (sliceAt <- Seq(1, 4, 8)) {
      val mem = MemoryStream[(Long, Long, Timestamp, Double)]
      val q = StreamingAnomaly.verdicts(
          mem.toDF().toDF("user_id", "event_id", "ts", "value"))
        .writeStream.format("memory").queryName(s"anom_$sliceAt")
        .outputMode("append").start()
      try {
        val (a, b) = feed.map(r =>
          (r.userId, r.eventId, new Timestamp(r.sec * 1000L), r.value)).splitAt(sliceAt)
        mem.addData(a); q.processAllAvailable()
        mem.addData(b); q.processAllAvailable()
        val got = spark.table(s"anom_$sliceAt")
          .as[StreamingAnomaly.Verdict]
          .collect().map(v => v.eventId -> ((v.nBefore, v.isOutlier))).toMap
        assert(got === refVerdicts(feed), s"sliceAt=$sliceAt")
      } finally q.stop()
    }
  }
}
