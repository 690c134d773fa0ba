package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("bucketed containment join equals the naive inequality join") {
    val points = Seq(
      ts("2024-01-15 00:00:00"), ts("2024-02-05 00:00:00"),
      ts("2024-02-10 00:00:00"), ts("2024-03-01 00:00:00"),
      ts("2024-01-01 00:00:00")  // exact interval start: inclusive
    ).map(Tuple1(_)).toDF("pt")
    val intervals = Seq(
      (ts("2024-01-01 00:00:00"), ts("2024-02-10 00:00:00"), "A"), // spans 2 buckets; end exclusive
      (ts("2024-02-01 00:00:00"), ts("2024-03-15 00:00:00"), "B"), // spans 2 buckets
      (ts("2024-05-01 00:00:00"), ts("2024-05-02 00:00:00"), "C")  // matches nothing
    ).toDF("s", "e", "label")

    val bucketed = RangeJoin.pointsInIntervals(points, intervals, "pt", "s", "e")
      .select("pt", "label").collect().map(r => (r.getTimestamp(0), r.getString(1))).toSet
    val naive = points.join(intervals,
        points("pt") >= intervals("s") && points("pt") < intervals("e"))
      .select("pt", "label").collect().map(r => (r.getTimestamp(0), r.getString(1))).toSet

    assert(bucketed == naive)
    assert(bucketed == Set(
      (ts("2024-01-01 00:00:00"), "A"), (ts("2024-01-15 00:00:00"), "A"),
      (ts("2024-02-05 00:00:00"), "A"), // in A via second bucket
      (ts("2024-02-05 00:00:00"), "B"), (ts("2024-02-10 00:00:00"), "B"),
      (ts("2024-03-01 00:00:00"), "B")))
  }
}
