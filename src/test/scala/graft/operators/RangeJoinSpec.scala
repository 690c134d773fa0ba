package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions.col
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

  test("intervalsOverlap == naive inequality join (multi-bucket dedup, touching bounds)") {
    val day = 86400000000L
    // (id, start, end) in us; spans chosen to cross several day buckets
    val left = Seq(
      ("L1", 0L, 3L * day),            // crosses 4 buckets
      ("L2", 5L * day, 5L * day + 10L), // tiny
      ("L3", 10L * day, 11L * day)
    ).toDF("lid", "ls", "le")
    val right = Seq(
      ("R1", 2L * day, 6L * day),       // overlaps L1 (2 shared buckets) and L2
      ("R2", 3L * day + 1L, 4L * day),  // misses L1 by 1 us
      ("R3", 11L * day, 12L * day)      // touches L3 exactly at one point
    ).toDF("rid", "rs", "re")

    val got = RangeJoin.intervalsOverlap(left, right, "ls", "le", "rs", "re", day)
      .select("lid", "rid").as[(String, String)].collect().toSeq
    val naive = left.join(right, col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").as[(String, String)].collect().toSeq
    // sets equal AND no duplicates from multi-bucket matches
    assert(got.sorted === naive.sorted)
    assert(got.distinct.length === got.length)
    assert(got.toSet === Set(("L1", "R1"), ("L2", "R1"), ("L3", "R3")))
  }
}
