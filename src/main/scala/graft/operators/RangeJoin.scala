package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: points matched to every interval containing them
  * (`start <= pt < end`). Spark plans a raw inequality join as
  * BroadcastNestedLoop — O(|points| × |intervals|) — which collapses at
  * scale. The bucketed formulation turns it into an EQUI join:
  *
  *   1. explode each interval onto the calendar buckets (months here) it
  *      covers — intervals are short, so this is a small constant blowup;
  *   2. assign each point its single bucket;
  *   3. hash-join on the bucket key, then apply the exact range predicate
  *      to the (tiny) per-bucket candidate set.
  *
  * One shuffle on the bucket key; cost is linear in points + interval
  * coverage. Pick the bucket unit ≈ median interval length: too coarse and
  * buckets over-collide, too fine and intervals explode onto many buckets.
  */
object RangeJoin {

  /** Interval × interval overlap join on INCLUSIVE `[start, end]` long
    * bounds (e.g. µs timestamps), bucketed by `bucketWidth` units.
    *
    * Same equi-join reduction as [[pointsInIntervals]], plus the standard
    * first-bucket dedup: a pair overlapping across k buckets matches k
    * times, so only the match in the overlap's FIRST bucket
    * (`greatest(starts) div width`) is kept — an O(1) filter instead of a
    * corpus-wide `distinct()` shuffle. Cost is linear in total bucket
    * coverage + true-overlap count (the output is inherently quadratic in
    * instantaneous concurrency — that's the semantics, not the plan).
    * Column sets must be disjoint; bounds must be non-negative longs. */
  def intervalsOverlap(
      left: DataFrame,
      right: DataFrame,
      lStartCol: String,
      lEndCol: String,
      rStartCol: String,
      rEndCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val lb = left.withColumn("__bucket",
      explode(sequence(expr(s"$lStartCol div ${bucketWidth}L"),
        expr(s"$lEndCol div ${bucketWidth}L"))))
    val rb = right.withColumn("__bucket",
      explode(sequence(expr(s"$rStartCol div ${bucketWidth}L"),
        expr(s"$rEndCol div ${bucketWidth}L"))))
    lb.join(rb, Seq("__bucket"))
      .filter(col(lStartCol) <= col(rEndCol) && col(rStartCol) <= col(lEndCol))
      .filter(col("__bucket") === expr(s"greatest($lStartCol, $rStartCol) div ${bucketWidth}L"))
      .drop("__bucket")
  }

  /** Join `points` to `intervals` on containment (`[start, end)`), bucketed
    * by calendar month. Column sets must be disjoint. */
  def pointsInIntervals(
      points: DataFrame,
      intervals: DataFrame,
      ptCol: String,
      startCol: String,
      endCol: String): DataFrame = {
    val ivb = intervals.withColumn("__bucket",
      explode(sequence(
        date_trunc("month", col(startCol)),
        date_trunc("month", col(endCol) - expr("INTERVAL 1 MICROSECOND")),
        expr("INTERVAL 1 MONTH"))))
    val ptb = points.withColumn("__bucket", date_trunc("month", col(ptCol)))
    ptb.join(ivb, Seq("__bucket"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("__bucket")
  }
}
