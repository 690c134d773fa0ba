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
