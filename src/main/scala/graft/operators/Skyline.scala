package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier) — the points no other point dominates.
  * The classic multi-criteria shortlist: "no part is both cheaper and
  * larger", "no run is both faster and more accurate".
  *
  * Never all-pairs. Points pre-aggregate to distinct (x, y) with
  * multiplicity, then the dominance test decomposes into three bounded
  * minima (both dimensions MINIMIZED; a distinct point q is dominated iff
  * `min{p.y : p.x < q.x} <= q.y` or `min{p.y : p.x = q.x} < q.y`):
  *
  *  - cross-bucket: per-bucket min-y over fixed-width value buckets of x,
  *    prefix-combined with an ordered window. That window is global but
  *    runs over the BUCKET relation, whose size is bounded by
  *    domain/width — data-independent — and the result broadcasts back
  *    (the q135 broadcast-cut shape, not a global sort of the data).
  *  - within-bucket, strictly smaller x: a RANGE-frame running min
  *    partitioned by bucket (`RANGE BETWEEN UNBOUNDED PRECEDING AND 1
  *    PRECEDING` on integer x ⇒ x' <= x-1, strictness for free).
  *  - same x: the x-group min (ties on both coordinates are duplicates,
  *    which are never dominated by each other — multiplicity survives).
  *
  * Caller contract: choose `bucketWidth` so domain/width is small (the
  * x domain is usually known — prices, sizes, scores); maximize a
  * dimension by negating it.
  */
object Skyline {

  /** Frontier over long columns `xCol`, `yCol`, both minimized. Returns
    * the distinct non-dominated points as `(x, y, n)` with n = input
    * multiplicity. */
  def frontier2Min(points: DataFrame, xCol: String, yCol: String,
                   bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val pts = points
      .select(col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("n"))
      .withColumn("bucket", expr(s"x div ${bucketWidth}L"))
    // bucket ranges under trunc-toward-zero div are still contiguous and
    // monotone (bucket 0 is merely twice as wide when x spans zero), so
    // "earlier bucket" still implies "strictly smaller x"
    val bmins = pts.groupBy(col("bucket")).agg(min(col("y")).as("bmin"))
    val wpref = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val pref = bmins.select(col("bucket"),
      min(col("bmin")).over(wpref).as("crossmin"))
    val wb = Window.partitionBy(col("bucket")).orderBy(col("x"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val wx = Window.partitionBy(col("x"))
    pts.join(broadcast(pref), Seq("bucket"), "left")
      .withColumn("inbmin", min(col("y")).over(wb))
      .withColumn("xmin", min(col("y")).over(wx))
      .filter(!(coalesce(col("crossmin"), lit(Long.MaxValue)) <= col("y") ||
        coalesce(col("inbmin"), lit(Long.MaxValue)) <= col("y") ||
        col("xmin") < col("y")))
      .select(col("x"), col("y"), col("n"))
  }
}
