package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** EXACT weighted quantiles over INTEGER values in bounded memory, with
  * ZERO driver value-collects — the weighted sibling of
  * [[HistogramPercentile]], specialized to long-valued domains (cents,
  * micros, counts — every exact-arithmetic column in this suite).
  *
  * Definition: the LOWER weighted p-quantile — the smallest value v whose
  * running weight (over values sorted ascending) reaches
  * T = ceil(p·W). It is always an ELEMENT of the input, so no
  * interpolation and none of the float-boundary discipline the
  * double-valued percentile loop needs: ranges are integer intervals
  * [lo, hi], the bucket index is pure integer division, and every
  * boundary is exact.
  *
  * Each round is ONE scan shared by EVERY live (group, quantile) pair:
  * rows join a broadcast of the live ranges on the group key (a row
  * replicates once per live quantile of its group — exactly the rows each
  * histogram needs), bucket = (v − lo) div width with
  * width = (hi − lo) div bins + 1, and a (group, quantile, bucket)
  * aggregation sums weights. The driver walks the ≤ bins cumulative
  * weights per pair, re-bases the target into the owning bucket, and
  * narrows. The range shrinks ×bins per round, so a 10^9-wide cents
  * domain resolves to width 1 in ≤ 5 rounds with 128 bins — the answer
  * falls out as the range's single remaining value, never a collected
  * row. Asking for k quantiles therefore costs ~1 scan per round, not k.
  * Memory: O(groups × quantiles × bins) driver-side counters; executor
  * state is a hash aggregate over that many keys.
  *
  * Weights must be POSITIVE (zero/negative weights make the running-sum
  * definition ill-posed); enforced with a loud failure, not a silent
  * filter.
  */
object WeightedMedian {

  private final case class Range(var lo: Long, var hi: Long, var target: Long)

  /** df(groupCol: any, valueCol: long, weightCol: long) →
    * (groupCol, total_weight, wmedian). */
  def exact(spark: SparkSession, df: DataFrame, groupCol: String,
            valueCol: String, weightCol: String, bins: Int = 2048,
            maxRounds: Int = 64): DataFrame =
    quantile(spark, df, groupCol, valueCol, weightCol, 1, 2, bins, maxRounds)
      .withColumnRenamed("wquantile", "wmedian")

  /** The lower weighted p-quantile (p = pNum/pDen): smallest v whose
    * running weight reaches ceil(p·W). p = 1/2 is [[exact]]'s median;
    * p = 9/10 the weighted p90, etc. */
  def quantile(spark: SparkSession, df: DataFrame, groupCol: String,
               valueCol: String, weightCol: String,
               pNum: Long, pDen: Long, bins: Int = 2048,
               maxRounds: Int = 64): DataFrame =
    quantiles(spark, df, groupCol, valueCol, weightCol,
      Seq(("q", pNum, pDen)), bins, maxRounds)
      .drop("p_label")

  /** Several lower weighted quantiles at once, sharing every scan.
    * `ps` is (label, pNum, pDen) per quantile; returns long format
    * (groupCol, p_label, total_weight, wquantile) — pivot to wide with a
    * groupBy if needed.
    *
    * `bins` is an EXECUTION parameter, not a semantic one — any bins ≥ 2
    * resolves the identical exact quantile; it only sets the round count,
    * rounds = ceil(log_bins(domain width)). Default 2048: a ~1e7-wide
    * cents domain drains in 3 rounds (vs 4 at 128) and the per-round
    * driver collect stays ≤ live·bins tiny rows — bounded by the GROUP
    * domain × quantile count, never the data. Callers with huge group
    * domains should pass bins back down. */
  def quantiles(spark: SparkSession, df: DataFrame, groupCol: String,
                valueCol: String, weightCol: String,
                ps: Seq[(String, Long, Long)], bins: Int = 2048,
                maxRounds: Int = 64): DataFrame = {
    require(bins >= 2, s"bins=$bins")
    require(ps.nonEmpty && ps.map(_._1).distinct.size == ps.size,
      s"quantile labels must be unique: ${ps.map(_._1)}")
    ps.foreach { case (l, n, d) =>
      require(n > 0 && n <= d, s"quantile $l=$n/$d not in (0,1]") }
    // every narrowing round re-scans the cached projection — spread the
    // narrow rows first so the rounds parallelize on a skinny input
    // (the HistogramPercentile idiom; no-op at scale, see Spread)
    val base = Spread.rows(df.select(col(groupCol).as("g"),
      col(valueCol).cast("long").as("v"), col(weightCol).cast("long").as("w")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // validation folds into the SAME stats aggregate — no separate scan
      val stats = base.groupBy(col("g"))
        .agg(sum(col("w")).as("tw"), min(col("v")).as("lo"), max(col("v")).as("hi"),
          sum(when(col("w") <= 0 || col("w").isNull || col("v").isNull, 1L)
            .otherwise(0L)).as("bad"))
        .collect() // one row per GROUP — bounded by the group domain
      val nBad = stats.map(_.getLong(4)).sum
      require(nBad == 0, s"WeightedMedian: $nBad NULL values or non-positive weights")
      val totals = stats.map(r => r.get(0) -> r.getLong(1)).toMap
      val live = mutable.Map[(Any, String), Range]()
      val resolved = mutable.Map[(Any, String), Long]()
      stats.foreach { r =>
        val (g, tw, lo, hi) = (r.get(0), r.getLong(1), r.getLong(2), r.getLong(3))
        ps.foreach { case (label, pNum, pDen) =>
          if (lo == hi) resolved((g, label)) = lo
          else live((g, label)) = Range(lo, hi, (tw * pNum + pDen - 1) / pDen) // ceil(p*W)
        }
      }

      val gType = base.schema("g").dataType
      var round = 0
      while (live.nonEmpty) {
        round += 1
        require(round <= maxRounds,
          s"WeightedMedian failed to converge in $maxRounds rounds (live=${live.size})")
        val ranges = live.toSeq.map { case ((g, label), r) =>
          Row(g, label, r.lo, r.hi, (r.hi - r.lo) / bins + 1)
        }
        val rangesDf = spark.createDataFrame(
          spark.sparkContext.parallelize(ranges, 1),
          StructType(Seq(
            StructField("g", gType), StructField("p", StringType),
            StructField("lo", LongType), StructField("hi", LongType),
            StructField("wd", LongType))))
        val counts = base.join(broadcast(rangesDf), "g")
          .filter(col("v") >= col("lo") && col("v") <= col("hi"))
          .groupBy(col("g"), col("p"), expr("(v - lo) div wd").as("b")) // INTEGER
          // div — long/long with `/` is DOUBLE division, loses exactness > 2^53
          .agg(sum(col("w")).as("bw"))
          .collect()
          .groupBy(r => (r.get(0), r.getString(1)))
          .map { case (k, rs) =>
            k -> rs.map(r => r.getLong(2) -> r.getLong(3)).sortBy(_._1)
          }
        for ((k, r) <- live.toSeq) {
          val width = (r.hi - r.lo) / bins + 1
          var t = r.target
          var owner = -1L
          val it = counts(k).iterator
          while (owner < 0 && it.hasNext) {
            val (b, bw) = it.next()
            if (bw >= t) owner = b else t -= bw
          }
          require(owner >= 0, s"WeightedMedian: target outside histogram for $k")
          val lo2 = r.lo + owner * width
          val hi2 = math.min(r.hi, lo2 + width - 1)
          if (lo2 == hi2) { resolved(k) = lo2; live.remove(k) }
          else { r.lo = lo2; r.hi = hi2; r.target = t }
        }
      }

      val out = resolved.toSeq.map { case ((g, label), v) =>
        Row(g, label, totals(g), v)
      }
      spark.createDataFrame(
        spark.sparkContext.parallelize(out, 1),
        StructType(Seq(
          StructField("g", gType), StructField("p_label", StringType),
          StructField("total_weight", LongType),
          StructField("wquantile", LongType))))
        .withColumnRenamed("g", groupCol)
    } finally base.unpersist()
  }
}
