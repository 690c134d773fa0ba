package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** EXACT distributed percentiles in bounded memory — the 100 TB answer to
  * `percentile()`'s ObjectHashAggregate, which buffers EVERY value of a
  * group on one executor (the documented q31 scale hazard).
  *
  * Algorithm: iterative histogram range-narrowing, the classic exact
  * distributed-quantile scheme:
  *
  *   1. one aggregation gets per-group count / min / max;
  *   2. each round, ONE whole-data aggregation computes `bins` equal-width
  *      conditional counts for every still-pending order statistic; the
  *      bucket containing the target rank becomes the new range and the
  *      rank is re-based to the count below it;
  *   3. a range that holds few enough rows (≤ `collectCap`) is collected,
  *      sorted, and the order statistic read off exactly.
  *
  * Every pass streams the data once through a codegen'd conditional-sum
  * aggregate — executor/driver memory is O(bins × pending + collectCap),
  * never O(rows). Each round divides the candidate range's row count by
  * ~`bins`, so even a 10^12-row group converges in ~log_bins(n/cap) ≈ 5
  * passes; uniform data localizes in one.
  *
  * Range semantics: a pending range covers [lo, hi), except when hi is the
  * group maximum (then inclusive) — bucket conditions and slice collects
  * must agree on this or equal-to-boundary values are double-counted/lost.
  *
  * Interpolation replicates `percentile()` / DuckDB `quantile_cont` TO THE
  * ULP: rank r = (n-1)·p, result = (⌈r⌉-r)·v⌊r⌋ + (r-⌊r⌋)·v⌈r⌉ — the
  * two-sided weighted form both engines use; the algebraically-equal
  * `v⌊r⌋ + frac·Δ` differs in the last ulp and fails hash parity.
  */
object HistogramPercentile {

  private final case class Pending(
      group: Any, idx: Long, var lo: Double, var hi: Double,
      var hiInclusive: Boolean, var base: Long)

  /** Exact linear-interpolated quantiles of `valueCol` per `groupCol`:
    * one row per group, `(groupCol, q0 .. q{probs.size-1})`, value-identical
    * to `percentile(valueCol, p)` but in bounded memory. */
  def quantiles(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      probs: Seq[Double],
      bins: Int = 32,
      collectCap: Int = 65536): DataFrame = {
    val spark = df.sparkSession
    val data = df.select(col(groupCol).as("g"), col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // pass 1: per-group n / min / max
    val stats = data.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), min(col("v")).as("mn"), max(col("v")).as("mx"))
      .collect()
      .map(r => r.get(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap

    def rangeCond(g: Any, lo: Double, hi: Double, hiInc: Boolean): Column =
      col("g") === lit(g) && col("v") >= lo &&
        (if (hiInc) col("v") <= hi else col("v") < hi)

    val resolved = scala.collection.mutable.Map.empty[(Any, Long), Double]

    def collectRange(pd: Pending): Unit = {
      val slice = data.filter(rangeCond(pd.group, pd.lo, pd.hi, pd.hiInclusive))
        .select(col("v")).collect().map(_.getDouble(0)).sorted
      val off = (pd.idx - pd.base).toInt
      require(off >= 0 && off < slice.length,
        s"order-statistic offset $off outside collected range of ${slice.length} rows " +
          s"(group=${pd.group}, idx=${pd.idx}, base=${pd.base})")
      resolved((pd.group, pd.idx)) = slice(off)
    }

    // the order statistics each (group, prob) needs: k and, when
    // interpolating, k+1
    var pending: Seq[Pending] = (for {
      (g, (n, mn, mx)) <- stats.toSeq
      p <- probs
      r = (n - 1) * p
      k = math.floor(r).toLong
      i <- Seq(k) ++ (if (r > k && k + 1 < n) Seq(k + 1) else Nil)
    } yield (g, i) -> Pending(g, i, mn, mx, hiInclusive = true, 0L))
      .toMap.values.toSeq

    var guard = 0
    while (pending.nonEmpty && guard < 64) {
      guard += 1
      // collect directly where the whole remaining group fits (n - base is
      // an over-estimate of the range's rows, so this is conservative) or
      // the range is a single point
      val (small, big) = pending.partition(pd =>
        pd.lo == pd.hi || (stats(pd.group)._1 - pd.base) <= collectCap)
      small.foreach(collectRange)
      pending = big
      if (pending.nonEmpty) {
        // one aggregation: `bins` conditional counts per pending range
        val aggCols: Seq[Column] = pending.zipWithIndex.flatMap { case (pd, pi) =>
          val width = (pd.hi - pd.lo) / bins
          (0 until bins).map { b =>
            val bLo = pd.lo + b * width
            val last = b == bins - 1
            val bHi = if (last) pd.hi else pd.lo + (b + 1) * width
            sum(when(rangeCond(pd.group, bLo, bHi, last && pd.hiInclusive), 1L)
              .otherwise(0L)).as(s"c_${pi}_$b")
          }
        }
        val row = data.agg(aggCols.head, aggCols.tail: _*).collect()(0)
        val next = scala.collection.mutable.ArrayBuffer.empty[Pending]
        for ((pd, pi) <- pending.zipWithIndex) {
          val width = (pd.hi - pd.lo) / bins
          var cum = pd.base
          var b = 0
          var placed = false
          while (b < bins && !placed) {
            val c = row.getLong(row.fieldIndex(s"c_${pi}_$b"))
            if (pd.idx < cum + c) {
              val last = b == bins - 1
              val nLo = pd.lo + b * width
              val nHi = if (last) pd.hi else pd.lo + (b + 1) * width
              val nInc = last && pd.hiInclusive
              if (c <= collectCap || nLo == nHi) {
                collectRange(Pending(pd.group, pd.idx, nLo, nHi, nInc, cum))
              } else {
                pd.lo = nLo; pd.hi = nHi; pd.hiInclusive = nInc; pd.base = cum
                next += pd
              }
              placed = true
            }
            cum += c
            b += 1
          }
          require(placed, s"rank ${pd.idx} not located for group ${pd.group}")
        }
        pending = next.toSeq
      }
    }
    require(pending.isEmpty, "histogram percentile did not converge in 64 rounds")
    data.unpersist()

    // interpolate and assemble one small local DataFrame
    import scala.jdk.CollectionConverters._
    val rows: java.util.List[Row] = stats.keys.toSeq.sortBy(_.toString).map { g =>
      val (n, _, _) = stats(g)
      val vals = probs.map { p =>
        val r = (n - 1) * p
        val lower = math.floor(r).toLong
        val higher = math.ceil(r).toLong
        val lo = resolved((g, lower))
        java.lang.Double.valueOf(
          if (higher == lower || higher >= n) lo
          else (higher - r) * lo + (r - lower) * resolved((g, higher)))
      }
      Row.fromSeq(g +: vals)
    }.asJava
    val schema = StructType(
      StructField("g", df.select(col(groupCol)).schema.head.dataType) +:
        probs.indices.map(i => StructField(s"q$i", DoubleType)))
    spark.createDataFrame(rows, schema).withColumnRenamed("g", groupCol)
  }
}
