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
  *   1. one aggregation gets per-(group, column) count / min / max;
  *   2. each round, ONE pass histograms every still-pending range: per row,
  *      each live range evaluates one membership predicate + one bucket
  *      index (`floor((v-lo)/width)` clamped to bins-1); matches explode to
  *      (range, bucket) pairs and a tiny groupBy counts them. The bucket
  *      containing the target rank becomes the new range, the rank is
  *      re-based, and the bucket count is carried as the EXACT size of the
  *      new range;
  *   3. ranges with ≤ `collectCap` rows are fetched in ONE batched filtered
  *      collect per round and their order statistics read off driver-side.
  *
  * ALL quantiles of ALL value columns narrow together — q59's five order
  * statistics over two columns cost the same ~3 data passes as one. Work
  * per row per pass is O(live ranges), not O(ranges × bins) (the
  * conditional-sum formulation measured 5× slower from 288 per-row
  * predicates + per-round codegen). Memory: O(collectCap × ranges)
  * transient driver rows, never O(group).
  *
  * FLOAT-BOUNDARY DISCIPLINE: bucket membership is defined by the SAME
  * clamped-floor-division expression everywhere (counting, narrowing,
  * collecting) and carried forward as an explicit constraint chain —
  * deriving `[lo + b·width, lo + (b+1)·width)` bounds arithmetically and
  * re-comparing with >=/< can DISAGREE with the division in the last ulp
  * and silently mis-base a rank.
  *
  * Interpolation replicates `percentile()` / DuckDB `quantile_cont` TO THE
  * ULP: rank r = (n-1)·p, result = (⌈r⌉-r)·v⌊r⌋ + (r-⌊r⌋)·v⌈r⌉ — the
  * two-sided weighted form both engines use; the algebraically-equal
  * `v⌊r⌋ + frac·Δ` differs in the last ulp and fails hash parity. When the
  * two bracketing order statistics are EQUAL (rank inside a run of
  * duplicates), both engines return the value itself — the weighted form
  * would add last-ulp noise there, so it is short-circuited.
  */
object HistogramPercentile {

  /** One level of narrowing: membership = clamped floor((v-lo)/width) == b. */
  private final case class Constraint(lo: Double, width: Double, b: Int)

  private final case class Pending(
      group: Any, ci: Int, idx: Long,
      var constraints: List[Constraint],
      var lo: Double, var hi: Double, // numeric approximation, for widths only
      var count: Long,                // EXACT rows in the range
      var base: Long,
      var stall: Int = 0) {           // consecutive rounds with no count shrink
    def rangeKey: (Any, Int, List[Constraint]) = (group, ci, constraints)
  }

  /** Single-column convenience: one row per group,
    * `(groupCol, q0 .. q{probs.size-1})`. */
  def quantiles(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      probs: Seq[Double],
      bins: Int = 2048,
      collectCap: Int = 8192): DataFrame = {
    val out = quantilesMulti(df, groupCol, Seq(valueCol -> probs), bins, collectCap)
    out.columns.zipWithIndex.foldLeft(out) { case (d, (c, i)) =>
      if (i == 0) d else d.withColumnRenamed(c, s"q${i - 1}")
    }
  }

  /** Exact linear-interpolated quantiles of several value columns per
    * `groupCol` in ONE shared narrowing loop. Output: one row per group,
    * columns `<valueCol>_q<i>` per requested prob, value-identical to
    * `percentile(valueCol, p)`.
    *
    * `bins` is an EXECUTION parameter, not a semantic one — any bins ≥ 2
    * converges to the identical exact quantile; it only sets the round
    * count (rounds = ceil(log_bins(domain width))). Default 2048: one
    * round fewer than 128 on ~1e7-wide cents domains, and the per-round
    * driver histogram stays ≤ live·bins counters — bounded by the group
    * domain, never the data. */
  def quantilesMulti(
      df: DataFrame,
      groupCol: String,
      specs: Seq[(String, Seq[Double])],
      bins: Int = 2048,
      collectCap: Int = 8192): DataFrame = {
    val spark = df.sparkSession
    val nCols = specs.size
    val narrow0 = df.select(col(groupCol).as("g") +:
      specs.zipWithIndex.map { case ((vc, _), ci) => col(vc).cast("double").as(s"v$ci") }: _*)
    // every round re-scans the cached projection, so a skinny input (e.g. a
    // single-row-group local file) would serialize ALL passes on one core —
    // one upfront round-robin shuffle of the narrow rows amortizes across
    // the ≥ 3 passes; a no-op on real clusters whose scans already carry
    // ≥ defaultParallelism splits
    val par = spark.sparkContext.defaultParallelism
    val data = (if (narrow0.rdd.getNumPartitions < par) narrow0.repartition(par) else narrow0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def v(ci: Int) = col(s"v$ci")

    // pass 1: per-(group, column) n / min / max (count(v) skips nulls, like
    // percentile() does)
    val statCols = (0 until nCols).flatMap(ci => Seq(
      count(v(ci)).as(s"n$ci"), min(v(ci)).as(s"mn$ci"), max(v(ci)).as(s"mx$ci")))
    val stats: Map[(Any, Int), (Long, Double, Double)] = data.groupBy(col("g"))
      .agg(statCols.head, statCols.tail: _*)
      .collect()
      .flatMap { r =>
        (0 until nCols).map { ci =>
          val n = r.getLong(r.fieldIndex(s"n$ci"))
          (r.get(0), ci) -> ((n,
            if (n == 0) 0.0 else r.getDouble(r.fieldIndex(s"mn$ci")),
            if (n == 0) 0.0 else r.getDouble(r.fieldIndex(s"mx$ci"))))
        }
      }.toMap
    val groups = stats.keys.map(_._1).toSeq.distinct

    // the SINGLE definition of bucket index — shared by counting and by the
    // constraint chain, so membership can never disagree with the count.
    // Clamped at BOTH ends: a row can satisfy its constraint chain yet sit
    // an ulp below the narrowed range's arithmetic lo (the division that
    // admitted it rounded up) — unclamped it would compute bucket -1 and
    // silently vanish from the cumulative rank count.
    def bucketExpr(ci: Int, c: Constraint): Column =
      greatest(least(floor((v(ci) - lit(c.lo)) / lit(c.width)),
        lit((bins - 1).toDouble)), lit(0.0))
    def constraintCond(ci: Int, c: Constraint): Column =
      bucketExpr(ci, c) === lit(c.b.toDouble)
    // eqNullSafe: a NULL group key is a legitimate group for percentile()
    def rangeCond(pd: Pending): Column =
      pd.constraints.foldLeft(col("g") <=> lit(pd.group) && v(pd.ci).isNotNull)(
        (acc, c) => acc && constraintCond(pd.ci, c))

    val resolved = scala.collection.mutable.Map.empty[(Any, Int, Long), Double]

    /** One filtered pass fetches every listed range; order statistics are
      * read off driver-side. Driver volume ≤ collectCap × |distinct ranges|
      * (+ duplicate-heavy point ranges, which resolve exactly regardless of
      * their size — all collected values are equal). */
    def batchCollect(pds: Seq[Pending]): Unit = {
      if (pds.isEmpty) return
      val rows = data.filter(pds.map(rangeCond).reduce(_ || _))
        .select(col("g") +: (0 until nCols).map(v): _*).collect()
      // evaluate each pending's constraint chain driver-side, mirroring
      // bucketExpr exactly
      def inRange(pd: Pending, x: Double): Boolean = pd.constraints.forall { c =>
        math.max(math.min(math.floor((x - c.lo) / c.width), (bins - 1).toDouble), 0.0) ==
          c.b.toDouble
      }
      for (pd <- pds) {
        val slice = rows.iterator
          .filter(r => r.get(0) == pd.group && !r.isNullAt(1 + pd.ci))
          .map(_.getDouble(1 + pd.ci))
          .filter(inRange(pd, _))
          .toArray.sorted
        val off = (pd.idx - pd.base).toInt
        require(off >= 0 && off < slice.length,
          s"order-statistic offset $off outside collected range of ${slice.length} rows " +
            s"(group=${pd.group}, col=${pd.ci}, idx=${pd.idx}, base=${pd.base})")
        resolved((pd.group, pd.ci, pd.idx)) = slice(off)
      }
    }

    /** Bounded resolution for duplicate-heavy point ranges: when a range is
      * width-exhausted (all remaining values within an ulp span) but still
      * holds more rows than collectCap, pulling the rows would be O(group)
      * driver memory. The distinct VALUES in such a range are few — count
      * per value and walk the cumulative counts driver-side instead. Rank
      * arithmetic stays in Long (a point range can exceed 2^31 rows). */
    def resolveByValueCounts(pd: Pending): Unit = {
      val counts = data.filter(rangeCond(pd))
        .groupBy(v(pd.ci)).agg(count(lit(1)).as("c"))
        .collect().map(r => (r.getDouble(0), r.getLong(1))).sortBy(_._1)
      var cum = pd.base
      var found = false
      for ((value, c) <- counts if !found) {
        if (pd.idx < cum + c) { resolved((pd.group, pd.ci, pd.idx)) = value; found = true }
        cum += c
      }
      require(found, s"rank ${pd.idx} not found in value counts of point range " +
        s"(group=${pd.group}, col=${pd.ci}, base=${pd.base})")
    }

    // the order statistics each (group, column, prob) needs: ⌊r⌋ and, when
    // interpolating, ⌈r⌉
    var pending: Seq[Pending] = (for {
      ((g, ci), (n, mn, mx)) <- stats.toSeq
      if n > 0
      p <- specs(ci)._2
      r = (n - 1) * p
      k = math.floor(r).toLong
      i <- Seq(k) ++ (if (r > k && k + 1 < n) Seq(k + 1) else Nil)
    } yield (g, ci, i) -> Pending(g, ci, i, Nil, mn, mx, n, 0L))
      .toMap.values.toSeq

    var guard = 0
    while (pending.nonEmpty && guard < 64) {
      guard += 1
      val roundCollects = scala.collection.mutable.ArrayBuffer.empty[Pending]
      // exact range sizes are known (group n, then bucket counts), so the
      // collect trigger is precise; width-exhausted ranges that are still
      // over the cap (duplicate-heavy point ranges) resolve by bounded
      // value counts instead of an O(group) row pull
      val (direct, narrow) = pending.partition(pd =>
        pd.count <= collectCap || (pd.hi - pd.lo) / bins <= 0.0)
      val (smallDirect, pointDirect) = direct.partition(_.count <= collectCap)
      roundCollects ++= smallDirect
      pointDirect.foreach(resolveByValueCounts)
      pending = narrow
      if (pending.nonEmpty) {
        val rangeList = pending.map(_.rangeKey).distinct
        val rangeId = rangeList.zipWithIndex.toMap
        val reps = rangeList.map(k => pending.find(_.rangeKey == k).get)
        // per row: one struct per MATCHING live range; explode + count
        val entries: Seq[Column] = reps.map { pd =>
          val ri = rangeId(pd.rangeKey)
          val c = Constraint(pd.lo, (pd.hi - pd.lo) / bins, 0)
          when(rangeCond(pd),
            struct(lit(ri).as("ri"), bucketExpr(pd.ci, c).as("b")))
        }
        val counts: Map[(Int, Int), Long] = data
          .select(explode(array(entries: _*)).as("e"))
          .filter(col("e").isNotNull) // relational, codegen'd — a filter()
          .groupBy(col("e.ri").as("ri"), col("e.b").as("b")) // HOF here is interpreted
          .agg(count(lit(1)).as("c"))
          .collect()
          .map(r => (r.getInt(0), r.getDouble(1).toInt) -> r.getLong(2)).toMap
        val next = scala.collection.mutable.ArrayBuffer.empty[Pending]
        for (pd <- pending) {
          val ri = rangeId(pd.rangeKey)
          val width = (pd.hi - pd.lo) / bins
          var cum = pd.base
          var b = 0
          var placed = false
          while (b < bins && !placed) {
            val c = counts.getOrElse((ri, b), 0L)
            if (pd.idx < cum + c) {
              // a range that stops shrinking is duplicate-bound: more than
              // collectCap COPIES of one value can never split across
              // buckets, and the width>0 exhaustion test won't fire for
              // ~350 rounds of 8x decay (found by PropertyFuzzSpec: six
              // rows, five of them 0.0, collectCap 4 spun all 64 rounds)
              pd.stall = if (c < pd.count) 0 else pd.stall + 1
              pd.constraints = pd.constraints :+ Constraint(pd.lo, width, b)
              pd.hi = pd.lo + (b + 1) * width
              pd.lo = pd.lo + b * width
              pd.count = c
              pd.base = cum
              if (c <= collectCap) roundCollects += pd
              else if (pd.stall >= 3) {
                // a stalled range is not NECESSARILY duplicate-bound — a
                // tight cluster of many DISTINCT values also refuses to
                // split for a few rounds while the width decays toward the
                // cluster span. Gate the value-count resolution on an
                // exact distinct count (one scalar aggregate, no rows
                // collected): few distinct values → bounded resolve; many
                // → keep narrowing, the decaying width WILL split them.
                val nd = data.filter(rangeCond(pd))
                  .select(count_distinct(v(pd.ci))).head().getLong(0)
                if (nd <= collectCap) resolveByValueCounts(pd)
                else { pd.stall = 0; next += pd }
              }
              else next += pd
              placed = true
            }
            cum += c
            b += 1
          }
          require(placed, s"rank ${pd.idx} not located for group ${pd.group} col ${pd.ci}")
        }
        pending = next.toSeq
      }
      batchCollect(roundCollects.toSeq)
    }
    require(pending.isEmpty, "histogram percentile did not converge in 64 rounds")
    data.unpersist()

    // interpolate and assemble one small local DataFrame
    import scala.jdk.CollectionConverters._
    val rows: java.util.List[Row] = groups.sortBy(String.valueOf(_)).map { g =>
      val vals = specs.zipWithIndex.flatMap { case ((_, probs), ci) =>
        val (n, _, _) = stats((g, ci))
        probs.map { p =>
          if (n == 0) null
          else {
            val r = (n - 1) * p
            val lower = math.floor(r).toLong
            val higher = math.ceil(r).toLong
            val lo = resolved((g, ci, lower))
            java.lang.Double.valueOf(
              if (higher == lower || higher >= n) lo
              else {
                val hi = resolved((g, ci, higher))
                // equal bracketing values short-circuit WITHOUT arithmetic:
                // both engines resolve inside a run of duplicates to the
                // value itself, while (1-f)·v + f·v ≠ v in the last ulp
                // (found by PropertyFuzzSpec: [1.5, 1.5, 2.0] at p10)
                if (hi == lo) lo
                else (higher - r) * lo + (r - lower) * hi
              })
          }
        }
      }
      Row.fromSeq(g +: vals)
    }.asJava
    val schema = StructType(
      StructField("g", df.select(col(groupCol)).schema.head.dataType) +:
        specs.flatMap { case (vc, probs) =>
          probs.indices.map(i => StructField(s"${vc}_q$i", DoubleType))
        })
    spark.createDataFrame(rows, schema).withColumnRenamed("g", groupCol)
  }
}
