package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextHash

/** MAXIMAL exact-substring dedup — the suffix-array family tool (Lee et
  * al. 2022, "Deduplicating Training Data Makes Language Models Better"):
  * find every maximal duplicated substring of length ≥ L in the corpus
  * and emit disjoint per-document span masks, with the EXACT maximal
  * repeat length per position — what q237's fixed 30-char windows cannot
  * provide (a 45-char duplicate is one 45-char repeat here, not a merged
  * blob of 16 overlapping windows; a 29-char duplicate is visible at all).
  *
  * Construction is PREFIX DOUBLING (Manber–Myers), fully distributed:
  *
  *   1. one row per character position `(doc, p, 8-gram, remaining)`;
  *   2. rank₈ = dense rank of the 8-char window — computed by
  *      [[denseRank]]: range-repartition on the key, per-partition
  *      group-start flags + window cumsum, driver prefix-fold of
  *      ≤ numParts totals (the [[PrefixSum]] two-phase shape; equal keys
  *      colocate under RangePartitioner, so no group splits a boundary
  *      and NO partitionless window exists anywhere);
  *   3. rank₂ₗ = dense rank of (rankₗ(p), rankₗ(p+ℓ)) via one equi-join
  *      + one [[denseRank]] per doubling round — O(log H) rounds to the
  *      horizon H;
  *   4. the H-capped suffix order (rank_H, doc, p) is positionally
  *      indexed ([[denseRank]] again) and ADJACENT suffix pairs join on
  *      consecutive indexes;
  *   5. each adjacent pair's LCP descends the rank levels
  *      (H, H/2, …, 8): classes equal at length ℓ ⟹ lcp += ℓ, shift,
  *      continue — then a final ≤7-char refinement compares the carried
  *      8-grams directly, and the lcp clamps to both remainders (equal
  *      TRUNCATED classes mean the suffixes are fully equal);
  *   6. longest-dup-length dl(p) = max neighbor lcp (the classic SA
  *      property); starts with dl ≥ L expand to [p, p+dl) intervals and
  *      merge per document into disjoint spans (q237's char-level rule,
  *      generalized to variable lengths).
  *
  * Exactness cap: dl is exact up to H (+ descent tail); positions inside
  * repeats longer than H still mask correctly (every start covers ≥ H
  * ahead, so coverage stays contiguous), only the reported `max_dl`
  * saturates. Everything is deterministic and window-free on the Spark
  * side at corpus scale; the DuckDB oracle replays every round with
  * plain `dense_rank()` windows.
  */
object SuffixRepeats {

  /** Distributed dense rank of `keys` (ascending, nulls disallowed) as
    * `out` — the TeraSort shape: range-repartition (equal keys colocate),
    * per-partition lag-based group-start flags + cumsum, ≤ numParts
    * partition totals prefix-folded on the driver and broadcast back.
    * First row of a partition always starts a group (RangePartitioner
    * sends equal keys to one partition, so the previous partition's keys
    * are strictly smaller). */
  def denseRank(df: DataFrame, keys: Seq[String], out: String,
                numParts: Int = 32): DataFrame = {
    val kc = keys.map(col)
    val parted = df.repartitionByRange(numParts, kc: _*)
      .withColumn("__pid", spark_partition_id())
    val w = Window.partitionBy(col("__pid")).orderBy(kc: _*)
    val sameAsPrev = keys.map { k =>
      val l = lag(col(k), 1).over(w)
      l.isNotNull && l === col(k)
    }.reduce(_ && _)
    // EAGER lineage cut FIRST: rank relations feed SELF-JOINS (doubling
    // pairs, SA adjacency, LCP descent), and a chained plan tree doubles
    // per level — the plan STRING alone goes exponential and OOMs AQE's
    // explain pass long before execution hurts. Checkpointing HERE (not
    // after the offset join) makes the one materializing pass the same
    // pass that pins the RangePartitioner boundaries; the totals collect
    // then reads the checkpointed blocks with a narrow agg instead of
    // re-materializing the whole relation a second time, and the offset
    // join stays LAZY (a ≤numParts-row broadcast over a checkpoint leaf —
    // constant-size plan, fused into whatever consumes the rank).
    val local = parted
      .withColumn("__f", when(sameAsPrev, 0L).otherwise(1L))
      .withColumn("__cl", sum(col("__f")).over(w))
      .localCheckpoint()
    val totals = local.groupBy(col("__pid")).agg(sum(col("__f")).as("__t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = {
      var acc = 0L
      totals.map { case (pid, t) => val o = acc; acc += t; (pid, o) }
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    local.join(broadcast(offDf), "__pid")
      .withColumn(out, col("__cl") + col("__off"))
      .drop("__pid", "__f", "__cl", "__off")
  }

  /** Consecutive-row pairs of `df` in ascending `keys` order, WITHOUT a
    * positional-index self-join: range-repartition + per-partition
    * `lead()`, with the ≤ numParts partition-boundary pairs stitched from
    * a driver collect of each partition's first row (last row of a
    * partition pairs with the first row of the next NON-EMPTY one — range
    * partitions can be empty). Output columns are `x_<c>` / `y_<c>` for
    * every input column; the global last row emits nothing. Data columns
    * must be non-null. */
  def adjacentPairs(df: DataFrame, keys: Seq[String],
                    numParts: Int = 32): DataFrame = {
    val spark = df.sparkSession
    val cols0 = df.columns.toSeq
    val kc = keys.map(col)
    val parted = df.repartitionByRange(numParts, kc: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint() // two consumers + RangePartitioner boundary pinning
    val w = Window.partitionBy(col("__pid")).orderBy(kc: _*)
    val firstRows = parted
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col("__pid") +: cols0.map(col): _*)
      .collect().sortBy(_.getInt(0))
    // first row of each non-empty partition, attached to the PREVIOUS
    // non-empty partition's id (whose last row is its global predecessor)
    val succ = firstRows.sliding(2).collect { case Array(a, b) =>
      org.apache.spark.sql.Row.fromSeq(a.getInt(0) +: b.toSeq.drop(1))
    }.toSeq
    val succSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__pid",
        org.apache.spark.sql.types.IntegerType) +:
      cols0.map(c => df.schema(c).copy(name = s"__f_$c")))
    val succDf = spark.createDataFrame(
      spark.sparkContext.parallelize(succ, 1), succSchema)
    val withLead = parted.select(
      (col("__pid") +: cols0.map(col)) ++
      cols0.map(c => lead(col(c), 1).over(w).as(s"__n_$c")) :+
      lead(lit(1), 1).over(w).as("__has"): _*)
    withLead.join(broadcast(succDf), Seq("__pid"), "left")
      .select(
        cols0.map(c => col(c).as(s"x_$c")) ++
        cols0.map(c => when(col("__has").isNotNull, col(s"__n_$c"))
          .otherwise(col(s"__f_$c")).as(s"y_$c")): _*)
      .filter(col(s"y_${keys.head}").isNotNull)
  }

  /** Per-document disjoint repeat spans:
    * `(doc_id, span_start, span_len, max_dl)` — every character inside a
    * duplicated substring of length ≥ `minLen` is covered by exactly one
    * span, and `max_dl` is the longest exact repeat length starting
    * inside the span (capped near `horizon`, see object doc).
    *
    * CANDIDATE PRUNING (what makes this viable at corpus scale): a
    * position can only reach `dl ≥ minLen ≥ base` if its own base-window
    * is duplicated, and any PARTNER achieving that lcp has a duplicated
    * base-window too — so the suffix set restricts LOSSLESSLY to
    * S = {p : base-window at p occurs ≥ 2×} (one hash-count pass, the
    * q237 shape; hash collisions only ADD candidates, never drop one).
    * The rank ladder needs partner classes up to 256 chars ahead of S,
    * so ranked positions are S expanded forward by Σlevels + base and
    * interval-merged per doc — everything downstream runs on the
    * repeat-involved subset, not the corpus. `base` is 32 when
    * `minLen ≥ 32` (two ladder levels skipped), else 8. */
  def repeatSpans(docs: DataFrame, idCol: String, textCol: String,
                  minLen: Int, horizon: Int = 128): DataFrame = {
    require(minLen >= 9, s"minLen=$minLen — below the 8-gram base use q237-style fixed windows")
    val base = if (minLen >= 32) 32 else 8
    val levels = levelsFor(base, horizon)
    val expand = levels.sum + base

    val tdocs0 = docs
      .select(col(idCol).cast("long").as("d"), trim(col(textCol)).as("t"))
      .filter(length(col("t")) > 0)
    // the window-hash pass fans each doc out ~len× — spread the compact
    // doc rows first (no-op at scale, see [[Spread]]); doc rows are
    // consumed TWICE (window-hash pass + the pos0 rejoin) — checkpoint
    // the tiny relation (round-5 rule: >=2 consumers persist)
    val tdocs = Spread.rows(tdocs0).localCheckpoint()
    val wH = Window.partitionBy(col("h"))
    val wd = Window.partitionBy(col("d")).orderBy(col("p"))
    // S: duplicated-base-window positions. Window hashes come from ONE
    // native pass per document (PositionedWindowHashes — position-ordered,
    // ASCII in-place; value-identical to md5Long(substring(t,p,base)), the
    // md5LongSql lockstep) instead of a per-position substring+md5 chain.
    // Only FULL windows exist (p ≤ len−base+1) — sound: a start needs
    // rem ≥ minLen ≥ base and any partner achieving lcp ≥ base has
    // rem ≥ base too. Hash collisions only widen S.
    val sPos = tdocs
      .select(col("d"), posexplode(graft.functions.VectorExpressions
        .positionedWindowHashes(col("t"), base)).as(Seq("i", "h")))
      .select(col("d"), (col("i") + 1).cast("long").as("p"), col("h"))
      .withColumn("cnt", count(lit(1)).over(wH))
      .filter(col("cnt") >= 2)
      .select(col("d"), col("p"))
      .localCheckpoint() // reused: interval merge + inS flag
    // S expanded forward and interval-merged per doc
    val iv = sPos
      .withColumn("e", col("p") + expand)
      .withColumn("pmax", max(col("e")).over(
        wd.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("newg",
        when(col("pmax").isNull || col("p") > col("pmax"), 1L).otherwise(0L))
      .withColumn("grp", sum(col("newg")).over(
        wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("d"), col("grp"))
      .agg(min(col("p")).as("lo"), max(col("e")).as("hi"))
    // ranked position set: (d, p, base-gram, remaining, inS)
    val pos0 = iv.join(tdocs, "d")
      .select(col("d"), col("t"),
        explode(sequence(col("lo"), least(col("hi"), length(col("t")).cast("long"))))
          .as("p"))
      .select(col("d"), col("p"),
        expr(s"substring(t, CAST(p AS INT), $base)").as("kb"),
        (length(col("t")) - col("p") + 1).cast("long").as("rem"))
      .join(sPos.withColumn("ins", lit(true)), Seq("d", "p"), "left")
      .na.fill(false, Seq("ins"))
      .localCheckpoint()

    // rank ladder (slim: d, p, r): r = dense rank of the len-capped
    // prefix, lexicographic by induction; every level a checkpoint leaf
    var rel = denseRank(pos0.select(col("d"), col("p"), col("kb")),
      Seq("kb"), "r").select(col("d"), col("p"), col("r"))
    val ladder = scala.collection.mutable.LinkedHashMap[Int, DataFrame](base -> rel)
    for (len <- levels.drop(1)) {
      val half = len / 2
      val shifted = rel.select(col("d"), (col("p") - half).as("p"),
        col("r").as("r2"))
      val paired = rel.join(shifted, Seq("d", "p"), "left")
        .na.fill(0L, Seq("r2"))
      rel = denseRank(paired, Seq("r", "r2"), "rn")
        .select(col("d"), col("p"), col("rn").as("r"))
      ladder(len) = rel
    }

    // H-capped suffix order over the S rows only, with the filter-level
    // rank CARRIED so the early pair filter and the TOP descent round are
    // free column compares instead of four shuffle joins
    val lf = levels.filter(_ <= minLen).max
    val topRel0 = ladder(levels.last)
      .join(pos0.filter(col("ins")).select(col("d"), col("p"), col("rem")),
        Seq("d", "p"))
    val topRel =
      if (lf == levels.last) topRel0.withColumn("rlf", col("r"))
      else topRel0.join(
        ladder(lf).select(col("d"), col("p"), col("r").as("rlf")), Seq("d", "p"))
    val pairs = adjacentPairs(topRel, Seq("r", "d", "p"))
    // EARLY PAIR FILTER: a pair contributing a start (lcp ≥ minLen) must
    // share its lf-prefix — pairs that don't are dead weight for every
    // descent join below. The TOP descent level applies here too: both
    // sides' top ranks ride the pair row (offset 0 — the first round
    // always runs at lcp = 0).
    var adj = pairs.filter(col("x_rlf") === col("y_rlf"))
      .select(col("x_d").as("d1"), col("x_p").as("p1"), col("x_rem").as("rem1"),
        col("y_d").as("d2"), col("y_p").as("p2"), col("y_rem").as("rem2"),
        when(col("x_r") === col("y_r"), lit(levels.last.toLong))
          .otherwise(lit(0L)).as("lcp"))

    // binary LCP descent over the remaining ladder levels
    for (len <- levels.reverse.drop(1)) {
      val rl = ladder(len)
      adj = adj
        .withColumn("q1", col("p1") + col("lcp"))
        .withColumn("q2", col("p2") + col("lcp"))
        .join(rl.select(col("d").as("d1"), col("p").as("q1"), col("r").as("xr")),
          Seq("d1", "q1"), "left")
        .join(rl.select(col("d").as("d2"), col("p").as("q2"), col("r").as("yr")),
          Seq("d2", "q2"), "left")
        .withColumn("lcp",
          when(col("xr").isNotNull && col("yr").isNotNull && col("xr") === col("yr"),
            col("lcp") + len).otherwise(col("lcp")))
        .drop("q1", "q2", "xr", "yr")
    }
    // final < base chars refinement on the carried base-grams, then the
    // truncation clamp (equal truncated classes = fully equal suffixes)
    val kbs = pos0.select(col("d"), col("p"), col("kb"))
    val cpfx = (1 until base).map(i =>
      when(expr(s"substring(xk, 1, $i) = substring(yk, 1, $i)"), 1L).otherwise(0L))
      .reduce(_ + _)
    val lcps = adj
      .withColumn("q1", col("p1") + col("lcp"))
      .withColumn("q2", col("p2") + col("lcp"))
      .join(kbs.select(col("d").as("d1"), col("p").as("q1"), col("kb").as("xk")),
        Seq("d1", "q1"), "left")
      .join(kbs.select(col("d").as("d2"), col("p").as("q2"), col("kb").as("yk")),
        Seq("d2", "q2"), "left")
      .withColumn("lcp", col("lcp") +
        when(col("xk").isNotNull && col("yk").isNotNull, cpfx).otherwise(lit(0L)))
      .withColumn("lcp", least(col("lcp"), col("rem1"), col("rem2")))

    // dl(p) = max neighbor lcp; spans = per-doc interval merge
    val dl = lcps.select(col("d1").as("d"), col("p1").as("p"), col("lcp"))
      .unionByName(lcps.select(col("d2").as("d"), col("p2").as("p"), col("lcp")))
      .groupBy(col("d"), col("p")).agg(max(col("lcp")).as("dl"))
    val starts = dl.filter(col("dl") >= minLen)
      .withColumn("e", col("p") + col("dl")) // [p, e)
        val spans = starts
      .withColumn("pmax", max(col("e")).over(
        wd.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("newg",
        when(col("pmax").isNull || col("p") > col("pmax"), 1L).otherwise(0L))
      .withColumn("grp", sum(col("newg")).over(
        wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("d"), col("grp"))
      .agg(min(col("p")).as("span_start"),
        (max(col("e")) - min(col("p"))).as("span_len"),
        max(col("dl")).as("max_dl"))
      .select(col("d").as("doc_id"), col("span_start"), col("span_len"),
        col("max_dl"))
    spans
  }

  private def levelsFor(base: Int, horizon: Int): Seq[Int] = {
    require(horizon >= 2 * base && horizon % base == 0 &&
      Integer.bitCount(horizon / base) == 1,
      s"horizon=$horizon must be $base*2^k, k >= 1")
    Iterator.iterate(base)(_ * 2).takeWhile(_ <= horizon).toSeq
  }

  /** DuckDB replay of [[repeatSpans]] — the candidate prune, expansion,
    * every doubling round, the capped suffix order, the early pair
    * filter, the LCP descent, refinement, clamp, and span merge.
    * `dense_rank()` windows replace [[denseRank]]; CTEs are MATERIALIZED
    * (the chain references each level up to three times — default
    * inlining re-evaluates it exponentially, the q102 trap). */
  def oracleSql(table: String, idCol: String, textCol: String,
                minLen: Int, horizon: Int = 128): String = {
    require(minLen >= 9, s"minLen=$minLen")
    val base = if (minLen >= 32) 32 else 8
    val levels = levelsFor(base, horizon)
    val expand = levels.sum + base
    val winH = TextHash.md5LongSql(s"substr(t, p::INT, $base)")
    val sb = new StringBuilder
    sb ++= s"WITH tt AS MATERIALIZED (SELECT $idCol AS d, trim($textCol) AS t\n"
    sb ++= s"  FROM $table WHERE length(trim($textCol)) > 0),\n"
    sb ++= s"sp AS MATERIALIZED (SELECT d, p FROM (\n"
    sb ++= s"    SELECT d, p, count(*) OVER (PARTITION BY h) AS cnt FROM (\n"
    sb ++= s"      SELECT d, p, $winH AS h\n"
    sb ++= s"      FROM tt, LATERAL (SELECT unnest(range(1, greatest(length(t) - $base + 2, 1))) AS p) pp))\n"
    sb ++= s"  WHERE cnt >= 2),\n"
    sb ++= s"iv AS MATERIALIZED (SELECT d, min(p) AS lo, max(e) AS hi FROM (\n"
    sb ++= s"    SELECT d, p, e, sum(CASE WHEN pmax IS NULL OR p > pmax THEN 1 ELSE 0 END)\n"
    sb ++= s"      OVER (PARTITION BY d ORDER BY p ROWS UNBOUNDED PRECEDING) AS grp FROM (\n"
    sb ++= s"      SELECT d, p, p + $expand AS e,\n"
    sb ++= s"        max(p + $expand) OVER (PARTITION BY d ORDER BY p\n"
    sb ++= s"          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax\n"
    sb ++= s"      FROM sp))\n"
    sb ++= s"  GROUP BY d, grp),\n"
    sb ++= s"pos AS MATERIALIZED (\n"
    sb ++= s"  SELECT q.d, q.p, substr(q.t, q.p::INT, $base) AS kb,\n"
    sb ++= s"         (length(q.t) - q.p + 1)::BIGINT AS rem,\n"
    sb ++= s"         (s.p IS NOT NULL) AS ins\n"
    sb ++= s"  FROM (SELECT iv.d, tt.t, unnest(range(iv.lo, least(iv.hi, length(tt.t)) + 1)) AS p\n"
    sb ++= s"        FROM iv JOIN tt ON tt.d = iv.d) q\n"
    sb ++= s"  LEFT JOIN sp s ON s.d = q.d AND s.p = q.p),\n"
    sb ++= s"lv$base AS MATERIALIZED (SELECT d, p,\n"
    sb ++= s"    dense_rank() OVER (ORDER BY kb)::BIGINT AS r FROM pos),\n"
    for (len <- levels.drop(1)) {
      val half = len / 2
      sb ++= s"lv$len AS MATERIALIZED (SELECT a.d, a.p,\n"
      sb ++= s"    dense_rank() OVER (ORDER BY a.r, coalesce(b.r, 0))::BIGINT AS r\n"
      sb ++= s"  FROM lv$half a LEFT JOIN lv$half b ON b.d = a.d AND b.p = a.p + $half),\n"
    }
    val topLv = s"lv${levels.last}"
    sb ++= s"sa AS MATERIALIZED (SELECT v.d, v.p, q.rem,\n"
    sb ++= s"    row_number() OVER (ORDER BY v.r, v.d, v.p) AS saidx\n"
    sb ++= s"  FROM $topLv v JOIN pos q ON q.d = v.d AND q.p = v.p AND q.ins),\n"
    val lf = levels.filter(_ <= minLen).max
    sb ++= s"adj0 AS MATERIALIZED (SELECT a.d1, a.p1, a.rem1, a.d2, a.p2, a.rem2, a.lcp\n"
    sb ++= s"  FROM (SELECT x.d AS d1, x.p AS p1, x.rem AS rem1,\n"
    sb ++= s"          y.d AS d2, y.p AS p2, y.rem AS rem2, 0::BIGINT AS lcp\n"
    sb ++= s"        FROM sa x JOIN sa y ON y.saidx = x.saidx + 1) a\n"
    sb ++= s"  JOIN lv$lf fx ON fx.d = a.d1 AND fx.p = a.p1\n"
    sb ++= s"  JOIN lv$lf fy ON fy.d = a.d2 AND fy.p = a.p2\n"
    sb ++= s"  WHERE fx.r = fy.r),\n"
    var prev = "adj0"
    var step = 0
    for (len <- levels.reverse) {
      step += 1
      val cur = s"adj$step"
      sb ++= s"$cur AS MATERIALIZED (SELECT a.d1, a.p1, a.rem1, a.d2, a.p2, a.rem2,\n"
      sb ++= s"    CASE WHEN xr.r IS NOT NULL AND yr.r IS NOT NULL AND xr.r = yr.r\n"
      sb ++= s"         THEN a.lcp + $len ELSE a.lcp END AS lcp\n"
      sb ++= s"  FROM $prev a\n"
      sb ++= s"  LEFT JOIN lv$len xr ON xr.d = a.d1 AND xr.p = a.p1 + a.lcp\n"
      sb ++= s"  LEFT JOIN lv$len yr ON yr.d = a.d2 AND yr.p = a.p2 + a.lcp),\n"
      prev = cur
    }
    val cpfx = (1 until base).map(i =>
      s"(CASE WHEN substr(xk.kb, 1, $i) = substr(yk.kb, 1, $i) THEN 1 ELSE 0 END)")
      .mkString(" + ")
    sb ++= s"lcps AS MATERIALIZED (SELECT a.d1, a.p1, a.d2, a.p2,\n"
    sb ++= s"    least(a.lcp + CASE WHEN xk.kb IS NOT NULL AND yk.kb IS NOT NULL\n"
    sb ++= s"                       THEN ($cpfx) ELSE 0 END,\n"
    sb ++= s"          a.rem1, a.rem2)::BIGINT AS lcp\n"
    sb ++= s"  FROM $prev a\n"
    sb ++= s"  LEFT JOIN pos xk ON xk.d = a.d1 AND xk.p = a.p1 + a.lcp\n"
    sb ++= s"  LEFT JOIN pos yk ON yk.d = a.d2 AND yk.p = a.p2 + a.lcp),\n"
    sb ++= s"dl AS MATERIALIZED (SELECT d, p, max(lcp) AS dl FROM (\n"
    sb ++= s"    SELECT d1 AS d, p1 AS p, lcp FROM lcps\n"
    sb ++= s"    UNION ALL SELECT d2, p2, lcp FROM lcps) GROUP BY d, p),\n"
    sb ++= s"st AS MATERIALIZED (SELECT d, p, p + dl AS e, dl FROM dl WHERE dl >= $minLen),\n"
    sb ++= s"mg AS MATERIALIZED (SELECT d, p, e, dl,\n"
    sb ++= s"    max(e) OVER (PARTITION BY d ORDER BY p\n"
    sb ++= s"      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax\n"
    sb ++= s"  FROM st),\n"
    sb ++= s"gg AS MATERIALIZED (SELECT d, p, e, dl,\n"
    sb ++= s"    sum(CASE WHEN pmax IS NULL OR p > pmax THEN 1 ELSE 0 END)\n"
    sb ++= s"      OVER (PARTITION BY d ORDER BY p ROWS UNBOUNDED PRECEDING) AS grp\n"
    sb ++= s"  FROM mg)\n"
    sb ++= s"SELECT d AS doc_id, min(p)::BIGINT AS span_start,\n"
    sb ++= s"  (max(e) - min(p))::BIGINT AS span_len, max(dl)::BIGINT AS max_dl\n"
    sb ++= s"FROM gg GROUP BY d, grp"
    sb.toString
  }
}
