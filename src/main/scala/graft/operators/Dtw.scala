package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Banded dynamic-time-warping distance between integer series — the
  * template-matching primitive of time-series work (which daily activity
  * curves move together, shifted by up to `band` steps?).
  *
  * Execution follows the q293 domain-bounded discipline: the SERIES
  * relation is bounded by (keys × series length) — a function of the key
  * domain and the calendar, never of corpus size — so the heavy
  * aggregation (raw events → per-key per-step counts) runs distributed
  * and only the tiny aligned grid is collected for the O(pairs·n·band)
  * driver DP. Costs are |a_i − b_j| on exact longs; the DP is pure
  * integer min/add, so every distance is bit-reproducible.
  *
  * The DuckDB oracle replays the identical DP as a recursive CTE over
  * ANTI-DIAGONALS: dp cells on diagonal g depend only on diagonals g−1
  * (left/up) and g−2 (diagonal), so each recursion step computes one full
  * diagonal from the two it carries — the row-major form is inexpressible
  * in SQL recursion (the dp[i][j−1] intra-row dependency), the diagonal
  * form is exact. */
object Dtw {

  private val Inf = 1000000000000000L // out-of-band sentinel; Inf + cost stays < 2^63

  /** Exact banded DTW of two equal-length long series. Input magnitudes
    * are guarded so no REAL path cost can reach the Inf sentinel (a
    * genuine cost ≥ Inf would be clamped to "unreachable" here while the
    * oracle — which has no sentinel — returns the true distance). */
  def distance(a: Array[Long], b: Array[Long], band: Int): Long = {
    require(a.length == b.length && a.nonEmpty, "series must be equal-length, non-empty")
    val n = a.length
    val maxAbs = math.max(a.map(math.abs).max, b.map(math.abs).max)
    // longest monotone path has 2n−1 cells, each costing ≤ 2·maxAbs
    require((4L * n) * maxAbs < Inf,
      s"series magnitude $maxAbs too large for n=$n — worst path cost would reach the Inf sentinel")
    val dp = Array.fill(n, n)(Inf)
    for (i <- 0 until n; j <- math.max(0, i - band) to math.min(n - 1, i + band)) {
      val c = math.abs(a(i) - b(j))
      dp(i)(j) =
        if (i == 0 && j == 0) c
        else {
          val up = if (i > 0) dp(i - 1)(j) else Inf
          val left = if (j > 0) dp(i)(j - 1) else Inf
          val diag = if (i > 0 && j > 0) dp(i - 1)(j - 1) else Inf
          val best = math.min(math.min(up, left), diag)
          if (best >= Inf) Inf else c + best
        }
    }
    dp(n - 1)(n - 1)
  }

  /** All unordered key pairs' DTW over a COMPLETE aligned grid
    * `(key, idx ∈ 0..n−1, value)` — every key must cover every index
    * (gap-fill first; q87's calendar-fill precedent). The grid collect is
    * keys·n rows, guarded. Returns `(key_a, key_b, dtw)` with
    * key_a < key_b. */
  def pairwise(spark: SparkSession, grid: DataFrame,
               keyCol: String, idxCol: String, valCol: String,
               n: Int, band: Int): DataFrame = {
    require(n >= 1 && band >= 0)
    // keys must already BE strings: output pairs order by key_a < key_b,
    // and a silent numeric→string cast would reorder ("10" < "9") against
    // the oracle's native-type comparison
    require(grid.schema(keyCol).dataType == org.apache.spark.sql.types.StringType,
      s"pairwise needs a STRING key column (got ${grid.schema(keyCol).dataType}) — " +
        "format numeric keys explicitly so pair order is unambiguous")
    val rows = grid.select(col(keyCol), col(idxCol).cast("int"),
      col(valCol).cast("long")).collect()
    require(rows.length <= 100000,
      s"grid too large to collect (${rows.length} rows) — bound the key domain first")
    val byKey = rows.groupBy(_.getString(0)).map { case (k, rs) =>
      val arr = new Array[Long](n)
      val seen = new Array[Boolean](n)
      rs.foreach { r =>
        val i = r.getInt(1)
        require(i >= 0 && i < n, s"index $i outside 0..${n - 1} for key $k")
        require(!seen(i), s"duplicate index $i for key $k")
        seen(i) = true
        arr(i) = r.getLong(2)
      }
      require(seen.forall(identity), s"incomplete grid for key $k — gap-fill first")
      k -> arr
    }
    val keys = byKey.keys.toSeq.sorted
    val out = for {
      (ka, ia) <- keys.zipWithIndex; kb <- keys.drop(ia + 1)
    } yield (ka, kb, distance(byKey(ka), byKey(kb), band))
    import spark.implicits._
    out.toDF("key_a", "key_b", "dtw")
  }

  /** DuckDB replay: `gridSql` must yield `(k, i, v)` (the same complete
    * aligned grid), and the recursion computes every pair's DP by
    * anti-diagonals (see object doc). Each row carries its diagonal index
    * and an age tag (0 = newest diagonal, 1 = the one before); a step
    * SCATTERS every carried cell to the successor cells it feeds (down /
    * right / diagonal moves) and GROUP BY min folds the candidates — all
    * inner joins, because DuckDB's recursion rejects correlated outer
    * joins. Cells exist only where reachable, which equals the banded
    * DP's non-infinite cells. Emits `(key_a, key_b, dtw)`. */
  def oracleSql(gridSql: String, n: Int, band: Int): String = {
    val maxG = 2 * (n - 1)
    s"""WITH RECURSIVE
       |grid AS ($gridSql),
       |pr AS (SELECT a.k AS pa, b.k AS pb
       |       FROM (SELECT DISTINCT k FROM grid) a
       |       JOIN (SELECT DISTINCT k FROM grid) b ON a.k < b.k),
       |dp(pa, pb, age, g, i, val) AS (
       |  SELECT pa, pb, 0, 0, 0, abs(sa.v - sb.v)::BIGINT
       |  FROM pr JOIN grid sa ON sa.k = pr.pa AND sa.i = 0
       |       JOIN grid sb ON sb.k = pr.pb AND sb.i = 0
       |  UNION ALL
       |  (WITH cur AS (SELECT * FROM dp),
       |   contrib AS (
       |     SELECT pa, pb, g + 1 AS g, i + 1 AS i, val FROM cur WHERE age = 0
       |     UNION ALL SELECT pa, pb, g + 1, i, val FROM cur WHERE age = 0
       |     UNION ALL SELECT pa, pb, g + 2, i + 1, val FROM cur WHERE age = 1),
       |   newcells AS (
       |     SELECT co.pa, co.pb, co.g, co.i,
       |       (abs(sa.v - sb.v) + min(co.val))::BIGINT AS val
       |     FROM contrib co
       |     JOIN grid sa ON sa.k = co.pa AND sa.i = co.i
       |     JOIN grid sb ON sb.k = co.pb AND sb.i = co.g - co.i
       |     WHERE co.i BETWEEN 0 AND ${n - 1}
       |       AND (co.g - co.i) BETWEEN 0 AND ${n - 1}
       |       AND abs(co.i - (co.g - co.i)) <= $band AND co.g <= $maxG
       |     GROUP BY co.pa, co.pb, co.g, co.i, sa.v, sb.v)
       |   SELECT pa, pb, 0 AS age, g, i, val FROM newcells
       |   UNION ALL
       |   SELECT pa, pb, 1, g, i, val FROM cur WHERE age = 0 AND g + 1 <= $maxG)
       |)
       |SELECT pa AS key_a, pb AS key_b, val AS dtw
       |FROM dp WHERE age = 0 AND g = $maxG AND i = ${n - 1}""".stripMargin
  }
}
