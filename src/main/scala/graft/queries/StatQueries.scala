package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{TextHash, TopKAggregate}

/** Statistical / parity surface added in round 6 (fourth session):
  *
  *  - q165: multi-point weighted quantiles — the generalization of q155's
  *    weighted median to an arbitrary quantile VECTOR, all points narrowed
  *    in SHARED scans (operators/WeightedMedian.quantiles).
  *  - q166: KMV Jaccard — the similarity-flavored member of the KMV family
  *    (q143 cardinality, q151 intersection): J ≈ c/(k−1) from the theta
  *    sample, exact Jaccard emitted beside it, both hash-checked.
  *  - q167: built-in `session_window` batch parity — Spark's native
  *    Structured-Streaming session primitive run in batch mode, proven
  *    equal to the classic gap/island formulation DuckDB replays.
  */
object StatQueries {

  /** Mirrors AuditQueries' KMV constants (2^53 hash space: estimator
    * numerators stay int64 AND hashes are double-exact for TopKByScore). */
  private val KmvM = 9007199254740992L
  private val KmvK = 128

  private def kmvHash(userId: org.apache.spark.sql.Column) =
    pmod(TextHash.md5Long(concat(lit("kmv:"), userId.cast("string"))), lit(KmvM))

  private def kmvHashSql(e: String): String =
    s"(${TextHash.md5LongSql(s"'kmv:' || ($e)::VARCHAR")} % $KmvM)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Weighted p10/p50/p90 of price cents, weighted by shipped quantity,
    // per return flag — the full "inventory-weighted price band" readout,
    // not just the median. operators/WeightedMedian.quantiles narrows all
    // three targets in SHARED scans: each round is one pass over the data
    // joined to the union of live (group, quantile) ranges, so the band
    // costs ~the same scans as a single median, not 3×. Lower-quantile
    // definition (smallest v with running weight ≥ ceil(p·W)) keeps every
    // output an ELEMENT of the data — integer end to end, zero driver
    // value-collects, no interpolation ulp surface.
    "q165_weighted_quantiles" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"),
        round(col("l_quantity")).cast("long").as("qty"))
      graft.operators.WeightedMedian
        .quantiles(s, li, "l_returnflag", "cents", "qty",
          Seq(("p10", 1L, 10L), ("p50", 1L, 2L), ("p90", 9L, 10L)))
        .groupBy(col("l_returnflag"))
        .agg(max(col("total_weight")).as("total_weight"),
          max(when(col("p_label") === "p10", col("wquantile"))).as("wp10_cents"),
          max(when(col("p_label") === "p50", col("wquantile"))).as("wp50_cents"),
          max(when(col("p_label") === "p90", col("wquantile"))).as("wp90_cents"))
    }),

    // KMV Jaccard similarity between event-type user sets, from the q143
    // sketches alone: theta = k-th min of the pair's merged sketch; the
    // hashes strictly below theta are a uniform size-(k−1) sample of the
    // UNION, so the count c of sampled hashes present in BOTH sides gives
    // J ≈ c/(k−1) — emitted in basis points via integer div, so the
    // ESTIMATE ITSELF is hash-checked (q143's no-tolerance discipline).
    // Exact Jaccard (n_common, n_union from the real sets) sits beside it.
    // At scale the estimate path is T sketches + T² tiny array merges —
    // the pairwise similarity matrix without T² set joins.
    "q166_kmv_jaccard" -> ((s, d) => {
      val dist = Tables.events(s, d)
        .select(col("event_type"), col("user_id")).distinct()
        .withColumn("h", kmvHash(col("user_id")))
        .persist() // sketch build + exact-overlap oracle side by side
      val sk = dist.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_exact"),
          TopKAggregate.topK(-col("h").cast("double"), col("h"), KmvK).as("top"))
        .select(col("event_type"), col("n_exact"),
          col("top").getField("payload").as("hs"))
      val pairs = sk.as("x").join(sk.as("y"),
        col("x.event_type") < col("y.event_type"))
        .select(col("x.event_type").as("ta"), col("y.event_type").as("tb"),
          col("x.n_exact").as("na"), col("y.n_exact").as("nb"),
          col("x.hs").as("ha"), col("y.hs").as("hb"))
      val withTheta = pairs
        .withColumn("uni", array_sort(array_distinct(concat(col("ha"), col("hb")))))
        .withColumn("theta",
          when(size(col("uni")) >= KmvK, element_at(col("uni"), KmvK)))
        .withColumn("c", size(filter(col("uni"),
          x => x < coalesce(col("theta"), lit(Long.MaxValue)) &&
            array_contains(col("ha"), x) && array_contains(col("hb"), x))).cast("long"))
        // sample size: k−1 below theta, or the whole union when < k hashes
        .withColumn("samp",
          when(col("theta").isNull, size(col("uni")).cast("long"))
            .otherwise(lit((KmvK - 1).toLong)))
      val est = withTheta.select(col("ta"), col("tb"), col("na"), col("nb"),
        expr("(c * 10000) div samp").as("est_jaccard_bp"))
      val exact = dist.as("a").join(dist.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("ta"), col("b.event_type").as("tb"))
        .agg(count(lit(1)).as("n_common"))
      est.join(exact, Seq("ta", "tb"), "left")
        .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
        .withColumn("n_union", col("na") + col("nb") - col("n_common"))
        .select(col("ta"), col("tb"), col("n_common"), col("n_union"),
          expr("(n_common * 10000) div n_union").as("jaccard_bp"),
          col("est_jaccard_bp"))
    }),

    // Built-in session_window batch parity: Spark's native session
    // primitive (the same operator Structured Streaming uses for
    // streaming sessionization) over 30-minute gaps, per user — count,
    // exact cents volume, and the [first-event, last-event + gap) window.
    // The oracle replays the textbook gap/island formulation, proving the
    // built-in's merge rule (new session iff Δts ≥ gap) matches the
    // classic SQL semantics µs-for-µs. One user-keyed shuffle; the
    // session merge itself is Spark's internal sort-merge per key.
    "q167_session_window" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"), col("ts"),
        round(col("value") * 100).cast("long").as("cents"))
      ev.groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"))
        .select(col("user_id"), col("sw.start").as("session_start"),
          col("sw.end").as("session_end"), col("n_events"), col("sum_cents"))
    }),
  )

  val oracle: Map[String, String] = Map(

    "q165_weighted_quantiles" ->
      """WITH li AS (SELECT l_returnflag,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
        |    CAST(round(l_quantity) AS BIGINT) AS qty
        |  FROM lineitem),
        |c AS (SELECT l_returnflag, cents,
        |    sum(qty) OVER (PARTITION BY l_returnflag ORDER BY cents) AS cum
        |  FROM li),
        |t AS (SELECT l_returnflag, sum(qty)::BIGINT AS total_weight FROM li
        |      GROUP BY l_returnflag)
        |SELECT c.l_returnflag, total_weight,
        |  min(CASE WHEN cum >= (total_weight + 9) // 10 THEN cents END)::BIGINT
        |    AS wp10_cents,
        |  min(CASE WHEN cum >= (total_weight + 1) // 2 THEN cents END)::BIGINT
        |    AS wp50_cents,
        |  min(CASE WHEN cum >= (9 * total_weight + 9) // 10 THEN cents END)::BIGINT
        |    AS wp90_cents
        |FROM c JOIN t USING (l_returnflag)
        |GROUP BY c.l_returnflag, total_weight""".stripMargin,

    "q166_kmv_jaccard" -> {
      val h = kmvHashSql("user_id")
      s"""WITH dist AS (SELECT DISTINCT event_type, user_id FROM events),
         |hs AS (SELECT event_type, $h AS h FROM dist),
         |r AS (SELECT event_type, h,
         |        row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
         |        count(*) OVER (PARTITION BY event_type) AS n FROM hs),
         |sk AS (SELECT event_type, max(n)::BIGINT AS n_exact,
         |         list(h ORDER BY h) FILTER (WHERE rn <= $KmvK) AS hs
         |       FROM r GROUP BY event_type),
         |p AS (SELECT x.event_type AS ta, y.event_type AS tb,
         |        x.n_exact AS na, y.n_exact AS nb, x.hs AS ha, y.hs AS hb
         |      FROM sk x JOIN sk y ON x.event_type < y.event_type),
         |w AS (SELECT ta, tb, na, nb, ha, hb,
         |        list_sort(list_distinct(ha || hb)) AS uni FROM p),
         |th AS (SELECT ta, tb, na, nb, ha, hb, uni,
         |        CASE WHEN len(uni) >= $KmvK THEN uni[$KmvK] END AS theta FROM w),
         |cc AS (SELECT ta, tb, na, nb,
         |        len(list_filter(uni, x ->
         |          x < coalesce(theta, 9223372036854775807)
         |          AND list_contains(ha, x) AND list_contains(hb, x)))::BIGINT AS c,
         |        (CASE WHEN theta IS NULL THEN len(uni)
         |              ELSE ${KmvK - 1} END)::BIGINT AS samp
         |       FROM th),
         |e AS (SELECT a.event_type AS ta, b.event_type AS tb,
         |        count(*)::BIGINT AS n_common
         |      FROM dist a JOIN dist b
         |        ON a.user_id = b.user_id AND a.event_type < b.event_type
         |      GROUP BY 1, 2)
         |SELECT cc.ta, cc.tb, coalesce(n_common, 0)::BIGINT AS n_common,
         |  (na + nb - coalesce(n_common, 0))::BIGINT AS n_union,
         |  ((coalesce(n_common, 0) * 10000)
         |    // (na + nb - coalesce(n_common, 0)))::BIGINT AS jaccard_bp,
         |  ((c * 10000) // samp)::BIGINT AS est_jaccard_bp
         |FROM cc LEFT JOIN e ON e.ta = cc.ta AND e.tb = cc.tb""".stripMargin
    },

    "q167_session_window" ->
      """WITH e AS (SELECT user_id, ts, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |o AS (SELECT user_id, ts, event_id, cents,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (SELECT user_id, ts, cents,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end,
        |  count(*)::BIGINT AS n_events, sum(cents)::BIGINT AS sum_cents
        |FROM g GROUP BY user_id, sid""".stripMargin,
  )
}
