package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{BloomFilterAggregate, TextHash}
import graft.operators.{AsOfJoin, RangeJoin, SkewJoin, StreamingAggregates}

/** Scale-path operators whose results must be IDENTICAL to their naive
  * forms — the oracle runs the naive SQL, the Spark side runs the
  * scale-hardened implementation, and the driver's hash compare proves the
  * rewrite is semantics-preserving.
  */
object ScaleQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // RENDEZVOUS (highest-random-weight) SHARDING — the consistent
    // assignment scheme shard topologies grow under: doc → argmax over
    // shards of md5(doc:shard). The defining property, measured exactly:
    // growing 8 → 9 shards moves ONLY the docs whose new shard-8 score
    // wins (~1/9 of the corpus), where mod-hashing would reshuffle ~8/9.
    // Both assignments and the moved share are exact integers; argmax =
    // first position of the max (md5 scores distinct w.h.p., and BOTH
    // engines return the first max on a tie). Map-side math per doc +
    // two tiny shard rollups.
    "q270_rendezvous_sharding" -> ((s, d) => {
      def scores(n: Int) = transform(sequence(lit(0), lit(n - 1)),
        i => TextHash.md5Long(
          concat(col("doc_id").cast("string"), lit(":"), i.cast("string"))))
      val assigned = Tables.documents(s, d).select(col("doc_id"))
        .withColumn("s8", scores(8))
        .withColumn("s9", scores(9))
        .select(col("doc_id"),
          (array_position(col("s8"), array_max(col("s8"))) - 1).as("shard8"),
          (array_position(col("s9"), array_max(col("s9"))) - 1).as("shard9"))
        .persist() // two shard rollups + the moved summary
      val n8 = assigned.groupBy(col("shard8").as("shard")).agg(count(lit(1)).as("n8"))
      val n9 = assigned.groupBy(col("shard9").as("shard")).agg(count(lit(1)).as("n9"))
      val moved = assigned.agg(count(lit(1)).as("total"),
        sum((col("shard8") =!= col("shard9")).cast("long")).as("moved"))
      n8.join(n9, Seq("shard"), "full_outer")
        .select(col("shard"), coalesce(col("n8"), lit(0L)).as("n8"),
          coalesce(col("n9"), lit(0L)).as("n9"))
        .crossJoin(moved)
        .withColumn("moved_bp", expr("moved * 10000 div total"))
    }),

    // Salted skew join == plain equi-join (salting is internal).
    "q25_skew_join_salted" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_extendedprice"))
      val o  = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority"))
      SkewJoin.saltedJoin(li, o, "l_orderkey", "o_orderkey", saltFactor = 8)
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(
          round(sum(col("l_extendedprice")), 2).as("total_price"),
          count(lit(1)).as("n_items"))
    }),

    // Tumbling-window aggregation (batch form of the streaming plan).
    "q26_tumbling_window" -> ((s, d) =>
      StreamingAggregates.tumbling(Tables.events(s, d), watermark = None)),

    // Sliding-window aggregation: 1-hour windows every 30 minutes (each
    // event contributes to 2 overlapping windows).
    "q48_sliding_window" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .select(unix_micros(col("window.start")).as("window_start_us"),
          col("event_type"), col("n_events"))),

    // As-of join: each error event gets the user's latest prior purchase.
    "q36_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d).withColumn("ts_us", unix_micros(col("ts")))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val purchases = ev.filter(col("event_type") === "purchase" && col("value").isNotNull)
        .groupBy(col("user_id"), col("ts_us"))
        .agg(round(max(col("value")), 2).as("purchase_value"))
      // the custom LogicalPlan+Strategy+SparkPlan merge operator; proven
      // equal to the union+window composition in AsOfJoinSpec
      AsOfJoin.latestPriorMerge(errors, purchases, "user_id", "ts_us", "purchase_value")
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("asof_ts"), col("asof_purchase_value"))
    }),

    // Last-touch attribution: every purchase credits the user's latest
    // prior click (the custom AsOfJoinPlan merge again — left side
    // purchases this time), unattributed purchases fall into the organic
    // bucket (click_id −1). Revenue rides exact integer cents; the top-20
    // report orders on a (revenue, user, click) total order. The standard
    // marketing-attribution shape: two event-type filters, one as-of
    // merge on the user key, one hash-agg.
    "q112_attribution" -> ((s, d) => {
      val ev = Tables.events(s, d).withColumn("us", unix_micros(col("ts")))
      val purchases = ev.filter(col("event_type") === "purchase" && col("value").isNotNull)
        .groupBy(col("user_id"), col("us"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("us"))
        .agg(max(col("event_id")).as("click_id"))
      AsOfJoin.latestPriorMerge(purchases, clicks, "user_id", "us", "click_id")
        .groupBy(col("user_id"),
          coalesce(col("asof_click_id"), lit(-1L)).as("click_id"))
        .agg(count(lit(1)).as("n_purchases"), sum(col("cents")).as("revenue_cents"))
        .orderBy(desc("revenue_cents"), asc("user_id"), asc("click_id"))
        .limit(20)
    }),

    // First-touch vs last-touch attribution, reconciled per user — the
    // report a marketing team argues over: for each user's purchases, how
    // often do the two models credit the SAME click, and how much revenue
    // is organic (no prior click) under either. Last-touch rides the
    // custom as-of merge (q112's machinery); first-touch needs no as-of
    // at all — a user's first-prior click is their globally FIRST click
    // whenever it precedes the purchase (one min-struct aggregate), which
    // is the cheap-plan insight this query demonstrates. Exact cents.
    "q160_attribution_compare" -> ((s, d) => {
      val ev = Tables.events(s, d).withColumn("us", unix_micros(col("ts")))
      val purchases = ev.filter(col("event_type") === "purchase" && col("value").isNotNull)
        .groupBy(col("user_id"), col("us"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("us"))
        .agg(max(col("event_id")).as("click_id"))
      val last = AsOfJoin.latestPriorMerge(purchases, clicks, "user_id", "us", "click_id")
      val first = clicks.groupBy(col("user_id"))
        .agg(min(struct(col("us"), col("click_id"))).as("f"))
        .select(col("user_id"), col("f.us").as("first_us"),
          col("f.click_id").as("first_click_id"))
      last.join(first, Seq("user_id"), "left")
        .select(col("user_id"), col("cents"),
          coalesce(col("asof_click_id"), lit(-1L)).as("last_click"),
          when(col("first_us") <= col("us"), col("first_click_id"))
            .otherwise(lit(-1L)).as("first_click"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(col("cents")).as("revenue_cents"),
          sum(when(col("last_click") === col("first_click"), 1L).otherwise(0L))
            .as("n_same_click"),
          sum(when(col("first_click") === -1L, 1L).otherwise(0L)).as("n_organic"))
    }),

    // Range join: lineitems falling in each 35-day month-anchored window.
    "q37_range_join" -> ((s, d) => {
      val iv = Tables.orders(s, d)
        .select(date_trunc("month", col("o_orderdate")).as("w_start")).distinct()
        .withColumn("w_end", col("w_start") + expr("INTERVAL 35 DAYS"))
        .withColumn("window_label", date_format(col("w_start"), "yyyyMM"))
      val pts = Tables.lineitem(s, d).select(col("l_shipdate"), col("l_extendedprice"))
      RangeJoin.pointsInIntervals(pts, iv, "l_shipdate", "w_start", "w_end")
        .groupBy(col("window_label"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice")), 2).as("total_price"))
    }),
    // Interval-overlap join: cross-user session pairs that overlap in
    // time (who was online together), via the bucketed interval×interval
    // equi-join (day buckets ≈ session scale) with first-bucket dedup —
    // never the BroadcastNestedLoop a raw inequality join plans. Reported
    // per overlap-start day: pair count + total overlap µs, all exact
    // integers. Output is inherently quadratic in instantaneous
    // concurrency — the semantics, not the plan.
    "q90_session_overlap" -> ((s, d) => {
      // both join sides derive from the sessionizer — persist it or the
      // events sort-window runs twice. Bucket = 1 HOUR, matched to session
      // scale (minutes): candidate volume is Σ_buckets |a|·|b|, and a
      // 24×-coarser day bucket measured ~24M candidates vs ~1M here
      // (7.9 s → ~1.3 s at sf0.1).
      val sess = graft.operators.Sessionize.batch(Tables.events(s, d))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val a = sess.select(col("user_id").as("ua"),
        col("session_start_us").as("sa"), col("session_end_us").as("ea"))
      val b = sess.select(col("user_id").as("ub"),
        col("session_start_us").as("sb"), col("session_end_us").as("eb"))
      RangeJoin.intervalsOverlap(a, b, "sa", "ea", "sb", "eb",
          bucketWidth = 3600000000L)
        .filter(col("ua") < col("ub"))
        .select(greatest(col("sa"), col("sb")).as("os"),
          (least(col("ea"), col("eb")) - greatest(col("sa"), col("sb"))).as("dur"))
        .groupBy(timestamp_micros(col("os")).cast("date").as("day"))
        .agg(count(lit(1)).as("n_pairs"), sum(col("dur")).as("total_overlap_us"))
    }),

    // Bloom-filter semi-join reduction: prune the fact table against the
    // filtered dimension's 2¹⁶-bit bloom BEFORE the join. The bitset
    // builds with one 8 KB buffer per partition, broadcasts for free, and
    // the membership test runs map-side on the lineitem scan — at 100 TB
    // this sheds ~(1−fpp) of non-matching fact volume before any
    // exchange, where the dimension subset itself may be far past the
    // broadcast threshold. No false negatives ⇒ prune→join ≡ plain join,
    // which is exactly what the oracle checks.
    "q66_bloom_join" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val bits = 1 << 16; val depth = 4
      val bloomDf = o.agg(BloomFilterAggregate.bloom(
        TextHash.baseHash(col("o_orderkey").cast("string")), bits, depth).as("bf"))
      // hash once in the scan projection — the 4 probe bits reuse it,
      // instead of re-digesting the key inside each membership conjunct
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_returnflag"), col("l_extendedprice"),
          TextHash.baseHash(col("l_orderkey").cast("string")).as("lh"))
      li.crossJoin(broadcast(bloomDf))
        .filter(BloomFilterAggregate.mightContain(col("bf"), col("lh"), bits, depth))
        .drop("bf", "lh")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice")), 2).as("total_price"))
    }),

    // Z-order (Morton) clustering keys — the data-layout primitive behind
    // multi-dimensional file skipping: interleave the bits of two 16-bit
    // dimension buckets so range predicates on EITHER dimension touch few
    // contiguous z-ranges. Pure integer bit-spreading (masks + shifts),
    // codegen'd map-side; the per-z-bucket min/max summary is what a
    // layout optimizer would write as file-level column stats. The oracle
    // replays the identical bit arithmetic in DuckDB.
    "q67_zorder_layout" -> ((s, d) => {
      val z = graft.functions.ZOrder.interleave(
        col("l_partkey") % 65536, col("l_suppkey") % 65536)
      Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey"), z.as("z"))
        .groupBy(shiftright(col("z"), 14).as("z_bucket"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("l_partkey")).as("pk_min"), max(col("l_partkey")).as("pk_max"),
          min(col("l_suppkey")).as("sk_min"), max(col("l_suppkey")).as("sk_max"))
    }),

    // Hilbert-curve layout — q67's stronger sibling: consecutive curve
    // positions are ALWAYS grid-adjacent (Morton jumps diagonals at
    // power-of-two boundaries), so equal-count curve-range buckets have
    // tighter per-bucket coordinate bounds — the property that makes
    // min/max file skipping prune better at the same file count
    // (HilbertSpec measures the bounding-box win against Morton on a full
    // grid). The per-level quadrant walk runs as one codegen expression;
    // the oracle replays all 16 levels as a CTE chain.
    "q285_hilbert_layout" -> ((s, d) => {
      val h = graft.functions.Hilbert.index(
        col("l_partkey") % 65536, col("l_suppkey") % 65536, bits = 16)
      Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey"), h.as("h"))
        .groupBy(shiftright(col("h"), 14).as("h_bucket"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("l_partkey")).as("pk_min"), max(col("l_partkey")).as("pk_max"),
          min(col("l_suppkey")).as("sk_min"), max(col("l_suppkey")).as("sk_max"))
    }),
  )

  val oracle: Map[String, String] = Map(
    "q270_rendezvous_sharding" -> {
      val h = TextHash.md5LongSql("doc_id::VARCHAR || ':' || i::VARCHAR")
      s"""WITH sc AS (SELECT doc_id,
         |        list_transform(range(0, 8), i -> $h) AS s8,
         |        list_transform(range(0, 9), i -> $h) AS s9
         |      FROM documents),
         |a AS (SELECT doc_id,
         |        (list_position(s8, list_max(s8)) - 1)::BIGINT AS shard8,
         |        (list_position(s9, list_max(s9)) - 1)::BIGINT AS shard9
         |      FROM sc),
         |c8 AS (SELECT shard8 AS shard, count(*)::BIGINT AS n8 FROM a GROUP BY 1),
         |c9 AS (SELECT shard9 AS shard, count(*)::BIGINT AS n9 FROM a GROUP BY 1),
         |mv AS (SELECT count(*)::BIGINT AS total,
         |         sum(CASE WHEN shard8 <> shard9 THEN 1 ELSE 0 END)::BIGINT AS moved
         |       FROM a)
         |SELECT coalesce(c8.shard, c9.shard) AS shard,
         |  coalesce(n8, 0)::BIGINT AS n8, coalesce(n9, 0)::BIGINT AS n9,
         |  total, moved, (moved * 10000 // total)::BIGINT AS moved_bp
         |FROM c8 FULL JOIN c9 ON c8.shard = c9.shard, mv""".stripMargin
    },

    "q25_skew_join_salted" ->
      """SELECT o_orderpriority AS priority,
        |  round(sum(l_extendedprice), 2) AS total_price, count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,

    "q26_tumbling_window" -> StreamingAggregates.tumblingOracleSql(),

    "q48_sliding_window" ->
      """WITH w AS (
        |  SELECT event_type,
        |    unnest([(epoch_us(ts) // 1800000000) * 1800000000,
        |            (epoch_us(ts) // 1800000000) * 1800000000 - 1800000000]) AS window_start_us
        |  FROM events)
        |SELECT window_start_us, event_type, count(*) AS n_events
        |FROM w GROUP BY window_start_us, event_type""".stripMargin,

    "q112_attribution" ->
      """WITH ev AS (SELECT event_id, user_id, event_type, value, epoch_us(ts) AS us FROM events),
        |p AS (SELECT user_id, us, sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS cents
        |      FROM ev WHERE event_type = 'purchase' AND value IS NOT NULL
        |      GROUP BY user_id, us),
        |c AS (SELECT user_id, us, max(event_id) AS click_id
        |      FROM ev WHERE event_type = 'click' GROUP BY user_id, us),
        |a AS (SELECT p.user_id, p.cents, c.click_id
        |      FROM p ASOF LEFT JOIN c
        |        ON p.user_id = c.user_id AND p.us >= c.us)
        |SELECT user_id, coalesce(click_id, -1) AS click_id,
        |  count(*) AS n_purchases, sum(cents)::BIGINT AS revenue_cents
        |FROM a GROUP BY user_id, coalesce(click_id, -1)
        |ORDER BY revenue_cents DESC, user_id, click_id LIMIT 20""".stripMargin,

    "q160_attribution_compare" ->
      """WITH ev AS (SELECT event_id, user_id, event_type, value, epoch_us(ts) AS us
        |  FROM events),
        |p AS (SELECT user_id, us, sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS cents
        |      FROM ev WHERE event_type = 'purchase' AND value IS NOT NULL
        |      GROUP BY user_id, us),
        |c AS (SELECT user_id, us, max(event_id) AS click_id
        |      FROM ev WHERE event_type = 'click' GROUP BY user_id, us),
        |l AS (SELECT p.user_id, p.us, p.cents, c.click_id
        |      FROM p ASOF LEFT JOIN c
        |        ON p.user_id = c.user_id AND p.us >= c.us),
        |f AS (SELECT user_id, min(us) AS first_us,
        |        min_by(click_id, us) AS first_click_id
        |      FROM c GROUP BY user_id),
        |j AS (SELECT l.user_id, l.cents,
        |        coalesce(l.click_id, -1) AS last_click,
        |        CASE WHEN f.first_us <= l.us THEN f.first_click_id
        |             ELSE -1 END AS first_click
        |      FROM l LEFT JOIN f ON l.user_id = f.user_id)
        |SELECT user_id, count(*)::BIGINT AS n_purchases,
        |  sum(cents)::BIGINT AS revenue_cents,
        |  sum(CASE WHEN last_click = first_click THEN 1 ELSE 0 END)::BIGINT
        |    AS n_same_click,
        |  sum(CASE WHEN first_click = -1 THEN 1 ELSE 0 END)::BIGINT AS n_organic
        |FROM j GROUP BY user_id""".stripMargin,

    "q36_asof_join" ->
      """WITH ev AS (SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us FROM events),
        |errors AS (SELECT event_id, user_id, ts_us FROM ev WHERE event_type = 'error'),
        |purchases AS (
        |  SELECT user_id, ts_us, round(max(value), 2) AS purchase_value
        |  FROM ev WHERE event_type = 'purchase' AND value IS NOT NULL
        |  GROUP BY user_id, ts_us)
        |SELECT e.event_id, e.user_id, e.ts_us,
        |  p.ts_us AS asof_ts, p.purchase_value AS asof_purchase_value
        |FROM errors e ASOF LEFT JOIN purchases p
        |  ON e.user_id = p.user_id AND e.ts_us >= p.ts_us""".stripMargin,

    // the bloom prune cannot change the join result — the oracle IS the
    // plain join
    "q66_bloom_join" ->
      """SELECT l_returnflag, count(*) AS n_items,
        |  round(sum(l_extendedprice), 2) AS total_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY l_returnflag""".stripMargin,

    "q67_zorder_layout" ->
      """WITH s AS (SELECT l_partkey, l_suppkey,
        |        l_partkey % 65536 AS a, l_suppkey % 65536 AS b FROM lineitem),
        |x1 AS (SELECT *, (a | (a << 8)) & 16711935 AS a1,
        |        (b | (b << 8)) & 16711935 AS b1 FROM s),
        |x2 AS (SELECT *, (a1 | (a1 << 4)) & 252645135 AS a2,
        |        (b1 | (b1 << 4)) & 252645135 AS b2 FROM x1),
        |x3 AS (SELECT *, (a2 | (a2 << 2)) & 858993459 AS a3,
        |        (b2 | (b2 << 2)) & 858993459 AS b3 FROM x2),
        |x4 AS (SELECT *, (a3 | (a3 << 1)) & 1431655765 AS a4,
        |        (b3 | (b3 << 1)) & 1431655765 AS b4 FROM x3),
        |z AS (SELECT l_partkey, l_suppkey, (a4 | (b4 << 1)) AS z FROM x4)
        |SELECT z >> 14 AS z_bucket, count(*) AS n_rows,
        |  min(l_partkey) AS pk_min, max(l_partkey) AS pk_max,
        |  min(l_suppkey) AS sk_min, max(l_suppkey) AS sk_max
        |FROM z GROUP BY z_bucket""".stripMargin,

    "q285_hilbert_layout" -> {
      val ctes = graft.functions.Hilbert.oracleCtes(
        "(SELECT l_partkey, l_suppkey FROM lineitem)",
        "l_partkey % 65536", "l_suppkey % 65536", bits = 16)
      s"""WITH $ctes
         |SELECT (hd16 // 16384)::BIGINT AS h_bucket, count(*)::BIGINT AS n_rows,
         |  min(l_partkey)::BIGINT AS pk_min, max(l_partkey)::BIGINT AS pk_max,
         |  min(l_suppkey)::BIGINT AS sk_min, max(l_suppkey)::BIGINT AS sk_max
         |FROM hl15 GROUP BY 1""".stripMargin
    },

    "q90_session_overlap" -> {
      val sessSql = graft.operators.Sessionize.batchOracleSql()
      s"""WITH sess AS ($sessSql),
         |p AS (SELECT greatest(a.session_start_us, b.session_start_us) AS os,
         |        least(a.session_end_us, b.session_end_us)
         |          - greatest(a.session_start_us, b.session_start_us) AS dur
         |      FROM sess a JOIN sess b
         |        ON a.user_id < b.user_id
         |       AND a.session_start_us <= b.session_end_us
         |       AND b.session_start_us <= a.session_end_us)
         |SELECT make_timestamp(os)::DATE AS day, count(*) AS n_pairs,
         |  sum(dur)::BIGINT AS total_overlap_us
         |FROM p GROUP BY day""".stripMargin
    },

    "q37_range_join" ->
      """WITH iv AS (
        |  SELECT w_start, w_start + INTERVAL 35 DAY AS w_end,
        |    strftime(w_start, '%Y%m') AS window_label
        |  FROM (SELECT DISTINCT date_trunc('month', o_orderdate) AS w_start FROM orders))
        |SELECT window_label, count(*) AS n_items,
        |  round(sum(l_extendedprice), 2) AS total_price
        |FROM iv JOIN lineitem ON l_shipdate >= w_start AND l_shipdate < w_end
        |GROUP BY window_label""".stripMargin,
  )
}
