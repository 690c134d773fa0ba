package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** The shared KMV constants/hash (TextHash is the single source). */
  private val KmvM = TextHash.KmvM
  private val KmvK = 128

  private def kmvHash(userId: org.apache.spark.sql.Column) = TextHash.kmvHash(userId)

  private def kmvHashSql(e: String): String = TextHash.kmvHashSql(e)

  /** Poisson(1) CDF as integer millionth thresholds — constants, not
    * runtime float exp: P(X ≤ k)·10^6 floored, weights capped at 9
    * (P(X > 8) < 1.2e-6). Identical literals on both engines. */
  private val poissonCaseSql =
    "CASE WHEN u < 367879 THEN 0 WHEN u < 735758 THEN 1 " +
      "WHEN u < 919698 THEN 2 WHEN u < 981011 THEN 3 " +
      "WHEN u < 996340 THEN 4 WHEN u < 999405 THEN 5 " +
      "WHEN u < 999916 THEN 6 WHEN u < 999989 THEN 7 " +
      "WHEN u < 999998 THEN 8 ELSE 9 END"

  /** q182's one-explode pair relation and k-rarest-shingle universe,
    * factored so the plan spec can assert the universe selection contains
    * NO Window node: the k-rarest pick is the bounded map-side-combined
    * [[TopKAggregate.topK]] (score = −doc-frequency, tie key = the
    * portable md5-long of the shingle), never an unpartitioned
    * `row_number` window — a global single-task sort of a relation that
    * grows with the corpus. Returns (pairs, universe); `pairs` is
    * persisted (consumed by both the global counts and the caller's
    * universe join) — the caller unpersists. */
  private[graft] def setCoverRelations(
      s: SparkSession, d: String, k: Int): (DataFrame, DataFrame) = {
    // spread the compact doc rows before the corpus-wide shingle explode
    // (fan-out map pass; no-op at scale, see operators/Spread)
    val pairs = graft.operators.Spread.rows(Tables.documents(s, d))
      .select(col("source"), explode(TextHash.wordShingles(col("text"), 3)).as("t"))
      .groupBy(col("source"), col("t")).agg(count(lit(1)).as("pn"))
      .persist()
    val counts = pairs.groupBy(col("t")).agg(sum(col("pn")).as("cnt"))
      .withColumn("h", TextHash.md5Long(col("t")))
    val universe = counts
      .groupBy()
      .agg(TopKAggregate.topK((-col("cnt")).cast("double"), col("h"), k).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.payload").as("h"))
      .join(counts.select(col("t"), col("h")), "h")
      .select(col("t"))
    (pairs, universe)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Banded DTW between the event types' daily activity curves — which
    // signals move together under shifts up to a week (operators/Dtw).
    // The distributed work is the events→(type, day) count aggregation;
    // the aligned grid is DOMAIN-bounded (types × 30 days — the q293
    // discipline), collected for the O(pairs·n·band) integer driver DP.
    // The oracle replays the SAME DP as an anti-diagonal recursive CTE —
    // the row-major recurrence is inexpressible in SQL recursion, the
    // diagonal form is exact — so every distance hash-matches.
    "q302_dtw_activity" -> ((s, d) => {
      val (n, band) = (30, 7)
      val daily = Tables.events(s, d)
        .select(col("event_type"),
          datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).as("day"))
        .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("c"))
      val grid = Tables.events(s, d).select(col("event_type")).distinct()
        .select(col("event_type"), explode(sequence(lit(0), lit(n - 1))).as("day"))
        .join(daily, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day"), coalesce(col("c"), lit(0L)).as("c"))
      graft.operators.Dtw.pairwise(s, grid, "event_type", "day", "c", n, band)
    }),

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

    // Decision-stump induction over an embedding feature — the ML split
    // primitive behind tree learners, EXACT: feature = micro-quantized
    // dim-0 value, 64 equal-width integer bins (broadcast min/max cut,
    // q135's no-sort idiom), and for every split boundary the weighted
    // Gini objective as an exact RATIONAL — maximizing
    //   Σ_c l_c²/n_L + Σ_c r_c²/n_R  ⇔  minimizing impurity, emitted as
    // score_num = (Σl²)·n_R + (Σr²)·n_L over score_den = n_L·n_R (int64:
    // ≤ N²·N at any tested SF). Every boundary row is hash-checked — no
    // argmax float compare anywhere. Shape at scale: one linear scan into
    // (bin, label) counts (≤ 64·|labels| rows); the boundary sweep is a
    // tiny non-equi join on that relation, never on data.
    "q168_gini_stump" -> ((s, d) => {
      val f = Tables.embeddings(s, d).select(col("label"),
        graft.functions.PortableMath.microHalfAway(
          graft.operators.VectorOps.asDouble(col("embedding"))(0)).as("micro"))
      val mm = f.agg(min(col("micro")).as("mn"), max(col("micro")).as("mx"))
      val bins = f.crossJoin(broadcast(mm))
        .select(col("label"),
          expr("(micro - mn) div ((mx - mn) div 64 + 1)").as("bin"))
      val per = bins.groupBy(col("bin"), col("label"))
        .agg(count(lit(1)).as("n")).persist() // tiny (≤ 64·|labels|), 4 consumers
      val tot = per.groupBy(col("label")).agg(sum(col("n")).as("nt"))
      val grand = per.agg(sum(col("n")).as("nn"))
      val bounds = per.select(col("bin").as("b")).distinct()
        .crossJoin(broadcast(per.agg(max(col("bin")).as("mxb"))))
        .filter(col("b") < col("mxb")).select(col("b"))
      val lcounts = bounds.join(per, per("bin") <= bounds("b"))
        .groupBy(col("b"), col("label")).agg(sum(col("n")).as("nl"))
      val cells = bounds.crossJoin(tot)
        .join(lcounts, Seq("b", "label"), "left")
        .withColumn("nl", coalesce(col("nl"), lit(0L)))
      cells.groupBy(col("b"))
        .agg(sum(col("nl")).as("n_left"), sum(col("nl") * col("nl")).as("sl2"),
          sum((col("nt") - col("nl")) * (col("nt") - col("nl"))).as("sr2"))
        .crossJoin(broadcast(grand))
        .select(col("b").as("boundary_bin"), col("n_left"),
          (col("nn") - col("n_left")).as("n_right"),
          (col("sl2") * (col("nn") - col("n_left"))
            + col("sr2") * col("n_left")).as("score_num"),
          (col("n_left") * (col("nn") - col("n_left"))).as("score_den"))
    }),

    // Consecutive event-type trigrams per user (ordered by ts, event_id —
    // the deterministic sort key the testdata's ts ties require), counted
    // globally: the length-3 extension of q72's Markov transitions, the
    // classic sequential-pattern primitive. One user-keyed window, then a
    // hash aggregate over ≤ |types|³ keys.
    "q169_event_trigrams" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("t1"))
        .withColumn("t2", lead(col("t1"), 1).over(w))
        .withColumn("t3", lead(col("t1"), 2).over(w))
        .filter(col("t3").isNotNull)
        .groupBy(col("t1"), col("t2"), col("t3"))
        .agg(count(lit(1)).as("n"))
    }),

    // Winsorized mean of order cents per priority class — the robust
    // mean a quality pipeline uses when tails are suspect: clamp to the
    // [p05, p95] lower order statistics (WeightedMedian.quantiles at
    // weight 1 — exact ELEMENT quantiles, both points in shared scans),
    // then an integer clamped sum. No interpolation, no float mean: the
    // mean ships as (100·Σ) div n centi-cents beside the exact sum.
    "q170_winsorized_mean" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_orderpriority").as("priority"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
        .withColumn("one", lit(1L))
      val qs = graft.operators.WeightedMedian
        .quantiles(s, o, "priority", "cents", "one",
          Seq(("p05", 1L, 20L), ("p95", 19L, 20L)))
        .groupBy(col("priority"))
        .agg(max(when(col("p_label") === "p05", col("wquantile"))).as("q05"),
          max(when(col("p_label") === "p95", col("wquantile"))).as("q95"))
      o.join(broadcast(qs), "priority")
        .withColumn("cl", greatest(col("q05"), least(col("q95"), col("cents"))))
        .groupBy(col("priority"))
        .agg(count(lit(1)).as("n"), max(col("q05")).as("q05_cents"),
          max(col("q95")).as("q95_cents"), sum(col("cl")).as("wsum_cents"))
        .withColumn("wmean_centicents", expr("(wsum_cents * 100) div n"))
    }),

    // Leave-one-out out-of-vocabulary rate per source: the share of a
    // source's token OCCURRENCES whose (lowercased) token appears in no
    // OTHER source — the "how much does this source depend on its own
    // vocabulary" corpus-mixing audit. Exact integer counts and basis
    // points. Linear: one token explode, one (token, source) aggregate,
    // then token-keyed joins on the aggregated (small) relation.
    "q171_loo_oov" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("source"), explode(TextHash.tokens(lower(col("text")))).as("t"))
        .filter(col("t") =!= "")
      val perTokSrc = tok.groupBy(col("t"), col("source"))
        .agg(count(lit(1)).as("n")).persist() // two consumers below
      val srcSpan = perTokSrc.groupBy(col("t"))
        .agg(countDistinct(col("source")).as("nsrc"))
      perTokSrc.join(srcSpan, "t")
        .groupBy(col("source"))
        .agg(sum(col("n")).as("n_tokens"),
          sum(when(col("nsrc") === 1, col("n")).otherwise(0L)).as("n_oov"),
          countDistinct(when(col("nsrc") === 1, col("t"))).as("n_oov_types"))
        .withColumn("oov_bp", expr("(n_oov * 10000) div n_tokens"))
    }),

    // Theil–Sen robust trend of the daily event-revenue series — median
    // of all pairwise slopes, EXACT: slopes stay rational pairs
    // (Δcents, Δdays) and the median element is selected under the total
    // order (num·2^20 div den, num, den, d1, d2) — an integer key that
    // REFINES the true rational order (trunc of a monotone map never
    // inverts it; sub-2^-20 ties break lexicographically, then by the
    // unique day pair). |num|·2^20 needs |Δcents| < 2^43 ≈ $88B/day —
    // loudly out of reach. The pair set is CALENDAR-bounded (≤366 days ⇒
    // ≤67k pairs at ANY data scale), so the O(P log P) single-partition
    // rank is driver-scale by construction — the same argument as q136's
    // day frame. The full-data work is one linear day-rollup.
    "q172_theil_sen" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
        .select(datediff(col("day"), lit("1970-01-01").cast("date"))
          .cast("long").as("di"), col("cents"))
      val pairs = daily.as("a").join(daily.as("b"), col("a.di") < col("b.di"))
        .select(col("a.di").as("d1"), col("b.di").as("d2"),
          (col("b.cents") - col("a.cents")).as("num"),
          (col("b.di") - col("a.di")).as("den"))
        .withColumn("key", expr("(num * 1048576L) div den"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("key"), col("num"), col("den"), col("d1"), col("d2"))
      pairs
        .withColumn("rn", row_number().over(w))
        .crossJoin(broadcast(pairs.agg(count(lit(1)).as("n_pairs"))))
        .filter(col("rn") === expr("(n_pairs + 1) div 2"))
        .select(col("n_pairs"), col("num").as("med_num"), col("den").as("med_den"),
          expr("(num * 1000) div den").as("slope_millicents_per_day"))
    }),

    // Poisson bootstrap over order totals — THE at-scale resampling
    // scheme (per-row-independent Poisson(1) weights, no global
    // multinomial draw): B=32 deterministic replicates, each row's weight
    // read off the md5-uniform through the Poisson(1) CDF as integer
    // literal thresholds (no runtime float exp). The replicate means ship
    // as integer centi-cents, so every replicate row is hash-checked —
    // deterministic error bars with zero tolerance gate. Shape at scale:
    // a map-side 32× explode feeding a 32-group partial-agged sum — the
    // shuffle carries B rows per partition, never the data.
    "q173_poisson_bootstrap" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      o.select(col("o_orderkey"), col("cents"),
          explode(sequence(lit(0), lit(31))).as("b"))
        .withColumn("u", pmod(TextHash.md5Long(
          concat(lit("pb:"), col("b").cast("string"), lit(":"),
            col("o_orderkey").cast("string"))), lit(1000000L)))
        .withColumn("w", expr(poissonCaseSql))
        .groupBy(col("b"))
        .agg(sum(col("w")).as("n_eff"),
          sum(col("w") * col("cents")).as("sum_cents"))
        .withColumn("mean_centicents", expr("(sum_cents * 100) div n_eff"))
    }),

    // Linear gap imputation — the interpolation dual of q87's LOCF: a
    // missing day between two observed days gets
    //   prev + (Δcents · days_since_prev) div gap_days
    // (integer trunc division, portable both engines). Same per-user
    // calendar spine and single user-keyed sort-window pass as q87; the
    // two bracketing values come from one backward ignore-nulls window
    // and one forward ignore-nulls window over the same sort.
    "q174_linear_impute" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("user_id"), col("ts").cast("date").as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      val spine = daily.groupBy(col("user_id"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
      val di = datediff(col("day"), lit("1970-01-01").cast("date")).cast("long")
      val wb = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      spine.join(daily, Seq("user_id", "day"), "left")
        .withColumn("di", di)
        .withColumn("pv", last(col("cents"), ignoreNulls = true).over(wb))
        .withColumn("pd", last(when(col("cents").isNotNull, col("di")),
          ignoreNulls = true).over(wb))
        .withColumn("nv", first(col("cents"), ignoreNulls = true).over(wf))
        .withColumn("nd", first(when(col("cents").isNotNull, col("di")),
          ignoreNulls = true).over(wf))
        .select(col("user_id"), col("day"), col("cents"),
          when(col("cents").isNotNull, col("cents"))
            .otherwise(col("pv") + expr("((nv - pv) * (di - pd)) div (nd - pd)"))
            .as("imputed_cents"),
          col("cents").isNull.as("is_gap"))
    }),

    // Rendezvous (highest-random-weight) hashing audit — the
    // consistent-placement primitive for sharded state: each key goes to
    // argmax_s md5("rv:s:key"), and growing 8 → 9 shards moves EXACTLY
    // the keys whose new-shard score beats their old max (rendezvous
    // guarantees moves only INTO the new shard, ≈ 1/9 of keys). Reported
    // per old shard: key count (balance) and moved fraction in basis
    // points — both exact integers. Fully map-side: the 9 scores are an
    // array-of-structs max per key, no explode, one tiny aggregate.
    "q175_rendezvous" -> ((s, d) => {
      def score(i: Int) = TextHash.md5Long(
        concat(lit(s"rv:$i:"), col("user_id").cast("string")))
      val arr8 = array((0 until 8).map(i =>
        struct(score(i).as("sc"), lit(i).as("sh"))): _*)
      Tables.events(s, d).select(col("user_id")).distinct()
        .withColumn("a8", array_max(arr8)) // struct order = (sc, sh) lexicographic
        .withColumn("s8", score(8))
        .withColumn("moved", col("s8") > col("a8.sc"))
        .groupBy(col("a8.sh").as("shard"))
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("moved"), 1L).otherwise(0L)).as("n_moved"))
        .withColumn("moved_bp", expr("(n_moved * 10000) div n_keys"))
    }),

    // HDR-histogram percentile BOUNDS from q89's power-of-2 latency
    // buckets: for p50/p90/p99 of per-user inter-arrival gaps, the owning
    // bucket's [2^(b−1), 2^b−1] range brackets the true percentile —
    // rank-exact bounds (the target rank is exact; only the VALUE is
    // bucketed), the standard way to read latency percentiles off a
    // bounded histogram without touching the data again. Integer end to
    // end: ceil targets, cumulative counts, bit-shift bucket edges. One
    // linear windowed pass builds the histogram; the sweep runs on the
    // tiny (types × ~45 bins) relation.
    "q176_hdr_percentiles" -> ((s, d) => {
      val w = Window.partitionBy(col("event_type"), col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val hist = Tables.events(s, d)
        .select(col("event_type"), col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"))
        .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
        .filter(col("gap").isNotNull)
        .withColumn("b", length(bin(col("gap"))))
        .groupBy(col("event_type"), col("b")).agg(count(lit(1)).as("n"))
      val wc = Window.partitionBy(col("event_type")).orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist.withColumn("cum", sum(col("n")).over(wc))
      val tot = hist.groupBy(col("event_type")).agg(sum(col("n")).as("nt"))
      cum.join(tot, "event_type")
        .withColumn("p", explode(array(lit(50), lit(90), lit(99))))
        .filter(col("cum") >= expr("(p * nt + 99) div 100"))
        .groupBy(col("event_type"), col("p"))
        .agg(max(col("nt")).as("n"), min(col("b")).as("bucket"))
        .select(col("event_type"), col("p"), col("n"), col("bucket"),
          when(col("bucket") === 1, 0L)
            .otherwise(expr("shiftleft(1L, cast(bucket AS int) - 1)"))
            .as("lb_us"),
          expr("shiftleft(1L, cast(bucket AS int)) - 1").as("ub_us"))
    }),

    // Heaps-law vocabulary growth curve: cumulative distinct token TYPES
    // vs cumulative token OCCURRENCES at each corpus decile (doc_id
    // order). "New type" attributes each token to its min-doc_id first
    // occurrence — an exact formulation that needs no ordered scan of
    // token events. The three prefix sums (tokens, new types, row index)
    // ride ONE operators/PrefixSum.runningMulti range shuffle — the
    // scale-safe dual of a single-partition ORDER BY window — and the
    // decile probe is a 10-row broadcast join.
    "q177_heaps_law" -> ((s, d) => {
      // spread the compact doc rows before the corpus-wide fan-out map
      // pass (no-op at scale, see operators/Spread)
      val tf = graft.operators.Spread.rows(Tables.documents(s, d))
        .select(col("doc_id"), explode(TextHash.tokens(lower(col("text")))).as("t"))
        .filter(col("t") =!= "").persist() // n_tok + first-seen consumers
      val nt = tf.groupBy(col("doc_id")).agg(count(lit(1)).as("n_tok"))
      val nn = tf.groupBy(col("t")).agg(min(col("doc_id")).as("doc_id"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_new"))
      val docs = Tables.documents(s, d).select(col("doc_id"))
        .join(nt, Seq("doc_id"), "left").join(nn, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("n_tok"), lit(0L)).as("n_tok"),
          coalesce(col("n_new"), lit(0L)).as("n_new"), lit(1L).as("one"))
      val cum = graft.operators.PrefixSum.runningMulti(docs, "doc_id",
        Seq("n_tok" -> "cum_tokens", "n_new" -> "cum_types", "one" -> "rn"))
      val pos = s.range(1, 11).toDF("decile")
        .crossJoin(broadcast(docs.agg(count(lit(1)).as("nd"))))
        .select(col("decile"), expr("(decile * nd) div 10").as("rn"))
      cum.join(broadcast(pos), "rn")
        .select(col("decile"), col("doc_id"), col("cum_tokens"), col("cum_types"))
    }),

    // Exact A/B conversion test — the two-proportion 2σ decision with NO
    // float anywhere: variant = md5 split of users, conversion = any
    // purchase event, and the z²>4 comparison
    //   (p̂_a − p̂_b)² > 4·p̂(1−p̂)(1/n_a + 1/n_b)
    // cross-multiplied to N·(c_a·n_b − c_b·n_a)² > 4·C·(N−C)·n_a·n_b —
    // decimal(38,0)/HUGEINT integers, so the SIGNIFICANT boolean itself is
    // hash-checked (the q68 exact-variance idiom applied to inference).
    // Shape: one user-keyed aggregate, then a 2-row rollup.
    "q179_ab_test" -> ((s, d) => {
      val perUser = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"))
        .withColumn("variant", when(TextHash.md5Long(
          concat(lit("ab:"), col("user_id").cast("string"))) % 2 === 0, "A")
          .otherwise("B"))
      val agg = perUser.groupBy(col("variant"))
        .agg(count(lit(1)).as("n"), sum(col("conv")).as("c"))
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      agg.filter(col("variant") === "A").select(col("n").as("n_a"), col("c").as("c_a"))
        .crossJoin(agg.filter(col("variant") === "B")
          .select(col("n").as("n_b"), col("c").as("c_b")))
        .select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
          expr("(c_a * 10000) div n_a").as("rate_a_bp"),
          expr("(c_b * 10000) div n_b").as("rate_b_bp"),
          (dec(col("n_a") + col("n_b")) *
            dec(col("c_a") * col("n_b") - col("c_b") * col("n_a")) *
            dec(col("c_a") * col("n_b") - col("c_b") * col("n_a"))).as("lhs"),
          (dec(lit(4)) * dec(col("c_a") + col("c_b")) *
            dec(col("n_a") + col("n_b") - col("c_a") - col("c_b")) *
            dec(col("n_a")) * dec(col("n_b"))).as("rhs"))
        .select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
          col("rate_a_bp"), col("rate_b_bp"),
          col("lhs").cast("string").as("lhs_num"),
          col("rhs").cast("string").as("rhs_num"),
          (col("lhs") > col("rhs")).as("significant"))
    }),

    // Weekly p10/p50/p90 revenue bands — WeightedMedian.quantiles with
    // the CALENDAR as the group domain (~52 live groups, three targets
    // each, all narrowed in shared scans): the operational "is this
    // week's distribution drifting" panel. Element quantiles of integer
    // cents — zero interpolation, zero driver value-collects.
    "q180_weekly_bands" -> ((s, d) => {
      val ev = Tables.events(s, d).select(
        date_trunc("week", col("ts")).cast("date").as("wk"),
        round(col("value") * 100).cast("long").as("cents"), lit(1L).as("one"))
      graft.operators.WeightedMedian
        .quantiles(s, ev, "wk", "cents", "one",
          Seq(("p10", 1L, 10L), ("p50", 1L, 2L), ("p90", 9L, 10L)))
        .groupBy(col("wk"))
        .agg(max(col("total_weight")).as("n_events"),
          max(when(col("p_label") === "p10", col("wquantile"))).as("p10_cents"),
          max(when(col("p_label") === "p50", col("wquantile"))).as("p50_cents"),
          max(when(col("p_label") === "p90", col("wquantile"))).as("p90_cents"))
    }),

    // Week-over-week top movers: the 10 largest absolute count swings
    // across (event_type, week) — the triage view on q84-style weekly
    // rollups. Counts are exact; |Δ| ranks on the TINY (types × weeks)
    // relation under a fully deterministic total order (|Δ| desc, type,
    // week), so LIMIT-style selection cannot flap between engines.
    "q181_top_movers" -> ((s, d) => {
      val weekly = Tables.events(s, d)
        .groupBy(col("event_type"),
          date_trunc("week", col("ts")).cast("date").as("wk"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("wk"))
      val delta = weekly
        .withColumn("prev_n", lag(col("n"), 1).over(w))
        .filter(col("prev_n").isNotNull)
        .withColumn("delta", col("n") - col("prev_n"))
      val rw = Window.orderBy(abs(col("delta")).desc, col("event_type"), col("wk"))
      delta.withColumn("rank", row_number().over(rw))
        .filter(col("rank") <= 10)
        .select(col("rank"), col("event_type"), col("wk"),
          col("prev_n"), col("n"), col("delta"))
    }),

    // Greedy SET COVER over the rare-shingle tail: which 3 sources cover
    // the most of the 200 rarest word-3-shingles — the "what do I lose
    // if I drop a source" curation question (rare phrasing is exactly
    // what subsetting destroys; the flat 31-token synthetic vocabulary
    // makes single TOKENS degenerate, shingles are the combinatorial
    // space). Greedy is the classic (1−1/e) approximation; each round is
    // fully distributed (one anti-join + count-per-source aggregate on
    // the BOUNDED source×universe relation) with only the argmax row and
    // its ≤200 newly-covered shingles reaching the driver — the BPE-loop
    // shape. The shingle explode runs ONCE: it reduces immediately to the
    // distinct (source, shingle) pair relation, global doc frequencies
    // derive from that, and the 200-rarest universe is a bounded
    // TopKByScore aggregate (score = −cnt, map-side-combined k-buffers —
    // never an unpartitioned row_number window, whose single-task global
    // sort grows with the corpus). Deterministic tiebreaks everywhere
    // ((df asc, md5-long of the shingle) for the universe — the hash is
    // the portable 60-bit tie key both engines replay — and
    // (gain desc, source) for the pick); rounds that cover nothing new
    // emit nothing on either engine.
    "q182_set_cover" -> ((s, d) => {
      val (pairs, universe) = setCoverRelations(s, d, 200)
      val ts = pairs.join(universe, "t").select(col("source"), col("t"))
        .persist() // 3 greedy rounds re-read it; distinct by construction
      var covered = Set.empty[String]
      def uncovered = if (covered.isEmpty) lit(true)
        else !col("t").isInCollection(covered.toSeq)
      val picks = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long, Long)]
      var done = false
      for (r <- 1 to 3 if !done) {
        // ONE action per greedy round: carry the winning source's token
        // list on the argmax row itself (bounded by the ≤200-token
        // universe) instead of a second filter+collect for the tokens
        val cand = ts.filter(uncovered)
          .groupBy(col("source")).agg(count(lit(1)).as("n"),
            collect_list(col("t")).as("toks"))
          .orderBy(col("n").desc, col("source").asc).limit(1).collect()
        if (cand.isEmpty) done = true
        else {
          val (src, n) = (cand(0).getString(0), cand(0).getLong(1))
          covered ++= cand(0).getSeq[String](2)
          picks += ((r, src, n, covered.size.toLong))
        }
      }
      ts.unpersist()
      pairs.unpersist()
      import s.implicits._
      picks.toSeq.toDF("rank", "source", "n_new", "n_cum")
    }),

    // Session bounce-rate panel by entry event type: sessions are q22's
    // strict-gap islands (gap > 30 min), the entry type is the session's
    // (ts, event_id)-first event read off ONE min-struct aggregate (the
    // q160 cheap-plan idiom — no second window pass), and a bounce is a
    // single-event session. One user-keyed sort-window pass + two tiny
    // aggregates; exact integer basis points.
    "q183_bounce_rate" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      val sess = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("prev", lag(col("us"), 1).over(w))
        .withColumn("brk", when(col("prev").isNull ||
          col("us") - col("prev") > 1800000000L, 1L).otherwise(0L))
        .withColumn("sid", sum(col("brk")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sid"))
        .agg(count(lit(1)).as("n_events"),
          min(struct(col("us"), col("event_id"), col("event_type")))
            .getField("event_type").as("entry_type"))
      sess.groupBy(col("entry_type"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounces"))
        .withColumn("bounce_bp", expr("(n_bounces * 10000) div n_sessions"))
    }),

    // Revenue concentration ("whale share"): the exact p99 ELEMENT
    // quantile of per-user purchase spend (WeightedMedian at weight 1 —
    // bounded narrowing, no sort, no collect), then one broadcast-
    // threshold pass: how many users sit at/above p99 and what share of
    // total revenue they carry, in integer basis points. The whole
    // readout is two linear passes + the quantile loop.
    "q184_whale_share" -> ((s, d) => {
      val spend = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100).cast("long")).as("spend"))
        .withColumn("g", lit("ALL")).withColumn("one", lit(1L))
        .persist() // quantile loop + final rollup
      val thr = graft.operators.WeightedMedian
        .quantile(s, spend, "g", "spend", "one", 99L, 100L)
        .select(col("wquantile").as("thr"))
      // harness clears the cache per query; thr is already driver-backed
      // (the quantile loop runs eagerly), so only the rollup reads spend
      spend.crossJoin(broadcast(thr))
        .agg(count(lit(1)).as("n_users"), sum(col("spend")).as("total_cents"),
          max(col("thr")).as("p99_spend_cents"),
          sum(when(col("spend") >= col("thr"), 1L).otherwise(0L)).as("n_whales"),
          sum(when(col("spend") >= col("thr"), col("spend")).otherwise(0L))
            .as("whale_cents"))
        .withColumn("share_bp", expr("(whale_cents * 10000) div total_cents"))
    }),

    // U-shaped (position-based) multi-touch attribution — the 40/20/40
    // industry model made EXACT: each purchase distributes 10000 basis
    // points over its prior clicks (first 4000, last 4000, middles share
    // 2000 by integer division with the remainder going to the EARLIEST
    // middles — so every purchase's credits sum to exactly 10000; 1 touch
    // → 10000, 2 → 5000/5000). Complements q112 (last-touch as-of) and
    // q160 (first-vs-last): the path-aware model between them. Shape: a
    // user-keyed purchase×click join (per-user bounded fan-out), one
    // per-purchase window, one tiny weekly rollup.
    "q185_u_attribution" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("tp"),
          col("event_id").as("pid"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), unix_micros(col("ts")).as("tc"),
          col("event_id").as("cid"),
          date_trunc("week", col("ts")).cast("date").as("wk"))
      val touches = purchases.join(clicks, Seq("user_id"))
        .filter(col("tc") < col("tp"))
      val w = Window.partitionBy(col("pid"))
      val wo = w.orderBy(col("tc"), col("cid"))
      touches
        .withColumn("m", count(lit(1)).over(w))
        .withColumn("pos", row_number().over(wo))
        .withColumn("credit_bp", expr(
          """CASE WHEN m = 1 THEN 10000
            |     WHEN m = 2 THEN 5000
            |     WHEN pos = 1 OR pos = m THEN 4000
            |     ELSE 2000 div (m - 2)
            |          + (CASE WHEN pos - 1 <= 2000 % (m - 2) THEN 1 ELSE 0 END)
            |END""".stripMargin))
        .groupBy(col("wk"))
        .agg(count(lit(1)).as("n_touches"),
          sum(col("credit_bp")).cast("long").as("credit_bp_total"))
    }),

    // 2-D SKYLINE (Pareto front) of orders on (price, date): the points
    // no other order beats on both dimensions — the classic
    // preference-query operator. After the distinct-pair reduction, the
    // dominance test is ONE distributed prefix-min over the (cents, day)
    // lexicographic order (PrefixSum.runningScans — range shuffle +
    // per-partition fold, never a single-partition window): a point
    // survives iff its day index beats the strict-prefix minimum.
    // key = cents·2^20 + dayindex is exact while cents < 2^42 and the
    // date sits before year ~4840 — both loudly out of range here.
    "q186_skyline" -> ((s, d) => {
      val pairs = Tables.orders(s, d).select(
          round(col("o_totalprice") * 100).cast("long").as("cents"),
          col("o_orderdate").cast("date").as("od"))
        .distinct()
        .withColumn("odi", datediff(col("od"),
          lit("1970-01-01").cast("date")).cast("long"))
        .withColumn("key", expr("cents * 1048576 + odi"))
        .withColumn("one", lit(1L))
      val cum = graft.operators.PrefixSum.runningScans(pairs, "key",
        Seq(("odi", "m", "min"), ("one", "rn", "sum")))
      val prev = cum.select((col("rn") + 1).as("rn"), col("m").as("m_prev"))
      cum.join(prev, Seq("rn"), "left")
        .filter(col("m_prev").isNull || col("odi") < col("m_prev"))
        .select(col("cents"), col("od"))
    }),

    // SCD2 temporal join — the warehouse pattern q95's history exists
    // for: facts (purchases) joined to the dimension VERSION valid at
    // fact time (valid_from ≤ t < valid_to, open current version). The
    // dimension is the user's NON-purchase activity-state history (runs
    // of click/view/signup/error — building it from all events would
    // make every purchase trivially match its own run). Implementation
    // is a user-keyed equi-join with the interval predicate applied
    // inside the co-partitioned match — per-user version lists are
    // bounded, so no interval-bucketing machinery is needed (contrast
    // q90, where neither side is keyed). Rolled up per concurrent
    // state: purchases, exact cents, versions touched.
    "q187_scd2_join" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      val wv = Window.partitionBy(col("user_id")).orderBy(col("ver"))
      val hist = Tables.events(s, d)
        .filter(col("event_type") =!= "purchase")
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("chg",
          when(!(lag(col("event_type"), 1).over(w) <=> col("event_type")), 1L)
            .otherwise(0L))
        .withColumn("ver",
          sum(col("chg")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("ver"), col("event_type").as("state"))
        .agg(min(col("us")).as("vf"))
        .withColumn("vt", lead(col("vf"), 1).over(wv))
      val purchases = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("pus"),
          round(col("value") * 100).cast("long").as("cents"))
      purchases.join(hist, Seq("user_id"))
        .filter(col("pus") >= col("vf") &&
          (col("vt").isNull || col("pus") < col("vt")))
        .groupBy(col("state"))
        .agg(count(lit(1)).as("n_purchases"), sum(col("cents")).as("sum_cents"),
          countDistinct(col("user_id"), col("ver")).as("n_versions"))
    }),

    // Embedding pair-distance histogram under BUCKET sampling — the
    // scale-safe way to read a distance distribution: an md5 coin drops
    // every vector into one of 32 buckets and only WITHIN-bucket pairs
    // are formed (a uniform pair sample at ~1/32 the quadratic cost,
    // the blocking idea LSH uses, here for diagnostics). Distances are
    // exact integer micro² (zip-fold over pre-quantized arrays, bounded
    // 64-dim work per pair); buckets are the power-of-2 length(bin(x))
    // idiom — float log2 is not cross-engine-exact at boundaries (q89).
    "q188_pair_distance_hist" -> ((s, d) => {
      val vecs = Tables.embeddings(s, d).select(col("vec_id"),
          transform(graft.operators.VectorOps.asDouble(col("embedding")),
            x => graft.functions.PortableMath.microHalfAway(x)).as("mv"))
        .withColumn("bkt", pmod(TextHash.md5Long(
          concat(lit("pd:"), col("vec_id").cast("string"))), lit(32L)))
      val pairs = vecs.as("a").join(vecs.as("b"),
        col("a.bkt") === col("b.bkt") && col("a.vec_id") < col("b.vec_id"))
      pairs
        .select(aggregate(
          zip_with(col("a.mv"), col("b.mv"), (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, v) => acc + v).as("d2"))
        .withColumn("bucket_log2", length(bin(col("d2"))))
        .groupBy(col("bucket_log2"))
        .agg(count(lit(1)).as("n_pairs"),
          min(col("d2")).as("min_d2"), max(col("d2")).as("max_d2"))
    }),

    // Bootstrap CONFIDENCE for the A/B lift — q173's Poisson resampling
    // composed with q179's conversion test: 32 deterministic replicates
    // of the per-variant conversion rates and their difference, all
    // integer basis points (per-user Poisson(1) weights from md5
    // uniforms, rates as weighted-count ratios under integer div). The
    // spread of diff_bp across replicates IS the sampling uncertainty of
    // the lift — error bars the z-formula (q179) only approximates, and
    // every replicate row is hash-checked. Same shape as q173: map-side
    // 32× explode into a 32-group aggregate.
    "q189_ab_bootstrap" -> ((s, d) => {
      val perUser = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"))
        .withColumn("va", TextHash.md5Long(
          concat(lit("ab:"), col("user_id").cast("string"))) % 2 === 0)
      perUser.select(col("user_id"), col("va"), col("conv"),
          explode(sequence(lit(0), lit(31))).as("b"))
        .withColumn("u", pmod(TextHash.md5Long(
          concat(lit("pb2:"), col("b").cast("string"), lit(":"),
            col("user_id").cast("string"))), lit(1000000L)))
        .withColumn("w", expr(poissonCaseSql))
        .groupBy(col("b"))
        .agg(sum(when(col("va"), col("w")).otherwise(0L)).as("n_a_eff"),
          sum(when(col("va"), col("w") * col("conv")).otherwise(0L)).as("c_a_eff"),
          sum(when(!col("va"), col("w")).otherwise(0L)).as("n_b_eff"),
          sum(when(!col("va"), col("w") * col("conv")).otherwise(0L)).as("c_b_eff"))
        .withColumn("rate_a_bp",
          when(col("n_a_eff") > 0, expr("(c_a_eff * 10000) div n_a_eff")))
        .withColumn("rate_b_bp",
          when(col("n_b_eff") > 0, expr("(c_b_eff * 10000) div n_b_eff")))
        .withColumn("diff_bp", col("rate_a_bp") - col("rate_b_bp"))
    }),

    // Frequent ITEMSET mining, order 3 — the family member above q129's
    // pairs: top-20 brand triples by basket support (exact counts,
    // relative support in basis points, fully deterministic
    // (support desc, brands lexicographic) order). Candidate volume is
    // Σ C(basket_brands, 3) ≤ 35·baskets — LINEAR because baskets are
    // small, the same argument as q129; shuffle-hash hints keep the
    // self-joins off the 1-task scan side (the q96 broadcast trap).
    "q190_frequent_triples" -> ((s, d) => {
      val b = Tables.lineitem(s, d).join(
          Tables.part(s, d).select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("ok"), col("p_brand").as("br"))
        .distinct().persist() // three self-join consumers
      val nb = b.select(col("ok")).distinct().count()
      val triples = b.as("x")
        .join(b.as("y").hint("shuffle_hash"),
          col("x.ok") === col("y.ok") && col("x.br") < col("y.br"))
        .join(b.as("z").hint("shuffle_hash"),
          col("x.ok") === col("z.ok") && col("y.br") < col("z.br"))
        .groupBy(col("x.br").as("b1"), col("y.br").as("b2"), col("z.br").as("b3"))
        .agg(count(lit(1)).as("n"))
      // rank runs on the ≤ C(|brands|,3) support relation — tiny by
      // construction; harness clears b's cache per query
      val w = Window.orderBy(col("n").desc, col("b1"), col("b2"), col("b3"))
      triples.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 20)
        .select(col("rank"), col("b1"), col("b2"), col("b3"), col("n"),
          expr(s"(n * 10000) div ${nb}L").as("support_bp"))
    }),

    // Lorenz curve at user deciles — the inequality readout behind q184's
    // single whale point and q118's Gini scalar: walking users by
    // ascending purchase spend, the cumulative share of users vs the
    // cumulative share of revenue, both in exact basis points. This is
    // the DISTRIBUTED-rank path q118's audit-class window defers to:
    // rank and running revenue ride one PrefixSum.runningMulti range
    // shuffle over the unique (spend·2^24 + user_id) order key (exact
    // while spend < 2^39 cents and user_id < 2^24 — loudly out of range
    // here), and the decile probe is a 10-row broadcast join.
    "q191_lorenz_deciles" -> ((s, d) => {
      val spend = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100).cast("long")).as("spend"))
        .withColumn("key", expr("spend * 16777216 + user_id"))
        .withColumn("one", lit(1L))
      val cum = graft.operators.PrefixSum.runningMulti(spend, "key",
        Seq("spend" -> "cum_cents", "one" -> "rn"))
      val tot = spend.agg(count(lit(1)).as("nu"), sum(col("spend")).as("tc"))
      val pos = s.range(1, 11).toDF("decile")
        .crossJoin(broadcast(tot))
        .select(col("decile"), expr("(decile * nu) div 10").as("rn"),
          col("nu"), col("tc"))
      cum.join(broadcast(pos), "rn")
        .select(col("decile"),
          expr("(rn * 10000) div nu").as("user_share_bp"),
          col("cum_cents"),
          expr("(cum_cents * 10000) div tc").as("revenue_share_bp"))
    }),

    // Cohort LTV triangle — revenue by (first-seen week, weeks since):
    // the companion to q70's retention triangle with MONEY on the cells,
    // plus the running (cumulative) LTV per cohort. Cohorts come from
    // one min-aggregate per user; the cumulative window runs over the
    // calendar-bounded (cohorts × ages) relation, never the data. All
    // exact integer cents.
    "q192_cohort_ltv" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val cohort = ev.groupBy(col("user_id"))
        .agg(min(date_trunc("week", col("ts")).cast("date")).as("cohort_wk"))
      val weekly = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("wk"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      val cells = weekly.join(cohort, "user_id")
        .withColumn("age_weeks", expr("datediff(wk, cohort_wk) div 7"))
        .groupBy(col("cohort_wk"), col("age_weeks"))
        .agg(countDistinct(col("user_id")).as("n_buyers"),
          sum(col("cents")).as("revenue_cents"))
      val sizes = cohort.groupBy(col("cohort_wk"))
        .agg(count(lit(1)).as("cohort_size"))
      val wcum = Window.partitionBy(col("cohort_wk")).orderBy(col("age_weeks"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cells.join(sizes, "cohort_wk")
        .withColumn("cum_revenue_cents", sum(col("revenue_cents")).over(wcum))
        .select(col("cohort_wk"), col("age_weeks"), col("cohort_size"),
          col("n_buyers"), col("revenue_cents"), col("cum_revenue_cents"))
    }),

    // DAU/WAU stickiness — daily actives over trailing-7-day actives in
    // exact basis points, q76's contribution-day explode reused for the
    // WAU denominator (each (user, day) pair contributes to 7 trailing
    // windows — a map-side explode into a hash-agg, no windowed
    // count-distinct). Days outside the observed span are not emitted.
    "q193_stickiness" -> ((s, d) => {
      val ud = Tables.events(s, d)
        .select(col("user_id"), col("ts").cast("date").as("day")).distinct()
        .persist() // DAU + WAU contribution explode
      val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
      val wau = ud
        .select(col("user_id"), explode(sequence(col("day"),
          date_add(col("day"), 6))).as("wday"))
        .select(col("user_id"), col("wday").as("day")).distinct()
        .groupBy(col("day")).agg(count(lit(1)).as("wau"))
      dau.join(wau, "day")
        .select(col("day"), col("dau"), col("wau"),
          expr("(dau * 10000) div wau").as("stickiness_bp"))
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

    // Truncated-geometric EWMA trend smoothing, EXACT: the classic
    // recursive EWMA needs x·αᵏ float powers, but with α = 1/2 truncated
    // at 8 terms the weights are 2⁷..2⁰ — pure shifts — and normalizing
    // by the PRESENT weights (den) makes the series warmup exact too.
    // Row-wise (observed-day) smoothing per event type: one co-partitioned
    // window, 8 lags, integer div — the whole smoothed series is
    // hash-checked with zero float surface.
    "q220_ewma_smoothing" -> ((s, d) => {
      val daily = Tables.events(s, d).filter(col("value").isNotNull)
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val num = (0 to 7).map(k =>
        coalesce(lag(col("cents"), k).over(w), lit(0L)) * lit(1L << (7 - k)))
        .reduce(_ + _)
      val den = (0 to 7).map(k =>
        when(lag(col("cents"), k).over(w).isNotNull, lit(1L << (7 - k)))
          .otherwise(lit(0L))).reduce(_ + _)
      daily.withColumn("num", num).withColumn("den", den)
        .select(col("event_type"), col("day"), col("cents"),
          expr("(num * 100) div den").as("ewma_cents_x100"))
    }),

    // Single changepoint detection: the split of the daily revenue series
    // with the largest mean shift |μ_l − μ_r| — binary segmentation's
    // first step, in EXACT integers: with prefix sums (S_l, n_l),
    // μ_l − μ_r = (n_r·S_l − n_l·S_r)/(n_l·n_r), truncated to whole cents
    // by integer division (decimal(38,0) ⇔ HUGEINT — the numerator is
    // O(n·S) and its square O((n·S)²), past int64 at warehouse scale);
    // the argmax runs on the truncated shift² with the earlier day as the
    // deterministic tie-break, so both engines pick the identical split.
    // The candidate relation is calendar-days — bounded at any SF — so
    // the one unpartitioned window is driver-scale (q152's documented
    // stance); the only full-data work is the daily aggregation.
    "q221_changepoint" -> ((s, d) => {
      val daily = Tables.events(s, d).filter(col("value").isNotNull)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("x"))
      val w = Window.orderBy(col("day")) // ≤366 rows: driver-scale
        .rowsBetween(Window.unboundedPreceding, 0)
      val tot = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val scored = daily
        .select(col("day"), sum(col("x")).over(w).as("sl"),
          count(lit(1)).over(w).as("nl"))
        .crossJoin(broadcast(tot))
        .filter(col("nl") < col("n")) // a split needs a nonempty right side
        .select(col("day"), col("nl"), (col("n") - col("nl")).as("nr"),
          col("sl"), (col("s") - col("sl")).as("sr"))
        .withColumn("t", dec(col("nr")) * dec(col("sl")) - dec(col("nl")) * dec(col("sr")))
        .withColumn("shift_cents", expr("t div cast(nl * nr as decimal(38,0))"))
      scored
        .select(max(struct(
          (dec(col("shift_cents")) * dec(col("shift_cents"))).as("sc2"),
          (lit(0L) - datediff(col("day"), lit("1970-01-01").cast("date"))).as("tb"),
          col("day"), col("nl"), col("nr"), col("shift_cents"))).as("m"))
        .select(col("m.day").as("split_day"), col("m.nl").as("n_before"),
          col("m.nr").as("n_after"), col("m.shift_cents").as("mean_shift_cents"))
    }),

    // TIME-CONSTRAINED conversion funnel — q64 counts stage ORDER, this
    // counts clicks answered by a purchase WITHIN ONE HOUR (the product
    // metric with an attribution window): a co-partitioned user join with
    // the exact µs interval predicate, converted clicks dedup'd by id
    // (one purchase can answer many clicks and vice versa — the DISTINCT
    // is the semantics, not a cleanup), daily conversion in exact bp.
    // Per-user fan-out bounds the join; the calendar bounds the output.
    "q325_timed_conversion" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("cts"))
      val purch = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("pts"))
      val conv = clicks.join(purch, Seq("user_id"))
        .filter(col("pts") > col("cts") &&
          col("pts") <= col("cts") + expr("INTERVAL 1 HOUR"))
        .select(col("click_id")).distinct()
      clicks.select(col("click_id"), col("cts").cast("date").as("day"))
        .join(conv.withColumn("hit", lit(1L)), Seq("click_id"), "left")
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n_clicks"),
          coalesce(sum(col("hit")), lit(0L)).as("n_converted"))
        .select(col("day"), col("n_clicks"), col("n_converted"),
          expr("n_converted * 10000 div n_clicks").as("conversion_bp"))
    }),

    // WILSON LOWER-BOUND ranking — the statistically-sound way to rank by
    // a proportion (raw return rate ranks a 1/1 part above a 90/100 one;
    // the Wilson LCB penalizes small n): per part, returned lines x of n,
    //   LCB(z=2) = (x + 2 − 2·√(x(n−x)/n + 1)) / (n + 4)
    // evaluated in IDENTICALLY-ORDERED double arithmetic on both engines
    // (one correctly-rounded sqrt — the q152 precedent — no other
    // transcendental), portable-rounded to 6 decimals BEFORE the ranking
    // compare so the top-20 cutoff sees the same values everywhere. Stats
    // are one hash-agg; the ranking is bounded TakeOrdered.
    "q324_wilson_ranking" -> ((s, d) => {
      val st = Tables.lineitem(s, d).groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("x"))
        .filter(col("n") >= 20)
      val lcb = (col("x").cast("double") + 2.0 -
        lit(2.0) * sqrt(col("x").cast("double") * (col("n") - col("x")) / col("n") + 1.0)) /
        (col("n").cast("double") + 4.0)
      st.select(col("l_partkey"), col("n"), col("x"),
          graft.functions.PortableMath.roundPortable(lcb, 6).as("wilson_lcb"))
        .orderBy(desc("wilson_lcb"), asc("l_partkey")).limit(20)
    }),

    // Exponential TIME-DECAY leaderboard (half-life = 1 day): the "trending
    // users" rollup — score at the horizon = Σ cents·2^(t−T). Scaling by
    // 2^T makes every weight the EXACT integer 2^t (a bit shift — no float
    // pow, no div at all), so the whole leaderboard is one hash-agg of
    // cents·(1<<t) in decimal(38,0) (day indices bound the shift; sums
    // outgrow int64 at warehouse scale) + a bounded TakeOrdered top-20
    // with (score DESC, user) determinism. Scores hash-check as strings
    // (HUGEINT ⇔ decimal). Same decay family as q220's EWMA but over an
    // unordered aggregate — no recursion, no window, scan-shaped.
    "q321_decayed_leaderboard" -> ((s, d) =>
      Tables.events(s, d).filter(col("value").isNotNull)
        .select(col("user_id"),
          expr("""cast(cast(round(value * 100) as bigint) as decimal(38,0)) *
                  shiftleft(cast(1 as bigint),
                    datediff(cast(ts as date), date'2024-01-01'))""").as("w"))
        .groupBy(col("user_id"))
        .agg(sum(col("w")).as("score_scaled"))
        .orderBy(desc("score_scaled"), asc("user_id")).limit(20)
        .select(col("user_id"),
          col("score_scaled").cast("string").as("score_scaled_str"))),

    // HOLT linear-trend smoothing (double exponential, α = β = 1/2) of the
    // per-type daily activity curves — the trend-aware sibling of q220's
    // EWMA. The coupled level/trend recursion has no order-free window
    // form, so it runs as the q293/q302 DOMAIN-BOUNDED driver recursion:
    // the distributed part is the daily count aggregation; the collected
    // relation is calendar-days × event-types (bounded at any SF), and
    // each step is integer milli math with truncating division
    //   l_t = (x_t·10³ + l + b) div 2,  b_t = (b + (l_t − l)) div 2
    // — the q81 per-round-div discipline (Scala `/`, Spark `div` and
    // DuckDB `//` all truncate toward zero on integers; re-verified).
    // Missing days zero-fill on a shared dense grid; init l₀ = x₀,
    // b₀ = x₁ − x₀ (the standard Holt start). The oracle replays the
    // SAME recursion as a recursive CTE over the materialized grid.
    "q317_holt_trend" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).as("t"))
        .agg(count(lit(1)).as("x"))
        .collect() // bounded: calendar days × event types
      val maxd = daily.map(_.getAs[Int]("t")).max
      // Holt needs two observations for its init; a one-day corpus has no
      // defined trend — emit zero rows, exactly like the oracle's failed
      // t=1 seed join (the two sides must agree on the degenerate case)
      val out = if (maxd < 1) Seq.empty[(String, Int, Long, Long)]
      else daily.groupBy(_.getString(0)).toSeq.flatMap { case (k, rs) =>
        val xm = Array.fill(maxd + 1)(0L)
        rs.foreach(r => xm(r.getAs[Int]("t")) = r.getLong(2) * 1000L)
        var l = xm(0)
        var b = xm(1) - xm(0)
        val buf = Seq.newBuilder[(String, Int, Long, Long)]
        buf += ((k, 0, l, b))
        for (t <- 1 to maxd) {
          val lN = (xm(t) + l + b) / 2
          val bN = (b + (lN - l)) / 2
          l = lN; b = bN
          buf += ((k, t, l, b))
        }
        buf.result()
      }
      import s.implicits._
      out.toDF("event_type", "day_idx", "level_milli", "trend_milli")
    }),

    // Exact tie-corrected KRUSKAL–WALLIS H across the event-type groups on
    // value cents — the k-group generalization of q215's rank machinery:
    // midranks live on the distinct-VALUE spine (bounded by the cents
    // domain, never the corpus), per-group doubled rank sums S = 2R come
    // from ONE distributed PrefixSum pass via the midrank identity, and H
    // rides decimal(38,0) with portable TRUNCATING division at each step
    // (the q81 per-round-div discipline: not the real-number H to
    // infinite precision, but the identical number on any engine, and
    // within 1e-3 of it). Tie correction 1 − Σ(t³−t)/(N³−N) applied the
    // same way; H clamped at 0 before the correction division (truncation
    // can push an H≈0 a hair negative, and negative `//` vs `div`
    // semantics must never be reachable); df = k−1 = 4 chi² verdict at
    // the 9.488 critical value in milli. den=0 guards on both engines.
    "q312_kruskal_wallis" -> ((s, d) => {
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val ev = Tables.events(s, d).filter(col("value").isNotNull)
        .select(col("event_type").as("grp"),
          round(col("value") * 100).cast("long").as("cents"))
        .persist() // spine + per-group counts
      val spine = ev.groupBy(col("cents")).agg(count(lit(1)).as("m"))
        .persist() // prefix pass + tie sum
      val mid = graft.operators.PrefixSum.running(spine, "cents", "m", "cm")
        .select(col("cents"),
          (lit(2L) * (col("cm") - col("m")) + col("m") + 1L).as("mid2"))
      val byGrp = ev.groupBy(col("grp"), col("cents")).agg(count(lit(1)).as("c"))
        .join(mid, "cents")
        .groupBy(col("grp"))
        .agg(sum(col("c")).as("n"), sum(dec(col("c")) * dec(col("mid2"))).as("s2"))
        .persist() // global H pieces + per-group output
      // floor(s2²/4n) STAYS decimal: `div` narrows to long and the
      // per-group quotient is O(N³) — subtract the exact pmod remainder
      // first so the decimal division is an exact multiple (its scale-6
      // rounding is then a no-op at any magnitude; the post-round
      // /code-review caught the long-narrowing here)
      val glob = byGrp.agg(sum(col("n")).as("nn"),
        sum(expr("""cast(((s2 * s2) - pmod(s2 * s2, 4 * cast(n as decimal(38,0))))
                    / (4 * cast(n as decimal(38,0))) as decimal(38,0))"""))
          .as("t4"))
      val ties = spine.agg(
        sum(dec(col("m")) * col("m") * col("m") - col("m")).as("tsum"))
      val h = glob.crossJoin(ties).select(
        greatest(
          expr("(3000 * t4) div (cast(nn as decimal(38,0)) * (nn + 1))") -
            lit(3000L) * (col("nn") + 1), lit(0L)).as("h_milli"),
        (dec(col("nn")) * col("nn") * col("nn") - col("nn")).as("nd"),
        (dec(col("nn")) * col("nn") * col("nn") - col("nn") - col("tsum"))
          .as("corr_num"))
        .select(col("h_milli"),
          when(col("corr_num") > 0, expr("(h_milli * nd) div corr_num"))
            .otherwise(col("h_milli")).as("h_adj"))
      byGrp.crossJoin(broadcast(h))
        .select(col("grp"), col("n"),
          col("s2").cast("string").as("rank_sum2_str"),
          expr("(s2 * 1000) div (2 * n)").cast("long").as("mean_rank_milli"),
          col("h_milli").cast("string").as("h_milli_str"),
          col("h_adj").cast("string").as("h_adj_milli_str"),
          (col("h_adj") > 9488L).as("significant"))
    }),
  )

  val oracle: Map[String, String] = Map(

    "q325_timed_conversion" ->
      """WITH c AS (SELECT user_id, event_id AS click_id, ts AS cts
        |  FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts AS pts FROM events WHERE event_type = 'purchase'),
        |conv AS (SELECT DISTINCT click_id FROM c JOIN p USING (user_id)
        |  WHERE pts > cts AND pts <= cts + INTERVAL 1 HOUR),
        |d AS (SELECT c.click_id, cts::DATE AS day,
        |    CASE WHEN conv.click_id IS NOT NULL THEN 1 ELSE 0 END AS hit
        |  FROM c LEFT JOIN conv ON conv.click_id = c.click_id)
        |SELECT day, count(*)::BIGINT AS n_clicks, sum(hit)::BIGINT AS n_converted,
        |  (sum(hit) * 10000 // count(*))::BIGINT AS conversion_bp
        |FROM d GROUP BY 1""".stripMargin,

    "q324_wilson_ranking" ->
      """WITH st AS (SELECT l_partkey, count(*)::BIGINT AS n,
        |    sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT AS x
        |  FROM lineitem GROUP BY 1 HAVING count(*) >= 20),
        |l AS (SELECT l_partkey, n, x,
        |    floor(((x::DOUBLE + 2 - 2 * sqrt(x::DOUBLE * (n - x) / n + 1))
        |      / (n::DOUBLE + 4)) * 1000000 + 0.5) / 1000000 AS wilson_lcb
        |  FROM st)
        |SELECT l_partkey, n, x, wilson_lcb FROM l
        |ORDER BY wilson_lcb DESC, l_partkey LIMIT 20""".stripMargin,

    "q321_decayed_leaderboard" ->
      """WITH ev AS (SELECT user_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents,
        |    date_diff('day', DATE '2024-01-01', ts::DATE) AS t
        |  FROM events WHERE value IS NOT NULL),
        |sc AS (SELECT user_id,
        |    sum(cents::HUGEINT * (1::HUGEINT << t)) AS s
        |  FROM ev GROUP BY 1)
        |SELECT user_id, s::VARCHAR AS score_scaled_str
        |FROM sc ORDER BY s DESC, user_id LIMIT 20""".stripMargin,

    "q317_holt_trend" ->
      """WITH RECURSIVE ev AS (SELECT event_type AS k,
        |    date_diff('day', DATE '2024-01-01', ts::DATE) AS t,
        |    count(*)::BIGINT AS x
        |  FROM events GROUP BY 1, 2),
        |mx AS (SELECT max(t) AS maxd FROM ev),
        |d AS MATERIALIZED (SELECT g.k, g.t, coalesce(e.x, 0) * 1000 AS xm
        |  FROM (SELECT k, unnest(range(0, maxd + 1)) AS t
        |        FROM (SELECT DISTINCT k FROM ev) kk, mx) g
        |  LEFT JOIN ev e ON e.k = g.k AND e.t = g.t),
        |s AS (
        |  SELECT d0.k, 0 AS t, d0.xm AS l, d1.xm - d0.xm AS b
        |  FROM d d0 JOIN d d1 ON d1.k = d0.k AND d1.t = 1
        |  WHERE d0.t = 0
        |  UNION ALL
        |  SELECT s.k, s.t + 1,
        |    (dn.xm + s.l + s.b) // 2,
        |    (s.b + ((dn.xm + s.l + s.b) // 2 - s.l)) // 2
        |  FROM s JOIN d dn ON dn.k = s.k AND dn.t = s.t + 1)
        |SELECT k AS event_type, t::BIGINT AS day_idx,
        |  l::BIGINT AS level_milli, b::BIGINT AS trend_milli
        |FROM s""".stripMargin,

    "q312_kruskal_wallis" ->
      """WITH ev AS (SELECT event_type AS grp,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |spine AS (SELECT cents, count(*)::BIGINT AS m FROM ev GROUP BY 1),
        |cum AS (SELECT cents, m,
        |    sum(m) OVER (ORDER BY cents)::BIGINT AS cm FROM spine),
        |mid AS (SELECT cents, 2 * (cm - m) + m + 1 AS mid2 FROM cum),
        |g AS (SELECT grp, cents, count(*)::BIGINT AS c FROM ev GROUP BY 1, 2),
        |bg AS (SELECT grp, sum(c)::BIGINT AS n,
        |    sum(c::HUGEINT * mid2) AS s2
        |  FROM g JOIN mid USING (cents) GROUP BY 1),
        |gl AS (SELECT sum(n)::HUGEINT AS nn,
        |    sum((s2 * s2) // (4 * n::HUGEINT)) AS t4 FROM bg),
        |ties AS (SELECT sum(m::HUGEINT * m * m - m) AS tsum FROM spine),
        |h0 AS (SELECT nn,
        |    greatest((3000 * t4) // (nn * (nn + 1)) - 3000 * (nn + 1), 0)
        |      AS h_milli,
        |    nn * nn * nn - nn AS nd,
        |    nn * nn * nn - nn - tsum AS corr_num
        |  FROM gl, ties),
        |h AS (SELECT h_milli,
        |    CASE WHEN corr_num > 0 THEN (h_milli * nd) // corr_num
        |         ELSE h_milli END AS h_adj
        |  FROM h0)
        |SELECT grp, n, s2::VARCHAR AS rank_sum2_str,
        |  ((s2 * 1000) // (2 * n))::BIGINT AS mean_rank_milli,
        |  h_milli::VARCHAR AS h_milli_str,
        |  h_adj::VARCHAR AS h_adj_milli_str,
        |  h_adj > 9488 AS significant
        |FROM bg, h""".stripMargin,

    // gap-fill as UNION-then-sum, not a LEFT JOIN: the grid CTE inlines
    // into the correlated recursion, where DuckDB rejects any outer join
    "q302_dtw_activity" -> graft.operators.Dtw.oracleSql(
      """SELECT k, i, sum(v)::BIGINT AS v FROM (
        |  SELECT event_type AS k,
        |    date_diff('day', DATE '2024-01-01', ts::DATE) AS i,
        |    count(*)::BIGINT AS v FROM events GROUP BY 1, 2
        |  UNION ALL
        |  SELECT t.event_type, dd.i, 0
        |  FROM (SELECT DISTINCT event_type FROM events) t,
        |       (SELECT unnest(range(0, 30)) AS i) dd
        |) z GROUP BY 1, 2""".stripMargin,
      n = 30, band = 7),

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

    "q192_cohort_ltv" ->
      """WITH cohort AS (SELECT user_id,
        |    min(date_trunc('week', ts)::DATE) AS cohort_wk FROM events GROUP BY 1),
        |weekly AS (SELECT user_id, date_trunc('week', ts)::DATE AS wk,
        |    sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |cells AS (SELECT cohort_wk,
        |    (datediff('day', cohort_wk, wk) // 7)::BIGINT AS age_weeks,
        |    count(DISTINCT user_id)::BIGINT AS n_buyers,
        |    sum(cents)::BIGINT AS revenue_cents
        |  FROM weekly JOIN cohort USING (user_id) GROUP BY 1, 2),
        |sizes AS (SELECT cohort_wk, count(*)::BIGINT AS cohort_size
        |          FROM cohort GROUP BY 1)
        |SELECT c.cohort_wk, age_weeks, cohort_size, n_buyers, revenue_cents,
        |  sum(revenue_cents) OVER (PARTITION BY c.cohort_wk ORDER BY age_weeks
        |    ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_revenue_cents
        |FROM cells c JOIN sizes USING (cohort_wk)""".stripMargin,

    "q193_stickiness" ->
      """WITH ud AS (SELECT DISTINCT user_id, ts::DATE AS day FROM events),
        |dau AS (SELECT day, count(*)::BIGINT AS dau FROM ud GROUP BY 1),
        |w AS (SELECT DISTINCT user_id, (day + x::INT)::DATE AS day
        |      FROM ud, unnest(range(0, 7)) AS u(x)),
        |wau AS (SELECT day, count(*)::BIGINT AS wau FROM w GROUP BY 1)
        |SELECT day, dau, wau, ((dau * 10000) // wau)::BIGINT AS stickiness_bp
        |FROM dau JOIN wau USING (day)""".stripMargin,

    "q191_lorenz_deciles" ->
      """WITH spend AS (SELECT user_id,
        |    sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS spend
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |c AS (SELECT spend,
        |    row_number() OVER (ORDER BY spend, user_id) AS rn,
        |    sum(spend) OVER (ORDER BY spend, user_id
        |                     ROWS UNBOUNDED PRECEDING) AS cum_cents
        |  FROM spend),
        |t AS (SELECT count(*)::BIGINT AS nu, sum(spend)::BIGINT AS tc FROM spend),
        |p AS (SELECT k AS decile, (k * nu) // 10 AS pos, nu, tc
        |      FROM (SELECT unnest(range(1, 11)) AS k), t)
        |SELECT decile::BIGINT AS decile,
        |  ((pos * 10000) // nu)::BIGINT AS user_share_bp,
        |  cum_cents::BIGINT AS cum_cents,
        |  ((cum_cents * 10000) // tc)::BIGINT AS revenue_share_bp
        |FROM c JOIN p ON rn = pos""".stripMargin,

    "q189_ab_bootstrap" -> {
      val hab = TextHash.md5LongSql("'ab:' || user_id::VARCHAR")
      val hpb = TextHash.md5LongSql("'pb2:' || b::VARCHAR || ':' || user_id::VARCHAR")
      s"""WITH pu AS (SELECT user_id,
         |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
         |      AS conv
         |  FROM events GROUP BY 1),
         |v AS (SELECT user_id, (($hab % 2) = 0) AS va, conv FROM pu),
         |e AS (SELECT user_id, va, conv, unnest(range(0, 32)) AS b FROM v),
         |u0 AS (SELECT b, va, conv, ($hpb % 1000000) AS u FROM e),
         |w AS (SELECT b, va, conv, ($poissonCaseSql) AS w FROM u0),
         |g AS (SELECT b::BIGINT AS b,
         |        sum(CASE WHEN va THEN w ELSE 0 END)::BIGINT AS n_a_eff,
         |        sum(CASE WHEN va THEN w * conv ELSE 0 END)::BIGINT AS c_a_eff,
         |        sum(CASE WHEN NOT va THEN w ELSE 0 END)::BIGINT AS n_b_eff,
         |        sum(CASE WHEN NOT va THEN w * conv ELSE 0 END)::BIGINT AS c_b_eff
         |      FROM w GROUP BY 1),
         |r AS (SELECT b, n_a_eff, c_a_eff, n_b_eff, c_b_eff,
         |        (CASE WHEN n_a_eff > 0
         |              THEN (c_a_eff * 10000) // n_a_eff END)::BIGINT AS rate_a_bp,
         |        (CASE WHEN n_b_eff > 0
         |              THEN (c_b_eff * 10000) // n_b_eff END)::BIGINT AS rate_b_bp
         |      FROM g)
         |SELECT b, n_a_eff, c_a_eff, n_b_eff, c_b_eff, rate_a_bp, rate_b_bp,
         |  (rate_a_bp - rate_b_bp)::BIGINT AS diff_bp
         |FROM r""".stripMargin
    },

    "q190_frequent_triples" ->
      """WITH b AS (SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS br
        |      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |nb AS (SELECT count(DISTINCT ok) AS nb FROM b),
        |t AS (SELECT x.br AS b1, y.br AS b2, z.br AS b3, count(*) AS n
        |      FROM b x JOIN b y ON x.ok = y.ok AND x.br < y.br
        |               JOIN b z ON x.ok = z.ok AND y.br < z.br
        |      GROUP BY 1, 2, 3),
        |r AS (SELECT *, row_number() OVER (ORDER BY n DESC, b1, b2, b3) AS rank
        |      FROM t)
        |SELECT rank::INT AS rank, b1, b2, b3, n::BIGINT AS n,
        |  ((n * 10000) // nb)::BIGINT AS support_bp
        |FROM r, nb WHERE rank <= 20""".stripMargin,

    "q187_scd2_join" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        |  FROM events WHERE event_type <> 'purchase'),
        |g AS (SELECT user_id, event_id, event_type, us,
        |    CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
        |         THEN 1 ELSE 0 END AS chg
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |v AS (SELECT user_id, event_type, us,
        |    sum(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                   ROWS UNBOUNDED PRECEDING) AS ver
        |  FROM g),
        |h AS (SELECT user_id, ver, event_type AS state, min(us) AS vf
        |      FROM v GROUP BY 1, 2, 3),
        |h2 AS (SELECT user_id, ver, state, vf,
        |        lead(vf) OVER (PARTITION BY user_id ORDER BY ver) AS vt
        |      FROM h),
        |p AS (SELECT user_id, epoch_us(ts) AS pus,
        |        CAST(round(value * 100) AS BIGINT) AS cents
        |      FROM events WHERE event_type = 'purchase'),
        |j AS (SELECT state, user_id, ver, cents FROM p JOIN h2 USING (user_id)
        |      WHERE pus >= vf AND (vt IS NULL OR pus < vt))
        |SELECT state, count(*)::BIGINT AS n_purchases,
        |  sum(cents)::BIGINT AS sum_cents,
        |  count(DISTINCT user_id::VARCHAR || ':' || ver::VARCHAR)::BIGINT
        |    AS n_versions
        |FROM j GROUP BY 1""".stripMargin,

    "q188_pair_distance_hist" -> {
      val h = TextHash.md5LongSql("'pd:' || vec_id::VARCHAR")
      s"""WITH v AS (SELECT vec_id,
         |    list_transform(embedding,
         |      x -> CAST(round(x::DOUBLE * 1000000) AS BIGINT)) AS mv,
         |    ($h % 32) AS bkt
         |  FROM embeddings),
         |p AS (SELECT a.mv AS ma, b.mv AS mb FROM v a JOIN v b
         |      ON a.bkt = b.bkt AND a.vec_id < b.vec_id),
         |dd AS (SELECT list_sum(list_transform(range(1, len(ma) + 1),
         |         i -> (ma[i] - mb[i]) * (ma[i] - mb[i])))::BIGINT AS d2
         |       FROM p)
         |SELECT length(bin(d2))::INT AS bucket_log2, count(*)::BIGINT AS n_pairs,
         |  min(d2)::BIGINT AS min_d2, max(d2)::BIGINT AS max_d2
         |FROM dd GROUP BY 1""".stripMargin
    },

    "q185_u_attribution" ->
      """WITH p AS (SELECT user_id, epoch_us(ts) AS tp, event_id AS pid
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, epoch_us(ts) AS tc, event_id AS cid,
        |        date_trunc('week', ts)::DATE AS wk
        |      FROM events WHERE event_type = 'click'),
        |t AS (SELECT pid, wk, tc, cid FROM p JOIN c USING (user_id)
        |      WHERE tc < tp),
        |x AS (SELECT wk, count(*) OVER (PARTITION BY pid) AS m,
        |        row_number() OVER (PARTITION BY pid ORDER BY tc, cid) AS pos
        |      FROM t),
        |y AS (SELECT wk,
        |        CASE WHEN m = 1 THEN 10000
        |             WHEN m = 2 THEN 5000
        |             WHEN pos = 1 OR pos = m THEN 4000
        |             ELSE 2000 // (m - 2)
        |                  + (CASE WHEN pos - 1 <= 2000 % (m - 2)
        |                          THEN 1 ELSE 0 END)
        |        END AS credit_bp
        |      FROM x)
        |SELECT wk, count(*)::BIGINT AS n_touches,
        |  sum(credit_bp)::BIGINT AS credit_bp_total
        |FROM y GROUP BY wk""".stripMargin,

    "q186_skyline" ->
      """WITH p AS (SELECT DISTINCT CAST(round(o_totalprice * 100) AS BIGINT)
        |    AS cents, o_orderdate::DATE AS od FROM orders),
        |o AS (SELECT cents, od,
        |    min(od) OVER (ORDER BY cents, od
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS m_prev
        |  FROM p)
        |SELECT cents, od FROM o WHERE m_prev IS NULL OR od < m_prev""".stripMargin,

    "q182_set_cover" -> {
      val toks = TextHash.wordShinglesSql("text", 3)
      s"""WITH f AS (SELECT source, unnest($toks) AS t FROM documents),
         |counts AS (SELECT t, count(*) AS cnt FROM f GROUP BY 1),
         |u AS (SELECT t FROM (SELECT t,
         |        row_number() OVER (ORDER BY cnt ASC, ${TextHash.md5LongSql("t")} ASC)
         |          AS rn FROM counts)
         |      WHERE rn <= 200),
         |ts AS MATERIALIZED (SELECT DISTINCT source, t FROM f JOIN u USING (t)),
         |t1 AS (SELECT source, count(*) AS n FROM ts GROUP BY 1
         |       ORDER BY n DESC, source LIMIT 1),
         |c1 AS MATERIALIZED (SELECT t FROM ts
         |       WHERE source = (SELECT source FROM t1)),
         |t2 AS (SELECT source, count(*) AS n FROM ts
         |       WHERE t NOT IN (SELECT t FROM c1) GROUP BY 1
         |       ORDER BY n DESC, source LIMIT 1),
         |c2 AS MATERIALIZED (SELECT t FROM c1 UNION SELECT t FROM ts
         |       WHERE source = (SELECT source FROM t2)),
         |t3 AS (SELECT source, count(*) AS n FROM ts
         |       WHERE t NOT IN (SELECT t FROM c2) GROUP BY 1
         |       ORDER BY n DESC, source LIMIT 1),
         |c3 AS MATERIALIZED (SELECT t FROM c2 UNION SELECT t FROM ts
         |       WHERE source = (SELECT source FROM t3))
         |SELECT 1 AS rank, source, n::BIGINT AS n_new,
         |  (SELECT count(*) FROM c1)::BIGINT AS n_cum FROM t1
         |UNION ALL SELECT 2, source, n::BIGINT,
         |  (SELECT count(*) FROM c2)::BIGINT FROM t2
         |UNION ALL SELECT 3, source, n::BIGINT,
         |  (SELECT count(*) FROM c3)::BIGINT FROM t3""".stripMargin
    },

    "q183_bounce_rate" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        |  FROM events),
        |g AS (SELECT user_id, event_id, event_type, us,
        |    CASE WHEN lag(us) OVER w IS NULL
        |           OR us - lag(us) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (SELECT user_id, event_id, event_type, us,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM g),
        |sess AS (SELECT user_id, sid, count(*)::BIGINT AS n_events
        |         FROM s GROUP BY 1, 2),
        |fe AS (SELECT user_id, sid, event_type AS entry_type FROM (
        |         SELECT user_id, sid, event_type,
        |           row_number() OVER (PARTITION BY user_id, sid
        |                              ORDER BY us, event_id) AS rn
        |         FROM s) WHERE rn = 1),
        |p AS (SELECT entry_type, count(*)::BIGINT AS n_sessions,
        |        sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)::BIGINT AS n_bounces
        |      FROM sess JOIN fe USING (user_id, sid) GROUP BY 1)
        |SELECT entry_type, n_sessions, n_bounces,
        |  ((n_bounces * 10000) // n_sessions)::BIGINT AS bounce_bp
        |FROM p""".stripMargin,

    "q184_whale_share" ->
      """WITH spend AS (SELECT user_id,
        |    sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS spend
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |c AS (SELECT spend, count(*) OVER (ORDER BY spend) AS cum,
        |        count(*) OVER () AS n FROM spend),
        |thr AS (SELECT min(spend) AS thr FROM c WHERE cum >= (99 * n + 99) // 100),
        |a AS (SELECT count(*)::BIGINT AS n_users, sum(spend)::BIGINT AS total_cents,
        |        max(thr)::BIGINT AS p99_spend_cents,
        |        sum(CASE WHEN spend >= thr THEN 1 ELSE 0 END)::BIGINT AS n_whales,
        |        sum(CASE WHEN spend >= thr THEN spend ELSE 0 END)::BIGINT
        |          AS whale_cents
        |      FROM spend, thr)
        |SELECT n_users, total_cents, p99_spend_cents, n_whales, whale_cents,
        |  ((whale_cents * 10000) // total_cents)::BIGINT AS share_bp
        |FROM a""".stripMargin,

    "q179_ab_test" -> {
      val h = TextHash.md5LongSql("'ab:' || user_id::VARCHAR")
      s"""WITH pu AS (SELECT user_id,
         |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
         |      AS conv
         |  FROM events GROUP BY 1),
         |v AS (SELECT CASE WHEN ($h % 2) = 0 THEN 'A' ELSE 'B' END AS variant,
         |        conv FROM pu),
         |a AS (SELECT count(*)::BIGINT AS n, sum(conv)::BIGINT AS c
         |      FROM v WHERE variant = 'A'),
         |b AS (SELECT count(*)::BIGINT AS n, sum(conv)::BIGINT AS c
         |      FROM v WHERE variant = 'B'),
         |z AS (SELECT a.n AS n_a, a.c AS c_a, b.n AS n_b, b.c AS c_b,
         |        ((a.n + b.n)::HUGEINT
         |          * (a.c * b.n - b.c * a.n)::HUGEINT
         |          * (a.c * b.n - b.c * a.n)::HUGEINT) AS lhs,
         |        (4::HUGEINT * (a.c + b.c)::HUGEINT
         |          * (a.n + b.n - a.c - b.c)::HUGEINT
         |          * a.n::HUGEINT * b.n::HUGEINT) AS rhs
         |      FROM a, b)
         |SELECT n_a, c_a, n_b, c_b,
         |  ((c_a * 10000) // n_a)::BIGINT AS rate_a_bp,
         |  ((c_b * 10000) // n_b)::BIGINT AS rate_b_bp,
         |  lhs::VARCHAR AS lhs_num, rhs::VARCHAR AS rhs_num,
         |  (lhs > rhs) AS significant
         |FROM z""".stripMargin
    },

    "q180_weekly_bands" ->
      """WITH e AS (SELECT date_trunc('week', ts)::DATE AS wk,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |c AS (SELECT wk, cents,
        |    count(*) OVER (PARTITION BY wk ORDER BY cents) AS cum,
        |    count(*) OVER (PARTITION BY wk) AS n
        |  FROM e)
        |SELECT wk, max(n)::BIGINT AS n_events,
        |  min(CASE WHEN cum >= (n + 9) // 10 THEN cents END)::BIGINT AS p10_cents,
        |  min(CASE WHEN cum >= (n + 1) // 2 THEN cents END)::BIGINT AS p50_cents,
        |  min(CASE WHEN cum >= (9 * n + 9) // 10 THEN cents END)::BIGINT AS p90_cents
        |FROM c GROUP BY wk""".stripMargin,

    "q181_top_movers" ->
      """WITH weekly AS (SELECT event_type, date_trunc('week', ts)::DATE AS wk,
        |    count(*)::BIGINT AS n FROM events GROUP BY 1, 2),
        |d AS (SELECT event_type, wk, n,
        |    lag(n) OVER (PARTITION BY event_type ORDER BY wk) AS prev_n
        |  FROM weekly),
        |f AS (SELECT event_type, wk, prev_n, n, (n - prev_n)::BIGINT AS delta
        |      FROM d WHERE prev_n IS NOT NULL),
        |r AS (SELECT *, row_number() OVER
        |        (ORDER BY abs(delta) DESC, event_type, wk) AS rank FROM f)
        |SELECT rank::INT AS rank, event_type, wk, prev_n, n, delta
        |FROM r WHERE rank <= 10""".stripMargin,

    "q175_rendezvous" -> {
      val h = TextHash.md5LongSql("'rv:' || sh::VARCHAR || ':' || user_id::VARCHAR")
      s"""WITH k AS (SELECT DISTINCT user_id FROM events),
         |e AS (SELECT user_id, unnest(range(0, 9)) AS sh FROM k),
         |sc AS (SELECT user_id, sh, $h AS sc FROM e),
         |a8 AS (SELECT user_id, sh, sc,
         |        row_number() OVER (PARTITION BY user_id
         |                           ORDER BY sc DESC, sh DESC) AS rn
         |       FROM sc WHERE sh < 8),
         |pick AS (SELECT user_id, sh AS shard, sc AS msc FROM a8 WHERE rn = 1),
         |s8 AS (SELECT user_id, sc AS s8 FROM sc WHERE sh = 8),
         |g AS (SELECT shard::INT AS shard, count(*)::BIGINT AS n_keys,
         |        sum(CASE WHEN s8 > msc THEN 1 ELSE 0 END)::BIGINT AS n_moved
         |      FROM pick JOIN s8 USING (user_id) GROUP BY 1)
         |SELECT shard, n_keys, n_moved,
         |  ((n_moved * 10000) // n_keys)::BIGINT AS moved_bp
         |FROM g""".stripMargin
    },

    "q176_hdr_percentiles" ->
      """WITH ev AS (SELECT event_type, user_id, event_id, epoch_us(ts) AS us
        |  FROM events),
        |l AS (SELECT event_type,
        |        us - lag(us) OVER (PARTITION BY event_type, user_id
        |                           ORDER BY us, event_id) AS gap
        |      FROM ev),
        |h AS (SELECT event_type, length(bin(gap))::INT AS b, count(*)::BIGINT AS n
        |      FROM l WHERE gap IS NOT NULL GROUP BY 1, 2),
        |c AS (SELECT event_type, b, n,
        |        sum(n) OVER (PARTITION BY event_type ORDER BY b
        |                     ROWS UNBOUNDED PRECEDING) AS cum
        |      FROM h),
        |t AS (SELECT event_type, sum(n)::BIGINT AS nt FROM h GROUP BY 1),
        |x AS (SELECT c.event_type, p, nt, b, cum
        |      FROM c JOIN t USING (event_type), (SELECT unnest([50, 90, 99]) AS p)),
        |f AS (SELECT event_type, p, max(nt)::BIGINT AS n, min(b) AS bucket
        |      FROM x WHERE cum >= (p * nt + 99) // 100 GROUP BY 1, 2)
        |SELECT event_type, p::INT AS p, n, bucket,
        |  (CASE WHEN bucket = 1 THEN 0
        |        ELSE (1::BIGINT << (bucket - 1)) END)::BIGINT AS lb_us,
        |  ((1::BIGINT << bucket) - 1)::BIGINT AS ub_us
        |FROM f""".stripMargin,

    "q177_heaps_law" -> {
      val toks = TextHash.tokensSql("lower(text)")
      s"""WITH t0 AS (SELECT doc_id, unnest($toks) AS t FROM documents),
         |tf AS (SELECT doc_id, t FROM t0 WHERE t <> ''),
         |nt AS (SELECT doc_id, count(*)::BIGINT AS n_tok FROM tf GROUP BY 1),
         |fs AS (SELECT t, min(doc_id) AS doc_id FROM tf GROUP BY 1),
         |nn AS (SELECT doc_id, count(*)::BIGINT AS n_new FROM fs GROUP BY 1),
         |d AS (SELECT dd.doc_id, coalesce(n_tok, 0) AS n_tok,
         |        coalesce(n_new, 0) AS n_new
         |      FROM (SELECT doc_id FROM documents) dd
         |      LEFT JOIN nt USING (doc_id) LEFT JOIN nn USING (doc_id)),
         |c AS (SELECT doc_id,
         |        sum(n_tok) OVER w AS cum_tokens, sum(n_new) OVER w AS cum_types,
         |        row_number() OVER (ORDER BY doc_id) AS rn,
         |        count(*) OVER () AS nd
         |      FROM d WINDOW w AS (ORDER BY doc_id ROWS UNBOUNDED PRECEDING))
         |SELECT k::BIGINT AS decile, c.doc_id,
         |  cum_tokens::BIGINT AS cum_tokens, cum_types::BIGINT AS cum_types
         |FROM c JOIN (SELECT k, (k * nd) // 10 AS pos
         |             FROM (SELECT unnest(range(1, 11)) AS k),
         |                  (SELECT max(nd) AS nd FROM c)) p
         |  ON rn = pos""".stripMargin
    },

    "q172_theil_sen" ->
      """WITH daily AS (SELECT ts::DATE AS day,
        |    sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS cents
        |  FROM events GROUP BY 1),
        |di AS (SELECT datediff('day', DATE '1970-01-01', day)::BIGINT AS di,
        |         cents FROM daily),
        |p AS (SELECT a.di AS d1, b.di AS d2,
        |        (b.cents - a.cents)::BIGINT AS num, (b.di - a.di)::BIGINT AS den
        |      FROM di a JOIN di b ON a.di < b.di),
        |k AS (SELECT d1, d2, num, den, ((num * 1048576) // den) AS key FROM p),
        |r AS (SELECT *, row_number() OVER (ORDER BY key, num, den, d1, d2) AS rn,
        |        count(*) OVER () AS np FROM k)
        |SELECT np::BIGINT AS n_pairs, num::BIGINT AS med_num,
        |  den::BIGINT AS med_den,
        |  ((num * 1000) // den)::BIGINT AS slope_millicents_per_day
        |FROM r WHERE rn = (np + 1) // 2""".stripMargin,

    "q173_poisson_bootstrap" -> {
      val h = TextHash.md5LongSql("'pb:' || b::VARCHAR || ':' || o_orderkey::VARCHAR")
      s"""WITH o AS (SELECT o_orderkey,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
         |e AS (SELECT o_orderkey, cents, unnest(range(0, 32)) AS b FROM o),
         |u0 AS (SELECT b, cents, ($h % 1000000) AS u FROM e),
         |w AS (SELECT b, cents, ($poissonCaseSql) AS w FROM u0),
         |g AS (SELECT b::BIGINT AS b, sum(w)::BIGINT AS n_eff,
         |        sum(w * cents)::BIGINT AS sum_cents FROM w GROUP BY 1)
         |SELECT b, n_eff, sum_cents,
         |  ((sum_cents * 100) // n_eff)::BIGINT AS mean_centicents
         |FROM g""".stripMargin
    },

    "q174_linear_impute" ->
      """WITH daily AS (SELECT user_id, ts::DATE AS day,
        |        sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS cents
        |      FROM events GROUP BY 1, 2),
        |b AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
        |spine AS (SELECT user_id,
        |        unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day FROM b),
        |j AS (SELECT s.user_id, s.day,
        |        datediff('day', DATE '1970-01-01', s.day)::BIGINT AS di, d.cents
        |      FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day),
        |f AS (SELECT user_id, day, cents,
        |    last_value(cents IGNORE NULLS) OVER wb AS pv,
        |    last_value(CASE WHEN cents IS NOT NULL THEN di END IGNORE NULLS)
        |      OVER wb AS pd,
        |    first_value(cents IGNORE NULLS) OVER wf AS nv,
        |    first_value(CASE WHEN cents IS NOT NULL THEN di END IGNORE NULLS)
        |      OVER wf AS nd,
        |    di
        |  FROM j WINDOW
        |    wb AS (PARTITION BY user_id ORDER BY day
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wf AS (PARTITION BY user_id ORDER BY day
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, day, cents,
        |  (CASE WHEN cents IS NOT NULL THEN cents
        |        ELSE pv + ((nv - pv) * (di - pd)) // (nd - pd) END)::BIGINT
        |    AS imputed_cents,
        |  (cents IS NULL) AS is_gap
        |FROM f""".stripMargin,

    "q168_gini_stump" ->
      """WITH f AS (SELECT label,
        |    CAST(round(embedding[1]::DOUBLE * 1000000) AS BIGINT) AS micro
        |  FROM embeddings),
        |mm AS (SELECT min(micro) AS mn, max(micro) AS mx FROM f),
        |b AS (SELECT label, (micro - mn) // ((mx - mn) // 64 + 1) AS bin
        |      FROM f, mm),
        |per AS (SELECT bin, label, count(*)::BIGINT AS n FROM b GROUP BY 1, 2),
        |tot AS (SELECT label, sum(n)::BIGINT AS nt FROM per GROUP BY 1),
        |grand AS (SELECT sum(n)::BIGINT AS nn FROM per),
        |bounds AS (SELECT DISTINCT bin AS bnd FROM per
        |           WHERE bin < (SELECT max(bin) FROM per)),
        |l AS (SELECT bnd, label, sum(n)::BIGINT AS nl
        |      FROM bounds JOIN per ON per.bin <= bnd GROUP BY 1, 2),
        |cells AS (SELECT bounds.bnd, tot.label, nt, coalesce(nl, 0) AS nl
        |          FROM bounds CROSS JOIN tot
        |          LEFT JOIN l ON l.bnd = bounds.bnd AND l.label = tot.label),
        |a AS (SELECT bnd, sum(nl)::BIGINT AS n_left,
        |        sum(nl * nl)::BIGINT AS sl2,
        |        sum((nt - nl) * (nt - nl))::BIGINT AS sr2
        |      FROM cells GROUP BY 1)
        |SELECT bnd AS boundary_bin, n_left, (nn - n_left)::BIGINT AS n_right,
        |  (sl2 * (nn - n_left) + sr2 * n_left)::BIGINT AS score_num,
        |  (n_left * (nn - n_left))::BIGINT AS score_den
        |FROM a, grand""".stripMargin,

    "q169_event_trigrams" ->
      """WITH o AS (SELECT user_id, event_type AS t1,
        |    lead(event_type, 1) OVER w AS t2,
        |    lead(event_type, 2) OVER w AS t3
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT t1, t2, t3, count(*)::BIGINT AS n
        |FROM o WHERE t3 IS NOT NULL GROUP BY 1, 2, 3""".stripMargin,

    "q170_winsorized_mean" ->
      """WITH o AS (SELECT o_orderpriority AS priority,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        |c AS (SELECT priority, cents,
        |    count(*) OVER (PARTITION BY priority ORDER BY cents) AS cum,
        |    count(*) OVER (PARTITION BY priority) AS n
        |  FROM o),
        |q AS (SELECT priority,
        |    min(CASE WHEN cum >= (n + 19) // 20 THEN cents END)::BIGINT AS q05,
        |    min(CASE WHEN cum >= (19 * n + 19) // 20 THEN cents END)::BIGINT AS q95
        |  FROM c GROUP BY priority),
        |w AS (SELECT o.priority, count(*)::BIGINT AS n,
        |    max(q05)::BIGINT AS q05_cents, max(q95)::BIGINT AS q95_cents,
        |    sum(greatest(q05, least(q95, cents)))::BIGINT AS wsum_cents
        |  FROM o JOIN q USING (priority) GROUP BY o.priority)
        |SELECT priority, n, q05_cents, q95_cents, wsum_cents,
        |  ((wsum_cents * 100) // n)::BIGINT AS wmean_centicents
        |FROM w""".stripMargin,

    "q171_loo_oov" -> {
      val toks = TextHash.tokensSql("lower(text)")
      s"""WITH tok AS (SELECT source, unnest($toks) AS t FROM documents),
         |f AS (SELECT source, t FROM tok WHERE t <> ''),
         |pts AS (SELECT t, source, count(*)::BIGINT AS n FROM f GROUP BY 1, 2),
         |span AS (SELECT t, count(DISTINCT source)::BIGINT AS nsrc
         |         FROM pts GROUP BY 1)
         |SELECT source, sum(n)::BIGINT AS n_tokens,
         |  sum(CASE WHEN nsrc = 1 THEN n ELSE 0 END)::BIGINT AS n_oov,
         |  count(DISTINCT CASE WHEN nsrc = 1 THEN t END)::BIGINT AS n_oov_types,
         |  ((sum(CASE WHEN nsrc = 1 THEN n ELSE 0 END) * 10000)
         |    // sum(n))::BIGINT AS oov_bp
         |FROM pts JOIN span USING (t) GROUP BY source""".stripMargin
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

    "q220_ewma_smoothing" -> {
      val num = (0 to 7).map(k =>
        s"coalesce(lag(cents, $k) OVER w, 0) * ${1L << (7 - k)}").mkString(" + ")
      val den = (0 to 7).map(k =>
        s"(CASE WHEN lag(cents, $k) OVER w IS NOT NULL THEN ${1L << (7 - k)} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH daily AS (SELECT event_type, ts::DATE AS day,
         |    sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS cents
         |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
         |sm AS (SELECT event_type, day, cents,
         |    ($num)::BIGINT AS num, ($den)::BIGINT AS den
         |  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day))
         |SELECT event_type, day, cents,
         |  ((num * 100) // den)::BIGINT AS ewma_cents_x100
         |FROM sm""".stripMargin
    },

    "q221_changepoint" ->
      """WITH daily AS (SELECT ts::DATE AS day,
        |    sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS x
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |tot AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS s FROM daily),
        |pre AS (SELECT day,
        |    sum(x) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)::BIGINT AS sl,
        |    row_number() OVER (ORDER BY day)::BIGINT AS nl
        |  FROM daily),
        |sc AS (SELECT day, nl, n - nl AS nr,
        |    ((nr::HUGEINT * sl - nl::HUGEINT * (s - sl))
        |      // (nl::HUGEINT * (n - nl)))::BIGINT AS m
        |  FROM pre, tot WHERE nl < n)
        |SELECT day AS split_day, nl AS n_before, nr AS n_after,
        |  m AS mean_shift_cents
        |FROM sc ORDER BY m::HUGEINT * m DESC, day LIMIT 1""".stripMargin,
  )
}
