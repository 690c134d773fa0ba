package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{TextHash, TopKAggregate, VectorExpressions}

/** Data-quality / sketch audit surface added in round 6 (third session):
  *
  *  - q143: KMV (bottom-k) distinct sketch — the MERGEABLE distinct
  *    estimator family member next to HLL (q32, tolerance-gated) and the
  *    exact bitmap (q103). Unlike HLL, the KMV estimate here is INTEGER
  *    arithmetic on md5 order statistics, so the ESTIMATE ITSELF is
  *    hash-checked against a lockstep DuckDB replay — no tolerance gate.
  *  - q144: sorted-neighborhood (SNM) dedup blocking — the classic third
  *    blocking family beside LSH banding (q12/q13) and AllPairs prefix
  *    filtering (q98): sort by a normalized key, compare each record only
  *    with its w-1 successors.
  *  - q145: Benford leading-digit audit — fraud/data-quality screen over
  *    monetary amounts, exact integer counts and basis-point shares.
  */
object AuditQueries {

  /** KMV hash space: 2^53. Keeping hashes under 2^53 buys two exactness
    * properties at once: (k-1)*M = 127*2^53 stays inside int64 for the
    * estimator numerator, and every hash is exactly representable as a
    * Double, so using -h as the TopKByScore score loses nothing. */
  private val KmvM = TextHash.KmvM
  private val KmvK = 128
  private val KmvNum = (KmvK - 1).toLong * KmvM // 127 * 2^53, < 2^63

  /** q246 HLL constants — hoisted to [[graft.functions.HllAggregate]]
    * (the aggregate form shares them); referenced here so the query and
    * oracle builders keep one source. */
  private val HllNum = graft.functions.HllAggregate.HllNum
  private val HllLcLut: Array[Long] = graft.functions.HllAggregate.HllLcLut

  /** The q246/q261 HLL register pipeline pieces, shared so the two can
    * never drift: (group, bucket) → max-rho registers from a DISTINCT
    * (group, key) relation; per-group harmonic-sum fold; estimate with
    * the linear-counting branch. */
  private def hllRegs(dist: DataFrame, keyCol: String, grpCols: Seq[String]): DataFrame =
    dist
      .withColumn("h", TextHash.md5Long(concat(lit("hll:"), col(keyCol).cast("string"))))
      .withColumn("bucket", col("h") % 64)
      .withColumn("stream", expr("(h div 64) % 4294967296"))
      .withColumn("rho", when(col("stream") === 0, lit(33L))
        .otherwise(lit(33L) - length(bin(col("stream")))))
      .groupBy((grpCols :+ "bucket").map(col): _*).agg(max(col("rho")).as("m"))

  private def hllFold(regs: DataFrame, grpCols: Seq[String]): DataFrame =
    regs.groupBy(grpCols.map(col): _*).agg(
      (sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(33 - m AS INT))"))
        + (lit(64L) - count(lit(1))) * lit(8589934592L)).as("sum_scaled"),
      (lit(64L) - count(lit(1))).as("v_zero"))

  private def hllEst(folded: DataFrame): DataFrame = folded
    .withColumn("raw", expr(s"$HllNum div sum_scaled"))
    .withColumn("est_hll",
      when(col("v_zero") > 0 && col("raw") <= 160,
        element_at(lit(HllLcLut), col("v_zero").cast("int")))
        .otherwise(col("raw")))
    .drop("raw")

  private def kmvHash(userId: Column): Column = TextHash.kmvHash(userId)

  private def kmvHashSql(e: String): String = TextHash.kmvHashSql(e)

  /** Benford expected leading-digit shares in basis points:
    * floor(log10(1+1/d)*10^4 + 0.5). Constants, not runtime float log. */
  private val benfordCaseSql =
    "CASE digit WHEN 1 THEN 3010 WHEN 2 THEN 1761 WHEN 3 THEN 1249 " +
      "WHEN 4 THEN 969 WHEN 5 THEN 792 WHEN 6 THEN 669 WHEN 7 THEN 580 " +
      "WHEN 8 THEN 512 ELSE 458 END"

  /** The SNM candidate stage shared by q144 (dedup report) and q153
    * (blocking evaluation): window w=4 over (block, sort-key) order,
    * exact intersections via the codegen'd sorted-merge kernel. Returns
    * ALL (w−1)·n windowed pairs as (id_a, id_b, inter, uni); id_a is the
    * rank-earlier doc, not necessarily the smaller id. */
  private def snmCandidates(s: SparkSession, d: String): DataFrame = {
    val norm = regexp_replace(lower(col("text")), "\\s+", " ")
    val docs = Tables.documents(s, d).select(
      col("doc_id"),
      substring(norm, 1, 40).as("sk"),
      sort_array(VectorExpressions
        .wordShingleHashes(col("text"), 3, TextHash.P)).as("hs"))
      .withColumn("block", substring(col("sk"), 1, 6))
    val w = Window.partitionBy(col("block")).orderBy(col("sk"), col("doc_id"))
    val withLeads = docs.select(col("doc_id"), col("hs"),
      array((1 to 3).map(o => struct(
        lead(col("doc_id"), o).over(w).as("id_b"),
        lead(col("hs"), o).over(w).as("hs_b"))): _*).as("cands"))
    val pairs = withLeads
      .select(col("doc_id").as("id_a"), col("hs").as("hs_a"),
        explode(col("cands")).as("c"))
      .filter(col("c.id_b").isNotNull)
      .select(col("id_a"), col("c.id_b").as("id_b"),
        col("hs_a"), col("c.hs_b").as("hs_b"))
    val inter = VectorExpressions.sortedIntersectCount(col("hs_a"), col("hs_b"))
    pairs.select(col("id_a"), col("id_b"), inter.as("inter"),
      (size(col("hs_a")).cast("long") + size(col("hs_b")).cast("long")
        - inter).as("uni"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Rolling-origin forecast backtest — q269's MASE generalized to a
    // cutoff GRID (the honest way to evaluate a forecaster: one split is
    // an anecdote, the grid is a distribution): per cutoff, a 3-day
    // horizon scored with seasonal-naive (d−7) against the last-value
    // naive anchored at the cutoff. Horizon < season, so every seasonal
    // lookup lands before the cutoff — no leakage by construction. The
    // daily series is one hash agg (integer cents); each cutoff's scoring
    // touches ≤ horizon rows, so the grid costs joins over a ≤31-row
    // relation regardless of event volume.
    "q288_backtest_grid" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .filter(col("event_type") === "purchase" && col("value").isNotNull)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
        .persist() // eval window + seasonal lookup + anchor, per cutoff
      Seq("2024-01-16", "2024-01-20", "2024-01-24").map { cs =>
        val cutDate = lit(cs).cast("date")
        val evalW = daily.filter(col("day") > cutDate &&
          col("day") <= date_add(cutDate, 3))
        val seasonal = daily.select(date_add(col("day"), 7).as("day"),
          col("cents").as("s_cents"))
        val anchor = daily.filter(col("day") === cutDate)
          .select(col("cents").as("a_cents"))
        evalW.join(seasonal, Seq("day"))
          .crossJoin(broadcast(anchor))
          .agg(count(lit(1)).as("n_days"),
            sum(abs(col("cents") - col("s_cents"))).as("ae_seasonal"),
            sum(abs(col("cents") - col("a_cents"))).as("ae_naive"))
          .select(cutDate.as("cutoff"), col("n_days"),
            expr("ae_seasonal div n_days").as("mae_seasonal_cents"),
            expr("ae_naive div n_days").as("mae_naive_cents"),
            expr("if(ae_naive > 0, ae_seasonal * 10000 div ae_naive, 0L)")
              .as("mase_bp"))
          // an empty cutoff window (no anchor day / sparse series) must
          // emit NO row: the ungrouped agg always returns one, while the
          // oracle's GROUP BY returns none — the q263 den=0 gating rule
          .filter(col("n_days") > 0)
      }.reduce(_ unionAll _)
    }),

    // Off-policy evaluation (IPS / SNIPS) — the counterfactual "what
    // would the new policy have earned on the logged traffic" estimate,
    // with NO float surface: the logged (behavior) action is the md5 coin
    // over event ids (known propensity exactly 1/2, so the importance
    // weight is the integer 2), the target policy is a deterministic
    // user rule, rewards are integer cents. IPS = 2·Σ matched cents / n;
    // SNIPS normalizes by the realized weight mass (= matched count —
    // the constant-propensity simplification), which here IS the matched
    // mean; the direct-method baseline is the overall mean. All three in
    // exact integer micro-cents (÷ via div), one scan + one agg.
    "q287_policy_eval" -> ((s, d) => {
      Tables.events(s, d)
        .filter(col("event_type") === "purchase" && col("value").isNotNull)
        .select(round(col("value") * 100).cast("long").as("cents"),
          (pmod(TextHash.md5Long(col("event_id").cast("string")), lit(2L)))
            .as("logged_action"),
          (pmod(col("user_id"), lit(2L))).as("target_action"))
        .agg(count(lit(1)).as("n"),
          sum((col("logged_action") === col("target_action")).cast("long"))
            .as("n_matched"),
          sum(when(col("logged_action") === col("target_action"), col("cents"))
            .otherwise(0L)).as("matched_cents"),
          sum(col("cents")).as("total_cents"))
        .select(col("n"), col("n_matched"),
          expr("2 * matched_cents * 10000 div n").as("ips_microcents"),
          expr("if(n_matched > 0, matched_cents * 10000 div n_matched, 0L)")
            .as("snips_microcents"),
          expr("total_cents * 10000 div n").as("dm_microcents"))
    }),

    // KMV distinct-user sketch per event type + the MERGED union sketch.
    // Shape at scale: one distinct shuffle on (type, user), then a
    // bounded TopKByScore per group — the shuffle after the sketch agg
    // carries k rows per group, never the user set. The 'ALL' row is built
    // by MERGING the per-type sketches (union of hash sets, re-bottom-k) —
    // the mergeability that makes KMV a sketch and not just a query — and
    // its estimate is checked against the exact global distinct count.
    // D̂ = (k-1)*M div h_(k); with fewer than k hashes the sketch is the
    // exact set, so D̂ = n. Integer throughout ⇒ the driver hash-compares
    // the ESTIMATES, not a tolerance.
    "q143_kmv_distinct" -> ((s, d) => {
      val dist = Tables.events(s, d)
        .select(col("event_type"), col("user_id")).distinct()
        .withColumn("h", kmvHash(col("user_id")))
      val perType = dist.groupBy(col("event_type").as("grp"))
        .agg(count(lit(1)).as("n_exact"),
          TopKAggregate.topK(-col("h").cast("double"), col("h"), KmvK).as("top"))
      def kth(top: Column): Column =
        when(size(top) >= KmvK, element_at(top, KmvK).getField("payload"))
      def est(nSketch: Column, kthMin: Column): Column =
        when(nSketch < KmvK, nSketch).otherwise(expr(s"$KmvNum div kth_min"))
      val typed = perType
        .withColumn("kth_min", kth(col("top")))
        .select(col("grp"), col("n_exact"), col("kth_min"),
          est(col("n_exact"), col("kth_min")).as("est_distinct"))
      // merge: union of per-type sketch hash SETS (same user ⇒ same hash
      // across types, deduped), then bottom-k again — ≤ types·k rows.
      val mergedHashes = perType
        .select(explode(col("top")).as("e"))
        .select(col("e").getField("payload").as("h")).distinct()
      val merged = mergedHashes.agg(count(lit(1)).as("n_sketch"),
        TopKAggregate.topK(-col("h").cast("double"), col("h"), KmvK).as("top"))
      val exactAll = dist.agg(countDistinct(col("user_id")).as("n_exact"))
      val allRow = exactAll.crossJoin(merged)
        .withColumn("kth_min", kth(col("top")))
        .select(lit("ALL").as("grp"), col("n_exact"), col("kth_min"),
          est(col("n_sketch"), col("kth_min")).as("est_distinct"))
      typed.unionByName(allRow)
    }),

    // HyperLogLog with PORTABLE registers. q32/q113 use Spark's internal
    // HLL++ and can only be tolerance-gated; this is the classic Flajolet
    // m=64 register / 32-bit stream formulation in exact integer math, so
    // the register state, the harmonic sum, the raw estimate AND the
    // linear-counting branch all hash-check against a lockstep DuckDB
    // replay — the sketch family's last member gets a zero-tolerance
    // oracle. bucket = h % 64; stream = next 32 bits of the md5;
    // rho = leading-zero rank = 33 − bitlength(stream) (33 for stream=0,
    // both engines agree bin() drops leading zeros — the q89 idiom);
    // register M_j = max rho per bucket. Harmonic sum in units of 2^-33:
    // S = Σ 2^(33−M_j), empty registers contribute 2^33 — S ≤ 64·2^32
    // fits int64 with room. raw = NUM div S, NUM = round(α_64·64²·2^33)
    // precomputed; linear counting 64·ln(64/V) is a 64-entry integer LUT
    // (constants, never runtime float log). The 'ALL' row merges per-type
    // sketches register-wise (max) — HLL's defining mergeability — and
    // exact distinct counts ride alongside so estimate quality is itself
    // inside the hash-checked output. Shape at scale: one distinct
    // shuffle, then ≤ types·64 register rows; the merge is free.
    "q246_hll_registers" -> ((s, d) => {
      val dist = Tables.events(s, d)
        .select(col("event_type").as("grp"), col("user_id")).distinct()
        .persist() // feeds the register agg and both exact-count aggs
      val regs = hllRegs(dist, "user_id", Seq("grp"))
        .persist() // consumed twice: per-type fold + register-wise merge
      val mergedRegs = regs.groupBy(col("bucket")).agg(max(col("m")).as("m"))
        .withColumn("grp", lit("ALL"))
      val folded = hllFold(regs, Seq("grp"))
        .unionByName(hllFold(mergedRegs, Seq("grp")))
      val nEx = dist.groupBy(col("grp")).agg(count(lit(1)).as("n_exact"))
        .unionByName(dist.agg(countDistinct(col("user_id")).as("n_exact"))
          .withColumn("grp", lit("ALL")))
      hllEst(folded.join(nEx, "grp"))
        .select(col("grp"), col("n_exact"), col("v_zero"), col("sum_scaled"),
          col("est_hll"))
    }),

    // HLL as a FIRST-CLASS AGGREGATE (`functions/HllAggregate.HllSketch`,
    // SQL name graft_hll): the q246 register pipeline compressed into one
    // TypedImperativeAggregate with a 64-BYTE buffer — the smallest
    // distinct-sketch state in the suite (KmvSketch holds k longs), and
    // because register merge is element-wise max it is legal as THE
    // stateful aggregation of a streaming window (spec-proven under
    // slicing). This query runs the aggregate path end to end; the
    // oracle is the same register replay as q246's typed rows, so the
    // hash match proves aggregate == expression pipeline. No upstream
    // distinct() — dedup is implicit in max.
    "q267_hll_agg" -> ((s, d) => {
      import graft.functions.HllAggregate
      Tables.events(s, d)
        .groupBy(col("event_type").as("grp"))
        .agg(countDistinct(col("user_id")).as("n_exact"),
          HllAggregate.hll(HllAggregate.hllHash(col("user_id"))).as("regs"))
        .withColumn("sum_scaled", HllAggregate.sumScaled(col("regs")))
        .withColumn("v_zero", HllAggregate.vZero(col("regs")))
        .select(col("grp"), col("n_exact"), col("v_zero"), col("sum_scaled"),
          HllAggregate.estimateExpr("sum_scaled", "v_zero").as("est_hll"))
    }),

    // INCREMENTAL sketch rollup — the q84 partial-rollup pattern applied
    // to HLL: DAILY register partials per event type (what a production
    // table would persist per partition) merged register-wise up the
    // day → week hierarchy. The oracle computes each weekly sketch
    // DIRECTLY from the raw rows, so the hash match IS the proof that
    // register-max merging is lossless/associative — a user active on
    // many days contributes identical (bucket, rho) everywhere and max
    // dedups it. Shape at scale: daily partials are types × 64 rows per
    // day; the weekly merge never touches raw data again (the whole
    // point of storing sketch partials instead of re-scanning).
    "q261_sketch_rollup" -> ((s, d) => {
      val dist = Tables.events(s, d)
        .select(col("event_type").as("grp"),
          weekofyear(col("ts")).cast("long").as("week"),
          to_date(col("ts")).as("day"), col("user_id"))
        .distinct()
        .persist() // daily registers + exact weekly counts
      val daily = hllRegs(dist, "user_id", Seq("grp", "week", "day"))
      val weekly = daily.groupBy(col("grp"), col("week"), col("bucket"))
        .agg(max(col("m")).as("m"))
      val nEx = dist.groupBy(col("grp"), col("week"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
      hllEst(hllFold(weekly, Seq("grp", "week")).join(nEx, Seq("grp", "week")))
        .select(col("grp"), col("week"), col("n_exact"), col("v_zero"),
          col("sum_scaled"), col("est_hll"))
    }),

    // ADJUSTED RAND INDEX — partition-agreement audit between two
    // labelings of the same corpus (here source vs lang; the same code
    // scores any clustering against ground truth, e.g. q52's dedup
    // clusters). ARI is EXACTLY RATIONAL in the contingency counts:
    // with I = ΣC(nij,2), A = ΣC(ai,2), B = ΣC(bj,2), T = C(n,2),
    //   ARI = (T·I − A·B) / (T·(A+B)/2 − A·B)
    // cleared of the half: num = 2(T·I − A·B), den = T·(A+B) − 2·A·B —
    // all integer, emitted as decimal strings (products pass int64) plus
    // the portable-rounded ratio. One tiny contingency agg (sources ×
    // langs cells); marginals derive from the CELL relation, never a
    // second corpus scan.
    "q255_ari_agreement" -> ((s, d) => {
      def dec(c: Column) = c.cast("decimal(38,0)")
      val ct = Tables.documents(s, d)
        .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("c"))
        .persist() // cells + both marginals + n
      def c2(name: String) = expr(s"($name * ($name - 1)) div 2")
      val i = ct.agg(sum(c2("c")).as("index_sum"),
        sum(col("c")).as("n"))
      val a = ct.groupBy(col("source")).agg(sum(col("c")).as("ai"))
        .agg(sum(c2("ai")).as("a_sum"))
      val b = ct.groupBy(col("lang")).agg(sum(col("c")).as("bj"))
        .agg(sum(c2("bj")).as("b_sum"))
      i.crossJoin(a).crossJoin(b)
        .withColumn("t", expr("(n * (n - 1)) div 2"))
        .withColumn("num",
          lit(2) * (dec(col("t")) * dec(col("index_sum"))
            - dec(col("a_sum")) * dec(col("b_sum"))))
        .withColumn("den",
          dec(col("t")) * (dec(col("a_sum")) + dec(col("b_sum")))
            - lit(2) * dec(col("a_sum")) * dec(col("b_sum")))
        .select(col("n"), col("index_sum"), col("a_sum"), col("b_sum"),
          col("num").cast("string").as("ari_num"),
          col("den").cast("string").as("ari_den"),
          when(col("den") === 0, lit(null))
            .otherwise(graft.functions.PortableMath.roundPortable(
              col("num").cast("double") / col("den").cast("double"), 6)).as("ari"))
    }),

    // EXACT Kolmogorov–Smirnov distance — per source, the sup-norm
    // distance between its n_chars distribution and the corpus-wide one
    // (the order-statistic drift audit next to q150's binned TVD). The
    // sup over step functions is attained at a jump point, so evaluating
    // on the spine of ALL distinct values is exact; cross-multiplied
    // integer cumulative counts (|cum_s·N − cum_g·n_s|) need no float
    // CDF, and the ppm result hash-checks. Scale shape: the only windows
    // run over the sources × distinct-VALUE spine — bounded by the value
    // DOMAIN (≤ ~534 lengths here), never by corpus row count.
    "q256_ks_drift" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("source"), col("n_chars").as("v"))
      val sc = docs.groupBy(col("source"), col("v")).agg(count(lit(1)).as("c_s"))
      val glob = docs.groupBy(col("v")).agg(count(lit(1)).as("c_g")).persist()
      val srcs = docs.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
      val spine = srcs.crossJoin(glob.select(col("v")))
      val w = Window.partitionBy(col("source")).orderBy(col("v"))
      val cum = spine
        .join(sc, Seq("source", "v"), "left")
        .join(glob, Seq("v"))
        .select(col("source"), col("n_s"), col("v"),
          coalesce(col("c_s"), lit(0L)).as("c_s"), col("c_g"))
        .select(col("source"), col("n_s"),
          sum(col("c_s")).over(w).as("cum_s"),
          sum(col("c_g")).over(w).as("cum_g"))
      val n = docs.agg(count(lit(1)).as("n_total"))
      cum.crossJoin(n)
        .groupBy(col("source"), col("n_s"), col("n_total"))
        .agg(max(abs(col("cum_s") * col("n_total") - col("cum_g") * col("n_s")))
          .as("ks_num"))
        .select(col("source"), col("n_s"), col("n_total"), col("ks_num"),
          expr("ks_num * 1000000 div (n_s * n_total)").as("ks_ppm"))
    }),

    // A/B TEST ANALYSIS — the two-proportion z-test in EXACT integers:
    // users split by md5 hash into arms, conversion = "ever made a
    // purchase over 150" (the all-users-purchase metric is degenerate in
    // this data: both pooled-variance factors vanish). The pooled z²
    // statistic is exactly rational,
    //   z² = (c1·n2 − c2·n1)²·(n1+n2) / (n1·n2·c·(N−c)),  c = c1+c2,
    // so significance at 95% is the cross-multiplication
    //   10000·num ≥ 38415·den   (z²_crit = 3.8415)
    // — a hypothesis test with NO float surface, hash-checked including
    // the verdict boolean. Numerators ride decimal(38,0) (the (c1·n2 −
    // c2·n1)² square crosses int64 at corpus scale). One distinct-user
    // agg + one tiny arm rollup.
    "q263_ab_test" -> ((s, d) => {
      def dec(c: Column) = c.cast("decimal(38,0)")
      val users = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(max((col("event_type") === "purchase" && col("value") > 150)
          .cast("long")).as("converted"))
        .withColumn("arm",
          when(pmod(TextHash.md5Long(concat(lit("ab:"), col("user_id").cast("string"))),
            lit(2L)) === 0, "control").otherwise("treatment"))
      val arms = users.groupBy(col("arm"))
        .agg(count(lit(1)).as("n"), sum(col("converted")).as("c"))
      val wide = arms.groupBy()
        .agg(sum(when(col("arm") === "control", col("n"))).as("n1"),
          sum(when(col("arm") === "control", col("c"))).as("c1"),
          sum(when(col("arm") === "treatment", col("n"))).as("n2"),
          sum(when(col("arm") === "treatment", col("c"))).as("c2"))
      wide
        .withColumn("num",
          dec(col("c1") * col("n2") - col("c2") * col("n1"))
            * dec(col("c1") * col("n2") - col("c2") * col("n1"))
            * dec(col("n1") + col("n2")))
        .withColumn("den",
          dec(col("n1")) * dec(col("n2")) * dec(col("c1") + col("c2"))
            * dec(col("n1") + col("n2") - col("c1") - col("c2")))
        .select(col("n1"), col("c1"), col("n2"), col("c2"),
          col("num").cast("string").as("z2_num"),
          col("den").cast("string").as("z2_den"),
          // den = 0 (all or none converted) forces num = 0 too; the bare
          // 0 >= 0 comparison would claim significance, so gate on den
          (col("den") > 0 && col("num") * 10000 >= col("den") * 38415)
            .as("significant_95"),
          when(col("c1") * col("n2") === 0, lit(null))
            .otherwise(expr("(c2 * n1 - c1 * n2) * 10000 div (c1 * n2)"))
            .as("lift_bp"),
          when(col("den") === 0, lit(null))
            .otherwise(graft.functions.PortableMath.roundPortable(
              col("num").cast("double") / col("den").cast("double"), 6)).as("z2"))
    }),

    // DETERMINISTIC POISSON BOOTSTRAP — the practical-inference workhorse
    // with ZERO float surface: each (replicate, user) draws a Poisson(1)
    // resample weight by comparing an md5 uniform against NINE
    // PRECOMPUTED CDF thresholds (round(CDF·2^53) literals — the LC-LUT
    // discipline: constants offline, integers at runtime), so every
    // replicate's weighted conversion diff is exact integer bp and the
    // percentile CI (order stats 2 and R−1 of R = 40 replicate diffs,
    // ≈ the 5%/95% interval) hash-checks verbatim. This is the
    // at-100-TB bootstrap shape: map-side weights + ONE aggregation per
    // pass — never R resampled copies of the data. The rank window runs
    // over ≤ R rows.
    "q271_bootstrap_ci" -> ((s, d) => {
      val R = 40
      val ts = Seq(3313563428353948L, 6627126856707896L, 8283908570884870L,
        8836169142277195L, 8974234285125276L, 9001847313694892L,
        9006449485123161L, 9007106938184342L, 9007189119816990L)
      val conv = Tables.events(s, d).groupBy(col("user_id"))
        .agg(max((col("event_type") === "purchase" && col("value") > 150)
          .cast("long")).as("conv"))
        .withColumn("arm",
          when(pmod(TextHash.md5Long(concat(lit("ab:"), col("user_id").cast("string"))),
            lit(2L)) === 0, 1L).otherwise(2L))
        .persist() // replicate fan-out + the full-sample point estimate
      val reps = conv
        .select(col("user_id"), col("conv"), col("arm"),
          explode(sequence(lit(0), lit(R - 1))).as("rep"))
        .withColumn("u", pmod(TextHash.md5Long(concat(lit("bs:"),
          col("rep").cast("string"), lit(":"), col("user_id").cast("string"))),
          lit(9007199254740992L)))
        .withColumn("w", ts.map(t => (col("u") >= t).cast("long")).reduce(_ + _))
      val arms = reps.groupBy(col("rep"))
        .agg(sum(when(col("arm") === 1, col("w")).otherwise(0L)).as("n1"),
          sum(when(col("arm") === 1, col("w") * col("conv")).otherwise(0L)).as("c1"),
          sum(when(col("arm") === 2, col("w")).otherwise(0L)).as("n2"),
          sum(when(col("arm") === 2, col("w") * col("conv")).otherwise(0L)).as("c2"))
      val diffs = arms.filter(col("n1") > 0 && col("n2") > 0)
        .select(expr("(c2 * n1 - c1 * n2) * 10000 div (n1 * n2)").as("diff_bp"))
        .persist() // rank window + count
      val ranked = diffs
        .withColumn("rn", row_number().over(Window.orderBy(col("diff_bp"))))
      val nReps = diffs.agg(count(lit(1)).as("n_reps"))
      val point = conv.groupBy().agg(
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("pn1"),
        sum(when(col("arm") === 1, col("conv")).otherwise(0L)).as("pc1"),
        sum(when(col("arm") === 2, 1L).otherwise(0L)).as("pn2"),
        sum(when(col("arm") === 2, col("conv")).otherwise(0L)).as("pc2"))
        .select(expr("(pc2 * pn1 - pc1 * pn2) * 10000 div (pn1 * pn2)")
          .as("point_bp"))
      ranked.crossJoin(nReps)
        .groupBy(col("n_reps"))
        .agg(sum(when(col("rn") === 2, col("diff_bp"))).as("ci_lo_bp"),
          sum(when(col("rn") === col("n_reps") - 1, col("diff_bp"))).as("ci_hi_bp"))
        .crossJoin(point)
        .select(col("n_reps"), col("point_bp"), col("ci_lo_bp"), col("ci_hi_bp"),
          (col("ci_lo_bp") <= 0 && col("ci_hi_bp") >= 0).as("covers_zero"))
    }),

    // THEIL–SEN robust trend — the median-of-pairwise-slopes estimator
    // (the robust dual of q134's OLS): over the daily revenue series,
    // slope_{ij} = (y_j − y_i)·10⁶ div (j − i) for all i < j day pairs —
    // integer scaling with identical truncation on both engines — and
    // the median emitted as the SUM of the two bracketing order
    // statistics (q94's ×2 idiom, no float division). The pair relation
    // is DOMAIN-bounded (≤ C(31,2) rows — days², never corpus rows), so
    // the unpartitioned rank window is audit-class-legal; the daily
    // rollup is the only corpus-scale stage.
    "q268_theil_sen" -> ((s, d) => {
      val daily = Tables.events(s, d).filter(col("value").isNotNull)
        .groupBy(datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
          .cast("long").as("i"))
        .agg(sum(round(col("value") * 100).cast("long")).as("y"))
        .persist() // both sides of the bounded pair join
      val slopes = daily.as("a").join(daily.as("b"), col("a.i") < col("b.i"))
        .select(expr("(b.y - a.y) * 1000000 div (b.i - a.i)").as("s"))
      val ranked = slopes
        .withColumn("rn", row_number().over(Window.orderBy(col("s"))))
      val n = slopes.agg(count(lit(1)).as("n_pairs"))
      ranked.crossJoin(n)
        .filter(col("rn") === expr("(n_pairs + 1) div 2") ||
          col("rn") === expr("n_pairs div 2 + 1"))
        .groupBy(col("n_pairs"))
        .agg(sum(when(col("rn") === expr("(n_pairs + 1) div 2"), col("s"))).as("lo"),
          sum(when(col("rn") === expr("n_pairs div 2 + 1"), col("s"))).as("hi"))
        // when n is odd both picks are the same row: lo = hi = the median
        .select(col("n_pairs"), (col("lo") + col("hi")).as("med2_slope_scaled"),
          graft.functions.PortableMath.roundPortable(
            (col("lo") + col("hi")).cast("double") / lit(2000000.0), 4)
            .as("slope_cents_per_day"))
    }),

    // SEASONAL-NAIVE FORECAST EVALUATION (MASE) — the baseline every
    // forecasting system is judged against: predict day d as day d−7,
    // score with MASE = MAE(seasonal naive) / MAE(one-step naive) over
    // the same eval days (the in-sample denominator variant; deviation
    // from Hyndman's training-set denominator is deliberate and
    // documented — one series, no split). Exact integer cents; the
    // ratio in bp via portable div. Per event type + pooled ALL. Only
    // windows run over ≤31-row daily relations.
    "q269_forecast_mase" -> ((s, d) => {
      val daily = Tables.events(s, d).filter(col("value").isNotNull)
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("y"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val lagged = daily
        .withColumn("y7", lag(col("y"), 7).over(w))
        .withColumn("y1", lag(col("y"), 1).over(w))
        .filter(col("y7").isNotNull && col("y1").isNotNull)
        .select(col("event_type"), abs(col("y") - col("y7")).as("e7"),
          abs(col("y") - col("y1")).as("e1"))
        .persist() // per-type + pooled rollups
      val perType = lagged.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_eval"), sum(col("e7")).as("sae_forecast"),
          sum(col("e1")).as("sae_naive"))
      val all = lagged
        .agg(count(lit(1)).as("n_eval"), sum(col("e7")).as("sae_forecast"),
          sum(col("e1")).as("sae_naive"))
        .withColumn("event_type", lit("ALL"))
      perType.unionByName(all)
        .withColumn("mase_bp",
          when(col("sae_naive") === 0, lit(null))
            .otherwise(expr("sae_forecast * 10000 div sae_naive")))
    }),

    // CUPED variance reduction — q263's experiment analysis upgraded with
    // the industry-standard pre-period covariate adjustment: per user,
    // x = pre-period spend (Jan 1–15) and y = post-period spend; the
    // pooled regression θ = (nΣxy − ΣxΣy)/(nΣxx − (Σx)²) is an exact
    // rational, and the adjusted arm difference
    //   Δ_adj = Δy − θ·Δx = (rawΔy·θd − θn·rawΔx) / (n1·n2·θd)
    // clears to ONE integer numerator/denominator pair — the whole
    // adjustment is hash-checked as decimal strings next to the
    // portable-rounded doubles (ρ² = achieved variance-reduction share).
    // Shape at scale: one conditional-sum user agg, then a global + two
    // arm rollups of six moments each. (decimal(38,0) holds the cleared
    // products to ~10⁶ users of 10⁶-cent spends; beyond that emit the
    // factors unsimplified.)
    "q265_cuped" -> ((s, d) => {
      def dec(c: Column) = c.cast("decimal(38,0)")
      val mid = lit("2024-01-16").cast("date")
      val users = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(sum(when(col("ts").cast("date") < mid,
            round(col("value") * 100).cast("long")).otherwise(0L)).as("x"),
          sum(when(col("ts").cast("date") >= mid,
            round(col("value") * 100).cast("long")).otherwise(0L)).as("y"))
        .withColumn("arm",
          when(pmod(TextHash.md5Long(concat(lit("ab:"), col("user_id").cast("string"))),
            lit(2L)) === 0, 1L).otherwise(2L))
        .persist() // pooled moments + per-arm rollups
      val pooled = users.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(dec(col("x")) * dec(col("x"))).as("sxx"),
        sum(dec(col("y")) * dec(col("y"))).as("syy"),
        sum(dec(col("x")) * dec(col("y"))).as("sxy"))
      val arms = users.groupBy(col("arm"))
        .agg(count(lit(1)).as("na"), sum(col("x")).as("sxa"), sum(col("y")).as("sya"))
      val wide = arms.groupBy().agg(
        sum(when(col("arm") === 1, col("na"))).as("n1"),
        sum(when(col("arm") === 1, col("sxa"))).as("sx1"),
        sum(when(col("arm") === 1, col("sya"))).as("sy1"),
        sum(when(col("arm") === 2, col("na"))).as("n2"),
        sum(when(col("arm") === 2, col("sxa"))).as("sx2"),
        sum(when(col("arm") === 2, col("sya"))).as("sy2"))
      pooled.crossJoin(wide)
        .withColumn("theta_n", dec(col("n")) * col("sxy") - dec(col("sx")) * dec(col("sy")))
        .withColumn("theta_d", dec(col("n")) * col("sxx") - dec(col("sx")) * dec(col("sx")))
        .withColumn("dy", dec(col("n")) * col("syy") - dec(col("sy")) * dec(col("sy")))
        .withColumn("raw_dy", dec(col("sy2")) * dec(col("n1")) - dec(col("sy1")) * dec(col("n2")))
        .withColumn("raw_dx", dec(col("sx2")) * dec(col("n1")) - dec(col("sx1")) * dec(col("n2")))
        .withColumn("adj_n", col("raw_dy") * col("theta_d") - col("theta_n") * col("raw_dx"))
        .withColumn("adj_d", dec(col("n1")) * dec(col("n2")) * col("theta_d"))
        .select(col("n1"), col("n2"),
          col("theta_n").cast("string").as("theta_num"),
          col("theta_d").cast("string").as("theta_den"),
          col("raw_dy").cast("string").as("raw_diff_num"),
          col("adj_n").cast("string").as("adj_diff_num"),
          col("adj_d").cast("string").as("adj_diff_den"),
          graft.functions.PortableMath.roundPortable(
            col("raw_dy").cast("double") /
              (col("n1") * col("n2")).cast("double"), 4).as("raw_diff_cents"),
          graft.functions.PortableMath.roundPortable(
            col("adj_n").cast("double") / col("adj_d").cast("double"), 4)
            .as("adj_diff_cents"),
          // cast-then-multiply on BOTH engines (an exact decimal square
          // cast late would differ in the last ulp from the double product)
          graft.functions.PortableMath.roundPortable(
            (col("theta_n").cast("double") * col("theta_n").cast("double")) /
              (col("theta_d").cast("double") * col("dy").cast("double")), 6)
            .as("rho2"))
    }),

    // DIFFERENTIALLY-PRIVATE count release — the publication step the
    // privacy family (q212 k-anonymity, q219 l-diversity, q79 redaction)
    // was missing. Mechanism: discrete Laplace with p = 1/2 (ε = ln 2 for
    // sensitivity-1 counts), drawn EXACTLY as the difference of two
    // geometric(1/2) variables — and a geometric(1/2) is just the
    // trailing-zero count of a uniform bit stream, so the draw is pure
    // integer math on two independent md5 hashes seeded by the group key:
    // tz(h) = bitlength(h & −h) − 1 (60 for h = 0, the all-zero tail).
    // No float exp/log ever touches either engine, so the RELEASE itself
    // is hash-checked — a DP mechanism with a bit-identical oracle.
    // n_released clamps at 0 (post-processing, DP-legal). Exact counts
    // ride alongside for the audit (this is the engine test surface, not
    // the release boundary). Scale shape: one hash agg; the noise is
    // map-side arithmetic on the tiny aggregated relation.
    "q248_dp_counts" -> ((s, d) => {
      def tzNoise(tag: String): Column = {
        val h = TextHash.md5Long(concat(lit(tag), col("source")))
        when(h === 0L, lit(60L))
          .otherwise(length(bin(h.bitwiseAND(-h))).cast("long") - 1L)
      }
      Tables.documents(s, d)
        .groupBy(col("source")).agg(count(lit(1)).as("n_exact"))
        .withColumn("noise", tzNoise("dpa:") - tzNoise("dpb:"))
        .select(col("source"), col("n_exact"), col("noise"),
          greatest(col("n_exact") + col("noise"), lit(0L)).as("n_released"))
    }),

    // SLIDING-WINDOW distinct-user sketches (operators/
    // StreamingDistinctWindows): 24 h windows sliding 6 h over events,
    // each window's unique-user cardinality from a k=64 KMV set — the
    // streaming dashboard primitive whose batch dual this is (the SAME
    // plan runs under Structured Streaming with one stateful agg; parity
    // under arbitrary micro-batch slicing is spec-proven). Exact distinct
    // counts ride alongside, so the estimate quality is itself in the
    // hash-checked output; everything is integer (q143's estimator).
    "q234_window_distinct" -> ((s, d) => {
      val S = 21600000000L // 6 h slide in µs; window = 4 slides = 24 h
      val k = 64
      val ev = Tables.events(s, d)
      val sk = graft.operators.StreamingDistinctWindows
        .sketchPerWindow(ev, "ts", "user_id", S, 4, k)
      val ex = ev
        .select(unix_micros(col("ts")).as("us"), col("user_id"))
        .select(explode(sequence(lit(0), lit(3))).as("i"), col("us"), col("user_id"))
        .select(expr(s"(us div $S - i) * $S").as("ws_us"), col("user_id"))
        .groupBy(col("ws_us"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
      ex.join(sk, "ws_us")
        .select(col("ws_us"), col("n_exact"), col("n_sketch"),
          col("kth_min"), col("est_distinct"))
    }),

    // Sorted-neighborhood dedup: block on the first 6 chars of the
    // normalized text, sort each block by the 40-char normalized prefix,
    // compare each doc only with its 3 successors (window w=4). Exact
    // word-3-shingle Jaccard on the surviving candidate pairs via the
    // codegen'd sorted-merge intersect (q98's verify kernel). Candidate
    // volume is exactly (w-1)·n — LINEAR by construction, the defining
    // property of SNM blocking (vs LSH's collision-driven and AllPairs'
    // df-driven candidate sets). Block-local windows keep the sort
    // parallel at scale (no global single-partition ordering).
    "q144_snm_dedup" -> ((s, d) =>
      snmCandidates(s, d)
        .withColumn("jaccard",
          expr("floor(CAST(inter AS DOUBLE) / uni * 10000 + 0.5) / 10000"))
        .filter(col("jaccard") >= 0.5)),

    // Seasonal anomaly detection — q136's STL-lite decomposition composed
    // with a robust (median/MAD) outlier flag on the residual channel:
    // the full "decompose, then alert on what's left" monitoring pipeline.
    // EXACT throughout: residuals are quarter-cents (q136's halves minus
    // quarters), their median eighths, the MAD sixteenths — all exactly
    // representable doubles, so the 3-MAD comparison is deterministic on
    // both engines. The day-level frame is bounded by the calendar
    // (≤366 rows/year at ANY data scale) — the two single-group medians
    // are driver-scale by construction, same argument as q136 itself.
    "q146_stl_anomaly" -> ((s, d) => {
      val base = SequenceQueries.queries("q136_stl_decompose")(s, d)
        .persist() // two consumers (median + frame); ≤366 rows, harness clears
      def med(arr: Column): Column = {
        val n = size(arr)
        (element_at(arr, ((n + 1) / 2).cast("int")).cast("double") +
          element_at(arr, (n / 2 + 1).cast("int")).cast("double")) / 2
      }
      val m = base.agg(med(sort_array(collect_list(col("residual")))).as("resid_med"))
      val withMed = base.crossJoin(broadcast(m))
        .withColumn("absdev", abs(col("residual") - col("resid_med")))
        .persist() // two consumers (MAD + final projection)
      val mad = withMed.agg(med(sort_array(collect_list(col("absdev")))).as("mad"))
      withMed.crossJoin(broadcast(mad))
        .select(col("day"), col("cents"), col("trend"), col("seasonal"),
          col("residual"), col("resid_med"), col("mad"),
          (col("absdev") > col("mad") * 3).as("is_anomaly"))
    }),

    // Embedding drift between the md5 train/test splits — q150's TVD
    // asked "do the text lengths drift"; this asks "does the EMBEDDING
    // SPACE drift": per label, the exact squared distance between the
    // train-split centroid and the test-split centroid, using q154's
    // common-denominator identity on per-(label, split, dim) integer
    // micro sums. A label whose two split centroids sit far apart is a
    // label the held-out evaluation will misjudge. Same linear shape:
    // one explode + hash-agg, then a |labels|·dims tiny join.
    "q162_split_drift" -> ((s, d) => {
      val sums = Tables.embeddings(s, d)
        .withColumn("bucket",
          TextHash.md5Long(col("vec_id").cast("string")) % 100)
        .filter(col("bucket") < 80 || col("bucket") >= 90)
        .withColumn("split", when(col("bucket") < 80, "train").otherwise("test"))
        .select(col("label"), col("split"), posexplode(
          graft.operators.VectorOps.asDouble(col("embedding"))))
        .select(col("label"), col("split"), col("pos").as("dim"),
          graft.functions.PortableMath.microHalfAway(col("col")).as("micro"))
        .groupBy(col("label"), col("split"), col("dim"))
        .agg(count(lit(1)).as("n"), sum(col("micro")).as("sv"))
      def dec(c: Column) = c.cast("decimal(38,0)")
      val tr = sums.filter(col("split") === "train")
        .select(col("label"), col("dim"), col("n").as("na"), col("sv").as("sa"))
      val te = sums.filter(col("split") === "test")
        .select(col("label"), col("dim"), col("n").as("nb"), col("sv").as("sb"))
      tr.join(te, Seq("label", "dim"))
        .select(col("label"), col("na"), col("nb"),
          (dec(col("nb")) * dec(col("sa")) - dec(col("na")) * dec(col("sb"))).as("t"))
        .groupBy(col("label"))
        .agg(max(col("na")).as("n_train"), max(col("nb")).as("n_test"),
          sum(col("t") * col("t")).as("num"))
        .select(col("label"), col("n_train"), col("n_test"),
          col("num").cast("string").as("drift2_num"),
          graft.functions.PortableMath.roundPortable(
            col("num").cast("double") /
              (col("n_train").cast("double") * col("n_test").cast("double")
                * col("n_train").cast("double") * col("n_test").cast("double")
                * lit(1000000000000.0)), 8).as("drift2"))
    }),

    // Degree assortativity of the co-purchase graph — "do popular parts
    // co-occur with popular parts": the exact Pearson correlation of the
    // endpoint degrees over every undirected edge counted in BOTH
    // directions (the standard definition). Degrees are integers, so the
    // moment sums are exact; the decimal(38,0) numerators ship as
    // strings and the coefficient as a portable-rounded double — q152's
    // idiom on a graph-science metric. Shape: the one basket self-join
    // plus two shuffled degree joins and one scalar aggregate.
    "q163_assortativity" -> ((s, d) => {
      val items = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
        .persist() // self-join both sides; harness clears per query
      val e0 = items.as("x").hint("shuffle_hash")
        .join(items.as("y").hint("shuffle_hash"), "ok")
        .filter(col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("a"), col("y.pk").as("b")).distinct()
        .persist() // degree agg + edge-moment agg
      val und = e0.select(col("a").as("n"), col("b").as("m"))
        .unionByName(e0.select(col("b").as("n"), col("a").as("m")))
      val deg = und.groupBy(col("n")).agg(count(lit(1)).as("dg"))
        .persist() // 3 consumers (moments, both sxy joins); |V| rows
      // the symmetric moments collapse onto the DEGREE relation — node n
      // appears as an endpoint exactly dg_n times with dx = dg_n, so
      // sx = sy = Σ dg², sxx = syy = Σ dg³, n_ends = Σ dg; only the cross
      // term Σ dg(x)·dg(y) needs edges, and it factors through per-node
      // neighbor-degree sums t_n = Σ_{m∈N(n)} dg_m — one join over the
      // edge list instead of two. Both degree joins are PLAIN shuffled
      // equi-joins: deg has one row per graph NODE, a relation that grows
      // with the data, so a forced broadcast would OOM the driver at
      // scale — let AQE pick broadcast only when the runtime size fits.
      val t = und.join(deg.select(col("n").as("m"), col("dg").as("dy")), "m")
        .groupBy(col("n")).agg(sum(col("dy")).as("tn"))
      val sxyDf = t.join(deg, "n")
        .agg(sum(col("dg") * col("tn")).as("sxy"))
      val agg = deg.agg(sum(col("dg")).as("n_ends"),
          sum(col("dg") * col("dg")).as("sx"),
          sum(col("dg") * col("dg") * col("dg")).as("sxx"))
        .crossJoin(sxyDf)
      def dec(c: Column) = c.cast("decimal(38,0)")
      val n = dec(col("n_ends"))
      val num = n * dec(col("sxy")) - dec(col("sx")) * dec(col("sx"))
      val dx = n * dec(col("sxx")) - dec(col("sx")) * dec(col("sx"))
      val dy = dx
      agg.select(col("n_ends"),
        num.cast("string").as("r_num"),
        dx.cast("string").as("r_den_x"), dy.cast("string").as("r_den_y"),
        graft.functions.PortableMath.roundPortable(
          num.cast("double") / (sqrt(dx.cast("double")) * sqrt(dy.cast("double"))),
          6).as("assortativity"))
    }),

    // Quantization-error audit — the exact companion to q38's int8
    // embedding quantizer: reconstruct each coordinate with the INTEGER
    // dequantizer (q·scale_micro div 127 — both engines truncate integer
    // division toward zero, verified) and report per-label SSE and max
    // absolute error in exact micro units. This is the "is 4× storage
    // compression safe for my similarity search" gate, with the error
    // measured in arithmetic the hash gate can check. Linear: one
    // explode, two hash aggregations; zero-vectors quantize to zero
    // exactly (guarded, no NaN path).
    "q161_quantization_error" -> ((s, d) => {
      val v = graft.operators.VectorOps.asDouble(col("embedding"))
      val base = Tables.embeddings(s, d).select(col("label"), col("vec_id"),
        array_max(transform(v, x => abs(x))).as("maxabs"), posexplode(v))
      val xm = graft.functions.PortableMath.microHalfAway(col("col"))
      val q = when(col("maxabs") === 0.0, 0L)
        .otherwise(round(col("col") * 127.0 / col("maxabs")).cast("long"))
      val sm = graft.functions.PortableMath.microHalfAway(col("maxabs"))
      base
        .select(col("label"), col("vec_id"), q.as("q"), sm.as("sm"), xm.as("xm"))
        .withColumn("err", col("xm") - expr("(q * sm) div 127"))
        .groupBy(col("label"), col("vec_id"))
        .agg(sum(col("err") * col("err")).as("sse"), max(abs(col("err"))).as("mx"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"), sum(col("sse")).as("sse_micro2"),
          max(col("mx")).as("max_abs_err_micro"))
    }),

    // Exact weighted median (operators/WeightedMedian): the price cents
    // at which half the shipped QUANTITY sits below, per return flag —
    // the inventory-weighted "typical price" no unweighted median gives.
    // Pure-integer histogram narrowing, zero driver value-collects: a
    // 10^7-wide cents domain resolves to width 1 in ≤ 4 rounds of one
    // scan each; driver state is groups×bins counters. The lower-median
    // definition (smallest v with running weight ≥ (W+1) div 2) is an
    // ELEMENT of the data, so no interpolation ulp risk exists at all.
    "q155_weighted_median" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"),
        round(col("l_quantity")).cast("long").as("qty"))
      graft.operators.WeightedMedian
        .exact(s, li, "l_returnflag", "cents", "qty")
        .withColumnRenamed("wmedian", "wmedian_cents")
    }),

    // Group-wise MODE with a deterministic tie-break (smallest value
    // wins) — the categorical central-tendency primitive: most common
    // order quantity per (flag, status). Two hash aggregations; the
    // argmax runs on the tiny (group, value, count) relation via a
    // keyed window, never a global sort of the data.
    "q156_group_mode" -> ((s, d) => {
      val counts = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus"),
          round(col("l_quantity")).cast("long").as("qty"))
        .groupBy(col("l_returnflag"), col("l_linestatus"), col("qty"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("l_returnflag"), col("l_linestatus"))
        .orderBy(col("cnt").desc, col("qty").asc)
      counts
        .withColumn("rn", row_number().over(w))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(max(when(col("rn") === 1, col("qty"))).as("mode_qty"),
          max(when(col("rn") === 1, col("cnt"))).as("mode_cnt"),
          count(lit(1)).as("n_distinct_values"))
    }),

    // Embedding class-separation audit — the pairwise squared distance
    // matrix between per-label MEAN vectors, exact: micro-quantized
    // coordinates (the q108 half-away idiom), per-dimension sums as
    // longs, and the common-denominator identity
    //   ‖μ_a − μ_b‖² = Σ_d (n_b·S_a,d − n_a·S_b,d)² / (n_a·n_b)²
    // evaluated with decimal(38,0) numerators (terms reach ~3e29) shipped
    // as exact strings; the real-valued distance² is one mirrored IEEE
    // division tree. This is the "are my classes actually separable"
    // check before training on a labeled corpus. Shape at scale: one
    // explode + (label, dim) hash-agg (640 groups), then a 45-pair join
    // of a TINY relation — the full-data work is a single linear pass.
    "q154_class_separation" -> ((s, d) => {
      val sums = Tables.embeddings(s, d)
        .select(col("label"), posexplode(
          graft.operators.VectorOps.asDouble(col("embedding"))))
        .select(col("label"), col("pos").as("dim"),
          graft.functions.PortableMath.microHalfAway(col("col")).as("micro"))
        .groupBy(col("label"), col("dim"))
        .agg(count(lit(1)).as("n"), sum(col("micro")).as("sv"))
      def dec(c: Column) = c.cast("decimal(38,0)")
      val pairs = sums.as("a").join(sums.as("b"),
          col("a.dim") === col("b.dim") && col("a.label") < col("b.label"))
        .select(col("a.label").as("la"), col("b.label").as("lb"),
          col("a.n").as("na"), col("b.n").as("nb"),
          (dec(col("b.n")) * dec(col("a.sv"))
            - dec(col("a.n")) * dec(col("b.sv"))).as("t"))
      pairs.groupBy(col("la"), col("lb"))
        .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
          sum(col("t") * col("t")).as("num"))
        .select(col("la"), col("lb"), col("n_a"), col("n_b"),
          col("num").cast("string").as("dist2_num"),
          graft.functions.PortableMath.roundPortable(
            col("num").cast("double") /
              (col("n_a").cast("double") * col("n_b").cast("double")
                * col("n_a").cast("double") * col("n_b").cast("double")
                * lit(1000000000000.0)), 8).as("dist2"))
    }),

    // Exact autocorrelation of daily revenue at lags 1–7 — the
    // "is there weekly structure" diagnostic behind every seasonality
    // model (q119/q136's quantitative sibling). Per-lag Pearson on the
    // (x_t, x_{t+lag}) pairs from EXACT integer moment sums; the
    // normal-equation numerators combine in decimal(38,0)/HUGEINT and
    // ship as exact strings (q134's idiom), the correlation itself as a
    // portable-rounded double (sqrt is IEEE correctly-rounded on both
    // engines). The day-level frame is calendar-bounded at any SF; the
    // only full-data work is the one daily aggregation.
    "q152_autocorrelation" -> ((s, d) => {
      val daily = Tables.events(s, d).filter(col("value").isNotNull)
        .select(to_date(col("ts")).as("day"),
          round(col("value") * 100).cast("long").as("c"))
        .groupBy(col("day")).agg(sum(col("c")).as("x"))
      val w = Window.orderBy(col("day")) // ≤366-row frame: driver-scale
      val pairs = daily
        .select(col("x"), array((1 to 7).map(l => lead(col("x"), l).over(w)): _*).as("ys"))
        .select(col("x"), posexplode(col("ys")))
        .select((col("pos") + 1).as("lag"), col("x"), col("col").as("y"))
        .filter(col("y").isNotNull)
      val agg = pairs.groupBy(col("lag"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
      def dec(c: Column) = c.cast("decimal(38,0)")
      val n = dec(col("n"))
      val num = n * dec(col("sxy")) - dec(col("sx")) * dec(col("sy"))
      val dx = n * dec(col("sxx")) - dec(col("sx")) * dec(col("sx"))
      val dy = n * dec(col("syy")) - dec(col("sy")) * dec(col("sy"))
      agg.select(col("lag"), col("n"),
        num.cast("string").as("acf_num"),
        dx.cast("string").as("acf_den_x"), dy.cast("string").as("acf_den_y"),
        graft.functions.PortableMath.roundPortable(
          num.cast("double") / (sqrt(dx.cast("double")) * sqrt(dy.cast("double"))),
          6).as("acf"))
    }),

    // Trimmed + winsorized means — the robust-mean pair every metrics
    // panel wants next to the raw mean, with NO sort of the corpus: the
    // p10/p90 trim thresholds are EXACT lower order statistics from
    // WeightedMedian's integer histogram narrowing (both quantiles share
    // every scan; bounded memory at any scale), and the means are one
    // conditional aggregate against the broadcast thresholds. Trimming is
    // by VALUE bounds [p10, p90] (inter-quantile mean) so tie handling is
    // definitionally identical cross-engine; all arithmetic integer cents.
    "q291_trimmed_mean" -> ((s, d) => {
      val ev = Tables.events(s, d).filter(col("value").isNotNull)
        .select(col("event_type"), round(col("value") * 100).cast("long").as("cents"),
          lit(1L).as("w"))
        .persist() // quantile narrowing scans + the final conditional agg
      val th = graft.operators.WeightedMedian.quantiles(s, ev,
          "event_type", "cents", "w", Seq(("p10", 1L, 10L), ("p90", 9L, 10L)))
        .groupBy(col("event_type"))
        .agg(max(when(col("p_label") === "p10", col("wquantile"))).as("v10"),
          max(when(col("p_label") === "p90", col("wquantile"))).as("v90"))
      val in = col("cents").between(col("v10"), col("v90"))
      ev.join(broadcast(th), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          max(col("v10")).as("p10_cents"), max(col("v90")).as("p90_cents"),
          sum(in.cast("long")).as("n_in"),
          sum(when(in, col("cents")).otherwise(0L)).as("sum_in"),
          sum(greatest(least(col("cents"), col("v90")), col("v10"))).as("wsum"))
        .select(col("event_type"), col("n"), col("p10_cents"), col("p90_cents"),
          col("n_in"),
          expr("sum_in div n_in").as("trimmed_mean_cents"),
          expr("wsum div n").as("winsor_mean_cents"))
    }),

    // Spearman rank correlation between the daily click and purchase
    // series — the robust (monotone-invariant) sibling of q164's Pearson.
    // Tie-averaged ranks are kept EXACT by doubling (avg rank ×2 =
    // 2·min_rank + tie_count − 1, an integer); Spearman is then Pearson
    // on the doubled ranks with the q152 decimal-string numerators and a
    // portable-rounded rho. Rank windows run over the ≤366-row daily
    // relation (calendar-bounded at any SF).
    "q289_spearman" -> ((s, d) => {
      val daily = Tables.events(s, d).filter(col("value").isNotNull)
        .select(to_date(col("ts")).as("day"), col("event_type"),
          round(col("value") * 100).cast("long").as("c"))
        .groupBy(col("day"))
        .agg(sum(when(col("event_type") === "click", col("c")).otherwise(0L)).as("x"),
          sum(when(col("event_type") === "purchase", col("c")).otherwise(0L)).as("y"))
      def rank2(v: String) = // exact tie-averaged rank, doubled to stay integer
        lit(2L) * rank().over(Window.orderBy(col(v))) +
          count(lit(1)).over(Window.partitionBy(col(v))) - 1L
      val ranked = daily.select(rank2("x").as("rx"), rank2("y").as("ry"))
      val agg = ranked.agg(count(lit(1)).as("n"),
        sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
        sum(col("rx") * col("rx")).as("sxx"),
        sum(col("ry") * col("ry")).as("syy"),
        sum(col("rx") * col("ry")).as("sxy"))
      def dec(c: Column) = c.cast("decimal(38,0)")
      val n = dec(col("n"))
      val num = n * dec(col("sxy")) - dec(col("sx")) * dec(col("sy"))
      val dx = n * dec(col("sxx")) - dec(col("sx")) * dec(col("sx"))
      val dy = n * dec(col("syy")) - dec(col("sy")) * dec(col("sy"))
      agg.select(col("n"),
        num.cast("string").as("rho_num"),
        dx.cast("string").as("rho_den_x"), dy.cast("string").as("rho_den_y"),
        graft.functions.PortableMath.roundPortable(
          num.cast("double") / (sqrt(dx.cast("double")) * sqrt(dy.cast("double"))),
          6).as("rho"))
    }),

    // Kendall τ-b between the same two daily series — rank correlation by
    // PAIR COUNTING, which stays entirely in integers: concordant /
    // discordant / per-side tie counts over the day×day pair relation
    // (domain-bounded — C(366,2) at any SF); τ-b's denominator
    // √((n0−n1)(n0−n2)) is the only float, under portable rounding.
    "q290_kendall" -> ((s, d) => {
      val daily = Tables.events(s, d).filter(col("value").isNotNull)
        .select(to_date(col("ts")).as("day"), col("event_type"),
          round(col("value") * 100).cast("long").as("c"))
        .groupBy(col("day"))
        .agg(sum(when(col("event_type") === "click", col("c")).otherwise(0L)).as("x"),
          sum(when(col("event_type") === "purchase", col("c")).otherwise(0L)).as("y"))
        .persist() // both sides of the pair join
      val p = daily.as("a").join(daily.as("b"), col("a.day") < col("b.day"))
        .select((col("a.x") - col("b.x")).as("dx"), (col("a.y") - col("b.y")).as("dy"))
      val agg = p.agg(count(lit(1)).as("n0"),
        sum(((col("dx") > 0 && col("dy") > 0) ||
          (col("dx") < 0 && col("dy") < 0)).cast("long")).as("c_pairs"),
        sum(((col("dx") > 0 && col("dy") < 0) ||
          (col("dx") < 0 && col("dy") > 0)).cast("long")).as("d_pairs"),
        sum((col("dx") === 0).cast("long")).as("n1"),
        sum((col("dy") === 0).cast("long")).as("n2"))
      agg.select(col("n0"), col("c_pairs"), col("d_pairs"), col("n1"), col("n2"),
        graft.functions.PortableMath.roundPortable(
          (col("c_pairs") - col("d_pairs")).cast("double") /
            sqrt((col("n0") - col("n1")).cast("double") *
              (col("n0") - col("n2")).cast("double")), 6).as("tau_b"))
    }),

    // Rolling 14-day cross-correlation between the click and purchase
    // daily revenue series — "are clicks still tracking purchases" as a
    // time-varying signal (q152's exact-moment machinery inside a
    // trailing window). All sums are exact integer window aggregates;
    // the decimal numerators and the mirrored IEEE sqrt tree follow the
    // q152 idiom. Windows with fewer than 5 days or a degenerate
    // (zero-variance) side yield NULL, identically on both engines.
    "q164_rolling_xcorr" -> ((s, d) => {
      val daily = Tables.events(s, d).filter(col("value").isNotNull)
        .select(to_date(col("ts")).as("day"), col("event_type"),
          round(col("value") * 100).cast("long").as("c"))
        .groupBy(col("day"))
        .agg(sum(when(col("event_type") === "click", col("c")).otherwise(0L)).as("x"),
          sum(when(col("event_type") === "purchase", col("c")).otherwise(0L)).as("y"))
      val w = Window.orderBy(col("day")).rowsBetween(-13, 0) // day frame: driver-scale
      val agg = daily.select(col("day"),
        count(lit(1)).over(w).as("n"),
        sum(col("x")).over(w).as("sx"), sum(col("y")).over(w).as("sy"),
        sum(col("x") * col("x")).over(w).as("sxx"),
        sum(col("y") * col("y")).over(w).as("syy"),
        sum(col("x") * col("y")).over(w).as("sxy"))
      def dec(c: Column) = c.cast("decimal(38,0)")
      val n = dec(col("n"))
      val num = n * dec(col("sxy")) - dec(col("sx")) * dec(col("sy"))
      val dx = n * dec(col("sxx")) - dec(col("sx")) * dec(col("sx"))
      val dy = n * dec(col("syy")) - dec(col("sy")) * dec(col("sy"))
      agg.select(col("day"), col("n"),
        num.cast("string").as("xc_num"),
        when(col("n") < 5 || dx === 0 || dy === 0, lit(null))
          .otherwise(graft.functions.PortableMath.roundPortable(
            num.cast("double") / (sqrt(dx.cast("double")) * sqrt(dy.cast("double"))),
            6)).as("xcorr"))
    }),

    // Blocking-strategy EVALUATION — q58's recall-audit pattern applied
    // to SNM: ground truth is the EXACT all-pairs Jaccard ≥ 4/5 set
    // (AllPairs prefix filter, completeness proven by q98's brute-join
    // oracle), the candidate set is q144's (w−1)·n windowed pairs, and
    // the report is one row of exact counts with recall/precision in
    // integer basis points. The rational predicate inter·5 ≥ 4·uni is
    // shared by both sides, so "found" pairs are a true subset of truth.
    "q153_snm_evaluation" -> ((s, d) => {
      val sets = Tables.documents(s, d).select(col("doc_id"),
        VectorExpressions.wordShingleHashes(col("text"), 3, TextHash.P).as("hs"))
      val truth = graft.operators.PrefixFilterJoin
        .jaccardSelfJoin(sets, "doc_id", "hs", 4, 5)
      val cands = snmCandidates(s, d)
      val nTruth = truth.agg(count(lit(1)).as("n_truth"))
      val cAgg = cands.agg(count(lit(1)).as("n_candidates"),
        sum(when(col("inter") * 5 >= col("uni") * 4, 1L).otherwise(0L)).as("n_found"))
      cAgg.crossJoin(broadcast(nTruth))
        .select(col("n_truth"), col("n_candidates"), col("n_found"),
          expr("(n_found * 10000) div n_truth").as("recall_bp"),
          expr("(n_found * 10000) div n_candidates").as("precision_bp"))
    }),

    // KMV set ALGEBRA (the theta-sketch trick): pairwise intersection
    // estimates between event-type user sets from the q143 sketches
    // alone — theta = k-th min of the merged (union) sketch, the hashes
    // below theta form a uniform (k-1)-sample of the union, and the count
    // c of sampled hashes present in BOTH sides estimates the overlap as
    // c·M div theta (≈ c/(k-1) · |union|). c·M ≤ 128·2^53 < 2^63 keeps it
    // int64; exact |A∩B| is emitted beside the estimate, and BOTH are
    // hash-checked. At scale this is the point of sketching: the pairwise
    // overlap matrix of T sets costs T sketches + T² tiny merges, never
    // T² set joins (compare q75's MinHash source-overlap — same shape,
    // Jaccard vs cardinality).
    "q151_kmv_set_ops" -> ((s, d) => {
      val dist = Tables.events(s, d)
        .select(col("event_type"), col("user_id")).distinct()
        .withColumn("h", kmvHash(col("user_id")))
        .persist() // sketch build + exact-overlap oracle side by side
      val sk = dist.groupBy(col("event_type"))
        .agg(TopKAggregate.topK(-col("h").cast("double"), col("h"), KmvK).as("top"))
        .select(col("event_type"), col("top").getField("payload").as("hs"))
      val pairs = sk.as("x").join(sk.as("y"),
        col("x.event_type") < col("y.event_type"))
        .select(col("x.event_type").as("ta"), col("y.event_type").as("tb"),
          col("x.hs").as("ha"), col("y.hs").as("hb"))
      // union sketch of the pair = bottom-k of the deduped hash union;
      // per-pair arrays are <= k long, so this is driver-free map work
      val withTheta = pairs
        .withColumn("uni", array_sort(array_distinct(concat(col("ha"), col("hb")))))
        .withColumn("theta",
          when(size(col("uni")) >= KmvK, element_at(col("uni"), KmvK)))
        .withColumn("c", size(filter(col("uni"),
          x => x < coalesce(col("theta"), lit(Long.MaxValue)) &&
            array_contains(col("ha"), x) && array_contains(col("hb"), x))).cast("long"))
      val est = withTheta.select(col("ta"), col("tb"),
        when(col("theta").isNull, col("c"))
          .otherwise(expr(s"(c * ${KmvM}L) div theta")).as("est_common"))
      val exact = dist.as("a").join(dist.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("ta"), col("b.event_type").as("tb"))
        .agg(count(lit(1)).as("n_common"))
      est.join(exact, Seq("ta", "tb"), "left")
        .select(col("ta"), col("tb"),
          coalesce(col("n_common"), lit(0L)).as("n_common"), col("est_common"))
    }),

    // k-ANONYMITY audit with one generalization step — the privacy gate a
    // training-data release runs before publishing quasi-identifiers.
    // QI = (nation, market segment, $1000 balance band). Groups of size
    // >= k publish as-is; rows in smaller groups generalize the band away,
    // so their anonymity set is the union of ALL small groups sharing
    // (nation, segment) — that union's size, not the original group's, is
    // what meets_k tests. Two exact hash aggregations on successively
    // coarser keys; the balance-cents div keeps the banding integer (both
    // engines truncate integer division toward zero — the q161 fact).
    "q212_k_anonymity" -> ((s, d) => {
      val k = 5L
      val qi = Tables.customer(s, d).select(
        col("c_nationkey").as("nation"), col("c_mktsegment").as("segment"),
        expr("cast(round(c_acctbal * 100) as bigint) div 100000").as("bal_band"))
      val g0 = qi.groupBy(col("nation"), col("segment"), col("bal_band"))
        .agg(count(lit(1)).as("n"))
      val gen = g0.filter(col("n") < k)
        .groupBy(col("nation"), col("segment"))
        .agg(sum(col("n")).as("n_generalized"))
      g0.join(gen, Seq("nation", "segment"), "left")
        .select(col("nation"), col("segment"), col("bal_band"), col("n"),
          (col("n") < k).as("generalized"),
          when(col("n") >= k, col("n"))
            .otherwise(coalesce(col("n_generalized"), lit(0L))).as("anon_set"),
          (when(col("n") >= k, col("n"))
            .otherwise(coalesce(col("n_generalized"), lit(0L))) >= k).as("meets_k"))
    }),

    // l-DIVERSITY — q212's companion privacy audit: a k-anonymous group
    // still leaks if everyone in it shares the sensitive value. Per
    // quasi-identifier group (nation, segment): distinct sensitive values
    // (balance band), the dominant value's share in basis points, and the
    // distinct-l gate. Two hash aggregations; the second shuffles only the
    // already-collapsed (QI, band) group relation, exact integers
    // throughout.
    // k-ANONYMITY GENERALIZATION LADDER — q219's companion: for each
    // level of a 4-step quasi-identifier coarsening (nation+segment+$100
    // balance band → $1000 band → region → region only), the equivalence-
    // class census, the k=10 violation mass, and the CHOSEN level (the
    // first meeting k — what an anonymizer would release). ONE scan: the
    // ladder rides GROUPING SETS (the q292 Expand machinery; grouping_id
    // bit order verified identical Spark⇔DuckDB there), then a 4-row
    // rollup. Balance bands use integer div — trunc-toward-zero on BOTH
    // engines for integers (q161) — so negative balances band identically.
    "q303_k_anonymity" -> ((s, d) => {
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_nationkey").as("nat"), col("n_regionkey").as("reg"),
          col("c_mktsegment").as("seg"),
          expr("cast(round(c_acctbal * 100) as bigint) div 10000").as("b100"),
          expr("cast(round(c_acctbal * 100) as bigint) div 100000").as("b1000"))
        .createOrReplaceTempView("graft_q303_base")
      s.sql("""WITH cls AS (
              |  SELECT grouping_id(nat, seg, b100, b1000, reg) AS gid,
              |    count(*) AS cnt
              |  FROM graft_q303_base
              |  GROUP BY GROUPING SETS ((nat, seg, b100), (nat, seg, b1000),
              |    (reg, seg, b1000), (reg))),
              |lvl AS (
              |  SELECT CASE gid WHEN 3 THEN 0 WHEN 5 THEN 1 WHEN 20 THEN 2
              |           ELSE 3 END AS level,
              |    count(*) AS n_classes, min(cnt) AS min_class,
              |    sum(CASE WHEN cnt < 10 THEN cnt ELSE 0L END) AS n_violating_rows
              |  FROM cls GROUP BY 1)
              |SELECT level, n_classes, min_class, n_violating_rows,
              |  (min_class >= 10) AS meets_k,
              |  (min_class >= 10 AND level =
              |     min(CASE WHEN min_class >= 10 THEN level END) OVER ()) AS chosen
              |FROM lvl""".stripMargin)
    }),

    "q219_l_diversity" -> ((s, d) => {
      val l = 3L
      val sv = Tables.customer(s, d).select(
        col("c_nationkey").as("nation"), col("c_mktsegment").as("segment"),
        expr("cast(round(c_acctbal * 100) as bigint) div 100000").as("band"))
      sv.groupBy(col("nation"), col("segment"), col("band"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("nation"), col("segment"))
        .agg(sum(col("c")).as("n"), count(lit(1)).as("l_distinct"),
          max(col("c")).as("top_c"))
        .select(col("nation"), col("segment"), col("n"), col("l_distinct"),
          expr("(top_c * 10000) div n").as("top_share_bp"),
          (col("l_distinct") >= l).as("meets_l"))
    }),

    // KMV pairwise JACCARD between document sources over word-3-shingle
    // sets — the c/(k−1) estimator (q151's cardinality trick aimed at
    // similarity): theta = k-th min of the merged pair sketch, the
    // below-theta union hashes are a uniform (k−1)-sample of the union,
    // and the fraction present in BOTH sketches estimates J. Unsaturated
    // pairs degrade to the EXACT Jaccard (the sketch holds the full set).
    // Everything is integer basis points; the exact Jaccard (one shingle
    // equi-join) ships beside the estimate and BOTH are hash-checked.
    // At scale: T sketches + T² tiny array merges replace T² shingle
    // joins (the exact side here doubles as the audit, q58's stance).
    "q207_kmv_jaccard" -> ((s, d) => {
      val dist = Tables.documents(s, d)
        .select(col("source"),
          explode(VectorExpressions.wordShingleHashes(col("text"), 3, TextHash.P)).as("sv"))
        .distinct()
        .withColumn("h", kmvHash(col("sv")))
        .persist() // sketch build + exact-Jaccard audit read it twice
      val sk = dist.groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          TopKAggregate.topK(-col("h").cast("double"), col("h"), KmvK).as("top"))
        .select(col("source"), col("n"), col("top").getField("payload").as("hs"))
      val pairs = sk.as("x").join(sk.as("y"), col("x.source") < col("y.source"))
        .select(col("x.source").as("sa"), col("y.source").as("sb"),
          col("x.n").as("na"), col("y.n").as("nb"),
          col("x.hs").as("ha"), col("y.hs").as("hb"))
      val est = pairs
        .withColumn("uni", array_sort(array_distinct(concat(col("ha"), col("hb")))))
        .withColumn("theta", when(size(col("uni")) >= KmvK, element_at(col("uni"), KmvK)))
        .withColumn("samp", when(col("theta").isNull, size(col("uni")).cast("long"))
          .otherwise(lit((KmvK - 1).toLong)))
        .withColumn("c", size(filter(col("uni"),
          x => x < coalesce(col("theta"), lit(Long.MaxValue)) &&
            array_contains(col("ha"), x) && array_contains(col("hb"), x))).cast("long"))
        .select(col("sa"), col("sb"), col("na"), col("nb"),
          // degenerate pair (both sketches empty): audit as 0 bp instead of
          // an ANSI div-by-zero abort; the oracle CASEs identically
          expr("if(samp > 0, (c * 10000) div samp, 0L)").as("est_j_bp"))
      val inter = dist.as("a").join(dist.as("b"),
        col("a.sv") === col("b.sv") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("sa"), col("b.source").as("sb"))
        .agg(count(lit(1)).as("inter"))
      est.join(inter, Seq("sa", "sb"), "left")
        .select(col("sa"), col("sb"),
          coalesce(col("inter"), lit(0L)).as("n_inter"),
          (col("na") + col("nb") - coalesce(col("inter"), lit(0L))).as("n_union"),
          expr("if(na + nb - coalesce(inter, 0L) > 0, " +
            "(coalesce(inter, 0L) * 10000) div (na + nb - coalesce(inter, 0L)), 0L)")
            .as("exact_j_bp"),
          col("est_j_bp"))
    }),

    // Declarative expectation suite over orders (operators/Expectations —
    // the Deequ-style generalization of the reference's two SQL gates):
    // five row-level rules fold into ONE wide aggregate (single scan
    // regardless of rule count), the uniqueness rule is one exact
    // count-vs-distinct aggregation. The report is |rules| rows.
    "q149_expectation_suite" -> ((s, d) => {
      import graft.operators.Expectations._
      val o = Tables.orders(s, d)
        .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
        .withColumn("od", col("o_orderdate").cast("date"))
      check(o, Seq(
        notNull("not_null_custkey", "o_custkey"),
        inSet("status_in_set", "o_orderstatus", Seq("O", "F", "P")),
        matches("priority_pattern", "o_orderpriority", "^[1-5]-"),
        inRange("totalprice_range", col("cents"), 1L, 1000000000L),
        RowRule("date_range",
          !col("od").between(lit("1992-01-01").cast("date"),
            lit("1998-12-31").cast("date"))),
        Unique("unique_orderkey", Seq("o_orderkey"))))
    }),

    // Distribution drift between the q107 md5 train/test splits — exact
    // total-variation distance over width-500 character-length bins, per
    // source and pooled. TVD = Σ|p_i − q_i|/2 computed on the COMMON
    // denominator 2·n_train·n_test so it is pure int64 arithmetic
    // (numerator ≤ 2·n_train·n_test ≈ 6e8 at sf0.1, ×10^6 well inside
    // int64) — the drift gate a training pipeline runs before trusting a
    // held-out split, with none of PSI's float logs. Linear: one
    // map-side bucket projection + two hash aggregations.
    "q150_drift_tvd" -> ((s, d) => {
      val base = Tables.documents(s, d).select(col("source"),
          (TextHash.md5Long(col("doc_id").cast("string")) % 100).as("bucket"),
          expr("n_chars div 500").as("bin"))
        .filter(col("bucket") < 80 || col("bucket") >= 90)
        .withColumn("split", when(col("bucket") < 80, "train").otherwise("test"))
      val all = base.select(lit("ALL").as("source"), col("split"), col("bin"))
        .unionByName(base.select(col("source"), col("split"), col("bin")))
      val piv = all.groupBy(col("source"), col("bin"))
        .agg(sum(when(col("split") === "train", 1L).otherwise(0L)).as("ctr"),
          sum(when(col("split") === "test", 1L).otherwise(0L)).as("cte"))
      val tot = piv.groupBy(col("source"))
        .agg(sum(col("ctr")).as("n_train"), sum(col("cte")).as("n_test"),
          count(lit(1)).as("n_bins"))
      piv.join(tot, "source")
        .withColumn("term", abs(col("ctr") * col("n_test") - col("cte") * col("n_train")))
        .groupBy(col("source"))
        .agg(max(col("n_train")).as("n_train"), max(col("n_test")).as("n_test"),
          max(col("n_bins")).as("n_bins"), sum(col("term")).as("num"))
        .select(col("source"), col("n_train"), col("n_test"), col("n_bins"),
          when(col("n_train") === 0L || col("n_test") === 0L, lit(null))
            .otherwise(expr("(num * 1000000) div (2 * n_train * n_test)"))
            .as("tvd_micro"))
    }),

    // Benford leading-digit audit over order totals, per priority class.
    // All-integer: cents, counts, basis points via integer div; the
    // Benford expectation enters as precomputed bp literals. Two hash
    // aggregates on the same map-side projection; the per-priority totals
    // relation is |priorities| rows — broadcast by Catalyst.
    "q145_benford" -> ((s, d) => {
      val c = Tables.orders(s, d).select(
        col("o_orderpriority").as("priority"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
        .withColumn("digit", substring(col("cents").cast("string"), 1, 1).cast("int"))
      val agg = c.groupBy(col("priority"), col("digit")).agg(count(lit(1)).as("n"))
      val tot = c.groupBy(col("priority")).agg(count(lit(1)).as("total"))
      agg.join(tot, "priority")
        .withColumn("share_bp", expr("(n * 10000) div total"))
        .withColumn("expected_bp", expr(benfordCaseSql).cast("long"))
        .withColumn("dev_bp", col("share_bp") - col("expected_bp"))
        .select(col("priority"), col("digit"), col("n"),
          col("share_bp"), col("expected_bp"), col("dev_bp"))
    }),
  )

  val oracle: Map[String, String] = Map(

    // thresholds replayed as explicit order statistics: the operator's
    // contract is "smallest v whose running weight reaches ceil(p·W)",
    // which for unit weights is the value at row_number ceil(p·n)
    "q291_trimmed_mean" ->
      """WITH ev AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL),
        |rk AS (SELECT event_type, cents,
        |    row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM ev),
        |th AS (SELECT event_type,
        |    min(CASE WHEN rn >= (n + 9) // 10 THEN cents END)::BIGINT AS v10,
        |    min(CASE WHEN rn >= (9 * n + 9) // 10 THEN cents END)::BIGINT AS v90
        |  FROM rk GROUP BY 1),
        |a AS (SELECT ev.event_type, count(*)::BIGINT AS n,
        |    max(v10)::BIGINT AS p10_cents, max(v90)::BIGINT AS p90_cents,
        |    sum(CASE WHEN cents BETWEEN v10 AND v90 THEN 1 ELSE 0 END)::BIGINT AS n_in,
        |    sum(CASE WHEN cents BETWEEN v10 AND v90 THEN cents ELSE 0 END)::BIGINT AS sum_in,
        |    sum(greatest(least(cents, v90), v10))::BIGINT AS wsum
        |  FROM ev JOIN th ON ev.event_type = th.event_type GROUP BY 1)
        |SELECT event_type, n, p10_cents, p90_cents, n_in,
        |  (sum_in // n_in)::BIGINT AS trimmed_mean_cents,
        |  (wsum // n)::BIGINT AS winsor_mean_cents
        |FROM a""".stripMargin,

    "q289_spearman" ->
      """WITH daily AS (SELECT ts::DATE AS day,
        |    sum(CASE WHEN event_type = 'click'
        |        THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)::BIGINT AS x,
        |    sum(CASE WHEN event_type = 'purchase'
        |        THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)::BIGINT AS y
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |r AS (SELECT
        |    (2 * rank() OVER (ORDER BY x) + count(*) OVER (PARTITION BY x) - 1)::BIGINT AS rx,
        |    (2 * rank() OVER (ORDER BY y) + count(*) OVER (PARTITION BY y) - 1)::BIGINT AS ry
        |  FROM daily),
        |a AS (SELECT count(*)::BIGINT AS n, sum(rx)::BIGINT AS sx, sum(ry)::BIGINT AS sy,
        |    sum(rx * rx)::BIGINT AS sxx, sum(ry * ry)::BIGINT AS syy,
        |    sum(rx * ry)::BIGINT AS sxy FROM r)
        |SELECT n,
        |  (n::HUGEINT * sxy - sx::HUGEINT * sy)::VARCHAR AS rho_num,
        |  (n::HUGEINT * sxx - sx::HUGEINT * sx)::VARCHAR AS rho_den_x,
        |  (n::HUGEINT * syy - sy::HUGEINT * sy)::VARCHAR AS rho_den_y,
        |  (floor((n::HUGEINT * sxy - sx::HUGEINT * sy)::DOUBLE /
        |     (sqrt((n::HUGEINT * sxx - sx::HUGEINT * sx)::DOUBLE)
        |      * sqrt((n::HUGEINT * syy - sy::HUGEINT * sy)::DOUBLE)) * 1000000 + 0.5)
        |   / 1000000) AS rho
        |FROM a""".stripMargin,

    "q290_kendall" ->
      """WITH daily AS (SELECT ts::DATE AS day,
        |    sum(CASE WHEN event_type = 'click'
        |        THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)::BIGINT AS x,
        |    sum(CASE WHEN event_type = 'purchase'
        |        THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)::BIGINT AS y
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |p AS (SELECT (a.x - b.x) AS dx, (a.y - b.y) AS dy
        |  FROM daily a JOIN daily b ON a.day < b.day),
        |g AS (SELECT count(*)::BIGINT AS n0,
        |    sum(CASE WHEN (dx > 0 AND dy > 0) OR (dx < 0 AND dy < 0)
        |        THEN 1 ELSE 0 END)::BIGINT AS c_pairs,
        |    sum(CASE WHEN (dx > 0 AND dy < 0) OR (dx < 0 AND dy > 0)
        |        THEN 1 ELSE 0 END)::BIGINT AS d_pairs,
        |    sum(CASE WHEN dx = 0 THEN 1 ELSE 0 END)::BIGINT AS n1,
        |    sum(CASE WHEN dy = 0 THEN 1 ELSE 0 END)::BIGINT AS n2
        |  FROM p)
        |SELECT n0, c_pairs, d_pairs, n1, n2,
        |  (floor((c_pairs - d_pairs)::DOUBLE /
        |     sqrt((n0 - n1)::DOUBLE * (n0 - n2)::DOUBLE) * 1000000 + 0.5)
        |   / 1000000) AS tau_b
        |FROM g""".stripMargin,

    "q288_backtest_grid" ->
      """WITH daily AS (SELECT ts::DATE AS day,
        |    sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS cents
        |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
        |  GROUP BY 1),
        |c AS (SELECT unnest(['2024-01-16'::DATE, '2024-01-20'::DATE,
        |    '2024-01-24'::DATE]) AS cutoff),
        |j AS (SELECT c.cutoff, d.day, d.cents, s.cents AS s_cents, a.cents AS a_cents
        |  FROM c
        |  JOIN daily d ON d.day > c.cutoff AND d.day <= c.cutoff + 3
        |  JOIN daily s ON s.day = d.day - 7
        |  JOIN daily a ON a.day = c.cutoff)
        |SELECT cutoff, count(*)::BIGINT AS n_days,
        |  (sum(abs(cents - s_cents)) // count(*))::BIGINT AS mae_seasonal_cents,
        |  (sum(abs(cents - a_cents)) // count(*))::BIGINT AS mae_naive_cents,
        |  (CASE WHEN sum(abs(cents - a_cents)) > 0
        |        THEN sum(abs(cents - s_cents)) * 10000 // sum(abs(cents - a_cents))
        |        ELSE 0 END)::BIGINT AS mase_bp
        |FROM j GROUP BY cutoff""".stripMargin,

    "q287_policy_eval" ->
      s"""WITH p AS (SELECT CAST(round(value * 100) AS BIGINT) AS cents,
         |    ${TextHash.md5LongSql("event_id::VARCHAR")} % 2 AS logged_action,
         |    user_id % 2 AS target_action
         |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
         |a AS (SELECT count(*)::BIGINT AS n,
         |    sum(CASE WHEN logged_action = target_action THEN 1 ELSE 0 END)::BIGINT
         |      AS n_matched,
         |    sum(CASE WHEN logged_action = target_action THEN cents ELSE 0 END)::BIGINT
         |      AS matched_cents,
         |    sum(cents)::BIGINT AS total_cents
         |  FROM p)
         |SELECT n, n_matched,
         |  (2 * matched_cents * 10000 // n)::BIGINT AS ips_microcents,
         |  (CASE WHEN n_matched > 0 THEN matched_cents * 10000 // n_matched
         |        ELSE 0 END)::BIGINT AS snips_microcents,
         |  (total_cents * 10000 // n)::BIGINT AS dm_microcents
         |FROM a""".stripMargin,

    "q143_kmv_distinct" -> {
      val h = kmvHashSql("user_id")
      s"""WITH dist AS (SELECT DISTINCT event_type, user_id FROM events),
         |hs AS (SELECT event_type, $h AS h FROM dist),
         |r AS (SELECT event_type, h,
         |        row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
         |        count(*) OVER (PARTITION BY event_type) AS n FROM hs),
         |per AS (SELECT event_type AS grp, max(n)::BIGINT AS n_exact,
         |          max(CASE WHEN rn = $KmvK THEN h END)::BIGINT AS kth_min,
         |          max(n)::BIGINT AS n_for_est
         |        FROM r GROUP BY event_type),
         |mh AS (SELECT DISTINCT h FROM r WHERE rn <= $KmvK),
         |mr AS (SELECT h, row_number() OVER (ORDER BY h) AS rn,
         |         count(*) OVER () AS m FROM mh),
         |allr AS (SELECT 'ALL' AS grp,
         |           (SELECT count(DISTINCT user_id) FROM events)::BIGINT AS n_exact,
         |           max(CASE WHEN rn = $KmvK THEN h END)::BIGINT AS kth_min,
         |           max(m)::BIGINT AS n_for_est
         |         FROM mr),
         |u AS (SELECT * FROM per UNION ALL SELECT * FROM allr)
         |SELECT grp, n_exact, kth_min,
         |  (CASE WHEN n_for_est < $KmvK THEN n_for_est
         |        ELSE $KmvNum // kth_min END)::BIGINT AS est_distinct
         |FROM u""".stripMargin
    },

    "q246_hll_registers" -> {
      val h = TextHash.md5LongSql("'hll:' || user_id::VARCHAR")
      val lut = HllLcLut.mkString("[", ", ", "]")
      s"""WITH dist AS (SELECT DISTINCT event_type, user_id FROM events),
         |hs AS (SELECT event_type, $h AS h FROM dist),
         |b AS (SELECT event_type, h % 64 AS bucket,
         |        (h // 64) % 4294967296 AS stream FROM hs),
         |r AS (SELECT event_type, bucket,
         |        CASE WHEN stream = 0 THEN 33
         |             ELSE 33 - length(bin(stream)) END AS rho FROM b),
         |regs AS (SELECT event_type AS grp, bucket, max(rho) AS m
         |         FROM r GROUP BY 1, 2),
         |mregs AS (SELECT 'ALL' AS grp, bucket, max(m) AS m
         |          FROM regs GROUP BY 2),
         |allregs AS (SELECT * FROM regs UNION ALL SELECT * FROM mregs),
         |f AS (SELECT grp,
         |        (sum((1::BIGINT << (33 - m)::INT))
         |          + (64 - count(*)) * 8589934592)::BIGINT AS sum_scaled,
         |        (64 - count(*))::BIGINT AS v_zero
         |      FROM allregs GROUP BY 1),
         |ne AS (SELECT event_type AS grp,
         |         count(DISTINCT user_id)::BIGINT AS n_exact
         |       FROM events GROUP BY 1
         |       UNION ALL
         |       SELECT 'ALL', count(DISTINCT user_id)::BIGINT FROM events),
         |e AS (SELECT grp, sum_scaled, v_zero,
         |        ($HllNum // sum_scaled)::BIGINT AS raw FROM f)
         |SELECT e.grp, ne.n_exact, e.v_zero, e.sum_scaled,
         |  (CASE WHEN e.v_zero > 0 AND e.raw <= 160
         |        THEN ($lut)[e.v_zero::INT]
         |        ELSE e.raw END)::BIGINT AS est_hll
         |FROM e JOIN ne USING (grp)""".stripMargin
    },

    // Same register replay as q246's typed rows (no ALL row): equality
    // proves the aggregate form == the expression pipeline.
    "q267_hll_agg" -> {
      val h = TextHash.md5LongSql("'hll:' || user_id::VARCHAR")
      val lut = HllLcLut.mkString("[", ", ", "]")
      s"""WITH dist AS (SELECT DISTINCT event_type AS grp, user_id FROM events),
         |hs AS (SELECT grp, $h AS h FROM dist),
         |b AS (SELECT grp, h % 64 AS bucket,
         |        (h // 64) % 4294967296 AS stream FROM hs),
         |r AS (SELECT grp, bucket,
         |        CASE WHEN stream = 0 THEN 33
         |             ELSE 33 - length(bin(stream)) END AS rho FROM b),
         |regs AS (SELECT grp, bucket, max(rho) AS m FROM r GROUP BY 1, 2),
         |f AS (SELECT grp,
         |        (sum((1::BIGINT << (33 - m)::INT))
         |          + (64 - count(*)) * 8589934592)::BIGINT AS sum_scaled,
         |        (64 - count(*))::BIGINT AS v_zero
         |      FROM regs GROUP BY 1),
         |ne AS (SELECT grp, count(*)::BIGINT AS n_exact FROM dist GROUP BY 1),
         |e AS (SELECT grp, sum_scaled, v_zero,
         |        ($HllNum // sum_scaled)::BIGINT AS raw FROM f)
         |SELECT e.grp, n_exact, v_zero, sum_scaled,
         |  (CASE WHEN v_zero > 0 AND raw <= 160
         |        THEN ($lut)[v_zero::INT] ELSE raw END)::BIGINT AS est_hll
         |FROM e JOIN ne ON e.grp = ne.grp""".stripMargin
    },

    // Direct weekly sketches (NO daily level): equality with Spark's
    // day→week merged partials proves register-max associativity.
    "q261_sketch_rollup" -> {
      val h = TextHash.md5LongSql("'hll:' || user_id::VARCHAR")
      val lut = HllLcLut.mkString("[", ", ", "]")
      s"""WITH dist AS (SELECT DISTINCT event_type AS grp,
         |                weekofyear(ts)::BIGINT AS week, user_id FROM events),
         |hs AS (SELECT grp, week, $h AS h FROM dist),
         |b AS (SELECT grp, week, h % 64 AS bucket,
         |        (h // 64) % 4294967296 AS stream FROM hs),
         |r AS (SELECT grp, week, bucket,
         |        CASE WHEN stream = 0 THEN 33
         |             ELSE 33 - length(bin(stream)) END AS rho FROM b),
         |regs AS (SELECT grp, week, bucket, max(rho) AS m
         |         FROM r GROUP BY 1, 2, 3),
         |f AS (SELECT grp, week,
         |        (sum((1::BIGINT << (33 - m)::INT))
         |          + (64 - count(*)) * 8589934592)::BIGINT AS sum_scaled,
         |        (64 - count(*))::BIGINT AS v_zero
         |      FROM regs GROUP BY 1, 2),
         |ne AS (SELECT grp, week, count(*)::BIGINT AS n_exact
         |       FROM dist GROUP BY 1, 2),
         |e AS (SELECT grp, week, sum_scaled, v_zero,
         |        ($HllNum // sum_scaled)::BIGINT AS raw FROM f)
         |SELECT e.grp, e.week, n_exact, v_zero, sum_scaled,
         |  (CASE WHEN v_zero > 0 AND raw <= 160
         |        THEN ($lut)[v_zero::INT] ELSE raw END)::BIGINT AS est_hll
         |FROM e JOIN ne ON e.grp = ne.grp AND e.week = ne.week""".stripMargin
    },

    "q255_ari_agreement" -> {
      val r = graft.functions.PortableMath.roundPortableSql(
        "num::DOUBLE / den::DOUBLE", 6)
      s"""WITH ct AS (SELECT source, lang, count(*)::BIGINT AS c
         |            FROM documents GROUP BY 1, 2),
         |i AS (SELECT sum((c * (c - 1)) // 2)::BIGINT AS index_sum,
         |        sum(c)::BIGINT AS n FROM ct),
         |a AS (SELECT sum((ai * (ai - 1)) // 2)::BIGINT AS a_sum
         |      FROM (SELECT sum(c)::BIGINT AS ai FROM ct GROUP BY source)),
         |b AS (SELECT sum((bj * (bj - 1)) // 2)::BIGINT AS b_sum
         |      FROM (SELECT sum(c)::BIGINT AS bj FROM ct GROUP BY lang)),
         |m AS (SELECT n, index_sum, a_sum, b_sum,
         |        ((n * (n - 1)) // 2)::BIGINT AS t FROM i, a, b),
         |f AS (SELECT n, index_sum, a_sum, b_sum,
         |        2 * (t::HUGEINT * index_sum - a_sum::HUGEINT * b_sum) AS num,
         |        (t::HUGEINT * (a_sum + b_sum)
         |           - 2 * a_sum::HUGEINT * b_sum) AS den
         |      FROM m)
         |SELECT n, index_sum, a_sum, b_sum,
         |  num::VARCHAR AS ari_num, den::VARCHAR AS ari_den,
         |  CASE WHEN den = 0 THEN NULL ELSE $r END AS ari
         |FROM f""".stripMargin
    },

    "q256_ks_drift" ->
      """WITH docs AS (SELECT source, n_chars AS v FROM documents),
        |sc AS (SELECT source, v, count(*)::BIGINT AS c_s FROM docs GROUP BY 1, 2),
        |gt AS (SELECT v, count(*)::BIGINT AS c_g FROM docs GROUP BY 1),
        |srcs AS (SELECT source, count(*)::BIGINT AS n_s FROM docs GROUP BY 1),
        |spine AS (SELECT source, n_s, v FROM srcs, (SELECT v FROM gt) gv),
        |cum AS (SELECT spine.source, n_s,
        |          sum(coalesce(c_s, 0))
        |            OVER (PARTITION BY spine.source ORDER BY spine.v
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |            ::BIGINT AS cum_s,
        |          sum(c_g)
        |            OVER (PARTITION BY spine.source ORDER BY spine.v
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |            ::BIGINT AS cum_g
        |        FROM spine
        |        LEFT JOIN sc ON spine.source = sc.source AND spine.v = sc.v
        |        JOIN gt ON spine.v = gt.v),
        |n AS (SELECT count(*)::BIGINT AS n_total FROM docs)
        |SELECT source, n_s, n_total,
        |  max(abs(cum_s * n_total - cum_g * n_s))::BIGINT AS ks_num,
        |  (max(abs(cum_s * n_total - cum_g * n_s)) * 1000000
        |     // (n_s * n_total))::BIGINT AS ks_ppm
        |FROM cum, n
        |GROUP BY source, n_s, n_total""".stripMargin,

    "q271_bootstrap_ci" -> {
      val hArm = TextHash.md5LongSql("'ab:' || user_id::VARCHAR")
      val hU = TextHash.md5LongSql("'bs:' || rep::VARCHAR || ':' || user_id::VARCHAR")
      val ts = Seq(3313563428353948L, 6627126856707896L, 8283908570884870L,
        8836169142277195L, 8974234285125276L, 9001847313694892L,
        9006449485123161L, 9007106938184342L, 9007189119816990L)
      val wSum = ts.map(t => s"(CASE WHEN u >= $t THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH conv AS (SELECT user_id,
         |        max(CASE WHEN event_type = 'purchase' AND value > 150
         |                 THEN 1 ELSE 0 END)::BIGINT AS conv,
         |        CASE WHEN ($hArm) % 2 = 0 THEN 1 ELSE 2 END AS arm
         |      FROM events GROUP BY user_id,
         |        CASE WHEN ($hArm) % 2 = 0 THEN 1 ELSE 2 END),
         |reps AS (SELECT user_id, conv, arm, i AS rep,
         |           ($hU) % 9007199254740992 AS u
         |         FROM conv, range(0, 40) t(i)),
         |wts AS (SELECT rep, arm, conv, ($wSum)::BIGINT AS w FROM reps),
         |arms AS (SELECT rep,
         |    sum(CASE WHEN arm = 1 THEN w ELSE 0 END)::BIGINT AS n1,
         |    sum(CASE WHEN arm = 1 THEN w * conv ELSE 0 END)::BIGINT AS c1,
         |    sum(CASE WHEN arm = 2 THEN w ELSE 0 END)::BIGINT AS n2,
         |    sum(CASE WHEN arm = 2 THEN w * conv ELSE 0 END)::BIGINT AS c2
         |  FROM wts GROUP BY rep),
         |diffs AS (SELECT ((c2 * n1 - c1 * n2) * 10000) // (n1 * n2) AS diff_bp
         |          FROM arms WHERE n1 > 0 AND n2 > 0),
         |rk AS (SELECT diff_bp, row_number() OVER (ORDER BY diff_bp) AS rn
         |       FROM diffs),
         |nr AS (SELECT count(*)::BIGINT AS n_reps FROM diffs),
         |ci AS (SELECT n_reps,
         |    sum(CASE WHEN rn = 2 THEN diff_bp END)::BIGINT AS ci_lo_bp,
         |    sum(CASE WHEN rn = n_reps - 1 THEN diff_bp END)::BIGINT AS ci_hi_bp
         |  FROM rk, nr GROUP BY n_reps),
         |pt AS (SELECT ((sum(CASE WHEN arm = 2 THEN conv ELSE 0 END)
         |                 * sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
         |               - sum(CASE WHEN arm = 1 THEN conv ELSE 0 END)
         |                 * sum(CASE WHEN arm = 2 THEN 1 ELSE 0 END)) * 10000
         |          // (sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
         |              * sum(CASE WHEN arm = 2 THEN 1 ELSE 0 END)))::BIGINT
         |          AS point_bp
         |       FROM conv)
         |SELECT n_reps, point_bp, ci_lo_bp, ci_hi_bp,
         |  (ci_lo_bp <= 0 AND ci_hi_bp >= 0) AS covers_zero
         |FROM ci, pt""".stripMargin
    },

    "q268_theil_sen" -> {
      val r = graft.functions.PortableMath.roundPortableSql(
        "(lo + hi)::DOUBLE / 2000000.0", 4)
      s"""WITH daily AS (SELECT (ts::DATE - DATE '2024-01-01')::BIGINT AS i,
         |        sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS y
         |      FROM events WHERE value IS NOT NULL GROUP BY 1),
         |sl AS (SELECT ((b.y - a.y) * 1000000) // (b.i - a.i) AS s
         |       FROM daily a JOIN daily b ON a.i < b.i),
         |rk AS (SELECT s, row_number() OVER (ORDER BY s) AS rn FROM sl),
         |n AS (SELECT count(*)::BIGINT AS n_pairs FROM sl),
         |m AS (SELECT n_pairs,
         |        sum(CASE WHEN rn = (n_pairs + 1) // 2 THEN s END)::BIGINT AS lo,
         |        sum(CASE WHEN rn = n_pairs // 2 + 1 THEN s END)::BIGINT AS hi
         |      FROM rk, n GROUP BY n_pairs)
         |SELECT n_pairs, (lo + hi)::BIGINT AS med2_slope_scaled,
         |  $r AS slope_cents_per_day
         |FROM m""".stripMargin
    },

    "q269_forecast_mase" ->
      """WITH daily AS (SELECT event_type, ts::DATE AS day,
        |        sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS y
        |      FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |lg AS (SELECT event_type,
        |         abs(y - lag(y, 7) OVER w)::BIGINT AS e7,
        |         abs(y - lag(y, 1) OVER w)::BIGINT AS e1
        |       FROM daily
        |       WINDOW w AS (PARTITION BY event_type ORDER BY day)),
        |f AS (SELECT * FROM lg WHERE e7 IS NOT NULL AND e1 IS NOT NULL),
        |u AS (SELECT event_type, count(*)::BIGINT AS n_eval,
        |        sum(e7)::BIGINT AS sae_forecast, sum(e1)::BIGINT AS sae_naive
        |      FROM f GROUP BY 1
        |      UNION ALL
        |      SELECT 'ALL', count(*)::BIGINT, sum(e7)::BIGINT, sum(e1)::BIGINT
        |      FROM f)
        |SELECT event_type, n_eval, sae_forecast, sae_naive,
        |  (CASE WHEN sae_naive = 0 THEN NULL
        |        ELSE sae_forecast * 10000 // sae_naive END)::BIGINT AS mase_bp
        |FROM u""".stripMargin,

    "q265_cuped" -> {
      val h = TextHash.md5LongSql("'ab:' || user_id::VARCHAR")
      def pr(e: String, k: Int) =
        graft.functions.PortableMath.roundPortableSql(e, k)
      s"""WITH u AS (SELECT user_id,
         |        sum(CASE WHEN ts::DATE < DATE '2024-01-16'
         |                 THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
         |          ::BIGINT AS x,
         |        sum(CASE WHEN ts::DATE >= DATE '2024-01-16'
         |                 THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
         |          ::BIGINT AS y,
         |        CASE WHEN ($h) % 2 = 0 THEN 1 ELSE 2 END AS arm
         |      FROM events GROUP BY user_id,
         |        CASE WHEN ($h) % 2 = 0 THEN 1 ELSE 2 END),
         |p AS (SELECT count(*)::HUGEINT AS n, sum(x)::HUGEINT AS sx,
         |        sum(y)::HUGEINT AS sy, sum(x::HUGEINT * x) AS sxx,
         |        sum(y::HUGEINT * y) AS syy, sum(x::HUGEINT * y) AS sxy
         |      FROM u),
         |w AS (SELECT
         |        sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::HUGEINT AS n1,
         |        sum(CASE WHEN arm = 1 THEN x ELSE 0 END)::HUGEINT AS sx1,
         |        sum(CASE WHEN arm = 1 THEN y ELSE 0 END)::HUGEINT AS sy1,
         |        sum(CASE WHEN arm = 2 THEN 1 ELSE 0 END)::HUGEINT AS n2,
         |        sum(CASE WHEN arm = 2 THEN x ELSE 0 END)::HUGEINT AS sx2,
         |        sum(CASE WHEN arm = 2 THEN y ELSE 0 END)::HUGEINT AS sy2
         |      FROM u),
         |m AS (SELECT n1, n2,
         |        (n * sxy - sx * sy) AS theta_n,
         |        (n * sxx - sx * sx) AS theta_d,
         |        (n * syy - sy * sy) AS dy,
         |        (sy2 * n1 - sy1 * n2) AS raw_dy,
         |        (sx2 * n1 - sx1 * n2) AS raw_dx
         |      FROM p, w),
         |f AS (SELECT n1, n2, theta_n, theta_d, dy, raw_dy,
         |        (raw_dy * theta_d - theta_n * raw_dx) AS adj_n,
         |        (n1 * n2 * theta_d) AS adj_d
         |      FROM m)
         |SELECT n1::BIGINT AS n1, n2::BIGINT AS n2,
         |  theta_n::VARCHAR AS theta_num, theta_d::VARCHAR AS theta_den,
         |  raw_dy::VARCHAR AS raw_diff_num,
         |  adj_n::VARCHAR AS adj_diff_num, adj_d::VARCHAR AS adj_diff_den,
         |  ${pr("raw_dy::DOUBLE / (n1::DOUBLE * n2::DOUBLE)", 4)} AS raw_diff_cents,
         |  ${pr("adj_n::DOUBLE / adj_d::DOUBLE", 4)} AS adj_diff_cents,
         |  ${pr("(theta_n::DOUBLE * theta_n::DOUBLE) / (theta_d::DOUBLE * dy::DOUBLE)", 6)}
         |    AS rho2
         |FROM f""".stripMargin
    },

    "q263_ab_test" -> {
      val h = TextHash.md5LongSql("'ab:' || user_id::VARCHAR")
      val r = graft.functions.PortableMath.roundPortableSql(
        "num::DOUBLE / den::DOUBLE", 6)
      s"""WITH u AS (SELECT user_id,
         |        max(CASE WHEN event_type = 'purchase' AND value > 150
         |                 THEN 1 ELSE 0 END)::BIGINT AS converted,
         |        CASE WHEN ($h) % 2 = 0 THEN 'control' ELSE 'treatment' END AS arm
         |      FROM events GROUP BY user_id,
         |        CASE WHEN ($h) % 2 = 0 THEN 'control' ELSE 'treatment' END),
         |w AS (SELECT
         |        sum(CASE WHEN arm = 'control' THEN 1 ELSE 0 END)::BIGINT AS n1,
         |        sum(CASE WHEN arm = 'control' THEN converted ELSE 0 END)::BIGINT AS c1,
         |        sum(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END)::BIGINT AS n2,
         |        sum(CASE WHEN arm = 'treatment' THEN converted ELSE 0 END)::BIGINT AS c2
         |      FROM u),
         |m AS (SELECT n1, c1, n2, c2,
         |        ((c1*n2 - c2*n1)::HUGEINT * (c1*n2 - c2*n1) * (n1 + n2)) AS num,
         |        (n1::HUGEINT * n2 * (c1 + c2) * (n1 + n2 - c1 - c2)) AS den
         |      FROM w)
         |SELECT n1, c1, n2, c2,
         |  num::VARCHAR AS z2_num, den::VARCHAR AS z2_den,
         |  (den > 0 AND num * 10000 >= den * 38415) AS significant_95,
         |  (CASE WHEN c1*n2 = 0 THEN NULL
         |        ELSE (c2*n1 - c1*n2) * 10000 // (c1*n2) END)::BIGINT AS lift_bp,
         |  CASE WHEN den = 0 THEN NULL ELSE $r END AS z2
         |FROM m""".stripMargin
    },

    "q248_dp_counts" -> {
      val ha = TextHash.md5LongSql("'dpa:' || source")
      val hb = TextHash.md5LongSql("'dpb:' || source")
      s"""WITH c AS (SELECT source, count(*)::BIGINT AS n_exact
         |           FROM documents GROUP BY 1),
         |h AS (SELECT source, n_exact, $ha AS ha, $hb AS hb FROM c),
         |n AS (SELECT source, n_exact,
         |        ((CASE WHEN ha = 0 THEN 60
         |               ELSE length(bin(ha & (-ha))) - 1 END)
         |       - (CASE WHEN hb = 0 THEN 60
         |               ELSE length(bin(hb & (-hb))) - 1 END))::BIGINT AS noise
         |      FROM h)
         |SELECT source, n_exact, noise,
         |  greatest(n_exact + noise, 0)::BIGINT AS n_released FROM n""".stripMargin
    },

    "q234_window_distinct" -> {
      val s = 21600000000L
      val k = 64
      val num = (k - 1).toLong * TextHash.KmvM
      s"""WITH ev AS (SELECT epoch_us(ts) AS us, user_id FROM events),
         |ew AS (SELECT ((us // $s) - i) * $s AS ws_us, user_id
         |       FROM ev, range(0, 4) t(i)),
         |du AS (SELECT DISTINCT ws_us, user_id FROM ew),
         |hh AS (SELECT DISTINCT ws_us, ${kmvHashSql("user_id")} AS h FROM du),
         |rr AS (SELECT ws_us, h,
         |         row_number() OVER (PARTITION BY ws_us ORDER BY h) AS rn FROM hh),
         |sk AS (SELECT ws_us, count(*)::BIGINT AS n_sketch,
         |         max(CASE WHEN rn = $k THEN h END)::BIGINT AS kth_min
         |       FROM rr WHERE rn <= $k GROUP BY ws_us),
         |ne AS (SELECT ws_us, count(*)::BIGINT AS n_exact FROM du GROUP BY ws_us)
         |SELECT ne.ws_us, n_exact, n_sketch, kth_min,
         |  (CASE WHEN n_sketch < $k THEN n_sketch
         |        ELSE $num // kth_min END)::BIGINT AS est_distinct
         |FROM ne JOIN sk ON ne.ws_us = sk.ws_us""".stripMargin
    },

    "q144_snm_dedup" -> {
      val hs = s"list_sort(list_distinct(list_transform(" +
        s"${TextHash.wordShinglesSql("text", 3)}, x -> ${TextHash.baseHashSql("x")})))"
      s"""WITH n AS (SELECT doc_id,
         |    substr(regexp_replace(lower(text), '\\s+', ' ', 'g'), 1, 40) AS sk,
         |    $hs AS hs
         |  FROM documents),
         |r AS (SELECT doc_id, sk, substr(sk, 1, 6) AS block, hs,
         |        row_number() OVER (PARTITION BY substr(sk, 1, 6)
         |                           ORDER BY sk, doc_id) AS rn
         |      FROM n),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.hs AS ha, b.hs AS hb
         |      FROM r a JOIN r b ON a.block = b.block
         |                       AND b.rn - a.rn BETWEEN 1 AND 3),
         |j AS (SELECT id_a, id_b,
         |        len(list_filter(ha, x -> list_contains(hb, x)))::BIGINT AS inter,
         |        (len(ha) + len(hb))::BIGINT AS sz
         |      FROM p)
         |SELECT id_a, id_b, inter, (sz - inter)::BIGINT AS uni,
         |  floor(inter::DOUBLE / (sz - inter) * 10000 + 0.5) / 10000 AS jaccard
         |FROM j
         |WHERE floor(inter::DOUBLE / (sz - inter) * 10000 + 0.5) / 10000 >= 0.5""".stripMargin
    },

    "q162_split_drift" -> {
      val h = TextHash.md5LongSql("vec_id::VARCHAR")
      s"""WITH f AS (SELECT label, vec_id, embedding, ($h % 100) AS bucket
         |  FROM embeddings),
         |s0 AS (SELECT label,
         |    CASE WHEN bucket < 80 THEN 'train' ELSE 'test' END AS split,
         |    unnest(range(0, len(embedding)))::INT AS dim,
         |    CAST(round(unnest(embedding)::DOUBLE * 1000000) AS BIGINT) AS micro
         |  FROM f WHERE bucket < 80 OR bucket >= 90),
         |s AS (SELECT label, split, dim, count(*)::BIGINT AS n,
         |    sum(micro)::BIGINT AS sv FROM s0 GROUP BY 1, 2, 3),
         |tr AS (SELECT label, dim, n AS na, sv AS sa FROM s WHERE split = 'train'),
         |te AS (SELECT label, dim, n AS nb, sv AS sb FROM s WHERE split = 'test'),
         |p AS (SELECT label, na, nb,
         |    (nb::HUGEINT * sa::HUGEINT - na::HUGEINT * sb::HUGEINT) AS t
         |  FROM tr JOIN te USING (label, dim)),
         |g AS (SELECT label, max(na)::BIGINT AS n_train, max(nb)::BIGINT AS n_test,
         |    sum(t * t) AS num FROM p GROUP BY 1)
         |SELECT label, n_train, n_test, num::VARCHAR AS drift2_num,
         |  (floor((num::DOUBLE / (n_train::DOUBLE * n_test::DOUBLE
         |    * n_train::DOUBLE * n_test::DOUBLE * 1000000000000.0))
         |    * 100000000 + 0.5) / 100000000) AS drift2
         |FROM g""".stripMargin
    },

    "q163_assortativity" ->
      """WITH items AS (SELECT DISTINCT l_orderkey ok, l_partkey pk FROM lineitem),
        |e0 AS (SELECT DISTINCT x.pk a, y.pk b
        |  FROM items x JOIN items y ON x.ok = y.ok AND x.pk < y.pk),
        |und AS (SELECT a AS n, b AS m FROM e0
        |        UNION ALL SELECT b AS n, a AS m FROM e0),
        |deg AS (SELECT n, count(*) AS dg FROM und GROUP BY n),
        |j AS (SELECT dx.dg AS dx, dy.dg AS dy
        |  FROM und JOIN deg dx ON und.n = dx.n JOIN deg dy ON und.m = dy.n),
        |s AS (SELECT count(*) AS n_ends, sum(dx) AS sx, sum(dy) AS sy,
        |    sum(dx*dx) AS sxx, sum(dy*dy) AS syy, sum(dx*dy) AS sxy FROM j),
        |m AS (SELECT n_ends, (n_ends*sxy - sx*sy) AS num,
        |    (n_ends*sxx - sx*sx) AS dnx, (n_ends*syy - sy*sy) AS dny FROM s)
        |SELECT n_ends::BIGINT AS n_ends, num::VARCHAR AS r_num,
        |  dnx::VARCHAR AS r_den_x, dny::VARCHAR AS r_den_y,
        |  (floor((num::DOUBLE / (sqrt(dnx::DOUBLE) * sqrt(dny::DOUBLE)))
        |    * 1000000 + 0.5) / 1000000) AS assortativity
        |FROM m""".stripMargin,

    "q161_quantization_error" ->
      """WITH b AS (SELECT label, vec_id,
        |    list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
        |m AS (SELECT label, vec_id, v,
        |    list_max(list_transform(v, x -> abs(x))) AS maxabs FROM b),
        |e AS (SELECT label, vec_id, maxabs, unnest(v) AS x FROM m),
        |t AS (SELECT label, vec_id,
        |    CAST(round(x * 1000000) AS BIGINT) AS xm,
        |    CASE WHEN maxabs = 0 THEN 0
        |         ELSE CAST(round(x * 127 / maxabs) AS BIGINT) END AS q,
        |    CAST(round(maxabs * 1000000) AS BIGINT) AS sm
        |  FROM e),
        |r AS (SELECT label, vec_id, (xm - (q * sm) // 127) AS err FROM t),
        |pv AS (SELECT label, vec_id, sum(err * err)::BIGINT AS sse,
        |    max(abs(err))::BIGINT AS mx
        |  FROM r GROUP BY 1, 2)
        |SELECT label, count(*)::BIGINT AS n_vecs, sum(sse)::BIGINT AS sse_micro2,
        |  max(mx)::BIGINT AS max_abs_err_micro
        |FROM pv GROUP BY label""".stripMargin,

    "q155_weighted_median" ->
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
        |  min(cents)::BIGINT AS wmedian_cents
        |FROM c JOIN t USING (l_returnflag)
        |WHERE cum >= (total_weight + 1) // 2
        |GROUP BY c.l_returnflag, total_weight""".stripMargin,

    "q156_group_mode" ->
      """WITH counts AS (SELECT l_returnflag, l_linestatus,
        |    CAST(round(l_quantity) AS BIGINT) AS qty, count(*) AS cnt
        |  FROM lineitem GROUP BY 1, 2, 3),
        |r AS (SELECT l_returnflag, l_linestatus, qty, cnt,
        |    row_number() OVER (PARTITION BY l_returnflag, l_linestatus
        |                       ORDER BY cnt DESC, qty ASC) AS rn
        |  FROM counts)
        |SELECT l_returnflag, l_linestatus,
        |  max(CASE WHEN rn = 1 THEN qty END)::BIGINT AS mode_qty,
        |  max(CASE WHEN rn = 1 THEN cnt END)::BIGINT AS mode_cnt,
        |  count(*)::BIGINT AS n_distinct_values
        |FROM r GROUP BY 1, 2""".stripMargin,

    "q154_class_separation" ->
      """WITH ex AS (SELECT label,
        |    unnest(range(0, len(embedding)))::INT AS dim,
        |    CAST(round(unnest(embedding)::DOUBLE * 1000000) AS BIGINT) AS micro
        |  FROM embeddings),
        |s AS (SELECT label, dim, count(*)::BIGINT AS n, sum(micro)::BIGINT AS sv
        |  FROM ex GROUP BY 1, 2),
        |p AS (SELECT a.label AS la, b.label AS lb, a.n AS na, b.n AS nb,
        |    (b.n::HUGEINT * a.sv::HUGEINT - a.n::HUGEINT * b.sv::HUGEINT) AS t
        |  FROM s a JOIN s b ON a.dim = b.dim AND a.label < b.label),
        |g AS (SELECT la, lb, max(na)::BIGINT AS n_a, max(nb)::BIGINT AS n_b,
        |    sum(t * t) AS num
        |  FROM p GROUP BY 1, 2)
        |SELECT la, lb, n_a, n_b, num::VARCHAR AS dist2_num,
        |  (floor((num::DOUBLE / (n_a::DOUBLE * n_b::DOUBLE * n_a::DOUBLE * n_b::DOUBLE
        |    * 1000000000000.0)) * 100000000 + 0.5) / 100000000) AS dist2
        |FROM g""".stripMargin,

    "q152_autocorrelation" ->
      """WITH daily AS (SELECT ts::DATE AS day,
        |    sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS x
        |  FROM events WHERE value IS NOT NULL GROUP BY ts::DATE),
        |r AS (SELECT x, row_number() OVER (ORDER BY day) AS rn FROM daily),
        |lags AS (SELECT unnest(range(1, 8)) AS lag),
        |pairs AS (SELECT lags.lag, a.x AS x, b.x AS y
        |  FROM lags, r a, r b WHERE b.rn = a.rn + lags.lag),
        |s AS (SELECT lag, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
        |  FROM pairs GROUP BY lag),
        |m AS (SELECT lag, n, (n*sxy - sx*sy) AS num,
        |    (n*sxx - sx*sx) AS dx, (n*syy - sy*sy) AS dy
        |  FROM s)
        |SELECT lag::INT AS lag, n::BIGINT AS n,
        |  num::VARCHAR AS acf_num, dx::VARCHAR AS acf_den_x, dy::VARCHAR AS acf_den_y,
        |  (floor((num::DOUBLE / (sqrt(dx::DOUBLE) * sqrt(dy::DOUBLE))) * 1000000 + 0.5)
        |    / 1000000) AS acf
        |FROM m""".stripMargin,

    "q164_rolling_xcorr" ->
      """WITH ev AS (SELECT ts::DATE AS day, event_type,
        |    CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL),
        |daily AS (SELECT day,
        |    sum(CASE WHEN event_type = 'click' THEN c ELSE 0 END)::BIGINT AS x,
        |    sum(CASE WHEN event_type = 'purchase' THEN c ELSE 0 END)::BIGINT AS y
        |  FROM ev GROUP BY day),
        |r AS (SELECT day,
        |    count(*) OVER w AS n,
        |    sum(x) OVER w AS sx, sum(y) OVER w AS sy,
        |    sum(x*x) OVER w AS sxx, sum(y*y) OVER w AS syy,
        |    sum(x*y) OVER w AS sxy
        |  FROM daily
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
        |m AS (SELECT day, n, (n*sxy - sx*sy) AS num,
        |    (n*sxx - sx*sx) AS dx, (n*syy - sy*sy) AS dy FROM r)
        |SELECT day, n::BIGINT AS n, num::VARCHAR AS xc_num,
        |  CASE WHEN n < 5 OR dx = 0 OR dy = 0 THEN NULL
        |       ELSE floor((num::DOUBLE / (sqrt(dx::DOUBLE) * sqrt(dy::DOUBLE)))
        |              * 1000000 + 0.5) / 1000000 END AS xcorr
        |FROM m""".stripMargin,

    "q153_snm_evaluation" -> {
      val hs = s"list_distinct(list_transform(" +
        s"${TextHash.wordShinglesSql("text", 3)}, x -> ${TextHash.baseHashSql("x")}))"
      s"""WITH sets AS (SELECT doc_id, $hs AS hs FROM documents),
         |tok AS (SELECT doc_id, unnest(hs) AS h FROM sets),
         |bp AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS inter
         |  FROM tok x JOIN tok y ON x.h = y.h AND x.doc_id < y.doc_id
         |  GROUP BY 1, 2),
         |truth AS (SELECT id_a, id_b FROM bp
         |  JOIN (SELECT doc_id, len(hs) AS n FROM sets) sa ON sa.doc_id = id_a
         |  JOIN (SELECT doc_id, len(hs) AS n FROM sets) sb ON sb.doc_id = id_b
         |  WHERE inter * 5 >= 4 * (sa.n + sb.n - inter)),
         |nrm AS (SELECT doc_id,
         |    substr(regexp_replace(lower(text), '\\s+', ' ', 'g'), 1, 40) AS sk,
         |    list_sort(hs) AS hs
         |  FROM documents JOIN sets USING (doc_id)),
         |rk AS (SELECT doc_id, sk, substr(sk, 1, 6) AS block, hs,
         |        row_number() OVER (PARTITION BY substr(sk, 1, 6)
         |                           ORDER BY sk, doc_id) AS rn
         |      FROM nrm),
         |cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |        len(list_filter(a.hs, x -> list_contains(b.hs, x))) AS inter,
         |        len(a.hs) + len(b.hs) AS sz
         |      FROM rk a JOIN rk b ON a.block = b.block
         |                         AND b.rn - a.rn BETWEEN 1 AND 3),
         |c AS (SELECT count(*)::BIGINT AS n_candidates,
         |        sum(CASE WHEN inter * 5 >= 4 * (sz - inter) THEN 1 ELSE 0 END)::BIGINT
         |          AS n_found
         |      FROM cand),
         |t AS (SELECT count(*)::BIGINT AS n_truth FROM truth)
         |SELECT n_truth, n_candidates, n_found,
         |  ((n_found * 10000) // n_truth)::BIGINT AS recall_bp,
         |  ((n_found * 10000) // n_candidates)::BIGINT AS precision_bp
         |FROM c, t""".stripMargin
    },

    "q151_kmv_set_ops" -> {
      val h = kmvHashSql("user_id")
      s"""WITH dist AS (SELECT DISTINCT event_type, user_id FROM events),
         |hs AS (SELECT event_type, $h AS h FROM dist),
         |r AS (SELECT event_type, h,
         |        row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
         |      FROM hs),
         |sk AS (SELECT event_type, list(h ORDER BY h) AS hs
         |       FROM r WHERE rn <= $KmvK GROUP BY event_type),
         |p AS (SELECT x.event_type AS ta, y.event_type AS tb, x.hs AS ha, y.hs AS hb
         |      FROM sk x JOIN sk y ON x.event_type < y.event_type),
         |w AS (SELECT ta, tb, ha, hb,
         |        list_sort(list_distinct(ha || hb)) AS uni FROM p),
         |th AS (SELECT ta, tb, ha, hb, uni,
         |        CASE WHEN len(uni) >= $KmvK THEN uni[$KmvK] END AS theta FROM w),
         |cc AS (SELECT ta, tb, theta,
         |        len(list_filter(uni, x ->
         |          x < coalesce(theta, 9223372036854775807)
         |          AND list_contains(ha, x) AND list_contains(hb, x)))::BIGINT AS c
         |       FROM th),
         |e AS (SELECT a.event_type AS ta, b.event_type AS tb, count(*)::BIGINT AS n_common
         |      FROM dist a JOIN dist b
         |        ON a.user_id = b.user_id AND a.event_type < b.event_type
         |      GROUP BY 1, 2)
         |SELECT cc.ta, cc.tb, coalesce(n_common, 0)::BIGINT AS n_common,
         |  (CASE WHEN theta IS NULL THEN c
         |        ELSE (c * $KmvM) // theta END)::BIGINT AS est_common
         |FROM cc LEFT JOIN e ON e.ta = cc.ta AND e.tb = cc.tb""".stripMargin
    },

    "q212_k_anonymity" ->
      """WITH qi AS (SELECT c_nationkey AS nation, c_mktsegment AS segment,
        |        (CAST(round(c_acctbal * 100) AS BIGINT) // 100000) AS bal_band
        |      FROM customer),
        |g0 AS (SELECT nation, segment, bal_band, count(*)::BIGINT AS n
        |       FROM qi GROUP BY 1, 2, 3),
        |gen AS (SELECT nation, segment, sum(n)::BIGINT AS n_generalized
        |        FROM g0 WHERE n < 5 GROUP BY 1, 2)
        |SELECT g0.nation, g0.segment, g0.bal_band, g0.n,
        |  (g0.n < 5) AS generalized,
        |  (CASE WHEN g0.n >= 5 THEN g0.n
        |        ELSE coalesce(n_generalized, 0) END)::BIGINT AS anon_set,
        |  (CASE WHEN g0.n >= 5 THEN g0.n
        |        ELSE coalesce(n_generalized, 0) END) >= 5 AS meets_k
        |FROM g0 LEFT JOIN gen ON gen.nation = g0.nation
        |                     AND gen.segment = g0.segment""".stripMargin,

    "q303_k_anonymity" ->
      """WITH base AS (SELECT c_nationkey AS nat, n_regionkey AS reg,
        |    c_mktsegment AS seg,
        |    (CAST(round(c_acctbal * 100) AS BIGINT) // 10000) AS b100,
        |    (CAST(round(c_acctbal * 100) AS BIGINT) // 100000) AS b1000
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey),
        |cls AS (
        |  SELECT grouping_id(nat, seg, b100, b1000, reg) AS gid,
        |    count(*)::BIGINT AS cnt
        |  FROM base
        |  GROUP BY GROUPING SETS ((nat, seg, b100), (nat, seg, b1000),
        |    (reg, seg, b1000), (reg))),
        |lvl AS (
        |  SELECT (CASE gid WHEN 3 THEN 0 WHEN 5 THEN 1 WHEN 20 THEN 2
        |            ELSE 3 END)::INT AS level,
        |    count(*)::BIGINT AS n_classes, min(cnt)::BIGINT AS min_class,
        |    sum(CASE WHEN cnt < 10 THEN cnt ELSE 0 END)::BIGINT AS n_violating_rows
        |  FROM cls GROUP BY 1)
        |SELECT level, n_classes, min_class, n_violating_rows,
        |  (min_class >= 10) AS meets_k,
        |  (min_class >= 10 AND level =
        |     min(CASE WHEN min_class >= 10 THEN level END) OVER ()) AS chosen
        |FROM lvl""".stripMargin,

    "q219_l_diversity" ->
      """WITH sv AS (SELECT c_nationkey AS nation, c_mktsegment AS segment,
        |        (CAST(round(c_acctbal * 100) AS BIGINT) // 100000) AS band
        |      FROM customer),
        |g AS (SELECT nation, segment, band, count(*)::BIGINT AS c
        |      FROM sv GROUP BY 1, 2, 3)
        |SELECT nation, segment, sum(c)::BIGINT AS n,
        |  count(*)::BIGINT AS l_distinct,
        |  ((max(c) * 10000) // sum(c))::BIGINT AS top_share_bp,
        |  (count(*) >= 3) AS meets_l
        |FROM g GROUP BY 1, 2""".stripMargin,

    "q207_kmv_jaccard" -> {
      val hs = s"list_distinct(list_transform(" +
        s"${TextHash.wordShinglesSql("text", 3)}, x -> ${TextHash.baseHashSql("x")}))"
      val h = kmvHashSql("sv")
      s"""WITH sets AS (SELECT source, $hs AS hs FROM documents),
         |sh AS (SELECT DISTINCT source, unnest(hs) AS sv FROM sets),
         |hs0 AS (SELECT source, $h AS h FROM sh),
         |nn AS (SELECT source, count(*)::BIGINT AS n FROM sh GROUP BY source),
         |r AS (SELECT source, h,
         |        row_number() OVER (PARTITION BY source ORDER BY h) AS rn
         |      FROM hs0),
         |sk AS (SELECT source, list(h ORDER BY h) AS hs
         |       FROM r WHERE rn <= $KmvK GROUP BY source),
         |p AS (SELECT x.source AS sa, y.source AS sb, x.hs AS ha, y.hs AS hb
         |      FROM sk x JOIN sk y ON x.source < y.source),
         |w AS (SELECT sa, sb, ha, hb,
         |        list_sort(list_distinct(ha || hb)) AS uni FROM p),
         |th AS (SELECT sa, sb, ha, hb, uni,
         |        CASE WHEN len(uni) >= $KmvK THEN uni[$KmvK] END AS theta FROM w),
         |cc AS (SELECT sa, sb,
         |        CASE WHEN theta IS NULL THEN len(uni)
         |             ELSE ${KmvK - 1} END AS samp,
         |        len(list_filter(uni, x ->
         |          x < coalesce(theta, 9223372036854775807)
         |          AND list_contains(ha, x) AND list_contains(hb, x)))::BIGINT AS c
         |       FROM th),
         |i AS (SELECT a.source AS sa, b.source AS sb, count(*)::BIGINT AS inter
         |      FROM sh a JOIN sh b ON a.sv = b.sv AND a.source < b.source
         |      GROUP BY 1, 2)
         |SELECT cc.sa, cc.sb,
         |  coalesce(inter, 0)::BIGINT AS n_inter,
         |  (na.n + nb.n - coalesce(inter, 0))::BIGINT AS n_union,
         |  (CASE WHEN na.n + nb.n - coalesce(inter, 0) > 0
         |    THEN (coalesce(inter, 0) * 10000) // (na.n + nb.n - coalesce(inter, 0))
         |    ELSE 0 END)::BIGINT AS exact_j_bp,
         |  (CASE WHEN samp > 0 THEN (c * 10000) // samp ELSE 0 END)::BIGINT AS est_j_bp
         |FROM cc
         |JOIN nn na ON na.source = cc.sa
         |JOIN nn nb ON nb.source = cc.sb
         |LEFT JOIN i ON i.sa = cc.sa AND i.sb = cc.sb""".stripMargin
    },

    "q149_expectation_suite" ->
      """WITH n AS (SELECT count(*)::BIGINT AS n_rows FROM orders),
        |r AS (
        |  SELECT 'not_null_custkey' AS rule,
        |    sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS violations
        |  FROM orders
        |  UNION ALL SELECT 'status_in_set',
        |    sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END)::BIGINT
        |  FROM orders
        |  UNION ALL SELECT 'priority_pattern',
        |    sum(CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-5]-')
        |             THEN 1 ELSE 0 END)::BIGINT
        |  FROM orders
        |  UNION ALL SELECT 'totalprice_range',
        |    sum(CASE WHEN round(o_totalprice * 100)::BIGINT NOT BETWEEN 1 AND 1000000000
        |             THEN 1 ELSE 0 END)::BIGINT
        |  FROM orders
        |  UNION ALL SELECT 'date_range',
        |    sum(CASE WHEN o_orderdate::DATE NOT BETWEEN DATE '1992-01-01'
        |                                            AND DATE '1998-12-31'
        |             THEN 1 ELSE 0 END)::BIGINT
        |  FROM orders
        |  UNION ALL SELECT 'unique_orderkey',
        |    (count(*) - count(DISTINCT o_orderkey))::BIGINT
        |  FROM orders)
        |SELECT rule, violations, n_rows, (violations = 0) AS passed
        |FROM r, n""".stripMargin,

    "q150_drift_tvd" -> {
      val h = TextHash.md5LongSql("doc_id::VARCHAR")
      s"""WITH b AS (SELECT source, ($h % 100) AS bucket, n_chars // 500 AS bin
         |  FROM documents),
         |f AS (SELECT source, CASE WHEN bucket < 80 THEN 'train' ELSE 'test' END
         |        AS split, bin
         |  FROM b WHERE bucket < 80 OR bucket >= 90),
         |u AS (SELECT 'ALL' AS source, split, bin FROM f
         |      UNION ALL SELECT source, split, bin FROM f),
         |c AS (SELECT source, bin,
         |        sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END)::BIGINT AS ctr,
         |        sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END)::BIGINT AS cte
         |      FROM u GROUP BY 1, 2),
         |t AS (SELECT source, sum(ctr)::BIGINT AS n_train, sum(cte)::BIGINT AS n_test,
         |        count(*)::BIGINT AS n_bins
         |      FROM c GROUP BY 1)
         |SELECT c.source, n_train, n_test, n_bins,
         |  (CASE WHEN n_train = 0 OR n_test = 0 THEN NULL
         |        ELSE (sum(abs(ctr * n_test - cte * n_train))::BIGINT * 1000000)
         |             // (2 * n_train * n_test) END)::BIGINT AS tvd_micro
         |FROM c JOIN t USING (source)
         |GROUP BY c.source, n_train, n_test, n_bins""".stripMargin
    },

    "q146_stl_anomaly" ->
      """WITH daily AS (SELECT ts::DATE AS day,
        |    sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS cents
        |  FROM events WHERE value IS NOT NULL GROUP BY ts::DATE),
        |tr AS (SELECT day, cents,
        |    list_sort(list(cents) OVER (ORDER BY day
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) AS arr
        |  FROM daily),
        |t AS (SELECT day, cents,
        |    (arr[(len(arr) + 1) // 2]::DOUBLE + arr[len(arr) // 2 + 1]::DOUBLE) / 2
        |      AS trend,
        |    ((day - DATE '1970-01-01') + 3) % 7 AS dow
        |  FROM tr),
        |dt AS (SELECT day, cents, trend, dow, cents::DOUBLE - trend AS detr FROM t),
        |se AS (SELECT dow, list_sort(list(detr)) AS sarr FROM dt GROUP BY dow),
        |sm AS (SELECT dow,
        |    (sarr[(len(sarr) + 1) // 2] + sarr[len(sarr) // 2 + 1]) / 2 AS seasonal
        |  FROM se),
        |res AS (SELECT day, cents, trend, seasonal, (detr - seasonal) AS residual
        |  FROM dt JOIN sm ON dt.dow = sm.dow),
        |ma AS (SELECT list_sort(list(residual)) AS sa FROM res),
        |m AS (SELECT (sa[(len(sa) + 1) // 2] + sa[len(sa) // 2 + 1]) / 2
        |        AS resid_med FROM ma),
        |ad AS (SELECT res.*, resid_med, abs(residual - resid_med) AS absdev
        |  FROM res, m),
        |mada AS (SELECT list_sort(list(absdev)) AS sa FROM ad),
        |md AS (SELECT (sa[(len(sa) + 1) // 2] + sa[len(sa) // 2 + 1]) / 2
        |        AS mad FROM mada)
        |SELECT day, cents, trend, seasonal, residual, resid_med, mad,
        |  (absdev > 3 * mad) AS is_anomaly
        |FROM ad, md""".stripMargin,

    "q145_benford" ->
      s"""WITH c AS (SELECT o_orderpriority AS priority,
         |             round(o_totalprice * 100)::BIGINT AS cents FROM orders),
         |dg AS (SELECT priority, substr(cents::VARCHAR, 1, 1)::INT AS digit FROM c),
         |a AS (SELECT priority, digit, count(*)::BIGINT AS n FROM dg GROUP BY 1, 2),
         |t AS (SELECT priority, count(*)::BIGINT AS total FROM dg GROUP BY 1)
         |SELECT priority, digit, n,
         |  ((n * 10000) // total)::BIGINT AS share_bp,
         |  ($benfordCaseSql)::BIGINT AS expected_bp,
         |  ((n * 10000) // total - $benfordCaseSql)::BIGINT AS dev_bp
         |FROM a JOIN t USING (priority)""".stripMargin,
  )
}
