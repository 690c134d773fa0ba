package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.functions.TextHash

class AuditQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val tiny = "/root/testdata/sf0.001"
  private val small = "/root/testdata/sf0.01"

  test("q143 KMV: exact regime (n < k) returns the exact count") {
    val rows = AuditQueries.queries("q143_kmv_distinct")(spark, tiny).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (n, est) = (r.getLong(1), r.getLong(3))
      assert(n < 128, "sf0.001 should be in the exact regime")
      assert(est == n, s"${r.getString(0)}: exact-regime estimate must equal n")
      assert(r.isNullAt(2), "kth_min must be NULL when the sketch holds all hashes")
    }
  }

  test("q143 KMV: estimator regime is close and the merge is lossless") {
    val rows = AuditQueries.queries("q143_kmv_distinct")(spark, small).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    val (nAll, estAll) = rows("ALL")
    assert(nAll >= 128, "sf0.01 should be in the estimator regime")
    // k=128 ⇒ stderr ~ 1/sqrt(k-1) ≈ 8.9%; deterministic data, generous gate
    assert(math.abs(estAll - nAll).toDouble / nAll < 0.3,
      s"ALL estimate $estAll too far from exact $nAll")

    // Merge losslessness: the k smallest GLOBAL distinct hashes each rank
    // <= k inside their own type's sketch, so the union of per-type
    // bottom-k sets contains the global bottom-k and the merged estimate
    // must EQUAL a single sketch built over all distinct users directly.
    val direct = Tables.events(spark, small).select(col("user_id")).distinct()
      .withColumn("h",
        pmod(TextHash.md5Long(concat(lit("kmv:"), col("user_id").cast("string"))),
          lit(9007199254740992L)))
      .orderBy(col("h")).limit(128).collect().map(_.getLong(1))
    val directEst =
      if (direct.length < 128) direct.length.toLong
      else 127L * 9007199254740992L / direct.last
    assert(estAll == directEst, "merged sketch must equal the direct global sketch")
  }

  test("q144 SNM finds the planted near-dups and reports exact Jaccard") {
    val out = AuditQueries.queries("q144_snm_dedup")(spark, tiny).collect()
    assert(out.length > 10, "planted near-dup pairs should surface at sf0.001")
    // recompute each reported pair's Jaccard from the raw shingle sets
    val hs = Tables.documents(spark, tiny).select(col("doc_id"),
      graft.functions.VectorExpressions
        .wordShingleHashes(col("text"), 3, TextHash.P).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    for (r <- out) {
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(a != b)
      val inter = (hs(a) & hs(b)).size.toLong
      val uni = (hs(a) | hs(b)).size.toLong
      assert(r.getLong(2) == inter, s"pair ($a,$b) intersection")
      assert(r.getLong(3) == uni, s"pair ($a,$b) union")
      assert(r.getDouble(4) == math.floor(inter.toDouble / uni * 10000 + 0.5) / 10000)
      assert(r.getDouble(4) >= 0.5)
    }
  }

  test("q146 anomaly flag is consistent with its own reported robust stats") {
    val rows = AuditQueries.queries("q146_stl_anomaly")(spark, small).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (cents, trend, seasonal, resid) =
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      // exact decomposition: residual = cents - trend - seasonal
      assert(resid == cents.toDouble - trend - seasonal)
      val (med, mad, flag) = (r.getDouble(5), r.getDouble(6), r.getBoolean(7))
      assert(flag == (math.abs(resid - med) > 3 * mad))
    }
    // the robust stats are global constants across rows
    assert(rows.map(_.getDouble(5)).distinct.length == 1)
    assert(rows.map(_.getDouble(6)).distinct.length == 1)
  }

  test("q151 KMV intersection: exact regime equals truth, estimator is close") {
    // sf0.001: every set < k, theta NULL -> estimate must equal exact overlap
    val exactRegime = AuditQueries.queries("q151_kmv_set_ops")(spark, tiny).collect()
    assert(exactRegime.nonEmpty)
    for (r <- exactRegime)
      assert(r.getLong(3) == r.getLong(2), s"${r.getString(0)}x${r.getString(1)}")
    // sf0.01: estimator regime, k=128 sample -> generous 35% gate
    val est = AuditQueries.queries("q151_kmv_set_ops")(spark, small).collect()
    assert(est.length == 10, "5 event types -> 10 unordered pairs")
    for (r <- est) {
      val (n, e) = (r.getLong(2), r.getLong(3))
      assert(n > 0 && math.abs(e - n).toDouble / n < 0.35,
        s"${r.getString(0)}x${r.getString(1)}: est $e vs exact $n")
    }
  }

  test("q150 TVD agrees with a direct per-source recomputation") {
    val out = AuditQueries.queries("q150_drift_tvd")(spark, small).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
    assert(out.contains("ALL"))
    // recompute from the raw table with the same split + binning
    val docs = Tables.documents(spark, small)
      .select(col("doc_id"), col("source"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def bucket(id: Long) = graft.functions.Md5LongUtil.hashBytes(
      id.toString.getBytes("UTF-8")) % 100
    val split = docs.flatMap { case (id, src, nc) =>
      val b = bucket(id)
      if (b < 80) Some((src, "train", nc / 500))
      else if (b >= 90) Some((src, "test", nc / 500))
      else None
    }
    val bySrc = split.groupBy(_._1)
    for ((src, rows) <- bySrc) {
      val tr = rows.filter(_._2 == "train").groupBy(_._3).view.mapValues(_.length.toLong).toMap
      val te = rows.filter(_._2 == "test").groupBy(_._3).view.mapValues(_.length.toLong).toMap
      val (nTr, nTe) = (tr.values.sum, te.values.sum)
      val expected =
        if (nTr == 0 || nTe == 0) None
        else {
          val num = (tr.keySet ++ te.keySet).toSeq
            .map(b => math.abs(tr.getOrElse(b, 0L) * nTe - te.getOrElse(b, 0L) * nTr)).sum
          Some(num * 1000000L / (2 * nTr * nTe))
        }
      assert(out(src) == ((nTr, nTe, expected)), s"source $src")
    }
  }

  test("q162/q163 structural laws: drift >= 0, assortativity symmetric and bounded") {
    val drift = AuditQueries.queries("q162_split_drift")(spark, small).collect()
    assert(drift.length == 10)
    for (r <- drift) {
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
      assert(BigInt(r.getString(3)) >= 0)
      assert(r.getDouble(4) >= 0.0)
    }
    val a = AuditQueries.queries("q163_assortativity")(spark, small).collect().head
    // doubled-edge formulation: both endpoint-degree marginals are the
    // SAME multiset, so the two denominators must be identical and the
    // edge-end count even
    assert(a.getLong(0) % 2 == 0)
    assert(a.getString(2) == a.getString(3), "denominators must be symmetric")
    assert(math.abs(a.getDouble(4)) <= 1.0)
  }

  test("q161 quantization error respects the half-step theoretical bound") {
    val rows = AuditQueries.queries("q161_quantization_error")(spark, small).collect()
    assert(rows.length == 10)
    // per-coordinate error of a symmetric int8 quantizer is at most half a
    // quantization step (scale/127/2 = scale/254) plus one micro of
    // round-off on each of the two integer roundings
    val maxScaleMicro = Tables.embeddings(spark, small)
      .select(graft.functions.PortableMath.microHalfAway(
        array_max(transform(graft.operators.VectorOps.asDouble(col("embedding")),
          x => abs(x)))).as("sm"))
      .agg(max(col("sm"))).collect().head.getLong(0)
    val bound = maxScaleMicro / 254 + 2
    for (r <- rows) {
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
      assert(r.getLong(3) <= bound,
        s"label ${r.getInt(0)}: max err ${r.getLong(3)} > bound $bound")
    }
  }

  test("q154 centroid distances match a pure-Scala recomputation") {
    val out = AuditQueries.queries("q154_class_separation")(spark, tiny).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), BigInt(r.getString(4))))).toMap
    assert(out.size == 45, "10 labels -> 45 unordered pairs")
    val vecs = Tables.embeddings(spark, tiny)
      .select(col("label"), graft.operators.VectorOps.asDouble(col("embedding")))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
    val byLabel = vecs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    for (((la, lb), (na, nb, num)) <- out) {
      val (va, vb) = (byLabel(la), byLabel(lb))
      assert(na == va.length && nb == vb.length)
      val dims = va.head.length
      val expected = (0 until dims).map { d =>
        val sa = va.map(v => BigInt(graft.operators.KMeansIVF.roundHalfAway(v(d) * 1e6))).sum
        val sb = vb.map(v => BigInt(graft.operators.KMeansIVF.roundHalfAway(v(d) * 1e6))).sum
        val t = BigInt(nb) * sa - BigInt(na) * sb
        t * t
      }.sum
      assert(num == expected, s"pair ($la,$lb)")
    }
  }

  test("q152 ACF numerators satisfy Cauchy-Schwarz and |acf| <= 1") {
    val rows = AuditQueries.queries("q152_autocorrelation")(spark, small).collect()
    assert(rows.map(_.getInt(0)).sorted.toSeq == (1 to 7))
    for (r <- rows) {
      val (num, dx, dy) =
        (BigInt(r.getString(2)), BigInt(r.getString(3)), BigInt(r.getString(4)))
      assert(dx > 0 && dy > 0)
      assert(num * num <= dx * dy, s"lag ${r.getInt(0)}: Cauchy-Schwarz violated")
      assert(math.abs(r.getDouble(5)) <= 1.0)
    }
    // consecutive lags shrink the pair count by exactly one day
    val ns = rows.sortBy(_.getInt(0)).map(_.getLong(1))
    for (i <- 1 until ns.length) assert(ns(i) == ns(i - 1) - 1)
  }

  test("q153 found pairs are a subset of truth (recall <= 100%)") {
    for (dir <- Seq(tiny, small)) {
      val r = AuditQueries.queries("q153_snm_evaluation")(spark, dir).collect().head
      val (nTruth, nCand, nFound) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(nTruth > 0 && nCand > 0)
      assert(nFound <= nTruth && nFound <= nCand)
      assert(r.getLong(3) == nFound * 10000 / nTruth)
      assert(r.getLong(4) == nFound * 10000 / nCand)
    }
  }

  test("q145 Benford shares are a partition of each priority class") {
    val rows = AuditQueries.queries("q145_benford")(spark, tiny).collect()
    assert(rows.nonEmpty)
    val expected = Map(1 -> 3010L, 2 -> 1761L, 3 -> 1249L, 4 -> 969L,
      5 -> 792L, 6 -> 669L, 7 -> 580L, 8 -> 512L, 9 -> 458L)
    for (r <- rows) {
      val d = r.getInt(1)
      assert(d >= 1 && d <= 9)
      assert(r.getLong(4) == expected(d))
      assert(r.getLong(5) == r.getLong(3) - r.getLong(4))
    }
    // per priority: floor-div shares sum to within 9 bp of exactly 10^4
    val byPrio = rows.groupBy(_.getString(0))
    for ((p, rs) <- byPrio) {
      val s = rs.map(_.getLong(3)).sum
      assert(s > 10000 - 9 && s <= 10000, s"priority $p share sum $s")
    }
  }

  test("q246 HLL: estimate within sketch stderr; merge = direct global sketch") {
    // columns: grp, n_exact, v_zero, sum_scaled, est_hll
    val rows = AuditQueries.queries("q246_hll_registers")(spark, small).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val (nAll, _, sAll, estAll) = rows("ALL")
    // m=64 ⇒ stderr ≈ 1.04/√64 = 13%; deterministic data, 4σ gate
    // (sf0.01 has ~150 users — whichever branch fires must land close)
    assert(math.abs(estAll - nAll).toDouble / nAll < 0.52,
      s"ALL estimate $estAll too far from exact $nAll")

    // Raw-estimator branch accuracy on a synthetic 5000-id universe
    // (well past the 5m/2 = 160 linear-counting cutoff).
    val syn = spark.range(5000)
      .withColumn("h",
        TextHash.md5Long(concat(lit("hll:"), col("id").cast("string"))))
      .select((col("h") % 64).as("b"), expr("(h div 64) % 4294967296").as("st"))
      .withColumn("rho", when(col("st") === 0, lit(33L))
        .otherwise(lit(33L) - length(bin(col("st")))))
      .groupBy("b").agg(max("rho").as("m"))
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(33 - m AS INT))"))
        .as("s"), count(lit(1)).as("nb"))
      .collect().head
    val sSyn = syn.getLong(0) + (64 - syn.getLong(1)) * 8589934592L
    val rawSyn = 24957716092920L / sSyn
    assert(math.abs(rawSyn - 5000).toDouble / 5000 < 0.52,
      s"raw-branch estimate $rawSyn too far from 5000")

    // Register-wise-max merge must equal the sketch built over all users
    // directly (same registers ⇒ same harmonic sum).
    val direct = Tables.events(spark, small).select(col("user_id")).distinct()
      .withColumn("h",
        TextHash.md5Long(concat(lit("hll:"), col("user_id").cast("string"))))
      .select((col("h") % 64).as("b"), expr("(h div 64) % 4294967296").as("st"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val reg = direct.groupBy(_._1).map { case (b, xs) =>
      b -> xs.map { case (_, st) =>
        if (st == 0L) 33L else 33L - java.lang.Long.toBinaryString(st).length
      }.max
    }
    val sDirect = (0L until 64L).map(b => 1L << (33L - reg.getOrElse(b, 0L)).toInt).sum
    assert(sAll == sDirect, "merged harmonic sum must equal the direct sketch's")
  }

  test("q246 HLL: linear-counting branch fires in the small regime and is exact LUT math") {
    val rows = AuditQueries.queries("q246_hll_registers")(spark, tiny).collect()
    val lut = Array(266L, 222, 196, 177, 163, 151, 142, 133, 126, 119, 113,
      107, 102, 97, 93, 89, 85, 81, 78, 74, 71, 68, 65, 63, 60, 58, 55, 53,
      51, 48, 46, 44, 42, 40, 39, 37, 35, 33, 32, 30, 28, 27, 25, 24, 23,
      21, 20, 18, 17, 16, 15, 13, 12, 11, 10, 9, 7, 6, 5, 4, 3, 2, 1, 0)
    var lcSeen = false
    for (r <- rows) {
      val (n, v, sScaled, est) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val raw = 24957716092920L / sScaled
      if (v > 0 && raw <= 160) {
        lcSeen = true
        assert(est == lut(v.toInt - 1), s"${r.getString(0)}: LC LUT mismatch")
        // linear counting is tight at low occupancy
        assert(math.abs(est - n).toDouble / math.max(n, 1L) < 0.35,
          s"${r.getString(0)}: LC estimate $est far from exact $n")
      }
    }
    assert(lcSeen, "sf0.001 should exercise the linear-counting branch")
  }

  test("q263 A/B test: exact z2 replay; degenerate splits are never significant") {
    val r = AuditQueries.queries("q263_ab_test")(spark, small).collect().head
    val (n1, c1, n2, c2) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    def md5l(s: String) = graft.functions.Md5LongUtil.hashBytes(s.getBytes("UTF-8"))
    // direct replay of arms + conversions
    val conv = Tables.events(spark, small)
      .groupBy(col("user_id"))
      .agg(max((col("event_type") === "purchase" && col("value") > 150)
        .cast("long")).as("c"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val (ctrl, treat) = conv.partition { case (u, _) => md5l("ab:" + u) % 2 == 0 }
    assert(n1 == ctrl.length.toLong && c1 == ctrl.map(_._2).sum)
    assert(n2 == treat.length.toLong && c2 == treat.map(_._2).sum)
    assert(c1 > 0 && c1 < n1 && c2 > 0 && c2 < n2, "metric must be non-degenerate")
    val num = BigInt(c1 * n2 - c2 * n1).pow(2) * (n1 + n2)
    val den = BigInt(n1) * n2 * (c1 + c2) * (n1 + n2 - c1 - c2)
    assert(BigInt(r.getString(4)) == num && BigInt(r.getString(5)) == den)
    assert(r.getBoolean(6) == (num * 10000 >= den * 38415))
    // a same-rate null split (the hash split IS one) should rarely flag;
    // and the degenerate gate: den = 0 must force significant_95 = false
    val (zn, zd) = (BigInt(0), BigInt(0))
    assert(!(zd > 0 && zn * 10000 >= zd * 38415), "den=0 must never claim significance")
  }

  test("q271 bootstrap: Poisson(1) threshold draw has the right law; CI is consistent") {
    val r = AuditQueries.queries("q271_bootstrap_ci")(spark, small).collect().head
    val (nReps, point, lo, hi, covers) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))
    assert(nReps == 40 && lo <= hi)
    assert(covers == (lo <= 0 && hi >= 0))
    // the full-sample point estimate equals a direct recompute
    def md5l(s: String) = graft.functions.Md5LongUtil.hashBytes(s.getBytes("UTF-8"))
    val conv = Tables.events(spark, small).groupBy(col("user_id"))
      .agg(max((col("event_type") === "purchase" && col("value") > 150)
        .cast("long")).as("c"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val (a1, a2) = conv.partition { case (u, _) => md5l("ab:" + u) % 2 == 0 }
    val want = (a2.map(_._2).sum * a1.length - a1.map(_._2).sum * a2.length) * 10000L /
      (a1.length.toLong * a2.length)
    assert(point == want)
    // law of the threshold draw over 20k synthetic uniforms:
    // P(w=0) = P(w=1) = e^-1 = .3679, E[w] = 1
    val ts = Seq(3313563428353948L, 6627126856707896L, 8283908570884870L,
      8836169142277195L, 8974234285125276L, 9001847313694892L,
      9006449485123161L, 9007106938184342L, 9007189119816990L)
    val ws = (0 until 20000).map { i =>
      val u = md5l("law:" + i) % 9007199254740992L
      ts.count(u >= _)
    }
    val p0 = ws.count(_ == 0).toDouble / ws.length
    val p1 = ws.count(_ == 1).toDouble / ws.length
    val mean = ws.sum.toDouble / ws.length
    assert(math.abs(p0 - 0.3679) < 0.02 && math.abs(p1 - 0.3679) < 0.02)
    assert(math.abs(mean - 1.0) < 0.03)
  }

  test("q268 Theil-Sen: median of pairwise slopes matches a direct recompute") {
    val r = AuditQueries.queries("q268_theil_sen")(spark, small).collect().head
    val daily = Tables.events(spark, small).filter(col("value").isNotNull)
      .groupBy(datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
        .cast("long").as("i"))
      .agg(sum(round(col("value") * 100).cast("long")).as("y"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1)
    val slopes = (for {
      a <- daily.indices; b <- daily.indices if daily(a)._1 < daily(b)._1
    } yield {
      val num = (daily(b)._2 - daily(a)._2) * 1000000L
      val d = daily(b)._1 - daily(a)._1
      // Spark/DuckDB div truncates toward zero
      num / d
    }).sorted
    val n = slopes.length
    assert(r.getLong(0) == n.toLong)
    val med2 = slopes((n + 1) / 2 - 1) + slopes(n / 2)
    assert(r.getLong(1) == med2, "bracketing order statistics")
  }

  test("q269 MASE: pooled row sums per-type rows; errors replay directly") {
    val rows = AuditQueries.queries("q269_forecast_mase")(spark, small).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    val per = rows.view.filterKeys(_ != "ALL").values.toSeq
    val (nA, fA, nvA) = rows("ALL")
    assert(per.map(_._1).sum == nA && per.map(_._2).sum == fA && per.map(_._3).sum == nvA)
    assert(nA > 0, "a month of daily data must leave eval days past lag 7")
  }

  test("q265 CUPED: theta and the adjusted diff replay exactly in BigInt") {
    val r = AuditQueries.queries("q265_cuped")(spark, small).collect().head
    def md5l(s: String) = graft.functions.Md5LongUtil.hashBytes(s.getBytes("UTF-8"))
    val perUser = Tables.events(spark, small)
      .select(col("user_id"), col("ts").cast("date").cast("string").as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
      .groupBy(_._1).map { case (u, evs) =>
        val x = evs.filter(_._2 < "2024-01-16").map(_._3).sum
        val y = evs.filter(_._2 >= "2024-01-16").map(_._3).sum
        (u, x, y, md5l("ab:" + u) % 2 == 0)
      }.toSeq
    val n = BigInt(perUser.size)
    val (sx, sy) = (BigInt(perUser.map(_._2).sum), BigInt(perUser.map(_._3).sum))
    val sxx = perUser.map(u => BigInt(u._2) * u._2).sum
    val sxy = perUser.map(u => BigInt(u._2) * u._3).sum
    val thetaN = n * sxy - sx * sy
    val thetaD = n * sxx - sx * sx
    assert(BigInt(r.getString(2)) == thetaN && BigInt(r.getString(3)) == thetaD)
    val ctrl = perUser.filter(_._4); val treat = perUser.filterNot(_._4)
    val (n1, n2) = (BigInt(ctrl.size), BigInt(treat.size))
    assert(r.getLong(0) == n1.toLong && r.getLong(1) == n2.toLong)
    val rawDy = BigInt(treat.map(_._3).sum) * n1 - BigInt(ctrl.map(_._3).sum) * n2
    val rawDx = BigInt(treat.map(_._2).sum) * n1 - BigInt(ctrl.map(_._2).sum) * n2
    assert(BigInt(r.getString(4)) == rawDy)
    val (adjN, adjD) = (BigInt(r.getString(5)), BigInt(r.getString(6)))
    // the CUPED identity, cross-multiplied: adjN/adjD == Δy − θ·Δx
    assert(adjN == rawDy * thetaD - thetaN * rawDx)
    assert(adjD == n1 * n2 * thetaD)
  }

  test("q261 sketch rollup: day-merged registers equal the direct weekly sketch") {
    // the oracle already proves this cross-engine; here the same law is
    // checked in-process — merging DAILY register maxima equals building
    // weekly registers directly from the distinct pairs
    val rows = AuditQueries.queries("q261_sketch_rollup")(spark, small).collect()
    assert(rows.nonEmpty)
    def md5l(s: String) = graft.functions.Md5LongUtil.hashBytes(s.getBytes("UTF-8"))
    val raw = Tables.events(spark, small)
      .select(col("event_type"), weekofyear(col("ts")).cast("long"),
        to_date(col("ts")).cast("string"), col("user_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    def regsOf(keys: Iterable[Long]): Map[Long, Long] =
      keys.toSet[Long].groupBy { u => md5l("hll:" + u) % 64 }.view.mapValues { us =>
        us.map { u =>
          val st = (md5l("hll:" + u) / 64) % 4294967296L
          if (st == 0L) 33L else 33L - java.lang.Long.toBinaryString(st).length
        }.max
      }.toMap
    for ((grp, week) <- raw.map(r => (r._1, r._2)).distinct) {
      val weekKeys = raw.filter(r => r._1 == grp && r._2 == week).map(_._4)
      val direct = regsOf(weekKeys)
      // day-level registers merged by max
      val byDay = raw.filter(r => r._1 == grp && r._2 == week).groupBy(_._3)
      val merged = byDay.values.map(ds => regsOf(ds.map(_._4)))
        .reduce { (a, b) =>
          (a.keySet ++ b.keySet).map(k =>
            k -> math.max(a.getOrElse(k, 0L), b.getOrElse(k, 0L))).toMap
        }
      assert(merged == direct, s"($grp, $week): merge must equal direct")
    }
    // and the emitted estimates are inside a generous sketch error band
    for (r <- rows) {
      val (n, est) = (r.getLong(2), r.getLong(5))
      assert(n > 0 && math.abs(est - n).toDouble / n < 0.6,
        s"${r.getString(0)} w${r.getLong(1)}: est $est vs $n")
    }
  }

  test("q248 DP counts: noise replays exactly; distribution is the p=1/2 discrete Laplace") {
    def md5l(s: String) = graft.functions.Md5LongUtil.hashBytes(s.getBytes("UTF-8"))
    def tz(h: Long) = if (h == 0L) 60L
      else java.lang.Long.toBinaryString(h & -h).length.toLong - 1L
    val rows = AuditQueries.queries("q248_dp_counts")(spark, small).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (src, n, noise, rel) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(noise == tz(md5l("dpa:" + src)) - tz(md5l("dpb:" + src)),
        s"$src noise replay")
      assert(rel == math.max(n + noise, 0L), s"$src clamp")
    }
    // mechanism distribution over 4096 synthetic keys: mean ~0 (E=0,
    // Var=4 => stderr of the mean = 2/64), P(noise=0) = 1/3
    val sample = (0 until 4096).map { i =>
      tz(md5l("dpa:k" + i)) - tz(md5l("dpb:k" + i))
    }
    val mean = sample.sum.toDouble / sample.length
    assert(math.abs(mean) < 0.15, s"noise mean $mean")
    val p0 = sample.count(_ == 0L).toDouble / sample.length
    assert(math.abs(p0 - 1.0 / 3.0) < 0.04, s"P(noise=0) = $p0, expect 1/3")
  }

  test("q255 ARI matches a direct BigInt recompute; identical partitions give 1") {
    val r = AuditQueries.queries("q255_ari_agreement")(spark, small).collect().head
    val labels = Tables.documents(spark, small).select(col("source"), col("lang"))
      .collect().map(x => (x.getString(0), x.getString(1)))
    def c2(x: Long) = BigInt(x) * (x - 1) / 2
    val cells = labels.groupBy(identity).view.mapValues(_.length.toLong)
    val aM = labels.groupBy(_._1).view.mapValues(_.length.toLong)
    val bM = labels.groupBy(_._2).view.mapValues(_.length.toLong)
    val (i, a, b, n) = (cells.values.map(c2).sum, aM.values.map(c2).sum,
      bM.values.map(c2).sum, labels.length.toLong)
    val t = c2(n)
    val num = 2 * (t * i - a * b)
    val den = t * (a + b) - 2 * a * b
    assert(BigInt(r.getString(4)) == num && BigInt(r.getString(5)) == den)
    val ari = r.getDouble(6)
    assert(math.abs(ari - (num.toDouble / den.toDouble)) < 1e-6)
    assert(ari > -0.5 && ari < 1.0)
    // identity law on the cleared formula: X vs X has I = A = B => ARI = 1
    val (ii, aa, bb) = (a, a, a)
    assert(2 * (t * ii - aa * bb) == t * (aa + bb) - 2 * aa * bb)
  }

  test("q256 KS drift matches a direct recompute per source") {
    val rows = AuditQueries.queries("q256_ks_drift")(spark, small).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val docs = Tables.documents(spark, small).select(col("source"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val nTot = docs.length.toLong
    val values = docs.map(_._2).distinct.sorted
    for ((src, (nS, nT, ksNum, ksPpm)) <- rows) {
      assert(nT == nTot)
      val mine = docs.filter(_._1 == src).map(_._2)
      assert(nS == mine.length.toLong)
      val want = values.map { v =>
        val cumS = mine.count(_ <= v).toLong
        val cumG = docs.count(_._2 <= v).toLong
        math.abs(cumS * nTot - cumG * nS)
      }.max
      assert(ksNum == want, s"$src ks numerator")
      assert(ksPpm == want * 1000000L / (nS * nTot))
      assert(ksPpm >= 0 && ksPpm <= 1000000L)
    }
  }
}
