package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.RelationalQueries

/** Relational-surface details not covered by the oracle gate. */
class RelationalQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("approx_percentile scale path tracks exact percentiles within 2%") {
    val exact = RelationalQueries.queries("q31_percentiles")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = RelationalQueries.approxPercentiles(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(approx.keySet == exact.keySet)
    for ((flag, (m, p95, mp)) <- exact) {
      val (am, ap95, amp) = approx(flag)
      def close(a: Double, e: Double) = math.abs(a - e) <= math.max(0.02 * math.abs(e), 1e-9)
      assert(close(am, m) && close(ap95, p95) && close(amp, mp),
        s"$flag: approx ($am,$ap95,$amp) vs exact ($m,$p95,$mp)")
    }
  }

  test("q32 tolerance boolean is TRUE on every group (sketch within 10%)") {
    val rows = RelationalQueries.queries("q32_approx_distinct")(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(2)), "HLL++ estimate strayed past 10% of exact")
  }

  test("q32 exposes exact counts, not the sketch value") {
    val df = RelationalQueries.queries("q32_approx_distinct")(spark, dir)
    assert(df.columns.toSeq == Seq("l_returnflag", "exact_parts", "approx_within_10pct"))
  }

  test("q157 star join broadcasts every dimension, never a fact table") {
    val df = RelationalQueries.queries("q157_regional_revenue")(spark, dir)
    val rows = df.collect() // force execution so AQE settles the final plan
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(1) > 0))
    // inspect the PRE-AQE physical plan, where exchange nodes are visible
    // (the adaptive wrapper hides its stages from collect); at test scale
    // even the one-year orders slice legitimately broadcasts — the
    // scale-invariant property is that the BIG fact (lineitem) is never
    // the broadcast build side
    val bhj = df.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }
    assert(bhj.length >= 4,
      s"dimensions should broadcast:\n${df.queryExecution.sparkPlan}")
    for (j <- bhj) {
      val build = j.buildSide match {
        case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
        case _ => j.right
      }
      assert(!build.toString.contains("lineitem"),
        s"lineitem must never be a broadcast build side:\n$j")
    }
  }

  test("q158 picks the true per-part minimum with the smallest suppkey") {
    val rows = RelationalQueries.queries("q158_cheapest_supplier")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val ps = graft.Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        org.apache.spark.sql.functions.round(col("l_extendedprice") * 100)
          .cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byPart = ps.groupBy(_._1)
    assert(rows.keySet == byPart.keySet)
    for ((pk, sells) <- byPart) {
      val mn = sells.map(_._3).min
      val bestSupp = sells.filter(_._3 == mn).map(_._2).min
      assert(rows(pk) == ((bestSupp, mn)), s"part $pk")
    }
  }

  test("q147 recommendation lists are bounded, ranked, and support-sorted") {
    val rows = RelationalQueries.queries("q147_copurchase_recs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val byItem = rows.groupBy(_._1)
    for ((item, rs) <- byItem) {
      val sorted = rs.sortBy(_._2)
      assert(sorted.length <= 5, s"item $item has ${sorted.length} recs")
      assert(sorted.map(_._2).toSeq == (1 to sorted.length), s"item $item ranks not contiguous")
      // support non-increasing with rank; ties broken by ascending rec id
      for (w <- sorted.sliding(2) if w.length == 2) {
        val (a, b) = (w(0), w(1))
        assert(a._4 > b._4 || (a._4 == b._4 && a._3 < b._3),
          s"item $item rank order violated: $a then $b")
      }
      assert(rs.forall(_._3 != item), s"item $item recommends itself")
    }
  }

  test("q148 candidates are non-edges with consistent Jaccard arithmetic") {
    val rows = RelationalQueries.queries("q148_link_prediction")(spark, dir).collect()
    assert(rows.length == 20)
    // rebuild the (already 1/8-sampled) co-purchase edge set independently
    val items = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val edges = items.as("x").join(items.as("y"), "ok")
      .filter(col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("a"), col("y.pk").as("b"))
      .filter(graft.functions.TextHash.md5Long(
        org.apache.spark.sql.functions.concat(
          col("a").cast("string"), org.apache.spark.sql.functions.lit("_"),
          col("b").cast("string"))) % 8 === 0)
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (r <- rows) {
      val (u, v, common, du, dv, jbp) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(u < v)
      assert(!edges.contains((u, v)), s"($u,$v) is an existing edge")
      assert(common >= 1 && common <= math.min(du, dv))
      assert(jbp == common * 10000 / (du + dv - common))
    }
  }

  test("q222/q224 compile to semi/anti joins (no fan-out, no distinct)") {
    val semi = RelationalQueries.queries("q222_priority_check")(spark, dir)
    val semiPlan = semi.queryExecution.sparkPlan.toString
    assert(semiPlan.contains("LeftSemi"),
      s"Q4 shape must plan a LEFT SEMI join:\n$semiPlan")
    val anti = RelationalQueries.queries("q224_inactive_funded")(spark, dir)
    val antiPlan = anti.queryExecution.sparkPlan.toString
    assert(antiPlan.contains("LeftAnti"),
      s"Q22 shape must plan a LEFT ANTI join:\n$antiPlan")
    // no Expand/Distinct nodes: EXISTS must not dedup a fanned-out join
    assert(!semiPlan.contains("Distinct"), semiPlan)
  }

  test("q323 Q6 shape: all three predicates reach the parquet scan as pushed filters") {
    val df = RelationalQueries.queries("q323_discount_revenue")(spark, dir)
    // pre-AQE sparkPlan: the adaptive wrapper hides children from collect
    val scan = df.queryExecution.sparkPlan
      .collectFirst { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      .getOrElse(fail("expected a FileSourceScan"))
    val pushed = scan.metadata("PushedFilters")
    for (c <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(pushed.contains(c), s"$c must push to the scan, got $pushed")
    // column pruning: only the 4 referenced columns are read
    assert(scan.requiredSchema.fieldNames.toSet ==
      Set("l_shipdate", "l_discount", "l_quantity", "l_extendedprice"),
      scan.requiredSchema.treeString)
  }

  test("q315/q316 Q16/Q20 shapes: anti on the blacklist, semi on the dominant set") {
    val q16 = RelationalQueries.queries("q315_supplier_diversity")(spark, dir)
    val p16 = q16.queryExecution.sparkPlan.toString
    assert(p16.contains("LeftAnti"),
      s"Q16 shape must plan the NOT-IN as a LEFT ANTI join:\n$p16")
    val q20 = RelationalQueries.queries("q316_dominant_suppliers")(spark, dir)
    val p20 = q20.queryExecution.sparkPlan.toString
    assert(p20.contains("LeftSemi"),
      s"Q20 shape must reduce supplier via a LEFT SEMI join:\n$p20")
    q20.sparkSession.catalog.clearCache() // q316's internal persist
  }

  test("q298 Q21 shape: semi + anti self-joins, fact table never a broadcast build") {
    val df = RelationalQueries.queries("q298_waiting_supplier")(spark, dir)
    val plan = df.queryExecution.sparkPlan
    val planStr = plan.toString
    assert(planStr.contains("LeftSemi"),
      s"Q21 shape must plan a LEFT SEMI self-join:\n$planStr")
    assert(planStr.contains("LeftAnti"),
      s"Q21 shape must plan a LEFT ANTI self-join:\n$planStr")
    // the semi/anti self-joins must NOT put the lineitem fan-out on a
    // broadcast build side (the q96/q157 discipline): every semi/anti is
    // a shuffled hash join keyed on l_orderkey
    val broadcastSemiAnti = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
          if j.joinType.toString.contains("Semi") || j.joinType.toString.contains("Anti") => j
    }
    assert(broadcastSemiAnti.isEmpty,
      s"semi/anti self-joins must stay shuffled:\n$planStr")
  }

  test("q250 Q18 shape: lineitem aggregated once, top-100 as TakeOrdered") {
    val df = RelationalQueries.queries("q250_large_volume_orders")(spark, dir)
    val plan = df.queryExecution.sparkPlan.toString
    // the Q18 rewrite: ONE lineitem scan (no HAVING-subquery + re-join
    // re-aggregate double read)
    val lineitemScans = "lineitem\\.parquet".r.findAllIn(plan).length
    assert(lineitemScans == 1, s"expected one lineitem scan, got $lineitemScans:\n$plan")
    // limit over the filtered heavy tail must be TakeOrdered, not a global Sort
    assert(plan.contains("TakeOrderedAndProject"), s"top-100 should be TakeOrdered:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 100)
    // every surviving order clears the threshold; ordering is as declared
    assert(rows.forall(_.getLong(5) > 300))
    val key = rows.map(r => (-r.getLong(4), r.getDate(3).toString, r.getLong(2)))
    assert(key.sameElements(key.sorted), "output must follow the declared sort")
  }

  test("q273 Q8 share identity; q274 Q15 single rollup feeds both max and join") {
    val share = RelationalQueries.queries("q273_market_share")(spark, dir).collect()
    assert(share.nonEmpty)
    for (r <- share) {
      val (nat, tot, bp) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nat >= 0 && nat <= tot, "conditional sum must be bounded by total")
      assert(bp == nat * 10000 / tot, "share_bp must be the exact integer div")
    }
    val top = RelationalQueries.queries("q274_top_supplier")(spark, dir)
    val rows = top.collect()
    assert(rows.nonEmpty)
    // all emitted suppliers share ONE revenue value (the global max)
    assert(rows.map(_.getLong(3)).distinct.length == 1)
    spark.catalog.clearCache()
  }

  test("q275 Q17 shape: decorrelated stats join stays on one lineitem shuffle key") {
    val df = RelationalQueries.queries("q275_small_qty_revenue")(spark, dir)
    val r = df.collect().head
    val (cents, n, yearly) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(n > 0, "Brand#1 must have small-quantity rows at sf0.01")
    assert(yearly == cents / 7)
    // decorrelation: the brand-filtered relation is scanned/persisted once
    // and self-joined on l_partkey — no second parquet read of lineitem
    // beyond the persisted branch (the Q17 HAVING-avg double-read trap).
    val plan = df.queryExecution.sparkPlan.toString
    assert(plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage"),
      s"per-part stats must reuse the persisted brand relation:\n$plan")
    spark.catalog.clearCache()
  }
}
