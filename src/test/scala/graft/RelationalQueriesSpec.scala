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
}
