package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class ProfileQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val small = "/root/testdata/sf0.01"

  test("q249 FD audit: key FD holds, g3 matches a direct recomputation, bp consistent") {
    val rows = ProfileQueries.queries("q249_fd_audit")(spark, small).collect()
      .map(r => r.getString(1) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6))))
      .toMap
    assert(rows.size == 7)
    // o_orderkey is the orders primary key: the FD must hold exactly
    val (nO, nLhsO, vO, bpO, holdsO) = rows("o_orderkey -> o_orderstatus")
    assert(holdsO && vO == 0L && bpO == 0L && nO == nLhsO,
      "key FD must hold with zero violations and one row per LHS value")
    // direct g3 recomputation for the source -> lang near-FD
    val docs = Tables.documents(spark, small)
      .select(col("source"), col("lang")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = docs.length.toLong
    val kept = docs.groupBy(_._1).map { case (_, xs) =>
      xs.groupBy(_._2).values.map(_.length).max.toLong
    }.sum
    val (nQ, _, vQ, bpQ, holdsQ) = rows("source -> lang")
    assert(nQ == n && vQ == n - kept && bpQ == (n - kept) * 10000 / n)
    assert(holdsQ == (vQ == 0L))
    // every row's internal identities
    for ((fd, (nn, nl, v, bp, h)) <- rows) {
      assert(nl <= nn, fd)
      assert(v >= 0 && v < nn, fd)
      assert(bp == v * 10000 / nn, fd)
      assert(h == (v == 0L), fd)
    }
  }

  test("q251 correlation matrix: single scan, r bounded, matches direct recompute") {
    val df = ProfileQueries.queries("q251_correlation_matrix")(spark, small)
    val plan = df.queryExecution.sparkPlan.toString
    val scans = "lineitem\\.parquet".r.findAllIn(plan).length
    assert(scans == 1, s"all 16 moments must come from ONE scan, got $scans")
    val rows = df.collect()
    assert(rows.length == 6)
    // direct double recompute (rounding differences bounded by 1e-6 + float error)
    val li = Tables.lineitem(spark, small).select(
      round(col("l_quantity")).cast("long"),
      round(col("l_extendedprice") * 100).cast("long"),
      round(col("l_discount") * 100).cast("long"),
      round(col("l_tax") * 100).cast("long")).collect()
      .map(r => Array(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val names = Seq("qty", "price", "disc", "tax")
    def pearson(i: Int, j: Int): Double = {
      val n = li.length.toDouble
      val (xs, ys) = (li.map(_(i).toDouble), li.map(_(j).toDouble))
      val num = n * xs.zip(ys).map { case (a, b) => a * b }.sum - xs.sum * ys.sum
      val den = math.sqrt(n * xs.map(x => x * x).sum - xs.sum * xs.sum) *
        math.sqrt(n * ys.map(y => y * y).sum - ys.sum * ys.sum)
      num / den
    }
    for (r <- rows; if !r.isNullAt(5)) {
      val rv = r.getDouble(5)
      assert(rv >= -1.0 && rv <= 1.0, r.getString(0))
      val Array(a, b) = r.getString(0).split("~")
      val want = pearson(names.indexOf(a), names.indexOf(b))
      assert(math.abs(rv - want) < 1e-4, s"${r.getString(0)}: $rv vs direct $want")
    }
  }
}
