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
}
