package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DtwSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent reference: plain row-major banded DP with explicit Inf. */
  private def refDtw(a: Array[Long], b: Array[Long], w: Int): Long = {
    val inf = Long.MaxValue / 4
    val n = a.length
    val dp = Array.fill(n, n)(inf)
    for (i <- 0 until n; j <- 0 until n if math.abs(i - j) <= w) {
      val c = math.abs(a(i) - b(j))
      if (i == 0 && j == 0) dp(i)(j) = c
      else {
        val best = Seq(
          if (i > 0) dp(i - 1)(j) else inf,
          if (j > 0) dp(i)(j - 1) else inf,
          if (i > 0 && j > 0) dp(i - 1)(j - 1) else inf).min
        if (best < inf) dp(i)(j) = c + best
      }
    }
    dp(n - 1)(n - 1)
  }

  test("distance matches an independent DP on seeded random series") {
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 100) {
      val n = 2 + rnd.nextInt(20)
      val a = Array.fill(n)(rnd.nextInt(1000).toLong)
      val b = Array.fill(n)(rnd.nextInt(1000).toLong)
      val w = rnd.nextInt(n)
      assert(Dtw.distance(a, b, w) == refDtw(a, b, w))
    }
  }

  test("identities: self-distance 0; band 0 is the pointwise L1; wider band never hurts") {
    val rnd = new scala.util.Random(5)
    val a = Array.fill(15)(rnd.nextInt(100).toLong)
    val b = Array.fill(15)(rnd.nextInt(100).toLong)
    assert(Dtw.distance(a, a, 3) == 0L)
    assert(Dtw.distance(a, b, 0) == a.zip(b).map { case (x, y) => math.abs(x - y) }.sum)
    val dists = (0 until 15).map(w => Dtw.distance(a, b, w))
    assert(dists.zip(dists.tail).forall { case (x, y) => y <= x },
      s"band widening must be monotone non-increasing: $dists")
    // a shifted copy inside the band warps to near-zero; band 0 cannot
    val shifted = Array.tabulate(15)(i => a(math.max(0, i - 2)))
    assert(Dtw.distance(a, shifted, 3) < Dtw.distance(a, shifted, 0))
  }

  test("pairwise matches distance and rejects incomplete or duplicate grids") {
    val grid = Seq(
      ("x", 0, 3L), ("x", 1, 1L), ("x", 2, 4L),
      ("y", 0, 2L), ("y", 1, 7L), ("y", 2, 1L),
      ("z", 0, 1L), ("z", 1, 1L), ("z", 2, 1L)).toDF("k", "i", "v")
    val got = Dtw.pairwise(spark, grid, "k", "i", "v", n = 3, band = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got(("x", "y")) == Dtw.distance(Array(3, 1, 4), Array(2, 7, 1), 1))
    assert(got(("x", "z")) == Dtw.distance(Array(3, 1, 4), Array(1, 1, 1), 1))
    assert(got.size == 3)
    intercept[IllegalArgumentException] {
      Dtw.pairwise(spark, grid.filter("NOT (k = 'x' AND i = 1)"), "k", "i", "v", 3, 1)
    }
    intercept[IllegalArgumentException] {
      Dtw.pairwise(spark, grid.union(Seq(("x", 0, 9L)).toDF("k", "i", "v")),
        "k", "i", "v", 3, 1)
    }
    // numeric keys would silently reorder pairs against the oracle's
    // native-type comparison ("10" < "9") — refused loudly
    intercept[IllegalArgumentException] {
      Dtw.pairwise(spark, Seq((1L, 0, 1L)).toDF("k", "i", "v"), "k", "i", "v", 1, 0)
    }
  }

  test("magnitudes that could reach the Inf sentinel are refused") {
    val big = Array.fill(10)(3e14.toLong)
    intercept[IllegalArgumentException] { Dtw.distance(big, big.map(-_), 3) }
    // just inside the guard still computes
    val ok = Array.fill(10)(1e13.toLong)
    assert(Dtw.distance(ok, ok, 3) == 0L)
  }
}
