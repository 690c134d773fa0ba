package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class HilbertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("order-1 curve walks the 2x2 quadrants in the canonical order") {
    assert(HilbertUtil.xy2d(0, 0, 1) == 0L)
    assert(HilbertUtil.xy2d(0, 1, 1) == 1L)
    assert(HilbertUtil.xy2d(1, 1, 1) == 2L)
    assert(HilbertUtil.xy2d(1, 0, 1) == 3L)
  }

  test("THE Hilbert property: consecutive positions are grid-adjacent (order 5, full grid)") {
    val bits = 5
    val n = 1 << bits
    val byD = (for (x <- 0 until n; y <- 0 until n)
      yield HilbertUtil.xy2d(x, y, bits) -> (x, y)).toMap
    assert(byD.size == n * n, "xy2d must be a bijection onto [0, 4^bits)")
    for (dd <- 0L until (n.toLong * n - 1)) {
      val (x1, y1) = byD(dd); val (x2, y2) = byD(dd + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"d=$dd -> d+1 jumps from ($x1,$y1) to ($x2,$y2)")
    }
    // Morton does NOT have this property — the diagonal jump exists
    val mByD = (for (x <- 0 until n; y <- 0 until n)
      yield ZOrder.interleaveRef(x, y) -> (x, y)).toMap
    val mortonJumps = (0L until (n.toLong * n - 1)).count { dd =>
      val (x1, y1) = mByD(dd); val (x2, y2) = mByD(dd + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1
    }
    assert(mortonJumps > 0, "the contrast that motivates the Hilbert layout")
  }

  test("equal-count curve buckets: Hilbert bounding boxes beat Morton on a full grid") {
    // bucket size NOT a power of 4: power-of-4-aligned ranges are perfect
    // sub-squares on BOTH curves (they tie); real file boundaries are
    // row-count-driven and land anywhere, which is where Morton's diagonal
    // block jumps inflate the bounding box and Hilbert's adjacency doesn't
    val bits = 6
    val n = 1 << bits
    def bucketArea(ix: (Int, Int) => Long): Long = {
      val cells = for (x <- 0 until n; y <- 0 until n) yield (ix(x, y) / 12, x, y)
      cells.groupBy(_._1).values.map { g =>
        val xs = g.map(_._2); val ys = g.map(_._3)
        (xs.max - xs.min + 1).toLong * (ys.max - ys.min + 1)
      }.sum
    }
    val h = bucketArea((x, y) => HilbertUtil.xy2d(x, y, bits))
    val m = bucketArea((x, y) => ZOrder.interleaveRef(x, y))
    assert(h < m, s"hilbert total bucket area $h should beat morton $m")
  }

  test("codegen column path agrees with the JVM reference") {
    val df = spark.range(0, 300).toDF("i")
      .select(col("i"), (col("i") * 7 % 64).as("x"), (col("i") * 13 % 64).as("y"))
      .withColumn("h", Hilbert.index(col("x"), col("y"), 6))
      .collect()
    for (r <- df)
      assert(r.getAs[Long]("h") ==
        HilbertUtil.xy2d(r.getAs[Long]("x"), r.getAs[Long]("y"), 6))
  }
}
