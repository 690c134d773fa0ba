package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("column interleave matches the reference JVM implementation") {
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (256L, 255L), (43690L, 21845L))
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.interleave(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (a, b, z) => assert(z == ZOrder.interleaveRef(a, b), s"($a,$b)") }
  }

  test("interleave is a bijection on 16-bit pairs (bits recover both coordinates)") {
    def unspread(z: Long): Long = {
      var v = z & 0x55555555L
      v = (v | (v >> 1)) & 0x33333333L
      v = (v | (v >> 2)) & 0x0F0F0F0FL
      v = (v | (v >> 4)) & 0x00FF00FFL
      (v | (v >> 8)) & 0xFFFFL
    }
    val rnd = new scala.util.Random(42)
    (1 to 1000).foreach { _ =>
      val a = rnd.nextInt(65536).toLong; val b = rnd.nextInt(65536).toLong
      val z = ZOrder.interleaveRef(a, b)
      assert(unspread(z) == a && unspread(z >> 1) == b)
    }
  }

  test("z-order clusters both dimensions: bucket-local coordinate spans shrink") {
    // 4096 grid points; 64 z-buckets (top 6 of 24 z bits). Within a bucket,
    // BOTH coordinates must be confined to a fraction of their domain —
    // that confinement is exactly what makes min/max file skipping work on
    // either column. A single-column sort would leave the other column's
    // span at full width.
    val pts = for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b)
    val spans = pts.groupBy { case (a, b) => ZOrder.interleaveRef(a, b) >> 6 }
      .values.map { g =>
        val (as, bs) = (g.map(_._1), g.map(_._2))
        (as.max - as.min, bs.max - bs.min)
      }
    // each of the 64 buckets covers an 8x8 tile of the 64x64 grid
    assert(spans.forall { case (sa, sb) => sa <= 8 && sb <= 8 })
  }
}
