package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Signed-Hadamard OPQ rotation: exact linear-algebra identities (the
  * transform is ±1 integer math, so they hold with equality, not
  * tolerance) and the actual PQ payoff on anisotropic data. */
class OpqRotationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val d = 16

  private def rotate(vs: Seq[Array[Long]]): Seq[Array[Long]] =
    vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "vq")
      .withColumn("rot", OpqRotation.rotateMicro(col("vq"), d))
      .orderBy("id").collect().map(_.getSeq[Long](2).toArray).toSeq

  test("matches a direct H·D computation and preserves norms ×d (orthogonality)") {
    val rnd = new scala.util.Random(3)
    val vs = Seq.fill(20)(Array.fill(d)(rnd.nextInt(2000000).toLong - 1000000L))
    val signs = OpqRotation.signs(d)
    val got = rotate(vs)
    for ((v, r) <- vs.zip(got)) {
      val expect = Array.tabulate(d) { i =>
        (0 until d).map { j =>
          val h = if (java.lang.Long.bitCount(i.toLong & j.toLong) % 2 == 0) 1L else -1L
          h * signs(j) * v(j)
        }.sum
      }
      assert(r.toSeq === expect.toSeq)
      // H·D orthogonal up to √d: ||HDv||² = d·||v||² EXACTLY in integers
      val n0 = v.map(x => BigInt(x) * BigInt(x)).sum
      val n1 = r.map(x => BigInt(x) * BigInt(x)).sum
      assert(n1 === n0 * d)
    }
  }

  test("rotation balances subspace energies on anisotropic data, at error parity") {
    // all variance lives in dims 0..3: the first PQ subspace carries ~all
    // the energy before rotation. The rotation's GUARANTEE is balance —
    // every subspace gets an equal share (what OPQ's eigenvalue allocation
    // approximates); total distortion on rotation-invariant Gaussians is
    // provably unchanged (trace-preserving), so error is asserted at
    // parity, not as a win.
    val rnd = new scala.util.Random(9)
    val rows = (0 until 300).map { i =>
      val v = Array.fill(d)(0.0)
      for (j <- 0 until 4) v(j) = rnd.nextGaussian()
      (i.toLong, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    val (m, k, iters, cap) = (4, 4, 3, 300L)

    def subEnergies(vecs: Seq[Array[Long]]): Seq[BigInt] =
      (0 until m).map { s =>
        val lo = s * (d / m); val hi = lo + d / m
        vecs.map(v => (lo until hi).map(i => BigInt(v(i)) * BigInt(v(i))).sum).sum
      }
    val micro = df.withColumn("vq", ProductQuantizer.micro(col("embedding")))
      .withColumn("rot", OpqRotation.rotateMicro(col("vq"), d))
    val collected = micro.collect()
    val ePlain = subEnergies(collected.map(_.getSeq[Long](2).toArray).toSeq)
    val eRot = subEnergies(collected.map(_.getSeq[Long](3).toArray).toSeq)
    assert(ePlain.head > ePlain.tail.max * 100,
      s"planted data must be subspace-skewed: $ePlain")
    assert(eRot.max < eRot.min * 2,
      s"rotated subspace energies must be balanced: $eRot")
    // H·D is trace-preserving ×d: total rotated energy = d × total plain
    assert(eRot.sum === ePlain.sum * d)

    val plain = ProductQuantizer.encodeAll(df, "vec_id", "embedding", m, k, iters, cap)
      .agg(sum(col("pq").getField("err"))).head().getLong(0)
    val rotated = micro.select(col("vec_id"),
      transform(col("rot"), x => x.cast("double") / lit(1e6)).as("vrot"))
    val rot = ProductQuantizer.encodeAll(rotated, "vec_id", "vrot", m, k, iters, cap)
      .agg(sum(col("pq").getField("err"))).head().getLong(0)
    assert(rot <= plain * d * 1.05,
      s"rotated error $rot must not degrade past scaled plain ${plain * d}")
  }
}
