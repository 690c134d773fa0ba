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

  // --- learned per-pair KLT (q297) ------------------------------------------

  /** Planted ANISOTROPIC 64-dim corpus: dim i+32 ≈ dim i (strong
    * cross-subspace correlation — exactly what the Hadamard can't exploit
    * and the learned rotation compacts away). Deterministic seed. */
  private def plantedCorrelated(n: Int, dims: Int = 64) = {
    val rnd = new scala.util.Random(21)
    (0 until n).map { i =>
      val base = Array.fill(dims / 2)(rnd.nextDouble() * 2.0 - 1.0)
      val v = Array.tabulate(dims) { j =>
        if (j < dims / 2) base(j)
        else base(j - dims / 2) + (rnd.nextDouble() - 0.5) * 0.05
      }
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("givens: c = 0 is identity; rotation is orthonormal") {
    assert(OpqRotation.givens(5.0, 3.0, 0.0) == ((1.0, 0.0)))
    for ((a, b, c) <- Seq((1e10, 3e10, 0.9e10), (7e9, 7e9, -2e9), (5e12, 1e12, 1e11))) {
      val (cs, sn) = OpqRotation.givens(a, b, c)
      assert(math.abs(cs * cs + sn * sn - 1.0) < 1e-12)
    }
  }

  test("learned KLT zeroes the empirical cross-subspace covariance") {
    val df = plantedCorrelated(300)
    val rots = OpqRotation.fitPairKlt(df, "embedding", 64)
    val zCols = OpqRotation.kltRotateMicroCols(col("embedding"), rots, 64)
    def crossMoment(xs: Seq[(Long, Long)]): BigInt = {
      val n = BigInt(xs.size)
      val (sx, sy) = (BigInt(xs.map(_._1).sum), BigInt(xs.map(_._2).sum))
      val q = xs.map { case (x, y) => BigInt(x) * BigInt(y) }.sum
      (n * q - sx * sy).abs
    }
    val rows = df.select(array(zCols: _*).as("z"),
        transform(col("embedding").cast("array<double>"),
          x => round(x * 1000000.0).cast("long")).as("m"))
      .collect()
    // pair 0: covariance of rotated dims (0, 32) must collapse vs raw (0, 32)
    val before = crossMoment(rows.map(r => (r.getSeq[Long](1)(0), r.getSeq[Long](1)(32))).toSeq)
    val after = crossMoment(rows.map(r => (r.getSeq[Long](0)(0), r.getSeq[Long](0)(32))).toSeq)
    assert(before > after * 1000, s"rotation must kill the covariance: $before -> $after")
  }

  /** Error of quantizing `zCols` with the SAME variance-adaptive pair
    * allocation the audit uses — so every arm competes under one rule. */
  private def pairAllocErr(df: org.apache.spark.sql.DataFrame,
      zCols: Seq[org.apache.spark.sql.Column], bBase: Int): Long = {
    val half = zCols.size / 2
    val stats = OpqRotation.quantStats(df, zCols)
    val errs = (0 until half).map { p =>
      val (q0, q1, _) = OpqRotation.allocatePair(stats(p), stats(p + half), bBase)
      OpqRotation.quantErrCol(zCols(p), q0) + OpqRotation.quantErrCol(zCols(p + half), q1)
    }
    df.agg(sum(errs.reduce(_ + _))).head().getLong(0)
  }

  test("learned rotation beats identity AND Hadamard on planted anisotropic pairs") {
    val dims = 64
    val df = plantedCorrelated(300, dims).persist()
    val audit = OpqRotation.transformCodingAudit(spark, df, "embedding", dims, bBase = 4)
      .collect()
    // every pair is strongly correlated -> compaction promotes every pair,
    // and the learned arm must win strictly on total error
    assert(audit.forall(_.getBoolean(1)), "all learned pairs must promote")
    assert(!audit.exists(_.getBoolean(2)), "identity arm must not promote (equal variances)")
    val errL = audit.map(_.getLong(3)).sum
    val errI = audit.map(_.getLong(4)).sum
    assert(errL * 2 < errI, s"learned must beat identity by 2x+: $errL vs $errI")

    // Hadamard arm under the SAME allocation rule: H scales squared
    // distances x64 (unnormalized), so its error competes against 64x the
    // learned arm's. Energy spreading can't earn allocation bits, so the
    // learned rotation must still win.
    val micro = transform(col("embedding").cast("array<double>"),
      x => round(x * 1000000.0).cast("long"))
    val had = df.withColumn("rot", OpqRotation.rotateMicro(micro, dims))
    val hadCols = (0 until dims).map(i => element_at(col("rot"), i + 1))
    val errH = pairAllocErr(had, hadCols, 4)
    assert(errL * 64 < errH,
      s"learned (x64 = ${errL * 64}) must beat unnormalized Hadamard ($errH)")
    df.unpersist()
  }
}
