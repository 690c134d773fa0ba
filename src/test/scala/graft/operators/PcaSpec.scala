package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PcaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dims = 4
  // a low-rank-ish cloud: strong variance along (1,1,0,0) and (0,0,1,-1)
  private def cloud: Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(7)
    (0 until 300).map { _ =>
      val a = rnd.nextGaussian() * 5; val b = rnd.nextGaussian() * 2
      val noise = Array.fill(dims)(rnd.nextGaussian() * 0.01)
      Seq(a + noise(0) + 3.0, a + noise(1), b + noise(2), -b + noise(3))
    }
  }

  private lazy val df = cloud.map(Tuple1(_)).toDF("embedding")
  private lazy val model = Pca.fit(df, "embedding", dims, k = 2)

  test("components are orthonormal, eigenvalues descending and nonnegative") {
    val c = model.components
    for (i <- c.indices; j <- c.indices) {
      val dot = c(i).zip(c(j)).map { case (x, y) => x * y }.sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9, s"dot($i,$j)=$dot")
    }
    assert(model.eigenvalues.toSeq === model.eigenvalues.sorted.reverse.toSeq)
    assert(model.eigenvalues.forall(_ > 0))
  }

  test("top components recover the planted directions") {
    def align(c: Array[Double], dir: Array[Double]): Double = {
      val n = math.sqrt(dir.map(x => x * x).sum)
      math.abs(c.zip(dir).map { case (x, y) => x * y }.sum) / n
    }
    assert(align(model.components(0), Array(1, 1, 0, 0).map(_.toDouble)) > 0.999)
    assert(align(model.components(1), Array(0, 0, 1, -1).map(_.toDouble)) > 0.999)
  }

  test("distributed projection == driver-side centered mat-mul") {
    val got = Pca.project(df, "embedding", model)
      .select(col("embedding"), col("pca")).as[(Seq[Double], Seq[Double])].collect()
    got.foreach { case (x, p) =>
      val want = model.components.map(c =>
        c.indices.map(i => c(i) * (x(i) - model.mean(i))).sum)
      p.zip(want).foreach { case (a, b) => assert(math.abs(a - b) < 1e-6) }
    }
  }

  test("projection variance per component ≈ its eigenvalue") {
    val proj = Pca.project(df, "embedding", model)
      .select(col("pca")).as[Seq[Double]].collect()
    for (kIdx <- 0 until 2) {
      val vals = proj.map(_(kIdx))
      val mean = vals.sum / vals.length
      val varc = vals.map(v => (v - mean) * (v - mean)).sum / vals.length
      val ev = model.eigenvalues(kIdx)
      assert(math.abs(varc - ev) / ev < 1e-3, s"component $kIdx: var=$varc ev=$ev")
    }
  }

  test("fit is deterministic (exact-integer gram -> identical doubles)") {
    val m2 = Pca.fit(df, "embedding", dims, k = 2)
    assert(m2.components.map(_.toSeq).toSeq === model.components.map(_.toSeq).toSeq)
    assert(m2.eigenvalues.toSeq === model.eigenvalues.toSeq)
  }

  test("fits the harness embeddings table (d=64) and reduces for ANN") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val m = Pca.fit(e, "embedding", 64, k = 8)
    assert(m.eigenvalues.length === 8 && m.eigenvalues.head > 0)
    val out = Pca.project(e, "embedding", m).select(size(col("pca"))).head().getInt(0)
    assert(out === 8)
  }
}
