package graft.operators

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ProductQuantizerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Pure-Scala reference encode: per subspace argmin L2, ties → smaller
    * cid, error = total squared distance. */
  private def refEncode(v: Array[Long], cb: Array[Array[Array[Long]]]): (Seq[Int], Long) = {
    val sd = cb(0)(0).length
    var err = 0L
    val codes = cb.indices.map { s =>
      val sv = v.slice(s * sd, s * sd + sd)
      val ds = cb(s).map(c => sv.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum)
      val best = ds.zipWithIndex.minBy { case (d, i) => (d, i) }._2
      err += ds(best)
      best
    }
    (codes, err)
  }

  test("codegen'd encode matches the reference on random vectors (incl. ties)") {
    val rng = new Random(2024)
    val m = 4; val sd = 4; val k = 5
    // small value range so distance ties actually occur
    val cb = Array.fill(m, k, sd)(rng.nextInt(3).toLong)
    val vecs = (1 to 50).map(i => i.toLong -> Array.fill(m * sd)(rng.nextInt(3).toLong))
    val df = vecs.toDF("id", "vq")
    val out = df.select($"id",
        graft.functions.PqExpressions.pqEncodeMicro($"vq", cb).as("pq"))
      .select($"id", $"pq.codes", $"pq.err")
      .collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Int](1), r.getLong(2)))).toMap
    vecs.foreach { case (id, v) =>
      assert(out(id) == refEncode(v, cb), s"vector $id")
    }
  }

  test("fit: init from smallest ids, empty clusters keep previous centroid") {
    // 6 identical vectors + ids: k=3 inits from ids 1..3; all points
    // assign to cid 0 (ties → smaller), so cids 1,2 have no members and
    // must keep their initial centroids through every round
    val sample = (1L to 6L).map(id => id -> Array(10L, 10L)).toArray
    val cb = ProductQuantizer.fit(sample, m = 1, k = 3, iters = 2)
    assert(cb(0).toSeq.map(_.toSeq) == Seq(Seq(10L, 10L), Seq(10L, 10L), Seq(10L, 10L)))

    // two separated groups: centroids converge to exact integer means
    val s2 = Array(1L -> Array(0L, 0L), 2L -> Array(2L, 0L),
      3L -> Array(100L, 100L), 4L -> Array(102L, 100L))
    val cb2 = ProductQuantizer.fit(s2, m = 1, k = 2, iters = 3)
    assert(cb2(0)(0).toSeq == Seq(1L, 0L)) // mean of (0,0),(2,0)
    assert(cb2(0)(1).toSeq == Seq(101L, 100L))
  }

  test("fit subspaces are independent slices of the input") {
    val sample = Array(
      1L -> Array(0L, 0L, 100L, 100L),
      2L -> Array(4L, 0L, 104L, 100L))
    val cb = ProductQuantizer.fit(sample, m = 2, k = 1, iters = 1)
    assert(cb(0)(0).toSeq == Seq(2L, 0L)) // mean of first-subspace slices
    assert(cb(1)(0).toSeq == Seq(102L, 100L))
  }

  test("encodeAll: bounded sample, exact per-row error, 4-bit codes") {
    val rng = new Random(77)
    val df = (1 to 300).map(i =>
      (i.toLong, Array.fill(16)((rng.nextGaussian() * 0.5).toFloat))).toDF("vec_id", "embedding")
    val enc = ProductQuantizer.encodeAll(df, "vec_id", "embedding",
      m = 4, k = 16, iters = 2, sampleCap = 50)
    val rows = enc.select($"pq.codes", $"pq.err").collect()
    assert(rows.length == 300)
    rows.foreach { r =>
      val codes = r.getSeq[Int](0)
      assert(codes.length == 4 && codes.forall(c => c >= 0 && c < 16))
      assert(r.getLong(1) >= 0L)
    }
  }
}
