package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Measures ANN quality against exact ground truth on the harness
  * embeddings. These vectors are weakly clustered (max pairwise cosine
  * ~0.5), so label-bucket IVF at nprobe=2 keeps only ~30% of true
  * neighbors — a real measurement worth pinning. The load-bearing
  * invariants: recall is monotone in nprobe, and probing every bucket
  * degenerates to the exact scan (recall exactly 1.0).
  */
class AnnRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("IVF recall grows with nprobe and is exact at full probe") {
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < 20)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(VectorOps.topK(q, e, "vec_id", "embedding", k = 3))
    val recalls = Seq(2, 5, 10).map { np =>
      val ivf = pairs(VectorOps.ivfTopK(q, e, "vec_id", "embedding", "label", k = 3, nprobe = np))
      val r = (exact intersect ivf).size.toDouble / exact.size
      info(f"nprobe=$np%2d -> recall@3 = $r%.3f")
      np -> r
    }
    assert(recalls.sliding(2).forall { case Seq((_, a), (_, b)) => b >= a },
      s"recall must be monotone in nprobe: $recalls")
    assert(recalls.last._2 == 1.0, "probing all buckets must equal the exact scan")
    assert(recalls.head._2 > 0.0, "even nprobe=2 must find some true neighbors")
  }

  test("learned k-means quantizer: recall monotone in nprobe, exact at full probe") {
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < 20)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(VectorOps.topK(q, e, "vec_id", "embedding", k = 3))
    val recalls = Seq(2, 5, 10).map { np =>
      val ivf = pairs(KMeansIVF.ivfTopK(q, e, "vec_id", "embedding",
        k = 3, nprobe = np, nClusters = 10, iters = 4, sampleCap = 100))
      val r = (exact intersect ivf).size.toDouble / exact.size
      info(f"kmeans nprobe=$np%2d -> recall@3 = $r%.3f")
      np -> r
    }
    assert(recalls.sliding(2).forall { case Seq((_, a), (_, b)) => b >= a },
      s"recall must be monotone in nprobe: $recalls")
    assert(recalls.last._2 == 1.0, "probing all buckets must equal the exact scan")
    assert(recalls.head._2 > 0.0, "even nprobe=2 must find some true neighbors")
  }

  test("fit-sample modulus bounds the expected driver collect at any scale") {
    // ceil division: expected sample n/mod is <= cap for every n — the
    // property that makes the fit collect fixed-SIZE, not fixed-fraction
    for (cap <- Seq(1L, 7L, 100L, 10000L); n <- Seq(0L, 1L, cap - 1, cap, cap + 1,
        10 * cap + 3, 1000000007L)) {
      val mod = KMeansIVF.sampleModFor(n, cap)
      assert(mod >= 1)
      assert(n.toDouble / mod <= cap, s"n=$n cap=$cap mod=$mod")
      // and it never over-shrinks: one fewer stratum would exceed the cap
      if (mod > 1) assert(n.toDouble / (mod - 1) > cap, s"n=$n cap=$cap mod=$mod")
    }
  }

  test("k-means fit is deterministic under input order") {
    val vecs = Array.tabulate(12)(i => (i.toLong, Array.tabulate(4)(d => (i % 3 + d).toDouble)))
    val a = KMeansIVF.fit(vecs, nClusters = 3, iters = 4)
    val b = KMeansIVF.fit(vecs.reverse, nClusters = 3, iters = 4)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq, "input order must not matter")
    // 12 points collapse onto 3 distinct directions → no NaNs, 3 centroids
    assert(a.length == 3 && a.forall(_.forall(x => !x.isNaN)))
  }
}
