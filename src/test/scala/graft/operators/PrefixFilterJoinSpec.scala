package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PrefixFilterJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def brute(sets: Seq[(Long, Set[Long])], tNum: Int, tDen: Int): Set[(Long, Long, Long, Long)] =
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size.toLong
      uni = (sa | sb).size.toLong
      if inter * tDen >= tNum * uni
    } yield (ia, ib, inter, uni)).toSet

  private def viaJoin(sets: Seq[(Long, Set[Long])], tNum: Int, tDen: Int): Set[(Long, Long, Long, Long)] = {
    val df = sets.map { case (id, s) => (id, s.toSeq.sorted) }.toDF("id", "hs")
    PrefixFilterJoin.jaccardSelfJoin(df, "id", "hs", tNum, tDen)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
  }

  test("matches brute force on random set families at several thresholds") {
    val rng = new Random(9000)
    for (trial <- 1 to 6) {
      val universe = 1L to (20L + rng.nextInt(30))
      val sets = (1L to (10L + rng.nextInt(25))).map { id =>
        id -> universe.filter(_ => rng.nextDouble() < 0.4).toSet
      }.filter(_._2.nonEmpty)
      for ((tn, td) <- Seq((1, 2), (4, 5), (9, 10), (1, 1)))
        assert(viaJoin(sets, tn, td) == brute(sets, tn, td), s"trial $trial t=$tn/$td")
    }
  }

  test("identical sets survive t = 1; disjoint sets never pair") {
    val sets = Seq(1L -> Set(1L, 2L, 3L), 2L -> Set(1L, 2L, 3L), 3L -> Set(7L, 8L))
    assert(viaJoin(sets, 1, 1) == Set((1L, 2L, 3L, 3L)))
    assert(viaJoin(Seq(1L -> Set(1L, 2L), 2L -> Set(3L, 4L)), 1, 10).isEmpty)
  }

  test("boundary: pair exactly AT the threshold is kept") {
    // J = 3/5 exactly: sets {1,2,3,4} and {2,3,4,5} -> inter 3, union 5
    val sets = Seq(1L -> Set(1L, 2L, 3L, 4L), 2L -> Set(2L, 3L, 4L, 5L))
    assert(viaJoin(sets, 3, 5) == Set((1L, 2L, 3L, 5L)))
    assert(viaJoin(sets, 61, 100).isEmpty) // just above
  }

  // --- directed containment ------------------------------------------------

  private def bruteContain(sets: Seq[(Long, Set[Long])], tNum: Int, tDen: Int): Set[(Long, Long, Long, Long)] =
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia != ib
      inter = (sa & sb).size.toLong
      if inter * tDen >= tNum * sa.size
    } yield (ia, ib, inter, sa.size.toLong)).toSet

  private def viaContain(sets: Seq[(Long, Set[Long])], tNum: Int, tDen: Int): Set[(Long, Long, Long, Long)] = {
    val df = sets.map { case (id, s) => (id, s.toSeq.sorted) }.toDF("id", "hs")
    PrefixFilterJoin.containmentSelfJoin(df, "id", "hs", tNum, tDen)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
  }

  test("cross candidates are a lossless superset of the true cross pairs") {
    val rng = new Random(4100)
    def mkSets(n: Int, idBase: Long): Seq[(Long, Set[Long])] =
      (0 until n).map { i =>
        (idBase + i,
          (0 until 6 + rng.nextInt(10)).map(_ => rng.nextInt(40).toLong).toSet)
      }
    val qs = mkSets(25, 0L); val cs = mkSets(60, 1000L)
    for ((tn, td) <- Seq((1, 2), (7, 10), (4, 5))) {
      val trueCross = (for {
        (qi, qa) <- qs; (ci, ca) <- cs
        if (qa & ca).size * td >= tn * (qa | ca).size
      } yield (qi, ci)).toSet
      val qdf = qs.map { case (id, s) => (id, s.toSeq.sorted) }.toDF("id", "hs")
      val cdf = cs.map { case (id, s) => (id, s.toSeq.sorted) }.toDF("id", "hs")
      val cand = PrefixFilterJoin.jaccardCrossCandidates(qdf, cdf, "id", "hs", tn, td)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(trueCross.subsetOf(cand),
        s"t=$tn/$td lost ${(trueCross -- cand).take(3)}")
      // and the filter is doing real work: candidates ≪ full cross product
      assert(cand.size < qs.size * cs.size)
    }
  }

  test("containment matches brute force on random set families") {
    val rng = new Random(4100)
    for (trial <- 1 to 6) {
      val universe = 1L to (20L + rng.nextInt(30))
      val sets = (1L to (10L + rng.nextInt(25))).map { id =>
        id -> universe.filter(_ => rng.nextDouble() < 0.4).toSet
      }.filter(_._2.nonEmpty)
      for ((tn, td) <- Seq((1, 2), (4, 5), (9, 10), (1, 1)))
        assert(viaContain(sets, tn, td) == bruteContain(sets, tn, td),
          s"trial $trial t=$tn/$td")
    }
  }

  test("containment is directed: subset ⊂ superset, never the reverse") {
    val sets = Seq(1L -> Set(1L, 2L, 3L), 2L -> Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(viaContain(sets, 1, 1) == Set((1L, 2L, 3L, 3L)))
    // the superset is only 50% covered by the subset
    assert(viaContain(sets, 1, 2).contains((2L, 1L, 3L, 6L)))
  }
}
