package graft.ops

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Scale-shape sanity for the pointer-jumping fixpoint: a 50k-node forest
  * with deep chains and cycles resolves in the O(log depth) round budget,
  * and spot-checks agree with the collected walk.
  */
class UltimateParentScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("50k-node forest with deep chains and cycles resolves correctly") {
    val rng = new Random(7)
    // 100 trees of ~400 nodes hanging off roots, plus a depth-150 chain,
    // a depth-250 chain (over cap), and a 5-cycle
    val forest = (0 until 40000).map { i =>
      val tree = i % 100
      if (i < 100) (s"n$i", s"n$i") // roots
      else (s"n$i", s"n${tree + 100 * rng.nextInt(math.max(1, i / 100))}")
    }
    val deep150 = (0 until 150).map(i => (s"d$i", s"d${i + 1}")) :+ ("d150" -> "d150")
    val deep250 = (0 until 250).map(i => (s"e$i", s"e${i + 1}")) :+ ("e250" -> "e250")
    val cycle = (0 until 5).map(i => (s"c$i", s"c${(i + 1) % 5}"))
    val edges = (forest ++ deep150 ++ deep250 ++ cycle).toDF("id", "parent")

    val t0 = System.nanoTime()
    val res = UltimateParent.resolveDistributed(edges, maxDepth = 200)
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getBoolean(2))).toMap
    val secs = (System.nanoTime() - t0) / 1e9

    assert(res.size == edges.count())
    assert(res("d0") == ("d150", false), "depth-150 chain resolves")
    assert(res("e0") == ("e0", true), "depth-250 head hits the cap")
    assert(res("e100") == ("e250", false), "depth-150 tail of the long chain resolves")
    (0 until 5).foreach(i => assert(res(s"c$i") == (s"c$i", true), "cycle falls back to self"))
    // every forest node resolved to an actual root, never capped
    assert(res("n35000")._2 == false)
    assert(res.count { case (id, (_, capped)) => capped && id.startsWith("n") } == 0)
    // O(log depth) rounds on 40k rows must stay well under a minute locally
    assert(secs < 60.0, s"took ${secs}s")
  }
}
