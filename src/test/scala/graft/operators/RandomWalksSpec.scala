package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Deterministic random walks: every emitted step follows a real edge,
  * reruns are identical, sinks stop early, and the md5 pick is reasonably
  * spread across neighbors. */
class RandomWalksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], k: Int, len: Int) =
    RandomWalks.walks(edges.toDF("src", "dst"), "src", "dst", k, len)
      .as[(Long, Long, Int, Long)].collect().toSeq

  test("every consecutive step pair is an edge; step 0 is the start") {
    val edges = for { a <- 0L to 9L; b <- 0L to 9L if a != b && (a + b) % 3 != 0 }
      yield (a, b)
    val rows = run(edges, 2, 4)
    val es = edges.toSet
    val byWalker = rows.groupBy(r => (r._1, r._2)).view.mapValues(_.sortBy(_._3))
    for (((start, _), path) <- byWalker) {
      assert(path.head._3 === 0 && path.head._4 === start)
      for (Seq(a, b) <- path.map(_._4).sliding(2) if path.length > 1)
        assert(es.contains((a, b)), s"($a,$b) not an edge")
    }
  }

  test("deterministic across runs") {
    val edges = (0L to 20L).flatMap(a => Seq((a, (a + 1) % 21), (a, (a + 7) % 21)))
    assert(run(edges, 2, 3).sorted === run(edges, 2, 3).sorted)
  }

  test("walks stop at sinks") {
    // 1 -> 2 -> 3, 3 has no out-edges: walks from 3 emit only step 0
    val rows = run(Seq((1L, 2L), (2L, 3L)), 1, 4)
    val from3 = rows.filter(_._1 == 3L)
    assert(from3.map(_._3).max === 0)
    // from 1 the path is forced: 1,2,3 then stops (len caps at reachable)
    val from1 = rows.filter(_._1 == 1L).sortBy(_._3).map(_._4)
    assert(from1 === Seq(1L, 2L, 3L))
  }

  test("biased walks match a pure-Scala replay of the weighted md5 race") {
    val rnd = new scala.util.Random(7)
    val edges = (for (_ <- 0 until 120) yield
      (rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
      .filter(e => e._1 != e._2).distinct
    val (wRet, wIn, wOut) = (4L, 2L, 1L)
    val got = RandomWalks.biasedWalks(edges.toDF("src", "dst"), "src", "dst",
        walksPerNode = 2, len = 4, wRet, wIn, wOut)
      .as[(Long, Long, Int, Long)].collect().toSeq.sorted
    // reference: same md5 trial race, same argmin, sequentially per walker
    def md5(s: String): Long = graft.functions.Md5LongUtil.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    def raceKey(id: String, w: Long): Long =
      (1L to math.max(w, 1L)).map(j => md5(s"$id#$j") % (1L << 40)).min
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val expect = (for (start <- nodes; walk <- 0L to 1L) yield {
      var prev = Option.empty[Long]; var cur = start
      val path = scala.collection.mutable.ArrayBuffer(start)
      var t = 1
      var stopped = false
      while (t <= 4 && !stopped) {
        val nbrs = adj.getOrElse(cur, Set.empty)
        if (nbrs.isEmpty) stopped = true
        else {
          val pick = nbrs.map { x =>
            val w = if (prev.contains(x)) wRet
              else if (prev.exists(p => adj.getOrElse(p, Set.empty).contains(x))) wIn
              else wOut
            (raceKey(s"$start:$walk:$t:$x", w), x)
          }.min._2
          prev = Some(cur); cur = pick; path += pick
        }
        t += 1
      }
      path.zipWithIndex.map { case (n, st) => (start, walk, st, n) }
    }).flatten.sorted
    assert(got === expect)
  }

  test("return bias dominates when wRet is large (complete graph)") {
    val nodes = 0L until 8L
    val edges = for (a <- nodes; b <- nodes if a != b) yield (a, b)
    val rows = RandomWalks.biasedWalks(edges.toDF("src", "dst"), "src", "dst",
        walksPerNode = 20, len = 2, wRet = 50L, wIn = 1L, wOut = 1L)
      .as[(Long, Long, Int, Long)].collect()
    val byWalker = rows.groupBy(r => (r._1, r._2))
    val returns = byWalker.values.count { p =>
      val path = p.sortBy(_._3).map(_._4)
      path.length == 3 && path(2) == path(0) // step 2 returned to start
    }
    // P(return) = 50/56 per walker; 160 walkers — far above a fair pick
    assert(returns > 100, s"expected dominant returns, got $returns/160")
  }

  test("md5 pick spreads over a high-degree hub's neighbors") {
    // star: hub 0 -> 1..40; many walks from the hub should hit many
    // distinct neighbors (uniform-ish, not constant)
    val edges = (1L to 40L).map(n => (0L, n))
    val picks = run(edges, 30, 1).filter(r => r._1 == 0L && r._3 == 1).map(_._4)
    assert(picks.size === 30)
    assert(picks.distinct.size >= 15, s"md5 pick collapsed: $picks")
  }
}
