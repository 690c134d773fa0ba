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

  test("md5 pick spreads over a high-degree hub's neighbors") {
    // star: hub 0 -> 1..40; many walks from the hub should hit many
    // distinct neighbors (uniform-ish, not constant)
    val edges = (1L to 40L).map(n => (0L, n))
    val picks = run(edges, 30, 1).filter(r => r._1 == 0L && r._3 == 1).map(_._4)
    assert(picks.size === 30)
    assert(picks.distinct.size >= 15, s"md5 pick collapsed: $picks")
  }
}
