package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def labels(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.minLabel(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("pair, triangle and chain components each converge to min id") {
    // components: {1,2}, {3,4,5} (triangle), {10,11,12,13} (chain)
    val out = labels(Seq((1L, 2L), (4L, 3L), (3L, 5L), (4L, 5L),
      (11L, 10L), (11L, 12L), (12L, 13L)))
    assert(out == Map(
      1L -> 1L, 2L -> 1L,
      3L -> 3L, 4L -> 3L, 5L -> 3L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L))
  }

  test("long path needs diameter rounds but still converges") {
    // path 0-1-2-...-9: diameter 9 < default maxIter 20
    val out = labels((0L until 9L).map(i => (i, i + 1)))
    assert(out == (0L to 9L).map(_ -> 0L).toMap)
  }

  test("isolated vertices (no edges) are absent from the labeling") {
    val out = labels(Seq((7L, 8L)))
    assert(out == Map(7L -> 7L, 8L -> 7L))
  }

  test("duplicate and reversed edges are harmless") {
    val out = labels(Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L)))
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
