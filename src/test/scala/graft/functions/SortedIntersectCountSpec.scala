package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The verify kernel of PrefixFilterJoin must count EXACTLY what
  * `size(array_intersect(...))` counts on sorted distinct arrays — the
  * fuzz here is the proof the VERDICT asked for. */
class SortedIntersectCountSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("count-equality with array_intersect on fuzzed sorted set pairs") {
    val rnd = new scala.util.Random(98)
    // overlapping value domains so intersections are non-trivial; include
    // negatives, Long extremes, empty and single-element sets
    val pairs = (1 to 300).map { i =>
      def set(n: Int, dom: Long) =
        Array.fill(n)(rnd.nextLong() % dom).distinct.sorted
      val dom = Seq(16L, 1000L, Long.MaxValue)(i % 3)
      val a = set(rnd.nextInt(200), dom)
      // force shared elements by splicing a slice of a into b
      val b = (set(rnd.nextInt(200), dom) ++ a.take(rnd.nextInt(a.length + 1)))
        .distinct.sorted
      (i.toLong, a, b)
    } :+ ((0L, Array.empty[Long], Array(Long.MinValue, 0L, Long.MaxValue)))
    val df = pairs.toDF("id", "a", "b")
      .withColumn("fast", VectorExpressions.sortedIntersectCount(col("a"), col("b")))
      .withColumn("ref", size(array_intersect(col("a"), col("b"))).cast("long"))
    val bad = df.filter(col("fast") =!= col("ref")).count()
    assert(bad == 0L)
    // and against a pure-Scala reference, independent of Spark's built-in
    val rows = df.select(col("id"), col("fast")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.foreach { case (id, a, b) =>
      assert(rows(id) == a.toSet.intersect(b.toSet).size.toLong, s"pair $id")
    }
  }

  test("null propagation matches the built-in") {
    val df = Seq(
      (1L, Some(Array(1L, 2L)), None: Option[Array[Long]]),
      (2L, None: Option[Array[Long]], Some(Array(1L, 2L))),
      (3L, Some(Array(1L, 2L)), Some(Array(2L, 3L)))
    ).toDF("id", "a", "b")
      .withColumn("fast", VectorExpressions.sortedIntersectCount(col("a"), col("b")))
    val got = df.select(col("id"), col("fast")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got == Map(1L -> -1L, 2L -> -1L, 3L -> 1L))
  }
}
