package graft.functions

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MisraGriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def agg(k: Int) =
    MisraGriesAgg(BoundReference(0, StringType, nullable = true), k)

  private def row(s: String) = new GenericInternalRow(Array[Any](UTF8String.fromString(s)))

  /** Run a stream through the aggregate with a random partition/merge tree
    * and return the summary map. */
  private def runTree(a: MisraGriesAgg, stream: Seq[String], rng: Random): Map[String, Long] = {
    val nParts = 1 + rng.nextInt(5)
    val parts = stream.grouped(math.max(1, math.ceil(stream.size.toDouble / nParts).toInt)).toSeq
    val bufs = parts.map { p =>
      val b = a.createAggregationBuffer()
      // serialize/deserialize round-trip exercises the shuffle path
      p.foreach(s => a.update(b, row(s)))
      a.deserialize(a.serialize(b))
    }
    // left-fold merge in a shuffled order (merge trees are arbitrary)
    val shuffled = rng.shuffle(bufs)
    val merged = shuffled.tail.foldLeft(shuffled.head)((x, y) => a.merge(x, y))
    merged.toMap
  }

  test("guarantees hold over random streams, partitionings, and merge orders") {
    val rng = new Random(42)
    for (trial <- 1 to 30) {
      val k = 1 + rng.nextInt(8)
      val vocab = (1 to (2 + rng.nextInt(30))).map(i => s"t$i")
      // zipf-ish skew so some items are genuinely heavy
      val stream = (1 to (50 + rng.nextInt(500))).map { _ =>
        vocab(math.min(vocab.size - 1, (math.abs(rng.nextGaussian()) * vocab.size / 3).toInt))
      }
      val n = stream.size.toLong
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val summary = runTree(agg(k), stream, rng)
      assert(summary.size <= k, s"trial $trial: size ${summary.size} > k=$k")
      summary.foreach { case (key, est) =>
        val cnt = exact.getOrElse(key, 0L)
        assert(est <= cnt, s"trial $trial: overcount $key est=$est cnt=$cnt")
        assert((cnt - est) * (k + 1) <= n,
          s"trial $trial: undercount past n/(k+1): $key est=$est cnt=$cnt n=$n k=$k")
      }
      exact.foreach { case (key, cnt) =>
        if (cnt * (k + 1) > n)
          assert(summary.contains(key),
            s"trial $trial: heavy item $key (cnt=$cnt, n=$n, k=$k) missing")
      }
    }
  }

  test("k >= distinct keys degrades to exact counts under any merge tree") {
    val rng = new Random(7)
    val stream = rng.shuffle(Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(3)("c"))
    val summary = runTree(agg(8), stream, rng)
    assert(summary == Map("a" -> 40L, "b" -> 25L, "c" -> 3L))
  }

  test("decrement step: k+1 distinct singletons cancel to an empty table") {
    val a = agg(2)
    val b = a.createAggregationBuffer()
    Seq("x", "y", "z").foreach(s => a.update(b, row(s))) // x,y fill; z decrements both out
    assert(b.isEmpty)
  }

  test("DataFrame aggregate matches guarantees across a real shuffle") {
    val k = 4
    val data = (1 to 2000).map(i => s"k${i % 13}") ++ Seq.fill(900)("hot")
    val df = data.toDF("s").repartition(8)
    val n = data.size.toLong
    val out = df.agg(MisraGriesAggregate.summary(col("s"), k).as("mg"))
      .select(explode(col("mg")).as("e"))
      .select(col("e.key"), col("e.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(out.size <= k)
    out.foreach { case (key, est) =>
      assert(est <= exact(key))
      assert((exact(key) - est) * (k + 1) <= n)
    }
    // "hot" has 900 + 2000/13 ≈ 1053 of 2900 — far past n/(k+1)=580
    assert(out.contains("hot"))
  }
}
