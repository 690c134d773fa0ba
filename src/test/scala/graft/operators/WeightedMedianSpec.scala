package graft.operators

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class WeightedMedianSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Reference: smallest v whose running weight (values ascending)
    * reaches (W+1)/2. */
  private def ref(rows: Seq[(Long, Long)]): Long = {
    val w = rows.map(_._2).sum
    val t = (w + 1) / 2
    var cum = 0L
    for ((v, wt) <- rows.sortBy(_._1)) {
      cum += wt
      if (cum >= t) return v
    }
    sys.error("unreachable: target past total weight")
  }

  test("seeded fuzz against the pure-Scala reference, many shapes") {
    import spark.implicits._
    val rnd = new Random(20260814L)
    for (trial <- 1 to 8) {
      val data = for {
        g <- Seq("a", "b", "c")
        _ <- 1 to (1 + rnd.nextInt(200))
      } yield {
        // mix wide and narrow domains, heavy ties, big weights
        val v = trial match {
          case t if t % 3 == 0 => rnd.nextInt(5).toLong          // heavy ties
          case t if t % 3 == 1 => rnd.nextLong() % 1000000000L   // wide, signed
          case _               => 1000000L + rnd.nextInt(100)    // narrow band
        }
        (g, v, 1L + rnd.nextInt(50))
      }
      val out = WeightedMedian
        .exact(spark, data.toDF("g", "v", "w"), "g", "v", "w", bins = 8)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val byG = data.groupBy(_._1)
      for ((g, rows) <- byG) {
        val pairs = rows.map(t => (t._2, t._3))
        assert(out(g)._1 == pairs.map(_._2).sum, s"trial $trial group $g weight")
        assert(out(g)._2 == ref(pairs), s"trial $trial group $g median")
      }
    }
  }

  test("median of a single-value group and the weight-crossing boundary") {
    import spark.implicits._
    // weights engineered so the target lands exactly ON a boundary:
    // W=10, T=5; cum(1)=4, cum(2)=5 -> lower weighted median is 2
    val df = Seq(("x", 1L, 4L), ("x", 2L, 1L), ("x", 3L, 5L),
      ("solo", 42L, 7L)).toDF("g", "v", "w")
    val out = WeightedMedian.exact(spark, df, "g", "v", "w")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out("x") == 2L)
    assert(out("solo") == 42L)
  }

  test("arbitrary weighted quantiles track the reference (p10/p90, fuzzed)") {
    import spark.implicits._
    def refQ(rows: Seq[(Long, Long)], pn: Long, pd: Long): Long = {
      val w = rows.map(_._2).sum
      val t = (w * pn + pd - 1) / pd
      var cum = 0L
      for ((v, wt) <- rows.sortBy(_._1)) {
        cum += wt
        if (cum >= t) return v
      }
      sys.error("unreachable")
    }
    val rnd = new Random(99L)
    val data = for (g <- Seq("a", "b"); _ <- 1 to 300)
      yield (g, rnd.nextLong() % 100000L, 1L + rnd.nextInt(9))
    for ((pn, pd) <- Seq((1L, 10L), (9L, 10L), (1L, 1L))) {
      val out = WeightedMedian
        .quantile(spark, data.toDF("g", "v", "w"), "g", "v", "w", pn, pd, bins = 16)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      for ((g, rows) <- data.groupBy(_._1))
        assert(out(g) == refQ(rows.map(t => (t._2, t._3)), pn, pd), s"p=$pn/$pd g=$g")
    }
  }

  test("multi-quantile shared-scan form equals per-quantile calls") {
    import spark.implicits._
    val rnd = new Random(777L)
    val data = for (g <- Seq("a", "b", "c"); _ <- 1 to 250)
      yield (g, rnd.nextLong() % 5000000L, 1L + rnd.nextInt(20))
    val df = data.toDF("g", "v", "w")
    val ps = Seq(("p10", 1L, 10L), ("p50", 1L, 2L), ("p90", 9L, 10L), ("p100", 1L, 1L))
    val multi = WeightedMedian.quantiles(spark, df, "g", "v", "w", ps, bins = 8)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    for ((label, pn, pd) <- ps) {
      val single = WeightedMedian.quantile(spark, df, "g", "v", "w", pn, pd, bins = 8)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      for (g <- Seq("a", "b", "c"))
        assert(multi((g, label)) == single(g), s"label=$label g=$g")
    }
  }

  test("quantile labels must be unique") {
    import spark.implicits._
    val df = Seq(("g", 1L, 1L)).toDF("g", "v", "w")
    intercept[IllegalArgumentException] {
      WeightedMedian.quantiles(spark, df, "g", "v", "w",
        Seq(("p", 1L, 2L), ("p", 9L, 10L)))
    }
  }

  test("non-positive weights fail loudly") {
    import spark.implicits._
    val df = Seq(("g", 1L, 0L)).toDF("g", "v", "w")
    intercept[IllegalArgumentException] {
      WeightedMedian.exact(spark, df, "g", "v", "w")
    }
  }
}
