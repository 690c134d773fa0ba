package graft.operators

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class StreamingKCenterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def d2(a: List[Long], b: List[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  /** independently written single-pass replay of the doubling algorithm
    * (same spec as the operator, coded from the paper, not shared). */
  private def replay(pts: Seq[(Long, List[Long])], k: Int): (List[Long], List[List[Long]], Long) = {
    var ids = List.empty[Long]; var vs = List.empty[List[Long]]; var r2 = 0L
    var inited = false
    def keep(): Unit = {
      val order = ids.indices.sortBy(ids(_))
      val kept = scala.collection.mutable.ArrayBuffer[Int]()
      order.foreach { i =>
        if (kept.forall(j => d2(vs(i), vs(j)) > 4 * r2)) kept += i
      }
      val ks = kept.sorted
      ids = ks.map(ids(_)).toList; vs = ks.map(vs(_)).toList
    }
    def minPair(nz: Boolean): Long = {
      var m = Long.MaxValue
      for (i <- vs.indices; j <- i + 1 until vs.size) {
        val d = d2(vs(i), vs(j)); if ((d > 0 || !nz) && d < m) m = d
      }
      m
    }
    def merge(): Unit = { keep(); while (ids.size > k) {
      val nz = minPair(nz = true)
      r2 = if (r2 == 0) math.max(1L, if (nz == Long.MaxValue) 1L else nz / 4) else r2 * 4
      keep()
    } }
    pts.sortBy(_._1).foreach { case (id, v) =>
      if (!inited) {
        ids :+= id; vs :+= v
        if (ids.size == k + 1) { r2 = minPair(nz = false) / 4; inited = true; merge() }
      } else if (vs.map(d2(_, v)).min > 4 * r2) {
        ids :+= id; vs :+= v
        if (ids.size > k) merge()
      }
    }
    (ids, vs, r2)
  }

  private def mkPoints(n: Int, seed: Int): Seq[(Long, Seq[Double])] = {
    val rnd = new Random(seed)
    val blobs = Seq(Seq(10.0, 0.0), Seq(0.0, 10.0), Seq(-10.0, 0.0), Seq(0.0, -10.0))
    (0 until n).map { i =>
      val b = blobs(rnd.nextInt(4))
      (i.toLong, b.zipWithIndex.map { case (c, _) => c + rnd.nextDouble() * 0.5 })
    }
  }

  test("single-batch fold matches an independently written replay") {
    val pts = mkPoints(200, 11).map { case (id, v) => (id, StreamingKCenter.micro(v)) }
    val st = StreamingKCenter.fold(
      StreamingKCenter.St(Nil, Nil, 0L, 0L, inited = false), pts, k = 6)
    val (ids, _, r2) = replay(pts, 6)
    assert(st.ids === ids)
    assert(st.r2 === r2)
    assert(st.n === 200L)
  }

  test("invariants hold over a stream under random slicing; blobs all covered") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val pts = mkPoints(300, 23)
    val micro = pts.map { case (id, v) => (id, StreamingKCenter.micro(v)) }.toMap
    for (slices <- Seq(Seq(300), Seq(40, 260), Seq(100, 100, 100))) {
      val mem = MemoryStream[(Long, Seq[Double])]
      val q = StreamingKCenter.summaries(
          mem.toDF().toDF("id", "vec"), k = 6)
        .writeStream.format("memory").queryName(s"kc_${slices.mkString("_")}")
        .outputMode("update").start()
      try {
        var rest = pts
        slices.foreach { s =>
          val (a, b) = rest.splitAt(s); rest = b
          mem.addData(a); q.processAllAvailable()
        }
        val last = spark.table(s"kc_${slices.mkString("_")}")
          .orderBy(org.apache.spark.sql.functions.desc("n_seen")).head()
        val nSeen = last.getLong(0); val nC = last.getInt(1)
        val r2 = last.getLong(2)
        val cids = last.getSeq[Long](3)
        assert(nSeen === 300L)
        assert(nC <= 6 && nC === cids.size)
        val cvs = cids.map(micro(_)).toList
        // pairwise separation invariant
        for (i <- cvs.indices; j <- i + 1 until cvs.size)
          assert(d2(cvs(i), cvs(j)) > 4 * r2, s"centers $i,$j too close")
        // coverage: every point within the doubling bound of a center
        val worst = pts.map { case (id, v) =>
          cvs.map(d2(_, StreamingKCenter.micro(v))).min
        }.max
        assert(worst <= 64 * math.max(r2, 1L), s"worst=$worst r2=$r2")
        // quality on planted geometry: one center per blob (blob id by
        // nearest ideal corner)
        def blobOf(v: List[Long]): Int =
          Seq(List(10L, 0L), List(0L, 10L), List(-10L, 0L), List(0L, -10L))
            .map(c => d2(c.map(_ * 1000000L), v)).zipWithIndex.min._2
        assert(cvs.map(blobOf).toSet.size === 4, "a blob lost its center")
      } finally q.stop()
    }
  }
}
