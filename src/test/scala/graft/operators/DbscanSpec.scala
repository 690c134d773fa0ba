package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DbscanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Pure-Scala brute DBSCAN with the operator's exact contract:
    * ε-ball counts include the point itself, clusters = CC over core-core
    * edges rooted at the min member id, border = min core-neighbor root,
    * noise = −1. */
  private def reference(pts: Seq[(Long, Long, Long)], eps: Long, minPts: Int)
      : Map[Long, (Boolean, Long)] = {
    def close(p: (Long, Long, Long), q: (Long, Long, Long)): Boolean = {
      val (dx, dy) = (p._2 - q._2, p._3 - q._3)
      dx * dx + dy * dy <= eps * eps
    }
    val nbrs = pts.map(p => p._1 ->
      pts.filter(q => q._1 != p._1 && close(p, q)).map(_._1)).toMap
    val core = pts.map(_._1).filter(id => nbrs(id).size + 1 >= minPts).toSet
    // CC over core-core edges (union-find by min)
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x0: Long): Long = {
      var x = x0; while (parent.getOrElse(x, x) != x) x = parent(x); x
    }
    for (a <- core; b <- nbrs(a) if core(b)) {
      val (ra, rb) = (find(a), find(b))
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    val roots = core.map(id => id -> find(id)).toMap
    pts.map { p =>
      val id = p._1
      if (core(id)) id -> (true, roots(id))
      else {
        val coreNbrRoots = nbrs(id).filter(core).map(roots)
        if (coreNbrRoots.nonEmpty) id -> (false, coreNbrRoots.min)
        else id -> (false, -1L)
      }
    }.toMap
  }

  private def run(pts: Seq[(Long, Long, Long)], eps: Long, minPts: Int)
      : Map[Long, (Boolean, Long)] = {
    val out = Dbscan.cluster(pts.toDF("id", "x", "y"), "id", "x", "y", eps, minPts)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(3), r.getLong(4))).toMap
    spark.catalog.clearCache()
    out
  }

  test("two planted blobs, a bridge-free gap, border and noise points") {
    // blob A around (0,0), blob B around (100,0), one border point hanging
    // off A at distance <= eps from a core, one far noise point
    val blobA = Seq((1L, 0L, 0L), (2L, 1L, 0L), (3L, 0L, 1L), (4L, 1L, 1L))
    val blobB = Seq((10L, 100L, 0L), (11L, 101L, 0L), (12L, 100L, 1L), (13L, 101L, 1L))
    val border = Seq((20L, 3L, 0L))   // within eps=2 of (2,1,0) only
    val noise = Seq((30L, 50L, 50L))
    val pts = blobA ++ blobB ++ border ++ noise
    val got = run(pts, eps = 2L, minPts = 4)
    assert(got == reference(pts, 2L, 4))
    assert(got(1L) == (true, 1L) && got(10L) == (true, 10L), "two distinct clusters")
    assert(got(20L) == (false, 1L), "border point attaches to blob A's root")
    assert(got(30L) == (false, -1L), "far point is noise")
  }

  test("negative coordinates: grid cells align by floor division, not truncation") {
    // points straddling the origin; truncating div would split the cell
    // at 0 and a (-1, 1) pair could miss its 3x3 probe window
    val pts = Seq((1L, -1L, 0L), (2L, 1L, 0L), (3L, -1L, -1L), (4L, 1L, 1L),
      (5L, -40L, -40L))
    val got = run(pts, eps = 3L, minPts = 3)
    assert(got == reference(pts, 3L, 3))
    assert(got(1L)._2 == 1L && got(2L)._2 == 1L, "origin-straddling pair must cluster")
    assert(got(5L) == (false, -1L))
  }

  test("seeded fuzz: operator == brute reference across parameter regimes") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      // two gaussian-ish blobs + uniform scatter
      val pts = (1 to 60).map { i =>
        val (cx, cy) = if (i % 2 == 0) (0L, 0L) else (60L, 30L)
        (i.toLong, cx + rnd.nextInt(21) - 10L, cy + rnd.nextInt(21) - 10L)
      } ++ (61 to 80).map(i =>
        (i.toLong, rnd.nextInt(201) - 100L, rnd.nextInt(201) - 100L))
      for ((eps, mp) <- Seq((4L, 3), (8L, 5))) {
        assert(run(pts, eps, mp) == reference(pts, eps, mp),
          s"trial=$trial eps=$eps minPts=$mp")
      }
    }
  }

  test("a core-only singleton cluster roots at itself") {
    // 5 coincident points: all core (n=5 >= 5), one cluster rooted at min id
    val pts = (1L to 5L).map(i => (i, 0L, 0L))
    val got = run(pts, eps = 1L, minPts = 5)
    assert(got == (1L to 5L).map(i => i -> (true, 1L)).toMap)
  }
}
