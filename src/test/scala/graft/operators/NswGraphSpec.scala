package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class NswGraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val e = Tables.embeddings(spark, dir)
  private lazy val p = NswGraph.Params()
  private lazy val g = NswGraph.build(e, "vec_id", "embedding", p)

  test("build: id-sorted hubs, m-out adjacency with no self edges, entry set bounded") {
    assert(g.hubIds.toSeq == g.hubIds.toSeq.sorted)
    assert(g.adj.keySet == g.hubIds.toSet)
    g.adj.foreach { case (h, ns) =>
      // adjacency is the APPROXIMATE m-nearest (probed inner buckets), so
      // a list may fall short of m — or be EMPTY when a hub's probed inner
      // buckets held no other hub (build() allows it; asserting nonEmpty
      // would flake on corpora with singleton inner buckets) — but it must
      // never exceed m, self-loop, duplicate, or leave the hub set
      assert(ns.length <= p.m && !ns.contains(h) && ns.distinct == ns)
      assert(ns.forall(g.hubIds.contains))
    }
    assert(g.adj.values.exists(_.nonEmpty), "a fully edgeless graph means the build is broken")
    assert(g.entries.length == p.nEntries && g.entries.distinct == g.entries)
    assert(g.entries.forall(g.hubIds.contains))
  }

  test("hubTarget: floor at small n, ~sqrt growth once the corpus outgrows it") {
    assert(NswGraph.hubTarget(500, p) == 64, "floor dominates below 64^2")
    assert(NswGraph.hubTarget(4096, p) == 64)
    assert(NswGraph.hubTarget(4097, p) == 65, "past hubCap^2 the target tracks ceil(sqrt)")
    assert(NswGraph.hubTarget(1000000, p) == 1000)
    assert(NswGraph.hubTarget(100000000, p) == 10000,
      "100x data => 10x hubs — the routing layer scales with the corpus")
  }

  test("adjacency is DISTRIBUTED: shuffle-hash join, nothing hub-set-sized broadcasts") {
    val hubs = e.select(col("vec_id").as("id"),
      VectorOps.asDouble(col("embedding")).as("v"))
    val adjDf = NswGraph.adjacency(hubs, p)
    // pre-AQE sparkPlan (the adaptive wrapper hides exchanges): the probe
    // x assignment join must be a shuffled hash join — broadcasting either
    // side means broadcasting the hub relation, which scales ~sqrt(corpus)
    // and stops being broadcastable exactly when it matters
    val plan = adjDf.queryExecution.sparkPlan.toString
    assert(!plan.contains("BroadcastHashJoin") && !plan.contains("BroadcastExchange"),
      s"hub-derived side must not broadcast:\n${plan.take(3000)}")
    assert(plan.contains("ShuffledHashJoin"),
      s"expected the pinned shuffle hash join:\n${plan.take(3000)}")
  }

  test("full-probe adjacency degenerates to the exact brute m-nearest") {
    // adjNprobe = adjClusters => every inner bucket probed => the
    // candidate set is ALL hub pairs and the approximate adjacency must
    // equal the brute (cos DESC, id ASC) m-nearest the old driver loop
    // computed
    val pf = p.copy(adjNprobe = p.adjClusters)
    val gf = NswGraph.build(e, "vec_id", "embedding", pf)
    val vecOf = gf.hubIds.zip(gf.hubVecs).toMap
    def cosRef(a: Array[Double], b: Array[Double]): Double = {
      var dab = 0.0; var daa = 0.0; var dbb = 0.0; var i = 0
      while (i < a.length) { dab += a(i) * b(i); daa += a(i) * a(i); dbb += b(i) * b(i); i += 1 }
      dab / (math.sqrt(daa) * math.sqrt(dbb))
    }
    gf.hubIds.foreach { h =>
      val brute = gf.hubIds.toSeq.filter(_ != h)
        .sortBy(o => (-cosRef(vecOf(h), vecOf(o)), o)).take(pf.m)
      assert(gf.adj(h) == brute, s"hub $h adjacency must be the exact m-nearest")
    }
  }

  test("beam search: deterministic, bounded evals, probes are visited hubs") {
    val qv = e.filter(col("vec_id") === 3L)
      .select(VectorOps.asDouble(col("embedding"))).head.getSeq[Double](0).toArray
    val (probes1, ev1) = NswGraph.beamSearch(g, p, qv)
    val (probes2, ev2) = NswGraph.beamSearch(g, p, qv)
    assert(probes1 == probes2 && ev1 == ev2, "routing must be deterministic")
    assert(probes1.length == p.nprobe && probes1.distinct == probes1)
    assert(probes1.forall(g.hubIds.contains))
    // the NSW claim: the router scores strictly fewer hubs than a scan
    assert(ev1 < g.hubIds.length, s"evals $ev1 must beat the ${g.hubIds.length}-hub scan")
    // entries are always visited, so evals >= nEntries
    assert(ev1 >= p.nEntries)
  }

  test("hierarchical descent: super layer is exact, probes valid, phases share one state") {
    val hp = NswGraph.HierParams(superCap = 8, superEntries = 2,
      superRounds = 2, hubRounds = 3)
    val (supers, sadj, sents) = NswGraph.superLayer(g, p, hp)
    assert(supers.nonEmpty && supers.toSet.subsetOf(g.hubIds.toSet),
      "supers must be a subsample of the hubs")
    assert(sents.length == math.min(hp.superEntries, supers.length) &&
      sents.forall(supers.contains))
    // super adjacency is the EXACT m-nearest among supers (brute reference)
    val vecOf = g.hubIds.zip(g.hubVecs).toMap
    def cosRef(a: Array[Double], b: Array[Double]): Double = {
      var dab = 0.0; var daa = 0.0; var dbb = 0.0; var i = 0
      while (i < a.length) { dab += a(i) * b(i); daa += a(i) * a(i); dbb += b(i) * b(i); i += 1 }
      dab / (math.sqrt(daa) * math.sqrt(dbb))
    }
    for (s0 <- supers) {
      val brute = supers.filter(_ != s0)
        .sortBy(o => (-cosRef(vecOf(s0), vecOf(o)), o)).take(p.m)
      assert(sadj(s0) == brute, s"super $s0 adjacency")
    }
    // descent: deterministic, probes are hubs, evals bounded by both layers
    val qv = e.filter(col("vec_id") === 5L)
      .select(VectorOps.asDouble(col("embedding"))).head.getSeq[Double](0).toArray
    val (pr1, ev1) = NswGraph.beamSearchHier(g, p, hp, sadj, sents, qv)
    val (pr2, ev2) = NswGraph.beamSearchHier(g, p, hp, sadj, sents, qv)
    assert(pr1 == pr2 && ev1 == ev2)
    assert(pr1.length == p.nprobe && pr1.forall(g.hubIds.contains))
    assert(ev1 >= hp.superEntries && ev1 < g.hubIds.length)
  }

  test("scanProbes is the exact top-nprobe over the hub set (the ablation truth)") {
    val qv = e.filter(col("vec_id") === 7L)
      .select(VectorOps.asDouble(col("embedding"))).head.getSeq[Double](0).toArray
    val scan = NswGraph.scanProbes(g, p, qv)
    // brute reference over the collected hub vectors
    val vecOf = g.hubIds.zip(g.hubVecs).toMap
    def cosRef(a: Array[Double], b: Array[Double]): Double = {
      var dab = 0.0; var daa = 0.0; var dbb = 0.0; var i = 0
      while (i < a.length) { dab += a(i) * b(i); daa += a(i) * a(i); dbb += b(i) * b(i); i += 1 }
      dab / (math.sqrt(daa) * math.sqrt(dbb))
    }
    val brute = g.hubIds.toSeq
      .sortBy(h => (-cosRef(qv, vecOf(h)), h)).take(p.nprobe)
    assert(scan == brute)
    // beam probes can only contain hubs; with shared budget, overlap with
    // the exact set is what drives recall — sanity: both rank by the same
    // (cos DESC, id ASC) order over their candidate pools
    val (beam, _) = NswGraph.beamSearch(g, p, qv)
    assert(beam.toSet.subsetOf(g.hubIds.toSet))
  }

  test("persisted index: graph round-trips, search matches in-memory routing, scan is pruned") {
    val idx = java.nio.file.Files.createTempDirectory("nsw_idx").toString
    val g0 = NswGraph.writeIndex(e, "vec_id", "embedding", idx, p)
    val g1 = NswGraph.readGraph(idx)
    assert(g1.hubIds.toSeq == g0.hubIds.toSeq)
    assert(g1.hubVecs.map(_.toSeq).toSeq == g0.hubVecs.map(_.toSeq).toSeq,
      "Double.toString round-trips exactly — vectors must survive the sidecar")
    assert(g1.adj == g0.adj && g1.entries == g0.entries && g1.sampleMod == g0.sampleMod)

    val q = e.filter(col("vec_id") < 10)
    val fromIndex = NswGraph.indexSearch(q, idx, "vec_id", "embedding", k = 5, p)
    // parity: the same routing + an exact re-rank over the same buckets,
    // reproduced in memory
    val qrows = q.select(col("vec_id"), VectorOps.asDouble(col("embedding")))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val idxOf = g0.hubIds.zipWithIndex.toMap
    val att = NswGraph.attach(
      e.select(col("vec_id").as("neighbor_id"),
        VectorOps.asDouble(col("embedding")).as("cv")), g0)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getInt(2)))
    def cosRef(a: Array[Double], b: Array[Double]): Double = {
      var dab = 0.0; var daa = 0.0; var dbb = 0.0; var i = 0
      while (i < a.length) { dab += a(i) * b(i); daa += a(i) * a(i); dbb += b(i) * b(i); i += 1 }
      dab / (math.sqrt(daa) * math.sqrt(dbb))
    }
    val expected = qrows.flatMap { case (qid, qv) =>
      val probes = NswGraph.beamSearch(g0, p, qv)._1.map(idxOf).toSet
      att.filter(a => probes(a._3) && a._1 != qid)
        .map(a => (a._1, cosRef(qv, a._2)))
        .sortBy { case (nid, c) => (-c, nid) }.take(5).zipWithIndex
        .map { case ((nid, _), i) => (qid, nid, i + 1) }
    }.toSet
    val got = fromIndex.select(col("query_id"), col("neighbor_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expected)

    // the scan must be bucket-partition-pruned (disk I/O ∝ nprobe)
    val plan = fromIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"expected bucket partition pruning in:\n${plan.take(2000)}")
  }

  test("sidecar atomicity: readers refuse an index without the _ready marker") {
    val idx = java.nio.file.Files.createTempDirectory("nsw_idx2").toString
    NswGraph.writeIndex(e, "vec_id", "embedding", idx, p)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$idx/_ready")))
    // an interrupted rebuild revokes readiness FIRST — simulate the crash
    // window (data rewritten, sidecar not yet committed)
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$idx/_ready"))
    val e1 = intercept[IllegalArgumentException] { NswGraph.readGraph(idx) }
    assert(e1.getMessage.contains("_ready"))
    val e2 = intercept[IllegalArgumentException] {
      NswGraph.indexSearch(e.filter(col("vec_id") < 3), idx,
        "vec_id", "embedding", k = 5, p)
    }
    assert(e2.getMessage.contains("_ready"))
    // a completed rebuild restores readiness
    NswGraph.writeIndex(e, "vec_id", "embedding", idx, p)
    assert(NswGraph.readGraph(idx).hubIds.nonEmpty)
    graft.TempDirs.deleteRecursively(new java.io.File(idx))
  }

  test("attach assigns every corpus vector a bucket index into the hub array") {
    val c = e.select(col("vec_id").as("neighbor_id"),
      VectorOps.asDouble(col("embedding")).as("cv"))
    val att = NswGraph.attach(c, g)
    val buckets = att.select(col("bucket")).distinct()
      .collect().map(_.getInt(0))
    assert(att.count() == e.count())
    assert(buckets.forall(b => b >= 0 && b < g.hubIds.length))
  }
}
