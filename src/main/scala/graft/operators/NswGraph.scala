package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextHash

/** Graph-based ANN routing — a navigable-small-world (NSW / HNSW-family)
  * layer over the embedding corpus (Malkov & Yashunin 2018, simplified to
  * the one deterministic, hash-replayable layer that carries the idea):
  *
  *   - a bounded HUB set (deterministic md5 sample, the [[KMeansIVF]]
  *     fit-sample discipline — the "upper layer" that in HNSW serving
  *     lives in RAM on every node);
  *   - each hub keeps edges to its M nearest hubs (cos DESC, id ASC —
  *     a deterministic total order);
  *   - a query routes by GREEDY BEAM SEARCH from a deterministic
  *     multi-restart ENTRY SET (Malkov et al. 2014's NSW searches from
  *     several entry points): each round scores only the current beam's
  *     unvisited neighbors, so the router touches O(rounds·beam·M) hubs
  *     instead of scanning all of them — the property that makes graph
  *     ANN the serving default when the centroid/hub set itself is too
  *     large to scan per query;
  *   - every corpus vector attaches to its nearest hub (map-side
  *     [[graft.functions.NearestCentroids]] expression over the hub
  *     vectors — the corpus never shuffles for the build);
  *   - the search scans only the buckets of the top-`nprobe` VISITED
  *     hubs (bounded candidate set, exact re-rank inside).
  *
  * Everything is deterministic and DuckDB-replayable: hub membership is
  * an md5 predicate, adjacency and all ranks order by (cosine DESC, id
  * ASC), and the driver-side cosine is the same left-to-right fold the
  * SQL replay's `list_dot_product / (sqrt·sqrt)` computes ([[KMeansIVF]]
  * fit precedent), so the beam's whole trajectory — and therefore the
  * recall number built on it — is hash-checked by the oracle.
  *
  * Scale posture: hubs and queries are count-bounded collects (the hub
  * cap plays HNSW's level-sample role); attachment is map-side; the
  * candidate scan is a broadcast of (query, probed-hub) pairs joined
  * against the hub-keyed corpus — ∝ probed bucket sizes, never corpus².
  */
object NswGraph {

  /** `hubCap` is the FLOOR of the hub budget: the effective target is
    * `max(hubCap, ceil(sqrt(n)))` ([[hubTarget]]) so the routing layer
    * grows ~√n with the corpus — at 100 TB the upper layer must scale or
    * its buckets don't ([[KMeansIVF.sampleModFor]] then bounds the sample
    * modulus from the same count). The `adj*` params drive the
    * DISTRIBUTED hub-adjacency build ([[KMeansIVF.selfTopK]] over the hub
    * relation): an inner IVF fit over the hubs themselves, each hub
    * probing `adjNprobe` inner buckets — candidates Σ|probes_b|·|bucket_b|,
    * never |hubs|², and no driver-side pair loop. */
  final case class Params(
      hubCap: Long = 64, m: Int = 6, beamWidth: Int = 4,
      rounds: Int = 4, nprobe: Int = 5, nEntries: Int = 8,
      adjClusters: Int = 8, adjIters: Int = 2, adjNprobe: Int = 3,
      adjSampleCap: Long = 2048)

  /** The routing layer: hub ids sorted ascending (array index = the
    * attachment bucket id), their vectors, the M-nearest adjacency, the
    * multi-restart entry set, and the sample modulus that selected them. */
  final case class Graph(
      hubIds: Array[Long], hubVecs: Array[Array[Double]],
      adj: Map[Long, Seq[Long]], entries: Seq[Long], sampleMod: Int)

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    val c = KMeansIVF.cosineSeq(a, b)
    // NaN → +inf: DuckDB sorts NaN above every number in ORDER BY DESC
    if (java.lang.Double.isNaN(c)) Double.PositiveInfinity else c
  }

  /** The effective hub budget for a corpus of `n` rows: the `hubCap`
    * floor, growing ~√n once the corpus outgrows it — 100× data ⇒ 10×
    * hubs (and ~10× bucket size), the balance point where neither the
    * routing layer nor the attached buckets explode. Integer-exact and
    * SQL-replayable: IEEE sqrt is correctly rounded on both engines and
    * n < 2^53, so `ceil(sqrt(n::DOUBLE))` computes the identical value. */
  def hubTarget(n: Long, p: Params): Long =
    math.max(p.hubCap, math.ceil(math.sqrt(n.toDouble)).toLong)

  /** DISTRIBUTED hub adjacency: approximate M-nearest neighbors of each
    * hub among the hubs, via [[KMeansIVF.selfTopK]] — an inner IVF fit on
    * a bounded hub sample, map-side bucket assignment, probe×bucket
    * shuffle-hash join, bounded top-m aggregate. Candidates are
    * Σ|probes_b|·|bucket_b| — sub-quadratic in |hubs| — and NOTHING
    * hub-set-sized broadcasts or loops on the driver (the O(hubCap²)
    * driver pair loop this replaces stopped being sound once hubCap
    * scales ~√n). Output = selfTopK's `(query_id, neighbor_id, rank,
    * cosine)`; the collect downstream is O(|hubs|·m) rows, the same
    * order as the graph sidecar itself. */
  def adjacency(hubs: DataFrame, p: Params): DataFrame =
    KMeansIVF.selfTopK(hubs, "id", "v", k = p.m, nprobe = p.adjNprobe,
      nClusters = p.adjClusters, iters = p.adjIters, sampleCap = p.adjSampleCap)

  /** Build the routing layer. Collects only the md5 hub sample (≤ ~target
    * rows by the count-derived modulus) and its O(|hubs|·m) adjacency
    * rows; adjacency itself is computed distributed ([[adjacency]]) and
    * the corpus is untouched. */
  def build(corpus: DataFrame, idCol: String, vecCol: String, p: Params): Graph = {
    require(p.m >= 1 && p.beamWidth >= 1 && p.nprobe >= 1 && p.nEntries >= 1,
      s"degenerate params $p — every graph dimension must be >= 1")
    val c = corpus.select(
      col(idCol).as("id"), VectorOps.asDouble(col(vecCol)).as("v"))
    val n = c.count() // one job; feeds both the target and the modulus
    val mod = KMeansIVF.sampleModFor(n, hubTarget(n, p))
    val hubsDf = c
      .filter(pmod(TextHash.md5Long(col("id").cast("string")), lit(mod)) === 0)
      .persist() // consumed by: adjacency (count + sample + both join sides) and the hub-vector collect
    val adjRows = adjacency(hubsDf, p)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val adjM = adjRows.groupBy(_._1).map { case (h, rs) =>
      h -> rs.sortBy(_._3).map(_._2).toSeq }
    val hubRows = hubsDf.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    hubsDf.unpersist()
    require(hubRows.length > p.m,
      s"hub sample too small (${hubRows.length}) for m=${p.m} adjacency")
    // a hub whose probed inner buckets held no other hub keeps an empty
    // edge list (the oracle's adj CTE misses it identically)
    val adj = hubRows.map { case (hid, _) =>
      hid -> adjM.getOrElse(hid, Seq.empty) }.toMap
    // multi-restart entry set (Malkov et al. 2014's NSW searches from
    // several entry points): the nEntries hubs FIRST in (md5(hid), hid)
    // order — a deterministic scatter uncorrelated with geometry
    val entries = hubRows.map(_._1)
      .sortBy(h => (graft.functions.Md5LongUtil.hashBytes(
        h.toString.getBytes("UTF-8")), h))
      .take(p.nEntries).toSeq
    Graph(hubRows.map(_._1), hubRows.map(_._2), adj, entries, mod)
  }

  /** Greedy beam search for one query vector:
    * visited₀ = the entry set; each round scores the beam's unvisited
    * neighbors and re-selects the beam as the top-`beamWidth` of ALL
    * visited hubs; probes = top-`nprobe` visited by (cos DESC, id ASC).
    * Returns the probe hub ids and the number of hubs SCORED
    * (= |visited| — the routing cost a full hub scan would pay |hubs|
    * for). */
  def beamSearch(g: Graph, p: Params, qv: Array[Double]): (Seq[Long], Int) = {
    val vecOf = g.hubIds.zip(g.hubVecs).toMap
    val scores = scala.collection.mutable.LinkedHashMap[Long, Double](
      g.entries.map(h => h -> cos(qv, vecOf(h))): _*)
    var beam: Seq[Long] = scores.toSeq.sortBy { case (h, c) => (-c, h) }
      .take(p.beamWidth).map(_._1)
    for (_ <- 1 to p.rounds) {
      val fresh = beam.flatMap(g.adj).distinct.filterNot(scores.contains)
      fresh.foreach(h => scores(h) = cos(qv, vecOf(h)))
      beam = scores.toSeq.sortBy { case (h, c) => (-c, h) }
        .take(p.beamWidth).map(_._1)
    }
    val probes = scores.toSeq.sortBy { case (h, c) => (-c, h) }
      .take(p.nprobe).map(_._1)
    (probes, scores.size)
  }

  /** HIERARCHICAL (HNSW-style) descent parameters — ONE upper routing
    * layer over the hubs: `superCap` floors the super-hub budget (the
    * same count-derived √ rule applied one level up, so supers ~ n^(1/4));
    * the descent seeds the beam with only `superEntries` entry supers
    * (instead of the single-layer's `nEntries` scattered hubs), expands
    * `superRounds` rounds over the SUPER adjacency — cheap, geometry-
    * coarse navigation — then switches to the hub adjacency for the usual
    * `rounds`. The point: md5-scattered entries waste hub evaluations
    * landing far from the query; the upper layer finds the right region
    * in O(supers-visited) evals, so equal recall costs measurably fewer
    * total evaluations (q347 audits exactly that, hash-checked). */
  final case class HierParams(
      superCap: Long = 16, superEntries: Int = 2, superRounds: Int = 2,
      hubRounds: Int = 3)

  /** Count-derived super-hub modulus over the hub set — [[hubTarget]]'s
    * rule one level up. */
  def superModFor(nHubs: Long, hp: HierParams): Int =
    KMeansIVF.sampleModFor(nHubs,
      math.max(hp.superCap, math.ceil(math.sqrt(nHubs.toDouble)).toLong))

  /** The upper layer: super-hub ids (deterministic md5 subsample of the
    * hubs) and their EXACT m-nearest adjacency among themselves, plus the
    * entry set. |supers| ~ |hubs|^(1/2) = n^(1/4), so the driver pair loop
    * is O(supers²) = O(|hubs|) — the same order as the Graph this routine
    * already holds in memory (distributing it would shuffle less data than
    * its own job overhead). Compute ONCE per query batch. */
  def superLayer(g: Graph, p: Params, hp: HierParams)
    : (Seq[Long], Map[Long, Seq[Long]], Seq[Long]) = {
    val mod = superModFor(g.hubIds.length.toLong, hp)
    val supers = g.hubIds.toSeq.filter(h =>
      graft.functions.Md5LongUtil.hashBytes(
        h.toString.getBytes("UTF-8")) % mod == 0)
    val vecOf = g.hubIds.zip(g.hubVecs).toMap
    val sadj = supers.map { s =>
      s -> supers.filter(_ != s)
        .map(o => (o, cos(vecOf(s), vecOf(o))))
        .sortBy { case (o, c) => (-c, o) }
        .take(p.m).map(_._1)
    }.toMap
    val sents = supers
      .sortBy(h => (graft.functions.Md5LongUtil.hashBytes(
        h.toString.getBytes("UTF-8")), h))
      .take(hp.superEntries)
    (supers, sadj, sents)
  }

  /** Hierarchical beam search: phase 1 expands over the super adjacency
    * from the (small) super entry set, phase 2 continues the SAME beam —
    * one visited/score state, beam re-selected from all visited each
    * round, exactly [[beamSearch]]'s rule — over the hub adjacency.
    * Returns the probe hubs and the total nodes SCORED across both
    * layers (the honest eval count the q347 audit compares). */
  def beamSearchHier(g: Graph, p: Params, hp: HierParams,
                     sadj: Map[Long, Seq[Long]], sents: Seq[Long],
                     qv: Array[Double]): (Seq[Long], Int) = {
    val vecOf = g.hubIds.zip(g.hubVecs).toMap
    val scores = scala.collection.mutable.LinkedHashMap[Long, Double](
      sents.map(h => h -> cos(qv, vecOf(h))): _*)
    def top(k: Int): Seq[Long] = scores.toSeq
      .sortBy { case (h, c) => (-c, h) }.take(k).map(_._1)
    var beam = top(p.beamWidth)
    for (_ <- 1 to hp.superRounds) {
      val fresh = beam.flatMap(h => sadj.getOrElse(h, Seq.empty))
        .distinct.filterNot(scores.contains)
      fresh.foreach(h => scores(h) = cos(qv, vecOf(h)))
      beam = top(p.beamWidth)
    }
    for (_ <- 1 to hp.hubRounds) {
      val fresh = beam.flatMap(g.adj).distinct.filterNot(scores.contains)
      fresh.foreach(h => scores(h) = cos(qv, vecOf(h)))
      beam = top(p.beamWidth)
    }
    (top(p.nprobe), scores.size)
  }

  /** The ablation baseline: the exact top-`nprobe` hubs by full hub scan
    * (what IVF probing does) — same probe budget, |hubs| scoring cost. */
  def scanProbes(g: Graph, p: Params, qv: Array[Double]): Seq[Long] = {
    val vecOf = g.hubIds.zip(g.hubVecs).toMap
    g.hubIds.toSeq.map(h => (h, cos(qv, vecOf(h))))
      .sortBy { case (h, c) => (-c, h) }
      .take(p.nprobe).map(_._1)
  }

  /** Corpus attachment: each vector's bucket = the INDEX (into the
    * id-sorted hub array) of its nearest hub — map-side, no shuffle.
    * Input columns (neighbor_id, cv). */
  def attach(c: DataFrame, g: Graph): DataFrame =
    KMeansIVF.assignBuckets(c, g.hubVecs)

  /** Persist the routing layer + attachment — the q49 lifecycle for graph
    * ANN: the corpus written `partitionBy(bucket)` (one directory per hub)
    * plus the GRAPH as a line-format sidecar (hub vectors, adjacency,
    * entries, sample modulus). Repeated query batches then route on the
    * in-memory graph and read ONLY the probed hub buckets from storage —
    * partition pruning turns nprobe into a disk-level saving. */
  def writeIndex(corpus: DataFrame, idCol: String, vecCol: String,
                 dir: String, p: Params): Graph = {
    // rebuilds serialize with appends on append.lock (the KMeansIVF
    // protocol): an append attaching to the OLD hubs could otherwise
    // commit its `_done` into the NEW generation after the cleanup below
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val lock = java.nio.file.Paths.get(s"$dir/append.lock")
    if (!graft.sources.LshIndex.casCreate(lock)) throw new IllegalStateException(
      s"an append or rebuild is in flight on $dir (append.lock) — retry later " +
        "or remove the lock if its owner is known dead")
    try {
      // a REBUILD over an existing index first revokes readiness: a crash
      // anywhere below leaves no `_ready`, and readers fail loudly instead
      // of routing fresh bucket data with a stale/truncated sidecar graph
      // (the IvfPq sidecar discipline); appends attached to the old hub
      // generation are cleared
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(s"$dir/_ready"))
      val appendsDir = new java.io.File(s"$dir/appends")
      if (appendsDir.exists()) graft.TempDirs.deleteRecursively(appendsDir)
      val g = build(corpus, idCol, vecCol, p)
      val c = corpus.select(col(idCol).as("neighbor_id"),
        VectorOps.asDouble(col(vecCol)).as("cv"))
      val attached = attach(c, g).persist() // data write + drift baseline agg
      attached.write.mode("overwrite")
        .partitionBy("bucket").parquet(s"$dir/data")
      // the append DRIFT baseline: exact micro attachment cosine of the
      // build corpus to its own hubs (bucket = index into the hub array,
      // so hubVecs plays the centroid role in KMeansIVF.microCol exactly)
      val st = attached.agg(count(lit(1)), sum(KMeansIVF.microCol(g.hubVecs))).head()
      attached.unpersist()
      val sb = new StringBuilder
      sb ++= s"mod=${g.sampleMod}\n"
      sb ++= s"entries=${g.entries.mkString(",")}\n"
      for (i <- g.hubIds.indices) {
        val hid = g.hubIds(i)
        sb ++= s"hub=$hid:${g.hubVecs(i).mkString(",")}:${g.adj(hid).mkString(",")}\n"
      }
      // sidecars land atomically (temp + same-dir atomic move — never torn),
      // `_ready` only after ALL of them, so data and graph never disagree
      atomicWrite(s"$dir/graph.txt", sb.toString)
      atomicWrite(s"$dir/stats.json",
        s"""{"n":${st.getLong(0)},"sumMicro":${st.getLong(1)}}""")
      atomicWrite(s"$dir/_ready", "1")
      g
    } finally java.nio.file.Files.deleteIfExists(lock)
  }

  /** Append a batch of NEW vectors to a persisted graph index without
    * rebuilding the routing layer — the [[KMeansIVF.appendIndex]]
    * machinery for graph ANN: the FROZEN hub set plays the centroid role,
    * each batch vector attaches to its nearest hub map-side
    * ([[attach]] — no shuffle, no join), lands bucket-partitioned under
    * `appends/<batchId>/` and becomes visible only at the atomic `_done`
    * marker. Crash/retry/idempotence semantics are identical to the IVF
    * path (partial trees wiped on same-batchId retry; committed replays
    * return the ORIGINAL persisted verdict). Appends serialize with
    * rebuilds and compactions on `append.lock`.
    *
    * Drift = the batch's mean best-hub micro-cosine vs the index's
    * running mean (base + committed fragments), two-sided like the IVF
    * gate: hubs sampled from yesterday's corpus degrade as the
    * distribution moves, and past the halving point the routing layer —
    * not just the buckets — needs a rebuild. */
  def appendIndex(batch: DataFrame, idCol: String, vecCol: String,
                  dir: String, batchId: String): KMeansIVF.AppendResult = {
    require(!batchId.contains("/") && batchId.nonEmpty, s"bad batchId '$batchId'")
    val lock = java.nio.file.Paths.get(s"$dir/append.lock")
    if (!graft.sources.LshIndex.casCreate(lock)) throw new IllegalStateException(
      s"rival append or rebuild in progress on $dir (append.lock exists); " +
        "retry later or remove the lock if its owner is known dead")
    try {
      val g = readGraph(dir) // `_ready`-gated, inside the lock
      val statsPath = java.nio.file.Paths.get(s"$dir/stats.json")
      require(java.nio.file.Files.exists(statsPath),
        s"NSW index at $dir has no stats sidecar — the build predates the " +
          "append-capable writeIndex; rebuild the index")
      val appDir = new java.io.File(s"$dir/appends/$batchId")
      val doneMarker = new java.io.File(appDir, "_done")
      if (doneMarker.exists())
        return KMeansIVF.readResult(appDir.toPath.resolve("result.json"))
      if (appDir.exists()) graft.TempDirs.deleteRecursively(appDir) // crashed partial

      val c = batch.select(col(idCol).as("neighbor_id"),
        VectorOps.asDouble(col(vecCol)).as("cv"))
      val attached = attach(c, g).persist()
      attached.write.mode("overwrite").partitionBy("bucket")
        .parquet(s"${appDir.getPath}/data")
      val st = attached.agg(count(lit(1)), sum(KMeansIVF.microCol(g.hubVecs))).head()
      attached.unpersist()
      val (bn, bs) = (st.getLong(0), st.getLong(1))

      val frags = KMeansIVF.dataPaths(dir).drop(1)
        .map(p => java.nio.file.Paths.get(p).getParent)
        .filterNot(_.getFileName.toString == batchId)
        .map(p => KMeansIVF.readStats(p.resolve("stats.json")))
      val base = KMeansIVF.readStats(statsPath)
      val v = KMeansIVF.driftVerdict(
        base._1 + frags.map(_._1).sum, base._2 + frags.map(_._2).sum, bn, bs)
      java.nio.file.Files.writeString(appDir.toPath.resolve("stats.json"),
        s"""{"n":$bn,"sumMicro":$bs}""")
      KMeansIVF.writeResult(appDir.toPath.resolve("result.json"), v)
      // the atomic commit point: everything above is invisible until this
      require(graft.sources.LshIndex.casCreate(doneMarker.toPath),
        s"impossible: $doneMarker already existed under append.lock")
      v
    } finally java.nio.file.Files.deleteIfExists(lock)
  }

  /** Fold the base tree + every committed append into a FRESH index at
    * `outDir` (compaction-as-replace — the [[KMeansIVF.compactAppends]]
    * posture). The graph sidecar carries over unchanged, so searches
    * against `outDir` are IDENTICAL; `stats.json` absorbs the fragments
    * so drift baselines carry forward exactly. */
  def compactAppends(spark: SparkSession, dir: String, outDir: String): Unit = {
    val src = java.nio.file.Paths.get(dir).toAbsolutePath.normalize
    val dst = java.nio.file.Paths.get(outDir).toAbsolutePath.normalize
    require(src != dst && !dst.startsWith(src) && !src.startsWith(dst),
      s"compactAppends target $dst must be disjoint from the source index $src")
    val lock = java.nio.file.Paths.get(s"$dir/append.lock")
    if (!graft.sources.LshIndex.casCreate(lock)) throw new IllegalStateException(
      s"rival append/rebuild/compaction in progress on $dir (append.lock)")
    try {
      require(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/_ready")),
        s"NSW index at $dir has no _ready marker — rebuild before compacting")
      val roots = KMeansIVF.dataPaths(dir)
      val frags = roots.drop(1).map(p =>
        KMeansIVF.readStats(java.nio.file.Paths.get(p).getParent.resolve("stats.json")))
      val base = KMeansIVF.readStats(java.nio.file.Paths.get(s"$dir/stats.json"))
      val n = base._1 + frags.map(_._1).sum
      val sm = base._2 + frags.map(_._2).sum
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
      roots.map(p => spark.read.parquet(p)).reduce(_ unionByName _)
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$outDir/data")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/graph.txt"),
        java.nio.file.Paths.get(s"$outDir/graph.txt"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      atomicWrite(s"$outDir/stats.json", s"""{"n":$n,"sumMicro":$sm}""")
      atomicWrite(s"$outDir/_ready", "1")
    } finally java.nio.file.Files.deleteIfExists(lock)
  }

  /** Crash-safe small-file write: temp in the target dir + atomic move. */
  private def atomicWrite(path: String, content: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    val tmp = java.nio.file.Files.createTempFile(p.getParent, ".tmp-", "")
    java.nio.file.Files.writeString(tmp, content)
    java.nio.file.Files.move(tmp, p,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Read the persisted routing layer back (hub order preserved — the
    * array index IS the attachment bucket id). Refuses an index whose
    * (re)build was interrupted before the sidecar committed. */
  def readGraph(dir: String): Graph = {
    require(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/_ready")),
      s"NSW index at $dir has no _ready marker — a (re)build was " +
        "interrupted before its graph sidecar was committed; rebuild the index")
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(s"$dir/graph.txt"))
    var mod = 0
    var entries = Seq.empty[Long]
    val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
    val vecs = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    val adj = scala.collection.mutable.Map.empty[Long, Seq[Long]]
    // ''.split(",") yields Array("") — empty lists must parse as empty,
    // not NumberFormatException (build() refuses the degenerate params
    // that would WRITE them, but the parser stays total anyway)
    def longs(x: String): Seq[Long] =
      if (x.isEmpty) Seq.empty else x.split(",").map(_.toLong).toSeq
    lines.forEach { l =>
      if (l.startsWith("mod=")) mod = l.stripPrefix("mod=").toInt
      else if (l.startsWith("entries="))
        entries = longs(l.stripPrefix("entries="))
      else if (l.startsWith("hub=")) {
        val Array(hid, v, a) = l.stripPrefix("hub=").split(":", 3)
        ids += hid.toLong
        vecs += v.split(",").map(_.toDouble)
        adj(hid.toLong) = longs(a)
      }
    }
    Graph(ids.toArray, vecs.toArray, adj.toMap, entries, mod)
  }

  /** ANN top-k against a persisted graph index: beam routing on the
    * in-memory sidecar graph, then a scan of ONLY the probed hub buckets
    * (static partition filter — `PartitionFilters: [bucket IN (...)]`).
    * Output `(query_id, neighbor_id, rank, cosine)`, the [[KMeansIVF]]
    * index shape. The query side is bounded by contract (collected for
    * routing); candidates re-rank exactly. */
  def indexSearch(queries: DataFrame, dir: String, idCol: String,
                  vecCol: String, k: Int, p: Params): DataFrame = {
    val spark = queries.sparkSession
    val g = readGraph(dir)
    val idxOf = g.hubIds.zipWithIndex.toMap
    val qdf = queries.select(col(idCol).as("query_id"),
      VectorOps.asDouble(col(vecCol)).as("qv"))
    val qrows = qdf.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val probeRows = qrows.flatMap { case (qid, qv) =>
      beamSearch(g, p, qv)._1.map(h => (qid, idxOf(h)))
    }.toSeq
    val buckets = probeRows.map(_._2).distinct.sorted
    import spark.implicits._
    val probed = probeRows.toDF("query_id", "bucket")
    // one read per committed root (base + `_done` appends), unioned —
    // partition filters push through the Union into every child scan
    val data = KMeansIVF.dataPaths(dir).map(p => spark.read.parquet(p))
      .reduce(_ unionByName _)
      .filter(col("bucket").isin(buckets.map(Integer.valueOf): _*))
    broadcast(probed.join(qdf, "query_id"))
      .join(data, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", VectorOps.cosine(col("qv"), col("cv")))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKAggregate.topK(col("cos"), col("neighbor_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t.payload").as("neighbor_id"),
        (col("pos") + 1).cast("int").as("rank"),
        graft.functions.PortableMath.roundPortable(col("t.score"), 3).as("cosine"))
  }

  /** [[indexSearch]] routed through the HIERARCHICAL descent: the super
    * layer derives DETERMINISTICALLY from the persisted graph sidecar
    * (same md5 subsample + exact adjacency every time — nothing extra is
    * persisted), computed once per query batch, then each query descends
    * super→hub and scans only its probed buckets (the same static
    * partition filter). The serving win at scale: the sidecar stays one
    * layer on disk, but the router touches O(supers + beam·M·rounds)
    * hubs instead of needing the scattered multi-restart entries. */
  def indexSearchHier(queries: DataFrame, dir: String, idCol: String,
                      vecCol: String, k: Int, p: Params,
                      hp: HierParams): DataFrame = {
    val spark = queries.sparkSession
    val g = readGraph(dir)
    val (_, sadj, sents) = superLayer(g, p, hp)
    val idxOf = g.hubIds.zipWithIndex.toMap
    val qdf = queries.select(col(idCol).as("query_id"),
      VectorOps.asDouble(col(vecCol)).as("qv"))
    val qrows = qdf.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val probeRows = qrows.flatMap { case (qid, qv) =>
      beamSearchHier(g, p, hp, sadj, sents, qv)._1.map(h => (qid, idxOf(h)))
    }.toSeq
    val buckets = probeRows.map(_._2).distinct.sorted
    import spark.implicits._
    val probed = probeRows.toDF("query_id", "bucket")
    val data = KMeansIVF.dataPaths(dir).map(p => spark.read.parquet(p))
      .reduce(_ unionByName _)
      .filter(col("bucket").isin(buckets.map(Integer.valueOf): _*))
    broadcast(probed.join(qdf, "query_id"))
      .join(data, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", VectorOps.cosine(col("qv"), col("cv")))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKAggregate.topK(col("cos"), col("neighbor_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t.payload").as("neighbor_id"),
        (col("pos") + 1).cast("int").as("rank"),
        graft.functions.PortableMath.roundPortable(col("t.score"), 3).as("cosine"))
  }

  /** The shared routing-replay CTE text — hub sample, M-nearest
    * adjacency, query scores, multi-restart entries, EVERY beam round,
    * final probes, and corpus attachment — ONE generator feeding both the
    * q327 recall oracle and the q332 search oracle (these strings are the
    * hash-checked replay of build()/beamSearch(); forked copies would let
    * a semantics fix go stale in one of them). Callers provide `e(id, v)`
    * in scope and the qs predicate; the text ends inside the WITH list
    * with `hubs`, `hscore`, `nswp`, `hatt` and `v<rounds>` available. */
  private def routingCtes(p: Params, qsPred: String, hubRel: String = "e"): String = {
    def cos(a: String, b: String): String = KMeansIVF.cosSql(a, b)
    val h = TextHash.md5LongSql("id::VARCHAR")
    // hub modulus under the COUNT-DERIVED target max(hubCap, ceil(sqrt(n)))
    // — [[hubTarget]]'s arithmetic as a scalar subquery (IEEE sqrt is
    // correctly rounded on both engines, so the derived cap is identical).
    // `hubRel` is the relation build() was given — the full corpus for a
    // plain build, the BASE subset for the append-without-rebuild replay
    // (attachment/queries still run over `e`)
    val capSql = s"greatest(${p.hubCap}, CAST(ceil(sqrt(count(*)::DOUBLE)) AS BIGINT))"
    val hubMod = s"(SELECT greatest(1, (count(*) + $capSql - 1) // $capSql) FROM $hubRel)"
    val sb = new StringBuilder
    sb ++= s"hubs AS MATERIALIZED (SELECT id AS hid, v AS hv FROM $hubRel WHERE $h % $hubMod = 0),\n"
    // DISTRIBUTED adjacency replay ([[adjacency]] = selfTopK over hubs):
    // inner IVF fit on the hub relation (prefix g_ so the corpus-level
    // incumbent fit in q327 can't collide), per-hub probes of the
    // adjNprobe nearest inner centroids, candidate join, top-m rank
    sb ++= KMeansIVF.fitReplayCtesOver(
      "hubs", "hid", "hv", "g_", p.adjClusters, p.adjIters, p.adjSampleCap)
    sb ++= s"g_probes AS (SELECT query_id, qv, bucket FROM (\n"
    sb ++= s"    SELECT h.hid AS query_id, h.hv AS qv, c.cid AS bucket,\n"
    sb ++= s"      row_number() OVER (PARTITION BY h.hid ORDER BY ${cos("h.hv", "c.cv")} DESC, c.cid) AS rn\n"
    sb ++= s"    FROM hubs h CROSS JOIN g_c${p.adjIters} c) WHERE rn <= ${p.adjNprobe}),\n"
    sb ++= s"adj AS MATERIALIZED (SELECT src, dst FROM (\n"
    sb ++= s"    SELECT p.query_id AS src, a.neighbor_id AS dst,\n"
    sb ++= s"      row_number() OVER (PARTITION BY p.query_id ORDER BY ${cos("p.qv", "a.cv2")} DESC, a.neighbor_id) AS rn\n"
    sb ++= s"    FROM g_probes p JOIN g_assigned a ON a.bucket = p.bucket AND a.neighbor_id != p.query_id) WHERE rn <= ${p.m}),\n"
    sb ++= s"qs AS MATERIALIZED (SELECT id AS query_id, v AS qv FROM e WHERE $qsPred),\n"
    sb ++= s"hscore AS MATERIALIZED (SELECT q.query_id, h.hid, ${cos("q.qv", "h.hv")} AS c\n"
    sb ++= s"           FROM qs q CROSS JOIN hubs h),\n"
    val hidHash = TextHash.md5LongSql("hid::VARCHAR")
    sb ++= s"ents AS (SELECT hid FROM hubs ORDER BY $hidHash, hid LIMIT ${p.nEntries}),\n"
    sb ++= s"v0 AS MATERIALIZED (SELECT q.query_id, e2.hid AS hub FROM qs q CROSS JOIN ents e2),\n"
    sb ++= s"b0 AS MATERIALIZED (SELECT query_id, hub FROM (\n"
    sb ++= s"    SELECT v.query_id, v.hub,\n"
    sb ++= s"      row_number() OVER (PARTITION BY v.query_id ORDER BY s.c DESC, v.hub) AS rn\n"
    sb ++= s"    FROM v0 v JOIN hscore s ON s.query_id = v.query_id AND s.hid = v.hub)\n"
    sb ++= s"    WHERE rn <= ${p.beamWidth}),\n"
    for (i <- 1 to p.rounds) {
      sb ++= s"v$i AS MATERIALIZED (SELECT DISTINCT query_id, hub FROM (\n"
      sb ++= s"    SELECT query_id, hub FROM v${i - 1}\n"
      sb ++= s"    UNION ALL\n"
      sb ++= s"    SELECT b.query_id, a.dst AS hub FROM b${i - 1} b JOIN adj a ON b.hub = a.src)),\n"
      sb ++= s"b$i AS MATERIALIZED (SELECT query_id, hub FROM (\n"
      sb ++= s"    SELECT v.query_id, v.hub,\n"
      sb ++= s"      row_number() OVER (PARTITION BY v.query_id ORDER BY s.c DESC, v.hub) AS rn\n"
      sb ++= s"    FROM v$i v JOIN hscore s ON s.query_id = v.query_id AND s.hid = v.hub)\n"
      sb ++= s"    WHERE rn <= ${p.beamWidth}),\n"
    }
    val vFin = s"v${p.rounds}"
    sb ++= s"nswp AS (SELECT query_id, hub FROM (\n"
    sb ++= s"    SELECT v.query_id, v.hub,\n"
    sb ++= s"      row_number() OVER (PARTITION BY v.query_id ORDER BY s.c DESC, v.hub) AS rn\n"
    sb ++= s"    FROM $vFin v JOIN hscore s ON s.query_id = v.query_id AND s.hid = v.hub)\n"
    sb ++= s"    WHERE rn <= ${p.nprobe}),\n"
    sb ++= s"hatt AS MATERIALIZED (SELECT id, v, hub FROM (\n"
    sb ++= s"    SELECT e.id, e.v, h.hid AS hub,\n"
    sb ++= s"      row_number() OVER (PARTITION BY e.id ORDER BY ${cos("e.v", "h.hv")} DESC, h.hid) AS rn\n"
    sb ++= s"    FROM e CROSS JOIN hubs h) WHERE rn = 1),\n"
    sb.toString
  }

  /** DuckDB replay of a persisted-graph SEARCH (the q332 oracle): hub
    * sample, adjacency, the beam rounds for `queryPred`\'s queries,
    * attachment, probed-bucket candidates, exact top-k re-rank — the
    * [[KMeansIVF.oracleSql]] shape for the graph index. */
  def searchOracleSql(table: String, idCol: String, vecCol: String,
                      p: Params, k: Int, queryPred: String): String = {
    def cos(a: String, b: String): String = KMeansIVF.cosSql(a, b)
    val sb = new StringBuilder
    sb ++= s"WITH e AS (SELECT $idCol AS id, $vecCol::DOUBLE[] AS v FROM $table),\n"
    sb ++= routingCtes(p, queryPred)
    sb ++= s"cand AS (SELECT p.query_id, t.id AS nid, ${cos("q.qv", "t.v")} AS c\n"
    sb ++= s"    FROM nswp p JOIN hatt t ON t.hub = p.hub AND t.id != p.query_id\n"
    sb ++= s"    JOIN qs q ON q.query_id = p.query_id),\n"
    sb ++= s"ranked AS (SELECT query_id, nid, c,\n"
    sb ++= s"    row_number() OVER (PARTITION BY query_id ORDER BY c DESC, nid) AS rank\n"
    sb ++= s"  FROM cand)\n"
    sb ++= s"SELECT query_id, nid AS neighbor_id, rank::INT AS rank,\n"
    sb ++= s"  (floor(c * 1000 + 0.5) / 1000) AS cosine\n"
    sb ++= s"FROM ranked WHERE rank <= $k"
    sb.toString
  }

  /** DuckDB replay of search-after-append (the q339 oracle): the routing
    * layer — hub sample, inner fit, adjacency, beam rounds — derives from
    * the BASE subset only (replaying writeIndex-on-base), while attachment
    * and queries run over the whole table, exactly what the committed
    * append tree serves. Hash-equality proves [[appendIndex]]'s tree IS
    * the no-rebuild union index. `basePredId` filters the renamed `id`. */
  def appendSearchOracleSql(table: String, idCol: String, vecCol: String,
                            p: Params, k: Int, basePredId: String,
                            queryPred: String): String = {
    def cos(a: String, b: String): String = KMeansIVF.cosSql(a, b)
    val sb = new StringBuilder
    sb ++= s"WITH e AS (SELECT $idCol AS id, $vecCol::DOUBLE[] AS v FROM $table),\n"
    sb ++= routingCtes(p, queryPred,
      hubRel = s"(SELECT id, v FROM e WHERE $basePredId)")
    sb ++= s"cand AS (SELECT p.query_id, t.id AS nid, ${cos("q.qv", "t.v")} AS c\n"
    sb ++= s"    FROM nswp p JOIN hatt t ON t.hub = p.hub AND t.id != p.query_id\n"
    sb ++= s"    JOIN qs q ON q.query_id = p.query_id),\n"
    sb ++= s"ranked AS (SELECT query_id, nid, c,\n"
    sb ++= s"    row_number() OVER (PARTITION BY query_id ORDER BY c DESC, nid) AS rank\n"
    sb ++= s"  FROM cand)\n"
    sb ++= s"SELECT query_id, nid AS neighbor_id, rank::INT AS rank,\n"
    sb ++= s"  (floor(c * 1000 + 0.5) / 1000) AS cosine\n"
    sb ++= s"FROM ranked WHERE rank <= $k"
    sb.toString
  }

  /** DuckDB replay of the NSW append DRIFT GATE: base-vs-batch mean
    * attachment micro-cosine to hubs sampled from the base alone, and the
    * two-sided integer basis-point verdict ([[KMeansIVF.driftVerdict]]'s
    * arithmetic) — every number exact, so the gate itself is
    * hash-checked. Only the hub sample and attachment replay (adjacency/
    * beam rounds don't touch the drift stat). */
  def appendDriftOracleSql(table: String, idCol: String, vecCol: String,
                           p: Params, basePredId: String): String = {
    def cos(a: String, b: String): String = KMeansIVF.cosSql(a, b)
    val h = TextHash.md5LongSql("id::VARCHAR")
    val capSql = s"greatest(${p.hubCap}, CAST(ceil(sqrt(count(*)::DOUBLE)) AS BIGINT))"
    val hubMod = s"(SELECT greatest(1, (count(*) + $capSql - 1) // $capSql) " +
      s"FROM e WHERE $basePredId)"
    val micro = s"CAST(floor(${cos("t.v", "t.hv")} * 1000000 + 0.5) AS BIGINT)"
    val sb = new StringBuilder
    sb ++= s"WITH e AS (SELECT $idCol AS id, $vecCol::DOUBLE[] AS v FROM $table),\n"
    sb ++= s"hubs AS (SELECT id AS hid, v AS hv FROM e\n"
    sb ++= s"         WHERE ($basePredId) AND $h % $hubMod = 0),\n"
    sb ++= s"hatt AS (SELECT id, v, hv FROM (\n"
    sb ++= s"    SELECT e.id, e.v, h.hv,\n"
    sb ++= s"      row_number() OVER (PARTITION BY e.id ORDER BY ${cos("e.v", "h.hv")} DESC, h.hid) AS rn\n"
    sb ++= s"    FROM e CROSS JOIN hubs h) WHERE rn = 1),\n"
    sb ++= s"scoredu AS (SELECT t.id, $micro AS micro, ($basePredId) AS is_base\n"
    sb ++= s"  FROM (SELECT id, v, hv FROM hatt) t),\n"
    sb ++= s"bstat AS (SELECT count(*)::BIGINT AS pn, sum(micro)::BIGINT AS ps\n"
    sb ++= s"  FROM scoredu WHERE is_base),\n"
    sb ++= s"qstat AS (SELECT count(*)::BIGINT AS bn, sum(micro)::BIGINT AS bs\n"
    sb ++= s"  FROM scoredu WHERE NOT is_base)\n"
    sb ++= s"SELECT pn AS n_prev, bn AS n_batch, ps AS prev_sum_micro, bs AS batch_sum_micro,\n"
    sb ++= s"  ((bs::HUGEINT * pn * 10000) // (ps::HUGEINT * bn))::BIGINT AS drift_bp,\n"
    sb ++= s"  (((bs::HUGEINT * pn * 10000) // (ps::HUGEINT * bn)) < 5000 OR\n"
    sb ++= s"   ((bs::HUGEINT * pn * 10000) // (ps::HUGEINT * bn)) > 20000) AS rebuild\n"
    sb ++= s"FROM bstat, qstat"
    sb.toString
  }

  /** The HIERARCHICAL descent replay — super subsample, exact m-nearest
    * super adjacency, `superRounds` beam rounds over it, then `hubRounds`
    * over the hub adjacency CONTINUING one shared visited state, ending
    * with `hierp(query_id, hub)` (the probe set). Assumes [[routingCtes]]'
    * `hubs`/`adj`/`qs`/`hscore` are in scope; every round CTE is
    * MATERIALIZED (DuckDB re-inlines by default — the chain is
    * exponential otherwise, the q102 trap). ONE generator feeding the
    * q347 audit and the q348 persisted-search oracle. */
  private def hierChainCtes(p: Params, hp: HierParams): String = {
    def cos(a: String, b: String): String = KMeansIVF.cosSql(a, b)
    val hh = TextHash.md5LongSql("hid::VARCHAR")
    val cap2 = s"greatest(${hp.superCap}, CAST(ceil(sqrt(count(*)::DOUBLE)) AS BIGINT))"
    val supMod = s"(SELECT greatest(1, (count(*) + $cap2 - 1) // $cap2) FROM hubs)"
    val sb = new StringBuilder
    sb ++= s"supers AS MATERIALIZED (SELECT hid, hv FROM hubs WHERE $hh % $supMod = 0),\n"
    sb ++= s"sadj AS MATERIALIZED (SELECT src, dst FROM (\n"
    sb ++= s"    SELECT s1.hid AS src, s2.hid AS dst,\n"
    sb ++= s"      row_number() OVER (PARTITION BY s1.hid ORDER BY ${cos("s1.hv", "s2.hv")} DESC, s2.hid) AS rn\n"
    sb ++= s"    FROM supers s1 JOIN supers s2 ON s1.hid != s2.hid) WHERE rn <= ${p.m}),\n"
    sb ++= s"sents AS (SELECT hid FROM supers ORDER BY $hh, hid LIMIT ${hp.superEntries}),\n"
    sb ++= s"w0 AS MATERIALIZED (SELECT q.query_id, e3.hid AS hub FROM qs q CROSS JOIN sents e3),\n"
    def beamOf(i: Int): String = {
      s"u$i AS MATERIALIZED (SELECT query_id, hub FROM (\n" +
        s"    SELECT w.query_id, w.hub,\n" +
        s"      row_number() OVER (PARTITION BY w.query_id ORDER BY s.c DESC, w.hub) AS rn\n" +
        s"    FROM w$i w JOIN hscore s ON s.query_id = w.query_id AND s.hid = w.hub)\n" +
        s"    WHERE rn <= ${p.beamWidth}),\n"
    }
    sb ++= beamOf(0)
    // phase 1: expand over the SUPER adjacency
    for (i <- 1 to hp.superRounds) {
      sb ++= s"w$i AS MATERIALIZED (SELECT DISTINCT query_id, hub FROM (\n"
      sb ++= s"    SELECT query_id, hub FROM w${i - 1}\n"
      sb ++= s"    UNION ALL\n"
      sb ++= s"    SELECT u.query_id, a.dst AS hub FROM u${i - 1} u JOIN sadj a ON u.hub = a.src)),\n"
      sb ++= beamOf(i)
    }
    // phase 2: the SAME visited/beam state continues over the hub adjacency
    for (j <- 1 to hp.hubRounds) {
      val i = hp.superRounds + j
      sb ++= s"w$i AS MATERIALIZED (SELECT DISTINCT query_id, hub FROM (\n"
      sb ++= s"    SELECT query_id, hub FROM w${i - 1}\n"
      sb ++= s"    UNION ALL\n"
      sb ++= s"    SELECT u.query_id, a.dst AS hub FROM u${i - 1} u JOIN adj a ON u.hub = a.src)),\n"
      sb ++= beamOf(i)
    }
    val wFin = s"w${hp.superRounds + hp.hubRounds}"
    sb ++= s"hierp AS (SELECT query_id, hub FROM (\n"
    sb ++= s"    SELECT w.query_id, w.hub,\n"
    sb ++= s"      row_number() OVER (PARTITION BY w.query_id ORDER BY s.c DESC, w.hub) AS rn\n"
    sb ++= s"    FROM $wFin w JOIN hscore s ON s.query_id = w.query_id AND s.hid = w.hub)\n"
    sb ++= s"    WHERE rn <= ${p.nprobe}),\n"
    sb.toString
  }

  /** DuckDB replay of a persisted-graph HIERARCHICAL search (the q348
    * oracle): [[searchOracleSql]] with the descent routed through the
    * super layer — the hier probe set feeds the same attachment-bucket
    * candidate scan and exact top-k re-rank. */
  def hierSearchOracleSql(table: String, idCol: String, vecCol: String,
                          p: Params, hp: HierParams, k: Int,
                          queryPred: String): String = {
    def cos(a: String, b: String): String = KMeansIVF.cosSql(a, b)
    val sb = new StringBuilder
    sb ++= s"WITH e AS (SELECT $idCol AS id, $vecCol::DOUBLE[] AS v FROM $table),\n"
    sb ++= routingCtes(p, queryPred)
    sb ++= hierChainCtes(p, hp)
    sb ++= s"cand AS (SELECT p.query_id, t.id AS nid, ${cos("q.qv", "t.v")} AS c\n"
    sb ++= s"    FROM hierp p JOIN hatt t ON t.hub = p.hub AND t.id != p.query_id\n"
    sb ++= s"    JOIN qs q ON q.query_id = p.query_id),\n"
    sb ++= s"ranked AS (SELECT query_id, nid, c,\n"
    sb ++= s"    row_number() OVER (PARTITION BY query_id ORDER BY c DESC, nid) AS rank\n"
    sb ++= s"  FROM cand)\n"
    sb ++= s"SELECT query_id, nid AS neighbor_id, rank::INT AS rank,\n"
    sb ++= s"  (floor(c * 1000 + 0.5) / 1000) AS cosine\n"
    sb ++= s"FROM ranked WHERE rank <= $k"
    sb.toString
  }

  /** DuckDB replay of the q347 HIERARCHICAL descent audit: the single-
    * layer beam (routingCtes' chain, md5-scattered entries) NEXT TO the
    * two-layer descent — super-hub subsample (the count-derived √ rule
    * over the hubs), exact m-nearest super adjacency, `superRounds`
    * unrolled beam rounds over it, then the usual hub-adjacency rounds
    * CONTINUING the same visited state — plus the exact truth and the
    * integer recall/eval rollup for both methods. Hash-equality checks
    * the recall AND the eval counts, so the "equal recall, fewer evals"
    * claim is itself oracle-verified. */
  def hierRecallOracleSql(
      table: String, idCol: String, vecCol: String, p: Params,
      hp: HierParams, k: Int, queryCap: Long): String = {
    def cos(a: String, b: String): String = KMeansIVF.cosSql(a, b)
    val h = TextHash.md5LongSql("id::VARCHAR")
    val hh = TextHash.md5LongSql("hid::VARCHAR")
    def modOf(cap: Long) = s"(SELECT greatest(1, (count(*) + ${cap - 1}) // $cap) FROM e)"
    val cap2 = s"greatest(${hp.superCap}, CAST(ceil(sqrt(count(*)::DOUBLE)) AS BIGINT))"
    val supMod = s"(SELECT greatest(1, (count(*) + $cap2 - 1) // $cap2) FROM hubs)"
    val sb = new StringBuilder
    sb ++= s"WITH e AS (SELECT $idCol AS id, $vecCol::DOUBLE[] AS v FROM $table),\n"
    sb ++= routingCtes(p, s"$h % ${modOf(queryCap)} = 0")
    sb ++= hierChainCtes(p, hp)
    val vFin = s"v${p.rounds}"
    val wFin = s"w${hp.superRounds + hp.hubRounds}"
    // ---- truth + per-method stats ----
    sb ++= s"truth AS MATERIALIZED (SELECT query_id, nid FROM (\n"
    sb ++= s"    SELECT q.query_id, n.id AS nid,\n"
    sb ++= s"      row_number() OVER (PARTITION BY q.query_id ORDER BY ${cos("q.qv", "n.v")} DESC, n.id) AS rn\n"
    sb ++= s"    FROM qs q JOIN e n ON n.id != q.query_id) WHERE rn <= $k),\n"
    def method(name: String, probeRel: String): Unit = {
      sb ++= s"cand_$name AS MATERIALIZED (SELECT p.query_id, t.id AS nid, ${cos("q.qv", "t.v")} AS c\n"
      sb ++= s"    FROM $probeRel p JOIN hatt t ON t.hub = p.hub AND t.id != p.query_id\n"
      sb ++= s"    JOIN qs q ON q.query_id = p.query_id),\n"
      sb ++= s"top_$name AS (SELECT query_id, nid FROM (\n"
      sb ++= s"    SELECT query_id, nid, row_number() OVER (PARTITION BY query_id ORDER BY c DESC, nid) AS rn\n"
      sb ++= s"    FROM cand_$name) WHERE rn <= $k),\n"
      sb ++= s"stat_$name AS (SELECT\n"
      sb ++= s"    (SELECT count(*) FROM cand_$name)::BIGINT AS candidates,\n"
      sb ++= s"    (SELECT count(*) FROM truth t JOIN top_$name f\n"
      sb ++= s"       ON t.query_id = f.query_id AND t.nid = f.nid)::BIGINT AS hits),\n"
      ()
    }
    method("nsw", "nswp")
    method("hier", "hierp")
    sb ++= s"nqv AS (SELECT count(*)::BIGINT AS nq FROM qs),\n"
    sb ++= s"nswev AS (SELECT count(*)::BIGINT AS ev FROM $vFin),\n"
    sb ++= s"hierev AS (SELECT count(*)::BIGINT AS ev FROM $wFin)\n"
    sb ++= s"SELECT 'nsw_beam' AS method, nq AS n_queries, ev AS hub_evals, candidates,\n"
    sb ++= s"  hits AS hits10, ((hits * 10000) // ($k * nq))::BIGINT AS recall_bp\n"
    sb ++= s"FROM stat_nsw, nqv, nswev\n"
    sb ++= s"UNION ALL\n"
    sb ++= s"SELECT 'nsw_hier', nq, ev, candidates, hits,\n"
    sb ++= s"  ((hits * 10000) // ($k * nq))::BIGINT FROM stat_hier, nqv, hierev"
    sb.toString
  }

  /** DuckDB replay of the q354 MRR RANKING audit: three retrieval methods
    * — learned-IVF (nprobe buckets of the [[KMeansIVF.fitReplayCtes]]
    * fit), single-layer NSW beam, hierarchical descent — each producing a
    * ranked top-k list; per query the FIRST rank at which an exact-truth
    * neighbor appears contributes `2520 div rank` (2520 = lcm(1..10), so
    * every reciprocal rank at k ≤ 10 is an EXACT integer — MRR without a
    * float in sight), missing queries contribute 0. One row per method:
    * query count, queries with any hit, and the integer MRR sum. */
  def mrrOracleSql(
      table: String, idCol: String, vecCol: String, p: Params,
      hp: HierParams, k: Int, queryCap: Long,
      kmClusters: Int, kmIters: Int, kmSampleCap: Long, kmNprobe: Int): String = {
    require(k <= 10, s"2520-scaled reciprocal ranks are exact only to rank 10, got k=$k")
    def cos(a: String, b: String): String = KMeansIVF.cosSql(a, b)
    val h = TextHash.md5LongSql("id::VARCHAR")
    def modOf(cap: Long) = s"(SELECT greatest(1, (count(*) + ${cap - 1}) // $cap) FROM e)"
    val cFin = s"c$kmIters"
    val sb = new StringBuilder
    sb ++= KMeansIVF.fitReplayCtes(table, idCol, vecCol, kmClusters, kmIters, kmSampleCap)
    sb ++= routingCtes(p, s"$h % ${modOf(queryCap)} = 0")
    sb ++= hierChainCtes(p, hp)
    sb ++= s"truth AS MATERIALIZED (SELECT query_id, nid FROM (\n"
    sb ++= s"    SELECT q.query_id, n.id AS nid,\n"
    sb ++= s"      row_number() OVER (PARTITION BY q.query_id ORDER BY ${cos("q.qv", "n.v")} DESC, n.id) AS rn\n"
    sb ++= s"    FROM qs q JOIN e n ON n.id != q.query_id) WHERE rn <= $k),\n"
    sb ++= s"kmp AS (SELECT query_id, bucket FROM (\n"
    sb ++= s"    SELECT q.query_id, c.cid AS bucket,\n"
    sb ++= s"      row_number() OVER (PARTITION BY q.query_id ORDER BY ${cos("q.qv", "c.cv")} DESC, c.cid) AS rn\n"
    sb ++= s"    FROM qs q CROSS JOIN $cFin c) WHERE rn <= $kmNprobe),\n"
    def method(name: String, candSql: String): Unit = {
      sb ++= s"cand_$name AS MATERIALIZED ($candSql),\n"
      sb ++= s"top_$name AS (SELECT query_id, nid, rnk FROM (\n"
      sb ++= s"    SELECT query_id, nid, row_number() OVER (PARTITION BY query_id ORDER BY c DESC, nid) AS rnk\n"
      sb ++= s"    FROM cand_$name) WHERE rnk <= $k),\n"
      sb ++= s"fr_$name AS (SELECT t.query_id, min(f.rnk) AS r\n"
      sb ++= s"    FROM truth t JOIN top_$name f ON t.query_id = f.query_id AND t.nid = f.nid\n"
      sb ++= s"    GROUP BY t.query_id),\n"
      sb ++= s"mrr_$name AS (SELECT count(*)::BIGINT AS n_hit_queries,\n"
      sb ++= s"    coalesce(sum(2520 // r), 0)::BIGINT AS mrr_x2520 FROM fr_$name),\n"
      ()
    }
    method("kmeans_ivf",
      s"SELECT p.query_id, a.neighbor_id AS nid, ${cos("q.qv", "a.cv2")} AS c\n" +
        s"    FROM kmp p JOIN assigned a ON a.bucket = p.bucket AND a.neighbor_id != p.query_id\n" +
        s"    JOIN qs q ON q.query_id = p.query_id")
    method("nsw_beam",
      s"SELECT p.query_id, t.id AS nid, ${cos("q.qv", "t.v")} AS c\n" +
        s"    FROM nswp p JOIN hatt t ON t.hub = p.hub AND t.id != p.query_id\n" +
        s"    JOIN qs q ON q.query_id = p.query_id")
    method("nsw_hier",
      s"SELECT p.query_id, t.id AS nid, ${cos("q.qv", "t.v")} AS c\n" +
        s"    FROM hierp p JOIN hatt t ON t.hub = p.hub AND t.id != p.query_id\n" +
        s"    JOIN qs q ON q.query_id = p.query_id")
    sb ++= s"nqv AS (SELECT count(*)::BIGINT AS nq FROM qs)\n"
    sb ++= s"SELECT 'kmeans_ivf' AS method, nq AS n_queries, n_hit_queries, mrr_x2520\n"
    sb ++= s"FROM mrr_kmeans_ivf, nqv\n"
    sb ++= s"UNION ALL SELECT 'nsw_beam', nq, n_hit_queries, mrr_x2520 FROM mrr_nsw_beam, nqv\n"
    sb ++= s"UNION ALL SELECT 'nsw_hier', nq, n_hit_queries, mrr_x2520 FROM mrr_nsw_hier, nqv"
    sb.toString
  }

  /** DuckDB replay of the FULL q327 recall audit: hub sample, M-nearest
    * adjacency, every beam-search round unrolled, corpus attachment, the
    * three probe strategies (nsw beam / full hub scan / learned-k-means
    * IVF via [[KMeansIVF.fitReplayCtes]]), candidate scans, top-k
    * re-ranks, the exact truth set, and the integer recall rollup —
    * so the recall numbers themselves are hash-checked, not asserted. */
  def recallOracleSql(
      table: String, idCol: String, vecCol: String, p: Params, k: Int,
      queryCap: Long, kmClusters: Int, kmIters: Int, kmSampleCap: Long): String = {
    def cos(a: String, b: String): String = KMeansIVF.cosSql(a, b)
    val h = TextHash.md5LongSql("id::VARCHAR")
    def modOf(cap: Long) = s"(SELECT greatest(1, (count(*) + ${cap - 1}) // $cap) FROM e)"
    val sb = new StringBuilder
    // kmeans fit prefix: defines e(id, v), assigned(neighbor_id, cv2,
    // bucket), c<kmIters>(cid, cv) — all reused below
    sb ++= KMeansIVF.fitReplayCtes(table, idCol, vecCol, kmClusters, kmIters, kmSampleCap)
    val cFin = s"c$kmIters"
    sb ++= routingCtes(p, s"$h % ${modOf(queryCap)} = 0")
    val vFin = s"v${p.rounds}"
    sb ++= s"scanp AS (SELECT query_id, hid AS hub FROM (\n"
    sb ++= s"    SELECT query_id, hid, row_number() OVER (PARTITION BY query_id ORDER BY c DESC, hid) AS rn\n"
    sb ++= s"    FROM hscore) WHERE rn <= ${p.nprobe}),\n"
    sb ++= s"truth AS MATERIALIZED (SELECT query_id, nid FROM (\n"
    sb ++= s"    SELECT q.query_id, n.id AS nid,\n"
    sb ++= s"      row_number() OVER (PARTITION BY q.query_id ORDER BY ${cos("q.qv", "n.v")} DESC, n.id) AS rn\n"
    sb ++= s"    FROM qs q JOIN e n ON n.id != q.query_id) WHERE rn <= $k),\n"
    // kmeans probes (nprobe = 1) over the fitted centroids
    sb ++= s"kmp AS (SELECT query_id, bucket FROM (\n"
    sb ++= s"    SELECT q.query_id, c.cid AS bucket,\n"
    sb ++= s"      row_number() OVER (PARTITION BY q.query_id ORDER BY ${cos("q.qv", "c.cv")} DESC, c.cid) AS rn\n"
    sb ++= s"    FROM qs q CROSS JOIN $cFin c) WHERE rn <= 1),\n"
    // per-method candidate scans + top-k re-rank + hit counts
    def method(name: String): Unit = {
      sb ++= s"top_$name AS (SELECT query_id, nid FROM (\n"
      sb ++= s"    SELECT query_id, nid, row_number() OVER (PARTITION BY query_id ORDER BY c DESC, nid) AS rn\n"
      sb ++= s"    FROM cand_$name) WHERE rn <= $k),\n"
      sb ++= s"stat_$name AS (SELECT\n"
      sb ++= s"    (SELECT count(*) FROM cand_$name)::BIGINT AS candidates,\n"
      sb ++= s"    (SELECT count(*) FROM truth t JOIN top_$name f\n"
      sb ++= s"       ON t.query_id = f.query_id AND t.nid = f.nid)::BIGINT AS hits),\n"
      ()
    }
    sb ++= s"cand_nsw AS (SELECT p.query_id, t.id AS nid, ${cos("q.qv", "t.v")} AS c\n"
    sb ++= s"    FROM nswp p JOIN hatt t ON t.hub = p.hub AND t.id != p.query_id\n"
    sb ++= s"    JOIN qs q ON q.query_id = p.query_id),\n"
    method("nsw")
    sb ++= s"cand_scan AS (SELECT p.query_id, t.id AS nid, ${cos("q.qv", "t.v")} AS c\n"
    sb ++= s"    FROM scanp p JOIN hatt t ON t.hub = p.hub AND t.id != p.query_id\n"
    sb ++= s"    JOIN qs q ON q.query_id = p.query_id),\n"
    method("scan")
    sb ++= s"cand_km AS (SELECT p.query_id, a.neighbor_id AS nid, ${cos("q.qv", "a.cv2")} AS c\n"
    sb ++= s"    FROM kmp p JOIN assigned a ON a.bucket = p.bucket AND a.neighbor_id != p.query_id\n"
    sb ++= s"    JOIN qs q ON q.query_id = p.query_id),\n"
    method("km")
    sb ++= s"nqv AS (SELECT count(*)::BIGINT AS nq FROM qs),\n"
    sb ++= s"nhv AS (SELECT count(*)::BIGINT AS nh FROM hubs),\n"
    sb ++= s"ncv AS (SELECT count(*)::BIGINT AS nc FROM $cFin),\n"
    sb ++= s"nswev AS (SELECT count(*)::BIGINT AS ev FROM $vFin)\n"
    sb ++= s"SELECT \'nsw_beam\' AS method, nq AS n_queries, ev AS hub_evals, candidates,\n"
    sb ++= s"  hits AS hits10, ((hits * 10000) // ($k * nq))::BIGINT AS recall_bp\n"
    sb ++= s"FROM stat_nsw, nqv, nswev\n"
    sb ++= s"UNION ALL\n"
    sb ++= s"SELECT \'hub_scan\', nq, (nq * nh)::BIGINT, candidates, hits,\n"
    sb ++= s"  ((hits * 10000) // ($k * nq))::BIGINT FROM stat_scan, nqv, nhv\n"
    sb ++= s"UNION ALL\n"
    sb ++= s"SELECT \'kmeans_ivf\', nq, (nq * nc)::BIGINT, candidates, hits,\n"
    sb ++= s"  ((hits * 10000) // ($k * nq))::BIGINT FROM stat_km, nqv, ncv"
    sb.toString
  }
}
