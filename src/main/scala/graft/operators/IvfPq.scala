package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._

import graft.functions.{KMeansNearestUtil, PqExpressions, TextHash, TopKAggregate, VectorExpressions}

/** The composed billion-scale ANN layout: an IVF-partitioned index of
  * product-quantization CODES — [[KMeansIVF]]'s routing (learned coarse
  * centroids, one storage partition per bucket, static partition-filter
  * probes) carrying [[ProductQuantizer]]'s memory side (8×4-bit code words
  * instead of raw vectors).
  *
  * Query path = the three-stage funnel every production vector store runs:
  *   1. ROUTE — nprobe nearest coarse centroids per query (driver-side on
  *      the bounded query batch; centroid sidecar is nClusters rows);
  *   2. ADC SCAN — read ONLY the probed bucket directories (partition
  *      pruning) and ONLY the code column (the raw vector never exists in
  *      the index), approximate L2² as Σ lut[sub][code] with each query's
  *      precomputed integer lookup table; keep a bounded `shortlist` per
  *      query via [[graft.functions.TopKByScore]];
  *   3. EXACT RE-RANK — join the (|queries|·shortlist)-row short list
  *      back to the primary store by id (broadcast-hash: the corpus is
  *      streamed, never shuffled) and rank the true integer micro² L2.
  *
  * Why this is the 100 TB plan: the index scan reads codes at m·log2(k)
  * bits per vector (32× smaller than the float vectors), touches only
  * nprobe/nClusters of the corpus directories, and the only full-width
  * vector reads are the short-list point lookups.
  *
  * Determinism: both fits ride bounded md5 hash-samples
  * ([[KMeansIVF.sampleModFor]]); ADC and re-rank distances are exact
  * integer micro² (codes < 2^47 sums — double-exact for TopKByScore);
  * ties break (distance asc, id asc) everywhere. [[oracleSql]] replays the
  * ENTIRE pipeline — both fits, routing, ADC, re-rank — in DuckDB by
  * composing [[KMeansIVF.fitReplayCtes]] with
  * [[ProductQuantizer.oracleCtes]] (their CTE namespaces are disjoint).
  */
object IvfPq {

  /** Write the composed index under `dir`:
    * `data/` = parquet partitioned by IVF bucket with rows
    * `(neighbor_id, codes: array<int>)` — NO vector column — plus the
    * coarse centroids and PQ codebooks as JSON sidecars. Returns
    * (centroids, codebooks) for callers that probe in-process. */
  def writeIndex(
      corpus: DataFrame, idCol: String, vecCol: String, dir: String,
      nClusters: Int = 10, ivfIters: Int = 4, m: Int = 8, kCodes: Int = 16,
      pqIters: Int = 3, ivfSampleCap: Long = 10000, pqSampleCap: Long = 500)
      : (Array[Array[Double]], Array[Array[Array[Long]]]) = {
    // a REBUILD over an existing index first revokes readiness: a crash
    // anywhere below leaves no `_ready`, and probes fail loudly instead of
    // pairing fresh data with stale sidecars (or truncated JSON)
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(s"$dir/_ready"))
    val c = corpus.select(
        col(idCol).as("neighbor_id"), VectorOps.asDouble(col(vecCol)).as("cv"))
      .withColumn("vq", ProductQuantizer.micro(col("cv")))
      .persist() // count + two bounded sample collects + the index write
    val n = c.count()

    val ivfMod = KMeansIVF.sampleModFor(n, ivfSampleCap)
    val ivfSample = c
      .filter(pmod(TextHash.md5Long(col("neighbor_id").cast("string")), lit(ivfMod)) === 0)
      .select(col("neighbor_id"), col("cv")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val centroids = KMeansIVF.fit(ivfSample, nClusters, ivfIters)

    val pqMod = KMeansIVF.sampleModFor(n, pqSampleCap)
    val pqSample = c
      .filter(pmod(TextHash.md5Long(col("neighbor_id").cast("string")), lit(pqMod)) === 0)
      .select(col("neighbor_id"), col("vq")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val cb = ProductQuantizer.fit(pqSample, m, kCodes, pqIters)

    // bucket assignment AND code encoding are both map-side codegen'd
    // expressions — the corpus is scanned once, never shuffled or joined
    c.withColumn("bucket",
        element_at(VectorExpressions.nearestCentroids(col("cv"), centroids, 1), 1))
      .withColumn("codes", PqExpressions.pqEncodeMicro(col("vq"), cb).getField("codes"))
      .select(col("neighbor_id"), col("codes"), col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/data")
    c.unpersist()

    // sidecars land atomically (temp + same-dir atomic move — never a
    // torn/truncated JSON), and `_ready` is created only after BOTH are in
    // place, so data and sidecars can never disagree for a reader
    val cjson = centroids.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
    atomicWrite(s"$dir/centroids.json", cjson)
    val bjson = cb.map(_.map(_.mkString("[", ",", "]")).mkString("[", ",", "]"))
      .mkString("[", ",", "]")
    atomicWrite(s"$dir/codebooks.json", bjson)
    atomicWrite(s"$dir/_ready", "1")
    (centroids, cb)
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

  /** Probe-side integrity gate: an index dir missing `_ready` was interrupted
    * mid-(re)build — its data and sidecars may disagree. */
  def requireReady(dir: String): Unit =
    require(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/_ready")),
      s"IVF+PQ index at $dir has no _ready marker — a (re)build was " +
        "interrupted before its sidecars were committed; rebuild the index")

  def readCodebooks(dir: String): Array[Array[Array[Long]]] = {
    val json = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/codebooks.json"))
    json.trim.stripPrefix("[[[").stripSuffix("]]]").split("\\]\\],\\[\\[")
      .map(_.split("\\],\\[").map(_.split(",").map(_.trim.toLong)))
  }

  /** Probe a persisted index: route → pruned ADC code scan → exact
    * re-rank against `corpus` (the primary store with the raw vectors).
    * `queries` must be bounded by contract (the [[KMeansIVF.indexTopK]]
    * posture — derive it with a [[KMeansIVF.sampleModFor]] modulus).
    * Output `(qid, rank, neighbor_id, d2_micro2)`, exact integers. */
  def probeTopK(
      queries: DataFrame, corpus: DataFrame, indexDir: String,
      idCol: String, vecCol: String, k: Int, nprobe: Int, shortlist: Int): DataFrame = {
    val spark = queries.sparkSession
    requireReady(indexDir)
    val centroids = KMeansIVF.readCentroids(indexDir)
    val cb = readCodebooks(indexDir)
    val normsC = KMeansNearestUtil.norms(centroids)

    // bounded query batch to the driver: per query the probe buckets (the
    // exact sim-desc/cid-asc rule the oracle's ORDER BY replays) and the
    // exact-integer ADC lookup table
    val qRows = queries.select(
        col(idCol).as("qid"), VectorOps.asDouble(col(vecCol)).as("qdv"))
      .withColumn("qv", ProductQuantizer.micro(col("qdv")))
      .collect()
      .map { r =>
        val qid = r.getLong(0)
        val qdv = r.getSeq[Double](1).toArray
        val qv = r.getSeq[Long](2).toArray
        val near = KMeansNearestUtil.nearest(
          new GenericArrayData(qdv), centroids, normsC, nprobe)
        val buckets = (0 until near.numElements()).map(near.getInt)
        (qid, qv.toSeq, ProductQuantizer.adcLut(qv, cb).map(_.toSeq).toSeq, buckets)
      }.toSeq
    import spark.implicits._
    val qDf = qRows.toDF("qid", "qv", "lut", "buckets")
    val qb = qDf.select(col("qid"), col("lut"), explode(col("buckets")).as("bucket"))
    val allBuckets = qRows.flatMap(_._4).distinct.sorted

    // static partition filter: only the probed bucket directories are read,
    // and the scan schema is (neighbor_id, codes) — no vector column exists
    val codes = spark.read.parquet(s"$indexDir/data")
      .filter(col("bucket").isin(allBuckets.map(Integer.valueOf): _*))
    val short = broadcast(qb).join(codes, Seq("bucket"))
      .filter(col("qid") =!= col("neighbor_id"))
      .withColumn("adc", expr(
        "aggregate(zip_with(codes, lut, (c, l) -> element_at(l, c + 1)), " +
          "CAST(0 AS BIGINT), (a, x) -> a + x)"))
      .groupBy(col("qid"))
      .agg(TopKAggregate.topK(
        (-col("adc")).cast("double"), col("neighbor_id"), shortlist).as("top"))
      .select(col("qid"), explode(col("top").getField("payload")).as("neighbor_id"))

    // exact re-rank: broadcast the (|queries|·shortlist)-row short list and
    // STREAM the primary store through the join — no corpus shuffle
    val cm = corpus.select(
      col(idCol).as("neighbor_id"), ProductQuantizer.micro(col(vecCol)).as("cvq"))
    broadcast(short.join(qDf.select(col("qid"), col("qv")), "qid"))
      .join(cm, Seq("neighbor_id"))
      .withColumn("d2", expr(
        "aggregate(zip_with(qv, cvq, (a, b) -> (a - b) * (a - b)), " +
          "CAST(0 AS BIGINT), (a, x) -> a + x)"))
      .groupBy(col("qid"))
      .agg(TopKAggregate.topK((-col("d2")).cast("double"), col("neighbor_id"), k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("t.payload").as("neighbor_id"), (-col("t.score")).cast("long").as("d2_micro2"))
  }

  /** Full-pipeline DuckDB replay: IVF fit + PQ fit (disjoint CTE
    * namespaces, concatenated), query routing, ADC over the encoded
    * corpus restricted to probed buckets, bounded short list, exact
    * re-rank. `queryPred` filters `id` (e.g. the sampleModFor predicate). */
  def oracleSql(
      table: String, idCol: String, vecCol: String, queryPred: String,
      k: Int, nprobe: Int, shortlist: Int,
      nClusters: Int = 10, ivfIters: Int = 4, m: Int = 8, kCodes: Int = 16,
      pqIters: Int = 3, ivfSampleCap: Long = 10000, pqSampleCap: Long = 500): String = {
    def cos(a: String, b: String): String =
      s"(list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))))"
    val fin = s"c$ivfIters"
    val pcFin = s"pc$pqIters"
    val sb = new StringBuilder
    sb ++= KMeansIVF.fitReplayCtes(table, idCol, vecCol, nClusters, ivfIters, ivfSampleCap)
    sb ++= ProductQuantizer.oracleCtes(table, idCol, vecCol, m, kCodes, pqIters, pqSampleCap)
    sb ++= s"q AS (SELECT id AS qid, v AS qdv FROM e WHERE $queryPred),\n"
    sb ++= s"probes AS (SELECT qid, bucket FROM (\n"
    sb ++= s"  SELECT q.qid, c.cid AS bucket,\n"
    sb ++= s"    row_number() OVER (PARTITION BY q.qid\n"
    sb ++= s"      ORDER BY ${cos("q.qdv", "c.cv")} DESC, c.cid) AS pr\n"
    sb ++= s"  FROM q CROSS JOIN $fin c) WHERE pr <= $nprobe),\n"
    sb ++= s"qm AS (SELECT em.id AS qid, em.vq AS qv FROM em JOIN q ON em.id = q.qid),\n"
    sb ++= s"qsub AS (SELECT qid, sub,\n"
    sb ++= s"  qv[(sub * (len(qv) // $m) + 1):((sub + 1) * (len(qv) // $m))] AS qsv\n"
    sb ++= s"  FROM qm, (SELECT unnest(range(0, $m)) AS sub)),\n"
    sb ++= s"qlut AS MATERIALIZED (SELECT qid, sub, cid, sum((x - y) * (x - y)) AS qd FROM (\n"
    sb ++= s"    SELECT s.qid, s.sub, c.cid, unnest(s.qsv) AS x, unnest(c.cv) AS y\n"
    sb ++= s"    FROM qsub s JOIN $pcFin c USING (sub)) GROUP BY 1, 2, 3),\n"
    sb ++= s"cand AS (SELECT p.qid, a.neighbor_id AS id FROM probes p\n"
    sb ++= s"  JOIN assigned a ON p.bucket = a.bucket AND a.neighbor_id <> p.qid),\n"
    sb ++= s"adcs AS (SELECT cd.qid, cd.id, sum(l.qd)::BIGINT AS adc\n"
    sb ++= s"  FROM cand cd JOIN easg g ON g.id = cd.id\n"
    sb ++= s"  JOIN qlut l ON l.qid = cd.qid AND l.sub = g.sub AND l.cid = g.cid\n"
    sb ++= s"  GROUP BY 1, 2),\n"
    sb ++= s"short AS (SELECT qid, id FROM (\n"
    sb ++= s"  SELECT qid, id, row_number() OVER (PARTITION BY qid\n"
    sb ++= s"    ORDER BY adc, id) AS rn FROM adcs) WHERE rn <= $shortlist),\n"
    sb ++= s"rer AS (SELECT qid, id, sum((x - y) * (x - y))::BIGINT AS d2 FROM (\n"
    sb ++= s"    SELECT sh.qid, sh.id, unnest(qm.qv) AS x, unnest(em.vq) AS y\n"
    sb ++= s"    FROM short sh JOIN qm ON qm.qid = sh.qid JOIN em ON em.id = sh.id)\n"
    sb ++= s"  GROUP BY 1, 2)\n"
    sb ++= s"SELECT qid, rn::INT AS rank, id AS neighbor_id, d2 AS d2_micro2 FROM (\n"
    sb ++= s"  SELECT qid, id, d2, row_number() OVER (PARTITION BY qid\n"
    sb ++= s"    ORDER BY d2, id) AS rn FROM rer) WHERE rn <= $k"
    sb.toString
  }
}
