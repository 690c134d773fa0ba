package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity over `array<float>` embedding columns.
  *
  * All scalar math is built-in higher-order functions (`zip_with` +
  * `aggregate`) — codegen'd column expressions, no UDFs. Vectors are cast to
  * `array<double>` first so Spark and DuckDB fold the identical sequence of
  * double operations (left-to-right) and produce bit-identical cosines.
  *
  * Scale paths:
  *   - [[nearDupPairs]] / [[topK]] are exact brute force — the correctness
  *     baseline, O(n·m) comparisons. Fine for a broadcast-sized query set
  *     against a large corpus (the common "dedupe new batch against corpus"
  *     shape): Spark broadcasts the small side, so no shuffle of the corpus.
  *   - [[ivfTopK]] is the ANN scale path: a coarse quantizer (centroid per
  *     partition key) prunes the corpus to `nprobe` buckets per query, so
  *     each query scans only ~nprobe/k of the data. Bucket assignment is a
  *     broadcast join against the (tiny) centroid table.
  */
object VectorOps {

  /** Cast to array<double> once; all downstream math is exact-deterministic. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Codegen'd native loop (see [[graft.functions.DotProduct]]); summation
    * order identical to the HOF `aggregate(zip_with(...))` formulation. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force near-duplicate pairs `(id_a, id_b, cosine)` at/above a
    * cosine threshold. O(n²/2) — use for modest n or pre-blocked input;
    * the LSH/IVF variants are the large-corpus path. */
  def nearDupPairs(emb: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    // precompute norms map-side: the O(n^2) join then only does the dot
    val e = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v")))
    e.as("a").join(e.as("b"), col("a.id") < col("b.id"))
      .withColumn("cos", dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
      .filter(col("cos") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        graft.functions.PortableMath.roundPortable(col("cos"), 3).as("cosine"))
  }

  /** Exact top-k cosine neighbors for each query vector. The query side is
    * expected small (it is broadcast); ties broken by neighbor id.
    *
    * Selection runs through the [[graft.functions.TopKByScore]] aggregate,
    * not `row_number().over(window)`: the per-query buffer is bounded at k
    * and combines map-side, so the shuffle carries k rows per query instead
    * of the full |queries|×|corpus| score matrix — the difference that
    * matters when the corpus is the 100 TB side. */
  def topK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", norm(col("cv")))
    broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKAggregate.topK(col("cos"), col("neighbor_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t.payload").as("neighbor_id"),
        (col("pos") + 1).cast("int").as("rank"),
        graft.functions.PortableMath.roundPortable(col("t.score"), 3).as("cosine"))
  }

  /** Random-hyperplane (sign) LSH near-duplicate pairs — the LSH-bucketed
    * scale path for embedding dedup: `tables` independent hash tables, each
    * keyed by `planesPerTable` sign bits of md5-derived ±1 hyperplanes.
    * Same-bucket candidates are verified with the exact cosine threshold.
    * Probabilistic recall (more tables → higher); candidates shuffle on the
    * (table, bucket) key — linear, never O(n²).
    *
    * Determinism & portability: hyperplane component (p, d) is
    * `+1 if md5("p:d") is odd else -1` — reproducible in SQL, so the DuckDB
    * oracle replays the identical pipeline. The sign test uses
    * `round(dot, 9) >= 0` so a last-ulp summation difference between
    * engines cannot flip a bucket bit. */
  def rpLshNearDupPairs(
      emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, tables: Int = 6, planesPerTable: Int = 4, dims: Int = 64): DataFrame = {
    val e = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v")))
    val bucketCols = (0 until tables).map { t =>
      val bits = (0 until planesPerTable).map { p =>
        val plane = array((0 until dims).map(d =>
          lit(graft.functions.TextHash.planeSign(t * planesPerTable + p, d))): _*)
        when(round(dot(col("v"), plane), 9) >= 0, lit(1 << p)).otherwise(lit(0))
      }
      struct(lit(t).as("tbl"), bits.reduce(_ + _).as("bkt"))
    }
    // Bucket rows are NARROW (id, bucket) — the 6-table explode and the
    // self-join shuffle never carry the 64-double vectors. Candidate pairs
    // are deduped first (multi-table duplicates collapse before any math),
    // and only then are the vectors joined back for the exact-cosine
    // verify — the same candidates-only shape as the MinHash verify, and
    // the traffic profile that matters when the embedding corpus is the
    // 100 TB side.
    val buckets = e.select(col("id"), explode(array(bucketCols: _*)).as("b"))
    val cand = buckets.as("x")
      .join(buckets.as("y"), col("x.b") === col("y.b") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    val va = e.select(col("id").as("id_a"), col("v").as("v_a"), col("nrm").as("nrm_a"))
    val vb = e.select(col("id").as("id_b"), col("v").as("v_b"), col("nrm").as("nrm_b"))
    cand.join(va, "id_a").join(vb, "id_b")
      .withColumn("cos", dot(col("v_a"), col("v_b")) / (col("nrm_a") * col("nrm_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), graft.functions.PortableMath.roundPortable(col("cos"), 3).as("cosine"))
  }

  /** IVF-style ANN: centroids = per-`bucketCol` mean vector (rounded to 6
    * decimals so the centroid doubles are reproducible across engines);
    * each query probes the `nprobe` nearest centroids and brute-forces only
    * those buckets. Recall < 1.0 by design; exactness is [[topK]]'s job. */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, bucketCol: String,
      k: Int, nprobe: Int): DataFrame = {
    val c = corpus.select(
      col(idCol).as("neighbor_id"), col(bucketCol).as("bucket"),
      asDouble(col(vecCol)).as("cv"))
    // mean vector per bucket: explode positions, avg per (bucket, pos).
    val dims = c.select(posexplode(col("cv")).as(Seq("pos", "x")), col("bucket"))
      .groupBy(col("bucket"), col("pos"))
      .agg(round(avg(col("x")), 6).as("m"))
    val centroids = dims
      .groupBy(col("bucket"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("bucket"), transform(col("pm"), p => p.getField("m")).as("centroid"))

    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("ccos").desc, col("bucket").asc)
    val probed = q.join(broadcast(centroids))
      .withColumn("ccos", cosine(col("qv"), col("centroid")))
      .withColumn("prank", row_number().over(wProbe))
      .filter(col("prank") <= nprobe)
      .select(col("query_id"), col("qv"), col("bucket"))

    broadcast(probed)
      .join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKAggregate.topK(col("cos"), col("neighbor_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t.payload").as("neighbor_id"),
        (col("pos") + 1).cast("int").as("rank"),
        graft.functions.PortableMath.roundPortable(col("t.score"), 3).as("cosine"))
  }
}
