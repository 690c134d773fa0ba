package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.functions.PqExpressions

/** Incremental IVF+PQ maintenance: append-without-refit under the frozen
  * coarse centroids AND frozen codebooks, crash-atomic `_done` visibility,
  * idempotent replay, compaction, and the one-sided quantization-error
  * drift gate. */
class IvfPqAppendSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def freshIdx(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"ivfpq_append_$tag").toString

  private lazy val e = Tables.embeddings(spark, dir)
  private lazy val base = e.filter(col("vec_id") % 2 === 0)
  private lazy val batch = e.filter(col("vec_id") % 2 =!= 0)

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet

  private def probe(idx: String) = IvfPq.probeTopK(
    e.filter(col("vec_id") < 10), e, idx, "vec_id", "embedding",
    k = 3, nprobe = 2, shortlist = 10)

  test("probe-after-append == probe of a union index under the SAME fits") {
    val idxA = freshIdx("a")
    val (cents, cb) = IvfPq.writeIndex(base, "vec_id", "embedding", idxA,
      ivfSampleCap = 100, pqSampleCap = 500)
    IvfPq.appendIndex(batch, "vec_id", "embedding", idxA, "b1")

    // reference index: the full union assigned + encoded under the SAME
    // centroid/codebook generation in one shot
    val idxB = freshIdx("b")
    e.select(col("vec_id").as("neighbor_id"),
        VectorOps.asDouble(col("embedding")).as("cv"))
      .withColumn("vq", ProductQuantizer.micro(col("cv")))
      .withColumn("bucket", element_at(
        graft.functions.VectorExpressions.nearestCentroids(col("cv"), cents, 1), 1))
      .withColumn("codes", PqExpressions.pqEncodeMicro(col("vq"), cb).getField("codes"))
      .select(col("neighbor_id"), col("codes"), col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$idxB/data")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$idxB/centroids.json"),
      cents.map(_.mkString("[", ",", "]")).mkString("[", ",", "]"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$idxB/codebooks.json"),
      cb.map(_.map(_.mkString("[", ",", "]")).mkString("[", ",", "]"))
        .mkString("[", ",", "]"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$idxB/_ready"), "1")

    assert(rows(probe(idxA)) == rows(probe(idxB)),
      "append tree must serve exactly the no-refit union index")
  }

  test("uncommitted append is invisible; same-batchId retry wipes and converges") {
    val idx = freshIdx("crash")
    IvfPq.writeIndex(base, "vec_id", "embedding", idx,
      ivfSampleCap = 100, pqSampleCap = 500)
    val before = rows(probe(idx))
    val partial = new java.io.File(s"$idx/appends/bx/data/bucket=0")
    assert(partial.mkdirs())
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$idx/appends/bx/data/bucket=0/garbage.txt"), "not parquet")
    assert(rows(probe(idx)) == before, "uncommitted append must not be read")
    val r = IvfPq.appendIndex(batch, "vec_id", "embedding", idx, "bx")
    assert(r.nBatch == batch.count())
    assert(new java.io.File(s"$idx/appends/bx/_done").exists())
    assert(rows(probe(idx)) != before, "committed append must be served")
  }

  test("committed-append replay returns the ORIGINAL verdict, even after later appends") {
    val idx = freshIdx("idem")
    IvfPq.writeIndex(base, "vec_id", "embedding", idx,
      ivfSampleCap = 100, pqSampleCap = 500)
    val half = batch.filter(col("vec_id") % 4 === 1)
    val rest = batch.filter(col("vec_id") % 4 === 3)
    val r1 = IvfPq.appendIndex(half, "vec_id", "embedding", idx, "b1")
    val r2 = IvfPq.appendIndex(half, "vec_id", "embedding", idx, "b1")
    assert(r1 == r2, "replay must return the identical verdict")
    IvfPq.appendIndex(rest, "vec_id", "embedding", idx, "b2")
    val r3 = IvfPq.appendIndex(half, "vec_id", "embedding", idx, "b1")
    assert(r1 == r3, "replay after later appends must still return b1's verdict")
  }

  test("a rebuild clears the previous generation's appends and revokes readiness mid-way") {
    val idx = freshIdx("rebuild")
    IvfPq.writeIndex(base, "vec_id", "embedding", idx,
      ivfSampleCap = 100, pqSampleCap = 500)
    IvfPq.appendIndex(batch, "vec_id", "embedding", idx, "b1")
    assert(new java.io.File(s"$idx/appends/b1/_done").exists())
    IvfPq.writeIndex(e, "vec_id", "embedding", idx,
      ivfSampleCap = 100, pqSampleCap = 500)
    assert(!new java.io.File(s"$idx/appends").exists(),
      "appends encoded against the old codebooks must not survive a rebuild")
    assert(probe(idx).count() > 0)
  }

  test("compactAppends: identical probes, absorbed drift baselines, disjointness guard") {
    val idx = freshIdx("cmp")
    IvfPq.writeIndex(base, "vec_id", "embedding", idx,
      ivfSampleCap = 100, pqSampleCap = 500)
    IvfPq.appendIndex(batch.filter(col("vec_id") % 4 === 1), "vec_id", "embedding", idx, "b1")
    IvfPq.appendIndex(batch.filter(col("vec_id") % 4 === 3), "vec_id", "embedding", idx, "b2")
    val out = freshIdx("cmpout")
    IvfPq.compactAppends(spark, idx, out)
    assert(!new java.io.File(s"$out/appends").exists())
    assert(rows(probe(idx)) == rows(probe(out)),
      "compaction must not change any probe result")
    val probeBatch = base.select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    val rIdx = IvfPq.appendIndex(probeBatch, "vec_id", "embedding", idx, "b3")
    val rOut = IvfPq.appendIndex(probeBatch, "vec_id", "embedding", out, "b3")
    assert(rIdx == rOut, s"absorbed stats must equal base+fragments: $rIdx vs $rOut")
    val ex = intercept[IllegalArgumentException] {
      IvfPq.compactAppends(spark, idx, s"$idx/sub")
    }
    assert(ex.getMessage.contains("disjoint"))
    assert(!new java.io.File(s"$idx/append.lock").exists())
  }

  test("drift gate stays total at ZERO quantization error (perfectly-codable base)") {
    import spark.implicits._
    // one distinct vector => every codebook centroid equals it => the
    // base's exact quantization error is 0, a legitimate state the gate
    // must survive (the +1-smoothed ratio; a raw ratio is div-by-zero)
    val v = (0 until 8).map(i => (i + 1).toDouble)
    val base = (0L until 50L).map(id => (id, v)).toDF("vec_id", "embedding")
    val idx = freshIdx("zero")
    IvfPq.writeIndex(base, "vec_id", "embedding", idx,
      ivfSampleCap = 100, pqSampleCap = 500)
    // a zero-error batch over a zero-error base is clean parity
    val same = (100L until 150L).map(id => (id, v)).toDF("vec_id", "embedding")
    val ok = IvfPq.appendIndex(same, "vec_id", "embedding", idx, "same")
    assert(ok.prevSumErr == 0L && ok.batchSumErr == 0L && !ok.rebuild, s"$ok")
    // lossy rows over a PERFECT base are exactly the drift the one-sided
    // gate exists for — must flag, not divide by zero
    val lossy = (200L until 250L)
      .map(id => (id, (0 until 8).map(i => (i + 1) * 3.7 + id * 0.01)))
      .toDF("vec_id", "embedding")
    val bad = IvfPq.appendIndex(lossy, "vec_id", "embedding", idx, "lossy")
    assert(bad.rebuild && bad.driftBp > 20000, s"$bad")
  }

  test("drift gate: iid batch passes, amplitude-shifted batch crosses the doubling cut") {
    val idx = freshIdx("drift")
    IvfPq.writeIndex(base, "vec_id", "embedding", idx,
      ivfSampleCap = 100, pqSampleCap = 500)
    val iid = IvfPq.appendIndex(batch, "vec_id", "embedding", idx, "iid")
    assert(!iid.rebuild, s"iid batch must pass the gate, got $iid")

    // quantization error scales ~quadratically with amplitude once the
    // codebooks stop covering the range: a 10x-scaled copy of the SAME
    // distribution lands ~100x the per-vector error — decisively past the
    // one-sided 20000 bp doubling cut
    val shifted = batch.select((col("vec_id") + 200000).as("vec_id"),
      expr("transform(embedding, x -> x * CAST(10.0 AS FLOAT))").as("embedding"))
    val idx2 = freshIdx("drift2")
    IvfPq.writeIndex(base, "vec_id", "embedding", idx2,
      ivfSampleCap = 100, pqSampleCap = 500)
    val bad = IvfPq.appendIndex(shifted, "vec_id", "embedding", idx2, "shift")
    assert(bad.rebuild && bad.driftBp > 20000,
      s"amplitude-shifted batch must flag rebuild, got $bad")
  }
}
