package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Incremental NSW graph-index maintenance: attach-without-rebuild to the
  * frozen hub layer, crash-atomic `_done` visibility, idempotent replay,
  * compaction, and the two-sided attachment-cosine drift gate. */
class NswAppendSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def freshIdx(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"nsw_append_$tag").toString

  private lazy val e = Tables.embeddings(spark, dir)
  private lazy val base = e.filter(col("vec_id") % 2 === 0)
  private lazy val batch = e.filter(col("vec_id") % 2 =!= 0)
  private lazy val p = NswGraph.Params(
    hubCap = 32, m = 4, beamWidth = 3, rounds = 3, nprobe = 4, nEntries = 4)

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet

  private def search(idx: String) = NswGraph.indexSearch(
    e.filter(col("vec_id") < 10), idx, "vec_id", "embedding", k = 3, p)

  test("search-after-append == search of a union index under the SAME graph") {
    val idxA = freshIdx("a")
    val g = NswGraph.writeIndex(base, "vec_id", "embedding", idxA, p)
    NswGraph.appendIndex(batch, "vec_id", "embedding", idxA, "b1")

    // reference index: the full union attached to the same frozen hub
    // layer in one shot, served under the same graph sidecar
    val idxB = freshIdx("b")
    val c = e.select(col("vec_id").as("neighbor_id"),
      VectorOps.asDouble(col("embedding")).as("cv"))
    NswGraph.attach(c, g).write.mode("overwrite")
      .partitionBy("bucket").parquet(s"$idxB/data")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$idxA/graph.txt"),
      java.nio.file.Paths.get(s"$idxB/graph.txt"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$idxB/_ready"), "1")

    assert(rows(search(idxA)) == rows(search(idxB)),
      "append tree must serve exactly the no-rebuild union index")
  }

  test("uncommitted append is invisible; same-batchId retry wipes and converges") {
    val idx = freshIdx("crash")
    NswGraph.writeIndex(base, "vec_id", "embedding", idx, p)
    val before = rows(search(idx))
    val partial = new java.io.File(s"$idx/appends/bx/data/bucket=0")
    assert(partial.mkdirs())
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$idx/appends/bx/data/bucket=0/garbage.txt"), "not parquet")
    assert(rows(search(idx)) == before, "uncommitted append must not be read")
    val r = NswGraph.appendIndex(batch, "vec_id", "embedding", idx, "bx")
    assert(r.nBatch == batch.count())
    assert(new java.io.File(s"$idx/appends/bx/_done").exists())
    assert(rows(search(idx)) != before, "committed append must be served")
  }

  test("committed-append replay returns the ORIGINAL verdict, even after later appends") {
    val idx = freshIdx("idem")
    NswGraph.writeIndex(base, "vec_id", "embedding", idx, p)
    val half = batch.filter(col("vec_id") % 4 === 1)
    val rest = batch.filter(col("vec_id") % 4 === 3)
    val r1 = NswGraph.appendIndex(half, "vec_id", "embedding", idx, "b1")
    val r2 = NswGraph.appendIndex(half, "vec_id", "embedding", idx, "b1")
    assert(r1 == r2, "replay must return the identical verdict")
    NswGraph.appendIndex(rest, "vec_id", "embedding", idx, "b2")
    val r3 = NswGraph.appendIndex(half, "vec_id", "embedding", idx, "b1")
    assert(r1 == r3, "replay after later appends must still return b1's verdict")
  }

  test("a rebuild clears the previous hub generation's appends") {
    val idx = freshIdx("rebuild")
    NswGraph.writeIndex(base, "vec_id", "embedding", idx, p)
    NswGraph.appendIndex(batch, "vec_id", "embedding", idx, "b1")
    assert(new java.io.File(s"$idx/appends/b1/_done").exists())
    NswGraph.writeIndex(e, "vec_id", "embedding", idx, p)
    assert(!new java.io.File(s"$idx/appends").exists(),
      "appends attached to the old hubs must not survive a rebuild")
    assert(search(idx).count() > 0)
  }

  test("compactAppends: identical searches, absorbed drift baselines, disjointness guard") {
    val idx = freshIdx("cmp")
    NswGraph.writeIndex(base, "vec_id", "embedding", idx, p)
    NswGraph.appendIndex(batch.filter(col("vec_id") % 4 === 1), "vec_id", "embedding", idx, "b1")
    NswGraph.appendIndex(batch.filter(col("vec_id") % 4 === 3), "vec_id", "embedding", idx, "b2")
    val out = freshIdx("cmpout")
    NswGraph.compactAppends(spark, idx, out)
    assert(!new java.io.File(s"$out/appends").exists())
    assert(rows(search(idx)) == rows(search(out)),
      "compaction must not change any search result")
    val probeBatch = base.select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    val rIdx = NswGraph.appendIndex(probeBatch, "vec_id", "embedding", idx, "b3")
    val rOut = NswGraph.appendIndex(probeBatch, "vec_id", "embedding", out, "b3")
    assert(rIdx == rOut, s"absorbed stats must equal base+fragments: $rIdx vs $rOut")
    val ex = intercept[IllegalArgumentException] {
      NswGraph.compactAppends(spark, idx, s"$idx/sub")
    }
    assert(ex.getMessage.contains("disjoint"))
    assert(!new java.io.File(s"$idx/append.lock").exists())
  }

  test("drift gate: iid batch passes, axis-shifted clusters flag rebuild") {
    val idx = freshIdx("drift")
    NswGraph.writeIndex(base, "vec_id", "embedding", idx, p)
    val iid = NswGraph.appendIndex(batch, "vec_id", "embedding", idx, "iid")
    assert(!iid.rebuild, s"iid batch must pass the gate, got $iid")

    // the IvfAppendSpec synthetic-shift construction: base = 3 tight
    // one-hot clusters (hubs land ON cluster axes), shifted batch lives
    // on DIFFERENT axes with a 5% residual — attachment cosines collapse
    // and the ratio crosses the 5000 bp halving cut decisively
    import spark.implicits._
    def oneHot(hot: Map[Int, Double]): Seq[Double] =
      (0 until 8).map(i => hot.getOrElse(i, 0.0))
    val synthBase = (0L until 300L).map(id =>
      (id, oneHot(Map((id % 3).toInt -> 1.0)))).toDF("vec_id", "embedding")
    val synthShift = (300L until 600L).map(id =>
      (id, oneHot(Map((id % 3).toInt -> 0.05, (4 + (id % 3)).toInt -> 1.0))))
      .toDF("vec_id", "embedding")
    val idx2 = freshIdx("drift2")
    NswGraph.writeIndex(synthBase, "vec_id", "embedding", idx2, p)
    val bad = NswGraph.appendIndex(synthShift, "vec_id", "embedding", idx2, "shift")
    assert(bad.rebuild && bad.driftBp < 5000,
      s"shifted batch must flag rebuild, got $bad")
  }
}
