package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Secondary indexes as transaction participants: a table + its dedup
  * index publish at ONE decision instant — crash anywhere never exposes
  * the half-state (table committed, index missing the batch, or vice
  * versa) that two independent commits would. */
class IndexTxnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(tag: String): String =
    Files.createTempDirectory(s"idxtxn_$tag").toString

  private def fps(ids: Seq[Long]): org.apache.spark.sql.DataFrame =
    ids.map(i => (i, i * 16L + 5L)).toDF("doc_id", "fp")

  private def probeIds(dir: String, probe: Seq[Long]): Set[Long] =
    HammingIndex.probe(spark, fps(probe), "doc_id", "fp", dir, maxHamming = 3)
      .select(col("corpus_id")).collect().map(_.getLong(0)).toSet

  // a probe that pairs ONLY with staged id 2 (fp 37): fp 485 = 37 with
  // three high bits flipped — Hamming 3 from fp(2)=37 but 5 from fp(1)=21
  private def probeFor2(dir: String): Set[Long] =
    HammingIndex.probe(spark, Seq((18L, 485L)).toDF("doc_id", "fp"),
        "doc_id", "fp", dir, maxHamming = 3)
      .select(col("corpus_id")).collect().map(_.getLong(0)).toSet

  test("table + index commit at one decision instant; crash pre-decision exposes nothing") {
    val tbl = fresh("t"); val idx = fresh("i"); val txd = fresh("d")
    SnapshotTable.commitAppend(Seq((1L, "a")).toDF("doc_id", "text"), tbl)
    HammingIndex.write(fps(Seq(1L)), "doc_id", "fp", idx, bits = 56)

    val h = SnapshotTxn.begin(txd, Seq(tbl), indexes = Seq(idx))
    SnapshotTxn.stageAppend(h, Seq((2L, "b")).toDF("doc_id", "text"), tbl)
    HammingIndex.stageAppend(spark, fps(Seq(2L)), "doc_id", "fp", idx, h)

    // pre-decision: NEITHER the table rows nor the index entries visible
    assert(SnapshotTable.read(spark, tbl).count() == 1)
    assert(probeFor2(idx).isEmpty,
      "staged index entries must be invisible before the decision")

    // simulate a COORDINATOR CRASH here: a fresh operator recovers both
    // members independently — transaction still in flight, nothing leaks
    assert(SnapshotTxn.recover(tbl) == "transaction in flight")
    assert(IndexTxn.recover(idx) == "transaction in flight")
    assert(SnapshotTable.read(spark, tbl).count() == 1)
    assert(probeFor2(idx).isEmpty)

    // the surviving handle commits: both flip at the single decision CAS
    SnapshotTxn.commit(h)
    assert(SnapshotTable.read(spark, tbl).count() == 2)
    assert(probeFor2(idx) == Set(2L),
      "committed index batch must serve probes")
    // and the batch id itself probes against the base corpus (2 vs 1
    // are Hamming-2 near-dups by construction)
    assert(probeIds(idx, Seq(2L)) == Set(1L))
  }

  test("crash BETWEEN decision and index finalization: recover completes the commit") {
    val tbl = fresh("t2"); val idx = fresh("i2"); val txd = fresh("d2")
    SnapshotTable.commitAppend(Seq((1L, "a")).toDF("doc_id", "text"), tbl)
    HammingIndex.write(fps(Seq(1L)), "doc_id", "fp", idx, bits = 56)
    val h = SnapshotTxn.begin(txd, Seq(tbl), indexes = Seq(idx))
    SnapshotTxn.stageAppend(h, Seq((2L, "b")).toDF("doc_id", "text"), tbl)
    HammingIndex.stageAppend(spark, fps(Seq(2L)), "doc_id", "fp", idx, h)

    // write the decision DIRECTLY (what commit() does first), then "crash"
    // before any finalization — the commit is already irrevocable
    Files.writeString(
      SnapshotTxn.decisionPath(h.txnDir, h.txid), "commit\n")
    // index entries are ALREADY visible through decision resolution,
    // even before recover runs (readers never wait on finalization)
    assert(probeIds(idx, Seq(2L)) == Set(1L))
    assert(SnapshotTable.read(spark, tbl).count() == 2)

    // recovery freezes + unlocks both members, idempotently
    assert(IndexTxn.recover(idx) == "finalized committed transaction")
    assert(SnapshotTxn.recover(tbl) == "finalized committed transaction")
    assert(IndexTxn.recover(idx) == "no open transaction")
    assert(Files.exists(
      IndexTxn.pendingDir(idx, h.txid).resolve("_committed")))
    // frozen: even deleting the decision file cannot un-commit
    Files.delete(SnapshotTxn.decisionPath(h.txnDir, h.txid))
    assert(probeIds(idx, Seq(2L)) == Set(1L))
    // and a NEW append (non-txn) over the merged view gates correctly:
    // re-adding id 2 must abort on the id-collision gate
    val ex = intercept[IllegalArgumentException] {
      HammingIndex.append(spark, fps(Seq(2L)), "doc_id", "fp", idx)
    }
    assert(ex.getMessage.contains("duplicate"))
  }

  test("abort deletes the staged index subtree; nothing was ever visible") {
    val tbl = fresh("t3"); val idx = fresh("i3"); val txd = fresh("d3")
    SnapshotTable.commitAppend(Seq((1L, "a")).toDF("doc_id", "text"), tbl)
    HammingIndex.write(fps(Seq(1L)), "doc_id", "fp", idx, bits = 56)
    val h = SnapshotTxn.begin(txd, Seq(tbl), indexes = Seq(idx))
    SnapshotTxn.stageAppend(h, Seq((2L, "b")).toDF("doc_id", "text"), tbl)
    HammingIndex.stageAppend(spark, fps(Seq(2L)), "doc_id", "fp", idx, h)
    SnapshotTxn.abort(h)
    assert(!Files.exists(IndexTxn.pendingDir(idx, h.txid)))
    assert(!Files.exists(IndexTxn.openTxnPath(idx)))
    assert(probeFor2(idx).isEmpty)
    assert(SnapshotTable.read(spark, tbl).count() == 1)
    // the same batch can be re-staged in a NEW transaction and commit
    val h2 = SnapshotTxn.begin(txd, Seq(tbl), indexes = Seq(idx))
    SnapshotTxn.stageAppend(h2, Seq((2L, "b")).toDF("doc_id", "text"), tbl)
    HammingIndex.stageAppend(spark, fps(Seq(2L)), "doc_id", "fp", idx, h2)
    SnapshotTxn.commit(h2)
    assert(probeFor2(idx) == Set(2L))
  }

  test("enrolled index refuses non-transactional writers; commit requires staging") {
    val idx = fresh("i4"); val txd = fresh("d4"); val tbl = fresh("t4")
    SnapshotTable.commitAppend(Seq((1L, "a")).toDF("doc_id", "text"), tbl)
    HammingIndex.write(fps(Seq(1L)), "doc_id", "fp", idx, bits = 56)
    val h = SnapshotTxn.begin(txd, Seq(tbl), indexes = Seq(idx))
    intercept[SnapshotTable.ConcurrentCommitException] {
      HammingIndex.append(spark, fps(Seq(9L)), "doc_id", "fp", idx)
    }
    intercept[SnapshotTable.ConcurrentCommitException] {
      HammingIndex.write(fps(Seq(9L)), "doc_id", "fp", idx, bits = 56)
    }
    // staging on an index NOT enrolled in this txn refuses
    val other = fresh("i4b")
    HammingIndex.write(fps(Seq(1L)), "doc_id", "fp", other, bits = 56)
    intercept[IllegalArgumentException] {
      HammingIndex.stageAppend(spark, fps(Seq(9L)), "doc_id", "fp", other, h)
    }
    // commit with an unstaged member refuses (publish-both presumes both)
    SnapshotTxn.stageAppend(h, Seq((2L, "b")).toDF("doc_id", "text"), tbl)
    intercept[SnapshotTxn.TxnStateException] { SnapshotTxn.commit(h) }
    SnapshotTxn.abort(h)
  }

  test("LshIndex enrollment: staged MinHash batch flips at the decision too") {
    import graft.operators.MinHashDedup
    import graft.functions.TextHash
    val cfg = MinHashDedup.Config(numHashes = 16, bands = 8, jaccardThreshold = 0.8)
    def shingles = graft.functions.VectorExpressions
      .wordShingleHashes(col("text"), 3, TextHash.P)
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val corpus = Seq((1L, base + " one")).toDF("doc_id", "text")
    val staged = Seq((2L, base + " two")).toDF("doc_id", "text")
    val probeDf = Seq((9L, base + " two")).toDF("doc_id", "text")

    val idx = fresh("lsh"); val txd = fresh("lshd"); val tbl = fresh("lsht")
    SnapshotTable.commitAppend(corpus, tbl)
    LshIndex.write(corpus, "doc_id", shingles, idx, cfg)
    val h = SnapshotTxn.begin(txd, Seq(tbl), indexes = Seq(idx))
    SnapshotTxn.stageAppend(h, staged, tbl)
    LshIndex.stageAppend(spark, staged, "doc_id", shingles, idx, h, cfg)
    intercept[SnapshotTable.ConcurrentCommitException] {
      LshIndex.append(spark, staged, "doc_id", shingles, idx, cfg)
    }
    def hits(): Set[Long] = {
      val r = LshIndex.probe(spark, probeDf, "doc_id", shingles, idx, cfg)
        .select(col("corpus_id")).collect().map(_.getLong(0)).toSet
      spark.catalog.clearCache()
      r
    }
    val pre = hits()
    assert(!pre.contains(2L), s"staged doc must be invisible pre-decision, got $pre")
    SnapshotTxn.commit(h)
    val post = hits()
    assert(post.contains(2L), s"committed staged doc must probe, got $post")
    // gate sees the committed pending: re-staging id 2 in a new txn refuses
    val h2 = SnapshotTxn.begin(txd, Seq(tbl), indexes = Seq(idx))
    val ex = intercept[IllegalArgumentException] {
      LshIndex.stageAppend(spark, staged, "doc_id", shingles, idx, h2, cfg)
    }
    assert(ex.getMessage.contains("duplicate"))
    SnapshotTxn.abort(h2)
  }

  test("rebuild clears committed pendings; append.lock and begin() exclude each other") {
    val idx = fresh("i6"); val txd = fresh("d6"); val tbl = fresh("t6")
    SnapshotTable.commitAppend(Seq((1L, "a")).toDF("doc_id", "text"), tbl)
    HammingIndex.write(fps(Seq(1L)), "doc_id", "fp", idx, bits = 56)
    val h = SnapshotTxn.begin(txd, Seq(tbl), indexes = Seq(idx))
    SnapshotTxn.stageAppend(h, Seq((2L, "b")).toDF("doc_id", "text"), tbl)
    HammingIndex.stageAppend(spark, fps(Seq(2L)), "doc_id", "fp", idx, h)
    SnapshotTxn.commit(h)
    assert(probeFor2(idx) == Set(2L))
    // REBUILD = new generation: the committed pending must not be unioned
    // into the new live view (stale docs / old geometry)
    HammingIndex.write(fps(Seq(1L)), "doc_id", "fp", idx, bits = 56)
    assert(!Files.exists(IndexTxn.pendingRoot(idx)),
      "rebuild must clear the previous generation's pendings")
    assert(probeFor2(idx).isEmpty)
    // and id 2 is re-admittable now
    HammingIndex.append(spark, fps(Seq(2L)), "doc_id", "fp", idx)
    assert(probeFor2(idx) == Set(2L))

    // append.lock held => begin(indexes=...) refuses (the acquire-side
    // half of the check-then-act closure; the append side re-checks
    // open.txn INSIDE its lock)
    Files.createFile(java.nio.file.Paths.get(s"$idx/append.lock"))
    intercept[SnapshotTable.ConcurrentCommitException] {
      SnapshotTxn.begin(txd, Seq(tbl), indexes = Seq(idx))
    }
    assert(!Files.exists(IndexTxn.openTxnPath(idx)),
      "failed acquire must release the index lock")
    Files.delete(java.nio.file.Paths.get(s"$idx/append.lock"))
  }

  test("a half-staged pending (no _staged marker) can neither commit nor serve") {
    val idx = fresh("i7"); val txd = fresh("d7"); val tbl = fresh("t7")
    SnapshotTable.commitAppend(Seq((1L, "a")).toDF("doc_id", "text"), tbl)
    HammingIndex.write(fps(Seq(1L)), "doc_id", "fp", idx, bits = 56)
    val h = SnapshotTxn.begin(txd, Seq(tbl), indexes = Seq(idx))
    SnapshotTxn.stageAppend(h, Seq((2L, "b")).toDF("doc_id", "text"), tbl)
    HammingIndex.stageAppend(spark, fps(Seq(2L)), "doc_id", "fp", idx, h)
    // simulate a crash between the chunk write and stage completion
    Files.delete(IndexTxn.pendingDir(idx, h.txid).resolve("_staged"))
    intercept[SnapshotTxn.TxnStateException] { SnapshotTxn.commit(h) }
    // even a decision written by a racing coordinator cannot make the
    // half-stage servable
    Files.writeString(SnapshotTxn.decisionPath(h.txnDir, h.txid), "commit\n")
    assert(probeFor2(idx).isEmpty,
      "half-staged pending must stay invisible to probes")
    Files.delete(SnapshotTxn.decisionPath(h.txnDir, h.txid))
    SnapshotTxn.abort(h)
  }

  test("forceAbortIndex repairs an index-only transaction whose writer died") {
    val idx = fresh("i8"); val txd = fresh("d8")
    HammingIndex.write(fps(Seq(1L)), "doc_id", "fp", idx, bits = 56)
    val h = SnapshotTxn.begin(txd, Seq.empty, indexes = Seq(idx))
    HammingIndex.stageAppend(spark, fps(Seq(2L)), "doc_id", "fp", idx, h)
    // writer "dies" here: no decision ever lands
    assert(IndexTxn.recover(idx) == "transaction in flight")
    assert(SnapshotTxn.forceAbortIndex(idx) == "aborted")
    assert(!Files.exists(IndexTxn.openTxnPath(idx)))
    assert(!Files.exists(IndexTxn.pendingDir(idx, h.txid)))
    assert(probeFor2(idx).isEmpty)
    // the index is writable again
    HammingIndex.append(spark, fps(Seq(2L)), "doc_id", "fp", idx)
    assert(probeFor2(idx) == Set(2L))
  }

  test("staged-id gate: a second txn cannot duplicate a committed pending's ids") {
    val idx = fresh("i5"); val txd = fresh("d5"); val tbl = fresh("t5")
    SnapshotTable.commitAppend(Seq((1L, "a")).toDF("doc_id", "text"), tbl)
    HammingIndex.write(fps(Seq(1L)), "doc_id", "fp", idx, bits = 56)
    val h = SnapshotTxn.begin(txd, Seq(tbl), indexes = Seq(idx))
    SnapshotTxn.stageAppend(h, Seq((2L, "b")).toDF("doc_id", "text"), tbl)
    HammingIndex.stageAppend(spark, fps(Seq(2L)), "doc_id", "fp", idx, h)
    SnapshotTxn.commit(h)
    // id 2 lives only in the committed pending subtree — the gate must
    // still see it (the live view includes committed pendings)
    val h2 = SnapshotTxn.begin(txd, Seq(tbl), indexes = Seq(idx))
    val ex = intercept[IllegalArgumentException] {
      HammingIndex.stageAppend(spark, fps(Seq(2L)), "doc_id", "fp", idx, h2)
    }
    assert(ex.getMessage.contains("duplicate"))
    SnapshotTxn.abort(h2)
  }
}
