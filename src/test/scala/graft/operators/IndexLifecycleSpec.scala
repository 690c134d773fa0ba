package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Drift-triggered rebuild lifecycle: generation-pointer atomicity, the
  * old-or-new-never-mixed isolation proof under a LIVE concurrent prober,
  * exactly-once appends across generations, and the wired
  * verdict→refit→swap streaming loop. */
class IndexLifecycleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  private lazy val e = Tables.embeddings(spark, dir)

  private def probeSet(idxDir: String, qs: org.apache.spark.sql.DataFrame)
    : Set[(Long, Long, Int)] =
    KMeansIVF.indexTopK(qs, idxDir, "vec_id", "embedding", k = 3, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("rebuild refit == fresh fit over the union corpus (probe equality)") {
    val root = java.nio.file.Files.createTempDirectory("ilc_rb").toString
    IndexLifecycle.init(e.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", root, sampleCap = 100)
    IndexLifecycle.append(e.filter(col("vec_id") % 2 =!= 0),
      "vec_id", "embedding", root, "b1")
    val newGen = IndexLifecycle.rebuild(spark, root, sampleCap = 100)
    assert(IndexLifecycle.resolve(root) == newGen)
    // reference: a from-scratch writeIndex over the full corpus — the
    // refit must be the SAME deterministic fit (md5 sample, same params)
    val ref = java.nio.file.Files.createTempDirectory("ilc_ref").toString
    KMeansIVF.writeIndex(e, "vec_id", "embedding", ref, sampleCap = 100)
    val qs = e.filter(col("vec_id") < 12)
    assert(probeSet(IndexLifecycle.resolve(root), qs) == probeSet(ref, qs))
  }

  test("concurrent prober sees old-or-new state, never mixed") {
    val root = java.nio.file.Files.createTempDirectory("ilc_iso").toString
    IndexLifecycle.init(e.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", root, sampleCap = 100)
    IndexLifecycle.append(e.filter(col("vec_id") % 2 =!= 0),
      "vec_id", "embedding", root, "b1")
    val qs = e.filter(col("vec_id") < 12)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    qs.count()
    val oldSet = probeSet(IndexLifecycle.resolve(root), qs)

    val seen = mutable.ArrayBuffer.empty[Set[(Long, Long, Int)]]
    @volatile var stop = false
    @volatile var err: Throwable = null
    val prober = new Thread(() => {
      try while (!stop) seen.synchronized {
        // resolve ONCE per probe, as the contract demands
        seen += probeSet(IndexLifecycle.resolve(root), qs)
      } catch { case t: Throwable => err = t }
    })
    prober.start()
    val newGen = IndexLifecycle.rebuild(spark, root, sampleCap = 100)
    // a few probes strictly after the swap
    Thread.sleep(100)
    stop = true
    prober.join(60000)
    assert(err == null, s"prober crashed: $err")
    val newSet = probeSet(newGen, qs)
    assert(seen.nonEmpty)
    val distinct = seen.toSet
    assert(distinct.subsetOf(Set(oldSet, newSet)),
      s"a probe observed a state that is neither the old nor the new " +
        s"generation (old==new: ${oldSet == newSet}, states seen: ${distinct.size})")
    // a probe STARTED strictly after the swap serves the new generation
    // (concurrent probes may legitimately finish on the old one)
    assert(probeSet(IndexLifecycle.resolve(root), qs) == newSet,
      "post-swap probes must serve the new generation")
    qs.unpersist()
  }

  test("appends are exactly-once ACROSS generations (replay after rebuild no-ops)") {
    val root = java.nio.file.Files.createTempDirectory("ilc_eo").toString
    IndexLifecycle.init(e.filter(col("vec_id") % 4 === 0),
      "vec_id", "embedding", root, sampleCap = 100)
    val b1 = e.filter(col("vec_id") % 4 === 1)
    val v1 = IndexLifecycle.append(b1, "vec_id", "embedding", root, "b1")
    IndexLifecycle.rebuild(spark, root, sampleCap = 100)
    // the replayed batch's rows were absorbed by the refit — a re-append
    // into the NEW generation would duplicate them; the applied/ record
    // must make the replay return the ORIGINAL verdict and write nothing
    val replay = IndexLifecycle.append(b1, "vec_id", "embedding", root, "b1")
    assert(replay == v1, "replay must return the persisted verdict verbatim")
    val gen = IndexLifecycle.resolve(root)
    assert(!new java.io.File(s"$gen/appends/b1").exists(),
      "a replayed batch must not land in the new generation")
    // total row count served == base + batch, exactly once
    val served = spark.read.parquet(s"$gen/data").count()
    assert(served == e.filter(col("vec_id") % 4 === 0).count() +
      b1.count())
  }

  test("crash window reconciliation: generation _done without applied marker") {
    val root = java.nio.file.Files.createTempDirectory("ilc_cw").toString
    IndexLifecycle.init(e.filter(col("vec_id") % 4 === 0),
      "vec_id", "embedding", root, sampleCap = 100)
    val b1 = e.filter(col("vec_id") % 4 === 1)
    IndexLifecycle.append(b1, "vec_id", "embedding", root, "b1")
    // simulate the crash between the generation commit and the root
    // marker: delete the applied record, leaving only the gen-tree _done
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$root/applied/b1"))
    IndexLifecycle.rebuild(spark, root, sampleCap = 100)
    // rebuild reconciled: the replay must no-op, not double-append
    IndexLifecycle.append(b1, "vec_id", "embedding", root, "b1")
    val gen = IndexLifecycle.resolve(root)
    assert(!new java.io.File(s"$gen/appends/b1").exists())
    assert(spark.read.parquet(s"$gen/data").count() ==
      e.filter(col("vec_id") % 4 === 0).count() + b1.count())
  }

  test("vacuum removes retired generations only; lock exclusion is loud") {
    val root = java.nio.file.Files.createTempDirectory("ilc_vac").toString
    IndexLifecycle.init(e.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", root, sampleCap = 100)
    IndexLifecycle.rebuild(spark, root, sampleCap = 100)
    val removed = IndexLifecycle.vacuum(root)
    assert(removed == Seq("gen-00000001"))
    assert(new java.io.File(s"$root/gen-00000002").isDirectory)
    val qs = e.filter(col("vec_id") < 8)
    assert(probeSet(IndexLifecycle.resolve(root), qs).nonEmpty)
    // a held rebuild.lock refuses appends loudly (fail-fast default)
    java.nio.file.Files.createFile(java.nio.file.Paths.get(s"$root/rebuild.lock"))
    val ex = intercept[IllegalStateException] {
      IndexLifecycle.append(e.limit(1), "vec_id", "embedding", root, "bX")
    }
    assert(ex.getMessage.contains("rebuild.lock"))
    // the STREAMING mode waits: a lock released within the window must
    // not kill the caller (maintenance stalls ingest, never terminates it)
    val releaser = new Thread(() => {
      Thread.sleep(600)
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(s"$root/rebuild.lock"))
      ()
    })
    releaser.start()
    val v = IndexLifecycle.append(
      e.filter(col("vec_id") === 1L), "vec_id", "embedding", root, "bWait",
      lockWaitMs = 15000L)
    releaser.join()
    assert(v.nBatch == 1L)
    // applied-record retention: markers older than the horizon are swept
    // (safe only past the replay window — the documented contract)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$root/applied/bWait")))
    IndexLifecycle.vacuum(root, appliedOlderThanMs = Some(0L))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$root/applied/bWait")))
  }

  test("wired streaming loop: drifted batch triggers refit; stream resumes on new base") {
    // planted drift: base vectors live in dims 0-1, the drifted batch in
    // dims 2-3 — its assigned cosines collapse and the gate fires (the
    // r11 calibration argument: only synthetic separation is detectable)
    def onehot(ids: Range, d0: Int, d1: Int) = ids.map { i =>
      val v = Array.fill(4)(0.1)
      v(if (i % 2 == 0) d0 else d1) = 10.0
      (i.toLong, v.toSeq)
    }
    val base = onehot(0 until 40, 0, 1).toDF("vec_id", "embedding")
    val drifted = onehot(100 until 140, 2, 3)
    val iid = onehot(200 until 240, 0, 1)

    val root = java.nio.file.Files.createTempDirectory("ilc_stream").toString
    IndexLifecycle.init(base, "vec_id", "embedding", root,
      nClusters = 4, iters = 2, sampleCap = 40)
    val gen1 = IndexLifecycle.resolve(root)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Double])]
    val verdicts = mutable.ArrayBuffer.empty[(KMeansIVF.AppendResult, Long)]
    val ck = java.nio.file.Files.createTempDirectory("ilc_stream_ck").toString
    val q = IndexLifecycle.startAppendStream(
      mem.toDF().toDF("vec_id", "embedding"), root, "vec_id", "embedding", ck,
      (v, bid) => verdicts.synchronized { verdicts += ((v, bid)) },
      autoRebuild = true, nClusters = 4, iters = 2, sampleCap = 200)
    try {
      mem.addData(drifted: _*); q.processAllAvailable()
      val gen2 = IndexLifecycle.resolve(root)
      assert(verdicts.head._1.rebuild, "planted subspace shift must fire the gate")
      assert(gen2 != gen1, "the wired loop must refit + swap inside the batch")
      // the next batch appends against the NEW base — and its iid rows
      // (now part of the refitted distribution) pass the gate
      mem.addData(iid: _*); q.processAllAvailable()
      assert(IndexLifecycle.resolve(root) == gen2,
        "a clean batch must not trigger another rebuild")
      assert(new java.io.File(s"$gen2/appends/s1").isDirectory,
        "the stream must resume appending against the new generation")
      assert(!verdicts(1)._1.rebuild,
        s"iid batch against the refitted base must pass, got ${verdicts(1)._1}")
    } finally q.stop()
    // exactly-once: the replayed first batch returns its persisted verdict
    val replay = IndexLifecycle.append(
      drifted.toDF("vec_id", "embedding"), "vec_id", "embedding", root, "s0")
    assert(replay == verdicts.head._1)
  }
}
