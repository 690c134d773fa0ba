package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Continuous CDC consumption (`SnapshotTable.startChangeStream` /
  * `startScd2Stream`): a LIVE stream applies committed source versions to
  * the SCD2 history; effects are exactly-once through crash-before-ack
  * redelivery and restarts with a fresh checkpoint (offsets are the
  * table's own, not the stream's); the vacuumed-offset path fails loudly
  * by default and re-bootstraps under explicit autoResync. */
class CdcStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def histRows(hist: String): Set[(Long, String, Long, Long)] =
    SnapshotTable.read(spark, hist).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("v"),
        r.getAs[Long]("valid_from"), r.getAs[Long]("valid_to"))).toSet

  private def awaitUntil(timeoutMs: Long)(cond: => Boolean): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (!cond && System.nanoTime() < deadline) Thread.sleep(50)
    cond
  }

  test("live stream: committed source versions flow into SCD2 history continuously") {
    val src = tmpDir("cdc_src"); val hist = tmpDir("cdc_hist")
    SnapshotTable.commitAppend(Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1), src)
    val q = SnapshotTable.startScd2Stream(spark, src, hist, Seq("k"),
      consumerId = "live", checkpointDir = tmpDir("cdc_ckpt"), intervalMs = 100L)
    try {
      assert(awaitUntil(30000) {
        SnapshotTable.latestVersion(hist).isDefined &&
          histRows(hist).map(t => (t._1, t._2)) == Set((1L, "a"), (2L, "b"))
      }, "bootstrap window must land")
      // two more source commits while the stream is LIVE
      SnapshotTable.upsert(spark, src, Seq((2L, "B2"), (3L, "c")).toDF("k", "v"), Seq("k"))
      assert(awaitUntil(30000) {
        val open = histRows(hist).filter(_._4 == -1L)
        open.map(t => (t._1, t._2)) == Set((1L, "a"), (2L, "B2"), (3L, "c"))
      }, "the upsert window must land while live")
      SnapshotTable.deleteWhere(spark, src, col("k") === 1L)
      assert(awaitUntil(30000) {
        histRows(hist).filter(_._4 == -1L).map(_._1) == Set(2L, 3L)
      }, "the delete window must close key 1")
    } finally q.stop()
    // every polled boundary reconstructs its source version exactly
    val consumed = SnapshotTable.consumerOffset(src, "live").get._2
    for (v <- 1L to consumed)
      assert(
        SnapshotTable.scd2AsOf(spark, hist, v).select("k", "v").collect().map(r =>
          (r.getLong(0), r.getString(1))).toSet ==
          SnapshotTable.readVersion(spark, src, v).collect().map(r =>
            (r.getLong(0), r.getString(1))).toSet,
        s"asOf v$v diverged")
  }

  test("crash-before-ack redelivery + fresh-checkpoint restart: effects exactly once") {
    val src = tmpDir("cdc_src"); val hist = tmpDir("cdc_hist")
    SnapshotTable.commitAppend(Seq((1L, "a")).toDF("k", "v").coalesce(1), src)
    // crash simulation: apply the window but die before ack
    val b = SnapshotTable.pollChanges(spark, src, "c").get
    SnapshotTable.scd2Apply(spark, hist, b.df, Seq("k"), b.toVersion)
    // the restarted consumer loop redelivers the same window; scd2's
    // version marker absorbs it and the drain acks past it
    assert(SnapshotTable.drainChanges(spark, src, "c") { w =>
      SnapshotTable.scd2Apply(spark, hist, w.df, Seq("k"), w.toVersion); ()
    } == 1)
    assert(histRows(hist) == Set((1L, "a", 1L, -1L)), "no double-applied history rows")
    // restart with a FRESH checkpoint dir: offsets live in the table, so
    // a caught-up consumer drains zero windows — nothing replays
    assert(SnapshotTable.drainChanges(spark, src, "c") { _ => fail("must not redeliver") } == 0)
    // and one more commit drains exactly one window after the "restart"
    SnapshotTable.upsert(spark, src, Seq((1L, "A2")).toDF("k", "v"), Seq("k"))
    assert(SnapshotTable.drainChanges(spark, src, "c") { w =>
      SnapshotTable.scd2Apply(spark, hist, w.df, Seq("k"), w.toVersion); ()
    } == 1)
    assert(histRows(hist) == Set((1L, "a", 1L, 2L), (1L, "A2", 2L, -1L)))
  }

  test("vacuumed offset: loud failure by default; autoResync re-bootstraps") {
    val src = tmpDir("cdc_src"); val hist = tmpDir("cdc_hist")
    SnapshotTable.commitAppend(Seq((1L, "a")).toDF("k", "v").coalesce(1), src)
    assert(SnapshotTable.drainChanges(spark, src, "c") { w =>
      SnapshotTable.scd2Apply(spark, hist, w.df, Seq("k"), w.toVersion); ()
    } == 1)
    // the consumer lags while the table moves on and retention drops v1
    SnapshotTable.upsert(spark, src, Seq((1L, "A2"), (2L, "b")).toDF("k", "v"), Seq("k"))
    SnapshotTable.commitReplace(Seq((1L, "A3"), (2L, "b")).toDF("k", "v").coalesce(1), src)
    SnapshotTable.vacuum(src, keepVersions = 2)
    val e = intercept[IllegalStateException] {
      SnapshotTable.drainChanges(spark, src, "c") { _ => () }
    }
    assert(e.getMessage.contains("vacuumed"), e.getMessage)
    // explicit opt-in: reset + bootstrap redelivery; scd2 re-boundaries
    // at the resync version and the history still reconstructs the head
    assert(SnapshotTable.drainChanges(spark, src, "c", autoResync = true) { w =>
      SnapshotTable.scd2Apply(spark, hist, w.df, Seq("k"), w.toVersion); ()
    } == 1)
    val head = SnapshotTable.latestVersion(src).get
    assert(
      SnapshotTable.scd2AsOf(spark, hist, head).select("k", "v").collect().map(r =>
        (r.getLong(0), r.getString(1))).toSet == Set((1L, "A3"), (2L, "b")))
    // caught up after resync
    assert(SnapshotTable.pollChanges(spark, src, "c").isEmpty)
  }

  private def aggRows(dir: String): Set[(String, Long, Long)] =
    SnapshotTable.read(spark, dir).collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Long]("cnt"), r.getAs[Long]("sum_v")))
      .toSet

  private def recompute(src: String): Set[(String, Long, Long)] =
    SnapshotTable.read(spark, src).groupBy(col("g"))
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sum_v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("maintainAggregate: incremental rollup == full recompute across CDC windows") {
    val src = tmpDir("agg_src"); val dst = tmpDir("agg_dst")
    def sync(): Int = SnapshotTable.drainChanges(spark, src, "agg") { b =>
      SnapshotTable.maintainAggregate(spark, dst, b, Seq("g"), Seq("v"), "agg"); ()
    }
    SnapshotTable.commitAppend(
      Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L)).toDF("k", "g", "v").coalesce(1), src)
    assert(sync() == 1) // bootstrap: the full snapshot is the first delta
    assert(aggRows(dst) == recompute(src))
    assert(aggRows(dst) == Set(("a", 2L, 30L), ("b", 1L, 5L)))
    // update (delete+insert of one key) + new group, one composed window
    SnapshotTable.upsert(spark, src,
      Seq((2L, "a", 25L), (4L, "c", 7L)).toDF("k", "g", "v"), Seq("k"))
    SnapshotTable.commitAppend(Seq((5L, "b", 3L)).toDF("k", "g", "v").coalesce(1), src)
    assert(sync() == 1)
    assert(aggRows(dst) == recompute(src))
    assert(aggRows(dst) == Set(("a", 2L, 35L), ("b", 2L, 8L), ("c", 1L, 7L)))
    // group death: deleting the last 'c' row must DROP the group row
    SnapshotTable.deleteWhere(spark, src, col("g") === "c")
    assert(sync() == 1)
    assert(aggRows(dst) == recompute(src))
    assert(!aggRows(dst).exists(_._1 == "c"))
  }

  test("maintainAggregate: redelivered windows no-op via the aggsrc watermark") {
    val src = tmpDir("agg_src"); val dst = tmpDir("agg_dst")
    SnapshotTable.commitAppend(Seq((1L, "a", 10L)).toDF("k", "g", "v").coalesce(1), src)
    val b = SnapshotTable.pollChanges(spark, src, "agg").get
    assert(SnapshotTable.maintainAggregate(spark, dst, b, Seq("g"), Seq("v"), "agg").isDefined)
    // crash before ack: same window redelivered — the delta must NOT
    // double-apply (a plain delta replay would double every count)
    val again = SnapshotTable.pollChanges(spark, src, "agg").get
    assert(again.toVersion == b.toVersion)
    assert(SnapshotTable.maintainAggregate(spark, dst, again, Seq("g"), Seq("v"), "agg").isEmpty)
    assert(aggRows(dst) == Set(("a", 1L, 10L)))
    assert(again.ack())
    // the watermark survives further commits (carried-meta pattern)
    SnapshotTable.commitAppend(Seq((2L, "a", 1L)).toDF("k", "g", "v").coalesce(1), src)
    val b2 = SnapshotTable.pollChanges(spark, src, "agg").get
    SnapshotTable.maintainAggregate(spark, dst, b2, Seq("g"), Seq("v"), "agg")
    assert(SnapshotTable.lastAggSource(dst, "agg").contains(b2.toVersion))
    assert(aggRows(dst) == Set(("a", 2L, 11L)))
    // a FOREIGN commit to the rollup (compaction-style replace) must NOT
    // drop the watermark — else a redelivery double-applies
    SnapshotTable.commitReplace(SnapshotTable.read(spark, dst).coalesce(1), dst)
    assert(SnapshotTable.lastAggSource(dst, "agg").contains(b2.toVersion),
      "aggsrc watermark must carry through foreign commits")
    assert(SnapshotTable.maintainAggregate(spark, dst, b2, Seq("g"), Seq("v"), "agg").isEmpty)
    assert(aggRows(dst) == Set(("a", 2L, 11L)))
  }

  test("maintainAggregate: NULL measures count as 0; NULL group keys refused") {
    val src = tmpDir("agg_src"); val dst = tmpDir("agg_dst")
    SnapshotTable.commitAppend(
      Seq((1L, "a", Some(10L)), (2L, "a", None)).toDF("k", "g", "v").coalesce(1), src)
    def sync(): Unit = SnapshotTable.drainChanges(spark, src, "agg") { b =>
      SnapshotTable.maintainAggregate(spark, dst, b, Seq("g"), Seq("v"), "agg"); ()
    }
    sync()
    assert(aggRows(dst) == Set(("a", 2L, 10L)))
    // deleting the NULL-valued row must subtract 0, not poison the sum
    SnapshotTable.deleteWhere(spark, src, col("k") === 2L)
    sync()
    assert(aggRows(dst) == Set(("a", 1L, 10L)))
    // NULL group key: loud refusal (non-null-safe joins would duplicate)
    val srcN = tmpDir("agg_srcn"); val dstN = tmpDir("agg_dstn")
    SnapshotTable.commitAppend(
      Seq((1L, Option.empty[String], 5L)).toDF("k", "g", "v").coalesce(1), srcN)
    val b = SnapshotTable.pollChanges(spark, srcN, "agg").get
    intercept[IllegalArgumentException] {
      SnapshotTable.maintainAggregate(spark, dstN, b, Seq("g"), Seq("v"), "agg")
    }
  }

  test("startAggregateStream: live rollup tracks source commits, exactly-once") {
    val src = tmpDir("aggs_src"); val dst = tmpDir("aggs_dst")
    SnapshotTable.commitAppend(
      Seq((1L, "a", 10L), (2L, "b", 5L)).toDF("k", "g", "v").coalesce(1), src)
    val q = SnapshotTable.startAggregateStream(spark, src, dst, Seq("g"), Seq("v"),
      consumerId = "agglive", checkpointDir = tmpDir("aggs_ckpt"), intervalMs = 100L)
    try {
      assert(awaitUntil(30000) {
        SnapshotTable.latestVersion(dst).isDefined && aggRows(dst) == recompute(src)
      }, "bootstrap rollup must land")
      // live commits while the stream runs: update + insert + group death
      SnapshotTable.upsert(spark, src,
        Seq((2L, "b", 8L), (3L, "c", 7L)).toDF("k", "g", "v"), Seq("k"))
      SnapshotTable.deleteWhere(spark, src, col("g") === "a")
      assert(awaitUntil(30000) {
        aggRows(dst) == Set(("b", 1L, 8L), ("c", 1L, 7L))
      }, "live windows must fold in; dead groups must drop")
      assert(aggRows(dst) == recompute(src))
    } finally q.stop()
    // restart with a FRESH checkpoint: offsets are the table's own — a
    // caught-up consumer re-applies nothing (no double counts)
    SnapshotTable.commitAppend(Seq((4L, "c", 1L)).toDF("k", "g", "v").coalesce(1), src)
    val q2 = SnapshotTable.startAggregateStream(spark, src, dst, Seq("g"), Seq("v"),
      consumerId = "agglive", checkpointDir = tmpDir("aggs_ckpt2"), intervalMs = 100L)
    try assert(awaitUntil(30000) { aggRows(dst) == recompute(src) &&
      aggRows(dst) == Set(("b", 1L, 8L), ("c", 2L, 8L)) })
    finally q2.stop()
  }

  // ---- maintainJoin: incremental materialized join view -------------------

  private def viewRows(v: String): Set[(Long, Long, String, Long, String)] =
    SnapshotTable.read(spark, v).collect().map(r => (
      r.getAs[Long]("ck"), r.getAs[Long]("ok"), r.getAs[String]("av"),
      r.getAs[Long]("bid"), r.getAs[String]("bv"))).toSet

  private def flatJoin(a: String, b: String): Set[(Long, Long, String, Long, String)] =
    SnapshotTable.read(spark, a).join(SnapshotTable.read(spark, b), Seq("ck"))
      .collect().map(r => (
        r.getAs[Long]("ck"), r.getAs[Long]("ok"), r.getAs[String]("av"),
        r.getAs[Long]("bid"), r.getAs[String]("bv"))).toSet

  test("maintainJoin: one-sided CDC keeps the view == flat join (fan-out, update, delete)") {
    val a = tmpDir("mj_a"); val b = tmpDir("mj_b"); val v = tmpDir("mj_v")
    // B static: ck=10 has TWO rows (fan-out), ck=30 matches nothing yet
    SnapshotTable.commitAppend(Seq(
      (100L, 10L, "x"), (101L, 10L, "x2"), (102L, 20L, "y"))
      .toDF("bid", "ck", "bv").coalesce(1), b)
    SnapshotTable.commitAppend(Seq(
      (1L, 10L, "a1"), (2L, 20L, "a2"), (3L, 30L, "a3"))
      .toDF("ok", "ck", "av").coalesce(1), a)
    def sync(): Unit = SnapshotTable.drainChanges(spark, a, "ja") { w =>
      SnapshotTable.maintainJoin(spark, v, w, SnapshotTable.read(spark, b),
        Seq("ck"), Seq("ok"), "ja"); ()
    }
    sync()
    assert(viewRows(v) == flatJoin(a, b))
    assert(viewRows(v).count(_._2 == 1L) == 2, "ck=10 fan-out is 2 view rows")
    // update ok=1 to ck=20, delete ok=2, insert ok=4 (unmatched ck)
    SnapshotTable.upsert(spark, a, Seq((1L, 20L, "A1")).toDF("ok", "ck", "av"), Seq("ok"))
    SnapshotTable.deleteWhere(spark, a, col("ok") === 2L)
    SnapshotTable.commitAppend(Seq((4L, 99L, "a4")).toDF("ok", "ck", "av").coalesce(1), a)
    sync()
    assert(viewRows(v) == flatJoin(a, b))
    assert(!viewRows(v).exists(_._2 == 2L), "deleted source row left the view")
    assert(viewRows(v).exists(t => t._2 == 1L && t._3 == "A1" && t._1 == 20L))
  }

  test("maintainJoin: two-sided interleaved consumers converge to the joined heads") {
    val a = tmpDir("mj2_a"); val b = tmpDir("mj2_b"); val v = tmpDir("mj2_v")
    SnapshotTable.commitAppend(
      Seq((1L, 10L, "a1"), (2L, 20L, "a2")).toDF("ok", "ck", "av").coalesce(1), a)
    SnapshotTable.commitAppend(
      Seq((100L, 10L, "x"), (102L, 20L, "y")).toDF("bid", "ck", "bv").coalesce(1), b)
    def syncA(): Unit = SnapshotTable.drainChanges(spark, a, "ja") { w =>
      SnapshotTable.maintainJoin(spark, v, w, SnapshotTable.read(spark, b),
        Seq("ck"), Seq("ok"), "ja"); ()
    }
    def syncB(): Unit = SnapshotTable.drainChanges(spark, b, "jb") { w =>
      SnapshotTable.maintainJoin(spark, v, w, SnapshotTable.read(spark, a),
        Seq("ck"), Seq("bid"), "jb"); ()
    }
    // bootstrap both sides: the B-side replay re-replaces, never duplicates
    syncA(); syncB()
    assert(viewRows(v) == flatJoin(a, b))
    // interleaved changes on BOTH sides before either consumer runs:
    // B updates ck=10's payload AND gains a second ck=20 row; A's ck=20
    // row is updated and a new unmatched row appears
    SnapshotTable.upsert(spark, b,
      Seq((100L, 10L, "X!"), (103L, 20L, "y2")).toDF("bid", "ck", "bv"), Seq("bid"))
    SnapshotTable.upsert(spark, a,
      Seq((2L, 20L, "A2"), (5L, 77L, "a5")).toDF("ok", "ck", "av"), Seq("ok"))
    // apply in each order half-way: A first, then B
    syncA(); syncB()
    assert(viewRows(v) == flatJoin(a, b), "A-then-B drain must equal the head join")
    // now B first, then A
    SnapshotTable.deleteWhere(spark, b, col("bid") === 103L)
    SnapshotTable.upsert(spark, a, Seq((1L, 20L, "A1")).toDF("ok", "ck", "av"), Seq("ok"))
    syncB(); syncA()
    assert(viewRows(v) == flatJoin(a, b), "B-then-A drain must equal the head join")
  }

  test("startJoinStream: live view tracks source commits against current other-side") {
    val a = tmpDir("mjs_a"); val b = tmpDir("mjs_b"); val v = tmpDir("mjs_v")
    SnapshotTable.commitAppend(
      Seq((100L, 10L, "x"), (102L, 20L, "y")).toDF("bid", "ck", "bv").coalesce(1), b)
    SnapshotTable.commitAppend(
      Seq((1L, 10L, "a1")).toDF("ok", "ck", "av").coalesce(1), a)
    val q = SnapshotTable.startJoinStream(spark, a, v, b, Seq("ck"), Seq("ok"),
      consumerId = "jl", checkpointDir = tmpDir("mjs_ckpt"), intervalMs = 100L)
    try {
      assert(awaitUntil(30000) {
        SnapshotTable.latestVersion(v).isDefined && viewRows(v) == flatJoin(a, b)
      }, "bootstrap view must land")
      // other side moves, THEN a source commit: the batch joins b's head
      SnapshotTable.upsert(spark, b, Seq((100L, 10L, "X2")).toDF("bid", "ck", "bv"), Seq("bid"))
      SnapshotTable.commitAppend(Seq((2L, 20L, "a2")).toDF("ok", "ck", "av").coalesce(1), a)
      SnapshotTable.deleteWhere(spark, a, col("ok") === 1L)
      assert(awaitUntil(30000) { viewRows(v) == flatJoin(a, b) },
        "live windows must fold in against the current other side")
      assert(viewRows(v) == Set((20L, 2L, "a2", 102L, "y")))
    } finally q.stop()
  }

  test("maintainJoin refuses NULL row keys loudly (keyed replacement contract)") {
    val a = tmpDir("mj4_a"); val b = tmpDir("mj4_b"); val v = tmpDir("mj4_v")
    SnapshotTable.commitAppend(
      Seq((100L, 10L, "x")).toDF("bid", "ck", "bv").coalesce(1), b)
    SnapshotTable.commitAppend(
      Seq((Some(1L), 10L, "a1"), (Option.empty[Long], 10L, "a2"))
        .toDF("ok", "ck", "av").coalesce(1), a)
    val w = SnapshotTable.pollChanges(spark, a, "ja").get
    intercept[IllegalArgumentException] {
      SnapshotTable.maintainJoin(spark, v, w, SnapshotTable.read(spark, b),
        Seq("ck"), Seq("ok"), "ja")
    }
  }

  test("maintainJoin: redelivered windows no-op via the watermark") {
    val a = tmpDir("mj3_a"); val b = tmpDir("mj3_b"); val v = tmpDir("mj3_v")
    SnapshotTable.commitAppend(
      Seq((100L, 10L, "x")).toDF("bid", "ck", "bv").coalesce(1), b)
    SnapshotTable.commitAppend(
      Seq((1L, 10L, "a1")).toDF("ok", "ck", "av").coalesce(1), a)
    val w = SnapshotTable.pollChanges(spark, a, "ja").get
    val other = SnapshotTable.read(spark, b)
    assert(SnapshotTable.maintainJoin(spark, v, w, other,
      Seq("ck"), Seq("ok"), "ja").isDefined)
    // crash before ack: the same window redelivers — must not double-apply
    val again = SnapshotTable.pollChanges(spark, a, "ja").get
    assert(SnapshotTable.maintainJoin(spark, v, again, other,
      Seq("ck"), Seq("ok"), "ja").isEmpty)
    assert(viewRows(v).size == 1)
    assert(again.ack())
  }

  test("maintainAggregate rejects an inconsistent feed (negative count)") {
    val src = tmpDir("agg_src"); val dst = tmpDir("agg_dst")
    SnapshotTable.commitAppend(Seq((1L, "a", 10L)).toDF("k", "g", "v").coalesce(1), src)
    val b = SnapshotTable.pollChanges(spark, src, "agg").get
    SnapshotTable.maintainAggregate(spark, dst, b, Seq("g"), Seq("v"), "agg")
    assert(b.ack())
    // hand-craft a bogus window: two deletes of a group with one member
    val bogus = SnapshotTable.ChangeBatch(src, "agg", Some(b.toVersion), b.toVersion + 1,
      Seq((1L, "a", 10L, "delete"), (7L, "a", 11L, "delete"))
        .toDF("k", "g", "v", "_change"), 99L)
    intercept[IllegalArgumentException] {
      SnapshotTable.maintainAggregate(spark, dst, bogus, Seq("g"), Seq("v"), "agg")
    }
  }
}
