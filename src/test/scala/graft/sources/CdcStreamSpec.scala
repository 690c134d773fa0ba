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
}
