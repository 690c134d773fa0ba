package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import StreamingFunnel.{Ev, Funnel}

class StreamingFunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(u: Long, t: Long, typ: String) =
    Ev(u, t, typ, new Timestamp(t / 1000L))

  /** Reference funnel: the q64 batch semantics, computed in plain Scala. */
  private def batchFunnel(events: Seq[Ev]): Map[Long, Funnel] =
    events.groupBy(_.userId).flatMap { case (u, es) =>
      val view = es.filter(_.eventType == "view").map(_.tsMicros).minOption
      view.map { v =>
        val click = es.filter(e => e.eventType == "click" && e.tsMicros > v)
          .map(_.tsMicros).minOption
        val purchase = click.flatMap(c =>
          es.filter(e => e.eventType == "purchase" && e.tsMicros > c)
            .map(_.tsMicros).minOption)
        u -> Funnel(u, Some(v), click, purchase,
          1 + click.size + purchase.size)
      }
    }

  test("batch mode matches the q64 batch semantics on real sf0.001 events") {
    val raw = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts")).as("us"),
        org.apache.spark.sql.functions.col("event_type"))
      .collect().map(r => ev(r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val got = StreamingFunnel.track(spark.createDataset(raw))
      .collect().map(f => f.userId -> f).toMap
    assert(got == batchFunnel(raw))
  }

  test("a late view repairs the click and purchase choices across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingFunnel.track(mem.toDS(), watermark = "10 hours")
      .writeStream.outputMode("append").format("memory").queryName("funnel_repair").start()
    try {
      // click@50 precedes the only known view@100 -> ineligible; click@150 wins
      mem.addData(ev(1L, 100L, "view"), ev(1L, 50L, "click"),
        ev(1L, 150L, "click"), ev(1L, 60L, "purchase"))
      q.processAllAvailable()
      // late view@40 makes click@50 eligible, and then purchase@60 follows it
      mem.addData(ev(1L, 40L, "view"))
      q.processAllAvailable()
      val rows = spark.table("funnel_repair").as[Funnel].collect()
      assert(rows.head == Funnel(1L, Some(100L), Some(150L), None, 2))
      assert(rows.last == Funnel(1L, Some(40L), Some(50L), Some(60L), 3))
    } finally q.stop()
  }

  test("randomized out-of-order delivery converges to the batch funnel") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(7)
    val types = Seq("view", "click", "purchase", "error")
    for (trial <- 1 to 5) {
      val events = (1 to 60).map { _ =>
        ev(rnd.nextInt(3).toLong + 1, rnd.nextInt(1000).toLong + 1, types(rnd.nextInt(4)))
      }
      val shuffled = rnd.shuffle(events)
      val mem = MemoryStream[Ev]
      val name = s"funnel_rand_$trial"
      // generous watermark: nothing is ever outside the lateness horizon,
      // so ANY arrival order must converge to the batch answer
      val q = StreamingFunnel.track(mem.toDS(), watermark = "100 hours")
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try {
        shuffled.grouped(7).foreach { chunk => mem.addData(chunk: _*); q.processAllAvailable() }
        val last = spark.table(name).as[Funnel].collect()
          .zipWithIndex.groupBy(_._1.userId)
          .map { case (u, rows) => u -> rows.maxBy(_._2)._1 }
        assert(last == batchFunnel(events), s"trial $trial")
      } finally q.stop()
    }
  }

  test("watermark passage collapses candidate state without changing the answer") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingFunnel.track(mem.toDS(), watermark = "1 minute")
      .writeStream.outputMode("append").format("memory").queryName("funnel_wm").start()
    try {
      val base = 1000L * 1000000L
      mem.addData(ev(1L, base, "view"), ev(1L, base + 10L, "click"),
        ev(1L, base + 20L, "purchase"))
      q.processAllAvailable()
      // push the watermark far past the funnel; state collapses to finals
      mem.addData(ev(9L, base + 3600L * 1000000L, "view"))
      q.processAllAvailable()
      q.processAllAvailable()
      // a too-late click cannot regress the funnel (it is below the watermark)
      mem.addData(ev(1L, base + 5L, "click"))
      q.processAllAvailable()
      val rows = spark.table("funnel_wm").as[Funnel].collect()
        .filter(_.userId == 1L)
      assert(rows.last == Funnel(1L, Some(base), Some(base + 10L), Some(base + 20L), 3))
    } finally q.stop()
  }
}
