package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import StreamingDebounce.{Burst, Ev}

class StreamingDebounceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(u: Long, typ: String, id: Long, t: Long) =
    Ev(u, typ, id, t, new Timestamp(t / 1000L))

  /** Reference bursts: q132's batch island semantics in plain Scala. */
  private def batchBursts(events: Seq[Ev], gapUs: Long): Set[Burst] =
    events.groupBy(e => (e.userId, e.eventType)).flatMap { case ((u, t), es) =>
      StreamingDebounce.islands(
        es.map(e => (e.tsUs, e.eventId)).distinct.sorted, gapUs)
        .map(b => Burst(u, t, b.head._1, b.last._1, b.length))
    }.toSet

  test("batch mode finalizes every island, equal to the pure reference") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 4) {
      val events = (1 to 80).map(i =>
        ev(rnd.nextInt(3).toLong, s"t${rnd.nextInt(2)}", i.toLong,
          rnd.nextInt(500).toLong * 1000000L))
      val got = StreamingDebounce.bursts(spark.createDataset(events), gapUs = 20000000L)
        .collect().toSet
      assert(got == batchBursts(events, 20000000L), s"trial $trial")
    }
  }

  test("streamed bursts are final, exactly-once, and equal to the closed batch islands under any slicing") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(23)
    val gapUs = 10000000L // 10 s
    for (trial <- 1 to 3) {
      // event-time mostly advances; bounded disorder well inside the watermark
      var t = 0L
      val events = (1 to 60).map { i =>
        t += rnd.nextInt(8000000).toLong // 0-8 s forward steps
        ev(rnd.nextInt(2).toLong, "beacon", i.toLong,
          math.max(0L, t - rnd.nextInt(2000000))) // ≤2 s jitter back
      }
      val mem = MemoryStream[Ev]
      val name = s"debounce_$trial"
      val q = StreamingDebounce.bursts(mem.toDS(), gapUs, watermark = "5 seconds")
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try {
        events.grouped(1 + rnd.nextInt(9)).foreach { chunk =>
          mem.addData(chunk: _*); q.processAllAvailable()
        }
        // the watermark advances at batch END and a key only re-enters the
        // operator WITH data — so flush with two far-future tick rounds per
        // key: round 1 advances the watermark past every real burst, round
        // 2 re-invokes each key so it emits what closed
        val maxReal = events.map(_.tsUs).max
        for ((tickTs, idBase) <- Seq((maxReal + 1000000000L, 9000L),
                                     (maxReal + 2000000000L, 9100L))) {
          mem.addData((0 until 2).map(u =>
            ev(u.toLong, "beacon", idBase + u, tickTs)): _*)
          q.processAllAvailable()
        }
        val emitted = spark.table(name).as[Burst].collect().toSeq
        // exactly-once: no burst emitted twice across micro-batches
        assert(emitted.distinct.size == emitted.size, s"trial $trial dupes")
        // after the flush, the emitted REAL bursts (tick islands excluded)
        // are exactly the batch islands — finality + completeness
        val all = batchBursts(events, gapUs)
        val emittedReal = emitted.filter(_.startUs <= maxReal).toSet
        assert(emittedReal == all, s"trial $trial emitted != batch islands")
      } finally q.stop()
    }
  }

  test("duplicate deliveries collapse; a below-watermark straggler cannot rewrite an emitted burst") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val gapUs = 5000000L // 5 s
    val q = StreamingDebounce.bursts(mem.toDS(), gapUs, watermark = "2 seconds")
      .writeStream.outputMode("append").format("memory").queryName("debounce_late").start()
    try {
      val a = ev(1L, "x", 1L, 1000000L); val b = ev(1L, "x", 2L, 3000000L)
      mem.addData(a, b, a) // duplicate delivery of `a` in the same batch
      q.processAllAvailable()
      mem.addData(a) // duplicate delivery across batches
      q.processAllAvailable()
      // advance the watermark far past the burst; it closes with len 2
      mem.addData(ev(1L, "x", 9L, 60000000L))
      q.processAllAvailable()
      // straggler INSIDE the closed burst's span arrives below watermark
      mem.addData(ev(1L, "x", 5L, 2000000L))
      q.processAllAvailable()
      val got = spark.table("debounce_late").as[Burst].collect().toSeq
      assert(got == Seq(Burst(1L, "x", 1000000L, 3000000L, 2)))
    } finally q.stop()
  }
}
