package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import StreamingTransitions.{Ev, Transition}

class StreamingTransitionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(u: Long, id: Long, t: Long, tpe: String) =
    Ev(u, id, t, tpe, new Timestamp(t / 1000L))

  /** Reference: the q72/q293 batch lag extraction in plain Scala. */
  private def batchTransitions(events: Seq[Ev]): Seq[Transition] =
    events.groupBy(_.userId).toSeq.flatMap { case (u, es) =>
      val ordered = es.map(e => (e.tsUs, e.eventId, e.eventType)).distinct
        .sortBy(t => (t._1, t._2))
      ordered.zip(("START", 0L, "START") +: ordered.map(t => (t._3, 0L, "")))
        .map { case ((us, _, tpe), (prev, _, _)) => Transition(u, prev, tpe, us) }
    }

  test("batch mode equals the lag-window reference (START included)") {
    val rnd = new scala.util.Random(5)
    val types = Seq("click", "view", "purchase")
    val events = (1 to 60).map(i => ev(rnd.nextInt(3).toLong, i.toLong,
      rnd.nextInt(1000).toLong * 1000000L, types(rnd.nextInt(3))))
    val got = StreamingTransitions.transitions(spark.createDataset(events))
      .collect().toSet
    assert(got == batchTransitions(events).toSet)
  }

  test("streamed transitions equal the batch extraction under random slicing and disorder") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(17)
    val types = Seq("a", "b", "c")
    for (trial <- 1 to 3) {
      var t = 0L
      val events = (1 to 50).map { i =>
        t += rnd.nextInt(5000000).toLong
        ev(rnd.nextInt(2).toLong, i.toLong,
          math.max(0L, t - rnd.nextInt(2000000)), types(rnd.nextInt(3)))
      }
      val mem = MemoryStream[Ev]
      val name = s"trans_$trial"
      val q = StreamingTransitions.transitions(mem.toDS(), watermark = "4 seconds")
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try {
        // shuffle WITHIN each chunk: the operator must restore the order
        events.grouped(1 + rnd.nextInt(7)).foreach { chunk =>
          mem.addData(rnd.shuffle(chunk): _*); q.processAllAvailable()
        }
        val maxReal = events.map(_.tsUs).max
        for ((tickTs, idBase) <- Seq((maxReal + 1000000000L, 9000L),
                                     (maxReal + 2000000000L, 9100L))) {
          mem.addData((0 until 2).map(u =>
            ev(u.toLong, idBase + u, tickTs, "tick")): _*)
          q.processAllAvailable()
        }
        val emitted = spark.table(name).as[Transition].collect().toSeq
          .filter(_.tsUs <= maxReal) // tick rows excluded
        assert(emitted.distinct.size == emitted.size, s"trial $trial dupes")
        assert(emitted.toSet == batchTransitions(events).toSet,
          s"trial $trial stream != batch")
      } finally q.stop()
    }
  }

  test("a sub-watermark straggler cannot splice itself between emitted transitions") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingTransitions.transitions(mem.toDS(), watermark = "2 seconds")
      .writeStream.outputMode("append").format("memory").queryName("trans_late").start()
    try {
      mem.addData(ev(1L, 1L, 1000000L, "a"), ev(1L, 2L, 3000000L, "b"))
      q.processAllAvailable()
      mem.addData(ev(1L, 9L, 60000000L, "z")) // advance watermark, seal a->b
      q.processAllAvailable()
      mem.addData(ev(1L, 5L, 2000000L, "x")) // would splice between a and b
      q.processAllAvailable()
      mem.addData(ev(1L, 10L, 120000000L, "z2"))
      mem.addData(ev(1L, 11L, 180000000L, "z3"))
      q.processAllAvailable()
      val got = spark.table("trans_late").as[Transition].collect()
        .filter(t => t.tsUs <= 3000000L || t.fromType == "x").toSeq
      assert(got.toSet == Set(
        Transition(1L, "START", "a", 1000000L),
        Transition(1L, "a", "b", 3000000L)),
        s"late row must be dropped, not spliced: $got")
    } finally q.stop()
  }
}
