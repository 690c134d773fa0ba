package graft.operators

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import StreamingAsOf.{DimUpdate, Enriched, Fact}

class StreamingAsOfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def us(min: Long): Long = min * 60L * 1000000L

  private val dimRows = Seq(
    DimUpdate(1L, us(0), 10.0), DimUpdate(1L, us(30), 11.0), DimUpdate(1L, us(60), 12.0),
    DimUpdate(2L, us(45), 20.0))
  private val factRows = Seq(
    Fact(1L, us(10), 0.1), Fact(1L, us(30), 0.2), // equal-ts: inclusive
    Fact(1L, us(59), 0.3), Fact(1L, us(90), 0.4),
    Fact(2L, us(10), 0.5), // before any dim version -> null
    Fact(2L, us(50), 0.6))

  private val expected = Set(
    Enriched(1L, us(10), 0.1, Some(us(0)), Some(10.0)),
    Enriched(1L, us(30), 0.2, Some(us(30)), Some(11.0)),
    Enriched(1L, us(59), 0.3, Some(us(30)), Some(11.0)),
    Enriched(1L, us(90), 0.4, Some(us(60)), Some(12.0)),
    Enriched(2L, us(10), 0.5, None, None),
    Enriched(2L, us(50), 0.6, Some(us(45)), Some(20.0)))

  test("batch mode: exact as-of semantics, parity with AsOfJoin.latestPrior") {
    val out = StreamingAsOf.enrich(factRows.toDS(), dimRows.toDS()).collect().toSet
    assert(out == expected)

    val viaWindow = AsOfJoin.latestPrior(
        factRows.toDF(), dimRows.toDF(), "key", "tsMicros", "value")
      .select(col("key"), col("tsMicros"), col("payload"), col("asof_ts"), col("asof_value"))
      .collect()
      .map(r => Enriched(r.getLong(0), r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .toSet
    assert(out == viaWindow)
  }

  test("streaming: dim versions persist in state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val dimMem = MemoryStream[DimUpdate]
    val factMem = MemoryStream[Fact]
    val q = StreamingAsOf.enrich(factMem.toDS(), dimMem.toDS(), watermark = "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("asof_out").start()
    try {
      // batch 1: only dim versions
      dimMem.addData(dimRows.filter(_.key == 1L): _*)
      q.processAllAvailable()
      // batch 2: facts enrich from state written in batch 1
      factMem.addData(Fact(1L, us(10), 0.1), Fact(1L, us(90), 0.4))
      q.processAllAvailable()
      val out = spark.table("asof_out").as[Enriched].collect().toSet
      assert(out == Set(
        Enriched(1L, us(10), 0.1, Some(us(0)), Some(10.0)),
        Enriched(1L, us(90), 0.4, Some(us(60)), Some(12.0))))
    } finally q.stop()
  }

  test("streaming: watermark evicts all but the floor version") {
    implicit val sqlCtx = spark.sqlContext
    val dimMem = MemoryStream[DimUpdate]
    val factMem = MemoryStream[Fact]
    val q = StreamingAsOf.enrich(factMem.toDS(), dimMem.toDS(), watermark = "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("asof_evict").start()
    try {
      // versions at 0 and 30 min; then advance the watermark far past both
      dimMem.addData(DimUpdate(1L, us(0), 10.0), DimUpdate(1L, us(30), 11.0))
      q.processAllAvailable()
      factMem.addData(Fact(99L, us(1000), 0.0)) // watermark pusher
      q.processAllAvailable()
      q.processAllAvailable() // extra batch so the new watermark reaches the state op
      // a fact above the watermark must still find the surviving floor
      // version (ts=30) even though both versions predate the watermark
      factMem.addData(Fact(1L, us(995), 0.7))
      q.processAllAvailable()
      val out = spark.table("asof_evict").as[Enriched]
        .filter(col("key") === 1L).collect().toSet
      assert(out == Set(Enriched(1L, us(995), 0.7, Some(us(30)), Some(11.0))))
    } finally q.stop()
  }
}
