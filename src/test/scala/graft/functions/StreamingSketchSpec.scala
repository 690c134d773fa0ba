package graft.functions

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Custom TypedImperativeAggregates must serialize/merge correctly through
  * Structured Streaming's state store, not just batch shuffles — the
  * streaming path exercises serialize() on every micro-batch boundary. */
class StreamingSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("count-min sketch accumulates across micro-batches identically to batch") {
    implicit val sqlCtx = spark.sqlContext
    val tokens = (1 to 300).map(i => s"tok-${i % 37}")
    val mem = MemoryStream[String]
    val q = mem.toDS().select(TextHash.baseHash(col("value")).as("hp"))
      .agg(CountMinAggregate.countMin(col("hp"), 4, 256).as("cms"))
      .writeStream.outputMode("complete").format("memory").queryName("cms_stream").start()
    try {
      tokens.grouped(70).foreach { chunk => mem.addData(chunk: _*); q.processAllAvailable() }
      val streamed = spark.table("cms_stream").head().getSeq[Long](0)
      val batch = tokens.toDF("value")
        .select(TextHash.baseHash(col("value")).as("hp"))
        .agg(CountMinAggregate.countMin(col("hp"), 4, 256).as("cms"))
        .head().getSeq[Long](0)
      assert(streamed == batch)
      assert(streamed.sum == 300L * 4) // every row increments one cell per role
    } finally q.stop()
  }

  test("bloom filter accumulates across micro-batches identically to batch") {
    implicit val sqlCtx = spark.sqlContext
    val keys = (1 to 200).map(i => s"k-$i")
    val mem = MemoryStream[String]
    val q = mem.toDS().select(TextHash.baseHash(col("value")).as("hp"))
      .agg(BloomFilterAggregate.bloom(col("hp"), 1 << 12, 4).as("bf"))
      .writeStream.outputMode("complete").format("memory").queryName("bloom_stream").start()
    try {
      keys.grouped(60).foreach { chunk => mem.addData(chunk: _*); q.processAllAvailable() }
      val streamed = spark.table("bloom_stream").head().getSeq[Long](0)
      val batch = keys.toDF("value")
        .select(TextHash.baseHash(col("value")).as("hp"))
        .agg(BloomFilterAggregate.bloom(col("hp"), 1 << 12, 4).as("bf"))
        .head().getSeq[Long](0)
      assert(streamed == batch)
    } finally q.stop()
  }

  test("bitmap accumulates across micro-batches identically to batch") {
    implicit val sqlCtx = spark.sqlContext
    val keys = (1 to 500).map(i => (i * 37) % 400L)
    val mem = MemoryStream[Long]
    val q = mem.toDS().toDF("k")
      .agg(BitmapAggregate.bitmap(col("k"), 400).as("bm"))
      .writeStream.outputMode("complete").format("memory").queryName("bitmap_stream").start()
    try {
      keys.grouped(120).foreach { chunk => mem.addData(chunk: _*); q.processAllAvailable() }
      val streamed = spark.table("bitmap_stream").head().getSeq[Long](0)
      val batch = keys.toDF("k")
        .agg(BitmapAggregate.bitmap(col("k"), 400).as("bm"))
        .head().getSeq[Long](0)
      assert(streamed == batch)
      assert(streamed.map(java.lang.Long.bitCount(_).toLong).sum == keys.distinct.size)
    } finally q.stop()
  }
}
