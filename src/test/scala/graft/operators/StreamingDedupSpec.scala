package graft.operators

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("firstSeen drops duplicate keys within and across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val deduped = StreamingDedup.firstSeen(mem.toDS())(_._1)
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      mem.addData((1L, "a"), (1L, "a-dup"), (2L, "b"))
      q.processAllAvailable()
      mem.addData((1L, "a-later"), (3L, "c"))
      q.processAllAvailable()
      val out = spark.table("dedup_out").as[(Long, String)].collect().toSet
      assert(out == Set((1L, "a"), (2L, "b"), (3L, "c")))
    } finally q.stop()
  }
}
