package graft.functions

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class HllAggregateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("aggregate registers equal the q246 expression pipeline, group for group") {
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
    val viaAgg = ev.groupBy(col("event_type"))
      .agg(HllAggregate.hll(HllAggregate.hllHash(col("user_id"))).as("regs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    // expression pipeline: distinct -> bucket/rho -> max per bucket
    val viaExpr = ev.select(col("event_type"), col("user_id")).distinct()
      .withColumn("h", HllAggregate.hllHash(col("user_id")))
      .withColumn("bucket", col("h") % 64)
      .withColumn("stream", expr("(h div 64) % 4294967296"))
      .withColumn("rho", when(col("stream") === 0, lit(33L))
        .otherwise(lit(33L) - length(bin(col("stream")))))
      .groupBy(col("event_type"), col("bucket")).agg(max(col("rho")).as("m"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(x => x._2 -> x._3).toMap).toMap
    assert(viaAgg.keySet == viaExpr.keySet)
    for ((t, regs) <- viaAgg; b <- 0 until 64)
      assert(regs(b) == viaExpr(t).getOrElse(b.toLong, 0L), s"$t bucket $b")
  }

  test("merge is element-wise max: fuzz against a pure-Scala fold") {
    val rnd = new scala.util.Random(31)
    def md5l(s: String) = Md5LongUtil.hashBytes(s.getBytes("UTF-8"))
    val keys = Seq.fill(3000)(rnd.nextInt(800).toLong)
    val got = keys.toDF("k")
      .repartition(13) // many partial buffers -> real merges
      .agg(HllAggregate.hll(HllAggregate.hllHash(col("k"))).as("regs"))
      .collect().head.getSeq[Long](0)
    val want = new Array[Long](64)
    for (k <- keys.distinct) {
      val h = md5l("hll:" + k)
      val b = (h % 64).toInt
      val st = (h >>> 6) & 0xffffffffL
      val rho = if (st == 0L) 33L
        else 33L - (64 - java.lang.Long.numberOfLeadingZeros(st))
      if (rho > want(b)) want(b) = rho
    }
    assert(got.toArray.toSeq == want.toSeq)
  }

  test("streaming windowed HLL under random slicing == batch") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(41)
    def ts(min: Long) = new Timestamp(min * 60000L)
    val events = rnd.shuffle((0 until 600).map { _ =>
      (ts(rnd.nextInt(360)), rnd.nextInt(200).toLong)
    })
    val mem = MemoryStream[(Timestamp, Long)]
    def plan(df: org.apache.spark.sql.DataFrame) = df.toDF("ts", "uid")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(HllAggregate.hll(HllAggregate.hllHash(col("uid"))).as("regs"))
      .select(unix_micros(col("window.start")).as("ws"), col("regs"))
    val q = plan(mem.toDF()).writeStream.outputMode("complete")
      .format("memory").queryName("hll_stream").start()
    try {
      var rest = events
      while (rest.nonEmpty) {
        val n = 1 + rnd.nextInt(150)
        mem.addData(rest.take(n): _*)
        q.processAllAvailable()
        rest = rest.drop(n)
      }
      val streamed = spark.table("hll_stream").collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val batch = plan(events.toDF("ts", "uid")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(streamed == batch,
        "registers are order-insensitive => stream == batch under any slicing")
      assert(batch.size == 6)
    } finally q.stop()
  }

  test("graft_hll is available as a SQL function under GraftExtensions") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    ev.createOrReplaceTempView("hll_ev")
    // the temp-function fallback registers on first Column use; the
    // extensions path injects the same expression by name
    HllAggregate.hll(HllAggregate.hllHash(col("user_id")))
    val viaSql = spark.sql(
      "SELECT event_type, graft_hll(graft_md5_long('hll:' || CAST(user_id AS STRING))) " +
        "FROM hll_ev GROUP BY event_type")
    assert(viaSql.collect().forall(_.getSeq[Long](1).length == 64))
  }
}
