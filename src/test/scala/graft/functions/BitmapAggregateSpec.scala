package graft.functions

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BitmapAggregateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bitmap cardinality equals countDistinct across a real shuffle") {
    val df = (1 to 5000).map(i => (i % 7, (i * i) % 997L)).toDF("g", "k").repartition(8)
    val viaBitmap = df.groupBy(col("g"))
      .agg(BitmapAggregate.bitmap(col("k"), 1000).as("bm"))
      .select(col("g"), BitmapAggregate.cardinality(col("bm")).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val exact = df.groupBy(col("g")).agg(countDistinct(col("k")).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(viaBitmap == exact)
  }

  test("set algebra: intersection count equals the join-based count") {
    val a = Seq(1L, 2L, 3L, 64L, 65L, 127L)
    val b = Seq(2L, 64L, 100L, 127L)
    val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("g", "k")
    val bm = df.groupBy(col("g")).agg(BitmapAggregate.bitmap(col("k"), 128).as("bm"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val row = spark.createDataFrame(Seq(Tuple1(1))).toDF("one")
      .withColumn("x", typedLit(bm("a"))).withColumn("y", typedLit(bm("b")))
      .select(
        BitmapAggregate.cardinality(col("x")).as("na"),
        BitmapAggregate.cardinality(col("y")).as("nb"),
        BitmapAggregate.intersectCount(col("x"), col("y")).as("common"))
      .head()
    assert(row.getLong(0) == a.distinct.size && row.getLong(1) == b.distinct.size)
    assert(row.getLong(2) == (a.toSet & b.toSet).size)
  }

  test("word-boundary keys (63, 64, 127, 128) land in the right words") {
    val keys = Seq(0L, 63L, 64L, 127L, 128L)
    val bm = keys.toDF("k").agg(BitmapAggregate.bitmap(col("k"), 192).as("bm"))
      .select(BitmapAggregate.cardinality(col("bm"))).head().getLong(0)
    assert(bm == keys.size)
  }

  test("out-of-range key fails loudly instead of dropping the bit") {
    val ex = intercept[SparkException] {
      Seq(5000L).toDF("k").agg(BitmapAggregate.bitmap(col("k"), 100)).collect()
    }
    assert(ex.getMessage.contains("outside") || ex.getCause.getMessage.contains("outside"))
  }
}
