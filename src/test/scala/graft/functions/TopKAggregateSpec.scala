package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class TopKAggregateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("top-k aggregate equals the window row_number formulation") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val viaAgg = li
      .groupBy(col("l_orderkey"))
      .agg(TopKAggregate.topK(col("l_extendedprice"), col("l_linenumber").cast("long"), 2).as("top"))
      .select(col("l_orderkey"), explode(col("top")).as("t"))
      .select(col("l_orderkey"), col("t.score"), col("t.payload"))
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_extendedprice").desc, col("l_linenumber").asc)
    val viaWindow = li
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_linenumber").cast("long"))
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(viaAgg == viaWindow)
  }

  test("tie-break and small-group behavior") {
    val df = Seq(
      (1L, 5.0, 10L), (1L, 5.0, 7L), (1L, 9.0, 3L), (1L, 1.0, 1L),
      (2L, 4.0, 2L)
    ).toDF("g", "score", "p")
    val out = df.groupBy(col("g"))
      .agg(TopKAggregate.topK(col("score"), col("p"), 2).as("top"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getDouble(0), x.getLong(1))))
      .toMap
    assert(out(1L) == Seq((9.0, 3L), (5.0, 7L))) // tie at 5.0 -> lower payload
    assert(out(2L) == Seq((4.0, 2L)))
  }
}
