package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PrefixSumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("distributed prefix sum equals the single-partition window, negatives included") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 5000).map(i => (i.toLong * 3 + rnd.nextInt(2), rnd.nextInt(100).toLong - 20))
      .distinctBy(_._1)
    val df = rows.toDF("k", "v").repartition(13) // scrambled input layout
    val got = PrefixSum.running(df, "k", "v", numParts = 8)
      .select(col("k"), col("cum")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.withColumn("cum",
        sum(col("v")).over(Window.orderBy(col("k")).rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("k"), col("cum")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("keeps all original columns and handles a single partition") {
    val df = Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c")).toDF("k", "v", "tag")
    val out = PrefixSum.running(df, "k", "v", cumCol = "running", numParts = 1)
      .orderBy("k").collect()
    assert(out.map(_.getAs[Long]("running")).toSeq == Seq(10L, 30L, 60L))
    assert(out.map(_.getAs[String]("tag")).toSeq == Seq("a", "b", "c"))
  }
}
