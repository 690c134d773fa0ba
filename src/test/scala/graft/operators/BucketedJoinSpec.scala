package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Co-located (bucketed) joins: pre-bucketing both sides on the join key at
  * write time lets the join run with ZERO exchanges — the layout strategy
  * for repeatedly-joined 100 TB fact tables (pay the shuffle once at write,
  * never again at read).
  */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("matching bucketed tables join without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      (1L to 1000L).map(i => (i, s"left$i")).toDF("k", "lv")
        .write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("b_left")
      (1L to 1000L).filter(_ % 3 == 0).map(i => (i, s"right$i")).toDF("k", "rv")
        .write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("b_right")

      val joined = spark.table("b_left").join(spark.table("b_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(joined.count() == 333)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_left")
      spark.sql("DROP TABLE IF EXISTS b_right")
    }
  }
}
