package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ExpectationsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def report(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap

  test("row rules, uniqueness, and NULL semantics count as documented") {
    import spark.implicits._
    val df = Seq(
      (1L, Option("O"), Option("1-URGENT"), 50L),
      (2L, Option("X"), Option("9-BOGUS"), -5L),
      (2L, Option("F"), None, 20L),
      (3L, None, Option("3-MEDIUM"), 2000L)
    ).toDF("id", "status", "prio", "cents")

    val out = report(Expectations.check(df, Seq(
      Expectations.notNull("status_not_null", "status"),
      Expectations.inSet("status_in_set", "status", Seq("O", "F", "P")),
      Expectations.matches("prio_pattern", "prio", "^[1-5]-"),
      Expectations.inRange("cents_range", col("cents"), 1L, 1000L),
      Expectations.Unique("unique_id", Seq("id")))).collect())

    assert(out("status_not_null") == ((1L, 4L, false)))
    // NULL status is NOT an in-set violation (predicate is NULL, not TRUE)
    assert(out("status_in_set") == ((1L, 4L, false)))
    // NULL prio is NOT a pattern violation; 9-BOGUS is
    assert(out("prio_pattern") == ((1L, 4L, false)))
    assert(out("cents_range") == ((2L, 4L, false)))
    assert(out("unique_id") == ((1L, 4L, false)))
  }

  test("a clean table passes every rule; empty suite is rejected") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val out = report(Expectations.check(df, Seq(
      Expectations.notNull("v_not_null", "v"),
      Expectations.Unique("unique_id", Seq("id")))).collect())
    assert(out.values.forall { case (v, n, p) => v == 0L && n == 2L && p })
    intercept[IllegalArgumentException] {
      Expectations.check(df, Seq.empty)
    }
  }

  test("streaming monitor accumulates violations and matches batch check") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val rules = Seq(
      Expectations.notNull("v_not_null", "v"),
      Expectations.inSet("v_in_set", "v", Seq("a", "b")))
    val q = Expectations.monitor(mem.toDF().toDF("id", "v"), rules)
      .writeStream.outputMode("complete").format("memory").queryName("exp_mon").start()
    try {
      mem.addData((1L, "a"), (2L, "zzz"))
      q.processAllAvailable()
      val r1 = report(spark.table("exp_mon").collect())
      assert(r1("v_in_set") == ((1L, 2L, false)))
      assert(r1("v_not_null") == ((0L, 2L, true)))
      // second batch ACCUMULATES into the same counters
      mem.addData((3L, "b"), (4L, "zzz"))
      q.processAllAvailable()
      val r2 = report(spark.table("exp_mon").collect())
      val batch = report(Expectations.check(
        Seq((1L, "a"), (2L, "zzz"), (3L, "b"), (4L, "zzz")).toDF("id", "v"),
        rules).collect())
      assert(r2 == batch, s"streaming $r2 vs batch $batch")
    } finally q.stop()

    intercept[IllegalArgumentException] {
      Expectations.monitor(mem.toDF().toDF("id", "v"),
        Seq(Expectations.Unique("u", Seq("id"))))
    }
  }

  test("all row-level rules share ONE aggregate scan") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val suite = Expectations.check(df, Seq(
      Expectations.notNull("r1", "v"),
      Expectations.inSet("r2", "v", Seq("a", "b")),
      Expectations.inRange("r3", col("id"), 0L, 10L)))
    // no Unique rule -> the plan must contain exactly one Aggregate chain
    // (partial+final), i.e. one scan of the input, regardless of rule count
    val scans = suite.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      case r if r.nodeName.contains("Relation") => r
    }
    assert(scans.length == 1, s"expected one scan, got:\n${suite.queryExecution.optimizedPlan}")
  }
}
