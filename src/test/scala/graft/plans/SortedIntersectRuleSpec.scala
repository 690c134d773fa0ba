package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SortedIntersectCount

/** The optimizer rewrite: `size(array_intersect(...))` over syntactically
  * sorted-distinct long arrays becomes the two-pointer merge count, with
  * identical results (values and NULLs); unproven inputs are left alone. */
class SortedIntersectRuleSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val prior = SparkSession.getDefaultSession

  override def afterAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    prior.foreach(SparkSession.setDefaultSession)
  }

  private lazy val spark: SparkSession = {
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    SparkSession.builder()
      .master("local[2]")
      .appName("graft-sorted-intersect-test")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  private def countKernels(sql: String): Int = {
    val plan = spark.sql(sql).queryExecution.optimizedPlan
    plan.collect { case p =>
      p.expressions.map(_.collect { case _: SortedIntersectCount => 1 }.sum).sum
    }.sum
  }

  private val base = "SELECT size(array_intersect(" +
    "sort_array(array_distinct(a)), sort_array(array_distinct(b)))) AS n " +
    "FROM VALUES (array(3L,1L,2L,2L), array(2L,3L,9L)), " +
    "(array(5L), array(6L)) AS t(a, b)"

  test("sorted-distinct intersect size rewrites to the merge kernel") {
    assert(countKernels(base) === 1)
    val got = spark.sql(base).collect().map(_.getInt(0))
    assert(got.toSeq === Seq(2, 0))
  }

  test("NULL arrays (non-null elements) still rewrite, and yield NULL") {
    import spark.implicits._
    // a NULLABLE array column whose ELEMENT type is non-null: the kernel
    // contract allows it (null-safe eval), and the rule must fire.
    // (A CAST(NULL AS ARRAY<BIGINT>) literal would widen containsNull to
    // true and correctly suppress the rewrite instead.)
    val df = Seq((Option(Seq(1L, 2L)), Seq(2L, 3L)), (Option.empty[Seq[Long]], Seq(1L)))
      .toDF("a", "b")
      .selectExpr("size(array_intersect(" +
        "sort_array(array_distinct(a)), sort_array(array_distinct(b)))) AS n")
    val kernels = df.queryExecution.optimizedPlan.collect { case p =>
      p.expressions.map(_.collect { case _: SortedIntersectCount => 1 }.sum).sum
    }.sum
    assert(kernels === 1)
    val got = df.collect().map(r => if (r.isNullAt(0)) null else r.getInt(0))
    assert(got.toSeq === Seq(1, null))
  }

  test("unproven inputs are left alone (no sort, no distinct, wrong order)") {
    assert(countKernels(
      "SELECT size(array_intersect(a, b)) FROM VALUES " +
        "(array(1L), array(1L)) AS t(a, b)") === 0)
    assert(countKernels(
      "SELECT size(array_intersect(sort_array(a), sort_array(b))) FROM VALUES " +
        "(array(1L), array(1L)) AS t(a, b)") === 0)
    assert(countKernels(
      "SELECT size(array_intersect(sort_array(array_distinct(a), false), " +
        "sort_array(array_distinct(b), false))) FROM VALUES " +
        "(array(1L), array(1L)) AS t(a, b)") === 0)
    // non-long element types keep the built-in path (kernel contract)
    assert(countKernels(
      "SELECT size(array_intersect(sort_array(array_distinct(a)), " +
        "sort_array(array_distinct(b)))) FROM VALUES " +
        "(array('x'), array('x')) AS t(a, b)") === 0)
  }

  test("rewritten result equals the naive computation on fuzzed sets") {
    val rnd = new scala.util.Random(23)
    import spark.implicits._
    val rows = Seq.fill(200)((
      Seq.fill(rnd.nextInt(20))(rnd.nextInt(30).toLong),
      Seq.fill(rnd.nextInt(20))(rnd.nextInt(30).toLong)))
    val df = rows.toDF("a", "b").selectExpr(
      "size(array_intersect(sort_array(array_distinct(a)), sort_array(array_distinct(b)))) AS n",
      "a", "b")
    val got = df.collect().map(_.getInt(0)).toSeq
    val expect = rows.map { case (a, b) => a.toSet.intersect(b.toSet).size }
    assert(got === expect)
  }
}
