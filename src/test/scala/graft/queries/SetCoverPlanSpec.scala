package graft.queries

import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Plan-shape lock for q182's universe selection (the round-6 verdict's
  * scale finding): the k-rarest-shingle pick must be the bounded
  * map-side-combined TopKByScore aggregate, never an unpartitioned
  * `row_number` window — a global single-task sort whose input grows with
  * the corpus.
  */
class SetCoverPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q182 universe selection has no Window node, only the bounded TopK aggregate") {
    val (pairs, universe) = StatQueries.setCoverRelations(spark, dir, 200)
    try {
      val plan = universe.queryExecution.optimizedPlan
      val windows = plan.collect { case w: LWindow => w }
      assert(windows.isEmpty,
        s"universe selection must not contain a Window (global sort at scale):\n$plan")
      assert(plan.toString.toLowerCase.contains("topkbyscore"),
        s"universe selection should use the bounded TopKByScore aggregate:\n$plan")
    } finally pairs.unpersist()
  }

  test("q182 universe is exactly min(k, |distinct shingles|) rows") {
    val (pairs, universe) = StatQueries.setCoverRelations(spark, dir, 200)
    try {
      val distinctShingles = pairs.select("t").distinct().count()
      assert(universe.count() == math.min(200L, distinctShingles))
    } finally pairs.unpersist()
  }
}
