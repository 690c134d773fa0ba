package graft

import org.scalatest.funsuite.AnyFunSuite

/** Executes EVERY SparkEntry query at the smallest scale factor: a broken
  * query surfaces in `sbt test`, not first in the driver's verify run.
  * Also guards the driver contract invariants (oracle keys ⊆ query keys,
  * entry smoke). */
class QueriesSmokeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("entry returns rows (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name executes at sf0.001") {
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty)
      df.write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
    }
  }
}
