package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Partition-pruned layout: writing a corpus `partitionBy` a low-cardinality
  * column lets later scans touch only matching directories — the on-disk
  * analogue of the broadcast/pushdown story, and the layout a 100 TB corpus
  * would use (e.g. partition by language/source/date).
  */
class PartitionedWriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("partitionBy(lang) write prunes non-matching partitions on read") {
    val out = Files.createTempDirectory("docs_part").toString
    Tables.documents(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").partitionBy("lang").parquet(out)

    val en = spark.read.parquet(out).filter(col("lang") === "en")
    // the pushed partition filter appears on the scan node; actual file
    // selection happens there (inputFiles ignores filters, so inspect plan)
    val plan = en.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"expected a partition filter on the scan:\n$plan")
    assert(en.count() == Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("lang") === "en").count())
  }
}
