package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Source-format surface: the engine reads/writes parquet (primary), JSONL,
  * CSV, and ORC with explicit schemas — round-tripping the documents table
  * through each format losslessly. */
class SourceFormatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("documents round-trip losslessly through jsonl, csv, and orc") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .orderBy("doc_id")
    val schema = docs.schema
    val expected = docs.collect().map(_.toSeq).toSeq
    val dir = Files.createTempDirectory("fmt").toString

    docs.write.mode("overwrite").json(s"$dir/j")
    val j = spark.read.schema(schema).json(s"$dir/j")
    assert(j.orderBy("doc_id").collect().map(_.toSeq).toSeq == expected)

    // CSV needs quoting/escaping for free text; schema'd read, no inference
    docs.write.mode("overwrite").option("header", "true")
      .option("escape", "\"").csv(s"$dir/c")
    val c = spark.read.schema(schema).option("header", "true")
      .option("escape", "\"").csv(s"$dir/c")
    assert(c.orderBy("doc_id").collect().map(_.toSeq).toSeq == expected)

    docs.write.mode("overwrite").orc(s"$dir/o")
    val o = spark.read.orc(s"$dir/o")
    assert(o.orderBy("doc_id").collect().map(_.toSeq).toSeq == expected)

    // predicate pushdown works across formats too (orc supports it)
    val plan = o.filter(col("lang") === "en").queryExecution.executedPlan.toString
    assert(plan.contains("lang"), "filter must reach the orc scan")
  }
}
