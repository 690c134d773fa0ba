package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** T2 edge-extraction semantics (FIXTURES.md §1): last-parent-wins,
  * case-insensitive type match, self-loop default; G3 duplicate abort.
  */
class ParentEdgesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val relType = ArrayType(StructType(Seq(
    StructField("id", StringType),
    StructField("label", StringType),
    StructField("type", StringType))))
  private val schema = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("relationships", relType)))

  private def records(rows: (String, Seq[(String, String)])*) = {
    val data = rows.map { case (id, rels) =>
      Row(id, rels.map { case (rid, t) => Row(rid, null, t) })
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data), schema)
  }

  private def edgeMap(rows: (String, Seq[(String, String)])*): Map[String, String] =
    ParentEdges.edges(records(rows: _*)).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

  test("multiple parent relationships: LAST wins") {
    assert(edgeMap("A" -> Seq("p1" -> "parent", "p2" -> "parent")) == Map("A" -> "p2"))
  }

  test("case-insensitive type match") {
    assert(edgeMap("A" -> Seq("p" -> "Parent")) == Map("A" -> "p"))
    assert(edgeMap("B" -> Seq("p" -> "PARENT")) == Map("B" -> "p"))
  }

  test("no parent / empty / unrelated relationships → self-loop") {
    assert(edgeMap("A" -> Seq.empty) == Map("A" -> "A"))
    assert(edgeMap("B" -> Seq("c" -> "child", "r" -> "related")) == Map("B" -> "B"))
  }

  test("mixed: parent among other types, later non-parent does not override") {
    assert(edgeMap("A" -> Seq("c" -> "child", "p" -> "parent", "r" -> "related")) == Map("A" -> "p"))
  }

  test("null relationships array → self-loop") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("A", null))), schema)
    val m = ParentEdges.edges(df).collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m == Map("A" -> "A"))
  }

  test("duplicate id aborts naming the id, before any output") {
    val df = records("A" -> Seq.empty, "A" -> Seq.empty, "B" -> Seq.empty)
    val ex = intercept[IllegalStateException](ParentEdges.requireUniqueIds(df))
    assert(ex.getMessage.contains("Duplicate ID"))
    assert(ex.getMessage.contains("A"))
  }

  test("unique ids pass the gate") {
    ParentEdges.requireUniqueIds(records("A" -> Seq.empty, "B" -> Seq.empty))
  }
}
