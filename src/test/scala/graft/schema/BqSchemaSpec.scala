package graft.schema

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class BqSchemaSpec extends AnyFunSuite {

  private val json =
    """[
      |  {"name": "id", "type": "STRING", "mode": "REQUIRED", "description": "the key"},
      |  {"name": "established", "type": "INTEGER", "mode": "NULLABLE"},
      |  {"name": "score", "type": "FLOAT"},
      |  {"name": "active", "type": "BOOLEAN"},
      |  {"name": "tags", "type": "STRING", "mode": "REPEATED"},
      |  {"name": "meta", "type": "RECORD", "mode": "NULLABLE", "fields": [
      |     {"name": "created", "type": "DATE"},
      |     {"name": "coords", "type": "RECORD", "mode": "REPEATED", "fields": [
      |        {"name": "lat", "type": "FLOAT", "mode": "REQUIRED"}
      |     ]}
      |  ]}
      |]""".stripMargin

  test("type, mode and nesting mapping") {
    val s = BqSchema.fromJson(json)
    assert(s("id").dataType == StringType && !s("id").nullable)
    assert(s("id").getComment().contains("the key"))
    assert(s("established").dataType == LongType && s("established").nullable)
    assert(s("score").dataType == DoubleType)
    assert(s("active").dataType == BooleanType)
    assert(s("tags").dataType == ArrayType(StringType, containsNull = false))
    val meta = s("meta").dataType.asInstanceOf[StructType]
    assert(meta("created").dataType == DateType)
    val coords = meta("coords").dataType.asInstanceOf[ArrayType]
    val coordSt = coords.elementType.asInstanceOf[StructType]
    assert(coordSt("lat").dataType == DoubleType && !coordSt("lat").nullable)
  }

  test("full scalar type matrix") {
    val s = BqSchema.fromJson(
      """[
        | {"name": "a", "type": "INT64"},
        | {"name": "b", "type": "FLOAT64"},
        | {"name": "c", "type": "TIMESTAMP"},
        | {"name": "d", "type": "DATETIME"},
        | {"name": "e", "type": "BYTES"},
        | {"name": "f", "type": "NUMERIC"},
        | {"name": "g", "type": "BOOL"}
        |]""".stripMargin)
    assert(s("a").dataType == LongType)
    assert(s("b").dataType == DoubleType)
    assert(s("c").dataType == TimestampType)
    assert(s("d").dataType == TimestampNTZType)
    assert(s("e").dataType == BinaryType)
    assert(s("f").dataType == DecimalType(38, 9))
    assert(s("g").dataType == BooleanType)
  }

  test("unsupported type rejected") {
    intercept[IllegalArgumentException] {
      BqSchema.fromJson("""[{"name": "x", "type": "GEOGRAPHY"}]""")
    }
  }

  test("comment sidecar carries descriptions") {
    val sidecar = BqSchema.commentSidecar(BqSchema.fromJson(json))
    assert(sidecar.contains(""""id": "the key""""))
  }

  test("ror enriched schema has required ultimate_parent with comment") {
    val f = RorSchema.enrichedSchema("ultimate_parent")
    assert(!f.nullable && f.getComment().nonEmpty)
  }
}
