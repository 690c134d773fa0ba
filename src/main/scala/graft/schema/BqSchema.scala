package graft.schema

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types._

/** BigQuery JSON table schema → Spark `StructType` converter (reference op
  * S8's `schema_object` semantics, `/root/reference/ror_dag.py:166-175`).
  *
  * Mapping (SURVEY.md §1.2): REPEATED → `ArrayType`, RECORD → `StructType`,
  * REQUIRED → `nullable = false`, INTEGER → `LongType` (BQ INTEGER is
  * 64-bit), FLOAT → `DoubleType`, DATE → `DateType`; the `description`
  * string is carried into the Spark column comment (feeds the K4 metadata
  * sidecar).
  *
  * Load semantics to pair with it: read JSONL **with** this schema (missing
  * NULLABLE/REPEATED fields → null, unknown fields ignored) — never schema
  * inference, exactly like a BigQuery load job with an explicit schema.
  */
object BqSchema {

  def fromJson(json: String): StructType = {
    val root = new ObjectMapper().readTree(json)
    require(root.isArray, "BigQuery schema must be a JSON array of field objects")
    StructType(root.elements().asScala.map(field).toSeq)
  }

  def toStructField(fieldJson: String): StructField =
    field(new ObjectMapper().readTree(fieldJson))

  private def field(n: JsonNode): StructField = {
    val name = n.get("name").asText()
    val mode =
      if (n.has("mode") && !n.get("mode").isNull) n.get("mode").asText().toUpperCase
      else "NULLABLE"
    val base: DataType = n.get("type").asText().toUpperCase match {
      case "STRING"                 => StringType
      case "INTEGER" | "INT64"     => LongType
      case "FLOAT" | "FLOAT64"     => DoubleType
      case "DATE"                   => DateType
      case "TIMESTAMP"              => TimestampType
      case "DATETIME"               => TimestampNTZType
      case "BOOLEAN" | "BOOL"      => BooleanType
      case "BYTES"                  => BinaryType
      case "NUMERIC" | "BIGNUMERIC" => DecimalType(38, 9)
      case "RECORD" | "STRUCT" =>
        StructType(n.get("fields").elements().asScala.map(field).toSeq)
      case other =>
        throw new IllegalArgumentException(s"unsupported BigQuery type: $other")
    }
    val dt = if (mode == "REPEATED") ArrayType(base, containsNull = false) else base
    val f  = StructField(name, dt, nullable = mode != "REQUIRED")
    if (n.has("description") && !n.get("description").isNull)
      f.withComment(n.get("description").asText())
    else f
  }

  /** Sidecar metadata JSON: field name → comment, for tables written to
    * plain parquet where no catalog carries column descriptions (K4). */
  def commentSidecar(schema: StructType): String = {
    def esc(s: String) =
      s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      }
    schema.fields
      .flatMap(f => f.getComment().map(c => s""""${esc(f.name)}": "${esc(c)}""""))
      .mkString("{", ", ", "}")
  }
}
