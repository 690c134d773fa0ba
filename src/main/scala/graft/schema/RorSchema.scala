package graft.schema

import org.apache.spark.sql.types._

/** The ROR organization-registry table schema, re-expressed natively in
  * Spark types from the documented shape (FIXTURES.md §2; original BigQuery
  * schema at `/root/reference/schemas/ror.json:1-221`): 12 top-level fields,
  * 7 REPEATED, 2 nested RECORD levels, plus the engine-added REQUIRED
  * `ultimate_parent` output column.
  */
object RorSchema {

  private def f(name: String, dt: DataType, nullable: Boolean = true) =
    StructField(name, dt, nullable)

  val namesType: ArrayType = ArrayType(StructType(Seq(
    f("value", StringType, nullable = false),
    f("types", ArrayType(StringType, containsNull = false)),
    f("lang", StringType))), containsNull = false)

  val linksType: ArrayType = ArrayType(StructType(Seq(
    f("type", StringType, nullable = false),
    f("value", StringType, nullable = false))), containsNull = false)

  val adminType: StructType = StructType(Seq(
    f("created", StructType(Seq(
      f("date", DateType), f("schema_version", StringType)))),
    f("last_modified", StructType(Seq(
      f("date", DateType), f("schema_version", StringType))))))

  val locationsType: ArrayType = ArrayType(StructType(Seq(
    f("geonames_id", LongType, nullable = false),
    f("geonames_details", StructType(Seq(
      f("continent_code", StringType),
      f("continent_name", StringType),
      f("country_name", StringType),
      f("country_code", StringType),
      f("country_subdivision_code", StringType),
      f("country_subdivision_name", StringType),
      f("lat", DoubleType),
      f("lng", DoubleType),
      f("name", StringType, nullable = false))), nullable = false))),
    containsNull = false)

  val relationshipsType: ArrayType = ArrayType(StructType(Seq(
    f("id", StringType),
    f("label", StringType),
    f("type", StringType))), containsNull = false)

  val externalIdsType: ArrayType = ArrayType(StructType(Seq(
    f("type", StringType, nullable = false),
    f("all", ArrayType(StringType, containsNull = false)),
    f("preferred", StringType))), containsNull = false)

  /** Input schema (as loaded from the dump). */
  val schema: StructType = StructType(Seq(
    f("names", namesType),
    f("links", linksType),
    f("types", ArrayType(StringType, containsNull = false)),
    f("id", StringType, nullable = false),
    f("status", StringType),
    f("admin", adminType),
    f("domains", ArrayType(StringType, containsNull = false)),
    f("established", LongType),
    f("locations", locationsType),
    f("relationships", relationshipsType),
    f("external_ids", externalIdsType)))

  /** Output schema: input plus the engine-added rollup column. */
  val enrichedSchema: StructType = StructType(
    schema.fields :+ StructField("ultimate_parent", StringType, nullable = false)
      .withComment("The ultimate parent organization id resolved through the relationships graph."))
}
