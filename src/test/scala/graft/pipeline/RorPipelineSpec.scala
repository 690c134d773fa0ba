package graft.pipeline

import java.nio.file.{Files, Paths}
import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RorPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rec(id: String, rels: String, name: String): String =
    s"""{"id": "$id", "status": "active",
       | "names": [{"value": "$name", "types": ["label"], "lang": "en"}],
       | "links": [{"type": "website", "value": "https://example.org/$id"}],
       | "types": ["education"], "domains": ["$id.example.org"],
       | "established": 1971,
       | "admin": {"created": {"date": "2020-01-01", "schema_version": "2.0"},
       |           "last_modified": {"date": "2024-06-01", "schema_version": "2.0"}},
       | "locations": [{"geonames_id": 42, "geonames_details":
       |     {"country_name": "Testland", "country_code": "TL",
       |      "lat": 1.5, "lng": 2.5, "name": "Testville"}}],
       | "relationships": [$rels],
       | "external_ids": [{"type": "isni", "all": ["0000"], "preferred": "0000"}]}"""
      .stripMargin.replaceAll("\n", " ")

  private def parentRel(id: String, t: String = "parent") =
    s"""{"id": "$id", "label": "l", "type": "$t"}"""

  private def writeDump(dir: String, recs: Seq[String]): String = {
    val p = Paths.get(dir, "dump.json")
    Files.createDirectories(p.getParent)
    Files.writeString(p, recs.mkString("[\n", ",\n", "\n]"))
    p.toString
  }

  private val fullRecs = Seq(
    rec("r1", "", "Root Org"),
    rec("c1", parentRel("r1") + ", " + s"""{"id": "g1", "label": "l", "type": "child"}""", "Child Org"),
    rec("g1", parentRel("c1", "Parent"), "Grandchild Org"),           // case-insensitive
    rec("m1", parentRel("c1") + ", " + parentRel("r1"), "Multi Org"), // last parent wins -> r1
    rec("cy1", parentRel("cy2"), "Cycle A"),
    rec("cy2", parentRel("cy1"), "Cycle B"))

  test("end-to-end run: enrichment, gates, promote, snapshot, report") {
    val wh = Files.createTempDirectory("ror_wh").toString
    val dump = writeDump(s"$wh/in", fullRecs)
    val cfg = RorPipeline.Config(dump, wh, runDate = LocalDate.of(2026, 8, 12))
    val report = RorPipeline.run(spark, cfg)

    assert(report.records == 6)
    assert(report.cappedIds == Seq("cy1", "cy2"))
    assert(report.cappedCount == 2)
    assert(report.gates.forall(_.passed))

    val prod = spark.read.parquet(s"$wh/prod/ror")
    val up = prod.select("id", "ultimate_parent").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(up == Map(
      "r1" -> "r1", "c1" -> "r1", "g1" -> "r1", "m1" -> "r1",
      "cy1" -> "cy1", "cy2" -> "cy2"))

    val backup = spark.read.parquet(s"$wh/backups/ror_20260812")
    assert(backup.count() == 6)
    assert(Files.exists(Paths.get(s"$wh/prod/ror/_column_descriptions.json")))

    // nested fields survive the schema'd load
    val row = prod.filter(prod("id") === "r1")
      .selectExpr("names[0].value", "admin.created.date", "locations[0].geonames_details.lat")
      .head()
    assert(row.getString(0) == "Root Org")
    assert(row.getDate(1).toString == "2020-01-01")
    assert(row.getDouble(2) == 1.5)
  }

  test("snapshotMode: versioned promote, time-travelable history, gates against latest") {
    import graft.sources.SnapshotTable
    val wh = Files.createTempDirectory("ror_wh_snap").toString
    val prodDir = s"$wh/prod/ror"
    // run 1: 6 records -> v1
    val r1 = RorPipeline.run(spark,
      RorPipeline.Config(writeDump(s"$wh/in1", fullRecs), wh, snapshotMode = true))
    assert(r1.backupPath === s"$prodDir@v1")
    assert(SnapshotTable.read(spark, prodDir).count() === 6)
    // run 2: same records + one more -> v2; v1 stays readable (the backup)
    val r2 = RorPipeline.run(spark,
      RorPipeline.Config(writeDump(s"$wh/in2", fullRecs :+ rec("x1", "", "Extra Org")),
        wh, snapshotMode = true))
    assert(r2.backupPath === s"$prodDir@v2")
    assert(SnapshotTable.read(spark, prodDir).count() === 7)
    assert(SnapshotTable.readVersion(spark, prodDir, 1).count() === 6)
    // A2 gate in snapshot mode reads the LATEST version: shrinking blocks
    val err = intercept[IllegalStateException] {
      RorPipeline.run(spark,
        RorPipeline.Config(writeDump(s"$wh/in3", fullRecs.take(2)), wh, snapshotMode = true))
    }
    assert(err.getMessage.contains("monotonic"))
    assert(SnapshotTable.latestVersion(prodDir) === Some(2L)) // prod untouched
  }

  test("shrinking dataset blocks promotion (A2) and leaves prod intact") {
    val wh = Files.createTempDirectory("ror_wh2").toString
    RorPipeline.run(spark, RorPipeline.Config(writeDump(s"$wh/in1", fullRecs), wh))
    val small = writeDump(s"$wh/in2", fullRecs.take(2))
    val ex = intercept[IllegalStateException] {
      RorPipeline.run(spark, RorPipeline.Config(small, wh))
    }
    assert(ex.getMessage.contains("monotonic_count"))
    assert(spark.read.parquet(s"$wh/prod/ror").count() == 6)
  }

  test("duplicate id aborts before any output (G3)") {
    val wh = Files.createTempDirectory("ror_wh3").toString
    val dump = writeDump(s"$wh/in", fullRecs :+ rec("r1", "", "Dup Root"))
    val ex = intercept[IllegalStateException] {
      RorPipeline.run(spark, RorPipeline.Config(dump, wh))
    }
    assert(ex.getMessage.contains("Duplicate ID"))
    assert(!Files.exists(Paths.get(s"$wh/prod/ror")))
  }

  test("zip dump: expansion, schema-file exclusion, ambiguity abort (S2/S3)") {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    def writeZip(path: String, members: (String, String)*): String = {
      Files.createDirectories(Paths.get(path).getParent)
      val zos = new ZipOutputStream(java.nio.file.Files.newOutputStream(Paths.get(path)))
      members.foreach { case (name, content) =>
        zos.putNextEntry(new ZipEntry(name))
        zos.write(content.getBytes("UTF-8")); zos.closeEntry()
      }
      zos.close(); path
    }
    val wh = Files.createTempDirectory("ror_zip").toString
    val body = fullRecs.take(3).mkString("[\n", ",\n", "\n]")
    val good = writeZip(s"$wh/in/dump.zip",
      "v1.55-data.json" -> body, "v1.55-schema.json" -> "{}", "README.txt" -> "x")
    val report = RorPipeline.run(spark, RorPipeline.Config(good, wh))
    assert(report.records == 3)

    val wh2 = Files.createTempDirectory("ror_zip2").toString
    val ambiguous = writeZip(s"$wh2/in/dump.zip",
      "a-data.json" -> body, "b-data.json" -> body)
    val ex = intercept[IllegalArgumentException] {
      RorPipeline.run(spark, RorPipeline.Config(ambiguous, wh2))
    }
    assert(ex.getMessage.contains("exactly one data file"))
  }

  test("mass-cycle graph: K6 id sample is bounded, count carries the total") {
    // one giant cycle — every org is capped; the report must NOT pull every
    // id to the driver, only a sorted bounded sample + the full count
    val n = RorPipeline.cappedIdSample + 50
    val ids = (1 to n).map(i => f"z$i%04d")
    val recs = ids.zipWithIndex.map { case (id, i) =>
      rec(id, parentRel(ids((i + 1) % n)), s"Org $id")
    }
    val wh = Files.createTempDirectory("ror_wh_cycle").toString
    val report = RorPipeline.run(spark, RorPipeline.Config(writeDump(s"$wh/in", recs), wh))
    assert(report.cappedCount == n)
    assert(report.cappedIds == ids.sorted.take(RorPipeline.cappedIdSample))
  }

  test("small-graph (collected) mode produces identical results") {
    val wh = Files.createTempDirectory("ror_wh4").toString
    val dump = writeDump(s"$wh/in", fullRecs)
    val report = RorPipeline.run(spark, RorPipeline.Config(dump, wh, smallGraph = true))
    assert(report.cappedIds == Seq("cy1", "cy2"))
    val up = spark.read.parquet(s"$wh/prod/ror")
      .select("id", "ultimate_parent").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(up("g1") == "r1" && up("cy1") == "cy1")
  }
}
