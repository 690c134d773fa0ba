package graft.sources

import java.io.{File, FileInputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths}
import java.util.zip.ZipInputStream

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Ingest-side source abstraction (reference ops S1–S7).
  *
  * The reference fetches the newest registry dump over HTTP, expands the
  * zip, picks the single data file, converts the JSON array to JSONL, and
  * stages it (`/root/reference/ror_scripts/fetch.py:11-45`). Transport is
  * pluggable — the offline harness implements the same contract against
  * local files; a production deployment would add an HTTP-backed
  * implementation with the same `fetchLatest` semantics (most-recent record,
  * first file).
  */
trait DumpSource {
  /** Materialize the newest raw dump locally; returns the path of the single
    * JSON data file (post zip-expansion and data-file selection). */
  def fetchLatest(workDir: Path): Path
}

/** Local-file source: accepts either a raw `.json` dump or a `.zip` archive
  * containing exactly one non-schema `.json` member (S2/S3 semantics,
  * `fetch.py:24-35` — the ambiguous-dump hard-assert is preserved). */
final class LocalDumpSource(dumpPath: String) extends DumpSource {

  override def fetchLatest(workDir: Path): Path = {
    val src = Paths.get(dumpPath)
    require(Files.exists(src), s"dump not found: $dumpPath")
    if (dumpPath.endsWith(".zip")) expandAndSelect(src, workDir) else src
  }

  private def expandAndSelect(zip: Path, workDir: Path): Path = {
    Files.createDirectories(workDir)
    val zin = new ZipInputStream(new FileInputStream(zip.toFile))
    val extracted = Iterator.continually(zin.getNextEntry).takeWhile(_ != null).map { e =>
      val out = workDir.resolve(new File(e.getName).getName)
      if (!e.isDirectory) {
        val os = new FileOutputStream(out.toFile)
        zin.transferTo(os); os.close()
      }
      out.getFileName.toString
    }.toList
    zin.close()
    // S3: exactly one *.json member whose name lacks "schema" — fail fast on
    // an ambiguous dump, like the reference's assert (fetch.py:32-35).
    val data = extracted.filter(n => n.endsWith(".json") && !n.contains("schema"))
    require(data.size == 1, s"expected exactly one data file, found: $data")
    workDir.resolve(data.head)
  }
}

/** S1's selection rule as data (SURVEY.md §2.5): the reference asks the
  * catalog API for `sort=mostrecent` and takes the head record's first file
  * (`fetch.py:19-23`) — a remote-side ORDER BY + LIMIT 1. When the catalog
  * is modeled as a DataFrame, the same semantics are one declarative plan.
  */
object CatalogSelect {

  /** `catalog(published: orderable, files: array<string>)` → the newest
    * record's first file. Deterministic tie-break on the file name. */
  def newestFile(
      catalog: org.apache.spark.sql.DataFrame,
      publishedCol: String = "published",
      filesCol: String = "files"): String = {
    val rows = catalog
      .orderBy(org.apache.spark.sql.functions.desc(publishedCol),
        org.apache.spark.sql.functions.asc(filesCol))
      .limit(1)
      .select(org.apache.spark.sql.functions.element_at(
        org.apache.spark.sql.functions.col(filesCol), 1))
      .collect()
    require(rows.nonEmpty, "empty dump catalog")
    rows.head.getString(0)
  }
}

object Jsonl {

  /** S4: JSON-array dump → JSONL — a top-level array exploded into one
    * record per line. Distributed via Spark's multiLine json reader; the
    * declared schema keeps load semantics (unknown fields ignored, missing
    * nullable fields null) identical to a schema'd load job. */
  def fromJsonArray(spark: SparkSession, schema: StructType, file: String, outDir: String): Unit =
    spark.read.schema(schema).option("multiLine", value = true).json(file)
      .write.mode(SaveMode.Overwrite).json(outDir)

  /** S6–S8: schema'd JSONL scan (Spark's native line-per-record format). */
  def read(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema).json(path)
}
