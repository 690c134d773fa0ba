package graft.sources

import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Snapshot-isolated parquet table with optimistic-concurrency commits —
  * the staging→production promote of the reference pipeline
  * (ror_dag.py's staged write + promote, SURVEY §2 K2/K3) generalized to
  * the manifest pattern of modern lake formats (Iceberg/Delta-style,
  * reimplemented from first principles; no external deps):
  *
  *  - **Data files are immutable.** Every commit writes its rows to a fresh
  *    `data-<uuid>/` directory; nothing ever rewrites a live file.
  *  - **A snapshot is a manifest file** (`_snapshots/v<NNNNNNNN>.manifest`)
  *    listing exactly the data files visible at that version. Readers list
  *    the snapshot dir, pick a version, and read only its files — a reader
  *    holding version N is unaffected by any later commit (snapshot
  *    isolation), and old versions remain queryable (time travel).
  *  - **Commit = one atomic file creation.** The manifest is staged to a
  *    temp file and published with `Files.createLink` — hard-link creation
  *    atomically fails if the target version exists, which IS the
  *    compare-and-swap: a lost race recomputes against the new latest and
  *    retries at the next version. A writer that dies mid-commit leaves
  *    only an invisible temp file and orphan data files that no manifest
  *    references — readers can never observe a partial commit. (On an
  *    object store the same protocol rides conditional-put /
  *    rename-without-overwrite; the local form uses the POSIX primitive.)
  *  - **Compaction is just another commit**: rewrite the current rows into
  *    fewer files and publish as a `replace` snapshot. Concurrent readers
  *    of older versions still see the old files, which is why compaction
  *    never deletes — vacuuming unreferenced files is a separate offline
  *    step gated on "no reader older than X".
  *
  * Scale posture: the manifest holds file PATHS, not data — a 100 TB table
  * is a few thousand lines of text; commit cost is O(files), independent of
  * row count. Readers plan directly from the file list, so partition
  * pruning/pushdown behave exactly as a plain parquet read.
  */
object SnapshotTable {

  private val SnapDirName = "_snapshots"
  private val ManifestRe = "v(\\d{8})\\.manifest".r

  /** One table version: the exact set of data files visible at `version`. */
  final case class Snapshot(version: Long, op: String, files: Seq[String])

  final class ConcurrentCommitException(msg: String) extends RuntimeException(msg)

  def init(tableDir: String): Unit = {
    Files.createDirectories(Paths.get(tableDir, SnapDirName))
    ()
  }

  private def snapDir(tableDir: String): Path = Paths.get(tableDir, SnapDirName)
  private def manifestPath(tableDir: String, v: Long): Path =
    snapDir(tableDir).resolve(f"v$v%08d.manifest")

  /** All committed versions, ascending (empty if the table doesn't exist). */
  def versions(tableDir: String): Seq[Long] = {
    if (!Files.isDirectory(snapDir(tableDir))) return Seq.empty
    val s = Files.list(snapDir(tableDir))
    try s.iterator().asScala
      .flatMap(p => p.getFileName.toString match {
        case ManifestRe(n) => Some(n.toLong)
        case _             => None
      })
      .toSeq.sorted
    finally s.close()
  }

  def latestVersion(tableDir: String): Option[Long] = versions(tableDir).lastOption

  def snapshot(tableDir: String, v: Long): Snapshot = {
    val lines = Files.readAllLines(manifestPath(tableDir, v)).asScala.toSeq
    val meta = lines.takeWhile(_.contains("=")).map { l =>
      val Array(k, value) = l.split("=", 2); k -> value
    }.toMap
    Snapshot(v, meta.getOrElse("op", "?"), lines.dropWhile(_.contains("=")))
  }

  /** Append `df` as a new snapshot; returns the committed version. */
  def commitAppend(df: DataFrame, tableDir: String): Long =
    commit(df, tableDir, replace = false)

  /** Replace the table contents with `df` as a new snapshot. */
  def commitReplace(df: DataFrame, tableDir: String): Long =
    commit(df, tableDir, replace = true)

  /** Rewrite the current rows into `numFiles` files (small-file compaction)
    * and publish as a replace snapshot. Row-preserving by construction. */
  def compact(spark: SparkSession, tableDir: String, numFiles: Int): Long =
    commitReplace(read(spark, tableDir).repartition(numFiles), tableDir)

  /** The latest snapshot as a DataFrame. */
  def read(spark: SparkSession, tableDir: String): DataFrame =
    readVersion(spark, tableDir,
      latestVersion(tableDir).getOrElse(
        throw new IllegalStateException(s"no snapshots in $tableDir")))

  /** Time travel: the table exactly as of `version`. */
  def readVersion(spark: SparkSession, tableDir: String, version: Long): DataFrame = {
    val snap = snapshot(tableDir, version)
    // even an empty-DataFrame commit stages one (schema-only) part file,
    // so a manifest always references at least one parquet file
    spark.read.parquet(snap.files.map(f => Paths.get(tableDir, f).toString): _*)
  }

  private def commit(df: DataFrame, tableDir: String, replace: Boolean): Long = {
    init(tableDir)
    // stage immutable data files under a unique dir (never visible until a
    // manifest references them)
    val dataSub = s"data-${java.util.UUID.randomUUID().toString}"
    df.write.mode(SaveMode.ErrorIfExists).parquet(Paths.get(tableDir, dataSub).toString)
    val staged = listParquet(Paths.get(tableDir, dataSub)).map(p => s"$dataSub/$p")

    var attempt = 0
    while (attempt < 64) {
      val base =
        if (replace) Seq.empty
        else latestVersion(tableDir).map(snapshot(tableDir, _).files).getOrElse(Seq.empty)
      val v = latestVersion(tableDir).getOrElse(0L) + 1
      val body =
        (Seq(s"version=$v", s"op=${if (replace) "replace" else "append"}") ++ base ++ staged)
          .mkString("", "\n", "\n")
      val tmp = Files.createTempFile(snapDir(tableDir), s".v$v-", ".tmp")
      Files.write(tmp, body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      try {
        // hard-link creation is the atomic CAS: fails iff the version was
        // taken by a concurrent committer — then recompute base + retry
        Files.createLink(manifestPath(tableDir, v), tmp)
        Files.deleteIfExists(tmp)
        return v
      } catch {
        case _: FileAlreadyExistsException =>
          Files.deleteIfExists(tmp)
          attempt += 1
      }
    }
    throw new ConcurrentCommitException(
      s"lost the commit race $attempt times in $tableDir — livelocked writers?")
  }

  private def listParquet(dir: Path): Seq[String] = {
    val s = Files.list(dir)
    try s.iterator().asScala.map(_.getFileName.toString)
      .filter(n => n.endsWith(".parquet") && !n.startsWith(".") && !n.startsWith("_"))
      .toSeq.sorted
    finally s.close()
  }
}
