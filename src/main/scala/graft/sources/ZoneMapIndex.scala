package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone maps: min/max statistics per data file, used to skip
  * whole files before a scan ever opens them.
  *
  * Spark already exploits parquet row-group statistics — but only AFTER
  * listing and opening every file's footer. At lake scale (millions of
  * files on an object store) the listing + footer reads dominate short
  * queries; a zone-map sidecar (one tiny row per file) lets the driver
  * plan the file list itself: `[min,max] ∩ [lo,hi] = ∅` ⇒ the file is
  * never touched. This is the file-granular layer of the same idea the
  * z-order query (q67) demonstrates at bucket granularity — and skipping
  * power comes from LAYOUT: range-clustered (or z-ordered) writes give
  * each file a narrow range; random layout gives every file the full
  * range and zone maps prune nothing (both cases spec-tested).
  *
  * The stats computation is one distributed scan (`input_file_name()`
  * grouping, map-side combine); the sidecar is O(files) rows, collected
  * only at planning time like any file listing.
  */
object ZoneMapIndex {

  /** Per-file (min, max, rows) for `statsCol` — compute once per layout
    * change and persist as a sidecar table. */
  def stats(df: DataFrame, statsCol: String): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(min(col(statsCol)).as("min_v"), max(col(statsCol)).as("max_v"),
        count(lit(1)).as("n_rows"))

  /** The files whose zone intersects [lo, hi] — the planner-side skip. */
  def candidateFiles(stats: DataFrame, lo: Column, hi: Column): Seq[String] = {
    val spark = stats.sparkSession
    import spark.implicits._
    stats.filter(col("max_v") >= lo && col("min_v") <= hi)
      .select(col("file")).as[String].collect().toSeq
  }

  /** Range read through the zone map: scan only intersecting files, then
    * apply the exact predicate (zone maps overapproximate — the residual
    * filter still runs, and parquet row-group stats prune within files). */
  def readRange(
      spark: SparkSession,
      stats: DataFrame,
      statsCol: String,
      lo: Column,
      hi: Column): DataFrame = {
    val files = candidateFiles(stats, lo, hi)
    if (files.isEmpty) {
      // preserve schema without touching data: empty limit over any file
      val one = stats.select(col("file")).limit(1).collect().map(_.getString(0))
      require(one.nonEmpty, "readRange over an empty zone-map stats table")
      spark.read.parquet(one.toSeq: _*).limit(0)
    } else {
      spark.read.parquet(files: _*)
        .filter(col(statsCol) >= lo && col(statsCol) <= hi)
    }
  }
}
