package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{BloomFilterAggregate, TextHash}

/** File-level bloom filters: the point-lookup complement of
  * [[ZoneMapIndex]]'s range pruning.
  *
  * Zone maps only skip files when the LAYOUT clusters the key — on a
  * random layout every file spans the full range and min/max prunes
  * nothing. A per-file bloom bitset prunes by MEMBERSHIP instead: a point
  * probe `key = v` skips every file whose bloom rejects v, regardless of
  * layout. This is the Delta/Iceberg "bloom filter index" feature: the
  * sidecar is one bounded bitset row per file (numBits/8 bytes — 8 KiB at
  * the 2¹⁶ default), built in ONE distributed scan with map-side-combined
  * OR (the [[graft.functions.BloomFilterAgg]] buffer), and consulted
  * driver-side at planning time like any file listing.
  *
  * Keys hash through the portable md5 base hash (reduced mod 2³¹−1, the
  * [[graft.functions.BloomFilterAgg]] input contract) on the STRING form
  * of the value, so build and probe agree for any key type, and a false positive
  * only costs an extra file read — the residual exact filter keeps the
  * result set precise (spec-proven on both hit and miss probes).
  */
object BloomFileIndex {

  val DefaultBits = 1 << 16
  val DefaultDepth = 4

  // the bloom contract takes the REDUCED base hash (< 2³¹−1): permuted
  // probes must stay under 2⁶² (BloomFilterAgg scaladoc)
  private def keyHash(c: Column): Column = TextHash.baseHash(c.cast("string"))

  /** Per-file (bloom bitset, rows) sidecar for `keyCol` — recompute per
    * layout change, persist like any stats table. */
  def build(
      df: DataFrame,
      keyCol: String,
      numBits: Int = DefaultBits,
      depth: Int = DefaultDepth): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(BloomFilterAggregate.bloom(keyHash(col(keyCol)), numBits, depth)
          .as("bloom"),
        count(lit(1)).as("n_rows"))
      // geometry rides the sidecar: probing with mismatched bits/depth
      // tests the WRONG bit positions — bloom FALSE NEGATIVES, silently
      // missing rows. Probe-side calls validate against these columns.
      .withColumn("num_bits", lit(numBits))
      .withColumn("depth", lit(depth))

  /** Files whose bloom accepts `value` — the planner-side skip. May
    * overapproximate (bloom false positives), never misses a file that
    * holds the key. */
  def candidateFiles(
      stats: DataFrame,
      value: Column,
      numBits: Int = DefaultBits,
      depth: Int = DefaultDepth): Seq[String] = {
    val spark = stats.sparkSession
    import spark.implicits._
    checkGeometry(stats, numBits, depth)
    stats.filter(BloomFilterAggregate.mightContain(
        col("bloom"), keyHash(value), numBits, depth))
      .select(col("file")).as[String].collect().toSeq
  }

  /** A probe with the wrong geometry would produce false NEGATIVES —
    * fail loudly instead (the LshIndex meta-check discipline). Validates
    * EVERY row in one tiny aggregate job: a stats table accidentally
    * unioned from builds with different geometry would pass a first-row
    * check while its mismatched rows silently drop matching files. */
  private def checkGeometry(stats: DataFrame, numBits: Int, depth: Int): Unit = {
    val r = stats.agg(
      countDistinct(struct(col("num_bits"), col("depth"))).as("n_geoms"),
      min(col("num_bits")).as("nb"), min(col("depth")).as("d")).collect()(0)
    if (r.getLong(0) == 0L) return // empty stats table: nothing to prune
    require(r.getLong(0) == 1L,
      s"bloom stats table mixes ${r.getLong(0)} geometries — every row must " +
        "come from one build config; rebuild instead of unioning sidecars")
    require(r.getInt(1) == numBits && r.getInt(2) == depth,
      s"probe geometry ($numBits/$depth) != index geometry " +
        s"(${r.getInt(1)}/${r.getInt(2)})")
  }

  /** Point lookup through the index: scan only accepting files, then the
    * exact predicate removes bloom false positives. */
  def readPoint(
      spark: SparkSession,
      stats: DataFrame,
      keyCol: String,
      value: Column,
      numBits: Int = DefaultBits,
      depth: Int = DefaultDepth): DataFrame = {
    val files = candidateFiles(stats, value, numBits, depth)
    if (files.isEmpty) {
      val one = stats.select(col("file")).limit(1).collect().map(_.getString(0))
      require(one.nonEmpty, "readPoint over an empty bloom-index stats table")
      spark.read.parquet(one.toSeq: _*).limit(0)
    } else {
      spark.read.parquet(files: _*).filter(col(keyCol) === value)
    }
  }
}
