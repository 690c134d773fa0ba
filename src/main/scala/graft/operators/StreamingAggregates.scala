package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Watermarked windowed aggregation over an event stream — the standard
  * Structured Streaming shape: `readStream → withWatermark → groupBy(window)
  * → agg → writeStream`. Works identically on batch DataFrames (minus the
  * watermark), which is how the oracle-checked batch query exercises the
  * same plan.
  */
object StreamingAggregates {

  /** Tumbling-window counts/sums per key. On a streaming input, rows later
    * than `watermark` behind the max event time are dropped and windows
    * finalize (append-mode emission) once the watermark passes their end. */
  def tumbling(
      events: DataFrame,
      tsCol: String = "ts",
      keyCol: String = "event_type",
      windowLength: String = "1 hour",
      watermark: Option[String] = Some("2 hours")): DataFrame = {
    val in = watermark.fold(events)(w => events.withWatermark(tsCol, w))
    in.groupBy(window(col(tsCol), windowLength), col(keyCol))
      // exact-cents sum (2-decimal inputs): long adds commute, so the
      // incremental streaming state and any batch scan order agree exactly
      .agg(count(lit(1)).as("n_events"),
        (sum(round(col("value") * 100).cast("long")).cast("double") / 100)
          .as("sum_value"))
      .select(
        unix_micros(col("window.start")).as("window_start_us"),
        col(keyCol), col("n_events"), col("sum_value"))
  }

  /** OHLC bars per tumbling window — the streaming dual of q242: open and
    * close ride min/max-of-struct aggregates ((us, id, cents) with a
    * unique id ⇒ the lexicographic extreme IS the deterministic first/last
    * row), high/low/volume are plain integer aggregates. All five are
    * order-insensitive, so a streaming run under ANY micro-batch slicing
    * equals the batch run exactly (spec-proven); grouping on `window()`
    * keeps the event-time attribute, so a watermark finalizes bars in
    * append mode. */
  def ohlcBars(
      events: DataFrame,
      tsCol: String = "ts",
      idCol: String = "event_id",
      valueCol: String = "value",
      windowLength: String = "1 hour",
      watermark: Option[String] = Some("2 hours")): DataFrame = {
    val in = watermark.fold(events)(w => events.withWatermark(tsCol, w))
    in.filter(col(valueCol).isNotNull)
      .select(col(tsCol).as("__ts"), unix_micros(col(tsCol)).as("us"),
        col(idCol).as("id"), round(col(valueCol) * 100).cast("long").as("cents"))
      .groupBy(window(col("__ts"), windowLength))
      .agg(
        min(struct(col("us"), col("id"), col("cents")))
          .getField("cents").as("open_cents"),
        max(col("cents")).as("high_cents"),
        min(col("cents")).as("low_cents"),
        max(struct(col("us"), col("id"), col("cents")))
          .getField("cents").as("close_cents"),
        count(lit(1)).as("n_events"),
        sum(col("cents")).as("vol_cents"))
      .select(unix_micros(col("window.start")).as("hour_us"),
        col("open_cents"), col("high_cents"), col("low_cents"),
        col("close_cents"), col("n_events"), col("vol_cents"))
  }

  /** Fixed-bin value histogram per tumbling window — the only percentile
    * shape that is append-mode-LEGAL on a stream: bin assignment is
    * stateless map-side math and the windowed (window, bin) count is the
    * ONE stateful aggregation; the rank scan over the ≤ nBins rows of a
    * finalized window happens downstream ([[percentileFromBins]]) — on
    * the sink table for a stream, in the same plan for batch. Bin edges
    * are fixed a priori (binWidthCents, last bin open-ended via clamp),
    * so the histogram is deterministic and the percentile estimate (bin
    * lower edge) replays exactly in any engine — resolution is a design
    * constant, never data-dependent (no two-pass range fit, which a
    * stream cannot do anyway). State per live window: ≤ nBins longs. */
  def binnedHistogram(
      events: DataFrame,
      tsCol: String = "ts",
      valueCol: String = "value",
      windowLength: String = "6 hours",
      binWidthCents: Long = 500L,
      nBins: Int = 128,
      watermark: Option[String] = Some("2 hours")): DataFrame = {
    val in = watermark.fold(events)(w => events.withWatermark(tsCol, w))
    in.filter(col(valueCol).isNotNull)
      .select(col(tsCol).as("__ts"),
        least(expr(s"CAST(round($valueCol * 100) AS BIGINT) div $binWidthCents"),
          lit(nBins - 1L)).as("bin"))
      .groupBy(window(col("__ts"), windowLength), col("bin"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("bin"), col("cnt"))
  }

  /** Percentile extraction from [[binnedHistogram]] output: for each
    * requested percentile q, the smallest bin whose cumulative count
    * reaches rank ceil(q·n/100) — integer arithmetic only. The window
    * function partitions on the window key over ≤ nBins rows, bounded by
    * the DESIGN constant, never by data. */
  def percentileFromBins(
      bins: DataFrame, qs: Seq[Int], binWidthCents: Long = 500L): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy(col("window_start_us")).orderBy(col("bin"))
    // n via a full-frame window over the same ≤ nBins partition — no
    // self-join (re-joining an aggregate of `bins` onto `bins` trips
    // conflicting-reference resolution on streaming-sink lineages)
    val cum = bins
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(
        W.partitionBy(col("window_start_us"))
          .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)))
    val aggs = qs.flatMap { q =>
      val rank = expr(s"($q * n + 99) div 100")
      val bin = min(when(col("cum") >= rank, col("bin")))
      Seq(bin.as(s"p${q}_bin"), (bin * binWidthCents).as(s"p${q}_lo_cents"))
    }
    cum.groupBy(col("window_start_us"), col("n")).agg(aggs.head, aggs.tail: _*)
  }

  /** DuckDB oracle for the batch form of [[tumbling]] (epoch-aligned hourly
    * buckets — Spark's `window()` aligns to the epoch too). */
  def tumblingOracleSql(
      table: String = "events",
      tsCol: String = "ts",
      keyCol: String = "event_type",
      windowMicros: Long = 3600L * 1000000L): String =
    s"""SELECT (epoch_us($tsCol) // $windowMicros) * $windowMicros AS window_start_us,
       |  $keyCol, count(*) AS n_events,
       |  (sum(CAST(round(value * 100) AS BIGINT))::DOUBLE / 100) AS sum_value
       |FROM $table GROUP BY 1, 2""".stripMargin
}
