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
