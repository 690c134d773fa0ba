package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextHash

/** Sliding-window distinct-id panels WITHOUT exact distinct state — the
  * streaming "hourly/daily unique users" dashboard primitive.
  *
  * Exact sliding distinct counts need per-(window, id) state (Spark
  * forbids distinct aggregates in streaming aggregations outright, and a
  * pre-window dropDuplicates would be a second stateful operator whose
  * state is the full id universe × live windows). A KMV sketch per window
  * caps state at k longs per live window instead, with the q143 estimator
  * giving exact counts below k and a (k−1)·M/h₍k₎ estimate above.
  *
  * Streaming-safe by construction: the grouping key is Spark's own
  * `window()` column (sliding: length nSlides·slide, epoch-aligned slide
  * — each event lands in its nSlides covering windows), so the EVENT-TIME
  * metadata survives into the aggregation: with an upstream watermark
  * Spark retires window state as event time passes and append mode is
  * legal. (Grouping on a derived epoch long would strip that metadata and
  * grow state forever — the exact unbounded-state problem this operator
  * exists to avoid.) The only stateful operator is that ONE grouped
  * aggregation, whose buffer is the bounded [[graft.functions.KmvSketch]]
  * set (dedup INSIDE the aggregate). The identical plan runs in batch,
  * which is how the q234 oracle checks it — `window()`'s start for slide
  * s is `(t div s − i)·s`, the replayable integer form; streaming parity
  * under arbitrary micro-batch slicing is spec-proven (sketch union +
  * trim is order-insensitive).
  *
  * At scale: the window expansion multiplies the input by nSlides (the
  * standard sliding-window cost — keep nSlides small, e.g. 4–8) and the
  * shuffle carries one ≤k-long buffer per (partition, live window).
  */
object StreamingDistinctWindows {

  /** The shared KMV hash domain ([[TextHash.KmvM]] — single source). */
  val M: Long = TextHash.KmvM

  /** The shared KMV id hash (same salt/domain as every q143-family
    * sketch, so sketches from this operator merge with theirs). */
  def kmvHash(id: Column): Column = TextHash.kmvHash(id)

  /** Per sliding window `(ws_us, n_sketch, kth_min, est_distinct)`:
    * window start in epoch µs, sketch fill, the k-th minimum hash (null
    * below k), and the integer cardinality estimate (exact when the
    * sketch holds the whole set). Same relation for batch and streams;
    * streaming callers add `withWatermark` upstream and an output mode. */
  def sketchPerWindow(
      events: DataFrame,
      tsCol: String,
      idCol: String,
      slideUs: Long,
      nSlides: Int,
      k: Int): DataFrame = {
    require(slideUs > 0 && nSlides >= 1 && k >= 2, "bad window/sketch params")
    val num = (k - 1).toLong * M
    require(num / M == (k - 1).toLong, s"(k-1)*M overflows int64 for k=$k")
    events
      .select(col(tsCol).as("__ts"), kmvHash(col(idCol)).as("h"))
      // group on window() itself — the event-time attribute the watermark
      // machinery recognizes — never on a derived epoch long
      .groupBy(window(col("__ts"),
        s"${slideUs * nSlides} microseconds", s"$slideUs microseconds").as("w"))
      .agg(graft.functions.KmvAggregate.kmv(col("h"), k).as("sk"))
      .select(unix_micros(col("w.start")).as("ws_us"), col("sk"))
      .withColumn("kth_min",
        when(size(col("sk")) >= k, element_at(col("sk"), k)))
      .select(col("ws_us"),
        size(col("sk")).cast("long").as("n_sketch"),
        col("kth_min"),
        when(size(col("sk")) < k, size(col("sk")).cast("long"))
          .otherwise(expr(s"${num}L div kth_min")).as("est_distinct"))
  }
}
