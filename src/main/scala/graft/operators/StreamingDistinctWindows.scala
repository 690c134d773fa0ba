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
  * Streaming-safe by construction: window membership is a STATELESS
  * explode — each event at time t belongs to the `nSlides` sliding
  * windows starting at (t div slide − i)·slide, i < nSlides (window
  * length = nSlides·slide, epoch-aligned) — and the only stateful
  * operator is ONE grouped aggregation whose buffer is the bounded
  * [[graft.functions.KmvSketch]] set (dedup INSIDE the aggregate). The
  * identical plan runs in batch, which is how the q234 oracle checks it;
  * streaming parity under arbitrary micro-batch slicing is spec-proven
  * (sketch union + trim is order-insensitive).
  *
  * At scale: the explode multiplies the input by nSlides (the standard
  * sliding-window cost — keep nSlides small, e.g. 4–8), the shuffle
  * carries one ≤k-long buffer per (partition, live window), and with a
  * watermark Spark retires window state as event time passes.
  */
object StreamingDistinctWindows {

  /** 2^53 — hash domain: (k−1)·M stays in int64 for k ≤ 1024, and every
    * hash is double-exact (the q143 constants). */
  val M: Long = 9007199254740992L

  /** The q143-compatible KMV hash of an id. */
  def kmvHash(id: Column): Column =
    pmod(TextHash.md5Long(concat(lit("kmv:"), id.cast("string"))), lit(M))

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
      .select(unix_micros(col(tsCol)).as("us"), kmvHash(col(idCol)).as("h"))
      .select(explode(sequence(lit(0), lit(nSlides - 1))).as("i"),
        col("us"), col("h"))
      .select(expr(s"(us div $slideUs - i) * $slideUs").as("ws_us"), col("h"))
      .groupBy(col("ws_us"))
      .agg(graft.functions.KmvAggregate.kmv(col("h"), k).as("sk"))
      .withColumn("kth_min",
        when(size(col("sk")) >= k, element_at(col("sk"), k)))
      .select(col("ws_us"),
        size(col("sk")).cast("long").as("n_sketch"),
        col("kth_min"),
        when(size(col("sk")) < k, size(col("sk")).cast("long"))
          .otherwise(expr(s"${num}L div kth_min")).as("est_distinct"))
  }
}
