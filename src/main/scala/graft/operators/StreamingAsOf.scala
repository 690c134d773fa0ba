package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment — the stateful third leg of the as-of story
  * (batch window composition: [[AsOfJoin.latestPrior]]; custom physical
  * merge: [[AsOfJoin.latestPriorMerge]]). Facts are enriched with the
  * LATEST dimension version at-or-before their event time, the
  * feature-store / slowly-changing-dimension pattern: a low-rate dimension
  * update stream joined onto a high-rate fact stream.
  *
  * Spark's built-in stream-stream joins need a time-RANGE condition (state
  * eviction demands a bound), which cannot express "latest prior, however
  * old" — a key may update its dimension once a year and still enrich every
  * fact. `flatMapGroupsWithState` holds exactly the state this needs: the
  * per-key version list, truncated at the watermark to ONE floor version +
  * the in-horizon tail, so state is O(updates within the watermark horizon)
  * per key, not O(history).
  *
  * Semantics & caveats:
  *   - inclusive: a dim version at exactly the fact's timestamp wins (same
  *     tie rule as the batch operator, which sorts dim rows first);
  *   - within a micro-batch, rows process in event-time order, so
  *     out-of-order arrivals INSIDE a batch enrich correctly;
  *   - a dim version that arrives in a LATER micro-batch than a fact it
  *     should have enriched cannot retro-correct the emitted row (append
  *     mode) — the standard streaming trade; bound the error with the
  *     watermark you feed the source.
  *
  * Run on BATCH datasets the operator degenerates to one invocation per key
  * over all rows in event-time order — i.e. exact as-of semantics, which
  * the spec checks against [[AsOfJoin.latestPrior]].
  */
object StreamingAsOf {

  final case class DimUpdate(key: Long, tsMicros: Long, value: Double)
  final case class Fact(key: Long, tsMicros: Long, payload: Double)
  final case class Enriched(
      key: Long, tsMicros: Long, payload: Double,
      asofTs: Option[Long], asofValue: Option[Double])

  /** Internal union row — public only because encoder codegen must reach it. */
  final case class Tagged(
      key: Long, tsMicros: Long, isDim: Boolean, value: Double, eventTime: Timestamp)

  /** Dimension versions per key, ascending event time. */
  private type Versions = List[(Long, Double)]

  def enrich(
      facts: Dataset[Fact],
      dims: Dataset[DimUpdate],
      watermark: String = "1 hour"): Dataset[Enriched] = {
    val spark: SparkSession = facts.sparkSession
    import spark.implicits._

    def toTagged(key: Long, ts: Long, isDim: Boolean, v: Double) =
      Tagged(key, ts, isDim, v, new Timestamp(ts / 1000L))
    val tagged = facts.map(f => toTagged(f.key, f.tsMicros, isDim = false, f.payload))
      .unionByName(dims.map(u => toTagged(u.key, u.tsMicros, isDim = true, u.value)))
    val streaming = tagged.isStreaming
    val withWm =
      if (streaming) tagged.withWatermark("eventTime", watermark) else tagged

    withWm
      .groupByKey(_.key)
      .flatMapGroupsWithState[Versions, Enriched](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[Tagged], state: GroupState[Versions]) =>
          var versions: Versions = state.getOption.getOrElse(Nil)
          val out = scala.collection.mutable.ArrayBuffer.empty[Enriched]
          // event-time order; dims first at equal timestamps (inclusive)
          for (e <- rows.toSeq.sortBy(t => (t.tsMicros, if (t.isDim) 0 else 1))) {
            if (e.isDim) {
              // insert keeping ascending order (late dims within the batch)
              val (before, after) = versions.partition(_._1 <= e.tsMicros)
              versions = before ::: ((e.tsMicros, e.value) :: after)
            } else {
              val floor = versions.foldLeft(Option.empty[(Long, Double)]) {
                (acc, ver) => if (ver._1 <= e.tsMicros) Some(ver) else acc
              }
              out += Enriched(key, e.tsMicros, e.value, floor.map(_._1), floor.map(_._2))
            }
          }
          // evict: facts below the watermark can no longer arrive, so only
          // the LATEST version at-or-below it stays (as the floor for the
          // next in-horizon fact) plus everything newer. (Batch mode has no
          // watermark — and no next batch to keep state for.)
          val wmMicros = if (streaming) state.getCurrentWatermarkMs() * 1000L else 0L
          if (wmMicros > 0L) {
            val (below, above) = versions.partition(_._1 <= wmMicros)
            versions = below.takeRight(1) ::: above
          }
          if (versions.nonEmpty) state.update(versions)
          out.iterator
      }
  }
}
