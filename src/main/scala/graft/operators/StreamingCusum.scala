package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online per-key CUSUM drift detection — the streaming sibling of the
  * batch q198 chart. The textbook recursion S_t = max(0, S_{t−1} + (x_t −
  * µ − κ)) is replaced by its prefix closed form S_t = cum_t − min(0,
  * min_{j≤t} cum_j) (the identity q198 proves under the oracle hash), so
  * state is TWO LONGS per key — the running sum of deviations and its
  * running minimum — no window buffers, no floats, bit-reproducible.
  *
  * Parameters are caller-scaled integers (target µ and slack κ in the
  * value's own units, alarm threshold h likewise), matching q198's
  * den-scaled formulation. Ordering contract is [[StreamingAnomaly]]'s:
  * within a batch rows fold in (ts, eventId) order, so any micro-batch
  * slicing of an event-time-ordered stream yields identical emissions
  * (the spec pins slicing invariance and the recursion equivalence).
  *
  * Late data and state growth: in streaming mode rows below the current
  * watermark are DROPPED before folding (fMGWS does not drop them itself
  * — the [[StreamingFunnel]] lesson; folding one out of order would
  * perturb every subsequent emission for the key). State is 2 longs/key
  * retained forever by default — fine for bounded key domains (event
  * types, device classes); for unbounded keys pass `expireAfterUs` to
  * expire idle keys via event-time timeout (a key re-appearing after
  * expiry restarts its CUSUM from zero — a documented reset, not a bug).
  */
object StreamingCusum {

  // `ts` rides along only to keep the caller's watermark attribute alive
  // through the projection into fMGWS (dropping it would unset the
  // watermark); the fold itself uses the exact-µs `tsUs`.
  final case class Ev(key: String, eventId: Long, ts: java.sql.Timestamp,
                      tsUs: Long, x: Long)
  final case class St(cum: Long, runmin: Long)
  final case class Out(key: String, eventId: Long, s: Long, alarm: Boolean)

  def fold(st: St, dev: Long): St = {
    val c = st.cum + dev
    St(c, math.min(st.runmin, c))
  }

  /** S after the fold: the closed form of max(0, S + dev). */
  def statOf(st: St): Long = st.cum - math.min(st.runmin, 0L)

  /** Streaming (or batch) CUSUM statistics. Input columns: key (string),
    * event_id, ts (timestamp), x (long — pre-scaled by the caller).
    * Emits one row per event with the post-event statistic and the alarm
    * flag (S > threshold). */
  def stats(events: DataFrame, target: Long, slack: Long,
            threshold: Long, expireAfterUs: Option[Long] = None): Dataset[Out] = {
    val spark = events.sparkSession
    import spark.implicits._
    val streaming = events.isStreaming
    // GroupState.getCurrentWatermarkMs THROWS on a stream with no
    // watermark — only consult it when the input plan carries one
    val useWm = streaming && events.queryExecution.analyzed.exists {
      case _: org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark => true
      case _ => false
    }
    // a requested TTL CANNOT be honored without a watermark — failing
    // loudly beats silently retaining unbounded per-key state (the OOM
    // the parameter exists to prevent)
    require(!(streaming && expireAfterUs.isDefined && !useWm),
      "expireAfterUs requires the input stream to carry a watermark " +
        "(withWatermark on ts) — without one, state would never expire")
    val timeout =
      if (useWm && expireAfterUs.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .select(col("key"), col("event_id").as("eventId"), col("ts"),
        unix_micros(col("ts")).as("tsUs"), col("x"))
      .as[Ev]
      .groupByKey(_.key)
      .flatMapGroupsWithState[St, Out](OutputMode.Append(), timeout) {
        (key: String, rows: Iterator[Ev], state: GroupState[St]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.getOrElse(St(0L, 0L))
            val wmUs = if (useWm) state.getCurrentWatermarkMs() * 1000L else 0L
            // drop sub-watermark late rows: folding one would be out of
            // order and corrupt every later emission for this key
            val live = rows.filter(e => !useWm || e.tsUs >= wmUs)
            val sorted = live.toSeq.sortBy(e => (e.tsUs, e.eventId))
            val out = sorted.map { e =>
              st = fold(st, e.x - target - slack)
              val s = statOf(st)
              Out(key, e.eventId, s, s > threshold)
            }
            state.update(st)
            if (useWm) expireAfterUs.foreach { ttl =>
              val lastUs = if (sorted.nonEmpty) sorted.last.tsUs else wmUs
              // must land strictly past the current watermark or fMGWS throws
              state.setTimeoutTimestamp(
                math.max((lastUs + ttl) / 1000L, state.getCurrentWatermarkMs() + 1L))
            }
            out.iterator
          }
      }
  }
}
