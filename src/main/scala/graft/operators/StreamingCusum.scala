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
  */
object StreamingCusum {

  final case class Ev(key: String, eventId: Long, tsUs: Long, x: Long)
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
            threshold: Long): Dataset[Out] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("key"), col("event_id").as("eventId"),
        unix_micros(col("ts")).as("tsUs"), col("x"))
      .as[Ev]
      .groupByKey(_.key)
      .flatMapGroupsWithState[St, Out](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[Ev], state: GroupState[St]) =>
          var st = state.getOption.getOrElse(St(0L, 0L))
          val out = rows.toSeq.sortBy(e => (e.tsUs, e.eventId)).map { e =>
            st = fold(st, e.x - target - slack)
            val s = statOf(st)
            Out(key, e.eventId, s, s > threshold)
          }
          state.update(st)
          out.iterator
      }
  }
}
