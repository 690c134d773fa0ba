package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Watermark-ORDERED transition extraction — the streaming form of the
  * q72/q293 per-user lag window, and the primitive those models need to
  * run on live traffic: consecutive (prev → next) event pairs in exact
  * (ts, event_id) order, emitted from an out-of-order stream.
  *
  * A lag window needs its partition SORTED; a stream delivers disorder.
  * The operator buffers each user's in-horizon events and DRAINS in
  * (ts, id) order exactly the prefix with ts < watermark: any unseen
  * event the watermark still admits has ts ≥ watermark, so it cannot
  * precede — or land between — drained events, making every emitted
  * transition FINAL under any micro-batch slicing and any admissible
  * disorder (the StreamingDebounce soundness argument, applied to order
  * itself). The first event of a user emits from the 'START' state, so
  * the output is exactly the q293 attribution model's input.
  *
  * State per user = the last drained event's type (one field) + the
  * pending suffix (watermark-horizon-bounded, never full history).
  * Duplicate deliveries collapse on insert; sub-watermark rows are
  * dropped explicitly (fMGWS does not drop them for us — a late row
  * behind an already-emitted transition would rewrite history). */
object StreamingTransitions {

  final case class Ev(userId: Long, eventId: Long, tsUs: Long,
                      eventType: String, eventTime: Timestamp)
  final case class Transition(userId: Long, fromType: String, toType: String,
                              tsUs: Long)
  /** Public, List/primitive fields only (the fMGWS state-encoder rule). */
  final case class St(hasLast: Boolean, lastType: String,
                      pendUs: List[Long], pendId: List[Long],
                      pendType: List[String])

  def transitions(events: Dataset[Ev],
                  watermark: String = "1 hour"): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    val streaming = events.isStreaming
    val withWm =
      if (streaming) events.withWatermark("eventTime", watermark) else events
    withWm
      .groupByKey(_.userId)
      .flatMapGroupsWithState[St, Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[Ev], state: GroupState[St]) =>
          val st = state.getOption.getOrElse(St(hasLast = false, "", Nil, Nil, Nil))
          val wm = if (streaming) state.getCurrentWatermarkMs() * 1000L else Long.MaxValue
          val incoming = rows
            .filter(e => !streaming || e.tsUs >= wm)
            .map(e => (e.tsUs, e.eventId, e.eventType)).toSeq
          val pending = (st.pendUs.lazyZip(st.pendId).lazyZip(st.pendType).toList
            ++ incoming).distinct.sortBy(t => (t._1, t._2))
          // drain the prefix the watermark has sealed: nothing can precede
          // or interleave it anymore
          val (sealed0, open) = pending.partition(_._1 < wm)
          var last = if (st.hasLast) Some(st.lastType) else None
          val out = sealed0.map { case (us, _, tpe) =>
            val t = Transition(user, last.getOrElse("START"), tpe, us)
            last = Some(tpe)
            t
          }
          state.update(St(last.isDefined, last.getOrElse(""),
            open.map(_._1), open.map(_._2), open.map(_._3)))
          out.iterator
      }
  }
}
