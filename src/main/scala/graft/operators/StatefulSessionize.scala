package graft.operators

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state sessionization via `flatMapGroupsWithState` — the
  * hand-rolled alternative to the engine-native `session_window`
  * ([[StreamingSessionize]]), for when sessions need richer state than an
  * aggregate (carry-over payloads, per-session ML features, early emission
  * rules).
  *
  * State machine per user: an open session extends while events arrive
  * within `gapSeconds` of its end; a bigger gap closes it (emitted
  * immediately) and opens a new one. The open session is emitted when the
  * EVENT-TIME timeout fires — i.e. once the watermark passes session end +
  * gap, at which point no in-order event can extend it. Per-key state is a
  * single fixed-size [[StatefulSessionize.SessionState]]; the watermark
  * bounds total state.
  */
object StatefulSessionize {

  /** `ts` stays a timestamp: the watermarked event-time COLUMN must survive
    * into the stateful operator for event-time timeouts to bind. */
  final case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)

  private def tsUs(t: java.sql.Timestamp): Long =
    t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
  // sum carried as EXACT integer cents (2-decimal inputs): long adds
  // commute, so this state matches Sessionize.batch's cents sum exactly
  // whatever order micro-batches deliver the events in.
  final case class SessionState(startUs: Long, endUs: Long, n: Long, sumCents: Long)
  final case class SessionOut(
      user_id: Long, session_start_us: Long, session_end_us: Long,
      n_events: Long, sum_value: Double)

  /** `events` must carry a watermark on its event-time column when
    * streaming (timeouts are watermark-driven). */
  def sessions(events: Dataset[Ev], gapSeconds: Long = 1800L): Dataset[SessionOut] = {
    val gapUs = gapSeconds * 1000000L
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc   = Encoders.product[SessionOut]
    implicit val longEnc  = Encoders.scalaLong

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[Ev], state: GroupState[SessionState]) =>
          def cents(v: Double): Long = math.rint(v * 100).toLong
          def emit(s: SessionState): SessionOut =
            SessionOut(user, s.startUs, s.endUs, s.n, s.sumCents.toDouble / 100)

          if (state.hasTimedOut) {
            val out = state.getOption.map(emit).iterator
            state.remove()
            out
          } else {
            val sorted = rows.toSeq.sortBy(e => tsUs(e.ts))
            var closed = List.empty[SessionOut]
            var cur    = state.getOption
            for (e <- sorted) {
              val eUs = tsUs(e.ts)
              cur = cur match {
                case Some(s) if eUs - s.endUs <= gapUs =>
                  Some(SessionState(s.startUs, math.max(s.endUs, eUs), s.n + 1, s.sumCents + cents(e.value)))
                case Some(s) =>
                  closed ::= emit(s)
                  Some(SessionState(eUs, eUs, 1, cents(e.value)))
                case None =>
                  Some(SessionState(eUs, eUs, 1, cents(e.value)))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // fire once the watermark proves no event can extend this session
              state.setTimeoutTimestamp(s.endUs / 1000 + gapSeconds * 1000)
            }
            closed.reverseIterator
          }
      }
  }
}
