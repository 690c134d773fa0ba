package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming burst debounce — the incremental form of q132's batch island
  * numbering: events of one (user, type) key closer than `gapUs` to their
  * predecessor belong to one burst; the operator emits each burst exactly
  * once, when it can no longer change.
  *
  * Finalization is WATERMARK-SOUND: a burst whose last event L satisfies
  * L + gap < watermark is closed — any event that could still attach (or
  * bridge it to a later burst) would need ts ≤ L + gap < watermark, which
  * the watermark forbids; and no future event can land before the burst
  * either (its start is even older). So emitted bursts are FINAL under any
  * micro-batch slicing and any out-of-order delivery the watermark admits
  * — the spec replays randomized slicings against the batch islands.
  *
  * State per key is the pending suffix: events not yet finalized — bounded
  * by the watermark horizon × event rate (never full history); duplicate
  * deliveries of one event id collapse on insert. Below-watermark input is
  * dropped explicitly (flatMapGroupsWithState does not do it for us) —
  * admitting a late row behind an already-emitted burst would rewrite
  * history that downstream consumers already acted on.
  */
object StreamingDebounce {

  final case class Ev(userId: Long, eventType: String, eventId: Long,
                      tsUs: Long, eventTime: Timestamp)
  final case class Burst(userId: Long, eventType: String,
                         startUs: Long, endUs: Long, len: Int)
  /** Public + List-of-primitives fields: a private case class (or a Map
    * field) as fMGWS state breaks the state encoder's janino codegen. */
  final case class St(pendTs: List[Long], pendId: List[Long])

  /** Islands of an ascending (ts, id) list under the gap rule. */
  def islands(evs: Seq[(Long, Long)], gapUs: Long): Seq[Seq[(Long, Long)]] = {
    if (evs.isEmpty) return Seq.empty
    val out = Seq.newBuilder[Seq[(Long, Long)]]
    var cur = List(evs.head)
    for (e <- evs.tail) {
      if (e._1 - cur.head._1 <= gapUs) cur = e :: cur
      else { out += cur.reverse; cur = List(e) }
    }
    out += cur.reverse
    out.result()
  }

  def bursts(events: Dataset[Ev], gapUs: Long,
             watermark: String = "1 hour"): Dataset[Burst] = {
    val spark = events.sparkSession
    import spark.implicits._
    val streaming = events.isStreaming
    val withWm = if (streaming) events.withWatermark("eventTime", watermark) else events

    withWm
      .groupByKey(e => (e.userId, e.eventType))
      .flatMapGroupsWithState[St, Burst](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: (Long, String), rows: Iterator[Ev], state: GroupState[St]) =>
          val st = state.getOption.getOrElse(St(Nil, Nil))
          val wm = if (streaming) state.getCurrentWatermarkMs() * 1000L else Long.MaxValue
          // merge new (non-late, deduped) events into the pending set
          val incoming = rows.filter(e => !streaming || e.tsUs >= wm)
            .map(e => (e.tsUs, e.eventId)).toSeq
          val pending =
            (st.pendTs.zip(st.pendId) ++ incoming).distinct.sorted
          // batch mode: everything finalizes (wm = +inf closes every island)
          val isl = islands(pending, gapUs)
          val (closed, open) = isl.partition(b => b.last._1 + gapUs < wm)
          val keep = open.flatten
          state.update(St(keep.map(_._1).toList, keep.map(_._2).toList))
          closed.iterator.map(b =>
            Burst(key._1, key._2, b.head._1, b.last._1, b.length))
      }
  }
}
