package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel tracking — the incremental form of q64's batch funnel
  * (earliest view → first click strictly after it → first purchase strictly
  * after that, per user), over an out-of-order event stream.
  *
  * The hard part is that "first click AFTER the earliest view" is decided
  * against a view minimum that can still DECREASE while late views are in
  * flight — a naive "keep the current winner" state commits too early and
  * cannot repair. This operator keeps, per user, exactly the candidate set
  * a late arrival could still promote, pruned by two watermark-sound rules
  * (xs ascending, `wm` = current watermark in µs, `sup` = the stage
  * anchor's current value — an upper bound on its final value, since view
  * minima and chosen clicks only decrease as data arrives):
  *
  *   - FLOOR: drop x ≤ min(sup, wm). A candidate must be STRICTLY after
  *     its final anchor, and the anchor can end no lower than the smaller
  *     of its current value and the watermark (older anchor events can no
  *     longer arrive).
  *   - DOMINATION: drop x if some x' < x has x' > sup. Whenever x is
  *     eligible (anchor < x), x' is also eligible (anchor ≤ sup < x' < x)
  *     and wins.
  *
  * What survives is every candidate ≤ sup (each could win for a different
  * final anchor) plus ONE candidate above sup — so state is O(events
  * within the watermark horizon) per user and collapses to three longs
  * once the watermark passes the funnel, never O(history).
  *
  * Emission: one row per user per micro-batch in which its funnel
  * changed (downstream keeps the latest row per user). On BATCH datasets
  * the operator runs once per user over all rows — exact q64 semantics,
  * which the spec checks against the batch implementation directly.
  */
object StreamingFunnel {

  final case class Ev(userId: Long, tsMicros: Long, eventType: String, eventTime: Timestamp)
  final case class Funnel(
      userId: Long, viewUs: Option[Long], clickUs: Option[Long],
      purchaseUs: Option[Long], stage: Int)

  /** Candidate lists are ascending; `minView` is exact for data seen. */
  final case class St(minView: Option[Long], clicks: List[Long], purchases: List[Long])

  private def insertAsc(xs: List[Long], x: Long): List[Long] = {
    val (lo, hi) = xs.span(_ < x)
    if (hi.headOption.contains(x)) xs else lo ::: (x :: hi)
  }

  /** FLOOR + DOMINATION prune of an ascending candidate list. */
  private def prune(xs: List[Long], wm: Long, sup: Option[Long]): List[Long] = {
    val floor = math.min(sup.getOrElse(Long.MaxValue), wm)
    val alive = xs.filter(_ > floor)
    sup match {
      case None => alive // no anchor yet: any candidate may end up chosen
      case Some(s) =>
        val (under, over) = alive.partition(_ <= s)
        under ::: over.take(1)
    }
  }

  /** min candidate strictly above the anchor — the stage's current winner. */
  private def chosen(anchor: Option[Long], xs: List[Long]): Option[Long] =
    anchor.flatMap(a => xs.find(_ > a))

  private def resolve(userId: Long, st: St): Funnel = {
    val click = chosen(st.minView, st.clicks)
    val purchase = chosen(click, st.purchases)
    Funnel(userId, st.minView, click, purchase,
      1 + (if (click.isDefined) 1 else 0) + (if (purchase.isDefined) 1 else 0))
  }

  /** Only users with at least one view have a funnel (q64 starts from v). */
  def track(events: Dataset[Ev], watermark: String = "1 hour"): Dataset[Funnel] = {
    val spark = events.sparkSession
    import spark.implicits._
    val streaming = events.isStreaming
    val withWm = if (streaming) events.withWatermark("eventTime", watermark) else events

    withWm
      .groupByKey(_.userId)
      .flatMapGroupsWithState[St, Funnel](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Ev], state: GroupState[St]) =>
          val before = state.getOption.getOrElse(St(None, Nil, Nil))
          var st = before
          val wmIn = if (streaming) state.getCurrentWatermarkMs() * 1000L else 0L
          // flatMapGroupsWithState does NOT drop late input itself; honoring
          // the watermark here keeps emissions monotone-stable and makes the
          // FLOOR prune sound (a pruned candidate can never be re-offered)
          val live = if (streaming) rows.filter(_.tsMicros >= wmIn) else rows
          for (e <- live) e.eventType match {
            case "view" =>
              if (st.minView.forall(e.tsMicros < _)) st = st.copy(minView = Some(e.tsMicros))
            case "click" => st = st.copy(clicks = insertAsc(st.clicks, e.tsMicros))
            case "purchase" => st = st.copy(purchases = insertAsc(st.purchases, e.tsMicros))
            case _ => ()
          }
          val wm = wmIn
          val cls = prune(st.clicks, wm, st.minView)
          st = St(st.minView, cls, prune(st.purchases, wm, chosen(st.minView, cls)))
          state.update(st)
          val out = resolve(userId, st)
          val outBefore = resolve(userId, before)
          if (st.minView.isDefined && (out != outBefore || before == St(None, Nil, Nil)))
            Iterator.single(out)
          else Iterator.empty
      }
  }
}
