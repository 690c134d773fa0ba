package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online per-key outlier detection — the streaming sibling of the batch
  * q68 2σ flag, with PREFIX semantics: each event is judged against the
  * statistics of the events seen so far for its key (what an online
  * monitor can actually know), not the full-history stats the batch
  * retrospective uses.
  *
  * The decision reuses q68's exact integer algebra on prefix moments:
  *
  *   outlier(x) ⇔ (n·x − S)²·(n−1) > 4·n·(n·Q − S²)    over (n, S, Q) longs
  *
  * so state is THREE LONGS per key — no window buffers, no floats, and the
  * verdicts are bit-reproducible (the spec replays the same longs in plain
  * Scala). The comparison runs in BigInt: the products reach n³·x² and a
  * hot key overflows int64 within ~10³ events, exactly like the batch
  * form's decimal(38,0) cast.
  *
  * `flatMapGroupsWithState` processes each micro-batch's rows; WITHIN a
  * batch, rows are folded in (ts, eventId) order — Spark does not order
  * the iterator — so replaying a stream in any micro-batch slicing yields
  * the same verdicts as long as delivery is in event-time order per key
  * (late rows are judged against the state they actually meet: that IS
  * online semantics; the spec pins both properties).
  */
object StreamingAnomaly {

  final case class Ev(userId: Long, eventId: Long, tsUs: Long, cents: Long)
  final case class Moments(n: Long, s: Long, q: Long)
  final case class Verdict(userId: Long, eventId: Long, nBefore: Long, isOutlier: Boolean)

  /** Pure decision: is `x` a 2σ outlier of the PRIOR moments? (needs ≥ 2
    * prior events, mirroring q68's n >= 2 filter). */
  def isOutlier(m: Moments, x: Long): Boolean = {
    if (m.n < 2) false
    else {
      val n = BigInt(m.n); val s = BigInt(m.s); val q = BigInt(m.q)
      val dev = n * x - s
      dev * dev * (n - 1) > BigInt(4) * n * (n * q - s * s)
    }
  }

  def fold(m: Moments, x: Long): Moments =
    Moments(m.n + 1, m.s + x, m.q + x * x)

  /** Streaming (or batch) verdicts. Input columns: user_id, event_id, ts
    * (timestamp), value (double, nullable — nulls skipped like q68). */
  def verdicts(events: DataFrame): Dataset[Verdict] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .filter(col("value").isNotNull)
      .select(col("user_id").as("userId"), col("event_id").as("eventId"),
        unix_micros(col("ts")).as("tsUs"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[Ev]
      .groupByKey(_.userId)
      .flatMapGroupsWithState[Moments, Verdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[Ev], state: GroupState[Moments]) =>
          var m = state.getOption.getOrElse(Moments(0L, 0L, 0L))
          val out = rows.toSeq.sortBy(e => (e.tsUs, e.eventId)).map { e =>
            val v = Verdict(user, e.eventId, m.n, isOutlier(m, e.cents))
            m = fold(m, e.cents)
            v
          }
          state.update(m)
          out.iterator
      }
  }
}
