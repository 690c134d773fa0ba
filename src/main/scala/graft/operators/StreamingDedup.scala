package graft.operators

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact deduplication with explicit keyed state — the
  * `flatMapGroupsWithState` member of the operator inventory.
  *
  * Emits only the FIRST record ever seen per key, across micro-batches.
  * State per key is a single boolean, so the state store stays tiny; for
  * unbounded key spaces swap `NoTimeout` for an event-time timeout so old
  * keys age out with the watermark (at 100 TB/day of events, unbounded
  * first-seen state is a leak — bound it by the dedup horizon you actually
  * need). Spark's built-in `dropDuplicates` covers the simple case; this
  * operator is the template for richer custom state (counters, payloads,
  * session carry-over).
  */
object StreamingDedup {

  def firstSeen[T: Encoder, K: Encoder](ds: Dataset[T])(key: T => K): Dataset[T] = {
    implicit val boolEnc: Encoder[Boolean] = org.apache.spark.sql.Encoders.scalaBoolean
    ds.groupByKey(key)
      .flatMapGroupsWithState[Boolean, T](OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: K, rows: Iterator[T], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            rows.take(1) // first occurrence within this batch wins, rest drop
          }
      }
  }
}
