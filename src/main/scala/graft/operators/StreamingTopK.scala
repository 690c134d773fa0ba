package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.{MisraGries, TextHash}

/** Continuous heavy hitters — the streaming sibling of the batch q97
  * Misra–Gries aggregate, sharded for state locality: items are routed to
  * `buckets` shards by the portable md5 hash, and each shard folds ITS
  * substream into one bounded MG table (≤ k entries) held in
  * `flatMapGroupsWithState` state. Because an item belongs to exactly one
  * shard, the shard summaries never overlap and [[merged]] is a plain
  * union — each item's estimate carries only its OWN shard's undercount,
  *
  *   true_count − n_shard/(k+1)  ≤  est  ≤  true_count
  *
  * which is TIGHTER than one global table of the same per-shard capacity
  * (total state B·k entries, error n_b/(k+1) instead of n/(k+1)). The
  * guarantee is micro-batch-slicing-INVARIANT: folding a shard's
  * substream through state in any batch slicing is still one sequential
  * MG pass over that substream, so the bound — proved for arbitrary
  * orders — holds after every batch (the summary CONTENTS may differ by
  * slicing; the spec pins the invariant, not the incidental table).
  *
  * Output mode Update: each micro-batch re-emits the summaries of the
  * shards it touched; downstream keeps the latest row per shard.
  */
object StreamingTopK {

  final case class In(bucket: Int, item: String)
  final case class Entry(item: String, est: Long)
  final case class ShardSummary(bucket: Int, nSeen: Long, entries: Seq[Entry])

  // state carries the counter table as a List of pairs — a Map-typed
  // field (or a private state class) breaks the state encoder's codegen
  final case class St(n: Long, counters: List[(String, Long)])

  /** Shard router: portable md5 of the item, mod `buckets` — replayable
    * anywhere (same primitive as every oracle-locked hash here). */
  def withBucket(items: DataFrame, itemCol: String, buckets: Int): DataFrame =
    items.select(
      (TextHash.md5Long(col(itemCol)) % buckets).cast("int").as("bucket"),
      col(itemCol).cast("string").as("item"))

  /** Streaming (or batch) per-shard summaries. Input: any relation with
    * `itemCol`; non-null items only. */
  def summaries(items: DataFrame, itemCol: String, k: Int, buckets: Int): Dataset[ShardSummary] = {
    val spark = items.sparkSession
    import spark.implicits._
    withBucket(items.filter(col(itemCol).isNotNull), itemCol, buckets)
      .as[In]
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[St, ShardSummary](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (bucket: Int, rows: Iterator[In], state: GroupState[St]) =>
          val prev = state.getOption.getOrElse(St(0L, Nil))
          val buf = mutable.HashMap.from(prev.counters)
          var n = prev.n
          rows.foreach { r => MisraGries.observe(buf, r.item, k); n += 1 }
          val sorted = buf.toList.sortBy { case (i, c) => (-c, i) }
          state.update(St(n, sorted))
          Iterator.single(ShardSummary(bucket, n,
            sorted.map { case (i, c) => Entry(i, c) }))
      }
  }

  /** Union of the latest shard summaries (shards are disjoint by
    * construction, so this is exact concatenation, not an MG merge). */
  def merged(latest: Seq[ShardSummary]): Seq[Entry] =
    latest.flatMap(_.entries).sortBy(e => (-e.est, e.item))
}
