package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.functions.Md5LongUtil

/** Weighted sampling over an unbounded stream — the streaming dual of
  * [[WeightedSample]] (exact-k without replacement, Efraimidis–Spirakis
  * distribution, zero float `pow`).
  *
  * Each record's race key is the min of `weight` md5 trials
  * ([[Md5LongUtil.minTrial]]); keeping the k SMALLEST keys per group is
  * exactly A-ExpJ's reservoir semantics, but deterministic: the key is a
  * pure function of (id, weight), so stream and batch agree bit-for-bit,
  * replays are no-ops (exactly-once sample), and arrival order cannot
  * matter (min-of-trials keys union like bottom-k sketches).
  *
  * State per group is a bounded k-entry list. Weight must be a STABLE
  * property of the id (the first observation wins; a later record with the
  * same id is ignored whatever weight it claims — the guard that keeps
  * replayed batches idempotent).
  */
object StreamingWeightedSample {

  final case class Rec(key: String, id: Long, weight: Long)
  final case class Sample(key: String, ids: Seq[Long])

  private def raceKey(id: Long, w: Long): Long =
    Md5LongUtil.minTrial(
      org.apache.spark.unsafe.types.UTF8String.fromString(id.toString),
      w, WeightedSample.Mod)

  /** Current weighted k-sample per key after each micro-batch (update mode). */
  def sampled(records: Dataset[Rec], k: Int): Dataset[Sample] = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = records.sparkSession
    import spark.implicits._
    records
      .groupByKey(_.key)
      .mapGroupsWithState[List[(Long, Long)], Sample](
        GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[Rec], state: GroupState[List[(Long, Long)]]) =>
          var best = state.getOption.getOrElse(Nil) // (raceKey, id), ascending
          val ord = Ordering.Tuple2[Long, Long]
          rows.foreach { r =>
            // id-level set semantics: an id already sampled OR already
            // evicted re-arriving is a no-op (its key recomputes identically)
            if (!best.exists(_._2 == r.id)) {
              val cand = (raceKey(r.id, r.weight), r.id)
              if (best.length < k || ord.lt(cand, best.last)) {
                best = (cand :: best).sorted(ord).take(k)
              }
            }
          }
          state.update(best)
          Sample(key, best.map(_._2))
      }
  }

  /** Batch equivalent: per-key k smallest race keys — value-identical to
    * the stream's final state on the same records, any slicing. Long
    * compares end to end (same rationale as [[StreamingSample.batchBottomK]]). */
  def batchWeightedBottomK(
      df: DataFrame, keyCol: String, idCol: String, weightCol: String, k: Int): DataFrame = {
    val rk = WeightedSample.raceKey(col(idCol), col(weightCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("__rk"), col(idCol))
    df.dropDuplicates(keyCol, idCol)
      .withColumn("__rk", rk)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy(col(keyCol).as("key"))
      .agg(sort_array(collect_list(struct(col("__rk"), col(idCol).as("id")))).as("s"))
      .select(col("key"), expr("transform(s, x -> x.id)").as("ids"))
  }
}
