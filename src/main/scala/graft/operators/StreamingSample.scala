package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.Md5LongUtil

/** Deterministic uniform sampling over an unbounded stream: the bottom-k
  * sketch. Keep, per key, the k records with the SMALLEST md5(id) — since
  * the hash is uniform and independent of arrival order, the survivors are
  * a uniform k-sample of everything seen, with NO random number generator:
  * the same records always win, so stream and batch agree exactly and a
  * replay cannot change the sample (the reservoir-sampling property, made
  * deterministic — same bottom-k-hash trick as q56's stratified sampler).
  *
  * State per key is a bounded k-entry list (largest retained hash evicts
  * first); emission is `complete`-style via update mode from a stateful
  * map — each batch emits the key's CURRENT sample. Bottom-k sketches also
  * union like sets (min-merge), which is what makes the same construction
  * work as a distributed batch aggregate ([[batchBottomK]], the parity
  * oracle in the spec).
  */
object StreamingSample {

  final case class Rec(key: String, id: Long)
  final case class Sample(key: String, ids: Seq[Long])

  private def hash(id: Long): Long =
    Md5LongUtil.hashBytes(id.toString.getBytes("UTF-8"))

  /** Current bottom-k sample per key after each micro-batch (update mode). */
  def sampled(records: Dataset[Rec], k: Int): Dataset[Sample] = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = records.sparkSession
    import spark.implicits._
    records
      .groupByKey(_.key)
      .mapGroupsWithState[List[(Long, Long)], Sample](
        GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[Rec], state: GroupState[List[(Long, Long)]]) =>
          var best = state.getOption.getOrElse(Nil) // (hash, id), ascending
          val ord = Ordering.Tuple2[Long, Long]
          rows.foreach { r =>
            val cand = (hash(r.id), r.id)
            // set semantics: a replayed id is a no-op (exactly-once sample).
            // Total order is (hash, id) — id breaks 60-bit hash ties, so the
            // kth-place cutoff agrees with batchBottomK's (__h, id) window
            // whatever order the colliding ids arrived in
            if ((best.length < k || ord.lt(cand, best.last)) && !best.contains(cand)) {
              best = (cand :: best).sorted(ord).take(k)
            }
          }
          state.update(best)
          Sample(key, best.map(_._2))
      }
  }

  /** The batch equivalent: per-key k smallest md5(id) — value-identical to
    * the stream's final state on the same records, any slicing. Ordering
    * stays in LONGs end to end (a double-cast score would lose precision
    * above 2^53 and could disagree with the stream's long compare on
    * close 60-bit hashes). */
  def batchBottomK(df: DataFrame, keyCol: String, idCol: String, k: Int): DataFrame = {
    val h = graft.functions.VectorExpressions.md5Long(col(idCol).cast("string"))
    // (__h, id) — same total order as the stream state; __h alone leaves
    // row_number nondeterministic among 60-bit hash collisions
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("__h"), col(idCol))
    df.dropDuplicates(keyCol, idCol) // set semantics, matching the stream
      .withColumn("__h", h)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy(col(keyCol).as("key"))
      .agg(sort_array(collect_list(struct(col("__h"), col(idCol).as("id")))).as("s"))
      .select(col("key"), expr("transform(s, x -> x.id)").as("ids"))
  }
}
