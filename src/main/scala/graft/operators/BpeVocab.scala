package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BpeExpressions

/** Corpus-scale BPE merge learning (Sennrich et al. 2016 — "Neural Machine
  * Translation of Rare Words with Subword Units", the public algorithm).
  *
  * Each round is fully distributed except the ONE decision the algorithm
  * itself defines as global — the argmax pair:
  *
  *  1. adjacent-pair counts: `zip_with(syms, slice(syms, 2, n-1), struct)`
  *     exploded into a hash-aggregate with map-side combine. The zipped
  *     operands are plain attribute reads of the checkpointed symbol
  *     relation (NOT re-evaluated per element — the q50 HOF-lambda trap).
  *  2. top-1 by (count desc, pair asc) — a deterministic total order, so
  *     ties cannot make two runs learn different vocabularies. Only this
  *     single row is ever collected.
  *  3. the merge applies corpus-wide as one map-side codegen'd expression
  *     ([[graft.functions.BpeMergePair]]); the new symbol relation is
  *     `localCheckpoint`ed so round k+1's plan does not replay rounds 1..k
  *     (the lineage otherwise grows linearly in merge count).
  *
  * At 100 TB the shape is unchanged: k rounds × (one explode-agg shuffle +
  * one map pass). The pair-count relation is |symbol-vocab|² at most —
  * driver-trivial — and the argmax could stay distributed via a single
  * `limit(1)` exactly as here.
  */
object BpeVocab {

  final case class Merge(a: String, b: String, count: Long)

  /** The first `numMerges` BPE merges of the corpus (stops early when no
    * pair reaches `minCount`). */
  def learnMerges(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      minCount: Long = 2L): Seq[Merge] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    var syms = docs
      .select(BpeExpressions.initSymbols(col(textCol)).as("syms"))
      .filter(size(col("syms")) >= 2)
      .localCheckpoint()
    val merges = ArrayBuffer.empty[Merge]
    var continue = true
    while (continue && merges.length < numMerges) {
      val top = pairCounts(syms.col("syms"), syms)
        .orderBy(desc("n"), asc("a"), asc("b"))
        .limit(1)
        .collect()
      top.headOption.filter(_.getLong(2) >= minCount) match {
        case None => continue = false
        case Some(r) =>
          val m = Merge(r.getString(0), r.getString(1), r.getLong(2))
          merges += m
          val next = syms
            .select(BpeExpressions.mergePair(col("syms"), lit(m.a), lit(m.b)).as("syms"))
            .localCheckpoint()
          syms.unpersist()
          syms = next
      }
    }
    syms.unpersist()
    merges.toSeq
  }

  /** Tokenize `text` with a learned merge list: init symbols, then each
    * merge in order as one fused column expression (k nested map-side
    * calls — no shuffles, no state). */
  def applyMerges(text: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(BpeExpressions.initSymbols(text))(
      (acc, m) => BpeExpressions.mergePair(acc, lit(m.a), lit(m.b)))

  private def pairCounts(syms: Column, rel: DataFrame): DataFrame =
    rel.select(explode(zip_with(syms, slice(syms, lit(2), size(syms) - 1),
        (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
      // zip_with pads the shorter slice with null -> every row emits one
      // (last-symbol, null) struct; unfiltered it can WIN the argmax
      // (count = #docs, and asc(b) sorts null first) and a null merge
      // operand nulls the whole symbol relation
      .filter(col("p.b").isNotNull)
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("n"))
}
