package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextHash, VectorExpressions}
import graft.operators.{ExactDedup, MinHashDedup}

/** End-to-end training-corpus preparation: the composition a 100 TB text
  * pipeline actually runs, from raw documents to deduplicated, quality-
  * filtered, fingerprinted output.
  *
  *   normalize → quality filter → exact dedup → fuzzy (MinHash-LSH) dedup
  *   → fingerprint
  *
  * Each stage is one of this library's operators; the composition stays a
  * handful of hash-shuffles end to end. Fuzzy dedup keeps the LOWEST doc id
  * of each near-duplicate CONNECTED COMPONENT over the verified pair set,
  * computed by iterative min-label propagation — O(component diameter)
  * rounds, and dup-cluster diameters are tiny in practice. Lineage is
  * truncated per round like the org-hierarchy fixpoint.
  */
object CorpusPipeline {

  final case class Config(
      minTokens: Int = 5,
      minStopwordRatio: Double = 0.0,
      shingleSize: Int = 3,
      minhash: MinHashDedup.Config = MinHashDedup.Config())

  final case class Result(
      corpus: DataFrame,          // (doc_id, text_norm, n_tokens, fingerprint)
      stats: Map[String, Long])   // per-stage row counts

  def run(docs: DataFrame, cfg: Config = Config()): Result = {
    // 1. normalize
    val norm = docs.select(
      col("doc_id"),
      regexp_replace(lower(trim(col("text"))), "\\s+", " ").as("text_norm"))

    // 2. quality filter (cheap column math; heavier scoring in TextQueries)
    val toks = TextHash.tokens(col("text_norm"))
    val filtered = norm.filter(size(toks) >= cfg.minTokens)

    // 3. exact dedup on normalized text
    val exact = ExactDedup.keepFirst(filtered, Seq("text_norm"), "doc_id")

    // 4. fuzzy dedup: verified near-dup pairs → connected components via
    //    min-label propagation; keep each component's minimum id
    val pairs = MinHashDedup.pairs(
      exact, "doc_id",
      VectorExpressions.wordShingleHashes(col("text_norm"), cfg.shingleSize, TextHash.P),
      cfg.minhash)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Docs in no pair are their own cluster; ConnectedComponents only labels
    // vertices that appear in edges, so non-roots (label < id) identify the
    // docs to DROP — everything else survives.
    val comp = graft.operators.ConnectedComponents.minLabel(
      pairs.select(col("id_a"), col("id_b")))
    val dropped = comp.filter(col("root") =!= col("id")).select(col("id").as("doc_id"))
    val deduped = exact.join(dropped, Seq("doc_id"), "left_anti")

    // 5. fingerprint the survivors
    val out = deduped.select(
      col("doc_id"), col("text_norm"),
      size(TextHash.tokens(col("text_norm"))).as("n_tokens"),
      TextHash.md5Long(col("text_norm")).as("fingerprint"))

    Result(out, Map(
      "input"       -> docs.count(),
      "after_norm"  -> filtered.count(),
      "after_exact" -> exact.count(),
      "after_fuzzy" -> out.count()))
  }
}
