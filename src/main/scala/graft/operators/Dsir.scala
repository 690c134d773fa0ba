package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{PortableMath, TextHash}

/** DSIR-style hashed importance weighting for training-data selection
  * (Xie et al. 2023, "Data Selection for Language Models via Importance
  * Resampling"): score every document by how target-like its hashed
  * unigram-bucket distribution is — the log-likelihood ratio
  * `log p_target(doc) − log p_corpus(doc)` over hashed token buckets,
  * the standard recipe for filtering a web-scale corpus toward a small
  * high-quality target domain.
  *
  * PORTABILITY: the per-bucket log-likelihood-ratio LUT uses integer
  * MILLI-LOG2 ([[PortableMath.mlog2]]) instead of IEEE `ln`, so every
  * weight and every document score is hash-exact cross-engine. The
  * piecewise-linear log2 is monotone and within ~0.086 bits of true
  * log2 — selection quality is indistinguishable from float DSIR while
  * the correctness gate checks scores bit-for-bit.
  *
  * SCALE: bucket counting is one hash aggregation over exploded tokens
  * (map-side partial combine on ≤ nBuckets keys); the LUT is ≤ nBuckets
  * rows and broadcasts; scoring is a map-side explode + broadcast join +
  * one per-doc aggregation. Nothing corpus-sized reaches the driver and
  * there are no window functions — the shape survives a 1000-executor
  * corpus unchanged.
  */
object Dsir {

  /** Hashed-unigram bucket of one token (non-negative, < nBuckets). */
  def bucket(tok: Column, nBuckets: Int): Column =
    TextHash.md5Long(concat(lit("dsir:"), tok)) % nBuckets

  /** DuckDB lockstep of [[bucket]]. */
  def bucketSql(tok: String, nBuckets: Int): String =
    s"(${TextHash.md5LongSql(s"'dsir:' || ($tok)")} % $nBuckets)"

  /** `(doc columns…, t)` exploded lowercase whitespace tokens. */
  private def toks(docs: DataFrame, textCol: Column, keep: Seq[Column]): DataFrame =
    // tokenize+hash fans each doc out ~len× map-side — spread the compact
    // doc rows first (no-op at scale, see [[Spread]])
    Spread.rows(docs).select(keep :+ explode(TextHash.tokens(lower(textCol))).as("t"): _*)

  /** The importance LUT: one row per OBSERVED bucket, `llr` = milli-log2
    * of the +1-smoothed target/corpus probability ratio,
    * `mlog2(ct+1) − mlog2(nt+B) − mlog2(cs+1) + mlog2(ns+B)`.
    * Buckets never observed in the corpus cannot occur in any document,
    * so the observed-bucket LUT is complete for scoring.
    */
  def bucketLut(docs: DataFrame, isTarget: Column, textCol: Column, nBuckets: Int): DataFrame = {
    val b = toks(docs, textCol, Seq(isTarget.as("is_t")))
      .select(col("is_t"), bucket(col("t"), nBuckets).as("bkt"))
    // cnt is consumed twice (the totals aggregate + the llr projection) —
    // unpersisted, each consumer would re-run the full corpus tokenize +
    // hash + groupBy (the round-5 rule). ≤ nBuckets rows, trivially
    // cached; same caching contract as MinHashDedup.pairs: long-lived
    // callers clearCache once the LUT is consumed (Bench does).
    val cnt = b.groupBy("bkt").agg(
      count(lit(1)).as("cs"),
      sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = cnt.agg(sum(col("cs")).as("ns"), sum(col("ct")).as("nt"))
    cnt.crossJoin(broadcast(tot)).select(
      col("bkt"),
      (PortableMath.mlog2(col("ct") + 1) - PortableMath.mlog2(col("nt") + nBuckets)
        - PortableMath.mlog2(col("cs") + 1) + PortableMath.mlog2(col("ns") + nBuckets))
        .as("llr"))
  }

  /** Per-document importance score: Σ over token INSTANCES of the bucket
    * llr (`dsir_mllr`, integer milli-bits) plus the token count. `lut`
    * must come from [[bucketLut]] with the same `nBuckets`.
    */
  def scored(docs: DataFrame, lut: DataFrame, idCol: String, textCol: Column,
             nBuckets: Int): DataFrame =
    toks(docs, textCol, Seq(col(idCol)))
      .select(col(idCol), bucket(col("t"), nBuckets).as("bkt"))
      .join(broadcast(lut), "bkt")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"), sum(col("llr")).as("dsir_mllr"))

  /** The LUT as a driver map — BOUNDED by nBuckets (the whole point of
    * hashed features: the model is ≤ nBuckets longs however big the fit
    * corpus), so the collect is safe at any scale. */
  def lutMap(lut: DataFrame): Map[Long, Long] =
    lut.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Map-side scoring against a FROZEN literal LUT — zero joins, zero
    * shuffles, zero state, which makes it STREAMING-SAFE (append mode;
    * score live ingest with the last fitted LUT, refit offline). Two
    * deliberate differences from [[scored]], visible only on docs OUTSIDE
    * the fit corpus: buckets never observed at fit time score 0 (the
    * smoothed-prior posture) and still count in `n_tok`; on the fit
    * corpus itself the two forms agree exactly (every bucket is observed
    * — spec-proven). */
  def scoredMapSide(docs: DataFrame, lut: Map[Long, Long], idCol: String,
                    textCol: Column, nBuckets: Int): DataFrame = {
    require(lut.nonEmpty && lut.size <= nBuckets, s"LUT size ${lut.size} vs $nBuckets")
    val m = typedlit(lut)
    val toks = TextHash.tokens(lower(textCol))
    docs.select(col(idCol),
      size(toks).as("n_tok"),
      aggregate(
        transform(toks, t => coalesce(element_at(m, bucket(t, nBuckets)), lit(0L))),
        lit(0L), (acc, x) => acc + x).as("dsir_mllr"))
  }

  /** DuckDB replay of the whole pipeline over table `documents`:
    * CTEs `bk` (doc_id, is_t, bkt), `lut` (bkt, llr), `sc`
    * (doc_id, n_tok, dsir_mllr). `targetSql` is a boolean predicate over
    * a documents row (e.g. "lang = 'en'").
    */
  def replayCtes(targetSql: String, nBuckets: Int): String = {
    val m = (x: String) => PortableMath.mlog2Sql(x)
    s"""bk AS (
       |  SELECT doc_id, is_t, ${bucketSql("t", nBuckets)} AS bkt
       |  FROM (SELECT doc_id, ($targetSql) AS is_t,
       |               unnest(${TextHash.tokensSql("lower(text)")}) AS t
       |        FROM documents)
       |),
       |cnt AS (
       |  SELECT bkt, count(*)::BIGINT AS cs,
       |         sum(CASE WHEN is_t THEN 1 ELSE 0 END)::BIGINT AS ct
       |  FROM bk GROUP BY bkt
       |),
       |tot AS (SELECT sum(cs)::BIGINT AS ns, sum(ct)::BIGINT AS nt FROM cnt),
       |lut AS (
       |  SELECT bkt, (${m("ct + 1")} - ${m("nt + " + nBuckets)}
       |             - ${m("cs + 1")} + ${m("ns + " + nBuckets)})::BIGINT AS llr
       |  FROM cnt CROSS JOIN tot
       |),
       |sc AS (
       |  SELECT b.doc_id, count(*)::BIGINT AS n_tok, sum(l.llr)::BIGINT AS dsir_mllr
       |  FROM bk b JOIN lut l USING (bkt) GROUP BY b.doc_id
       |)""".stripMargin
  }
}
