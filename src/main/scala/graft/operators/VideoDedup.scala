package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Video fingerprint near-duplicate detection — the FOURTH modality of
  * the q12/q296/q328 family, completing dedup across text, image, audio
  * and video. Composed from [[Multimodal.withTemporalHash]] (REAL
  * multi-frame P6 decode → 56-bit temporal fingerprint over disjoint
  * frame-pair comparisons, resolution-invariant by construction) and
  * [[SimHashDedup.chunkBlockedPairs]] (lossless 4×14-bit pigeonhole
  * Hamming blocking).
  *
  * At 100 TB: fingerprints are one map-side decode pass (56 bits per
  * clip; frames never shuffle), candidate generation shuffles clips×4
  * narrow chunk rows, and the exact Hamming verify runs on candidates
  * only — never a clip×clip product. Pairs within Hamming ≤ 3 are found
  * with CERTAINTY (pigeonhole), not probabilistically.
  */
object VideoDedup {

  /** Temporal-hash bit width: 56 disjoint frame-pair comparison bits. */
  val Bits = 56

  /** `(id, temporal_hash)` fingerprints; NULL for malformed/short clips. */
  def fingerprints(clips: DataFrame, idCol: String, binCol: String): DataFrame =
    Multimodal.withTemporalHash(
      clips.select(col(idCol).as("id"), col(binCol).as("payload")), "payload",
      nPairs = Bits)
      .select(col("id"), col("temporal_hash"))

  /** Near-duplicate clip pairs `(id_a, id_b, hamming)`, Hamming ≤ 3. */
  def pairs(clips: DataFrame, idCol: String, binCol: String,
            maxHamming: Int = 3): DataFrame =
    SimHashDedup.chunkBlockedPairs(
      fingerprints(clips, idCol, binCol), "id", "temporal_hash", Bits, maxHamming)
}
