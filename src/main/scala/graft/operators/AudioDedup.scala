package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Audio fingerprint near-duplicate detection — the third modality of the
  * q12/q296 family, composed from [[Multimodal.withPeakHash]] (REAL
  * RIFF/WAVE byte decode → 56-bit peak-constellation fingerprint, gain-
  * invariant by construction) and [[SimHashDedup.chunkBlockedPairs]]
  * (lossless 4×14-bit pigeonhole Hamming blocking).
  *
  * At 100 TB: fingerprints are one map-side decode pass (56 bits per
  * clip; payload bytes never shuffle), candidate generation shuffles
  * clips×4 narrow chunk rows, and the exact Hamming verify runs on
  * candidates only — never a clip×clip product. Pairs within Hamming ≤ 3
  * are found with CERTAINTY (pigeonhole), not probabilistically.
  */
object AudioDedup {

  /** Peak-hash bit width: 56 windows × 1 half-position bit. */
  val Bits = 56

  /** `(id, peak_hash)` fingerprints; NULL for malformed/short payloads. */
  def fingerprints(clips: DataFrame, idCol: String, binCol: String): DataFrame =
    Multimodal.withPeakHash(
      clips.select(col(idCol).as("id"), col(binCol).as("payload")), "payload",
      window = 160, nWindows = Bits)
      .select(col("id"), col("peak_hash"))

  /** Near-duplicate clip pairs `(id_a, id_b, hamming)`, Hamming ≤ 3. */
  def pairs(clips: DataFrame, idCol: String, binCol: String,
            maxHamming: Int = 3): DataFrame =
    SimHashDedup.chunkBlockedPairs(
      fingerprints(clips, idCol, binCol), "id", "peak_hash", Bits, maxHamming)
}
