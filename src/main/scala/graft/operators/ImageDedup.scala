package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perceptual image near-duplicate detection: the multimodal counterpart of
  * text SimHash dedup, composed from the two machines the suite already
  * proves — [[Multimodal.withDHash]] (REAL byte-level P6 decode → 9×7
  * grid-pooled dHash, resolution-invariant by construction) and
  * [[SimHashDedup.chunkBlockedPairs]] (lossless 4-chunk pigeonhole Hamming
  * blocking).
  *
  * At 100 TB this is the image-level q12: fingerprints are one map-side
  * decode pass (56 bits per image, payload bytes never shuffle), candidate
  * generation shuffles images×4 narrow chunk rows, and the exact Hamming
  * verify runs on candidates only — never an image×image product. Pairs
  * within Hamming ≤ 3 are found with certainty (pigeonhole over 4×14-bit
  * chunks), not probabilistically.
  */
object ImageDedup {

  /** dHash bit width: 9×7 grid → 8 comparisons × 7 rows. */
  val Bits = 56

  /** `(id, width, height, dhash)` fingerprints; NULL dhash for malformed
    * or smaller-than-grid payloads (the row survives — one corrupt object
    * must not kill a 100 TB job). */
  def fingerprints(imgs: DataFrame, idCol: String, binCol: String): DataFrame =
    Multimodal.withDHash(imgs.select(col(idCol).as("id"), col(binCol).as("payload")), "payload")
      .select(col("id"), col("width"), col("height"), col("dhash"))

  /** Near-duplicate image pairs `(id_a, id_b, hamming)` with Hamming ≤
    * `maxHamming` (≤ 3: the 4-chunk blocking guarantee). */
  def pairs(imgs: DataFrame, idCol: String, binCol: String, maxHamming: Int = 3): DataFrame =
    SimHashDedup.chunkBlockedPairs(
      fingerprints(imgs, idCol, binCol), "id", "dhash", Bits, maxHamming)
}
