package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** OPQ-style rotation before product quantization — the randomized
  * signed-Hadamard transform (the FAISS/OPQ-alternative "random rotation"):
  *   rot[i] = Σ_j (−1)^popcount(i AND j) · sign_j · v[j]
  * with deterministic md5 sign flips. H·D is orthogonal up to the uniform
  * scale √d, so it preserves geometry while SPREADING per-dimension energy
  * evenly across all dimensions. That realizes the BALANCE half of OPQ's
  * objective: every PQ subspace carries an equal energy share instead of
  * one hogging the variance — the property OPQ's eigenvalue allocation
  * approximates, and the one a data-INDEPENDENT rotation can guarantee
  * (spec-proven with exact integers). The independence half — rotating so
  * cross-subspace correlations vanish — needs the learned SVD fit, whose
  * driver-side float iteration the repo's oracle-portability discipline
  * rules out; on correlation-free sources total distortion is provably
  * trace-invariant, so q236 MEASURES the realized error trade rather than
  * asserting a win.
  *
  * Everything is integer: inputs are micro longs, H entries are ±1, so
  * `rot` is an exact long sum — both engines compute the identical vector
  * (DuckDB: `bit_count(i & j)` + a literal sign list). The √d scale is
  * deliberately NOT applied (it would leave the integers); distances in
  * the rotated space are uniformly d× the originals, so error comparisons
  * against the unrotated pipeline multiply the plain side by d.
  */
object OpqRotation {

  /** Deterministic ±1 signs: `md5("hd:" + j)` parity — portable literals
    * computed once, inlined on both engines. */
  def signs(d: Int): Seq[Long] =
    (0 until d).map { j =>
      (graft.functions.Md5LongUtil.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"hd:$j")) % 2) * 2 - 1
    }

  /** Rotate a micro-long `array<long>` column of fixed dimension `d`
    * (power of two) in one native pass
    * ([[graft.functions.HadamardRotate]] — the HOF formulation would
    * re-evaluate the sign-flipped input, and any inlined upstream
    * expression, once per OUTPUT element: the documented lambda trap). */
  def rotateMicro(vq: Column, d: Int): Column = {
    require(d > 0 && (d & (d - 1)) == 0, s"Hadamard needs a power-of-two dim, got $d")
    graft.functions.VectorExpressions.hadamardRotate(vq, signs(d).toArray)
  }

  /** DuckDB subquery producing `(vec_id, vrot)` — the rotated vectors of
    * `table(idCol, vecCol)` as DOUBLE[] in original units (÷10⁶), ready to
    * feed [[ProductQuantizer.oracleCtes]] whose micro step recovers the
    * exact integers (|rot| ≪ 2⁵² ⇒ the round-trip is lossless). */
  def rotatedTableSql(table: String, idCol: String, vecCol: String, d: Int): String = {
    val signList = signs(d).mkString("[", ", ", "]")
    s"""(WITH em0 AS (SELECT $idCol AS id,
       |    list_transform($vecCol::DOUBLE[], x -> CAST(round(x * 1000000) AS BIGINT)) AS vq0
       |  FROM $table),
       |sx AS (SELECT id, unnest(vq0) AS x, unnest(range(1, $d + 1)) AS j FROM em0),
       |sg AS (SELECT id, j - 1 AS j0, x * ($signList)[j] AS sx FROM sx),
       |rt AS (SELECT id, list(r ORDER BY i) AS vq FROM (
       |    SELECT g.id, ii.i, sum(CASE WHEN bit_count(ii.i & g.j0) % 2 = 0
       |                               THEN g.sx ELSE -g.sx END)::BIGINT AS r
       |    FROM sg g, (SELECT unnest(range(0, $d)) AS i) ii GROUP BY 1, 2)
       |  GROUP BY id)
       |SELECT id AS $idCol, list_transform(vq, x -> x / 1000000.0) AS vrot FROM rt)""".stripMargin
  }
}
