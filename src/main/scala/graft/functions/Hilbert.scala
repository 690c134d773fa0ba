package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve encoding — z-order's stronger sibling for data layout:
  * consecutive curve positions are ALWAYS grid-adjacent (Morton order
  * takes long diagonal jumps at power-of-two boundaries), so equal-count
  * curve-range buckets have tighter coordinate bounding boxes and
  * file-level min/max skipping prunes better on both dimensions.
  *
  * The xy→d transform is the classic per-level quadrant walk with state
  * (reflection + transposition carried between levels), which rules out
  * closed-form mask math (z-order's spread/interleave) AND naive column
  * composition — unrolling `bits` levels of `when()` chains duplicates
  * the coordinate subtrees ~4× per level, an exponential expression blow
  * (the OpqRotation/HOF lesson). Hence a custom codegen Expression whose
  * generated code is one static call into the tight JVM loop
  * ([[HilbertUtil.xy2d]], CONCRETE `long` return — the round-1 Janino
  * trap). The identical arithmetic replays in DuckDB as a per-level CTE
  * chain ([[Hilbert.oracleCtes]]): each level is referenced once by the
  * next, so SQL stays linear where the column form exploded. */
object HilbertUtil {

  /** (x, y) → position on the order-`bits` Hilbert curve. Coordinates must
    * be in [0, 2^bits); callers mask/mod first (q67's discipline). */
  def xy2d(x0: Long, y0: Long, bits: Int): Long = {
    var x = x0
    var y = y0
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) { // reflect (rx==1) then transpose, for the next level
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"hilbert bits must be in 1..31, got $bits")

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertUtil.xy2d(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.HilbertUtil.xy2d($a, $b, $bits)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Hilbert {

  /** Column form of [[HilbertUtil.xy2d]] (long inputs, long output). */
  def index(x: Column, y: Column, bits: Int): Column =
    VectorExpressions.registered(s"graft_hilbert_$bits",
      exprs => HilbertIndex(exprs.head, exprs(1), bits))(x, y)

  /** DuckDB replay: the per-level quadrant walk unrolled as a CTE chain
    * over `rel` — level i computes (hd, hx, hy) for the next from the
    * previous, carrying every other column via SELECT *. The caller's
    * WITH clause gains CTEs `hseed, hl0..hl${bits-1}`; read the final
    * index as `hd$bits` from `hl${bits-1}`. */
  def oracleCtes(rel: String, xExpr: String, yExpr: String, bits: Int): String = {
    val seed =
      s"""hseed AS (SELECT *, ($xExpr)::BIGINT AS hx0, ($yExpr)::BIGINT AS hy0,
         |  0::BIGINT AS hd0 FROM $rel)""".stripMargin
    val levels = (0 until bits).map { i =>
      val s = 1L << (bits - 1 - i)
      val prev = if (i == 0) "hseed" else s"hl${i - 1}"
      s"""hl$i AS (SELECT *,
         |  (hd$i + ${s * s} * xor(3 * (CASE WHEN (hx$i & $s) > 0 THEN 1 ELSE 0 END),
         |                         (CASE WHEN (hy$i & $s) > 0 THEN 1 ELSE 0 END)))::BIGINT AS hd${i + 1},
         |  (CASE WHEN (hy$i & $s) = 0
         |        THEN (CASE WHEN (hx$i & $s) > 0 THEN ${s - 1} - hy$i ELSE hy$i END)
         |        ELSE hx$i END)::BIGINT AS hx${i + 1},
         |  (CASE WHEN (hy$i & $s) = 0
         |        THEN (CASE WHEN (hx$i & $s) > 0 THEN ${s - 1} - hx$i ELSE hx$i END)
         |        ELSE hy$i END)::BIGINT AS hy${i + 1}
         |  FROM $prev)""".stripMargin
    }
    (seed +: levels).mkString(",\n")
  }
}
