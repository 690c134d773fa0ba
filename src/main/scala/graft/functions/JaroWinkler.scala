package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Static Jaro–Winkler kernel — the codegen-trap rule applies: CONCRETE
  * primitive return type (`double`), never a boxed/Object signature.
  *
  * Implements the STANDARD formulation (match window ⌊max/2⌋−1, k-scan
  * transposition count, Winkler boost p=0.1 over the ≤4-char common
  * prefix applied only above the 0.7 Jaro threshold) with left-to-right
  * IEEE evaluation order:
  *
  *   jaro = (m/l1 + m/l2 + (m−t)/m) / 3
  *   jw   = jaro + l·0.1·(1 − jaro)     (if jaro > 0.7)
  *
  * This exact order reproduces DuckDB's `jaro_winkler_similarity`
  * BIT-FOR-BIT (verified on 5000 corpus pairs before q105 was wired) —
  * which is what lets the oracle be a genuinely independent second
  * implementation rather than a replay.
  *
  * Unit caveat: positions are JVM chars (UTF-16 units), so non-BMP
  * characters count as two units where a code-point implementation
  * counts one. Identical to DuckDB on ASCII/BMP text (all corpus data);
  * supplementary-plane text would need a code-point port on both sides.
  */
object JaroWinklerUtil {
  def jw(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString
    val s2 = b.toString
    if (s1 == s2) return 1.0
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    var md = math.max(l1, l2) / 2 - 1
    if (md < 0) md = 0
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - md)
      val hi = math.min(l2, i + md + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val trans = t / 2
    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - trans) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val pmax = math.min(4, math.min(l1, l2))
    while (l < pmax && s1.charAt(l) == s2.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}

/** `jaro_winkler(a, b)` as a codegen'd Catalyst expression. */
case class JaroWinklerExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerUtil.jw(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.JaroWinklerUtil.jw($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object JaroWinkler {
  def jaroWinkler(a: Column, b: Column): Column = {
    SparkSession.active.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_jaro_winkler",
      exprs => JaroWinklerExpr(exprs.head, exprs(1)),
      "built-in")
    call_function("graft_jaro_winkler", a, b)
  }
}
