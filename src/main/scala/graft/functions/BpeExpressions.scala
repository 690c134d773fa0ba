package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native primitives for corpus-scale BPE (byte-pair-encoding) tokenizer
  * induction — classic Sennrich et al. 2016 semantics:
  *
  *  - [[BpeInitSymbols]]: text → the initial symbol sequence (each
  *    whitespace token's characters, then an end-of-word marker). Fused:
  *    one pass per document, no intermediate token arrays.
  *  - [[BpeMergePair]]: one greedy left-to-right, non-overlapping merge of
  *    an adjacent symbol pair — the inner step of both learning (applied
  *    corpus-wide per round) and tokenization (applied per merge rule).
  *
  * Both are codegen'd expressions (helpers return the CONCRETE
  * `GenericArrayData` — see CodegenCompileSpec for why). The merge pair
  * operands are child expressions, not constructor strings, so arbitrary
  * symbols (quotes, backslashes) never touch generated-source escaping.
  */
object BpeExpressions {

  val WordEnd = "</w>"

  def initSymbols(text: Column): Column =
    VectorExpressions.registered("graft_bpe_init",
      exprs => BpeInitSymbols(exprs.head))(text)

  def mergePair(syms: Column, a: Column, b: Column): Column =
    VectorExpressions.registered("graft_bpe_merge",
      exprs => BpeMergePair(exprs.head, exprs(1), exprs(2)))(syms, a, b)
}

object BpeUtil {

  private val ws = java.util.regex.Pattern.compile("\\s+")
  private val wordEnd = UTF8String.fromString(BpeExpressions.WordEnd)

  // concrete return type — an Object-returning signature makes Janino
  // reject the generated projection (silent interpreter fallback)
  def initSymbols(s: UTF8String): GenericArrayData = {
    // String.trim (all ASCII control whitespace), NOT UTF8String.trim
    // (0x20 only): a leading \n or trailing \t must not survive into the
    // \s+ split, where an empty token would emit a spurious bare marker
    val str = s.toString.trim
    if (str.isEmpty) return new GenericArrayData(Array.empty[Any])
    val toks = ws.split(str, -1)
    val out = new java.util.ArrayList[AnyRef]()
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      if (!tok.isEmpty) {
        var i = 0
        while (i < tok.length) {
          out.add(UTF8String.fromString(String.valueOf(tok.charAt(i))))
          i += 1
        }
        out.add(wordEnd)
      }
      t += 1
    }
    new GenericArrayData(out.toArray)
  }

  def mergePair(arr: ArrayData, a: UTF8String, b: UTF8String): GenericArrayData = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[AnyRef](n)
    var i = 0
    while (i < n) {
      if (i < n - 1 && arr.getUTF8String(i) == a && arr.getUTF8String(i + 1) == b) {
        out.add(UTF8String.concat(a, b))
        i += 2
      } else {
        out.add(arr.getUTF8String(i))
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/** `BpeUtil.initSymbols` as a codegen'd expression. */
case class BpeInitSymbols(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    BpeUtil.initSymbols(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeUtil.initSymbols($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `BpeUtil.mergePair` as a codegen'd expression. */
case class BpeMergePair(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(arr: Any, a: Any, b: Any): Any =
    BpeUtil.mergePair(arr.asInstanceOf[ArrayData],
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (arr, a, b) => s"graft.functions.BpeUtil.mergePair($arr, $a, $b)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}
