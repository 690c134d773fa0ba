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

  /** Full tokenization — initSymbols + the WHOLE merge table — as ONE
    * references-backed expression call. k NESTED [[mergePair]] calls
    * generate k inlined helper invocations in one doConsume and blow the
    * 64 KB method limit near k ≈ 30 (observed: q326's 32-merge encode
    * silently fell back to the interpreter); the fused form generates one
    * call whatever k is, and skips k−1 intermediate array allocations.
    * The merge strings live in the references array, never in generated
    * source (no escaping surface). */
  def applyAll(text: Column, merges: Array[(String, String)]): Column = {
    val sig = java.lang.Long.toHexString(
      Md5LongUtil.hashBytes(merges.map { case (a, b) => s"$a\u0000$b" }
        .mkString("\u0001").getBytes("UTF-8")))
    VectorExpressions.registered(s"graft_bpe_apply_${merges.length}_$sig",
      exprs => BpeApplyMerges(exprs.head, merges))(text)
  }
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

  /** initSymbols + every (a, b) pair of the flattened `table` applied in
    * order — the fused body of [[BpeApplyMerges]]. */
  def applyAll(s: UTF8String, table: Array[UTF8String]): GenericArrayData = {
    var arr: GenericArrayData = initSymbols(s)
    var k = 0
    while (k < table.length) {
      arr = mergePair(arr, table(k), table(k + 1))
      k += 2
    }
    arr
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

/** `BpeUtil.applyAll` as a codegen'd expression: one call carrying the
  * whole merge table through the references array. */
case class BpeApplyMerges(child: Expression, merges: Array[(String, String)])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  @transient private lazy val table: Array[UTF8String] =
    merges.flatMap { case (a, b) =>
      Seq(UTF8String.fromString(a), UTF8String.fromString(b)) }
  override def nullSafeEval(v: Any): Any =
    BpeUtil.applyAll(v.asInstanceOf[UTF8String], table)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMergeTable", table,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeUtil.applyAll($c, $ref)")
  }
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
