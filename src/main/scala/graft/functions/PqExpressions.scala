package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Static helper for [[PqEncodeMicro]] (callable from generated code).
  * CODEGEN TRAP (round 1's lesson): the return type must be the CONCRETE
  * JVM class — an Object-returning signature makes Janino reject the whole
  * generated projection and Spark silently falls back to the interpreter. */
object PqEncodeUtil {

  /** Product-quantize a micro-unit vector against `cb[sub][cid][dim]`:
    * per subspace the argmin-L2 code (ties → smaller cid), plus the total
    * squared quantization error across subspaces. All exact long
    * arithmetic (micro² units): |coord| ≤ ~2^21 micro ⇒ a squared diff is
    * ≤ ~2^44 and a 64-dim total ≤ ~2^50 — no overflow, no floats. */
  def encode(v: ArrayData, cb: Array[Array[Array[Long]]]): InternalRow = {
    val m = cb.length
    val subDim = cb(0)(0).length
    val codes = new Array[Int](m)
    var err = 0L
    var s = 0
    while (s < m) {
      val base = s * subDim
      val cents = cb(s)
      var best = 0
      var bestD = Long.MaxValue
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var d = 0L
        var i = 0
        while (i < subDim) {
          val diff = v.getLong(base + i) - cent(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c } // strict < keeps smaller cid on ties
        c += 1
      }
      codes(s) = best
      err += bestD
      s += 1
    }
    InternalRow(new GenericArrayData(codes), err)
  }
}

/** Map-side product-quantization encode: `child` is the micro-quantized
  * vector (`array<long>`, length = m·subDim), the codebooks ride the plan
  * as a codegen reference object. Returns
  * `struct<codes: array<int>, err: bigint>` — the code word AND the exact
  * integer quantization error in one pass, so encoding a 100 TB corpus is
  * embarrassingly parallel: no join, no shuffle, no UDF. */
case class PqEncodeMicro(child: Expression, cb: Array[Array[Array[Long]]])
  extends UnaryExpression {

  // content-based equality (reference-identity Arrays would defeat
  // canonicalization — the NearestCentroids lesson)
  override def equals(other: Any): Boolean = other match {
    case PqEncodeMicro(c, ocb) =>
      child == c && java.util.Arrays.deepEquals(
        cb.asInstanceOf[Array[AnyRef]], ocb.asInstanceOf[Array[AnyRef]])
    case _ => false
  }

  override def hashCode(): Int = java.util.Objects.hash(
    child, Integer.valueOf(java.util.Arrays.deepHashCode(cb.asInstanceOf[Array[AnyRef]])))

  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("err", LongType, nullable = false)))

  override def nullSafeEval(v: Any): Any =
    PqEncodeUtil.encode(v.asInstanceOf[ArrayData], cb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("cb", cb, "long[][][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.PqEncodeUtil.encode($c, $cbRef)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object PqExpressions {

  /** Registered-function exposure (the [[VectorExpressions.registered]]
    * pattern); the name carries a codebook fingerprint — registration is
    * session-global by name and the fit changes between calls, so the
    * fingerprint must not collide across codebooks (a collision would
    * silently rebind the name under a lazily-analyzed earlier plan):
    * md5 over the fully-serialized codebook, not a weak 31-fold. */
  def pqEncodeMicro(v: Column, cb: Array[Array[Array[Long]]]): Column = {
    val ser = cb.iterator.map(_.iterator.map(_.mkString(",")).mkString(";")).mkString("|")
    val fp = java.security.MessageDigest.getInstance("MD5")
      .digest(ser.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map(b => f"$b%02x").mkString
    VectorExpressions.registered(s"graft_pq_encode_${cb.length}_${cb(0).length}_$fp",
      exprs => PqEncodeMicro(exprs.head, cb))(v)
  }
}
