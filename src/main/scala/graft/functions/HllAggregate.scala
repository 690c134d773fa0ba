package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** q246's portable HyperLogLog as ONE bounded aggregate: 64 max-rho
  * registers in a 64-BYTE buffer — the smallest distinct-sketch state in
  * the suite (KmvSketch holds k longs; exact distinct holds the universe).
  * The register math is bit-identical to the q246/q261 expression
  * pipeline (bucket = h % 64, stream = next 32 md5 bits, rho = 33 −
  * bitlength), so the aggregate's output array equals the groupBy-built
  * register relation row for row — spec-proven, and the estimate helpers
  * reuse the SAME precomputed constants.
  *
  * Contract: the input is the [[hllHash]] column (salted 60-bit md5 —
  * the q246 hash), never a raw key and never Spark's `hash()` (the
  * BloomFilterAgg discipline). Merge = element-wise max, which is why
  * this is legal as a streaming windowed aggregation: registers are
  * order-insensitive and the 64-byte buffer rides the state store
  * between micro-batches.
  */
case class HllSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](64)

  override def update(b: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val bucket = (h % 64).toInt
      val stream = (h >>> 6) & 0xffffffffL
      val rho =
        if (stream == 0L) 33
        else 33 - (64 - java.lang.Long.numberOfLeadingZeros(stream))
      if (rho > b(bucket)) b(bucket) = rho.toByte
    }
    b
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < 64) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(b: Array[Byte]): Any = {
    val out = new Array[Long](64)
    var i = 0
    while (i < 64) { out(i) = b(i).toLong; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(b: Array[Byte]): Array[Byte] = b
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(offset: Int): HllSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
}

object HllAggregate {

  /** NUM = round(α_64 · 64² · 2^33); LUT = round(64·ln(64/V)) for V=1..64
    * — the q246 constants, hoisted here as the single source. */
  val HllNum: Long = 24957716092920L
  val HllLcLut: Array[Long] = Array(
    266, 222, 196, 177, 163, 151, 142, 133, 126, 119, 113, 107, 102, 97,
    93, 89, 85, 81, 78, 74, 71, 68, 65, 63, 60, 58, 55, 53, 51, 48, 46,
    44, 42, 40, 39, 37, 35, 33, 32, 30, 28, 27, 25, 24, 23, 21, 20, 18,
    17, 16, 15, 13, 12, 11, 10, 9, 7, 6, 5, 4, 3, 2, 1, 0).map(_.toLong)

  /** The aggregate's input hash — q246's salted 60-bit md5 of the key. */
  def hllHash(key: Column): Column =
    VectorExpressions.md5Long(concat(lit("hll:"), key.cast("string")))

  /** `hll(hllHash(key))` → 64-element register array (long, 0 = empty). */
  def hll(hash: Column): Column = {
    SparkSession.active.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hll",
      exprs => HllSketch(exprs.head).toAggregateExpression(),
      "built-in")
    call_function("graft_hll", hash)
  }

  /** Harmonic sum Σ 2^(33−m) of a register array — exact int64 (empty
    * registers contribute 2^33 via the same uniform term). 64-element
    * interpreted HOF: fine, it runs on register ROWS, never raw data. */
  def sumScaled(regs: Column): Column =
    aggregate(regs, lit(0L),
      (acc, m) => acc + call_function("shiftleft",
        lit(1L), (lit(33L) - m).cast("int")))

  def vZero(regs: Column): Column =
    size(filter(regs, m => m === 0L)).cast("long")

  /** The q246 estimate (raw or linear-counting) over MATERIALIZED
    * sum/v columns — callers bind [[sumScaled]]/[[vZero]] to named
    * columns first so the 64-element HOF evaluates once (the HOF-lambda
    * trap), then apply this expression over the names. */
  def estimateExpr(sumName: String, vName: String): Column = {
    val raw = expr(s"$HllNum div $sumName")
    when(col(vName) > 0 && raw <= 160,
      element_at(lit(HllLcLut), col(vName).cast("int")))
      .otherwise(raw)
  }
}
