package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Distributed gram (second-moment) matrix of an embedding column — the
  * whitening / PCA-prep primitive of embedding analytics — as ONE custom
  * aggregate with a bounded d·(d+1)/2-cell buffer.
  *
  * Scale design: the naive relational form (posexplode dims, self-join on
  * vec_id with i <= j, groupBy (i, j)) shuffles |vectors|·d²/2 product rows
  * — 41 M rows at a mere sf0.1. This aggregate accumulates the upper
  * triangle MAP-SIDE into a fixed long[2080] (d = 64) buffer; the shuffle
  * carries one buffer per partition regardless of vector count.
  *
  * Exactness: values are converted to integer micro-units
  * (round-half-away(x·1e6), the same convention as [[graft.operators.KMeansIVF]])
  * and products are summed as exact longs — no accumulation-order
  * dependence, so the DuckDB oracle (unnest-zip + self-join + sum) matches
  * bit-for-bit. Magnitude: |x| ≤ 1 → product ≤ 1e12; a cell could wrap
  * past ~9.2e6 rows per final buffer, so a row-count cell rides in the
  * buffer and the aggregate FAILS LOUDLY at `maxRows` instead of silently
  * wrapping (the oracle side would also error — HUGEINT::BIGINT throws —
  * so a silent Spark wrap would be the only wrong-answer path).
  *
  * Output: array<struct<i int, j int, v_mu long>> of the i ≤ j triangle,
  * row-major; `inline` it to rows.
  */
case class GramMatrixMicro(
    vec: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val cells = d * (d + 1) / 2
  // |mu| <= ~1e6 for unit-ish embeddings -> |product| <= ~1e12 per row;
  // Long.MaxValue / 1e12 ≈ 9.2e6 rows before a cell can wrap
  private val maxRows = 9_000_000L

  override def children: Seq[Expression] = Seq(vec)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("v_mu", LongType, nullable = false))), containsNull = false)

  // one extra cell carries the row count for the overflow guard
  override def createAggregationBuffer(): Array[Long] = new Array[Long](cells + 1)

  // KMeansIVF's correctly-rounded half-away (NOT floor(x+0.5), whose
  // addition itself rounds half-ulp below each .5 boundary — would diverge
  // from DuckDB round())
  private def roundHalfAway(x: Double): Long =
    graft.operators.KMeansIVF.roundHalfAway(x)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val arr = vec.eval(input)
    if (arr == null) return buf
    val a = arr.asInstanceOf[ArrayData]
    require(a.numElements() == d, s"expected $d-dim vector, got ${a.numElements()}")
    buf(cells) += 1
    require(buf(cells) <= maxRows,
      s"GramMatrixMicro overflow guard: more than $maxRows rows in one " +
        "aggregation buffer — a micro-unit product cell could wrap; " +
        "pre-aggregate per partition-group or widen the unit scale")
    val mu = new Array[Long](d)
    var i = 0
    while (i < d) { mu(i) = roundHalfAway(a.getDouble(i) * 1e6); i += 1 }
    var idx = 0
    i = 0
    while (i < d) {
      var j = i
      while (j < d) { buf(idx) += mu(i) * mu(j); idx += 1; j += 1 }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i <= cells) { a(i) += b(i); i += 1 }
    require(a(cells) <= maxRows,
      s"GramMatrixMicro overflow guard: merged buffer exceeds $maxRows rows")
    a
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Any](cells)
    var idx = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) { out(idx) = InternalRow(i, j, buf(idx)); idx += 1; j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream((cells + 1) * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i <= cells) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](cells + 1)
    var i = 0
    while (i <= cells) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): GramMatrixMicro =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): GramMatrixMicro =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(vec = c(0))
}

object GramMatrixAggregate {
  /** `gram_mu(vec)` as a Column aggregate; `vec` must be array<double>. */
  def gramMicro(vec: Column, d: Int): Column = {
    SparkSession.active.sessionState.functionRegistry.createOrReplaceTempFunction(
      s"graft_gram_$d",
      exprs => GramMatrixMicro(exprs.head, d).toAggregateExpression(),
      "built-in")
    call_function(s"graft_gram_$d", vec)
  }
}
