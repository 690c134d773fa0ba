package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Per-group top-k as a custom `TypedImperativeAggregate` — the map-side-
  * combinable alternative to `row_number().over(window) <= k`.
  *
  * The window formulation shuffles EVERY row of every group and sorts whole
  * partitions before discarding all but k rows. This aggregate keeps a
  * bounded k-element buffer per group that combines on the map side, so the
  * shuffle carries at most k rows per group — the difference between
  * shuffling 100 TB and shuffling k·|groups| at scale.
  *
  * Ordering: score DESC, payload ASC (deterministic tie-break). Output:
  * `array<struct<score double, payload bigint>>`, best first.
  */
case class TopKByScore(
    score: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {

  override def children: Seq[Expression] = Seq(score, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("payload", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    ArrayBuffer.empty

  private def trim(buf: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    val sorted = buf.sortBy { case (s, p) => (-s, p) }
    if (sorted.length > k) sorted.take(k) else sorted
  }

  override def update(
      buf: ArrayBuffer[(Double, Long)], input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val s = score.eval(input)
    val p = payload.eval(input)
    if (s == null || p == null) buf
    else {
      buf += ((s.asInstanceOf[Double], p.asInstanceOf[Long]))
      // keep the buffer bounded: trim once it doubles past k
      if (buf.length > 2 * k) trim(buf) else buf
    }
  }

  override def merge(
      a: ArrayBuffer[(Double, Long)], b: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] =
    trim(a ++= b)

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any =
    new GenericArrayData(trim(buf).map { case (s, p) =>
      InternalRow(s, p)
    }.toArray[Any])

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val t = trim(buf)
    out.writeInt(t.length)
    t.foreach { case (s, p) => out.writeDouble(s); out.writeLong(p) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < n) { buf += ((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKByScore =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByScore =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(score = c(0), payload = c(1))
}

object TopKAggregate {
  /** `top_k(score, payload)` as a Column aggregate. */
  def topK(score: Column, payload: Column, k: Int): Column = {
    SparkSession.active.sessionState.functionRegistry.createOrReplaceTempFunction(
      s"graft_top_$k",
      exprs => TopKByScore(exprs.head, exprs(1), k).toAggregateExpression(),
      "built-in")
    call_function(s"graft_top_$k", score, payload)
  }
}
