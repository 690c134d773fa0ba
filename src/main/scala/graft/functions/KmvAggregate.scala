package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** KMV (bottom-k) distinct sketch as ONE bounded aggregate: the k smallest
  * DISTINCT hash values of the group, ascending.
  *
  * Unlike [[TopKByScore]] (which keeps duplicates — correct for ranking,
  * wrong for cardinality), the buffer is a sorted SET, so callers need no
  * upstream `distinct()` — the stateful dedup lives inside the aggregate.
  * That makes it legal as a STREAMING windowed aggregation (exact distinct
  * aggregates are unsupported there, and a separate dropDuplicates would
  * be a second stateful operator); the buffer serializes through the state
  * store between micro-batches (`StreamingSketchSpec` discipline).
  *
  * Estimator contract (the q143 KMV form): with fewer than k distinct
  * hashes the sketch IS the exact set (estimate = its size); at k the
  * estimate is `(k-1)·M div h_(k)` — integer throughout when the hash
  * domain M keeps (k-1)·M inside int64. Sketches merge losslessly by set
  * union + re-trim (any hash in the merged bottom-k ranks ≤ k in its own
  * input sketch).
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def trim(b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    while (b.size > k) b.pollLast()
    b
  }

  override def update(
      b: java.util.TreeSet[java.lang.Long], input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      b.add(v.asInstanceOf[Long])
      trim(b)
    }
    b
  }

  override def merge(
      a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    a.addAll(b)
    trim(a)
  }

  override def eval(b: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](b.size)
    val it = b.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(b: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    val it = b.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { b.add(in.readLong()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
}

object KmvAggregate {
  /** `kmv(hash)` as a Column aggregate: ascending bottom-k distinct set. */
  def kmv(hash: Column, k: Int): Column = {
    SparkSession.active.sessionState.functionRegistry.createOrReplaceTempFunction(
      s"graft_kmv_$k",
      exprs => KmvSketch(exprs.head, k).toAggregateExpression(),
      "built-in")
    call_function(s"graft_kmv_$k", hash)
  }
}
