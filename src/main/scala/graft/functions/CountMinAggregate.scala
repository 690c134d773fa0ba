package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Count-Min sketch as a bounded custom aggregate — the heavy-hitter /
  * frequency-estimation primitive of a streaming-scale token pipeline.
  *
  * The buffer is a fixed depth×width long matrix (default 4×1024 = 32 KB)
  * that combines map-side cell-by-cell, so the shuffle carries one matrix
  * per partition regardless of token volume; estimates are
  * `min_i(cell(i, h_i(key)))`, upper bounds that overshoot only on cell
  * collisions.
  *
  * DETERMINISTIC BY CONSTRUCTION: the row hashes are the SAME affine
  * permutations mod 2³¹−1 over the portable md5 base hash that MinHash uses
  * ([[TextHash.perm]] / [[TextHash.permSql]]), so the ENTIRE sketch — every
  * cell, every estimate, every collision — is replayable in DuckDB SQL and
  * the oracle checks the estimates EXACTLY, not within a tolerance band
  * (q63; contrast q32's rsd-gated HLL, where Spark's sketch internals are
  * not portable).
  *
  * Input must be the REDUCED base hash ([[TextHash.baseHash]], < 2³¹−1):
  * `a·h + b` then stays under 2⁶² — no 64-bit overflow on either engine.
  */
case class CountMinSketchAgg(
    keyHash: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val cells = depth * width

  override def children: Seq[Expression] = Seq(keyHash)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](cells)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val h = keyHash.eval(input)
    if (h != null) {
      val hv = h.asInstanceOf[Long]
      var i = 0
      while (i < depth) {
        val cell = ((graft.functions.TextHash.permA(i) * hv +
          graft.functions.TextHash.permB(i)) % graft.functions.TextHash.P % width).toInt
        buf(i * width + cell) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < cells) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(java.lang.Long.valueOf).toArray[Any])

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(cells * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < cells) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](cells)
    var i = 0
    while (i < cells) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): CountMinSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CountMinSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(keyHash = c(0))
}

object CountMinAggregate {
  /** `count_min(baseHash)` as a Column aggregate → flat array<long> of the
    * depth×width cell matrix, row-major. */
  def countMin(keyHash: Column, depth: Int, width: Int): Column = {
    SparkSession.active.sessionState.functionRegistry.createOrReplaceTempFunction(
      s"graft_cms_${depth}_$width",
      exprs => CountMinSketchAgg(exprs.head, depth, width).toAggregateExpression(),
      "built-in")
    call_function(s"graft_cms_${depth}_$width", keyHash)
  }

  /** Estimate column for a reduced base-hash `h` against a sketch array
    * column: `min_i(cells[i·width + h_i(h)])` — the same cell arithmetic as
    * the aggregate, so estimate(h) is exact-deterministic. */
  def estimate(sketch: Column, h: Column, depth: Int, width: Int): Column = {
    import org.apache.spark.sql.functions._
    val reads = (0 until depth).map { i =>
      val cell = (h * TextHash.permA(i) + TextHash.permB(i)) % TextHash.P % width
      element_at(sketch, (lit(i * width) + cell + 1).cast("int"))
    }
    least(reads: _*)
  }
}
