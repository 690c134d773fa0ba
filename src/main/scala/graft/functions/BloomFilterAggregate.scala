package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bloom filter as a bounded custom aggregate — the semi-join-reduction
  * primitive for pruning a huge fact table against a dimension subset
  * BEFORE the join shuffle.
  *
  * The buffer is a fixed bitset (`numBits/64` longs, default 2¹⁶ bits =
  * 8 KB) that combines map-side by bitwise OR, so building the filter
  * shuffles one bitset per partition regardless of build-side row count.
  * Membership tests ([[BloomFilterAggregate.mightContain]]) are pure
  * built-in column math over the broadcast bitset — evaluated map-side on
  * the probe scan, they drop non-matching fact rows before any exchange.
  * No false negatives (every inserted key tests true), so `prune → exact
  * join` is result-identical to the plain join; false positives only cost
  * wasted probe rows, removed by the join itself.
  *
  * At 100 TB this is the plan when the dimension subset is too big to
  * broadcast as a hash relation but its BLOOM FILTER (fixed KBs) is not:
  * the fact side sheds (1 − fpp) of its non-matching volume map-side.
  * Spark's own runtime row-group filtering applies the same idea inside
  * AQE; this operator makes it explicit, deterministic, and portable.
  *
  * Hash family: the same affine permutations mod 2³¹−1 over the portable
  * md5 base hash that MinHash/Count-Min use ([[TextHash.perm]]), so every
  * set bit is replayable in DuckDB SQL if an oracle ever needs to check
  * the filter itself (the q66 oracle checks the JOIN RESULT, which the
  * filter provably cannot change).
  *
  * Input must be the REDUCED base hash ([[TextHash.baseHash]], < 2³¹−1):
  * `a·h + b` then stays under 2⁶² — no 64-bit overflow on either engine.
  */
case class BloomFilterAgg(
    keyHash: Expression,
    numBits: Int,
    depth: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits % 64 == 0, s"numBits must be a multiple of 64, got $numBits")
  private val words = numBits / 64

  override def children: Seq[Expression] = Seq(keyHash)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val h = keyHash.eval(input)
    if (h != null) {
      val hv = h.asInstanceOf[Long]
      var i = 0
      while (i < depth) {
        val bit = ((TextHash.permA(i) * hv + TextHash.permB(i)) % TextHash.P % numBits).toInt
        buf(bit >>> 6) |= 1L << (bit & 63)
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(java.lang.Long.valueOf).toArray[Any])

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(words * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < words) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](words)
    var i = 0
    while (i < words) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(keyHash = c(0))
}

object BloomFilterAggregate {
  /** `bloom(baseHash)` as a Column aggregate → flat array<long> bitset of
    * `numBits` bits, word `w` holding bits `[64w, 64w+63]`. */
  def bloom(keyHash: Column, numBits: Int, depth: Int): Column = {
    SparkSession.active.sessionState.functionRegistry.createOrReplaceTempFunction(
      s"graft_bloom_${numBits}_$depth",
      exprs => BloomFilterAgg(exprs.head, numBits, depth).toAggregateExpression(),
      "built-in")
    call_function(s"graft_bloom_${numBits}_$depth", keyHash)
  }

  /** Membership test for a reduced base-hash `h` against a bitset column:
    * all `depth` probed bits set. Pure built-ins (element_at + shiftright +
    * bitwise AND) — fully codegen'd, runs map-side on the probe scan.
    * `shiftright` goes through `call_function` because the Scala wrapper
    * only takes a literal shift amount; the SQL expression takes a column. */
  def mightContain(bitset: Column, h: Column, numBits: Int, depth: Int): Column =
    (0 until depth).map { i =>
      val bit = (h * TextHash.permA(i) + TextHash.permB(i)) % TextHash.P % numBits
      val word = element_at(bitset, shiftright(bit, 6).cast("int") + 1)
      call_function("shiftright", word, bit.bitwiseAND(lit(63L)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
}
