package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (z-order) curve encoding — the multi-dimensional clustering key
  * behind data-layout optimization: sort/partition by `interleave(a, b)`
  * and range predicates on EITHER dimension touch few contiguous z-ranges,
  * which is what makes file-level min/max skipping effective on both
  * columns at once.
  *
  * Pure integer mask-and-shift column math (no UDF, fully codegen'd); the
  * identical arithmetic is replayable in DuckDB SQL (see the q67 oracle).
  */
object ZOrder {

  /** Spread the low 16 bits of `c` to the even bit positions 0,2,…,30. */
  def spread(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit z-value of two 16-bit coordinates: bits of `a` on even
    * positions, bits of `b` on odd. */
  def interleave(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** Reference JVM implementation (for tests / driver-side checks). */
  def spreadRef(x: Long): Long = {
    var v = x & 0xFFFFL
    v = (v | (v << 8)) & 0x00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0FL
    v = (v | (v << 2)) & 0x33333333L
    (v | (v << 1)) & 0x55555555L
  }

  def interleaveRef(a: Long, b: Long): Long =
    spreadRef(a) | (spreadRef(b) << 1)
}
