package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenCompile
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Regression guard: projections over the custom array expressions must
  * COMPILE under codegen. A helper signature returning Object once knocked
  * every projection containing them back to the interpreter ("Expr codegen
  * error and falling back to interpreter mode" at WARN — easy to miss). */
class CodegenCompileSpec extends AnyFunSuite {
  TestSpark.spark // force session init (SQLConf etc.)

  private val as = (0 until 16).map(TextHash.permA).toArray
  private val bs = (0 until 16).map(TextHash.permB).toArray

  test("shingle-hash expressions compile in an UnsafeProjection") {
    val text = BoundReference(0, StringType, nullable = true)
    CodegenCompile.compileUnsafeProjection(Seq(
      WordShingleHashes(text, 3, TextHash.P),
      CharShingleHashes(text, 8, TextHash.P, 2),
      PositionedWindowHashes(text, 32)))
  }

  test("a 64-entry fused BPE merge table compiles (nested mergePair would not)") {
    val text = BoundReference(0, StringType, nullable = true)
    val table = (0 until 64).map(i => (s"a$i", s"b$i")).toArray
    CodegenCompile.compileUnsafeProjection(Seq(BpeApplyMerges(text, table)))
  }

  test("signature + 16 getItems (subexpr elimination) compiles") {
    val hashes = BoundReference(0, ArrayType(LongType, containsNull = false), nullable = true)
    val sig = MinHashSignature(hashes, as, bs, TextHash.P)
    val exprs: Seq[Expression] =
      Seq[Expression](hashes) ++ (0 until 16).map(i => GetArrayItem(sig, Literal(i)))
    CodegenCompile.compileUnsafeProjection(exprs)
  }

  test("second-minimum signature compiles alongside the minimum signature") {
    val hashes = BoundReference(0, ArrayType(LongType, containsNull = false), nullable = true)
    val sig = MinHashSignature(hashes, as, bs, TextHash.P)
    val sig2 = MinHash2Signature(hashes, as, bs, TextHash.P)
    val exprs: Seq[Expression] = Seq[Expression](hashes) ++
      (0 until 16).map(i => GetArrayItem(sig, Literal(i))) ++
      (0 until 16).map(i => GetArrayItem(sig2, Literal(i)))
    CodegenCompile.compileUnsafeProjection(exprs)
  }

  test("full-text expression set compiles (md5 array, rolling min, dot, centroids)") {
    val text = BoundReference(0, StringType, nullable = true)
    val arr = BoundReference(1, ArrayType(StringType, containsNull = true), nullable = true)
    val vec = BoundReference(2, ArrayType(DoubleType, containsNull = false), nullable = true)
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    CodegenCompile.compileUnsafeProjection(Seq(
      Md5Long(text),
      Md5LongArray(arr, TextHash.P),
      MinRollingMd5(text, 8, 4),
      DotProduct(vec, vec),
      NearestCentroids(vec, cents, 2),
      SimHash60(text)))
  }

  test("HadamardRotate compiles in an UnsafeProjection") {
    val vq = BoundReference(0, ArrayType(LongType, containsNull = false), nullable = true)
    CodegenCompile.compileUnsafeProjection(Seq(
      HadamardRotate(vq, Array(1L, -1L, 1L, 1L))))
  }

  test("SortedIntersectCount compiles in an UnsafeProjection") {
    val a = BoundReference(0, ArrayType(LongType, containsNull = false), nullable = true)
    val b = BoundReference(1, ArrayType(LongType, containsNull = false), nullable = true)
    CodegenCompile.compileUnsafeProjection(Seq(SortedIntersectCount(a, b)))
  }

  test("MinTrialHash compiles in an UnsafeProjection") {
    val id = BoundReference(0, StringType, nullable = true)
    val w = BoundReference(1, LongType, nullable = true)
    CodegenCompile.compileUnsafeProjection(Seq(MinTrialHash(id, w, 1L << 40)))
  }

  test("HilbertIndex compiles in an UnsafeProjection") {
    val x = BoundReference(0, LongType, nullable = true)
    val y = BoundReference(1, LongType, nullable = true)
    CodegenCompile.compileUnsafeProjection(Seq(HilbertIndex(x, y, 16)))
  }

  test("Jaro-Winkler compiles in an UnsafeProjection") {
    val a = BoundReference(0, StringType, nullable = true)
    val b = BoundReference(1, StringType, nullable = true)
    CodegenCompile.compileUnsafeProjection(Seq(JaroWinklerExpr(a, b)))
  }

  test("PqEncodeMicro compiles in an UnsafeProjection") {
    val vq = BoundReference(0, ArrayType(LongType, containsNull = false), nullable = true)
    val cb = Array.fill(2, 3, 4)(1L)
    CodegenCompile.compileUnsafeProjection(Seq(PqEncodeMicro(vq, cb)))
  }

  test("BPE expressions compile in an UnsafeProjection (incl nested merges)") {
    val text = BoundReference(0, StringType, nullable = true)
    val init = BpeInitSymbols(text)
    // the applyMerges shape: merges nest left-to-right as one projection
    val nested = (1 to 4).foldLeft(init: Expression)((acc, i) =>
      BpeMergePair(acc, Literal(s"a$i"), Literal(s"b$i")))
    CodegenCompile.compileUnsafeProjection(Seq(init, nested))
  }
}
