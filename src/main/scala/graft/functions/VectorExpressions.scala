package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two `array<double>` columns — a custom Catalyst
  * `Expression` with whole-stage codegen.
  *
  * Why not `aggregate(zip_with(a, b, _*_), 0d, _+_)`? Those higher-order
  * functions evaluate their lambda per element through the interpreter
  * (codegen fallback), which dominates the runtime of O(n²) similarity
  * joins. This expression compiles to a tight primitive `double` loop inside
  * the generated code — measured ~10× faster on the brute-force
  * embedding-dedup path — while keeping EXACTLY the same left-to-right
  * summation order (bit-identical results to the HOF form and to the
  * DuckDB oracle).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // callers guarantee array<double> inputs (VectorOps casts up front)
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // fail loudly on a length mismatch — silently truncating would be a
    // wrong answer, and the HOF form this is bit-compatible with
    // (aggregate(zip_with(...))) yields NULL there, not a partial sum
    if (y.numElements() != n)
      throw new IllegalArgumentException(
        s"graft_dot: vector length mismatch ($n vs ${y.numElements()})")
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "graft_dot: vector length mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Static helper callable from generated code (fully-qualified name). */
object Md5LongUtil {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** == `conv(substring(md5(s), 1, 15), 16, 10)` as a long: the top 60 bits
    * of the digest (8 big-endian bytes >>> 4 drops the 16th hex char). */
  def hash(s: org.apache.spark.unsafe.types.UTF8String): Long = hashBytes(s.getBytes)

  def hashBytes(bytes: Array[Byte]): Long = hashRange(bytes, 0, bytes.length)

  /** md5 of `n` byte segments starting at `off`, joined by single 0x20
    * separators — == hashBytes of the space-joined string's UTF-8 bytes,
    * without materializing the joined string. */
  def hashSegments(segs: Array[Array[Byte]], off: Int, n: Int): Long = {
    val d = md.get(); d.reset()
    var j = 0
    while (j < n) {
      if (j > 0) d.update(' '.toByte)
      d.update(segs(off + j))
      j += 1
    }
    val digest = d.digest()
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** min over trials `1..w` of `hash(id || "#" || j) % mod` — the integer
    * race key for weighted sampling ([[graft.operators.WeightedSample]]):
    * the minimum of w iid uniforms ranks items EXACTLY as the
    * Efraimidis–Spirakis `u^(1/w)` keys do, with no float pow anywhere.
    * O(w) digests per row; w is clamped to ≥ 1 (the generated call sits on
    * a primitive `long`, so the empty-trials case must not be null). */
  def minTrial(s: org.apache.spark.unsafe.types.UTF8String, w: Long, mod: Long): Long = {
    val d = md.get()
    val base = s.getBytes
    var best = Long.MaxValue
    var j = 1L
    val n = if (w < 1L) 1L else w
    while (j <= n) {
      d.reset()
      d.update(base)
      d.update(("#" + j).getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      val digest = d.digest()
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
      v = (v >>> 4) % mod
      if (v < best) best = v
      j += 1
    }
    best
  }

  /** md5 of `len` bytes at `off` with NO slice copy — the per-window
    * allocation is what dominates rolling/shingle hashing of long texts. */
  def hashRange(bytes: Array[Byte], off: Int, len: Int): Long = {
    val d = md.get(); d.reset()
    d.update(bytes, off, len)
    val digest = d.digest()
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Hash each string element; apply `% p` when p > 0. */
  def hashArray(arr: ArrayData, p: Long): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val h = hash(arr.getUTF8String(i))
      out(i) = if (p > 0) h % p else h
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Min md5Long over strided n-CHAR windows (char-correct via UTF8String
    * substring); whole string when shorter than n. Distinctness of windows
    * is irrelevant under min, so this equals
    * `array_min(transform(charShinglesStrided(s, n, stride), md5Long))`. */
  def minRolling(s: org.apache.spark.unsafe.types.UTF8String, n: Int, stride: Int): Long = {
    val len = s.numChars()
    if (len < n) return hash(s)
    var best = Long.MaxValue
    if (s.numBytes() == len) {
      // ASCII fast path: windows hashed in place (see charShingleHashes)
      val bytes = s.getBytes
      var i = 0
      while (i <= len - n) {
        val h = hashRange(bytes, i, n)
        if (h < best) best = h
        i += stride
      }
    } else {
      var i = 0
      while (i <= len - n) {
        val h = hash(s.substringSQL(i + 1, n))
        if (h < best) best = h
        i += stride
      }
    }
    best
  }
}

/** Native 60-bit md5 hash of a string column — same value as the portable
  * `conv(substring(md5(x), 1, 15), 16, 10)` formulation (and therefore the
  * same as the DuckDB oracle's `('0x' || substr(md5(x),1,15))::BIGINT`) but
  * without materializing the hex string, substring, and base-16 parse per
  * row — the dominant cost of shingle-heavy MinHash pipelines.
  */
case class Md5Long(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(v: Any): Any =
    Md5LongUtil.hash(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5LongUtil.hash($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Static helper for [[MinHashSignature]], callable from generated code. */
object MinHashUtil {
  def sig(arr: ArrayData, as: Array[Long], bs: Array[Long], p: Long): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val k = as.length
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < k) {
        val v = (as(j) * h + bs(j)) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }
}

/** All k MinHash permutation-minima in ONE pass over the shingle-hash array.
  *
  * The built-in formulation — k × `array_min(transform(hashes, h -> (a*h+b)%p))`
  * — walks the array k times through interpreted lambdas. This expression
  * does one native loop; values are identical ((a·h+b) mod p in 64-bit,
  * h < 2³¹ so no overflow), so the DuckDB oracle stays exact.
  */
case class MinHashSignature(child: Expression, as: Array[Long], bs: Array[Long], p: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    MinHashUtil.sig(v.asInstanceOf[ArrayData], as, bs, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("as", as, "long[]")
    val bsRef = ctx.addReferenceObj("bs", bs, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashUtil.sig($c, $asRef, $bsRef, ${p}L)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Static helper for [[MinHash2Signature]], callable from generated code. */
object MinHash2Util {
  def sig2(arr: ArrayData, as: Array[Long], bs: Array[Long], p: Long): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val k = as.length
    val m1 = Array.fill(k)(Long.MaxValue)
    val m2 = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < k) {
        val v = (as(j) * h + bs(j)) % p
        // the affine map mod prime p is injective over distinct inputs
        // (the hashed-shingle sets are distinct), so v == m1(j) never
        // recurs for a different element — no equality guard needed
        if (v < m1(j)) { m2(j) = m1(j); m1(j) = v }
        else if (v < m2(j)) m2(j) = v
        j += 1
      }
      i += 1
    }
    var j = 0
    while (j < k) { if (m2(j) == Long.MaxValue) m2(j) = m1(j); j += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(m2)
  }
}

/** The per-permutation SECOND-smallest minhash value — the multi-probe LSH
  * perturbation source: when a near-duplicate lacks the query's minimum
  * shingle, its minhash is most likely the query's second minimum, so
  * probing the band bucket with that one value swapped in recovers the
  * pair the exact bucket missed. Singleton sets fall back to the minimum
  * (the perturbed key degenerates to the exact key — a harmless no-op
  * probe). DuckDB replays it as
  * `coalesce(list_sort(perm_list)[2], list_sort(perm_list)[1])`.
  */
case class MinHash2Signature(child: Expression, as: Array[Long], bs: Array[Long], p: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    MinHash2Util.sig2(v.asInstanceOf[ArrayData], as, bs, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("as", as, "long[]")
    val bsRef = ctx.addReferenceObj("bs", bs, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHash2Util.sig2($c, $asRef, $bsRef, ${p}L)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Static helper for [[HadamardRotate]], callable from generated code. */
object HadamardUtil {
  def rotate(arr: ArrayData, signs: Array[Long]): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val d = signs.length
    // sign-flip once, then the ±1 fold — never per output element
    val sv = new Array[Long](d)
    var j = 0
    while (j < d) { sv(j) = arr.getLong(j) * signs(j); j += 1 }
    val out = new Array[Long](d)
    var i = 0
    while (i < d) {
      var acc = 0L
      j = 0
      while (j < d) {
        if ((java.lang.Long.bitCount((i & j).toLong) & 1) == 0) acc += sv(j)
        else acc -= sv(j)
        j += 1
      }
      out(i) = acc
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Signed-Hadamard rotation of a fixed-dimension `array<long>` in ONE
  * native pass — `rot[i] = Σ_j (−1)^popcount(i AND j) · signs[j] · v[j]`.
  * The HOF formulation (transform over aggregate over zip_with) would
  * rebuild the sign-flipped array — and any inlined upstream expression —
  * once per OUTPUT element (the documented HOF lambda trap); this
  * expression allocates two d-long arrays per row, total. Semantics are
  * pinned against a direct Scala H·D computation in OpqRotationSpec. */
case class HadamardRotate(child: Expression, signs: Array[Long])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    HadamardUtil.rotate(v.asInstanceOf[ArrayData], signs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sRef = ctx.addReferenceObj("signs", signs, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.HadamardUtil.rotate($c, $sRef)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Hash every element of a string array in one native call:
  * == `transform(arr, s -> md5Long(s) % p)` without the per-element
  * interpreted HOF iteration. `p <= 0` skips the modulo. */
case class Md5LongArray(child: Expression, p: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = Md5LongUtil.hashArray(v.asInstanceOf[ArrayData], p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5LongUtil.hashArray($c, ${p}L)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Native shingle hashing: distinct hashed n-gram sets straight from the
  * text, with no intermediate shingle-string arrays. Semantics lock-step
  * with `TextHash.wordShingles`/`charShingles` (trim = ASCII space only,
  * whitespace-run tokenization, whole-text fallback below n) so the DuckDB
  * oracle can replay via `list_distinct(list_transform(<shingles>, md5…))`.
  */
object ShingleUtil {
  private val ws = java.util.regex.Pattern.compile("\\s+")

  private def distinctArray(out: java.util.LinkedHashSet[java.lang.Long]) = {
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  // NOTE: the declared return type must be the concrete ArrayData subclass,
  // NOT `Any` — codegen assigns this call's result to an `ArrayData`
  // variable, and an Object-returning signature makes Janino reject the
  // whole generated class (silent interpreter fallback for the projection).
  def wordShingleHashes(s: org.apache.spark.unsafe.types.UTF8String, n: Int, p: Long)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val str = s.trim().toString
    val toks = ws.split(str, -1)
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    // each token's UTF-8 bytes once; shingle digests are fed token-bytes +
    // single 0x20 separators incrementally — byte-identical to hashing the
    // space-joined string, with no per-shingle String/array churn
    val tb = new Array[Array[Byte]](toks.length)
    var t = 0
    while (t < toks.length) {
      tb(t) = toks(t).getBytes(java.nio.charset.StandardCharsets.UTF_8); t += 1
    }
    if (toks.length >= n) {
      var i = 0
      while (i <= toks.length - n) {
        out.add(Md5LongUtil.hashSegments(tb, i, n) % p)
        i += 1
      }
    } else {
      out.add(Md5LongUtil.hashSegments(tb, 0, tb.length) % p)
    }
    distinctArray(out)
  }

  /** Occurrence-weighted 60-bit simhash of whitespace-tokenized text in one
    * native pass — value-identical to the compositional form
    * (explode(tokens) → md5Long → 60 conditional sums → majority vote),
    * which needs a corpus-wide explode + 61-column aggregate; this is a
    * pure per-document function, so it should cost a map-side expression,
    * not a shuffle. Tokenization is the same `\s+` split of the
    * space-trimmed text as [[graft.functions.TextHash.tokens]]. */
  def simHash60(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val toks = ws.split(s.trim().toString, -1)
    val counts = new Array[Int](60)
    var n = 0
    var i = 0
    while (i < toks.length) {
      val h = Md5LongUtil.hashBytes(
        toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var j = 0
      while (j < 60) { counts(j) += ((h >>> j) & 1L).toInt; j += 1 }
      n += 1; i += 1
    }
    var out = 0L
    var j = 0
    while (j < 60) { if (counts(j) * 2 > n) out |= (1L << j); j += 1 }
    out
  }

  def charShingleHashes(s: org.apache.spark.unsafe.types.UTF8String, n: Int, p: Long, stride: Int)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val t = s.trim()
    val len = t.numChars()
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    if (len >= n) {
      if (t.numBytes() == len) {
        // ASCII fast path (bytes == chars): hash windows in place over one
        // materialized byte array — no per-window UTF8String + copy. Same
        // bytes, same md5, value-identical to the general path.
        val bytes = t.getBytes
        var i = 0
        while (i <= len - n) {
          out.add(Md5LongUtil.hashRange(bytes, i, n) % p)
          i += stride
        }
      } else {
        var i = 0
        while (i <= len - n) {
          out.add(Md5LongUtil.hashBytes(t.substringSQL(i + 1, n).getBytes) % p)
          i += stride
        }
      }
    } else {
      out.add(Md5LongUtil.hashBytes(t.getBytes) % p)
    }
    distinctArray(out)
  }

  /** POSITION-ORDERED md5 hashes of every n-char window of the trimmed
    * text — element i = hash of chars [i+1, i+n] (1-based), NO dedup, so
    * `posexplode` recovers (position, hash) pairs (what
    * [[charShingleHashes]]' set form cannot). Same ASCII in-place fast
    * path; value-identical to `md5Long(substring(trim(t), p, n))` — the
    * lockstep of `TextHash.md5LongSql(substr(...))` on the oracle side.
    * Texts shorter than n yield an EMPTY array (no truncated windows). */
  def positionedWindowHashes(s: org.apache.spark.unsafe.types.UTF8String, n: Int)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val t = s.trim()
    val len = t.numChars()
    if (len < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.emptyLongArray)
    val out = new Array[Long](len - n + 1)
    if (t.numBytes() == len) {
      val bytes = t.getBytes
      var i = 0
      while (i <= len - n) { out(i) = Md5LongUtil.hashRange(bytes, i, n); i += 1 }
    } else {
      var i = 0
      while (i <= len - n) {
        out(i) = Md5LongUtil.hashBytes(t.substringSQL(i + 1, n).getBytes)
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `ShingleUtil.wordShingleHashes` as a codegen'd expression. */
case class WordShingleHashes(child: Expression, n: Int, p: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    ShingleUtil.wordShingleHashes(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, p)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleUtil.wordShingleHashes($c, $n, ${p}L)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `ShingleUtil.simHash60` as a codegen'd expression. */
case class SimHash60(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullSafeEval(v: Any): Any =
    ShingleUtil.simHash60(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleUtil.simHash60($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `ShingleUtil.positionedWindowHashes` as a codegen'd expression. */
case class PositionedWindowHashes(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    ShingleUtil.positionedWindowHashes(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleUtil.positionedWindowHashes($c, $n)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `ShingleUtil.charShingleHashes` as a codegen'd expression. */
case class CharShingleHashes(child: Expression, n: Int, p: Long, stride: Int = 1)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    ShingleUtil.charShingleHashes(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, p, stride)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleUtil.charShingleHashes($c, $n, ${p}L, $stride)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Min over the md5Long hashes of strided n-char windows of a string —
  * the fused form of
  * `array_min(transform(charShinglesStrided(text, n, stride), md5Long))`:
  * no intermediate shingle array, no interpreted HOF. A text shorter than
  * n hashes as a single whole-string window (same fallback as
  * `TextHash.charShingles*`). */
case class MinRollingMd5(child: Expression, n: Int, stride: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(v: Any): Any =
    Md5LongUtil.minRolling(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5LongUtil.minRolling($c, $n, $stride)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** The weighted-sampling race key: min over trials `1..weight` of
  * `md5Long(id || "#" || j) % mod`, codegen'd as one static call
  * ([[Md5LongUtil.minTrial]]). `mod` keeps the key below 2^53 so it is
  * exact as the `double` score of [[TopKByScore]] (the q56 precedent:
  * 2^40). Weight must be a positive integer — values < 1 are clamped to 1
  * on both engines. */
case class MinTrialHash(left: Expression, right: Expression, mod: Long)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(id: Any, w: Any): Any =
    Md5LongUtil.minTrial(
      id.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      w.asInstanceOf[Long], mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (id, w) =>
      s"graft.functions.Md5LongUtil.minTrial($id, $w, ${mod}L)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Intersection SIZE of two ascending-sorted `array<long>` SETS (distinct
  * elements), as one codegen'd two-pointer merge — the exact-verify
  * kernel of [[graft.operators.PrefixFilterJoin]].
  *
  * Why not `size(array_intersect(a, b))`? The built-in materializes an
  * OpenHashSet of one side plus the intersection ARRAY per candidate pair,
  * only to take its length — allocation-bound on a verify join that runs
  * it ~0.4M times on ~140-element arrays. The merge does zero allocation
  * and O(na+nb) primitive compares; on sorted distinct inputs the count is
  * identical (proved on fuzzed inputs in SortedIntersectCountSpec).
  *
  * Callers MUST pre-sort (`sort_array`) and de-duplicate; this is not
  * checked row-wise (a check would cost what the merge saves). */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectUtil.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  // A one-line CALL, not an inlined loop: Catalyst duplicates this
  // expression wherever `inter` is referenced (the accept filter is pushed
  // into the join CONDITION, so 3 copies land in one generated join
  // method). Inlining the loop 3x pushed the method past HotSpot's
  // huge-method JIT limit and the whole join stage ran interpreted —
  // measured 6.7 s vs 2.1 s on q98 at sf0.1. The static helper keeps the
  // generated method tiny and JITs once (KMeansNearestUtil pattern; note
  // the CONCRETE `long` return type — see the CODEGEN TRAP in CLAUDE.md).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedIntersectUtil.count($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Static helper for [[SortedIntersectCount]] (callable from generated
  * code; concrete `long` return — never `Any`). */
object SortedIntersectUtil {

  def count(x: ArrayData, y: ArrayData): Long = {
    val na = x.numElements(); val nb = y.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val va = x.getLong(i); val vb = y.getLong(j)
      if (va == vb) { c += 1; i += 1; j += 1 }
      else if (va < vb) i += 1
      else j += 1
    }
    c
  }
}

/** Static helpers for [[NearestCentroids]] (callable from generated code). */
object KMeansNearestUtil {

  /** sqrt(dot(c,c)) per centroid, left-to-right fold. */
  def norms(cents: Array[Array[Double]]): Array[Double] =
    cents.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      math.sqrt(s)
    }

  /** Ids of the `nprobe` nearest centroids by cosine, ordered sim DESC with
    * ties to the smaller id — the exact ORDER BY the DuckDB oracle replays.
    * Cosine = dot/(sqrt(dot(v,v))·normC), every fold left-to-right, so the
    * bits match the oracle's `list_dot_product`-based formula. */
  def nearest(v: ArrayData, cents: Array[Array[Double]], normsC: Array[Double], nprobe: Int)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = v.numElements()
    val varr = new Array[Double](n)
    var vv = 0.0
    var i = 0
    while (i < n) { val x = v.getDouble(i); varr(i) = x; vv += x * x; i += 1 }
    val nv = math.sqrt(vv)
    val k = cents.length
    val sims = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cv = cents(c)
      var s = 0.0; var j = 0
      while (j < n) { s += varr(j) * cv(j); j += 1 }
      val sim = s / (nv * normsC(c))
      // NaN (zero-norm vector or centroid) maps to +inf: DuckDB's ORDER BY
      // cos DESC sorts NaN above every number, so parity requires NaN to
      // win here too (ties then break to the smaller cid, as everywhere)
      sims(c) = if (java.lang.Double.isNaN(sim)) Double.PositiveInfinity else sim
      c += 1
    }
    val m = math.min(nprobe, k)
    val out = new Array[Int](m)
    val taken = new Array[Boolean](k)
    var o = 0
    while (o < m) {
      // seed best with the first untaken cid, NOT -1: all-NaN sims (a
      // zero-norm vector) must degrade to the smallest cid — matching the
      // oracle's ORDER BY tie-break — instead of indexing with -1
      var best = -1; var bestSim = 0.0
      var c2 = 0
      while (c2 < k) {
        if (!taken(c2) && (best == -1 || sims(c2) > bestSim)) {
          bestSim = sims(c2); best = c2
        }
        c2 += 1
      }
      taken(best) = true; out(o) = best; o += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Top-`nprobe` nearest-centroid ids for an `array<double>` vector, as ONE
  * codegen'd call with the centroid matrix in the references array.
  *
  * The compositional formulation (an `array()` of k inline dot-product
  * cosines fed through argmax/sort) is semantically identical but, after
  * `CollapseProject`, inlines the k-dot array into every consumer — the
  * whole-stage source grows past what Janino compiles in reasonable time
  * (~2 s PER STAGE at k=10), dominating ANN query latency. One references-
  * backed loop keeps the generated code O(1) in k. */
case class NearestCentroids(child: Expression, cents: Array[Array[Double]], nprobe: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private lazy val normsC: Array[Double] = KMeansNearestUtil.norms(cents)

  // Case-class equality on Array params is reference identity, which would
  // defeat canonicalization / common-subexpression elimination across
  // separately-built but identical instances. Compare centroid CONTENT.
  override def equals(other: Any): Boolean = other match {
    case NearestCentroids(c, cs, np) =>
      np == nprobe && child == c &&
        java.util.Arrays.deepEquals(
          cents.asInstanceOf[Array[AnyRef]], cs.asInstanceOf[Array[AnyRef]])
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Objects.hash(
      child,
      Integer.valueOf(nprobe),
      Integer.valueOf(java.util.Arrays.deepHashCode(cents.asInstanceOf[Array[AnyRef]])))

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    KMeansNearestUtil.nearest(v.asInstanceOf[ArrayData], cents, normsC, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val normsRef = ctx.addReferenceObj("norms", normsC, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.KMeansNearestUtil.nearest($c, $centsRef, $normsRef, $nprobe)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object VectorExpressions {

  /** Register (idempotently) in the active session's function registry and
    * return a `Column` invocation. Registry-based exposure keeps us off
    * Spark-internal `Column` constructors (stable across the Spark 4 column
    * API split) and also makes the functions available to `spark.sql`. */
  private[functions] def registered(name: String, builder: Seq[Expression] => Expression)(
      args: Column*): Column = {
    SparkSession.active.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
    call_function(name, args: _*)
  }

  def dot(a: Column, b: Column): Column =
    registered("graft_dot", exprs => DotProduct(exprs.head, exprs(1)))(a, b)

  def md5Long(c: Column): Column =
    registered("graft_md5_long", exprs => Md5Long(exprs.head))(c)

  def sortedIntersectCount(a: Column, b: Column): Column =
    registered("graft_sorted_intersect_count",
      exprs => SortedIntersectCount(exprs.head, exprs(1)))(a, b)

  def minTrialHash(id: Column, weight: Column, mod: Long): Column =
    registered(s"graft_min_trial_hash_$mod",
      exprs => MinTrialHash(exprs.head, exprs(1), mod))(id, weight)

  def md5LongArray(arr: Column, p: Long): Column =
    registered(s"graft_md5_long_array_$p", exprs => Md5LongArray(exprs.head, p))(arr)

  def wordShingleHashes(text: Column, n: Int, p: Long): Column =
    registered(s"graft_word_shingle_hashes_${n}_$p",
      exprs => WordShingleHashes(exprs.head, n, p))(text)

  def charShingleHashes(text: Column, n: Int, p: Long, stride: Int = 1): Column =
    registered(s"graft_char_shingle_hashes_${n}_${p}_$stride",
      exprs => CharShingleHashes(exprs.head, n, p, stride))(text)

  def positionedWindowHashes(text: Column, n: Int): Column =
    registered(s"graft_positioned_window_hashes_$n",
      exprs => PositionedWindowHashes(exprs.head, n))(text)

  /** Input must already be trimmed (the Column-level shingle helpers trim
    * internally; this fused form does not). */
  def minRollingMd5(text: Column, n: Int, stride: Int): Column =
    registered(s"graft_min_rolling_md5_${n}_$stride",
      exprs => MinRollingMd5(exprs.head, n, stride))(text)

  def simHash60(text: Column): Column =
    registered("graft_simhash60", exprs => SimHash60(exprs.head))(text)

  def nearestCentroids(v: Column, cents: Array[Array[Double]], nprobe: Int): Column = {
    // fingerprint the centroid CONTENT into the registered name: the fit
    // changes between calls and registration is session-global by name
    val fp = cents.flatten.foldLeft(17L)((h, d) =>
      h * 31 + java.lang.Double.doubleToLongBits(d)).toHexString
    registered(s"graft_nearest_cents_${cents.length}_${nprobe}_$fp",
      exprs => NearestCentroids(exprs.head, cents, nprobe))(v)
  }

  def minhashSignature(hashes: Column, as: Array[Long], bs: Array[Long], p: Long): Column =
    // name carries a constants fingerprint: registration is session-global
    // and the analyzer resolves by name, so distinct configs must not alias
    registered(s"graft_minhash_sig_${as.length}_${(as.sum ^ bs.sum).toHexString}",
      exprs => MinHashSignature(exprs.head, as, bs, p))(hashes)

  def minhash2Signature(hashes: Column, as: Array[Long], bs: Array[Long], p: Long): Column =
    registered(s"graft_minhash_sig2_${as.length}_${(as.sum ^ bs.sum).toHexString}",
      exprs => MinHash2Signature(exprs.head, as, bs, p))(hashes)

  def hadamardRotate(vq: Column, signs: Array[Long]): Column = {
    val fp = signs.foldLeft(17L)((h, s2) => h * 31 + s2).toHexString
    registered(s"graft_hadamard_${signs.length}_$fp",
      exprs => HadamardRotate(exprs.head, signs))(vq)
  }
}
