package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The native codegen expressions must be value-identical to their
  * pure-built-in formulations (which in turn match the DuckDB oracle). */
class NativeExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Md5Long equals conv(substring(md5)) for varied strings") {
    val strs = Seq("", "a", "hello world", "äöü€ multibyte ✓", "x" * 10000)
    val df = strs.toDF("s").select(
      TextHash.md5Long(col("s")).as("native"),
      TextHash.md5LongBuiltins(col("s")).as("builtin"))
    df.collect().foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("DotProduct equals HOF aggregate/zip_with fold, incl. summation order") {
    val df = Seq(
      (Array(1.5, -2.25, 3.0e10, 1.0e-7), Array(0.5, 4.0, -1.0e-10, 2.0)),
      (Array(0.1, 0.2), Array(0.3, 0.4))
    ).toDF("a", "b")
    val out = df.select(
      VectorExpressions.dot(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("hof"))
    out.collect().foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), "must be bit-identical")
    }
  }

  test("DotProduct fails loudly on a vector length mismatch (no silent truncation)") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(VectorExpressions.dot(col("a"), col("b"))).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      c.getMessage != null && c.getMessage.contains("length mismatch")))
  }

  test("Md5LongArray equals per-element transform") {
    val df = Seq(Seq("a", "bb", "hello world", "")).toDF("arr")
    val out = df.select(
      VectorExpressions.md5LongArray(col("arr"), TextHash.P).as("native"),
      transform(col("arr"), s => TextHash.md5LongBuiltins(s) % TextHash.P).as("hof"))
      .head()
    assert(out.getSeq[Long](0) == out.getSeq[Long](1))
  }

  test("MinRollingMd5 equals array_min over strided shingles, incl. short text") {
    val df = Seq("the quick brown fox jumps over it", "tiny", "exact8ch").toDF("s")
    val out = df.select(
      VectorExpressions.minRollingMd5(col("s"), 8, 4).as("native"),
      array_min(transform(TextHash.charShinglesStrided(col("s"), 8, 4),
        sh => TextHash.md5LongBuiltins(sh))).as("hof"))
    out.collect().foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("fused shingle-hashers equal the string-shingle + hash composition") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b",                 // fewer tokens than n -> whole-text fallback
      "spaced    out   doc", // whitespace runs
      "tiny"                 // shorter than char n
    ).toDF("s")
    val out = df.select(
      VectorExpressions.wordShingleHashes(col("s"), 3, TextHash.P).as("w_native"),
      transform(TextHash.wordShingles(col("s"), 3),
        x => TextHash.md5LongBuiltins(x) % TextHash.P).as("w_str"),
      VectorExpressions.charShingleHashes(col("s"), 8, TextHash.P).as("c_native"),
      transform(TextHash.charShingles(col("s"), 8),
        x => TextHash.md5LongBuiltins(x) % TextHash.P).as("c_str"))
    out.collect().foreach { r =>
      assert(r.getSeq[Long](0).toSet == r.getSeq[Long](1).toSet)
      assert(r.getSeq[Long](2).toSet == r.getSeq[Long](3).toSet)
    }
  }

  test("expressions usable from SQL after registration") {
    VectorExpressions.md5Long(lit("warm")) // ensure registered
    val v = spark.sql("SELECT graft_md5_long('abc') AS h").head().getLong(0)
    val expected = spark.range(1)
      .select(TextHash.md5LongBuiltins(lit("abc"))).head().getLong(0)
    assert(v == expected)
  }
}
