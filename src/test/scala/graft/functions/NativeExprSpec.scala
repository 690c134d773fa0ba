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

  test("expressions usable from SQL after registration") {
    VectorExpressions.md5Long(lit("warm")) // ensure registered
    val v = spark.sql("SELECT graft_md5_long('abc') AS h").head().getLong(0)
    val expected = spark.range(1)
      .select(TextHash.md5LongBuiltins(lit("abc"))).head().getLong(0)
    assert(v == expected)
  }
}
