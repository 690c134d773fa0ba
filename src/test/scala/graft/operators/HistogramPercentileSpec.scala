package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class HistogramPercentileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val probs = Seq(0.1, 0.5, 0.95)

  private def referenceDf(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(col("g")).agg(
      expr("percentile(v, 0.1)").as("r0"),
      expr("percentile(v, 0.5)").as("r1"),
      expr("percentile(v, 0.95)").as("r2"))

  private def assertParity(df: org.apache.spark.sql.DataFrame): Unit = {
    // force multiple narrowing rounds with a tiny collect cap
    val got = HistogramPercentile.quantiles(df, "g", "v", probs,
        bins = 8, collectCap = 16)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val want = referenceDf(df)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got.keySet == want.keySet)
    for (k <- want.keys) assert(got(k) == want(k), s"group $k: ${got(k)} vs ${want(k)}")
  }

  test("parity with percentile() on mixed-shape groups incl. heavy duplicates") {
    val rnd = new scala.util.Random(7)
    val rows =
      // uniform group
      (0 until 500).map(_ => ("u", rnd.nextDouble() * 1000)) ++
      // heavy-duplicate group (one dominant value — constant-range path)
      (0 until 400).map(_ => ("dup", 42.0)) ++ (0 until 30).map(i => ("dup", i.toDouble)) ++
      // skewed exponential-ish group
      (0 until 300).map(_ => ("exp", math.pow(rnd.nextDouble(), 4) * 1e6)) ++
      // tiny groups: n = 1 and n = 2
      Seq(("one", 3.14), ("two", 1.0), ("two", 2.0))
    assertParity(rows.toDF("g", "v"))
  }

  test("parity with negative values and identical group values") {
    val rows = (0 until 200).map(i => ("neg", -1000.0 + i * 0.5)) ++
      (0 until 50).map(_ => ("const", -7.5))
    assertParity(rows.toDF("g", "v"))
  }

  test("NULL group key is a real group, like percentile() treats it") {
    val df = Seq((Some("a"), 1.0), (Some("a"), 3.0), (None, 10.0), (None, 30.0))
      .toDF("g", "v")
    val got = HistogramPercentile.quantiles(df, "g", "v", Seq(0.5))
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    assert(got == Map(Some("a") -> 2.0, None -> 20.0))
  }

  test("nulls are ignored like percentile() does") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)))
      .toDF("g", "v")
    val got = HistogramPercentile.quantiles(df, "g", "v", Seq(0.5))
      .collect().head.getDouble(1)
    assert(got == 2.0)
  }

  // PropertyFuzzSpec counterexample: equal bracketing order statistics must
  // short-circuit — (1-f)·1.5 + f·1.5 = 1.5000000000000002 ulp-noise
  test("rank inside a duplicate run returns the value exactly (no ulp noise)") {
    val df = Seq(("x", 1.5), ("x", 2.0), ("x", 1.5)).toDF("g", "v")
    val got = HistogramPercentile.quantiles(df, "g", "v", Seq(0.1), bins = 8, collectCap = 4)
      .collect().head.getDouble(1)
    assert(got == 1.5) // exact — not 1.5000000000000002
  }

  // PropertyFuzzSpec counterexample: > collectCap COPIES of one value can
  // never split across buckets; the stalled range must resolve by value
  // counts instead of spinning all 64 narrowing rounds
  test("duplicate-heavy range beyond collectCap converges via value counts") {
    val df = (Seq.fill(5)(0.0) :+ -1.7642974853515625e-5).map(("y", _)).toDF("g", "v")
    assertParity2(df, Seq(0.1, 0.5, 0.9), bins = 8, collectCap = 4)
  }

  private def assertParity2(
      df: org.apache.spark.sql.DataFrame, probs: Seq[Double], bins: Int, collectCap: Int): Unit = {
    val got = HistogramPercentile.quantiles(df, "g", "v", probs, bins, collectCap)
      .collect().map(r => r.getString(0) -> probs.indices.map(i => r.getDouble(1 + i))).toMap
    val aggs = probs.map(p => expr(s"percentile(v, $p)"))
    val want = df.groupBy(col("g")).agg(aggs.head, aggs.tail: _*)
      .collect().map(r => r.getString(0) -> probs.indices.map(i => r.getDouble(1 + i))).toMap
    assert(got == want)
  }
}
