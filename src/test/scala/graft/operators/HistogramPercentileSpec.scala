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
}
