package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ProfilerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("per-column stats over mixed types, nulls, and duplicates") {
    val df = Seq(
      (1L, Some("aa"), Some(1.5)),
      (2L, None, Some(2.5)),
      (2L, Some("bb"), None),
      (3L, Some("aa"), Some(1.5))
    ).toDF("id", "s", "v")
    val p = Profiler.profile(df).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5), r.getString(6))).toMap
    assert(p.keySet == Set("id", "s", "v"))
    assert(p("id") == (("bigint", 4L, 0L, 3L, "1", "3")))
    assert(p("s") == (("string", 4L, 1L, 2L, "aa", "bb")))
    val (vt, vn, vnull, vdist, vmin, vmax) = p("v")
    assert(vt == "double" && vn == 4L && vnull == 1L && vdist == 2L)
    assert(vmin == "1.5" && vmax == "2.5")
  }

  test("repr truncation caps long strings") {
    val df = Seq(("x" * 100)).toDF("t")
    val r = Profiler.profile(df, reprLen = 8).head()
    assert(r.getAs[String]("min_repr") == "x" * 8)
  }

  test("schema-generic means HOSTILE names too: dots and backticks resolve") {
    val df = Seq((1L, "a"), (2L, "b"), (2L, null))
      .toDF("user.id", "weird`col")
    val p = Profiler.profile(df).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(p.keySet == Set("user.id", "weird`col"))
    assert(p("user.id") == ((0L, 2L)))
    assert(p("weird`col") == ((1L, 2L)))
  }

  test("single pass: the N-column profile reads its input once") {
    // the generic profiler must not plan one scan per column — the
    // optimized plan has exactly ONE leaf (multi-distinct rewrites to
    // Expand over that single scan, which is still one pass)
    val df = Seq((1L, "a", 2.0, true)).toDF("a", "b", "c", "d")
    val plan = Profiler.profile(df).queryExecution.optimizedPlan
    val leaves = plan.collectLeaves()
    assert(leaves.size == 1, s"expected 1 leaf scan, got ${leaves.size}:\n$plan")
  }
}
