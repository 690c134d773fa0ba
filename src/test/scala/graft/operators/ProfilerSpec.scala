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

  test("sketch profile plans NO Expand; exact profile does (the scale contrast)") {
    // N exact countDistincts in one agg rewrite to Expand — (N+1)× the rows
    // into the shuffle. The HLL form must keep a plain partial+final agg.
    import org.apache.spark.sql.catalyst.plans.logical.Expand
    val df = Seq((1L, "a", 2.0, true)).toDF("a", "b", "c", "d")
    val exactPlan = Profiler.profile(df).queryExecution.optimizedPlan
    assert(exactPlan.collect { case e: Expand => e }.nonEmpty,
      s"expected the exact profile's multi-distinct Expand:\n$exactPlan")
    val sketchPlan = Profiler.profileSketch(df).queryExecution.optimizedPlan
    assert(sketchPlan.collect { case e: Expand => e }.isEmpty,
      s"sketch profile must not Expand:\n$sketchPlan")
    assert(sketchPlan.collectLeaves().size == 1)
  }

  test("sketch profile matches the exact profile on everything but the estimate") {
    val df = Seq(
      (1L, Some("aa"), Some(1.5)),
      (2L, None, Some(2.5)),
      (2L, Some("bb"), None),
      (3L, Some("aa"), Some(1.5))
    ).toDF("id", "s", "v")
    val exact = Profiler.profile(df).collect()
      .map(r => r.getString(0) -> r.toSeq).toMap
    val sk = Profiler.profileSketch(df).collect()
      .map(r => r.getString(0) -> r.toSeq).toMap
    assert(sk.keySet == exact.keySet)
    for (k <- exact.keySet) {
      // identical except position 4: exact n_distinct vs HLL estimate
      assert(sk(k).patch(4, Nil, 1) == exact(k).patch(4, Nil, 1))
      val est = sk(k)(4).asInstanceOf[Long]
      val ex = exact(k)(4).asInstanceOf[Long]
      assert(math.abs(est - ex) <= math.max(1L, (ex * 0.10).toLong),
        s"col $k: estimate $est vs exact $ex")
    }
  }
}
