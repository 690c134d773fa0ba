package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions-configured session exposes graft functions to SQL") {
    // separate session instance in the same JVM via the public
    // withExtensions mechanism (no library-side registration call). The
    // config-string form ("spark.sql.extensions=graft.GraftExtensions")
    // is equivalent but only applies when the session CREATES the
    // SparkContext, which a shared-JVM test suite can't guarantee.
    val prior = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val dot = s.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .head().getDouble(0)
      assert(dot == 11.0)
      val h1 = s.sql("SELECT graft_md5_long('abc') AS h").head().getLong(0)
      val h2 = s.sql("SELECT conv(substring(md5('abc'), 1, 15), 16, 10) AS h")
        .head().getString(0).toLong
      assert(h1 == h2)

      // the injected planner strategy resolves the custom as-of node
      // WITHOUT latestPriorMerge's experimental.extraStrategies fallback
      import s.implicits._
      assert(!s.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      val lPlan = Seq((1L, 10L, "a")).toDF("k", "t", "tag").queryExecution.analyzed
      val rPlan = Seq((1L, 5L, 2.5)).toDF("k", "t", "v").queryExecution.analyzed
      def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
        p.output.find(_.name == n).get
      val node = graft.plans.AsOfJoinNode(lPlan, rPlan,
        attr(lPlan, "k"), attr(lPlan, "t"), attr(rPlan, "k"), attr(rPlan, "t"))
      val out = org.apache.spark.sql.graftbridge.GraftSqlBridge.ofRows(s, node).collect()
      assert(out.length == 1 && out.head.getDouble(5) == 2.5,
        "extensions-injected strategy must plan AsOfJoinNode")
    } finally {
      // do NOT stop (that would kill the JVM-shared SparkContext);
      // restore the suite-shared default session
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach(SparkSession.setDefaultSession)
    }
  }
}
