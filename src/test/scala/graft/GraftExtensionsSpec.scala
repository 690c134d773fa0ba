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

      // bounded custom aggregates, SQL-callable with literal size params
      val topk = s.sql(
        """SELECT graft_topk(score, p, 2) AS t FROM VALUES
          |  (1.0D, 10L), (3.0D, 30L), (2.0D, 20L) AS v(score, p)""".stripMargin)
        .head().getSeq[org.apache.spark.sql.Row](0).map(r => (r.getDouble(0), r.getLong(1)))
      assert(topk == Seq((3.0, 30L), (2.0, 20L)))
      val cms = s.sql(
        "SELECT graft_count_min(h, 4, 1024) AS c FROM VALUES (5L), (5L), (9L) AS v(h)")
        .head().getSeq[Long](0)
      assert(cms.length == 4 * 1024 && cms.sum == 3 * 4)
      val bloomHits = s.sql(
        "SELECT graft_bloom(h, 64, 2) AS b FROM VALUES (5L) AS v(h)")
        .head().getSeq[Long](0).map(java.lang.Long.bitCount(_)).sum
      assert(bloomHits >= 1 && bloomHits <= 2) // 2 probes, possibly colliding
      val gram = s.sql(
        "SELECT graft_gram_micro(v, 2) AS g FROM VALUES (array(1.0D, 2.0D)) AS t(v)")
        .head().getSeq[org.apache.spark.sql.Row](0)
      assert(gram.length == 3) // upper triangle of a 2x2
      val mg = s.sql(
        "SELECT graft_misra_gries(t, 2) AS m FROM VALUES ('a'),('a'),('b'),('a') AS v(t)")
        .head().getSeq[org.apache.spark.sql.Row](0).map(r => (r.getString(0), r.getLong(1)))
      assert(mg == Seq(("a", 3L), ("b", 1L))) // k >= distinct: exact counts
      val bmBits = s.sql(
        "SELECT graft_bitmap(k, 128) AS b FROM VALUES (0L),(64L),(64L),(127L) AS v(k)")
        .head().getSeq[Long](0).map(java.lang.Long.bitCount(_)).sum
      assert(bmBits == 3) // exact distinct of {0, 64, 127}
      intercept[Exception] {
        s.sql("SELECT graft_topk(score, p, p) FROM VALUES (1.0D, 1L) AS v(score, p)").collect()
      }
    } finally {
      // do NOT stop (that would kill the JVM-shared SparkContext);
      // restore the suite-shared default session
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach(SparkSession.setDefaultSession)
    }
  }
}
