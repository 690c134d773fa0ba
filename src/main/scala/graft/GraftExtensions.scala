package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, Md5Long}

/** Session-extension installer for the engine's custom Catalyst
  * expressions — the idiomatic deployment path:
  *
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *     ...
  * }}}
  *
  * makes `graft_dot` / `graft_md5_long` available to every session (SQL and
  * DataFrame API) without per-call registration. `VectorExpressions` also
  * self-registers lazily so library calls work on vanilla sessions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - native dot product of two array<double>"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_md5_long"),
      info("graft_md5_long", "graft_md5_long(s) - top 60 bits of md5(s) as bigint"),
      (exprs: Seq[Expression]) => Md5Long(exprs.head)))
    // the as-of join's custom physical operator (plans/AsOfJoinPlan.scala);
    // AsOfJoin.latestPriorMerge also installs it per-session for callers
    // on vanilla sessions
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
