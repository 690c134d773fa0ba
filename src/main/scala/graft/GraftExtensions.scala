package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType}

import graft.functions.{BitmapDistinctAgg, BloomFilterAgg, CountMinSketchAgg, DotProduct, GramMatrixMicro, Md5Long, MisraGriesAgg, TopKByScore}

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

  /** Size parameters shape the aggregation buffer, so they must be literal
    * ints at registration time (matching the Column-API wrappers, which
    * take plain Int). */
  private def intLit(e: Expression, name: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  /** The TypedImperativeAggregates eval their key child and cast the result
    * (`v.asInstanceOf[Long]` etc.) — ExpectsInputTypes is private[sql], so
    * an INT-typed SQL argument would otherwise surface as a runtime
    * ClassCastException deep in the aggregate. Coerce at the function
    * boundary instead: wrap in Cast unless the type already matches. */
  private def coerce(e: Expression, to: DataType): Expression =
    if (e.resolved && e.dataType == to) e else Cast(e, to)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - native dot product of two array<double>"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_md5_long"),
      info("graft_md5_long", "graft_md5_long(s) - top 60 bits of md5(s) as bigint"),
      (exprs: Seq[Expression]) => Md5Long(exprs.head)))
    // bounded custom aggregates, SQL-callable with literal size params
    ext.injectFunction((
      FunctionIdentifier("graft_topk"),
      info("graft_topk", "graft_topk(score, payload, k) - bounded per-group top-k by score desc"),
      (exprs: Seq[Expression]) => TopKByScore(coerce(exprs.head, DoubleType),
        coerce(exprs(1), LongType), intLit(exprs(2), "k")).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("graft_count_min"),
      info("graft_count_min", "graft_count_min(base_hash, depth, width) - count-min sketch cells"),
      (exprs: Seq[Expression]) => CountMinSketchAgg(coerce(exprs.head, LongType),
        intLit(exprs(1), "depth"), intLit(exprs(2), "width")).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom"),
      info("graft_bloom", "graft_bloom(base_hash, num_bits, depth) - bloom filter bitset"),
      (exprs: Seq[Expression]) => BloomFilterAgg(coerce(exprs.head, LongType),
        intLit(exprs(1), "num_bits"), intLit(exprs(2), "depth")).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("graft_misra_gries"),
      info("graft_misra_gries", "graft_misra_gries(key, k) - bounded heavy-hitter summary (est <= count <= est + n/(k+1))"),
      (exprs: Seq[Expression]) => MisraGriesAgg(coerce(exprs.head, StringType),
        intLit(exprs(1), "k")).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("graft_bitmap"),
      info("graft_bitmap", "graft_bitmap(key, capacity) - exact distinct bitmap over [0, capacity) as array<bigint> words"),
      (exprs: Seq[Expression]) => BitmapDistinctAgg(coerce(exprs.head, LongType),
        intLit(exprs(1), "capacity")).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("graft_hll"),
      info("graft_hll", "graft_hll(hash) - 64-register portable HyperLogLog " +
        "(input = the salted 60-bit md5 key hash) as array<bigint>[64]"),
      (exprs: Seq[Expression]) =>
        graft.functions.HllSketch(exprs.head).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("graft_gram_micro"),
      info("graft_gram_micro", "graft_gram_micro(vec, dim) - integer-micro gram matrix upper triangle"),
      (exprs: Seq[Expression]) => GramMatrixMicro(exprs.head,
        intLit(exprs(1), "dim")).toAggregateExpression()))
    // the as-of join's custom physical operator (plans/AsOfJoinPlan.scala);
    // AsOfJoin.latestPriorMerge also installs it per-session for callers
    // on vanilla sessions
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // optimizer rule: naive levenshtein-threshold predicates -> banded form
    ext.injectOptimizerRule(_ => graft.plans.BandedLevenshteinRule)
    // optimizer rule: size(array_intersect(sorted-distinct, sorted-distinct))
    // -> the zero-allocation two-pointer merge count
    ext.injectOptimizerRule(_ => graft.plans.SortedIntersectRule)
  }
}
