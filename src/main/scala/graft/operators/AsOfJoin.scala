package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the LATEST right row of the same
  * key with `right.ts <= left.ts` (inclusive). Spark has no native ASOF
  * operator; the classic distributed formulation composes built-ins:
  *
  *   1. tag both inputs and UNION them into one relation;
  *   2. one shuffle: window partitioned by key, ordered by (ts, side) —
  *      right rows sort before left rows at equal timestamps, giving the
  *      inclusive `>=` semantics;
  *   3. `last(right_value, ignoreNulls)` over the unbounded-preceding frame
  *      carries the most recent right row forward onto every left row.
  *
  * Cost: ONE shuffle of |L|+|R| narrow rows — no range-join explosion, no
  * per-row binary search; skew follows the key distribution like any
  * window (pre-split pathological keys upstream).
  *
  * The right side must be unique per (key, ts) for deterministic results —
  * pre-aggregate it (the query below does) exactly as you would for
  * DuckDB's native ASOF JOIN, which this operator is oracle-checked
  * against.
  */
object AsOfJoin {

  /** `left(keyCol, tsCol, ...)` ⟕ latest-prior `right(keyCol, tsCol,
    * valueCol)`. Output: all left columns + `asof_ts` + `asof_<valueCol>`
    * (nulls when no prior right row exists). `tsCol` must be numeric
    * (e.g. epoch micros) on both sides. */
  def latestPrior(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__r_ts", lit(null).cast("long"))
      .withColumn("__r_val", lit(null).cast(right.schema(valueCol).dataType))
    val r = right.select(
      col(keyCol),
      col(tsCol),
      lit(0).as("__side"),
      col(tsCol).cast("long").as("__r_ts"),
      col(valueCol).as("__r_val"))
    // align schemas: right side carries nulls for the left-only columns
    val rAligned = leftCols.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(l.columns.map(col): _*)

    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(rAligned)
      .withColumn("asof_ts", last(col("__r_ts"), ignoreNulls = true).over(w))
      .withColumn(s"asof_$valueCol", last(col("__r_val"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", "__r_ts", "__r_val")
  }

  /** Same contract and output schema as [[latestPrior]], executed by the
    * custom physical operator ([[graft.plans.AsOfJoinExec]]): both sides
    * hash-clustered on the key and sorted by (key, ts), then a streaming
    * per-partition merge with O(1) state — no union row-widening, no window
    * buffer. The planner strategy is installed idempotently on the session.
    *
    * Null-key semantics DIFFER from the composition: the merge follows SQL
    * equi-join rules (a null left key never matches), while [[latestPrior]]'s
    * `PARTITION BY key` groups null keys together and matches them. The
    * merge's behavior is the standard one (DuckDB ASOF agrees); avoid null
    * keys if you need the composition's quirk.
    */
  def latestPriorMerge(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.LongType

    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy

    // fresh aliases give the right side its own exprIds even when both
    // inputs derive from the same base relation (the common self-ASOF case)
    val r = right.select(
      col(keyCol).as("__asof_k"),
      col(tsCol).cast("long").as("asof_ts"),
      col(valueCol).as(s"asof_$valueCol"))
    val lPlan = left.queryExecution.analyzed
    val rPlan = r.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found in ${p.output.map(_.name)}"))
    val node = graft.plans.AsOfJoinNode(
      lPlan, rPlan,
      attr(lPlan, keyCol), Cast(attr(lPlan, tsCol), LongType),
      attr(rPlan, "__asof_k"), attr(rPlan, "asof_ts"))
    org.apache.spark.sql.graftbridge.GraftSqlBridge.ofRows(spark, node)
      .drop("__asof_k")
  }
}
