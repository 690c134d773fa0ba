package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality gates (reference ops A1/A2), with BigQueryCheckOperator
  * semantics: a gate PASSES iff its single-row result is truthy, and a failed
  * gate must block promotion (`/root/reference/ror_dag.py:178-192`).
  *
  * Both gates are single full-table aggregates — Catalyst plans them as
  * partial (map-side) + final HashAggregate, so the shuffle carries only one
  * row per partition. `uniqueIds` uses EXACT `count(distinct)` (it is a
  * correctness gate, `ror_dag.py:181`), which Spark executes with the
  * two-phase distinct expansion — still one pass over the data.
  */
object QualityGates {

  final case class GateResult(name: String, passed: Boolean, detail: String)

  /** A1 (`ror_dag.py:181`): `count(distinct id) = count(id)`. */
  def uniqueIds(df: DataFrame, idCol: String): GateResult = {
    val row = df.agg(
      countDistinct(col(idCol)).as("d"),
      count(col(idCol)).as("c")).head()
    val (d, c) = (row.getLong(0), row.getLong(1))
    GateResult("unique_ids", d == c, s"count(distinct $idCol)=$d count($idCol)=$c")
  }

  /** A1 as a declarative single-row plan (for the oracle harness). */
  def uniqueIdsDf(df: DataFrame, idCol: String): DataFrame =
    df.agg((countDistinct(col(idCol)) === count(col(idCol))).as("unique_ok"))

  /** A2 (`ror_dag.py:186-189`): staging row count must be >= production's —
    * guards against a shrinking dataset. */
  def monotonicCount(staging: DataFrame, production: DataFrame): GateResult = {
    val s = staging.count(); val p = production.count()
    GateResult("monotonic_count", s >= p, s"staging=$s production=$p")
  }

  /** A2 as one declarative plan: two scalar aggregates cross-joined (each a
    * partial+final count; the cross join is 1x1 rows). */
  def monotonicCountDf(staging: DataFrame, production: DataFrame): DataFrame =
    staging.agg(count(lit(1)).as("staging_cnt"))
      .crossJoin(production.agg(count(lit(1)).as("production_cnt")))
      .select((col("staging_cnt") >= col("production_cnt")).as("monotonic_ok"))

  /** Run gates in order; throw listing every failure (blocks promotion). */
  def requireAll(gates: Seq[GateResult]): Unit = {
    val failed = gates.filterNot(_.passed)
    if (failed.nonEmpty)
      throw new IllegalStateException(
        "quality gates failed: " + failed.map(g => s"${g.name} [${g.detail}]").mkString("; "))
  }
}
