package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectation suite — the Deequ-style constraint
  * checker every production pipeline runs before promoting a table (the
  * reference's two SQL gates, `ror_dag.py:181,186-189`, are a two-rule
  * instance of exactly this surface; `ops/QualityGates` implements those
  * two verbatim, this operator generalizes the shape to arbitrary suites).
  *
  * Scale design: every ROW-LEVEL rule (not-null, set membership, range,
  * pattern, arbitrary predicate) folds into ONE wide aggregate — a single
  * scan and one map-side-combined reduction REGARDLESS of rule count, never
  * a pass per rule. Uniqueness rules are inherently set-level and each
  * costs one hash aggregation on its key columns (count minus distinct,
  * exact). The result is a tiny per-rule report relation.
  *
  * NULL semantics match SQL: a row where the violation predicate evaluates
  * to NULL (e.g. a pattern rule on a NULL column) is NOT counted — compose
  * with an explicit `notNull` rule to police NULLs, exactly as the oracle's
  * `CASE WHEN ... THEN 1 ELSE 0 END` does.
  */
object Expectations {

  sealed trait Rule { def name: String }

  /** Counts rows where `violatedWhen` is TRUE. */
  final case class RowRule(name: String, violatedWhen: Column) extends Rule

  /** Counts duplicate rows beyond the first per key (n_rows − n_distinct). */
  final case class Unique(name: String, columns: Seq[String]) extends Rule

  def notNull(name: String, column: String): RowRule =
    RowRule(name, col(column).isNull)

  def inSet(name: String, column: String, allowed: Seq[String]): RowRule =
    RowRule(name, !col(column).isin(allowed: _*))

  def inRange(name: String, value: Column, lo: Long, hi: Long): RowRule =
    RowRule(name, !value.between(lo, hi))

  def matches(name: String, column: String, regex: String): RowRule =
    RowRule(name, !col(column).rlike(regex))

  /** Run the suite: one row per rule —
    * (rule, violations, n_rows, passed = violations == 0). */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val rowRules = rules.collect { case r: RowRule => r }
    val uniqueRules = rules.collect { case u: Unique => u }
    require(rowRules.nonEmpty || uniqueRules.nonEmpty, "empty rule suite")

    // one scan: count(*) plus one conditional sum per row-level rule
    val rowReport = if (rowRules.isEmpty) Nil else {
      val aggs = count(lit(1)).as("n_rows") +:
        rowRules.map(r => sum(when(r.violatedWhen, 1L).otherwise(0L)).as(r.name))
      val wide = df.agg(aggs.head, aggs.tail: _*)
      // unpivot the single wide row into (rule, violations) via a map literal
      Seq(wide.select(col("n_rows"),
        explode(map(rowRules.flatMap(r => Seq(lit(r.name), col(r.name))): _*))
          .as(Seq("rule", "violations")))
        .select(col("rule"), col("violations"), col("n_rows")))
    }

    val uniqueReports = uniqueRules.map { u =>
      df.agg(count(lit(1)).as("n_rows"),
          countDistinct(u.columns.head, u.columns.tail: _*).as("n_distinct"))
        .select(lit(u.name).as("rule"),
          (col("n_rows") - col("n_distinct")).as("violations"), col("n_rows"))
    }

    (rowReport ++ uniqueReports)
      .reduce(_.unionByName(_))
      .withColumn("passed", col("violations") === 0L)
  }
}
