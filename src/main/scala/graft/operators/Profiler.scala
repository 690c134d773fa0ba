package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Schema-generic table profiler — the dynamic-schema counterpart of the
  * hand-written q40 profile: walks `df.schema` at PLAN time and emits one
  * stats row per column, whatever the table looks like.
  *
  * Shape: ONE wide aggregate computes every column's stats in a single
  * distributed pass (4 aggregates per column, all partial+final hash
  * aggs), then a map-side explode unpivots the one wide row into
  * per-column rows — profiling an N-column 100 TB table costs one scan,
  * not N.
  *
  * min/max are reported as truncated string representations so the output
  * schema is column-type-independent; distinct counts are exact (null
  * excluded, matching SQL COUNT(DISTINCT)).
  */
object Profiler {

  def profile(df: DataFrame, reprLen: Int = 24): DataFrame = {
    val fields = df.schema.fields
    require(fields.nonEmpty, "cannot profile a zero-column relation")
    // col("a.b") parses the dot as a struct access — backtick-quote every
    // name built from the schema (field names may contain dots; embedded
    // backticks use the standard `` escape) or "schema-generic" is a lie
    def q(name: String) = col("`" + name.replace("`", "``") + "`")
    val aggs = fields.flatMap { f =>
      val c = q(f.name)
      Seq(
        count(c).as(s"__cnt_${f.name}"),
        countDistinct(c).as(s"__dst_${f.name}"),
        min(c).cast("string").as(s"__min_${f.name}"),
        max(c).cast("string").as(s"__max_${f.name}"))
    } :+ count(lit(1)).as("__n_rows")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = fields.map { f =>
      struct(
        lit(f.name).as("col_name"),
        lit(f.dataType.simpleString).as("dtype"),
        col("__n_rows").as("n_rows"),
        (col("__n_rows") - q(s"__cnt_${f.name}")).as("n_null"),
        q(s"__dst_${f.name}").as("n_distinct"),
        substring(q(s"__min_${f.name}"), 1, reprLen).as("min_repr"),
        substring(q(s"__max_${f.name}"), 1, reprLen).as("max_repr"))
    }
    wide.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
  }

  /** Scale dual of [[profile]]: identical output shape, but distinct counts
    * come from per-column HLL++ sketches (`approx_count_distinct`) instead
    * of exact `countDistinct`.
    *
    * Why it exists: Catalyst plans N exact distinct aggregates in one agg
    * via an Expand that replicates EVERY input row once per distinct column
    * — a single scan, but ~(N+1)× shuffle input on an N-column table, which
    * is the dominant cost when the table is 100 TB wide. HLL sketches are
    * ordinary fixed-width buffers (no DISTINCT rewrite, no Expand): one
    * partial+final hash agg whose shuffle carries one row per partition,
    * whatever N is. The estimate column is named `n_distinct_est` so the
    * two profiles can't be confused; rsd defaults to 0.02 (the q32-proven
    * setting: a 10% acceptance gate sits ~5 sigma out).
    */
  def profileSketch(df: DataFrame, rsd: Double = 0.02, reprLen: Int = 24): DataFrame = {
    val fields = df.schema.fields
    require(fields.nonEmpty, "cannot profile a zero-column relation")
    def q(name: String) = col("`" + name.replace("`", "``") + "`")
    val aggs = fields.flatMap { f =>
      val c = q(f.name)
      Seq(
        count(c).as(s"__cnt_${f.name}"),
        approx_count_distinct(c, rsd).as(s"__dst_${f.name}"),
        min(c).cast("string").as(s"__min_${f.name}"),
        max(c).cast("string").as(s"__max_${f.name}"))
    } :+ count(lit(1)).as("__n_rows")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = fields.map { f =>
      struct(
        lit(f.name).as("col_name"),
        lit(f.dataType.simpleString).as("dtype"),
        col("__n_rows").as("n_rows"),
        (col("__n_rows") - q(s"__cnt_${f.name}")).as("n_null"),
        q(s"__dst_${f.name}").as("n_distinct_est"),
        substring(q(s"__min_${f.name}"), 1, reprLen).as("min_repr"),
        substring(q(s"__max_${f.name}"), 1, reprLen).as("max_repr"))
    }
    wide.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
  }
}
