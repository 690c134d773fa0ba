package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact deduplication — hash-groupBy on content key(s).
  *
  * Both forms are single-shuffle hash aggregations with map-side partial
  * aggregation; the shuffle carries one row per distinct key, not per input
  * row, so they scale to arbitrary corpus sizes (skewed heavy keys combine
  * map-side first).
  */
object ExactDedup {

  /** One row per distinct key, keeping the row with the smallest `orderCol`
    * — the deterministic "keep first" policy. */
  def keepFirst(df: DataFrame, keyCols: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Duplicate-group summary `(key…, keep_id, n_copies)` — the audit view. */
  def groups(df: DataFrame, keyCols: Seq[String], idCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
}
