package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy record linkage (edit-distance self-join).
  *
  * The classic entity-resolution shape: find pairs of values whose
  * Levenshtein distance is within a threshold, WITHOUT the O(n²) all-pairs
  * join. Two standard reductions make it linear-ish at scale:
  *
  *  1. **Dedup to the value vocabulary first.** Entity-name vocabularies
  *     are far smaller than row counts (a 100 TB orders table has billions
  *     of rows but a bounded set of distinct names); pair-finding runs on
  *     the distinct relation and a plain equi-join maps matches back to
  *     rows / support counts.
  *  2. **Blocking.** Candidates are generated only within a cheap blocking
  *     key (here: caller-supplied, e.g. first token, soundex, length
  *     bucket). The join is a hash shuffle on the block key — never a
  *     cartesian. Recall is bounded by the block design (pairs that
  *     disagree on the block key are unseen — the documented tradeoff of
  *     every blocked linkage).
  *
  * The verify step uses Spark's 3-arg `levenshtein(l, r, threshold)`, which
  * runs the banded O(threshold·len) DP and bails out early (returns -1)
  * instead of the full O(len²) matrix — the per-candidate cost is bounded
  * by the threshold, not the string length.
  */
object FuzzyJoin {

  /** Within-block pairs of distinct `nameCol` values at edit distance
    * `<= maxDist`, with per-value row support counts.
    *
    * @param block blocking key expression over the `name` column
    * @return (name_a, name_b, dist, n_a, n_b), name_a < name_b
    */
  def selfLinkage(
      df: DataFrame,
      nameCol: String,
      block: Column => Column,
      maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val names = df
      .groupBy(col(nameCol).as("name"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("blk", block(col("name")))
    val a = names.select(col("blk"), col("name").as("name_a"), col("n_rows").as("n_a"))
    val b = names.select(col("blk"), col("name").as("name_b"), col("n_rows").as("n_b"))
    a.join(b, "blk")
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("name_a"), col("name_b"), col("dist"), col("n_a"), col("n_b"))
  }

  /** DuckDB replay (plain 2-arg levenshtein + threshold filter — value-
    * identical to the banded early-exit form on the kept rows).
    * `blockSql` is a SQL expression over a column named `name`. */
  def selfLinkageOracleSql(
      table: String,
      nameCol: String,
      blockSql: String,
      maxDist: Int): String =
    s"""WITH n AS (SELECT $nameCol AS name, count(*) AS n_rows FROM $table GROUP BY $nameCol),
       |b AS (SELECT name, n_rows, $blockSql AS blk FROM n)
       |SELECT a.name AS name_a, c.name AS name_b,
       |  levenshtein(a.name, c.name)::INT AS dist,
       |  a.n_rows AS n_a, c.n_rows AS n_b
       |FROM b a JOIN b c ON a.blk = c.blk AND a.name < c.name
       |WHERE levenshtein(a.name, c.name) <= $maxDist""".stripMargin
}
