package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AuditQueries, CorpusQueries, DedupQueries, EngineQueries, MixQueries, ProfileQueries, RefSurface, RelationalQueries, ScaleQueries, SequenceQueries, StatQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries`: one entry per implemented operator (SURVEY.md §2 + extension
  * surface), each a function of (session, scale-factor dir).
  * `oracleSql`: the DuckDB-equivalent SQL per query key; column names are
  * aligned on both sides because the driver's compare sorts columns by name
  * before hashing values.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's core pipeline in miniature: parent rollup + enrichment.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q06_enrich_ultimate_parent")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RefSurface.queries ++ DedupQueries.queries ++ TextQueries.queries ++
      ScaleQueries.queries ++ RelationalQueries.queries ++ CorpusQueries.queries ++
      ProfileQueries.queries ++ MixQueries.queries ++ SequenceQueries.queries ++
      AuditQueries.queries ++ StatQueries.queries ++ EngineQueries.queries

  def oracleSql: Map[String, String] =
    RefSurface.oracle ++ DedupQueries.oracle ++ TextQueries.oracle ++
      ScaleQueries.oracle ++ RelationalQueries.oracle ++ CorpusQueries.oracle ++
      ProfileQueries.oracle ++ MixQueries.oracle ++ SequenceQueries.oracle ++
      AuditQueries.oracle ++ StatQueries.oracle ++ EngineQueries.oracle
}
