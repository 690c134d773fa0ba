package graft.operators

import org.apache.spark.sql.DataFrame

/** Guarded round-robin spread of a SOURCE relation that is about to feed a
  * fan-out map pass (per-char window hashes, shingle/signature arrays,
  * media decodes): on a skinny input — locally, a single-row-group parquet
  * file scans as ONE task — the whole corpus would be hashed on one core
  * before the first natural shuffle. Spreading the compact source rows is
  * a tiny shuffle here and a NO-OP on real clusters whose scans already
  * carry enough splits (the guard), so the plan stays scale-correct — this
  * is the SuffixRepeats/BpeVocab precedent hoisted to one place, NOT a
  * bench-local repartition (see the CLAUDE.md perf note it implements).
  */
object Spread {
  def rows(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par) df.repartition(par) else df
  }
}
