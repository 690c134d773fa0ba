package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source single-source-shortest-paths over integer edge weights —
  * synchronous Bellman–Ford with FRONTIER pruning, the weighted complement
  * of [[Bfs]] (hop counts) for routing-cost, influence-decay and
  * weighted-radius features.
  *
  * Per round, candidates are generated ONLY from the frontier (nodes whose
  * distance improved last round), not the whole settled relation. This is
  * lossless: a non-frontier node u has dist_r(u) = dist_{r-1}(u), so the
  * offer dist_r(u)+w(u,v) was already made — and absorbed into dist(v) —
  * one round earlier. Each round is therefore one key-partitioned join of
  * the frontier boundary against the fixed checkpointed adjacency, a
  * min-combine, and a full-outer merge into the distance relation: work
  * proportional to the improving boundary, exactly like Bfs, while the
  * unrolled oracle can relax from ALL nodes each round and still match
  * round-for-round.
  *
  * Distances within <= maxRounds relaxations are exact (Bellman–Ford
  * invariant); nodes beyond the horizon report -1, keeping the Spark
  * fixpoint (which may stop early once the frontier drains) aligned with a
  * fixed-depth SQL unroll — identical to the [[Bfs]] contract. The
  * distance relation is localCheckpoint-ed per round (lineage truncation:
  * KCore's measured 3x lesson) and the previous round's blocks are freed
  * once the new one materializes.
  */
object Sssp {

  /** `edges(src, dst, weight)`: undirected simple graph with positive
    * integer weights (either orientation; on duplicate edges the minimum
    * weight wins; self-loops ignored). `sources(idCol)`: seed set, dist 0.
    * Returns `(v, dist)` for every graph node, dist = -1 if unreachable
    * within maxRounds relaxation rounds. */
  def distances(edges: DataFrame, src: String, dst: String, weight: String,
                sources: DataFrame, idCol: String, maxRounds: Int): DataFrame = {
    val e0 = edges
      .select(least(col(src), col(dst)).as("a"),
        greatest(col(src), col(dst)).as("b"), col(weight).as("wt"))
      .filter(col("a") =!= col("b"))
      .groupBy(col("a"), col("b")).agg(min(col("wt")).as("wt"))
    val adj = e0.select(col("a").as("v"), col("b").as("w"), col("wt"))
      .unionAll(e0.select(col("b").as("v"), col("a").as("w"), col("wt")))
      .localCheckpoint()
    val allNodes = adj.select(col("v")).distinct().localCheckpoint()

    // LAZY checkpoint + a count over the improved rows = ONE job per
    // round (the Bfs pattern): the count computes every partition of the
    // merged relation — materializing the checkpoint — AND answers the
    // frontier-emptiness question, where the old eager checkpoint +
    // isEmpty paid two driver round-trips per round
    var ck = sources.select(col(idCol).as("v")).distinct()
      .withColumn("dist", lit(0L)).localCheckpoint(false)
    var dist = ck
    var frontier = ck
    var frontierN = ck.count()
    var round = 0
    while (round < maxRounds && frontierN > 0) {
      round += 1
      val cand = adj.join(frontier, Seq("v"))
        .select(col("w").as("v"), (col("dist") + col("wt")).as("nd"))
        .groupBy(col("v")).agg(min(col("nd")).as("nd"))
      val merged = dist.join(cand, Seq("v"), "full")
        .select(col("v"),
          least(coalesce(col("dist"), lit(Long.MaxValue)),
            coalesce(col("nd"), lit(Long.MaxValue))).as("dist"),
          (col("nd").isNotNull &&
            (col("dist").isNull || (col("nd") < col("dist")))).as("improved"))
        .localCheckpoint(false)
      frontierN = merged.filter(col("improved")).count()
      val prevCk = ck
      ck = merged
      dist = merged.select(col("v"), col("dist"))
      frontier = merged.filter(col("improved")).select(col("v"), col("dist"))
      prevCk.unpersist()
    }
    val out = allNodes.join(dist, Seq("v"), "left")
      .select(col("v"), coalesce(col("dist"), lit(-1L)).as("dist"))
      // seeds outside the graph still belong to the result (dist 0)
      .unionAll(dist.join(allNodes, Seq("v"), "left_anti"))
    val result = out.localCheckpoint() // materialize before freeing inputs
    adj.unpersist(); allNodes.unpersist(); ck.unpersist()
    result
  }

  /** DuckDB replay over a caller-supplied `wedges(a, b, wt)` CTE:
    * fixed-depth unrolled Bellman–Ford relaxing from ALL nodes each round
    * (provably round-equivalent to the frontier form — see class doc).
    * Every per-round CTE is MATERIALIZED (the q102 inlining lesson).
    * Emits `sssp(v, dist)`. */
  def oracleCtes(sourcesPredicate: String, maxRounds: Int): String = {
    val base =
      s"""wcanon AS MATERIALIZED (
         |  SELECT least(a, b) AS a, greatest(a, b) AS b, min(wt) AS wt
         |  FROM wedges WHERE a <> b GROUP BY 1, 2),
         |wund AS MATERIALIZED (
         |  SELECT a AS v, b AS w, wt FROM wcanon
         |  UNION ALL SELECT b, a, wt FROM wcanon),
         |wnodes AS MATERIALIZED (SELECT DISTINCT v FROM wund),
         |d0 AS MATERIALIZED (
         |  SELECT v, 0::BIGINT AS dist FROM wnodes WHERE $sourcesPredicate)""".stripMargin
    val rounds = (1 to maxRounds).map { r =>
      s"""c$r AS MATERIALIZED (
         |  SELECT u.w AS v, min(d.dist + u.wt) AS nd
         |  FROM wund u JOIN d${r - 1} d USING (v) GROUP BY u.w),
         |d$r AS MATERIALIZED (
         |  SELECT coalesce(d.v, c.v) AS v,
         |    least(coalesce(d.dist, 9223372036854775807),
         |          coalesce(c.nd, 9223372036854775807))::BIGINT AS dist
         |  FROM d${r - 1} d FULL JOIN c$r c ON d.v = c.v)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$rounds,
       |sssp AS MATERIALIZED (
       |  SELECT n.v, coalesce(d.dist, -1)::BIGINT AS dist
       |  FROM wnodes n LEFT JOIN d$maxRounds d USING (v))""".stripMargin
  }
}
