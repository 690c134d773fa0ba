package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source breadth-first search: exact shortest hop-distance from a
  * seed set over an undirected graph — the reachability/radius primitive
  * behind "how far is every product from the promoted set", influence
  * radii, and connected-neighborhood feature generation.
  *
  * Synchronous frontier expansion, so every round is a pure function of
  * the previous settled set: dist(v) is deterministic and the whole
  * level structure is oracle-checkable (the KCore/PageRank unrolled-round
  * pattern). Nodes not reached within `maxDepth` rounds are reported with
  * dist = -1 ("beyond the horizon") — making the result well-defined even
  * if the graph's eccentricity exceeds the bound, and keeping the Spark
  * fixpoint and a fixed-depth SQL unroll exactly aligned.
  *
  * Scale shape per round: ONE key-partitioned join of the current
  * FRONTIER (not the settled set, not the node set) against the fixed
  * checkpointed adjacency, a distinct, and an anti-join against settled —
  * work is proportional to the frontier's edge boundary, the minimum any
  * BFS must touch. `localCheckpoint` truncates per-round lineage
  * (KCore's measured 3x lesson) and the previous round's blocks are freed
  * once the new frontier materializes.
  */
object Bfs {

  /** `edges(src, dst)`: undirected simple graph (either orientation,
    * self-loops ignored). `sources`: one column `id` — seed nodes
    * (need not all exist in the graph; absent seeds settle at dist 0 and
    * never expand). Returns `(v, dist)` for every node of the graph (and
    * every seed), dist = -1 where no path of length <= maxDepth exists. */
  def distances(edges: DataFrame, src: String, dst: String,
                sources: DataFrame, idCol: String, maxDepth: Int): DataFrame = {
    val e0 = edges
      .select(least(col(src), col(dst)).as("a"), greatest(col(src), col(dst)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    // adjacency in both orientations: frontier joins on one key column
    val adj = e0.select(col("a").as("v"), col("b").as("w"))
      .unionAll(e0.select(col("b").as("v"), col("a").as("w")))
      .localCheckpoint()
    val allNodes = adj.select(col("v")).distinct().localCheckpoint()

    val seed = sources.select(col(idCol).as("v")).distinct().localCheckpoint()
    // the settled set is the UNION of per-round checkpointed frontiers —
    // never re-materialized as a whole: checkpointing the union each round
    // would write O(V) per round = O(V·depth) total, while the frontiers
    // sum to O(V) exactly once (each node settles in one round)
    var levels = Vector[(Long, DataFrame)](0L -> seed)
    var frontier = seed
    var round = 0
    while (round < maxDepth && !frontier.isEmpty) {
      round += 1
      val settledV = levels.map(_._2).reduce(_ unionAll _)
      val next = adj.join(frontier, Seq("v"), "left_semi")
        .select(col("w").as("v")).distinct()
        .join(settledV, Seq("v"), "left_anti")
        .localCheckpoint()
      levels :+= (round.toLong -> next)
      frontier = next
    }
    val settled = levels
      .map { case (dd, df) => df.withColumn("dist", lit(dd)) }
      .reduce(_ unionAll _)
    val out = allNodes.join(settled, Seq("v"), "left")
      .select(col("v"), coalesce(col("dist"), lit(-1L)).as("dist"))
      // seeds outside the graph still belong to the result (dist 0)
      .unionAll(settled.join(allNodes, Seq("v"), "left_anti"))
    adj.unpersist()
    val result = out.localCheckpoint() // materialize before freeing inputs
    levels.foreach(_._2.unpersist()); allNodes.unpersist()
    result
  }

  /** DuckDB replay: fixed-depth unrolled frontier expansion over an
    * `edges(a, b)` CTE supplied by the caller (the caller's WITH clause
    * must define `edges`); emits the same `(v, dist)` relation. Every
    * per-round CTE is MATERIALIZED — each is referenced by the next
    * round and by the final union, and DuckDB's default inlining would
    * re-evaluate the chain exponentially (the q102 lesson). */
  def oracleCtes(sourcesPredicate: String, maxDepth: Int): String = {
    val base =
      s"""und AS MATERIALIZED (
         |  SELECT a AS v, b AS w FROM edges WHERE a <> b
         |  UNION ALL SELECT b, a FROM edges WHERE a <> b),
         |bnodes AS MATERIALIZED (SELECT DISTINCT v FROM und),
         |f0 AS MATERIALIZED (SELECT DISTINCT v FROM bnodes WHERE $sourcesPredicate),
         |s0 AS MATERIALIZED (SELECT v, 0::BIGINT AS dist FROM f0)""".stripMargin
    val rounds = (1 to maxDepth).map { r =>
      s"""f$r AS MATERIALIZED (
         |  SELECT DISTINCT w AS v FROM und JOIN f${r - 1} USING (v)
         |  WHERE w NOT IN (SELECT v FROM s${r - 1})),
         |s$r AS MATERIALIZED (
         |  SELECT v, dist FROM s${r - 1}
         |  UNION ALL SELECT v, $r::BIGINT FROM f$r)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$rounds,
       |bfs AS MATERIALIZED (
       |  SELECT n.v, coalesce(s.dist, -1)::BIGINT AS dist
       |  FROM bnodes n LEFT JOIN s$maxDepth s USING (v))""".stripMargin
  }
}
