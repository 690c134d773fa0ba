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

    // LAZY checkpoint + count: the count is the ONE action per round — it
    // materializes every checkpoint partition (count computes all of them)
    // AND answers the loop's emptiness question, where the old eager
    // checkpoint + isEmpty paid two driver round-trips per round
    val seed = sources.select(col(idCol).as("v")).distinct()
      .localCheckpoint(false)
    var frontierN = seed.count()
    // the settled set is the UNION of per-round checkpointed frontiers —
    // never re-materialized as a whole: checkpointing the union each round
    // would write O(V) per round = O(V·depth) total, while the frontiers
    // sum to O(V) exactly once (each node settles in one round)
    var levels = Vector[(Long, DataFrame)](0L -> seed)
    var frontier = seed
    var round = 0
    while (round < maxDepth && frontierN > 0) {
      round += 1
      // TWO-FRONTIER settled check: a neighbor w of a node at distance
      // r-1 satisfies |dist(w) - (r-1)| <= 1 (the edge runs both ways),
      // so dist(w) ∈ {r-2, r-1, r} and "already settled" ≡ membership in
      // the LAST TWO levels — the anti-join shrinks from O(settled) =
      // O(V) rows per round (O(V·depth) total traffic) to O(two
      // frontiers), which sums to O(V) over the whole run
      val settledV = levels.takeRight(2).map(_._2).reduce(_ unionAll _)
      val next = adj.join(frontier, Seq("v"), "left_semi")
        .select(col("w").as("v")).distinct()
        .join(settledV, Seq("v"), "left_anti")
        .localCheckpoint(false)
      frontierN = next.count()
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

  /** Shortest-path COUNTING (the forward phase of Brandes' betweenness):
    * per (source, node), the hop distance AND the number σ of distinct
    * shortest paths — the path-census primitive behind betweenness,
    * path-redundancy audits ("how many independent shortest routes reach
    * this node"), and DAG-based features. Same synchronous frontier
    * discipline as [[distances]], with one addition per round: a node
    * entering the frontier sums σ over its already-frontier predecessors
    * (σ_v = Σ σ_u, u ∈ frontier ∧ u~v) — one key-partitioned join + one
    * hash agg, exact integers. (The backward δ-accumulation of full
    * betweenness sums fractions with data-dependent denominators — not
    * portably exact — so the census stops at σ, which IS.) σ fits a long
    * for bounded depth/degree (Σ over ≤deg predecessors, depth ≤
    * maxDepth); at the bound it would overflow loudly via ANSI, never
    * silently. Returns (source, v, dist, sigma); unreached nodes report
    * (-1, 0). */
  def pathCounts(edges: DataFrame, src: String, dst: String,
                 sources: DataFrame, idCol: String, maxDepth: Int): DataFrame = {
    val e0 = edges
      .select(least(col(src), col(dst)).as("a"), greatest(col(src), col(dst)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val adj = e0.select(col("a").as("v"), col("b").as("w"))
      .unionAll(e0.select(col("b").as("v"), col("a").as("w")))
      .localCheckpoint()
    val allNodes = adj.select(col("v")).distinct().localCheckpoint()
    // lazy checkpoint + count = one action per round (see [[distances]])
    val seed = sources.select(col(idCol).as("s"))
      .distinct()
      .select(col("s"), col("s").as("v"), lit(1L).as("sigma"))
      .localCheckpoint(false)
    var frontierN = seed.count()
    var levels = Vector[(Long, DataFrame)](0L -> seed)
    var frontier = seed
    var round = 0
    while (round < maxDepth && frontierN > 0) {
      round += 1
      // two-frontier settled check, per source: dist_s(w) of a neighbor
      // of a dist_s = r-1 node lies in {r-2, r-1, r} (see [[distances]]),
      // so the anti-join needs only the last two (s, v) levels
      val settledSV = levels.takeRight(2)
        .map(_._2.select(col("s"), col("v"))).reduce(_ unionAll _)
      val next = adj.join(frontier, Seq("v"))
        .groupBy(col("s"), col("w").as("v"))
        .agg(sum(col("sigma")).as("sigma"))
        .join(settledSV, Seq("s", "v"), "left_anti")
        .localCheckpoint(false)
      frontierN = next.count()
      levels :+= (round.toLong -> next)
      frontier = next
    }
    val settled = levels
      .map { case (dd, df) => df.withColumn("dist", lit(dd)) }
      .reduce(_ unionAll _)
    val spine = seed.select(col("s")).crossJoin(allNodes)
    val out = spine.join(settled, Seq("s", "v"), "left")
      .select(col("s").as("source"), col("v"),
        coalesce(col("dist"), lit(-1L)).as("dist"),
        coalesce(col("sigma"), lit(0L)).as("sigma"))
      // seeds outside the graph still belong to the result
      .unionAll(settled.join(allNodes, Seq("v"), "left_anti")
        .select(col("s").as("source"), col("v"), col("dist"), col("sigma")))
    adj.unpersist()
    val result = out.localCheckpoint()
    levels.foreach(_._2.unpersist()); allNodes.unpersist()
    result
  }

  /** DuckDB replay of [[pathCounts]] over a caller-supplied `edges(a, b)`
    * CTE: per-round σ sums with per-(source, node) settled exclusion.
    * MATERIALIZED per round (the q102 lesson). Emits `sigma_bfs(source,
    * v, dist, sigma)`.
    *
    * CONTRACT NARROWER THAN THE OPERATOR'S: `sourcesPredicate` selects
    * seeds FROM THE GRAPH'S NODES (p0 draws from bnodes), so a seed
    * absent from the edge set — which [[pathCounts]] handles by emitting
    * its (s, s, 0, 1) row — has NO replay here. Oracle-checked queries
    * must derive their seed set from the edges (q284 does). */
  def pathCountsOracleCtes(sourcesPredicate: String, maxDepth: Int): String = {
    val base =
      s"""und AS MATERIALIZED (
         |  SELECT a AS v, b AS w FROM edges WHERE a <> b
         |  UNION ALL SELECT b, a FROM edges WHERE a <> b),
         |bnodes AS MATERIALIZED (SELECT DISTINCT v FROM und),
         |p0 AS MATERIALIZED (SELECT v AS s, v, 1::BIGINT AS sigma
         |  FROM bnodes WHERE $sourcesPredicate),
         |t0 AS MATERIALIZED (SELECT s, v, 0::BIGINT AS dist, sigma FROM p0)""".stripMargin
    val rounds = (1 to maxDepth).map { r =>
      s"""p$r AS MATERIALIZED (
         |  SELECT f.s, und.w AS v, sum(f.sigma)::BIGINT AS sigma
         |  FROM und JOIN p${r - 1} f USING (v)
         |  WHERE NOT EXISTS (SELECT 1 FROM t${r - 1} x
         |    WHERE x.s = f.s AND x.v = und.w)
         |  GROUP BY f.s, und.w),
         |t$r AS MATERIALIZED (
         |  SELECT s, v, dist, sigma FROM t${r - 1}
         |  UNION ALL SELECT s, v, $r::BIGINT, sigma FROM p$r)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$rounds,
       |sigma_bfs AS MATERIALIZED (
       |  SELECT p0.s AS source, n.v,
       |    coalesce(t.dist, -1)::BIGINT AS dist,
       |    coalesce(t.sigma, 0)::BIGINT AS sigma
       |  FROM (SELECT DISTINCT s FROM p0) p0 CROSS JOIN bnodes n
       |  LEFT JOIN t$maxDepth t ON t.s = p0.s AND t.v = n.v)""".stripMargin
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
