package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list by iterative min-label
  * propagation — the clustering step of fuzzy dedup (near-dup PAIRS become
  * duplicate CLUSTERS; each cluster keeps one canonical doc).
  *
  * Scale design: each round is one shuffle (join edges to current labels +
  * groupBy min); rounds needed = component diameter, and dup-cluster
  * diameters are tiny in practice (most clusters are pairs or triangles, so
  * 2–3 rounds). Labels are `localCheckpoint`ed per round to truncate lineage
  * exactly like the org-hierarchy fixpoint (`ops/UltimateParent.scala`).
  * The alternative large-diameter algorithm (pointer-doubling, O(log n)
  * rounds) is not needed for dedup graphs; `maxIter` bounds pathology.
  *
  * Reference analogy: the reference's only graph op is the parent-closure
  * walk (`ror_scripts/get_ultimate_parent.py:55-90`); this is the undirected
  * counterpart the LLM-pipeline extension needs.
  */
object ConnectedComponents {

  /** `edges`: two-column DataFrame of undirected edges (each pair listed
    * once, either orientation). Returns `(id, root)` for every vertex that
    * appears in at least one edge, where `root` is the minimum vertex id in
    * the component.
    */
  def minLabel(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val Array(ca, cb) = edges.columns
    val und = edges.select(col(ca).as("a"), col(cb).as("b"))
    val sym = und.union(und.select(col("b").as("a"), col("a").as("b")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // round 1 fused into initialization: propagating identity labels once
    // is just min(id, min(neighbor)) — one groupBy instead of an identity
    // checkpoint plus a full join round (2 fewer jobs on the common
    // tiny-diameter dedup graphs)
    var labels = sym.groupBy(col("a"))
      .agg(min(col("b")).as("nb"))
      .select(col("a").as("id"), least(col("a"), col("nb")).as("label"))
      .localCheckpoint()
    var changed = 1L
    var iter = 1
    while (changed > 0 && iter < maxIter) {
      val nbrMin = sym.join(labels, sym("b") === labels("id"))
        .groupBy(col("a")).agg(min(col("label")).as("nlabel"))
      // carry the per-row "label shrank" flag through the checkpoint so the
      // convergence check is a filter over checkpointed rows, not a second
      // join of consecutive label generations
      val next = labels.as("l")
        .join(nbrMin, col("l.id") === nbrMin("a"), "left")
        .select(col("l.id").as("id"),
          least(col("l.label"), coalesce(col("nlabel"), col("l.label"))).as("label"),
          (col("nlabel") < col("l.label")).as("chg"))
        .localCheckpoint()
      changed = next.filter(col("chg")).count()
      labels = next.select(col("id"), col("label"))
      iter += 1
    }
    sym.unpersist() // before the require: don't leak the cache on failure
    // a silent non-converged return would hand every caller (q52's oracle
    // comparison, CorpusPipeline's keep-set) subtly wrong clusters — fail
    // loudly instead; components deeper than maxIter need pointer doubling
    require(changed == 0,
      s"min-label propagation did not converge in $maxIter rounds " +
        s"($changed labels still shrinking — component diameter exceeds maxIter)")
    labels.select(col("id"), col("label").as("root"))
  }
}
