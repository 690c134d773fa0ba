package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ultimate-parent resolution (reference ops G1/G2): follow `id → parent`
  * edges to the fixpoint root, per id.
  *
  * Reference semantics (`/root/reference/ror_scripts/get_ultimate_parent.py`):
  *   - `traverse_parents` recurses until `id == parent` (:13-24);
  *   - a process-wide recursion limit of 200 frames (:10) means a chain deeper
  *     than the cap — or any cycle — raises; the reference's handler (:25-39)
  *     returns the ror_id of the FRAME WHERE RECURSION BLEW UP (an arbitrary
  *     ancestor ~200 hops deep, dependent on the interpreter's frame budget),
  *     with a warning surfaced out-of-band. "One bad org shouldn't kill the
  *     pipeline."
  *   - DELIBERATE DEVIATION: this implementation falls back to the STARTING
  *     node itself (`capped = true`) instead of reproducing that deep-frame
  *     return value — the reference's choice is an artifact of CPython's
  *     recursion depth, not a semantic contract, and fallback-to-self is
  *     deterministic across engines and cap settings.
  *
  * Spark-first design — two interchangeable implementations:
  *
  *  1. `resolveDistributed`: pointer-jumping (path doubling). State is the
  *     relation `(id, anc, dist, settled)`; each round substitutes
  *     `anc := anc(anc)` and `dist := dist + dist(anc)` via a single self
  *     equi-join, so the frontier depth DOUBLES per round:
  *     O(log2 maxDepth) ≈ 8 shuffles total for the reference's cap of 200,
  *     regardless of row count — this is the 100 TB scale path.
  *     `localCheckpoint` truncates lineage each round so the plan doesn't
  *     grow exponentially. Cycle rows never settle and their `dist` doubles
  *     past `maxDepth`, reproducing the depth-cap fallback exactly.
  *
  *  2. `resolveCollected`: collect the edge map to the driver and walk it —
  *     byte-faithful to the reference's in-memory dict (it collected
  *     everything into one pod's memory anyway). Appropriate below ~10^7
  *     edges; used as a cross-check in tests.
  *
  * Output schema: `(id, ultimate_parent, capped)` — `capped = true` marks the
  * fallback-to-self rows (the reference's RecursionError/Slack-alert path).
  */
object UltimateParent {

  /** Distributed pointer-jumping fixpoint. `edges` must be `(id, parent)` with
    * unique ids (enforce with [[ParentEdges.requireUniqueIds]] first).
    * A parent id absent from `edges` is treated as a terminal root.
    */
  def resolveDistributed(edges: DataFrame, maxDepth: Int = 200): DataFrame = {
    // ceil(log2(maxDepth)) rounds reach any root within the cap; +2 margin
    // lets stragglers' dist overshoot the cap so they classify as capped.
    val maxRounds =
      math.ceil(math.log(math.max(maxDepth, 2).toDouble) / math.log(2.0)).toInt + 2

    val selfRoot = col("id") === col("parent")
    var state = edges
      .select(
        col("id"),
        col("parent").as("anc"),
        when(selfRoot, lit(0L)).otherwise(lit(1L)).as("dist"),
        selfRoot.as("settled"))
      .localCheckpoint()

    var round  = 0
    var active = state.filter(!col("settled") && col("dist") <= maxDepth).count()
    while (active > 0 && round < maxRounds) {
      val hop = state.select(
        col("id").as("h_id"),
        col("anc").as("h_anc"),
        col("dist").as("h_dist"),
        col("settled").as("h_settled"))
      // `h_settled && h_dist == 0` identifies anc as an original root: roots
      // settle at round 0 with dist 0 and never move. (Testing against the
      // EVOLVING anc would misread a collapsed cycle — e.g. A<->B pointer-
      // jumps to anc(A)=A — as a root, so we test the static root property.)
      val ancIsRoot  = col("h_settled") && col("h_dist") === 0L
      val ancMissing = col("h_id").isNull
      val frozen     = col("settled") || col("dist") > maxDepth
      state = state
        .join(hop, state("anc") === col("h_id"), "left")
        .select(
          col("id"),
          when(frozen || ancMissing, col("anc")).otherwise(col("h_anc")).as("anc"),
          when(frozen, col("dist"))
            .otherwise(col("dist") + coalesce(col("h_dist"), lit(0L))).as("dist"),
          (frozen || ancMissing || ancIsRoot || col("h_settled")).as("settled"))
        .localCheckpoint()
      active = state.filter(!col("settled") && col("dist") <= maxDepth).count()
      round += 1
    }

    val resolved = col("settled") && col("dist") <= maxDepth
    state.select(
      col("id"),
      when(resolved, col("anc")).otherwise(col("id")).as("ultimate_parent"),
      (!resolved).as("capped"))
  }

  /** Driver-collected walk — mirrors the reference's dict-based recursion
    * (get_ultimate_parent.py:13-52) with an explicit step cap instead of the
    * Python recursion limit. Same output contract as [[resolveDistributed]].
    */
  def resolveCollected(edges: DataFrame, maxDepth: Int = 200): DataFrame = {
    val spark = edges.sparkSession
    val parentOf: Map[String, String] = edges
      .select(col("id").cast("string"), col("parent").cast("string"))
      .collect()
      .map(r => r.getString(0) -> r.getString(1))
      .toMap

    def walk(start: String): (String, Boolean) = {
      var cur   = start
      var steps = 0
      while (steps <= maxDepth) {
        val p = parentOf.getOrElse(cur, cur)
        if (p == cur) return (cur, false)
        cur = p
        steps += 1
      }
      (start, true) // depth cap or cycle → fallback to self (reference :39)
    }

    import spark.implicits._
    parentOf.keys.toSeq
      .map { id => val (up, capped) = walk(id); (id, up, capped) }
      .toDF("id", "ultimate_parent", "capped")
  }

  /** Dispatch: distributed pointer-jumping unless the caller knows the graph
    * is small enough to mirror the reference's collect-to-memory approach.
    */
  def resolve(edges: DataFrame, maxDepth: Int = 200, smallGraph: Boolean = false): DataFrame =
    if (smallGraph) resolveCollected(edges, maxDepth)
    else resolveDistributed(edges, maxDepth)
}
