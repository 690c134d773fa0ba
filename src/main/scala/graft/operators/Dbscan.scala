package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact DBSCAN over integer 2-D points — density clustering for feature
  * spaces (user spend×activity panels, quantized embedding planes) where
  * centroid methods (KMeansIVF) assume convex blobs.
  *
  * Scale design — the all-pairs ε-neighborhood is the naive killer, so
  * candidate pairs come from a GRID join: each point sits in its home
  * (⌊x/ε⌋, ⌊y/ε⌋) cell and PROBES the 3×3 cell neighborhood; any two
  * points within ε are at most one cell apart, so the join is complete,
  * and a pair materializes exactly once per orientation (the probe side
  * owns the replication). Cost is linear in points × 9 with candidate
  * counts bounded by local density — never |points|². Core flags are one
  * count aggregate; cluster labels ride [[ConnectedComponents.contractive]]
  * over CORE-CORE edges only (a DBSCAN blob is a LARGE-diameter component —
  * ~range/ε grid hops — where per-hop label propagation would cost
  * diameter-many shuffle rounds; contraction collapses it in 2–3 levels);
  * border points attach to the MINIMUM cluster root among their core
  * neighbors. Classic DBSCAN leaves border assignment scan-order-dependent;
  * the min-root rule makes it deterministic (documented deviation, the
  * q158 tie discipline). Noise gets root −1.
  *
  * All geometry is integer: dist² = (Δx)²+(Δy)² ≤ ε² and the ε-ball
  * membership count INCLUDES the point itself (the classic |N_ε(p)| ≥
  * minPts contract). Floor division handles negative coordinates (plain
  * `div` truncates toward zero and would misalign cells left of the
  * origin).
  */
object Dbscan {

  /** `points`: one row per point. Returns (id, x, y, is_core, root) where
    * root is the minimum member id of the cluster, or −1 for noise. */
  def cluster(points: DataFrame, idCol: String, xCol: String, yCol: String,
      eps: Long, minPts: Int): DataFrame = {
    require(eps > 0, s"eps must be positive, got $eps")
    require(minPts >= 1, s"minPts must be >= 1, got $minPts")
    val pts = points.select(col(idCol).cast("long").as("id"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .persist() // probe side, base side, core flags, output spine
    def fdiv(c: String): Column =
      expr(s"($c - (($c % $eps + $eps) % $eps)) div $eps")
    val celled = pts
      .withColumn("cx", fdiv("x")).withColumn("cy", fdiv("y"))
    val base = celled.select(col("id").as("ib"), col("x").as("xb"),
      col("y").as("yb"), col("cx").as("bcx"), col("cy").as("bcy"))
    val offsets = array((for (dx <- -1 to 1; dy <- -1 to 1)
      yield struct(lit(dx).as("dx"), lit(dy).as("dy"))): _*)
    val probes = celled
      .select(col("id").as("ia"), col("x").as("xa"), col("y").as("ya"),
        explode(offsets).as("o"), col("cx"), col("cy"))
      .select(col("ia"), col("xa"), col("ya"),
        (col("cx") + col("o.dx")).as("pcx"), (col("cy") + col("o.dy")).as("pcy"))
    val dx = col("xa") - col("xb")
    val dy = col("ya") - col("yb")
    val pairs = probes.join(base,
        col("pcx") === col("bcx") && col("pcy") === col("bcy"))
      .filter(col("ia") =!= col("ib") && dx * dx + dy * dy <= lit(eps * eps))
      .select(col("ia"), col("ib"))
      .persist() // consumed by counts, core-core edges, border attachment
    val nbr = pairs.groupBy(col("ia")).agg(count(lit(1)).as("n_nbr"))
    val coreIds = pts.join(nbr, pts("id") === nbr("ia"), "left")
      .filter(coalesce(col("n_nbr"), lit(0L)) + 1 >= minPts)
      .select(col("id"))
      .persist() // both ends of the edge filter + singleton diff + border
    val coreEdges = pairs
      .join(coreIds.select(col("id").as("ka")), col("ia") === col("ka"), "left_semi")
      .join(coreIds.select(col("id").as("kb")), col("ib") === col("kb"), "left_semi")
      .filter(col("ia") < col("ib")) // both orientations exist; keep one
      .select(col("ia"), col("ib"))
    val cc = ConnectedComponents.contractive(coreEdges)
    // cores with no core neighbor never enter the edge list: singleton clusters
    val singletons = coreIds.join(cc, coreIds("id") === cc("id"), "left_anti")
      .select(coreIds("id"), coreIds("id").as("root"))
    val roots = cc.select(col("id"), col("root")).union(singletons)
      .persist() // border attachment + output join
    val borderRoots = pairs
      .join(coreIds.select(col("id").as("ca")), col("ia") === col("ca"), "left_anti")
      .join(roots.select(col("id").as("rid"), col("root")), col("ib") === col("rid"))
      .groupBy(col("ia")).agg(min(col("root")).as("root"))
      .select(col("ia").as("id"), col("root"))
    val labeled = roots.withColumn("is_core", lit(true))
      .union(borderRoots.withColumn("is_core", lit(false)))
    val out = pts.join(labeled, pts("id") === labeled("id"), "left")
      .select(pts("id"), col("x"), col("y"),
        coalesce(col("is_core"), lit(false)).as("is_core"),
        coalesce(col("root"), lit(-1L)).as("root"))
      // materialize before freeing the intermediates (the Bfs discipline):
      // without this, four persisted relations outlive the query and evict
      // other cached data for the rest of the session
      .localCheckpoint()
    Seq(pts, pairs, coreIds, roots).foreach(_.unpersist())
    out
  }
}
