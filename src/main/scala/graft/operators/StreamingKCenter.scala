package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ONLINE k-center over a stream — the doubling algorithm (Charikar,
  * Chekuri, Feder, Motwani, "Incremental clustering and dynamic
  * information retrieval", 1997): maintain ≤ k centers and a radius scale
  * R so that every seen point is within O(R) of a center and R is within
  * a constant factor of the optimal k-center radius, under ANY arrival
  * order. The streaming dual of [[KCenter]] (whose greedy needs k passes
  * over a static corpus): one pass, O(k·dim) state, no reprocessing.
  *
  * Algorithm (state = centers C, squared radius r2):
  *  - buffer the first k+1 points verbatim; then r2 := minPairD2/4 and
  *    MERGE (greedy keep-in-id-order, drop any center with d2 ≤ 4·r2 to
  *    a kept one — i.e. within 2R);
  *  - on a new point p: if min d2(p, C) > 4·r2 (p farther than 2R from
  *    every center) add p as a center; while |C| > k, ESCALATE (r2 ×= 4,
  *    doubling R) and merge.
  *
  * Invariants kept for any order (spec-checked under random slicing):
  * |C| ≤ k after every batch; kept centers pairwise d2 > 4·r2; every
  * ingested point within O(R) of a center (drop chains across m
  * doublings add Σ 2R·2^{-j} ≤ 4R of drift — coverage ≤ ~6R, asserted
  * as d2 ≤ 64·r2). Points are folded in id order WITHIN each batch so a
  * single-batch run is deterministic; across batches the result is
  * arrival-order-dependent, which is inherent to online clustering —
  * the GUARANTEES above are what's order-free.
  *
  * SCALE: the state is one bounded summary (k·dim micro longs + a few
  * counters) — a single group key is the honest shape (unlike
  * StreamingTopK, whose sharded state grows per shard). At ingest rates
  * where one task bottlenecks, shard by md5(id) % s and k-center the
  * union of shard centers offline (hierarchical composition preserves
  * the constant factor).
  *
  * All geometry in integer micro units ([[KMeansIVF.roundHalfAway]]) —
  * the d2/r2 comparisons are exact int64, so behavior is bit-reproducible
  * given the arrival order.
  */
object StreamingKCenter {

  case class Pt(id: Long, vec: Seq[Double])

  /** fMGWS state: public, List/primitive fields only (the round-5 state
    * encoder rule). `inited` = the first-(k+1) buffer has been cut over
    * to doubling mode. */
  case class St(ids: List[Long], vecs: List[List[Long]], r2: Long,
                n: Long, inited: Boolean)

  case class Summary(n_seen: Long, n_centers: Int, r2: Long,
                     center_ids: Seq[Long])

  private[operators] def micro(v: Seq[Double]): List[Long] =
    v.map(x => KMeansIVF.roundHalfAway(x * 1e6)).toList

  private def d2(a: List[Long], b: List[Long]): Long = {
    var s = 0L; val ai = a.iterator; val bi = b.iterator
    while (ai.hasNext) { val d = ai.next() - bi.next(); s += d * d }
    s
  }

  private def minPairD2(vecs: List[List[Long]], nonZeroOnly: Boolean): Long = {
    var m = Long.MaxValue
    val arr = vecs.toArray
    var i = 0
    while (i < arr.length) {
      var j = i + 1
      while (j < arr.length) {
        val d = d2(arr(i), arr(j))
        if ((d > 0 || !nonZeroOnly) && d < m) m = d
        j += 1
      }
      i += 1
    }
    m
  }

  /** greedy keep in id order: a center survives iff farther than 2R
    * (d2 > 4·r2) from every already-kept center. */
  private def greedyKeep(st: St): St = {
    val keptI = scala.collection.mutable.ArrayBuffer[Int]()
    val idx = st.ids.indices.sortBy(st.ids(_))
    idx.foreach { i =>
      if (keptI.forall(j => d2(st.vecs(i), st.vecs(j)) > 4 * st.r2))
        keptI += i
    }
    val keep = keptI.sorted
    st.copy(ids = keep.map(st.ids(_)).toList, vecs = keep.map(st.vecs(_)).toList)
  }

  private def mergeToK(st0: St, k: Int): St = {
    var st = greedyKeep(st0)
    while (st.ids.size > k) {
      val nz = minPairD2(st.vecs, nonZeroOnly = true)
      val r2n =
        if (st.r2 == 0) math.max(1L, if (nz == Long.MaxValue) 1L else nz / 4)
        else st.r2 * 4
      st = greedyKeep(st.copy(r2 = r2n))
    }
    st
  }

  /** The deterministic fold of one batch (points sorted by id inside). */
  private[operators] def fold(st0: St, pts: Seq[(Long, List[Long])], k: Int): St = {
    require(k >= 2, s"k=$k")
    var st = st0
    pts.sortBy(_._1).foreach { case (id, vm) =>
      if (!st.inited) {
        st = st.copy(ids = st.ids :+ id, vecs = st.vecs :+ vm, n = st.n + 1)
        if (st.ids.size == k + 1) {
          val m = minPairD2(st.vecs, nonZeroOnly = false)
          st = mergeToK(st.copy(r2 = m / 4, inited = true), k)
        }
      } else {
        val dmin = st.vecs.map(d2(_, vm)).min
        if (dmin > 4 * st.r2) {
          st = st.copy(ids = st.ids :+ id, vecs = st.vecs :+ vm)
          if (st.ids.size > k) st = mergeToK(st, k)
        }
        st = st.copy(n = st.n + 1)
      }
    }
    st
  }

  /** One summary row per micro-batch: seen count, live centers, r2.
    * Input columns: `id` (long), `vec` (array<double>). Update mode. */
  def summaries(points: DataFrame, k: Int): Dataset[Summary] = {
    val spark = points.sparkSession
    import spark.implicits._
    points.select(col("id").cast("long").as("id"),
        col("vec").cast("array<double>").as("vec")).as[Pt]
      .groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (_: Int, it: Iterator[Pt], state: GroupState[St]) => {
          val st0 = state.getOption.getOrElse(St(Nil, Nil, 0L, 0L, inited = false))
          val st1 = fold(st0, it.map(p => (p.id, micro(p.vec))).toSeq, k)
          state.update(st1)
          Iterator(Summary(st1.n, st1.ids.size, st1.r2, st1.ids))
        })
  }

}
