package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Exact all-pairs set-similarity self-join with AllPairs/PPJoin-style
  * prefix filtering (Bayardo et al., "Scaling Up All Pairs Similarity
  * Search") — the deterministic-complete counterpart of the MinHash-LSH
  * path (operators/MinHashDedup): LSH trades recall for volume; this
  * finds EVERY pair at Jaccard ≥ t, with the candidate space shrunk by a
  * provable filter instead of a probabilistic one.
  *
  * The filter: order every set by ascending global element frequency
  * (rarest first, ties by value — a total order both engines can replay),
  * and keep each set's first |x| − ⌈t·|x|⌉ + 1 elements as its PREFIX. If
  * J(x,y) ≥ t, then |x∩y| ≥ ⌈t·|x|⌉ (union ≥ |x|); were no common element
  * in x's prefix, the intersection would fit in the remaining
  * ⌈t·|x|⌉ − 1 slots — contradiction. The same holds for y, and the
  * FIRST common element in the global order lies in both prefixes, so
  * joining prefix-to-prefix loses nothing. Rare-first ordering makes
  * prefixes collide rarely — the candidate volume is driven by the df² of
  * the RAREST elements, not the stopword mass.
  *
  * Scale shape: one df aggregate, one per-set sort (bounded by set size),
  * a prefix-token equi-join (the only candidate-quadratic stage, bounded
  * by Σ_prefix-token df²), and an allocation-free sorted-merge
  * intersect-count verify ([[graft.functions.SortedIntersectCount]])
  * touching candidates only. Thresholds are exact rationals (tNum/tDen) — the
  * accept test `inter·tDen ≥ tNum·union` never computes a float.
  */
object PrefixFilterJoin {

  /** `sets(idCol, setCol: array<long>)` (elements assumed distinct per
    * row) → all unordered pairs with Jaccard ≥ tNum/tDen, as
    * (id_a, id_b, inter, uni) with id_a < id_b.
    *
    * Caching contract (same as [[MinHashDedup.pairs]]): the returned plan
    * references the persisted input relation (consumed by prefix
    * generation and both verify branches); it stays cached after
    * evaluation. Long-lived applications should
    * `spark.catalog.clearCache()` (or unpersist via
    * `spark.sharedState.cacheManager`) once the result is consumed; Bench
    * does exactly this between queries. */
  def jaccardSelfJoin(sets: DataFrame, idCol: String, setCol: String,
                      tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tNum <= tDen, s"threshold $tNum/$tDen not in (0,1]")
    // consumed twice (prefix generation + verify); the caller's input may
    // itself be an expensive shingle scan. Sorting here costs one
    // O(n log n) per SET; it buys the verify join an allocation-free
    // two-pointer intersect per CANDIDATE PAIR (the query's floor).
    val s = sets.select(col(idCol).as("__id"), sort_array(col(setCol)).as("__hs"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tok = s.select(col("__id"), explode(col("__hs")).as("h"))
    val dfreq = tok.groupBy(col("h")).agg(count(lit(1)).as("df"))
    // rare-first canonical order: lexicographic (df, h) struct sort
    val ranked = tok.join(dfreq, "h")
      .groupBy(col("__id"))
      .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("sorted"))
    val pfx = ranked
      .withColumn("n", size(col("sorted")))
      // p = n − ⌈t·n⌉ + 1, in pure integer arithmetic; keep the 1-based
      // position of each prefix element for the positional filter below
      .select(col("__id"), col("n"),
        posexplode(slice(col("sorted"), lit(1),
          (col("n") - expr(s"(n * $tNum + ${tDen - 1}) div $tDen") + 1).cast("int")))
          .as(Seq("p0", "e")))
      .select(col("__id"), col("n"), (col("p0") + 1).as("i"), col("e.h").as("h"))
    val cand = pfx.as("x").join(pfx.as("y"), "h")
      .filter(col("x.__id") < col("y.__id"))
      // size filter: J ≥ t forces t·|x| ≤ |y| ≤ |x|/t
      .filter(col("x.n") * tNum <= col("y.n") * tDen &&
        col("y.n") * tNum <= col("x.n") * tDen)
      // PPJoin positional filter: all common elements rank ≥ this matched
      // token (rows before it in either prefix are non-common for the
      // FIRST common token w, which a true pair always matches on), so
      // inter ≤ 1 + min(nx−i, ny−j); J ≥ t needs inter ≥
      // tNum(nx+ny)/(tNum+tDen) — compared cross-multiplied, no division
      .filter((lit(1) + least(col("x.n") - col("x.i"), col("y.n") - col("y.i")))
        * (tNum + tDen) >= lit(tNum) * (col("x.n") + col("y.n")))
      .select(col("x.__id").as("id_a"), col("y.__id").as("id_b"))
      .distinct()
    cand
      .join(s.select(col("__id").as("id_a"), col("__hs").as("ha"),
        size(col("__hs")).as("na")), "id_a")
      .join(s.select(col("__id").as("id_b"), col("__hs").as("hb"),
        size(col("__hs")).as("nb")), "id_b")
      .withColumn("inter", graft.functions.VectorExpressions
        .sortedIntersectCount(col("ha"), col("hb")))
      .withColumn("uni", col("na").cast("long") + col("nb") - col("inter"))
      .filter(col("inter") * tDen >= lit(tNum) * col("uni"))
      .select(col("id_a"), col("id_b"), col("inter"), col("uni"))
  }

  /** Lossless CANDIDATE generation for a cross (query × corpus) Jaccard
    * join at threshold ≥ tNum/tDen: returns (query_id, corpus_id) pairs
    * GUARANTEED to contain every true pair (the prefix/size/positional
    * filters are the [[jaccardSelfJoin]] proofs, which never use the fact
    * that both sets come from one relation) — the caller runs the exact
    * verify. Global rare-first order is computed over the UNION of both
    * relations' tokens so the two sides rank identically; prefix volume is
    * Σ_h qpf(h)·cpf(h) over PREFIX tokens only, which is what makes an
    * audit-style truth join hub-safe: a stopword-heavy shingle never
    * reaches the join (it ranks last and falls outside every prefix)
    * instead of fanning out qf(h)·df(h).
    *
    * Use a CONSERVATIVE rational threshold (tNum/tDen ≤ the caller's real
    * threshold): a smaller t only lengthens prefixes — still lossless.
    * `setCol` elements must be DISTINCT per row. */
  def jaccardCrossCandidates(queries: DataFrame, corpus: DataFrame,
                             idCol: String, setCol: String,
                             tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tNum <= tDen, s"threshold $tNum/$tDen not in (0,1]")
    // both inputs are consumed twice (the union df count + their own
    // prefix generation) — CALLER CONTRACT: pass persisted relations when
    // they are expensive (appendRecallAudit does); persisting the
    // rename-only projections here too would double-materialize the same
    // data (found in review). dfreq (derived, consumed by both pfx
    // sides) persists here; callers clearCache when done.
    def norm(rel: DataFrame) =
      rel.select(col(idCol).as("__id"), col(setCol).as("__hs"))
    val q = norm(queries); val c = norm(corpus)
    val dfreq = q.union(c).select(explode(col("__hs")).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    def pfx(rel: DataFrame) = rel
      .select(col("__id"), explode(col("__hs")).as("h"))
      .join(dfreq, "h")
      .groupBy(col("__id"))
      .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("sorted"))
      .withColumn("n", size(col("sorted")))
      .select(col("__id"), col("n"),
        posexplode(slice(col("sorted"), lit(1),
          (col("n") - expr(s"(n * $tNum + ${tDen - 1}) div $tDen") + 1).cast("int")))
          .as(Seq("p0", "e")))
      .select(col("__id"), col("n"), (col("p0") + 1).as("i"), col("e.h").as("h"))
    pfx(q).as("x").join(pfx(c).as("y"), "h")
      // size filter: J ≥ t forces t·|x| ≤ |y| ≤ |x|/t
      .filter(col("x.n") * tNum <= col("y.n") * tDen &&
        col("y.n") * tNum <= col("x.n") * tDen)
      // PPJoin positional filter (same cross-multiplied form as the
      // self-join; the first-common-token argument is pair-symmetric)
      .filter((lit(1) + least(col("x.n") - col("x.i"), col("y.n") - col("y.i")))
        * (tNum + tDen) >= lit(tNum) * (col("x.n") + col("y.n")))
      .select(col("x.__id").as("query_id"), col("y.__id").as("corpus_id"))
      .distinct()
  }

  /** Directed CONTAINMENT self-join: all ordered pairs (a, b), a ≠ b, with
    * |a∩b| / |a| ≥ tNum/tDen — "a is (nearly) contained in b": excerpt and
    * quote detection, near-subset dedup, template-instance linking. The
    * asymmetric dual of [[jaccardSelfJoin]]:
    *
    *  - the prefix lives on the CONTAINED side only (p = n_a − ⌈t·n_a⌉ + 1,
    *    same pigeonhole: a miss leaves at most ⌈t·n_a⌉ − 1 slots for the
    *    required ⌈t·n_a⌉ common elements);
    *  - the container side joins with its FULL ranked token list — there is
    *    no y-prefix bound because |b| does not appear in the threshold.
    *    Candidate volume is Σ_h df_prefix(h)·df_all(h); rare-first ordering
    *    keeps the prefix tokens' full postings short, which is what makes
    *    the asymmetric join tractable (for Jaccard this asymmetry was tried
    *    and reverted — here the relation itself is asymmetric, so the
    *    index-probe shape is forced);
    *  - positional filter: both sides rank in the SAME global (df, h)
    *    order, so for the first common token (position i in a, j in b)
    *    inter ≤ 1 + min(n_a − i, n_b − j), compared cross-multiplied
    *    against ⌈t·n_a⌉.
    *
    * Returns (id_a, id_b, inter, na); containment = inter/na, exact
    * rational — callers emit it in integer basis points.
    *
    * Same input contract as [[jaccardSelfJoin]]: `setCol` elements must be
    * DISTINCT per row (shingle-hash producers guarantee this; duplicates
    * would inflate intersect counts and break the prefix bound).
    */
  def containmentSelfJoin(sets: DataFrame, idCol: String, setCol: String,
                          tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tNum <= tDen, s"threshold $tNum/$tDen not in (0,1]")
    val s = sets.select(col(idCol).as("__id"), sort_array(col(setCol)).as("__hs"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tok = s.select(col("__id"), explode(col("__hs")).as("h"))
    val dfreq = tok.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val ranked = tok.join(dfreq, "h")
      .groupBy(col("__id"))
      .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("sorted"))
      .withColumn("n", size(col("sorted")))
      .persist(StorageLevel.MEMORY_AND_DISK) // prefix AND full-list sides
    val pfx = ranked
      .select(col("__id"), col("n"),
        posexplode(slice(col("sorted"), lit(1),
          (col("n") - expr(s"(n * $tNum + ${tDen - 1}) div $tDen") + 1).cast("int")))
          .as(Seq("p0", "e")))
      .select(col("__id"), col("n"), (col("p0") + 1).as("i"), col("e.h").as("h"))
    val all = ranked
      .select(col("__id"), col("n"), posexplode(col("sorted")).as(Seq("p0", "e")))
      .select(col("__id"), col("n"), (col("p0") + 1).as("j"), col("e.h").as("h"))
    val cand = pfx.as("x").join(all.as("y"), "h")
      .filter(col("x.__id") =!= col("y.__id"))
      // size filter: inter ≤ |b| and inter ≥ ⌈t·|a|⌉ force t·|a| ≤ |b|
      .filter(lit(tNum) * col("x.n") <= lit(tDen) * col("y.n"))
      .filter((lit(1) + least(col("x.n") - col("x.i"), col("y.n") - col("y.j")))
        * tDen >= lit(tNum) * col("x.n"))
      .select(col("x.__id").as("id_a"), col("y.__id").as("id_b"))
      .distinct()
    cand
      .join(s.select(col("__id").as("id_a"), col("__hs").as("ha"),
        size(col("__hs")).as("na")), "id_a")
      .join(s.select(col("__id").as("id_b"), col("__hs").as("hb")), "id_b")
      .withColumn("inter", graft.functions.VectorExpressions
        .sortedIntersectCount(col("ha"), col("hb")))
      .filter(col("inter") * tDen >= lit(tNum) * col("na"))
      .select(col("id_a"), col("id_b"), col("inter"), col("na").cast("long").as("na"))
  }
}
