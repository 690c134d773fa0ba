package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableMath

/** Greedy k-center (farthest-point) coreset selection — the classic
  * 2-approximation to the k-center cover (Gonzalez 1985), used in
  * training-data curation to pick a maximally DIVERSE subset (coverage
  * guarantee: every point is within the final `cover_d2` of a pick —
  * the dual of similarity-based dedup, which removes redundancy; this
  * SELECTS the spanning skeleton).
  *
  * PORTABILITY: vectors quantize to integer micro-units
  * ([[PortableMath.microHalfAway]], DuckDB `CAST(round(x*1e6) AS BIGINT)`)
  * so every distance² is an exact int64 and each round's argmax (ties →
  * smallest id) replays bit-identically in the oracle.
  *
  * SCALE: k−1 rounds, each one distributed scan + TakeOrdered(1) (map-side
  * partial top-1; the driver holds k rows total). The min-distance fold is
  * a `least` CHAIN over the persisted micro-vector relation — round r's
  * lineage re-derives the ≤r literal-center distances on cached rows
  * (O(n·dim·r) arithmetic, no joins, no shuffles), which for the bounded
  * k ≤ 64 is cheaper than a materialization job per round; a huge-k
  * variant would localCheckpoint the carried d2 every few rounds (the Bfs
  * discipline) to cap the re-derivation.
  */
object KCenter {

  /** micro-quantized (int64 per dim) copy of a float vector column. */
  def microVec(v: Column): Column =
    transform(v.cast("array<double>"), x => PortableMath.microHalfAway(x))

  /** exact integer squared L2 between a micro vector column and a literal
    * micro center. */
  private def d2To(vm: Column, center: Array[Long]): Column =
    aggregate(
      zip_with(vm, typedlit(center.toSeq), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)

  /** Greedy selection. Returns (round, id, cover_d2): round 0 is the seed
    * with cover_d2 = 0; round r's cover_d2 is the selected point's min
    * distance² to the first r picks — the covering radius² of that prefix
    * (the k-center attrition curve, monotone non-increasing).
    */
  def fit(points: DataFrame, idCol: String, vecCol: String, k: Int,
          seedId: Long): Seq[(Int, Long, Long)] = fitWithVectors(points, idCol, vecCol, k, seedId)._1

  /** [[fit]] plus the picked MICRO vectors in round order — the handles a
    * downstream assignment pass needs as literal centers. */
  def fitWithVectors(points: DataFrame, idCol: String, vecCol: String, k: Int,
          seedId: Long): (Seq[(Int, Long, Long)], Seq[Array[Long]]) = {
    require(k >= 1 && k <= 64, s"k=$k out of the bounded-driver range [1,64]")
    val pts = points
      .select(col(idCol).cast("long").as("id"), microVec(col(vecCol)).as("vm"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) // k-1 scans
    try {
      val seed = pts.filter(col("id") === seedId).head()
      var lastCenter = seed.getSeq[Long](1).toArray
      val out = ArrayBuffer[(Int, Long, Long)]((0, seedId, 0L))
      val vecs = ArrayBuffer[Array[Long]](lastCenter)
      // carried = min distance² to all picks so far, folded one center/round
      var carried = pts.filter(col("id") =!= seedId)
        .select(col("id"), col("vm"), d2To(col("vm"), lastCenter).as("d2"))
      for (r <- 1 until k) {
        val row = carried.orderBy(desc("d2"), asc("id")).limit(1).head()
        val pickId = row.getLong(0)
        lastCenter = row.getSeq[Long](1).toArray
        out += ((r, pickId, row.getLong(2)))
        vecs += lastCenter
        if (r < k - 1)
          carried = carried.filter(col("id") =!= pickId)
            .select(col("id"), col("vm"),
              least(col("d2"), d2To(col("vm"), lastCenter)).as("d2"))
      }
      (out.toSeq, vecs.toSeq)
    } finally pts.unpersist()
  }

  /** Nearest-center assignment against literal micro centers: one map-side
    * pass emitting `(id, center_round, d2, d2_second)` — the assigned
    * center (ties → smallest round, via lexicographic struct sort) and the
    * runner-up distance² (the separation margin). No joins, no shuffles;
    * the centers ride inside the row expression. The k struct entries each
    * re-derive the micro conversion (CollapseProject inlines any staged
    * projection — the OpqRotation lesson); with k bounded ≤ 64 that is
    * k·dim extra integer ops per row, linear and cheaper than a
    * materialization pass. */
  def assign(points: DataFrame, idCol: String, vecCol: String,
             centers: Seq[Array[Long]]): DataFrame = {
    require(centers.nonEmpty && centers.size <= 64, "bounded literal centers")
    val vm = microVec(col(vecCol))
    val scored = array_sort(array(centers.zipWithIndex.map { case (c, r) =>
      struct(d2To(vm, c).as("d2"), lit(r).as("r"))
    }: _*))
    points.select(col(idCol).cast("long").as("id"), scored.as("s"))
      .select(col("id"),
        col("s")(0).getField("r").as("center_round"),
        col("s")(0).getField("d2").as("d2"),
        when(lit(centers.size > 1), col("s")(1).getField("d2")).as("d2_second"))
  }

  private def d2Sql(a: String, b: String, dim: Int) =
    s"list_sum(list_transform(range(1, ${dim + 1}), i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))::BIGINT"

  /** The shared WITH body: `e` (micro vectors), `c0` (seed) and the
    * unrolled greedy rounds `d1/p1 … d{k-1}/p{k-1}` — every round CTE
    * MATERIALIZED (the chain is referenced twice per round — default
    * re-inlining is exponential, the q102 trap). */
  private def roundCtes(k: Int, seedId: Long, dim: Int): String = {
    val rounds = (2 until k).map { r =>
      s"""d$r AS MATERIALIZED (
         |  SELECT d.vec_id, d.vm, least(d.d2, ${d2Sql("d.vm", "c.vm", dim)}) AS d2
         |  FROM d${r - 1} d, p${r - 1} c WHERE d.vec_id <> c.vec_id),
         |p$r AS MATERIALIZED (SELECT vec_id, vm, d2 FROM d$r
         |  ORDER BY d2 DESC, vec_id LIMIT 1)""".stripMargin
    }.mkString(",\n")
    s"""e AS (SELECT vec_id,
       |    list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000000) AS BIGINT)) AS vm
       |  FROM embeddings),
       |c0 AS MATERIALIZED (SELECT vec_id, vm FROM e WHERE vec_id = $seedId),
       |d1 AS MATERIALIZED (
       |  SELECT p.vec_id, p.vm, ${d2Sql("p.vm", "c.vm", dim)} AS d2
       |  FROM e p, c0 c WHERE p.vec_id <> $seedId),
       |p1 AS MATERIALIZED (SELECT vec_id, vm, d2 FROM d1
       |  ORDER BY d2 DESC, vec_id LIMIT 1),
       |$rounds""".stripMargin
  }

  /** DuckDB replay of [[fit]] over table `embeddings` (vec_id, embedding). */
  def oracleSql(k: Int, seedId: Long, dim: Int): String = {
    val tail = (1 until k)
      .map(r => s"UNION ALL SELECT $r::INT, vec_id, d2 FROM p$r")
      .mkString("\n")
    s"""WITH ${roundCtes(k, seedId, dim)}
       |SELECT 0::INT AS round, $seedId::BIGINT AS vec_id, 0::BIGINT AS cover_d2
       |$tail""".stripMargin
  }

  /** DuckDB replay of [[fit]] + [[assign]] + the per-center census:
    * population, exact d2 sums/max, and the well-separated count
    * (runner-up ≥ 4× assigned d2 ⇒ second center at least twice as far).
    */
  def assignOracleSql(k: Int, seedId: Long, dim: Int): String = {
    val cents = (s"SELECT 0::INT AS center_round, vm FROM c0" +:
      (1 until k).map(r => s"SELECT $r::INT, vm FROM p$r")).mkString("\nUNION ALL ")
    s"""WITH ${roundCtes(k, seedId, dim)},
       |cents AS MATERIALIZED ($cents),
       |asg AS (SELECT p.vec_id, c.center_round,
       |          ${d2Sql("p.vm", "c.vm", dim)} AS d2
       |        FROM e p, cents c),
       |rk AS (SELECT vec_id, center_round, d2, row_number()
       |         OVER (PARTITION BY vec_id ORDER BY d2, center_round) AS rn
       |       FROM asg)
       |SELECT a1.center_round, count(*)::BIGINT AS n_assigned,
       |  sum(a1.d2)::BIGINT AS sum_d2, max(a1.d2)::BIGINT AS max_d2,
       |  sum(CASE WHEN a2.d2 >= 4 * a1.d2 THEN 1 ELSE 0 END)::BIGINT AS n_wellsep
       |FROM rk a1 JOIN rk a2 ON a1.vec_id = a2.vec_id AND a1.rn = 1 AND a2.rn = 2
       |GROUP BY a1.center_round""".stripMargin
  }
}
