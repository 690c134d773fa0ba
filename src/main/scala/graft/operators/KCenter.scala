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
          seedId: Long): Seq[(Int, Long, Long)] = {
    require(k >= 1 && k <= 64, s"k=$k out of the bounded-driver range [1,64]")
    val pts = points
      .select(col(idCol).cast("long").as("id"), microVec(col(vecCol)).as("vm"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) // k-1 scans
    try {
      val seed = pts.filter(col("id") === seedId).head()
      var lastCenter = seed.getSeq[Long](1).toArray
      val out = ArrayBuffer[(Int, Long, Long)]((0, seedId, 0L))
      // carried = min distance² to all picks so far, folded one center/round
      var carried = pts.filter(col("id") =!= seedId)
        .select(col("id"), col("vm"), d2To(col("vm"), lastCenter).as("d2"))
      for (r <- 1 until k) {
        val row = carried.orderBy(desc("d2"), asc("id")).limit(1).head()
        val pickId = row.getLong(0)
        lastCenter = row.getSeq[Long](1).toArray
        out += ((r, pickId, row.getLong(2)))
        if (r < k - 1)
          carried = carried.filter(col("id") =!= pickId)
            .select(col("id"), col("vm"),
              least(col("d2"), d2To(col("vm"), lastCenter)).as("d2"))
      }
      out.toSeq
    } finally pts.unpersist()
  }

  /** DuckDB replay over table `embeddings` (cols vec_id, embedding):
    * unrolled greedy rounds, every round CTE MATERIALIZED (the chain is
    * referenced twice per round — default re-inlining is exponential).
    */
  def oracleSql(k: Int, seedId: Long, dim: Int): String = {
    def d2(a: String, b: String) =
      s"list_sum(list_transform(range(1, ${dim + 1}), i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))::BIGINT"
    val rounds = (2 until k).map { r =>
      s"""d$r AS MATERIALIZED (
         |  SELECT d.vec_id, d.vm, least(d.d2, ${d2("d.vm", "c.vm")}) AS d2
         |  FROM d${r - 1} d, p${r - 1} c WHERE d.vec_id <> c.vec_id),
         |p$r AS MATERIALIZED (SELECT vec_id, vm, d2 FROM d$r
         |  ORDER BY d2 DESC, vec_id LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val tail = (1 until k)
      .map(r => s"UNION ALL SELECT $r::INT, vec_id, d2 FROM p$r")
      .mkString("\n")
    s"""WITH e AS (SELECT vec_id,
       |    list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000000) AS BIGINT)) AS vm
       |  FROM embeddings),
       |c0 AS MATERIALIZED (SELECT vec_id, vm FROM e WHERE vec_id = $seedId),
       |d1 AS MATERIALIZED (
       |  SELECT p.vec_id, p.vm, ${d2("p.vm", "c.vm")} AS d2
       |  FROM e p, c0 c WHERE p.vec_id <> $seedId),
       |p1 AS MATERIALIZED (SELECT vec_id, vm, d2 FROM d1
       |  ORDER BY d2 DESC, vec_id LIMIT 1),
       |$rounds
       |SELECT 0::INT AS round, $seedId::BIGINT AS vec_id, 0::BIGINT AS cover_d2
       |$tail""".stripMargin
  }
}
