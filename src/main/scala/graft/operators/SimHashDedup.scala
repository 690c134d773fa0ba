package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextHash

/** SimHash near-duplicate detection over a 60-bit fingerprint.
  *
  * Pipeline: explode word tokens → 60-bit md5 hash per occurrence →
  * per-document majority vote on each of 60 bit positions (an occurrence-
  * weighted simhash) → candidate pairs via chunk blocking → exact Hamming
  * filter.
  *
  * Chunk blocking is DETERMINISTIC, not probabilistic: split the 60-bit
  * fingerprint into 4 15-bit chunks; by pigeonhole any pair within
  * Hamming distance 3 (< 4 chunks) agrees exactly on at least one chunk, so
  * joining on (chunk index, chunk value) finds every qualifying pair while
  * shuffling only (docs × 4) narrow rows — never O(n²). Wide (15-bit)
  * chunks keep the bucket space large (32k values per chunk index), which
  * measured 9× fewer spurious candidates than byte chunks on a
  * shared-vocab corpus — the quadratic noise term at scale.
  *
  * The simhash itself is one explode + one hash-aggregate — both map-side
  * combinable; the 60 conditional sums ride in a single `groupBy`.
  */
object SimHashDedup {

  val Bits = 60

  /** `(id, simhash)` — occurrence-weighted 60-bit simhash of the text,
    * computed by the fused native expression
    * ([[graft.functions.SimHash60]]): a pure per-document function costs a
    * map-side projection, not a corpus-wide token explode + 61-column
    * aggregate. [[simhashComposed]] keeps the compositional form as the
    * value-parity reference (tested equal in DedupSpec). */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      // align the NULL contract with the composed form and the oracle:
      // explode(tokens(NULL)) yields no rows there, so a NULL text must
      // drop the document here too (not emit an (id, NULL) row)
      .filter(col(textCol).isNotNull)
      // the 60-bit fingerprint is a per-token fold over the whole text —
      // spread the compact doc rows first (no-op at scale, see Spread)
      .transform(Spread.rows)
      .select(col(idCol).as("id"),
        graft.functions.VectorExpressions.simHash60(col(textCol)).as("simhash"))

  /** The built-ins-only formulation: explode tokens → hash → majority vote
    * per bit via 60 conditional sums. One shuffle; kept as the reference
    * implementation the native expression is proven against. */
  def simhashComposed(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(
      col(idCol).as("id"),
      explode(TextHash.tokens(col(textCol))).as("w"))
    val hashed = tok.withColumn("h", TextHash.md5Long(col("w")))
    val oneCols = (0 until Bits).map { j =>
      sum(shiftright(col("h"), j).bitwiseAND(lit(1L))).as(s"o$j")
    }
    val agg = hashed.groupBy(col("id"))
      .agg(count(lit(1)).as("n"), oneCols: _*)
    val sim = (0 until Bits).map { j =>
      when(col(s"o$j") * 2 > col("n"), lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    agg.select(col("id"), sim.as("simhash"))
  }

  /** Near-dup pairs `(id_a, id_b, hamming)` with Hamming ≤ `maxHamming`
    * (must be ≤ 3 for the 4-chunk blocking guarantee to be lossless). */
  def pairs(docs: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame =
    chunkBlockedPairs(simhash(docs, idCol, textCol), "id", "simhash", Bits, maxHamming)

  /** The generic 4-chunk pigeonhole Hamming join over ANY `(id, fp)`
    * fingerprint relation (`bits` must split into 4 equal chunks): any
    * pair within Hamming ≤ 3 agrees on ≥ 1 chunk, so the (chunk index,
    * chunk value) equi-join finds every qualifying pair while shuffling
    * docs×4 narrow rows — never O(n²). Shared by the 60-bit text SimHash
    * and the 56-bit image dHash ([[ImageDedup]]). NULL fingerprints
    * (undecodable images) are excluded. The input is persisted: both join
    * branches consume it (the round-5 rule). */
  /** The 4-chunk pigeonhole split — ONE definition shared by
    * [[chunkBlockedPairs]] and [[graft.sources.HammingIndex]]: the
    * index's losslessness proof depends on both computing identical
    * (ci, cv) values, so the geometry must never fork. */
  private[graft] def fpChunkCols(fp: org.apache.spark.sql.Column, bits: Int)
    : Seq[org.apache.spark.sql.Column] = {
    require(bits % 4 == 0 && bits <= 60, s"bits=$bits must be a multiple of 4, <= 60")
    val chunkBits = bits / 4
    val chunkMask = (1L << chunkBits) - 1
    (0 until 4).map { c =>
      struct(lit(c).as("ci"),
        shiftright(fp, chunkBits * c).bitwiseAND(lit(chunkMask)).as("cv"))
    }
  }

  def chunkBlockedPairs(
      fps: DataFrame, idCol: String, fpCol: String,
      bits: Int, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-chunk blocking is only lossless for Hamming <= 3")
    val s = fps.filter(col(fpCol).isNotNull)
      .select(col(idCol).as("id"), col(fpCol).as("fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ch = s.select(col("id"), col("fp"),
      explode(array(fpChunkCols(col("fp"), bits): _*)).as("c"))
    ch.as("x")
      .join(ch.as("y"), col("x.c") === col("y.c") && col("x.id") < col("y.id"))
      .select(
        col("x.id").as("id_a"), col("y.id").as("id_b"),
        col("x.fp").as("ha"), col("y.fp").as("hb"))
      .distinct()
      .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** The simhash replay prefix — `tok`/`th`/`agg`/`sim(id, sh)` — ONE
    * generator shared by [[oracleSql]] and the q342 candidate-drift
    * oracle (hash-parity-critical SQL must never fork). Starts after
    * `WITH` and ends at the last CTE's closing paren — a caller
    * continuing the list adds its own comma. */
  private[graft] def simhashCtes(table: String, idCol: String, textCol: String): String = {
    val ones = (0 until Bits).map(j => s"sum((h >> $j) & 1) AS o$j").mkString(", ")
    val simBits = (0 until Bits)
      .map(j => s"(CASE WHEN 2 * o$j > n THEN ${1L << j} ELSE 0 END)")
      .mkString(" + ")
    s"""tok AS (SELECT $idCol AS id, unnest(${TextHash.tokensSql(textCol)}) AS w FROM $table),
       |th AS (SELECT id, ${TextHash.md5LongSql("w")} AS h FROM tok),
       |agg AS (SELECT id, count(*) AS n, $ones FROM th GROUP BY id),
       |sim AS MATERIALIZED (SELECT id, ($simBits)::BIGINT AS sh FROM agg)""".stripMargin
  }

  /** DuckDB oracle: identical simhash computation, brute-force pairing (the
    * blocking is lossless, so brute force gives the same pair set). */
  def oracleSql(table: String, idCol: String, textCol: String, maxHamming: Int = 3): String =
    s"""WITH ${simhashCtes(table, idCol, textCol)}
       |SELECT a.id AS id_a, b.id AS id_b, bit_count(xor(a.sh, b.sh))::INT AS hamming
       |FROM sim a JOIN sim b ON a.id < b.id
       |WHERE bit_count(xor(a.sh, b.sh)) <= $maxHamming""".stripMargin
}
