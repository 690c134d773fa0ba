package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** OPQ-style rotation before product quantization — the randomized
  * signed-Hadamard transform (the FAISS/OPQ-alternative "random rotation"):
  *   rot[i] = Σ_j (−1)^popcount(i AND j) · sign_j · v[j]
  * with deterministic md5 sign flips. H·D is orthogonal up to the uniform
  * scale √d, so it preserves geometry while SPREADING per-dimension energy
  * evenly across all dimensions. That realizes the BALANCE half of OPQ's
  * objective: every PQ subspace carries an equal energy share instead of
  * one hogging the variance — the property OPQ's eigenvalue allocation
  * approximates, and the one a data-INDEPENDENT rotation can guarantee
  * (spec-proven with exact integers). The independence half — rotating so
  * cross-subspace correlations vanish — needs a LEARNED fit: a full d×d SVD
  * iteration is not oracle-replayable, but the 2×2 closed form IS — see the
  * per-pair KLT below ([[fitPairKlt]], q297), which zeroes each
  * cross-subspace pair's covariance exactly and banks the win through
  * variance-adaptive bit allocation. On correlation-free sources total
  * distortion is provably trace-invariant, so q236 MEASURES the realized
  * error trade rather than asserting a win.
  *
  * Everything is integer: inputs are micro longs, H entries are ±1, so
  * `rot` is an exact long sum — both engines compute the identical vector
  * (DuckDB: `bit_count(i & j)` + a literal sign list). The √d scale is
  * deliberately NOT applied (it would leave the integers); distances in
  * the rotated space are uniformly d× the originals, so error comparisons
  * against the unrotated pipeline multiply the plain side by d.
  */
object OpqRotation {

  /** Deterministic ±1 signs: `md5("hd:" + j)` parity — portable literals
    * computed once, inlined on both engines. */
  def signs(d: Int): Seq[Long] =
    (0 until d).map { j =>
      (graft.functions.Md5LongUtil.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"hd:$j")) % 2) * 2 - 1
    }

  /** Rotate a micro-long `array<long>` column of fixed dimension `d`
    * (power of two) in one native pass
    * ([[graft.functions.HadamardRotate]] — the HOF formulation would
    * re-evaluate the sign-flipped input, and any inlined upstream
    * expression, once per OUTPUT element: the documented lambda trap). */
  def rotateMicro(vq: Column, d: Int): Column = {
    require(d > 0 && (d & (d - 1)) == 0, s"Hadamard needs a power-of-two dim, got $d")
    graft.functions.VectorExpressions.hadamardRotate(vq, signs(d).toArray)
  }

  /** DuckDB subquery producing `(vec_id, vrot)` — the rotated vectors of
    * `table(idCol, vecCol)` as DOUBLE[] in original units (÷10⁶), ready to
    * feed [[ProductQuantizer.oracleCtes]] whose micro step recovers the
    * exact integers (|rot| ≪ 2⁵² ⇒ the round-trip is lossless). */
  def rotatedTableSql(table: String, idCol: String, vecCol: String, d: Int): String = {
    val signList = signs(d).mkString("[", ", ", "]")
    s"""(WITH em0 AS (SELECT $idCol AS id,
       |    list_transform($vecCol::DOUBLE[], x -> CAST(round(x * 1000000) AS BIGINT)) AS vq0
       |  FROM $table),
       |sx AS (SELECT id, unnest(vq0) AS x, unnest(range(1, $d + 1)) AS j FROM em0),
       |sg AS (SELECT id, j - 1 AS j0, x * ($signList)[j] AS sx FROM sx),
       |rt AS (SELECT id, list(r ORDER BY i) AS vq FROM (
       |    SELECT g.id, ii.i, sum(CASE WHEN bit_count(ii.i & g.j0) % 2 = 0
       |                               THEN g.sx ELSE -g.sx END)::BIGINT AS r
       |    FROM sg g, (SELECT unnest(range(0, $d)) AS i) ii GROUP BY 1, 2)
       |  GROUP BY id)
       |SELECT id AS $idCol, list_transform(vq, x -> x / 1000000.0) AS vrot FROM rt)""".stripMargin
  }

  // --- LEARNED OPQ: exact per-pair KLT --------------------------------------
  //
  // The round-8 blocker note above said a learned rotation needs an SVD fit
  // the oracle can't replay. The 2-DIM case escapes that: the Jacobi
  // eigenrotation of a 2×2 covariance is ONE closed-form Givens rotation —
  // six IEEE float ops from exact-integer second moments — and identical
  // expression trees are bit-reproducible across engines (the q133 MMR
  // precedent). Pairing dimension i with i + d/2 puts each pair ACROSS the
  // PQ-subspace split, so the learned rotation moves cross-subspace
  // correlation into within-pair energy compaction — the OPQ objective,
  // realized where it is exactly replayable. The payoff is measured the way
  // transform coding banks it: variance-adaptive bit allocation (the
  // compacted high-energy dim earns a bit from its starved partner), which
  // a data-independent Hadamard can never earn because it spreads energy
  // EVENLY by design.

  /** Learned Givens rotation for the dimension pair (p, p + d/2). */
  final case class PairKlt(pair: Int, cs: Double, sn: Double)

  /** Per-dim power-of-2-step scalar quantizer: `shift` bits dropped,
    * reconstruction at the cell midpoint. Derived from exact integer
    * stats, so both engines derive the identical quantizer. */
  final case class DimQuant(mn: Long, shift: Int, bits: Int)

  /** Exact integer stats of one micro dimension (driver-side, bounded:
    * one row per dimension regardless of corpus size). */
  final case class DimStat(n: Long, mn: Long, mx: Long, sz: Long, qz: Long) {
    /** n·Σz² − (Σz)² — the variance numerator, exact. */
    def varNum: BigInt = BigInt(n) * BigInt(qz) - BigInt(sz) * BigInt(sz)
    def range: Long = mx - mn
  }

  /** The closed-form 2×2 Jacobi rotation zeroing covariance c between two
    * dims with variance numerators a, b. c == 0 → identity (the q207
    * div-zero discipline — both engines branch identically). The float
    * expression tree here is mirrored VERBATIM in the q297 oracle SQL:
    * div, sqrt, abs, mult are all correctly rounded IEEE ops, so cs/sn are
    * bit-identical cross-engine. */
  def givens(a: Double, b: Double, c: Double): (Double, Double) =
    if (c == 0.0) (1.0, 0.0)
    else {
      val theta = (b - a) / (2.0 * c)
      val t = (if (theta >= 0.0) 1.0 else -1.0) /
        (math.abs(theta) + math.sqrt(theta * theta + 1.0))
      val cs = 1.0 / math.sqrt(t * t + 1.0)
      (cs, t * cs)
    }

  /** ONE exact integer moment pass (count + per-dim Σx, Σx² + per-pair
    * Σx·y — a wide map-side-combined aggregate, one row out) + the
    * closed-form Givens per pair. Moments ride int64 — ample here (micro
    * values ≤ ~2·10⁶, so n·Σx² holds to ~10⁹ rows); at larger corpora the
    * same sums ride decimal(38,0) and the double conversion below is
    * unchanged. The int64→double conversions happen in a FIXED order so
    * the oracle's replay is bit-identical. */
  def fitPairKlt(df: DataFrame, vecCol: String, dims: Int): Seq[PairKlt] = {
    require(dims % 2 == 0, s"pair KLT needs even dims, got $dims")
    val half = dims / 2
    val v = col(vecCol).cast("array<double>")
    def x(i: Int) = round(element_at(v, i + 1) * 1000000.0).cast("long")
    val aggs =
      (0 until dims).map(i => sum(x(i)).as(s"s$i")) ++
        (0 until dims).map(i => sum(x(i) * x(i)).as(s"q$i")) ++
        (0 until half).map(p => sum(x(p) * x(p + half)).as(s"c$p"))
    val row = df.agg(count(lit(1)).as("n"), aggs: _*).head()
    val n = row.getAs[Long]("n")
    (0 until half).map { p =>
      val a = n.toDouble * row.getAs[Long](s"q$p").toDouble -
        row.getAs[Long](s"s$p").toDouble * row.getAs[Long](s"s$p").toDouble
      val b = n.toDouble * row.getAs[Long](s"q${p + half}").toDouble -
        row.getAs[Long](s"s${p + half}").toDouble * row.getAs[Long](s"s${p + half}").toDouble
      val c = n.toDouble * row.getAs[Long](s"c$p").toDouble -
        row.getAs[Long](s"s$p").toDouble * row.getAs[Long](s"s${p + half}").toDouble
      val (cs, sn) = givens(a, b, c)
      PairKlt(p, cs, sn)
    }
  }

  /** The `dims` learned-rotated micro columns: dim i < d/2 is
    * floor(cs·x_p − sn·x_{p+d/2} + 0.5), dim i ≥ d/2 its partner
    * floor(sn·x_p + cs·x_{p+d/2} + 0.5) — half-up rounding to micro longs,
    * portable (floor and IEEE multiply are bit-identical cross-engine). */
  def kltRotateMicroCols(vec: Column, rots: Seq[PairKlt], dims: Int): Seq[Column] = {
    val half = dims / 2
    val v = vec.cast("array<double>")
    def xd(i: Int) = round(element_at(v, i + 1) * 1000000.0).cast("long").cast("double")
    (0 until dims).map { i =>
      val p = if (i < half) i else i - half
      val r = rots(p)
      val e =
        if (i < half) lit(r.cs) * xd(p) - lit(r.sn) * xd(p + half)
        else lit(r.sn) * xd(p) + lit(r.cs) * xd(p + half)
      floor(e + lit(0.5))
    }
  }

  /** Exact integer stats per z-column — ONE posexplode + a 128-group
    * map-side-combined hash agg; the collect is bounded by the dimension
    * count, never the corpus. */
  def quantStats(df: DataFrame, zCols: Seq[Column]): Seq[DimStat] = {
    val st = df.select(posexplode(array(zCols: _*)).as(Seq("pos", "z")))
      .groupBy(col("pos"))
      .agg(count(lit(1)).as("n"), min(col("z")).as("mn"), max(col("z")).as("mx"),
        sum(col("z")).as("sz"), sum(col("z") * col("z")).as("qz"))
      .collect()
      .map(r => r.getInt(0) ->
        DimStat(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    zCols.indices.map(st)
  }

  /** Matches DuckDB `length(bin(r))` for r ≥ 0 (bin(0) = "0" → 1). */
  def bitLen(r: Long): Int = if (r == 0) 1 else 64 - java.lang.Long.numberOfLeadingZeros(r)

  /** The quantizer a dim earns at `bits`: drop `shift = max(bitlen(range)
    * − bits, 0)` low bits — codes then fit in `bits` by construction. */
  def quantFor(st: DimStat, bits: Int): DimQuant =
    DimQuant(st.mn, math.max(bitLen(st.range) - bits, 0), bits)

  /** Squared reconstruction error column of one quantized dim: cell =
    * midpoint of the 2^shift-wide bucket — all shift/add integer math. */
  def quantErrCol(z: Column, q: DimQuant): Column = {
    val deq = lit(q.mn) + shiftleft(shiftright(z - lit(q.mn), q.shift), q.shift) +
      lit(if (q.shift > 0) 1L << (q.shift - 1) else 0L)
    (z - deq) * (z - deq)
  }

  /** Variance-adaptive allocation for a 2-dim pair with a 2·bBase budget:
    * the higher-variance dim takes bBase+1 (its partner bBase−1) when its
    * exact variance numerator dominates 16× — an integer decision, so
    * both engines allocate identically. Returns (quant0, quant1, promoted). */
  def allocatePair(st0: DimStat, st1: DimStat, bBase: Int): (DimQuant, DimQuant, Boolean) = {
    val (v0, v1) = (st0.varNum, st1.varNum)
    val promoted = if (v0 >= v1) v0 >= v1 * 16 else v1 >= v0 * 16
    if (!promoted) (quantFor(st0, bBase), quantFor(st1, bBase), false)
    else if (v0 >= v1) (quantFor(st0, bBase + 1), quantFor(st1, bBase - 1), true)
    else (quantFor(st0, bBase - 1), quantFor(st1, bBase + 1), true)
  }

  /** The full learned-vs-identity transform-coding audit (q297): fit the
    * pair KLT, quantize BOTH arms with the same per-pair bit budget and
    * the same variance-adaptive allocation rule, and report exact integer
    * error sums per pair. Three bounded passes over the corpus (fit
    * moments, stats, errors) — the "fit small, apply wide" shape; every
    * driver collect is dimension-bounded. */
  def transformCodingAudit(
      s: SparkSession, df: DataFrame, vecCol: String, dims: Int, bBase: Int = 4): DataFrame = {
    val half = dims / 2
    val rots = fitPairKlt(df, vecCol, dims)
    val v = col(vecCol).cast("array<double>")
    def idMicro(i: Int) = round(element_at(v, i + 1) * 1000000.0).cast("long")
    val zExprs = kltRotateMicroCols(col(vecCol), rots, dims) ++ (0 until dims).map(idMicro)
    // Materialize the 2·dims z-columns ONCE behind a checkpoint leaf:
    // quantErrCol embeds its z argument several times (value, shifted
    // quant, dequant) and CollapseProject would inline the full rotate
    // arithmetic into every one of the 2·dims error aggregates — a
    // many-thousand-node plan whose ANALYSIS/codegen time dwarfs the
    // corpus pass (the q297 driver-bound profile; the r8 HadamardRotate
    // lesson in aggregate form). After the cut, stats and error aggs
    // reference plain column refs; the arithmetic (and the result) is
    // bit-identical — only the expression-tree duplication is gone.
    val zdf = df.select(zExprs.zipWithIndex.map { case (c, i) => c.as(s"z$i") }: _*)
      .localCheckpoint()
    val zCols = zExprs.indices.map(i => col(s"z$i"))
    val stats = quantStats(zdf, zCols)
    val alloc = (0 until half).map { p =>
      val (qL0, qL1, promL) = allocatePair(stats(p), stats(p + half), bBase)
      val (qI0, qI1, promI) = allocatePair(stats(dims + p), stats(dims + half + p), bBase)
      (p, qL0, qL1, promL, qI0, qI1, promI)
    }
    val errAggs = alloc.flatMap { case (p, qL0, qL1, _, qI0, qI1, _) =>
      Seq(
        sum(quantErrCol(zCols(p), qL0) + quantErrCol(zCols(p + half), qL1)).as(s"el$p"),
        sum(quantErrCol(zCols(dims + p), qI0) + quantErrCol(zCols(dims + half + p), qI1))
          .as(s"ei$p"))
    }
    val row = zdf.agg(errAggs.head, errAggs.tail: _*).head()
    import s.implicits._
    alloc.map { case (p, _, _, promL, _, _, promI) =>
      (p, promL, promI, row.getAs[Long](s"el$p"), row.getAs[Long](s"ei$p"))
    }.toDF("pair", "promoted_learned", "promoted_identity", "err_learned", "err_identity")
  }
}
