package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.{PortableMath, PqExpressions, TextHash}

/** Product quantization — the memory side of large-scale ANN ([[KMeansIVF]]
  * is the routing side): a d-dim vector is split into `m` subspaces and
  * each subvector replaced by the id of its nearest codebook centroid, so
  * a corpus embedding compresses to m small codes (here 8×4 bits) while
  * distances remain approximable from the codes alone.
  *
  * Everything runs in EXACT INTEGER MICRO-UNITS end to end — vectors are
  * quantized once via the portable half-away rounding
  * ([[PortableMath.microHalfAway]]), centroids live as micro longs, L2
  * distances are exact long sums of squared diffs, and centroid updates
  * are integer means with one correctly-rounded division — so the entire
  * fit → encode → error pipeline is order-independent and replayable
  * bit-for-bit in DuckDB SQL ([[oracleCtes]]), the same discipline as the
  * k-means fit it generalizes.
  *
  * Scale shape: the fit touches only a bounded hash-sample
  * ([[KMeansIVF.sampleModFor]] keeps the driver collect ≤ cap rows at ANY
  * corpus size); corpus encoding is one map-side codegen'd expression
  * ([[graft.functions.PqEncodeMicro]]) with the codebooks riding the plan
  * as reference objects — no join, no shuffle, no UDF on the 100 TB side.
  */
object ProductQuantizer {

  /** Micro-quantized vector column (array<long>) from a float/double array
    * column — the portable binary-double half-away rounding. */
  def micro(vec: Column): Column =
    transform(vec, x => PortableMath.microHalfAway(x.cast("double")))

  /** Per-subspace Lloyd on an id-sorted micro sample. Returns
    * `codebooks(sub)(cid)(dim)`; init per subspace = the k smallest-id
    * sample subvectors; argmin ties keep the smaller cid; empty clusters
    * keep their previous centroid — each rule mirrored in [[oracleCtes]]. */
  def fit(sample: Array[(Long, Array[Long])], m: Int, k: Int,
          iters: Int): Array[Array[Array[Long]]] = {
    require(sample.nonEmpty, "PQ sample is empty")
    val sorted = sample.sortBy(_._1)
    val dim = sorted.head._2.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sd = dim / m
    Array.tabulate(m) { s =>
      val svs = sorted.map { case (_, v) => v.slice(s * sd, s * sd + sd) }
      val kk = math.min(k, svs.length)
      var cents = svs.take(kk)
      for (_ <- 1 to iters) {
        val assign = svs.map { v =>
          var best = 0; var bd = Long.MaxValue
          var c = 0
          while (c < kk) {
            var dd = 0L; var i = 0
            while (i < sd) { val df = v(i) - cents(c)(i); dd += df * df; i += 1 }
            if (dd < bd) { bd = dd; best = c } // strict <: ties keep smaller cid
            c += 1
          }
          (best, v)
        }
        cents = Array.tabulate(kk) { c =>
          val mem = assign.collect { case (`c`, v) => v }
          if (mem.isEmpty) cents(c)
          else Array.tabulate(sd) { i =>
            var su = 0L
            mem.foreach(v => su += v(i))
            // exact long sum, one correctly-rounded division (|sum| ≤ 2^31·1e6
            // is double-exact) — accumulation order cannot matter
            KMeansIVF.roundHalfAway(su.toDouble / mem.length)
          }
        }
      }
      cents
    }
  }

  /** Micro-quantize the corpus and fit codebooks on its bounded
    * hash-sample. Returns the quantized corpus (original columns + `vq`)
    * and the codebooks. */
  def fitAndQuantize(corpus: DataFrame, idCol: String, vecCol: String,
                     m: Int, k: Int, iters: Int, sampleCap: Long):
      (DataFrame, Array[Array[Array[Long]]]) = {
    val em = corpus.withColumn("vq", micro(col(vecCol)))
    val sampleMod = KMeansIVF.sampleModFor(em.count(), sampleCap)
    val sample = em
      .filter(pmod(TextHash.md5Long(col(idCol).cast("string")), lit(sampleMod)) === 0)
      .select(col(idCol), col("vq"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    (em, fit(sample, m, k, iters))
  }

  /** Fit on the bounded hash-sample of `corpus(idCol, vecCol)`, then
    * encode every row map-side. Output: the corpus plus
    * `pq: struct<codes: array<int>, err: bigint>` (exact micro² error). */
  def encodeAll(corpus: DataFrame, idCol: String, vecCol: String,
                m: Int, k: Int, iters: Int, sampleCap: Long): DataFrame = {
    val (em, cb) = fitAndQuantize(corpus, idCol, vecCol, m, k, iters, sampleCap)
    em.withColumn("pq", PqExpressions.pqEncodeMicro(col("vq"), cb))
  }

  /** ADC lookup table for one query: `lut(sub)(cid)` = exact integer L2²
    * between the query's subvector and that centroid — the table an ADC
    * scan adds up per corpus code word. */
  def adcLut(qv: Array[Long], cb: Array[Array[Array[Long]]]): Array[Array[Long]] = {
    val sd = cb(0)(0).length
    Array.tabulate(cb.length) { s =>
      val base = s * sd
      cb(s).map { cent =>
        var d = 0L; var i = 0
        while (i < sd) { val df = qv(base + i) - cent(i); d += df * df; i += 1 }
        d
      }
    }
  }

  /** DuckDB replay: micro-quantize, hash-sample, per-subspace init, each
    * unrolled Lloyd round (subspaces FLATTENED into a data dimension, so
    * the chain is `iters` CTEs, not `m·iters`), then full-corpus encode.
    * Ends inside the WITH list (trailing comma) with
    * `enc(id, err)` in scope. Caller's `$table` must expose
    * `($idCol, $vecCol)`. Every multi-referenced CTE is MATERIALIZED
    * (the q102 inlining lesson). */
  def oracleCtes(table: String, idCol: String, vecCol: String,
                 m: Int, k: Int, iters: Int, sampleCap: Long,
                 fitPred: String = "TRUE"): String = {
    // `fitPred` (over `em`'s `id`) restricts the FIT — sample membership
    // AND the count the modulus derives from — to a subset while the
    // encode still covers the whole table: the append-without-refit
    // replay ([[IvfPq.appendOracleSql]]), where codebooks are fitted on
    // the base corpus and the appended batch is encoded against them.
    // The default TRUE is the historical whole-table fit.
    val h = TextHash.md5LongSql("id::VARCHAR")
    val mod = s"(SELECT greatest(1, (count(*) + ${sampleCap - 1}) // $sampleCap) " +
      s"FROM em WHERE $fitPred)"
    val subs = s"(SELECT unnest(range(0, $m)) AS sub)"
    val sb = new StringBuilder
    sb ++= s"em AS MATERIALIZED (SELECT $idCol AS id,\n"
    sb ++= s"  list_transform($vecCol::DOUBLE[], x -> CAST(round(x * 1000000) AS BIGINT)) AS vq\n"
    sb ++= s"  FROM $table),\n"
    sb ++= s"smp AS (SELECT id, vq FROM em WHERE ($fitPred) AND $h % $mod = 0),\n"
    // sd = dim/m derived per row: slices are 1-based inclusive
    sb ++= s"ssub AS MATERIALIZED (SELECT id, sub,\n"
    sb ++= s"  vq[(sub * (len(vq) // $m) + 1):((sub + 1) * (len(vq) // $m))] AS sv\n"
    sb ++= s"  FROM smp, $subs),\n"
    sb ++= s"pc0 AS MATERIALIZED (SELECT sub, cid, sv AS cv FROM (\n"
    sb ++= s"  SELECT sub, sv, row_number() OVER (PARTITION BY sub ORDER BY id) - 1 AS cid\n"
    sb ++= s"  FROM ssub) WHERE cid < $k),\n"
    for (i <- 1 to iters) {
      val prev = s"pc${i - 1}"
      sb ++= s"pd$i AS (SELECT id, sub, cid, sum((x - y) * (x - y)) AS d FROM (\n"
      sb ++= s"  SELECT s.id, s.sub, c.cid, unnest(s.sv) AS x, unnest(c.cv) AS y\n"
      sb ++= s"  FROM ssub s JOIN $prev c USING (sub)) GROUP BY 1, 2, 3),\n"
      sb ++= s"pa$i AS MATERIALIZED (SELECT id, sub, cid FROM (\n"
      sb ++= s"  SELECT id, sub, cid, row_number() OVER (PARTITION BY id, sub\n"
      sb ++= s"    ORDER BY d, cid) AS rn FROM pd$i) WHERE rn = 1),\n"
      sb ++= s"pm$i AS (SELECT sub, cid, list(mu ORDER BY pos) AS cv FROM (\n"
      sb ++= s"  SELECT sub, cid, pos, CAST(round(sum(x)::DOUBLE / count(*)) AS BIGINT) AS mu FROM (\n"
      sb ++= s"    SELECT a.sub, a.cid, unnest(s.sv) AS x, unnest(range(1, len(s.sv) + 1)) AS pos\n"
      sb ++= s"    FROM pa$i a JOIN ssub s ON a.id = s.id AND a.sub = s.sub)\n"
      sb ++= s"  GROUP BY 1, 2, 3) GROUP BY 1, 2),\n"
      sb ++= s"pc$i AS MATERIALIZED (SELECT c.sub, c.cid, coalesce(m.cv, c.cv) AS cv\n"
      sb ++= s"  FROM $prev c LEFT JOIN pm$i m ON c.sub = m.sub AND c.cid = m.cid),\n"
    }
    sb ++= s"esub AS MATERIALIZED (SELECT id, sub,\n"
    sb ++= s"  vq[(sub * (len(vq) // $m) + 1):((sub + 1) * (len(vq) // $m))] AS sv\n"
    sb ++= s"  FROM em, $subs),\n"
    sb ++= s"ed AS (SELECT id, sub, cid, sum((x - y) * (x - y)) AS d FROM (\n"
    sb ++= s"  SELECT e.id, e.sub, c.cid, unnest(e.sv) AS x, unnest(c.cv) AS y\n"
    sb ++= s"  FROM esub e JOIN pc$iters c USING (sub)) GROUP BY 1, 2, 3),\n"
    // per-(id, sub) argmin WITH the code — enc for error rollups, easg for
    // ADC joins (min(d) of a sub == the argmin row's d)
    sb ++= s"easg AS MATERIALIZED (SELECT id, sub, cid, d FROM (\n"
    sb ++= s"  SELECT id, sub, cid, d, row_number() OVER (PARTITION BY id, sub\n"
    sb ++= s"    ORDER BY d, cid) AS rn FROM ed) WHERE rn = 1),\n"
    sb ++= s"enc AS MATERIALIZED (SELECT id, sum(d)::BIGINT AS err FROM easg GROUP BY id),\n"
    sb.toString
  }
}
