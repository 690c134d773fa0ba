package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Audio fingerprint near-dup: decode→peak-hash parity against a
  * pure-Scala reference, GAIN invariance of peak positions, planted-group
  * recovery, and blocking losslessness (blocked == brute for Hamming ≤ 3). */
class AudioDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent reference: parse the canonical 44-byte header minimally
    * and scan 16-bit LE samples — deliberately a different formulation
    * from WavDecoder (no chunk-tag validation, direct arithmetic). */
  private def refPeakHash(p: Array[Byte], window: Int = 160, nWin: Int = 56): Option[Long] = {
    def le16(i: Int): Int = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    val channels = le16(22)
    val dataLen = (p(40) & 0xffL) | ((p(41) & 0xffL) << 8) |
      ((p(42) & 0xffL) << 16) | ((p(43) & 0xffL) << 24)
    val n = (dataLen / (2 * channels)).toInt
    if (n < window * nWin) return None
    var h = 0L
    for (w <- 0 until nWin) {
      var best = -1; var pos = 0
      for (i <- 0 until window) {
        val u = le16(44 + 2 * ((w * window + i) * channels))
        val v = if (u >= 32768) u - 65536 else u
        if (math.abs(v) > best) { best = math.abs(v); pos = i }
      }
      if (pos >= window / 2) h |= 1L << w
    }
    Some(h)
  }

  private def clips(ids: Seq[Long]) =
    Multimodal.withWavPayloadScaled(ids.toDF("id"), "id")
      .select(col("id"), col("payload").as("p"))

  test("byte builder == column construction, byte for byte") {
    val ids = Seq(0L, 1L, 7L, 8L, 63L, 500L)
    val colForm = ids.toDF("id")
      .select(col("id"), Multimodal.wavPayloadScaled(col("id")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    ids.foreach { i =>
      assert(java.util.Arrays.equals(colForm(i), Multimodal.buildWavScaled(i)),
        s"id $i: the two construction paths must agree byte-for-byte")
    }
  }

  test("withPeakHash matches an independent pure-Scala reference") {
    val ids = 0L until 32L
    val pays = clips(ids).collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val got = Multimodal.withPeakHash(clips(ids), "p")
      .select(col("id"), col("peak_hash")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach(i => assert(got(i) == refPeakHash(pays(i)).get, s"id $i"))
  }

  test("gain invariance: within-group fingerprints differ only at perturbed segments") {
    // variants of one group share the waveform (gain-scaled — positions
    // invariant) and each perturbs exactly ONE distinct segment, so any
    // two variants can differ in at most their two perturbed segment
    // bits; the 54 shared unperturbed segments contribute ZERO difference
    val fps = Multimodal.withPeakHash(clips(0L until 8L), "p")
      .select(col("id"), col("peak_hash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (a <- 0 until 8; b <- (a + 1) until 8) {
      val ham = java.lang.Long.bitCount(fps(a) ^ fps(b))
      assert(ham <= 2, s"variants $a,$b of one group: hamming $ham > 2")
    }
  }

  test("planted groups recovered; blocking is lossless vs brute force") {
    val n = 80L // 10 groups of 8
    val pairs = AudioDedup.pairs(clips(0L until n), "id", "p", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val within = pairs.filter { case (a, b, _) => a / 8 == b / 8 }
    // every within-group pair (28 per group) is found
    assert(within.length == 10 * 28, s"got ${within.length} within-group pairs")
    assert(within.forall(_._3 <= 3))
    // losslessness: brute-force popcount over all fingerprints == blocked
    val fps = AudioDedup.fingerprints(clips(0L until n), "id", "p")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (a, fa) <- fps; (b, fb) <- fps if a < b
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 3
    } yield (a, b, h)).toSet
    assert(pairs.toSet == brute)
  }

  test("malformed payloads fingerprint NULL; the row survives") {
    val bad = Seq(
      (1L, "not a wav".getBytes("US-ASCII")),
      (2L, Array.empty[Byte]),
      (3L, null.asInstanceOf[Array[Byte]]))
    val df = spark.createDataFrame(bad).toDF("id", "p")
    val out = Multimodal.withPeakHash(df, "p")
      .select(col("id"), col("peak_hash")).collect()
    assert(out.length == 3 && out.forall(_.isNullAt(1)))
    // and a too-short (valid) clip is NULL too, not an exception
    val short = clips(Seq(5L)).select(col("id"),
      // truncate below 56 windows
      expr("substring(p, 1, 2000)").as("p"))
    assert(Multimodal.withPeakHash(short, "p")
      .select(col("peak_hash")).collect().forall(_.isNullAt(0)))
  }
}
