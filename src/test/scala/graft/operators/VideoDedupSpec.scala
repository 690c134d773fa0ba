package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Video temporal-fingerprint near-dup: decode parity against a pure-Scala
  * reference, resolution invariance across group variants, planted-group
  * recovery, and blocking losslessness. */
class VideoDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent reference: minimal header parse + frame-sum compares. */
  private def refTemporalHash(p: Array[Byte], nPairs: Int = 56): Option[Long] = {
    val s = new String(p, "ISO-8859-1")
    require(s.startsWith("P6\n"))
    val hdr = s.drop(3).split("\n", 3)
    val Array(w, h) = hdr(0).split(" ").map(_.toInt)
    val off = s.indexOf("\n255\n") + 5
    val spf = w * h * 3
    val frames = (p.length - off) / spf
    if (frames < 2 * nPairs) return None
    def fsum(fr: Int): Long =
      (0 until spf).map(i => (p(off + fr * spf + i) & 0xff).toLong).sum
    var hsh = 0L
    for (i <- 0 until nPairs) if (fsum(2 * i) > fsum(2 * i + 1)) hsh |= 1L << i
    Some(hsh)
  }

  private def clips(ids: Seq[Long]) =
    ids.toDF("id").select(col("id"),
      Multimodal.ppmPayloadScenesGrouped(col("id")).as("p"))

  test("withTemporalHash matches an independent pure-Scala reference") {
    val ids = 0L until 24L
    val pays = clips(ids).collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val got = Multimodal.withTemporalHash(clips(ids), "p")
      .select(col("id"), col("temporal_hash")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach(i => assert(got(i) == refTemporalHash(pays(i)).get, s"id $i"))
  }

  test("resolution invariance: within-group variants differ only at perturbed frames") {
    // variants share the scene constants (rendered at width 3 or 6 — the
    // sum comparison cancels the pixel count) and each perturbs ONE
    // distinct frame touching ONE disjoint-pair bit: pairwise Hamming <= 2
    val fps = Multimodal.withTemporalHash(clips(0L until 8L), "p")
      .select(col("id"), col("temporal_hash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (a <- 0 until 8; b <- (a + 1) until 8) {
      val ham = java.lang.Long.bitCount(fps(a) ^ fps(b))
      assert(ham <= 2, s"variants $a,$b of one group: hamming $ham > 2")
    }
  }

  test("planted groups recovered; blocking is lossless vs brute force") {
    val n = 80L
    val pairs = VideoDedup.pairs(clips(0L until n), "id", "p", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val within = pairs.filter { case (a, b, _) => a / 8 == b / 8 }
    assert(within.length == 10 * 28, s"got ${within.length} within-group pairs")
    val fps = VideoDedup.fingerprints(clips(0L until n), "id", "p")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (a, fa) <- fps; (b, fb) <- fps if a < b
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 3
    } yield (a, b, h)).toSet
    assert(pairs.toSet == brute)
  }

  test("malformed and short clips fingerprint NULL; the row survives") {
    val df = spark.createDataFrame(Seq(
      (1L, "P5\nbad".getBytes("US-ASCII")),
      (2L, null.asInstanceOf[Array[Byte]]))).toDF("id", "p")
    assert(Multimodal.withTemporalHash(df, "p")
      .select(col("temporal_hash")).collect().forall(_.isNullAt(0)))
    // a valid but 5-frame clip (ppmPayloadScenes) is too short for 56 pairs
    val short = Seq(3L).toDF("id").select(col("id"),
      Multimodal.ppmPayloadScenes(col("id")).as("p"))
    assert(Multimodal.withTemporalHash(short, "p")
      .select(col("temporal_hash")).collect().forall(_.isNullAt(0)))
  }
}
