package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Perceptual image near-dup: decode→dHash parity against a pure-Scala
  * reference, resolution invariance of the normalized grid, and the
  * pigeonhole blocking losslessness guarantee (blocked == brute force for
  * Hamming ≤ 3). */
class ImageDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent reference dHash: parse header minimally, pool grid sums,
    * exact rational mean compare (BigInt cross-mult — deliberately a
    * different formulation from the operator's long arithmetic). */
  private def refDHash(payload: Array[Byte], gw: Int = 9, gh: Int = 7): Option[Long] = {
    val s = new String(payload, "ISO-8859-1")
    require(s.startsWith("P6\n"))
    val parts = s.drop(3).split("\n", 3)
    val Array(w, h) = parts(0).split(" ").map(_.toInt)
    require(parts(1) == "255")
    val off = s.indexOf("\n255\n") + 5
    if (w < gw || h < gh) return None
    val sums = Array.ofDim[BigInt](gh, gw).map(_.map(_ => BigInt(0)))
    val cnts = Array.ofDim[Long](gh, gw)
    for (py <- 0 until h; px <- 0 until w; c <- 0 until 3) {
      val (gx, gy) = ((px.toLong * gw / w).toInt, (py.toLong * gh / h).toInt)
      sums(gy)(gx) += payload(off + (py * w + px) * 3 + c) & 0xff
      cnts(gy)(gx) += 1
    }
    var fp = 0L
    for (gy <- 0 until gh; gx <- 0 until gw - 1)
      if (sums(gy)(gx) * cnts(gy)(gx + 1) > sums(gy)(gx + 1) * cnts(gy)(gx))
        fp |= 1L << (gy * (gw - 1) + gx)
    Some(fp)
  }

  private def builtPayloads(ids: Seq[Long]): Map[Long, Array[Byte]] =
    ids.toDF("id").select(col("id"), Multimodal.ppmPayloadGrid(col("id")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap

  test("withDHash matches an independent pure-Scala reference on constructed payloads") {
    val ids = (0L until 48L)
    val pays = builtPayloads(ids)
    val got = Multimodal.withDHash(
        ids.toDF("id").select(col("id"), Multimodal.ppmPayloadGrid(col("id")).as("p")), "p")
      .select(col("id"), col("dhash")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach { id =>
      assert(got(id) == refDHash(pays(id)).get, s"id=$id")
    }
  }

  test("resolution invariance: same group at 1x and 2x scales lands within Hamming 2") {
    // variants 0 (9x7) and 3 (18x14) of one group: different resolutions,
    // different one-cell perturbations -> at most 2 bits apart
    val pays = builtPayloads(Seq(40L, 43L)) // gid 5, v 0 and 3
    val f0 = refDHash(pays(40L)).get
    val f3 = refDHash(pays(43L)).get
    assert(java.lang.Long.bitCount(f0 ^ f3) <= 2)
    // and the operator agrees
    val got = Multimodal.withDHash(
        Seq(40L, 43L).toDF("id").select(col("id"), Multimodal.ppmPayloadGrid(col("id")).as("p")), "p")
      .select(col("id"), col("dhash")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(40L) == f0 && got(43L) == f3)
  }

  test("chunk blocking is lossless: blocked pairs == brute force at Hamming <= 3") {
    // seeded random 56-bit fingerprints + planted close pairs
    val rnd = new scala.util.Random(17)
    val base = (0 until 120).map(i => i.toLong -> (rnd.nextLong() & ((1L << 56) - 1)))
    val planted = base.take(20).map { case (id, fp) =>
      // flip 0..3 random bits
      val k = rnd.nextInt(4)
      val flipped = (0 until k).foldLeft(fp)((f, _) => f ^ (1L << rnd.nextInt(56)))
      (id + 1000L) -> flipped
    }
    val all = base ++ planted
    val df = all.toDF("id", "fp")
    val blocked = SimHashDedup.chunkBlockedPairs(df, "id", "fp", 56, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = (for {
      (a, fa) <- all; (b, fb) <- all if a < b
      hd = java.lang.Long.bitCount(fa ^ fb) if hd <= 3
    } yield (a, b, hd)).toSet
    assert(brute.nonEmpty && blocked == brute)
  }

  test("ragged cells: non-multiple dimensions pool exact byte counts per cell") {
    // 10x8 image, w not a multiple of 9: cells have unequal pixel counts,
    // the cross-mult mean compare must still match the BigInt reference
    val w = 10; val h = 8
    val px = Array.tabulate(w * h * 3)(i => ((i * 31 + 7) % 97 + 30).toByte)
    val payload = (s"P6\n$w $h\n255\n").getBytes("ISO-8859-1") ++ px
    val got = Multimodal.withDHash(Seq((1L, payload)).toDF("id", "p"), "p")
      .select(col("dhash")).collect()(0).getLong(0)
    assert(got == refDHash(payload).get)
  }

  test("malformed, too-small, and null payloads yield NULL dhash; rows survive") {
    val rows = Seq(
      (1L, "not a ppm".getBytes("ISO-8859-1")),
      (2L, ("P6\n4 3\n255\n" + "x" * 36).getBytes("ISO-8859-1")), // smaller than grid
      (3L, null.asInstanceOf[Array[Byte]]))
    val out = Multimodal.withDHash(rows.toDF("id", "p"), "p")
      .select(col("id"), col("width"), col("dhash")).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.size == 3)
    assert(out(1L).isNullAt(2) && out(2L).isNullAt(2) && out(3L).isNullAt(2))
    assert(out(2L).getInt(1) == 4) // decoded fine, just below grid size
  }

  test("16-bit samples pool as values: 8-bit image == its 16-bit rendering") {
    // same picture twice: 8-bit samples v, and 16-bit samples (0, v) —
    // identical sample VALUES, so the dHash must match exactly (the
    // pre-fix byte-pooling read half the 16-bit bytes as whole pixels)
    val w = 9; val h = 7
    val vals = Array.tabulate(w * h * 3)(i => (i * 37 + 11) % 200)
    val p8 = (s"P6\n$w $h\n255\n").getBytes("ISO-8859-1") ++ vals.map(_.toByte)
    val p16 = (s"P6\n$w $h\n65535\n").getBytes("ISO-8859-1") ++
      vals.flatMap(v => Array(0.toByte, v.toByte))
    val out = Multimodal.withDHash(
        Seq((1L, p8), (2L, p16)).toDF("id", "p"), "p")
      .select(col("id"), col("dhash")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == out(2L), "8- and 16-bit renderings of one picture must agree")
    // and patch pooling agrees too (sample sums, not byte sums)
    val ps = Multimodal.withPatchSums(
        Seq((1L, p8), (2L, p16)).toDF("id", "p"), "p", 2, 2)
      .select(col("id"), col("patch_sums")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ps(1L) == ps(2L))
  }

  test("pairs refuses a radius beyond the pigeonhole guarantee") {
    val df = Seq((1L, Array[Byte]())).toDF("id", "p")
    intercept[IllegalArgumentException] {
      ImageDedup.pairs(df, "id", "p", maxHamming = 4)
    }
  }
}
