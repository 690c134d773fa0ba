package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "hello world"),
    (2L, "x"),
    (3L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")
    .withColumn("payload", col("text").cast("binary"))

  test("mapPartitions decoder path appends media_meta; null payload -> null struct") {
    val out = Multimodal.withMediaMeta(docs, "payload").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    val m1 = byId(1L).getStruct(byId(1L).fieldIndex("media_meta"))
    assert(m1.getInt(0) == 11)          // byte_len of "hello world"
    assert(m1.getInt(1) == 11 % 640)
    assert(m1.getInt(2) == (11 * 7) % 480)
    assert(m1.getInt(3) == 11 % 30 + 1)
    assert(byId(3L).isNullAt(byId(3L).fieldIndex("media_meta")))
  }

  test("decoder seam: a custom decoder swaps in without touching the plumbing") {
    object FixedDecoder extends Multimodal.MediaDecoder {
      def decode(payload: Array[Byte]): Multimodal.MediaMeta =
        Multimodal.MediaMeta(payload.length, 1920, 1080, 24)
    }
    val out = Multimodal.withMediaMeta(docs.filter(col("payload").isNotNull), "payload", FixedDecoder)
      .select(col("media_meta.width"), col("media_meta.height"), col("media_meta.frames"))
      .collect()
    assert(out.forall(r => r.getInt(0) == 1920 && r.getInt(1) == 1080 && r.getInt(2) == 24))
  }

  test("PpmDecoder parses a real P6 header (with comments) byte-for-byte") {
    val pixels = Array.fill[Byte](3 * 2 * 3)(0x7f)
    val payload = ("P6\n# a comment\n3 2\n# another\n255\n").getBytes("US-ASCII") ++ pixels
    val m = Multimodal.PpmDecoder.decode(payload)
    assert(m == Multimodal.MediaMeta(payload.length, 3, 2, 1))
    // two complete frames appended = our animation convention
    val anim = payload ++ pixels
    assert(Multimodal.PpmDecoder.decode(anim).frames == 2)
    // 16-bit maxval doubles the bytes per pixel: one frame, not two
    val deep = "P6\n3 2\n65535\n".getBytes("US-ASCII") ++ pixels ++ pixels
    assert(Multimodal.PpmDecoder.decode(deep) ==
      Multimodal.MediaMeta(deep.length, 3, 2, 1))
  }

  test("decodeFull derives bytes-per-sample from maxval, not residual bytes (trailing junk)") {
    // one 8-bit frame + ONE trailing junk byte: residual-count inference
    // would misclassify this as 16-bit and sampleAt would read past the end
    val pixels = Array.tabulate[Byte](3 * 2 * 3)(i => (i + 1).toByte)
    val junk = ("P6\n3 2\n255\n").getBytes("US-ASCII") ++ pixels :+ 0x55.toByte
    val (meta, off, bps) = Multimodal.PpmDecoder.decodeFull(junk)
    assert(meta.frames == 1 && bps == 1)
    assert(Multimodal.PpmDecoder.sampleAt(junk, off, bps, 17) == 18)
    // 16-bit stays 2 bytes/sample
    val deep = "P6\n3 2\n65535\n".getBytes("US-ASCII") ++ pixels ++ pixels
    assert(Multimodal.PpmDecoder.decodeFull(deep)._3 == 2)
    // sampleAt overruns surface as MediaFormatException (per-row failure
    // path), never a raw ArrayIndexOutOfBoundsException that kills the task
    assertThrows[Multimodal.MediaFormatException](
      Multimodal.PpmDecoder.sampleAt(junk, off, 2, pixels.length))
  }

  test("PpmDecoder rejects malformed payloads; withMediaMeta maps them to null meta") {
    val bad = Seq(
      "P5\n3 2\n255\n".getBytes("US-ASCII") ++ Array.fill[Byte](18)(1), // wrong magic
      "P6\n0 2\n255\n".getBytes("US-ASCII") ++ Array.fill[Byte](18)(1), // zero width
      "P6\n3 2\n999999\n".getBytes("US-ASCII") ++ Array.fill[Byte](18)(1), // maxval range
      "P6\n3 2\n255\n".getBytes("US-ASCII") ++ Array.fill[Byte](5)(1), // truncated
      "P6\n3 x\n255\n".getBytes("US-ASCII") ++ Array.fill[Byte](18)(1)) // non-numeric
    for (p <- bad)
      assertThrows[Multimodal.MediaFormatException](Multimodal.PpmDecoder.decode(p))
    val df = Seq((1L, "ok"), (2L, "bad")).toDF("id", "tag")
      .withColumn("payload",
        when(col("tag") === "ok",
          Multimodal.ppmPayload(org.apache.spark.sql.functions.lit(10)))
          .otherwise(col("tag").cast("binary")))
    val out = Multimodal.withMediaMeta(df, "payload", Multimodal.PpmDecoder)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!out(1L).isNullAt(out(1L).fieldIndex("media_meta")),
      "well-formed payload must decode")
    assert(out(2L).isNullAt(out(2L).fieldIndex("media_meta")),
      "malformed payload must yield a null meta, not a task failure")
  }

  test("ppmPayload construction round-trips through the real parser") {
    val df = spark.range(1, 200).toDF("n")
      .withColumn("payload", Multimodal.ppmPayload(col("n").cast("int")))
    val parsed = Multimodal.withMediaMeta(df, "payload", Multimodal.PpmDecoder)
      .select(col("n"), col("media_meta.width"), col("media_meta.height"),
        col("media_meta.frames"), col("media_meta.byte_len"))
      .collect()
    for (r <- parsed) {
      val n = r.getLong(0)
      val (w, h, f) = ((n % 8 + 1).toInt, (n * 7 % 6 + 1).toInt, (n % 5 + 1).toInt)
      assert(r.getInt(1) == w && r.getInt(2) == h && r.getInt(3) == f,
        s"n=$n parsed (${r.getInt(1)},${r.getInt(2)},${r.getInt(3)}) != built ($w,$h,$f)")
      assert(r.getInt(4) == 11 + w * h * 3 * f)
    }
  }

  test("withPatchSums pools a hand-computed 3x2 image into ragged 2x2 patches") {
    // 3x2 RGB, pixel bytes 0..17 (frame 1); 2x2 patches => pxAcross=2, pxDown=1.
    // patch 0 covers pixels (0,0),(1,0),(0,1),(1,1) = byte triples 0,1,3,4
    // patch 1 (ragged, 1 px wide) covers (2,0),(2,1) = triples 2,5.
    val pixels = Array.tabulate[Byte](18)(_.toByte)
    val payload = "P6\n3 2\n255\n".getBytes("US-ASCII") ++ pixels
    val df = Seq((1L, payload)).toDF("id", "payload")
    val r = Multimodal.withPatchSums(df, "payload", pw = 2, ph = 2).collect().head
    def tripleSum(px: Int): Long = (0 until 3).map(c => 3 * px + c).sum.toLong
    val p0 = tripleSum(0) + tripleSum(1) + tripleSum(3) + tripleSum(4)
    val p1 = tripleSum(2) + tripleSum(5)
    assert(r.getAs[Int]("width") == 3 && r.getAs[Int]("height") == 2)
    assert(r.getAs[Int]("n_patches") == 2)
    assert(r.getAs[String]("patch_sums") == s"$p0,$p1")
    assert(r.getAs[Long]("total_sum") == (0 until 18).sum.toLong)
  }

  test("withPatchSums uses only the FIRST frame and maps malformed payloads to nulls") {
    val pixels = Array.fill[Byte](18)(1)
    val anim = "P6\n3 2\n255\n".getBytes("US-ASCII") ++ pixels ++
      Array.fill[Byte](18)(99) // second frame must NOT contribute
    val df = Seq(
      (1L, anim),
      (2L, "not a ppm".getBytes("US-ASCII"))).toDF("id", "payload")
    val out = Multimodal.withPatchSums(df, "payload", pw = 2, ph = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("total_sum") == 18L, "frame-2 bytes leaked into sums")
    assert(out(2L).isNullAt(out(2L).fieldIndex("patch_sums")),
      "malformed payload must yield nulls, not a task failure")
  }

  test("ppmPayloadTextured pixels round-trip the parser and match the alphabet law") {
    val df = spark.range(1, 60).toDF("n")
      .withColumn("payload", Multimodal.ppmPayloadTextured(col("n").cast("int")))
    val rows = Multimodal.withPatchSums(df, "payload", pw = 2, ph = 2)
      .select(col("n"), col("width"), col("height"), col("total_sum")).collect()
    for (r <- rows) {
      val n = r.getLong(0)
      val (w, h) = ((n % 8 + 1).toInt, (n * 7 % 6 + 1).toInt)
      assert(r.getInt(1) == w && r.getInt(2) == h)
      val expect = (0 until w * h * 3).map(i => 97L + i % 26).sum
      assert(r.getLong(3) == expect, s"n=$n textured byte law mismatch")
    }
  }

  test("withFrameSums decodes EVERY frame at its own offset; scene law holds") {
    val df = spark.range(1, 40).toDF("id")
      .select(col("id"), Multimodal.ppmPayloadScenes(col("id")).as("payload"))
    val rows = Multimodal.withFrameSums(df, "payload")
      .select(col("id"), col("frame_idx"), col("frame_sum")).collect()
    val byId = rows.groupBy(_.getLong(0))
    for ((id, rs) <- byId) {
      val (w, h, f) = ((id % 8 + 1).toInt, (id * 7 % 6 + 1).toInt, (id % 5 + 1).toInt)
      assert(rs.length == f, s"id=$id must emit one row per frame")
      for (r <- rs) {
        val fr = r.getLong(1)
        val b = 97 + graft.functions.Md5LongUtil.hashBytes(
          s"scn:$id:${fr / 2}".getBytes("UTF-8")) % 26
        assert(r.getLong(2) == w.toLong * h * 3 * b, s"id=$id frame $fr")
      }
    }
    // malformed payloads emit zero rows, never fail the task
    val bad = Multimodal.withFrameSums(
      docs.filter(col("payload").isNotNull), "payload").count()
    assert(bad == 0L)
    // a 2-frame hand-built animation with DIFFERENT frame bytes: the
    // second frame's sum must come from the second frame's bytes
    val anim = "P6\n2 1\n255\n".getBytes("US-ASCII") ++
      Array.fill[Byte](6)(10) ++ Array.fill[Byte](6)(20)
    val df2 = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(1L, anim))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("payload",
          org.apache.spark.sql.types.BinaryType))))
    val sums = Multimodal.withFrameSums(df2, "payload")
      .select(col("frame_idx"), col("frame_sum"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sums == Map(0L -> 60L, 1L -> 120L))
  }

  // --- audio (RIFF/WAVE 16-bit PCM) ----------------------------------------

  /** Hand-build a canonical 44-byte-header WAV from signed sample values. */
  private def buildWav(samples: Seq[Int], rate: Int = 8000, channels: Int = 1,
      fmt: Int = 1, bits: Int = 16): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
      .putInt(16).putShort(fmt.toShort).putShort(channels.toShort)
      .putInt(rate).putInt(rate * channels * bits / 8)
      .putShort((channels * bits / 8).toShort).putShort(bits.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(v => bb.putShort(v.toShort))
    bb.array()
  }

  test("WavDecoder parses a canonical header and decodes signed LE samples") {
    val samples = Seq(0, 1, -1, 32767, -32768, 100)
    val wav = buildWav(samples, rate = 44100)
    val (m, off) = Multimodal.WavDecoder.decodeWithOffset(wav)
    assert(m.sampleRate == 44100 && m.channels == 1 && m.nSamples == 6 && off == 44)
    val decoded = (0 until 6).map(i =>
      Multimodal.WavDecoder.sampleAt(wav, off, 1, i, 0))
    assert(decoded == samples, "16-bit LE two's-complement decode")
    // stereo: channel deinterleave
    val st = buildWav(Seq(10, -20, 30, -40), channels = 2)
    val (ms, offS) = Multimodal.WavDecoder.decodeWithOffset(st)
    assert(ms.channels == 2 && ms.nSamples == 2)
    assert(Multimodal.WavDecoder.sampleAt(st, offS, 2, 1, 0) == 30)
    assert(Multimodal.WavDecoder.sampleAt(st, offS, 2, 1, 1) == -40)
  }

  test("WavDecoder rejects malformed payloads loudly") {
    def bad(b: Array[Byte]) = intercept[Multimodal.MediaFormatException] {
      Multimodal.WavDecoder.decodeWithOffset(b)
    }
    val ok = buildWav(Seq(1, 2, 3))
    bad(ok.take(43))                                   // short
    bad { val b = ok.clone(); b(0) = 'X'.toByte; b }   // bad magic
    bad(buildWav(Seq(1, 2), fmt = 3))                  // non-PCM (float)
    bad(buildWav(Seq(1, 2), bits = 8))                 // 8-bit
    bad { val b = ok.clone(); b(40) = 99; b }          // data overruns payload
    bad { val b = buildWav(Seq(1, 2), channels = 2)    // truncated sample frame
      b(40) = 2; b }
  }

  test("wavPayload construction round-trips the real parser and the sample law") {
    val rows = spark.range(0, 15).toDF("id")
      .select(col("id"), Multimodal.wavPayload(col("id")).as("payload"))
      .collect()
    for (r <- rows) {
      val id = r.getLong(0)
      val wav = r.getAs[Array[Byte]](1)
      val (m, off) = Multimodal.WavDecoder.decodeWithOffset(wav)
      val n = (id % 7) * 160 + 400
      assert(m.sampleRate == 8000 && m.channels == 1 && m.nSamples == n,
        s"id=$id header mismatch")
      assert(wav.length == 44 + 2 * n, "no trailing garbage")
      // replay the amplitude law in pure Scala and compare every sample
      for (s <- 0 until n.toInt) {
        val seg = s / 160
        val a = if (graft.functions.Md5LongUtil.hashBytes(
          s"aud:$id:$seg".getBytes("UTF-8")) % 4 > 0) 12000L else 40L
        val expect = (s * 37L + id * 13L) % (2 * a + 1) - a
        assert(Multimodal.WavDecoder.sampleAt(wav, off, 1, s, 0) == expect,
          s"id=$id sample $s")
      }
    }
  }

  test("withAudioFeatures matches a pure-Scala reference incl. ragged windows") {
    // 2.5 windows of 160: loud / silent / silent(ragged tail of 80)
    val clip = (0 until 160).map(s => if (s % 2 == 0) 500 else -500) ++
      Seq.fill(160)(10) ++ Seq.fill(80)(-63)
    val wav = buildWav(clip)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, wav),
        org.apache.spark.sql.Row(2L, "nonsense".getBytes("US-ASCII")),
        org.apache.spark.sql.Row(3L, null))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("payload",
          org.apache.spark.sql.types.BinaryType))))
    val out = Multimodal.withAudioFeatures(df, "payload")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_samples") == 400L)
    assert(r1.getAs[Long]("duration_ms") == 50L)
    assert(r1.getAs[Long]("peak_abs") == 500L)
    assert(r1.getAs[Long]("sum_abs") == 160L * 500 + 160L * 10 + 80L * 63)
    assert(r1.getAs[Long]("mean_abs") ==
      (160L * 500 + 160L * 10 + 80L * 63) / 400L)
    assert(r1.getAs[Long]("n_windows") == 3L)
    assert(r1.getAs[Long]("n_silent") == 2L, "silent = max|v| < 64 incl. ragged")
    assert(r1.getAs[Long]("longest_silence") == 2L)
    assert(out(2L).isNullAt(out(2L).fieldIndex("n_samples")),
      "malformed payload yields nulls, row survives")
    assert(out(3L).isNullAt(out(3L).fieldIndex("n_samples")))
    // a silent run broken by a loud window: longest counts the max run only
    val clip2 = Seq.fill(160)(0) ++ (0 until 160).map(_ => 1000) ++
      Seq.fill(160)(1) ++ Seq.fill(160)(2)
    val df2 = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(9L, buildWav(clip2)))), df.schema)
    val r9 = Multimodal.withAudioFeatures(df2, "payload").collect()(0)
    assert(r9.getAs[Long]("n_silent") == 3L)
    assert(r9.getAs[Long]("longest_silence") == 2L)
  }

  test("column stub path agrees with mapPartitions decoder path") {
    val viaMap = Multimodal.withMediaMeta(docs.filter(col("payload").isNotNull), "payload")
      .select(col("doc_id"), col("media_meta.byte_len"), col("media_meta.width"),
        col("media_meta.height"), col("media_meta.frames"))
      .collect().map(_.toSeq).toSet
    val viaCols = Multimodal.stubMetaColumns(docs.filter(col("payload").isNotNull), "payload")
      .select(col("doc_id"), col("byte_len"), col("width"), col("height"), col("frames"))
      .collect().map(_.toSeq).toSet
    assert(viaMap == viaCols)
  }
}
