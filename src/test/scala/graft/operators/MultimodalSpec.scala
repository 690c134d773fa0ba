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
