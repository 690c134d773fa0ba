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
