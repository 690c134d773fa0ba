package graft.pipeline

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.schema.RorSchema

class StreamingIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rec(id: String, parent: Option[String]): String = {
    val rels = parent.map(p => s"""{"id": "$p", "label": "l", "type": "parent"}""").getOrElse("")
    s"""{"id": "$id", "status": "active", "relationships": [$rels]}"""
  }

  test("newly landed dump files are enriched incrementally via foreachBatch") {
    val base = Files.createTempDirectory("stream_ingest").toString
    val watch = s"$base/in"; Files.createDirectories(Paths.get(watch))
    val q = StreamingIngest.start(spark, RorSchema.schema,
      watch, s"$base/staging", s"$base/ckpt")
    try {
      Files.writeString(Paths.get(s"$watch/dump1.jsonl"),
        Seq(rec("r1", None), rec("c1", Some("r1"))).mkString("\n"))
      q.processAllAvailable()
      Files.writeString(Paths.get(s"$watch/dump2.jsonl"),
        Seq(rec("r2", None), rec("g2", Some("c2")), rec("c2", Some("r2"))).mkString("\n"))
      q.processAllAvailable()

      val out = spark.read.parquet(s"$base/staging")
        .select("id", "ultimate_parent").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(out == Map(
        "r1" -> "r1", "c1" -> "r1",
        "r2" -> "r2", "c2" -> "r2", "g2" -> "r2"))
    } finally q.stop()
  }
}
