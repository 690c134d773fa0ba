package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Bucketed snapshot layout: co-bucketed snapshot tables join with ZERO
  * exchanges across a full commit/read cycle, the spec never lies about a
  * mixed file set, and vacuum semantics are unchanged. */
class SnapshotBucketedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft_snapb").toString + "/t"

  test("co-bucketed snapshots join without a shuffle exchange; rows exact") {
    val (dirA, dirB) = (tmp(), tmp())
    SnapshotTable.commitReplaceBucketed(
      (1L to 1000L).map(i => (i, s"left$i")).toDF("k", "lv"), dirA, "k", 8)
    SnapshotTable.commitReplaceBucketed(
      (1L to 1000L).filter(_ % 3 == 0).map(i => (i, s"right$i")).toDF("k", "rv"),
      dirB, "k", 8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val joined = SnapshotTable.readBucketed(spark, dirA)
        .join(SnapshotTable.readBucketed(spark, dirB), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"co-bucketed snapshot join must not shuffle either side:\n$plan")
      assert(joined.count() === 333)
      // data-identical to the plain snapshot read
      assert(SnapshotTable.readBucketed(spark, dirA).collect().toSet ===
        SnapshotTable.read(spark, dirA).collect().toSet)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      dropBucketTables(dirA); dropBucketTables(dirB)
    }
  }

  test("append invalidates the bucket spec loudly; re-replace restores it") {
    val dir = tmp()
    SnapshotTable.commitReplaceBucketed(
      (1L to 100L).map(i => (i, i * 2)).toDF("k", "v"), dir, "k", 4)
    SnapshotTable.readBucketed(spark, dir).count() // valid at v1
    SnapshotTable.commitAppend((101L to 110L).map(i => (i, i * 2)).toDF("k", "v"), dir)
    val e = intercept[IllegalStateException] {
      SnapshotTable.readBucketed(spark, dir)
    }
    assert(e.getMessage.contains("bucket spec"))
    // the plain read still sees everything (bucketing is layout, not data)
    assert(SnapshotTable.read(spark, dir).count() === 110)
    SnapshotTable.commitReplaceBucketed(
      SnapshotTable.read(spark, dir), dir, "k", 4)
    assert(SnapshotTable.readBucketed(spark, dir).count() === 110)
    dropBucketTables(dir)
  }

  test("compactBucketed preserves the bucket spec: the join stays exchange-free") {
    val (dirA, dirB) = (tmp(), tmp())
    SnapshotTable.commitReplaceBucketed(
      (1L to 600L).map(i => (i, s"l$i")).toDF("k", "lv").repartition(6), dirA, "k", 4)
    SnapshotTable.commitReplaceBucketed(
      (1L to 600L).filter(_ % 2 == 0).map(i => (i, s"r$i")).toDF("k", "rv"), dirB, "k", 4)
    val v = SnapshotTable.compactBucketed(spark, dirA)
    assert(v === 2L)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = SnapshotTable.readBucketed(spark, dirA)
        .join(SnapshotTable.readBucketed(spark, dirB), "k")
      assert(!joined.queryExecution.executedPlan.toString.contains("Exchange"))
      assert(joined.count() === 300)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      dropBucketTables(dirA); dropBucketTables(dirB)
    }
    // an unbucketed table refuses loudly instead of silently degrading
    val plain = tmp()
    SnapshotTable.commitReplace((1L to 10L).map(i => (i, i)).toDF("k", "v"), plain)
    val e = intercept[IllegalStateException] {
      SnapshotTable.compactBucketed(spark, plain)
    }
    assert(e.getMessage.contains("bucket spec"))
  }

  test("vacuum after a bucketed re-replace keeps the live layout readable") {
    val dir = tmp()
    SnapshotTable.commitReplaceBucketed(
      (1L to 50L).map(i => (i, "old")).toDF("k", "v"), dir, "k", 4)
    SnapshotTable.commitReplaceBucketed(
      (1L to 60L).map(i => (i, "new")).toDF("k", "v"), dir, "k", 4)
    val (manifests, files) = SnapshotTable.vacuum(dir, keepVersions = 1)
    assert(manifests === 1 && files > 0, "v1 and its data files must vacuum away")
    assert(SnapshotTable.readBucketed(spark, dir).count() === 60)
    assert(SnapshotTable.readBucketed(spark, dir)
      .filter(org.apache.spark.sql.functions.col("v") === "old").count() === 0)
    dropBucketTables(dir)
  }

  private def dropBucketTables(dir: String): Unit =
    SnapshotTable.versions(dir).foreach { v =>
      spark.sql(s"DROP TABLE IF EXISTS ${SnapshotTable.bucketTableName(dir, v)}")
    }
}
