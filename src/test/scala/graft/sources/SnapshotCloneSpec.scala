package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SnapshotCloneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft_clone").toString

  test("clone reproduces the pinned version and evolves independently") {
    val src = tmpTable(); val dst = tmpTable() + "/t"
    SnapshotTable.commitAppend(Seq(1, 2).toDF("x"), src)
    SnapshotTable.commitAppend(Seq(3).toDF("x"), src)
    SnapshotTable.commitAppend(Seq(4).toDF("x"), src) // v3, NOT in the clone

    val v = SnapshotTable.cloneAt(src, 2L, dst)
    assert(v == 1L)
    assert(SnapshotTable.read(spark, dst).as[Int].collect().sorted.toSeq == Seq(1, 2, 3))

    // divergence: each side appends without affecting the other
    SnapshotTable.commitAppend(Seq(100).toDF("x"), dst)
    SnapshotTable.commitAppend(Seq(5).toDF("x"), src)
    assert(SnapshotTable.read(spark, dst).as[Int].collect().sorted.toSeq ==
      Seq(1, 2, 3, 100))
    assert(SnapshotTable.read(spark, src).as[Int].collect().sorted.toSeq ==
      Seq(1, 2, 3, 4, 5))

    // schema carried: the clone knows its columns without opening footers
    assert(SnapshotTable.schemaOf(dst, 1L).exists(_.fieldNames.contains("x")))
  }

  test("vacuuming the source cannot break the clone (hard links pin inodes)") {
    val src = tmpTable(); val dst = tmpTable() + "/t"
    SnapshotTable.commitAppend(Seq(1, 2, 3).toDF("x"), src)
    SnapshotTable.cloneAt(src, 1L, dst)

    // source rewrites everything, then vacuums history down to the rewrite:
    // the original data dirs are DELETED from the source's directory tree
    SnapshotTable.commitReplace(Seq(9).toDF("x"), src)
    val (droppedManifests, deletedFiles) = SnapshotTable.vacuum(src, keepVersions = 1)
    assert(droppedManifests == 1 && deletedFiles > 0)

    // the clone still reads its full pinned content — its directory
    // entries kept the shared inodes alive through the source's unlink
    assert(SnapshotTable.read(spark, dst).as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
    // and vice versa: vacuuming the clone never touches the source
    SnapshotTable.commitReplace(Seq(7).toDF("x"), dst)
    SnapshotTable.vacuum(dst, keepVersions = 1)
    assert(SnapshotTable.read(spark, src).as[Int].collect().toSeq == Seq(9))
  }

  test("zone stats carry; stream watermarks do not; non-empty target rejected") {
    val src = tmpTable(); val dst = tmpTable() + "/t"
    SnapshotTable.commitAppend(
      Seq((1, 10.0), (2, 20.0)).toDF("x", "z"), src, zoneCol = Some("z"))
    // a stream watermark lands in the source's meta
    SnapshotTable.commitStreamBatch(Seq((3, 30.0)).toDF("x", "z"), src, "s1", 7L)

    SnapshotTable.cloneAt(src, 2L, dst)
    val meta = SnapshotTable.snapshot(dst, 1L).meta
    assert(meta.get("zonecol").contains("z"))
    assert(meta.keys.exists(_.startsWith("zone:")), "zone stats should carry")
    assert(!meta.keys.exists(_.startsWith("stream:")),
      "stream dedupe history must NOT carry into a different table")
    assert(meta("op") == "clone")
    assert(SnapshotTable.lastStreamBatch(dst, "s1").isEmpty)

    intercept[IllegalArgumentException] {
      SnapshotTable.cloneAt(src, 1L, dst) // dst already a table
    }
  }
}
