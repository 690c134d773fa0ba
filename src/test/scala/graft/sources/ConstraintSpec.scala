package graft.sources

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** CHECK constraints (`SnapshotTable.addConstraint`): commit-time data
  * contracts enforced inside commit() — appends, upserts, CDC applies and
  * stream batches all pass through; SQL NULL-passes semantics; versioned
  * metadata (drop, time travel, carry through replace/clone/merge). */
class ConstraintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_chk").toString

  test("addConstraint validates existing data; violating commits abort unpublished") {
    val t = tmp()
    SnapshotTable.commitAppend(Seq((1L, 10L), (2L, 20L)).toDF("k", "v").coalesce(1), t)
    // existing data breaks it -> refused
    intercept[IllegalArgumentException] {
      SnapshotTable.addConstraint(spark, t, "v_big", "v >= 15")
    }
    val v = SnapshotTable.addConstraint(spark, t, "v_pos", "v > 0")
    assert(SnapshotTable.constraints(t) == Map("v_pos" -> "v > 0"))
    // violating append: loud abort, no manifest published
    intercept[SnapshotTable.ConstraintViolationException] {
      SnapshotTable.commitAppend(Seq((3L, -5L)).toDF("k", "v").coalesce(1), t)
    }
    assert(SnapshotTable.latestVersion(t).contains(v), "no version published")
    // valid append passes; violating upsert aborts; valid upsert passes
    SnapshotTable.commitAppend(Seq((3L, 30L)).toDF("k", "v").coalesce(1), t)
    intercept[SnapshotTable.ConstraintViolationException] {
      SnapshotTable.upsert(spark, t, Seq((1L, 0L)).toDF("k", "v"), Seq("k"))
    }
    SnapshotTable.upsert(spark, t, Seq((1L, 11L)).toDF("k", "v"), Seq("k"))
    assert(SnapshotTable.read(spark, t).count() == 3)
  }

  test("SQL CHECK semantics: NULL passes; missing column (schema evolution) passes") {
    val t = tmp()
    SnapshotTable.commitAppend(Seq((1L, Some(10L))).toDF("k", "v").coalesce(1), t)
    SnapshotTable.addConstraint(spark, t, "v_pos", "v > 0")
    // NULL predicate result keeps the row passing (SQL CHECK)
    SnapshotTable.commitAppend(
      Seq((2L, Option.empty[Long])).toDF("k", "v").coalesce(1), t)
    assert(SnapshotTable.read(spark, t).count() == 2)
    // an append WITHOUT the constrained column null-fills it -> passes
    SnapshotTable.commitAppend(Seq(Tuple1(3L)).toDF("k").coalesce(1), t)
    assert(SnapshotTable.read(spark, t).count() == 3)
  }

  test("constraints carry through replace/compaction and die with dropConstraint") {
    val t = tmp()
    SnapshotTable.commitAppend(Seq((1L, 10L)).toDF("k", "v").coalesce(1), t)
    SnapshotTable.addConstraint(spark, t, "v_pos", "v > 0")
    // a replace is validated AND keeps the contract
    intercept[SnapshotTable.ConstraintViolationException] {
      SnapshotTable.commitReplace(Seq((9L, -1L)).toDF("k", "v").coalesce(1), t)
    }
    SnapshotTable.commitReplace(Seq((9L, 90L)).toDF("k", "v").coalesce(1), t)
    assert(SnapshotTable.constraints(t) == Map("v_pos" -> "v > 0"))
    SnapshotTable.compact(spark, t, 1)
    assert(SnapshotTable.constraints(t) == Map("v_pos" -> "v > 0"))
    // drop -> previously-violating data commits fine; time travel shows the add
    SnapshotTable.dropConstraint(spark, t, "v_pos")
    assert(SnapshotTable.constraints(t).isEmpty)
    SnapshotTable.commitAppend(Seq((10L, -1L)).toDF("k", "v").coalesce(1), t)
    intercept[IllegalArgumentException] {
      SnapshotTable.dropConstraint(spark, t, "v_pos") // already gone
    }
  }

  test("predicate text is one line; violating commits leave NO staged dir behind") {
    val t = tmp()
    SnapshotTable.commitAppend(Seq((1L, 10L)).toDF("k", "v").coalesce(1), t)
    // a newline inside the predicate would corrupt the line-oriented
    // manifest grammar (meta after it parses as phantom file entries)
    intercept[IllegalArgumentException] {
      SnapshotTable.addConstraint(spark, t, "bad", "v >\n0")
    }
    SnapshotTable.addConstraint(spark, t, "v_pos", "v > 0")
    def dataDirs(): Set[String] = {
      val s = Files.list(java.nio.file.Paths.get(t))
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("data-")).toSet
      finally s.close()
    }
    val before = dataDirs()
    intercept[SnapshotTable.ConstraintViolationException] {
      SnapshotTable.commitAppend(Seq((2L, -2L)).toDF("k", "v").coalesce(1), t)
    }
    assert(dataDirs() == before,
      "the violating commit's staged dir must be deleted, not orphaned")
  }

  test("a branch that DROPS a constraint cannot merge into a main that enforces it") {
    val main = tmp(); val br = tmp() + "/b"
    SnapshotTable.commitAppend(Seq((1L, 10L)).toDF("k", "v").coalesce(1), main)
    SnapshotTable.addConstraint(spark, main, "v_pos", "v > 0")
    SnapshotTable.cloneAt(main, SnapshotTable.latestVersion(main).get, br)
    // the branch drops the contract and commits rows main would refuse
    SnapshotTable.dropConstraint(spark, br, "v_pos")
    SnapshotTable.commitAppend(Seq((2L, -2L)).toDF("k", "v").coalesce(1), br)
    val e = intercept[IllegalArgumentException](SnapshotTable.mergeBranch(main, br))
    assert(e.getMessage.contains("never validated"), e.getMessage)
    // re-adding on the branch VALIDATES all branch data — and refuses here
    intercept[IllegalArgumentException] {
      SnapshotTable.addConstraint(spark, br, "v_pos", "v > 0")
    }
    // after deleting the offending rows, re-add succeeds and the merge lands
    SnapshotTable.deleteWhere(spark, br, col("v") <= 0L)
    SnapshotTable.addConstraint(spark, br, "v_pos", "v > 0")
    SnapshotTable.mergeBranch(main, br)
    assert(SnapshotTable.read(spark, main).count() == 1)
  }

  test("restoreVersion: zero-copy rollback, history intact, contracts re-validated") {
    val t = tmp()
    SnapshotTable.commitAppend(Seq((1L, 10L)).toDF("k", "v").coalesce(1), t) // v1
    SnapshotTable.commitAppend(Seq((2L, 20L)).toDF("k", "v").coalesce(1), t) // v2
    SnapshotTable.commitReplace(Seq((9L, -9L)).toDF("k", "v").coalesce(1), t) // v3 bad
    val v4 = SnapshotTable.restoreVersion(spark, t, 2L)
    assert(v4 == 4L)
    assert(SnapshotTable.read(spark, t).select("k").as[Long].collect().sorted
      === Array(1L, 2L), "restored contents")
    assert(SnapshotTable.snapshot(t, 4L).op == "restore")
    assert(SnapshotTable.snapshot(t, 4L).files == SnapshotTable.snapshot(t, 2L).files,
      "zero copy: the restore references v2's files")
    // history intact: the bad v3 still time-travels
    assert(SnapshotTable.readVersion(spark, t, 3L).select("v").as[Long]
      .collect().toSeq == Seq(-9L))
    // idempotent shortcut
    assert(SnapshotTable.restoreVersion(spark, t, 4L) == 4L)
    // a constraint added NOW blocks restoring to data that violates it
    SnapshotTable.addConstraint(spark, t, "v_pos", "v > 0")
    intercept[SnapshotTable.ConstraintViolationException] {
      SnapshotTable.restoreVersion(spark, t, 3L)
    }
    // restoring to satisfying data carries the CURRENT contract forward
    val v6 = SnapshotTable.restoreVersion(spark, t, 1L)
    assert(SnapshotTable.constraints(t) == Map("v_pos" -> "v > 0"))
    assert(SnapshotTable.read(spark, t).count() == 1)
    assert(v6 == 6L)
  }

  test("restoreVersion keeps MOR deletes in force and stream watermarks current") {
    val t = tmp()
    SnapshotTable.commitAppend(
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v").coalesce(1), t) // v1
    SnapshotTable.deleteWhereMor(spark, t, col("k") === 2L)               // v2 dv
    SnapshotTable.commitStreamBatch(
      Seq((4L, 40L)).toDF("k", "v").coalesce(1), t, "s1", 7L)             // v3
    SnapshotTable.restoreVersion(spark, t, 2L)                            // v4
    assert(SnapshotTable.read(spark, t).select("k").as[Long].collect().sorted
      === Array(1L, 3L), "the restored version's deletion vector applies")
    // the stream watermark is NOT rolled back: batch 7 must still dedupe
    assert(SnapshotTable.lastStreamBatch(t, "s1").contains(7L),
      "exactly-once bookkeeping survives restore")
  }

  test("clones inherit constraints; mergeBranch refuses post-branch constraints") {
    val main = tmp(); val br = tmp() + "/b"
    SnapshotTable.commitAppend(Seq((1L, 10L)).toDF("k", "v").coalesce(1), main)
    SnapshotTable.addConstraint(spark, main, "v_pos", "v > 0")
    SnapshotTable.cloneAt(main, SnapshotTable.latestVersion(main).get, br)
    assert(SnapshotTable.constraints(br) == Map("v_pos" -> "v > 0"))
    intercept[SnapshotTable.ConstraintViolationException] {
      SnapshotTable.commitAppend(Seq((2L, -2L)).toDF("k", "v").coalesce(1), br)
    }
    SnapshotTable.commitAppend(Seq((2L, 2L)).toDF("k", "v").coalesce(1), br)
    // a constraint added on main AFTER the branch: the branch never
    // enforced it -> merge refuses (unvalidated data must not land)
    SnapshotTable.addConstraint(spark, main, "k_pos", "k > 0")
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.mergeBranch(main, br)
    }
    assert(e.getMessage.contains("never"), e.getMessage)
    // same-contract branches merge fine (and the merge carries the checks)
    SnapshotTable.dropConstraint(spark, main, "k_pos")
    SnapshotTable.mergeBranch(main, br)
    assert(SnapshotTable.read(spark, main).count() == 2)
    assert(SnapshotTable.constraints(main) == Map("v_pos" -> "v > 0"))
  }
}
