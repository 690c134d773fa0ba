package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join equals plain join, including a heavy key and a dangling key") {
    val left = (Seq.fill(500)(("hot", 1)) ++ Seq(("a", 2), ("b", 3), ("nomatch", 4)))
      .toDF("k", "v")
    val right = Seq(("hot", "H"), ("a", "A"), ("b", "B"), ("unused", "U"))
      .toDF("rk", "tag")
    val salted = SkewJoin.saltedJoin(left, right, "k", "rk", saltFactor = 7)
      .select("k", "v", "tag").collect().map(_.toSeq).toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    val plain = left.join(right, left("k") === right("rk"))
      .select("k", "v", "tag").collect().map(_.toSeq).toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(salted == plain)
    assert(plain.values.sum == 502)
  }

  test("salt-unsafe join types are rejected (right rows would be replicated)") {
    val left = Seq(("a", 1)).toDF("k", "v")
    val right = Seq(("a", "A")).toDF("rk", "tag")
    for (jt <- Seq("right", "right_outer", "full", "full_outer", "outer")) {
      val e = intercept[IllegalArgumentException] {
        SkewJoin.saltedJoin(left, right, "k", "rk", 4, jt)
      }
      assert(e.getMessage.contains("saltedJoin"), s"joinType=$jt")
    }
  }

  test("left join type preserved") {
    val left = Seq(("a", 1), ("z", 2)).toDF("k", "v")
    val right = Seq(("a", "A")).toDF("rk", "tag")
    val out = SkewJoin.saltedJoin(left, right, "k", "rk", 4, "left")
      .select("k", "tag").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("a", "A"), ("z", null)))
  }
}
