package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("latestPrior: inclusive match, carry-forward, and no-prior nulls") {
    val left = Seq(
      (1L, 5L, "e1"),   // before any right row -> nulls
      (1L, 10L, "e2"),  // equal ts -> inclusive match at 10
      (1L, 25L, "e3"),  // carries forward the ts=20 row, not ts=30
      (2L, 50L, "e4")   // key with no right rows at all
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 10L, 100.0),
      (1L, 20L, 200.0),
      (1L, 30L, 300.0)
    ).toDF("k", "t", "v")

    val out: Map[String, (Option[Long], Option[Double])] =
      AsOfJoin.latestPrior(left, right, "k", "t", "v")
        .select("tag", "asof_ts", "asof_v").collect()
        .map { r =>
          r.getString(0) -> ((
            Option(r.get(1)).map(_.asInstanceOf[Long]),
            Option(r.get(2)).map(_.asInstanceOf[Double])))
        }.toMap

    assert(out("e1") == ((None, None)))
    assert(out("e2") == ((Some(10L), Some(100.0))))
    assert(out("e3") == ((Some(20L), Some(200.0))))
    assert(out("e4") == ((None, None)))
  }
}
