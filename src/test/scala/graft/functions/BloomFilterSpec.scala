package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BloomFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val bits = 1 << 14
  private val depth = 4

  private def bloomOf(keys: Seq[String], parts: Int) = {
    val df = keys.toDF("k").repartition(parts)
    df.agg(BloomFilterAggregate.bloom(TextHash.baseHash(col("k")), bits, depth).as("bf"))
  }

  test("no false negatives: every inserted key tests true") {
    val keys = (1 to 500).map(i => s"key-$i")
    val bf = bloomOf(keys, 8)
    val hits = keys.toDF("k").crossJoin(bf)
      .filter(BloomFilterAggregate.mightContain(col("bf"), TextHash.baseHash(col("k")), bits, depth))
      .count()
    assert(hits == keys.length)
  }

  test("merge is partition-order independent: 1 vs 16 partitions build the same bitset") {
    val keys = (1 to 300).map(i => s"m-$i")
    val a = bloomOf(keys, 1).collect()(0).getSeq[Long](0)
    val b = bloomOf(keys, 16).collect()(0).getSeq[Long](0)
    assert(a == b)
  }

  test("false positive rate stays near theoretical for 500/16384 load") {
    val inserted = (1 to 500).map(i => s"in-$i")
    val bf = bloomOf(inserted, 4)
    val probes = (1 to 5000).map(i => s"out-$i").toDF("k")
    val fp = probes.crossJoin(bf)
      .filter(BloomFilterAggregate.mightContain(col("bf"), TextHash.baseHash(col("k")), bits, depth))
      .count()
    // k=4, n=500, m=16384 -> (1 - e^(-kn/m))^k ~ 1.5e-4; allow generous slack
    assert(fp.toDouble / 5000 < 0.01, s"fp rate ${fp / 5000.0}")
  }

  test("bloom prune then join equals plain join") {
    val dim = (1 to 50).map(i => i * 7L).toDF("dk")
    val fact = (1 to 1000).map(i => (i.toLong % 400, i)).toDF("fk", "v")
    val bf = dim.agg(BloomFilterAggregate.bloom(
      TextHash.baseHash(col("dk").cast("string")), bits, depth).as("bf"))
    val pruned = fact.crossJoin(broadcast(bf))
      .filter(BloomFilterAggregate.mightContain(col("bf"),
        TextHash.baseHash(col("fk").cast("string")), bits, depth))
      .drop("bf")
      .join(dim, col("fk") === col("dk")).select(col("fk"), col("v"))
    val plain = fact.join(dim, col("fk") === col("dk")).select(col("fk"), col("v"))
    assert(pruned.collect().toSet == plain.collect().toSet)
    assert(pruned.count() == plain.count())
  }
}
