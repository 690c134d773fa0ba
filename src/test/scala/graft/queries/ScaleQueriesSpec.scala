package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ScaleQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q270 rendezvous: minimal disruption — every moved doc lands on the NEW shard") {
    val rows = ScaleQueries.queries("q270_rendezvous_sharding")(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.length == 9)
    val total = rows.head._4
    val moved = rows.head._5
    assert(rows.map(_._2).sum == total && rows.map(_._3).sum == total)
    // THE rendezvous property: a doc moves iff the new shard's score wins
    // its argmax — so moved == exactly the new shard's population, and no
    // old shard GAINS docs
    val newShard = rows.find(_._1 == 8L).get
    assert(newShard._2 == 0L && newShard._3 == moved,
      "shard 8 must hold exactly the moved docs")
    for ((shard, n8, n9, _, _, _) <- rows if shard != 8L)
      assert(n9 <= n8, s"old shard $shard must never gain docs")
    // moved share ~ 1/9 (binomial around 1111 bp; generous band)
    val bp = rows.head._6
    assert(bp > 700 && bp < 1600, s"moved share $bp bp far from 1/9")
    // contrast: mod-hashing 8 -> 9 moves ~8/9 of docs — recompute directly
    def md5l(s: String) = graft.functions.Md5LongUtil.hashBytes(s.getBytes("UTF-8"))
    val ids = graft.Tables.documents(spark, "/root/testdata/sf0.01")
      .select("doc_id").collect().map(_.getLong(0))
    val modMoved = ids.count(id => md5l("m:" + id) % 8 != md5l("m:" + id) % 9)
    assert(modMoved * 10000L / ids.length > 7000,
      "mod-hashing reshuffles most docs — the property rendezvous avoids")
  }
}
