package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.PortableMath

class DsirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Pure-Scala reference of the milli-log2 primitive. */
  private def mlog2Ref(x: Long): Long = {
    require(x >= 1)
    val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val pw = 1L << e
    1000L * e + ((x - pw) * 1000L) / pw
  }

  test("mlog2 column matches the integer reference over 1..4096 and power boundaries") {
    val xs = (1L to 4096L) ++ Seq(1L << 20, (1L << 20) - 1, (1L << 20) + 1,
      (1L << 40) - 1, 1L << 40, (1L << 40) + 1)
    val got = xs.toDF("x").select(col("x"), PortableMath.mlog2(col("x")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    xs.foreach { x => assert(got(x) === mlog2Ref(x), s"x=$x") }
  }

  test("mlog2 is monotone and exact at powers of two") {
    assert(mlog2Ref(1) === 0L)
    assert(mlog2Ref(2) === 1000L)
    assert(mlog2Ref(1024) === 10000L)
    val vals = (1L to 10000L).map(mlog2Ref)
    assert(vals.sliding(2).forall(p => p(0) <= p(1)))
  }

  test("bucket LUT matches a pure-Scala replay and separates target vocab") {
    // token counts must dominate the +nBuckets smoothing mass or every
    // llr is a smoothing artifact — repeat each text 12x (~48 tokens/doc)
    def rep(t: String) = Array.fill(12)(t).mkString(" ")
    val docs = Seq(
      (1L, rep("alpha beta gamma alpha"), "tgt"),
      (2L, rep("alpha gamma beta beta"), "tgt"),
      (3L, rep("zeta eta theta zeta"), "bg"),
      (4L, rep("eta theta zeta eta"), "bg"),
      (5L, rep("alpha beta zeta gamma"), "bg")).toDF("doc_id", "text", "grp")
    val nB = 64
    val lut = Dsir.bucketLut(docs, col("grp") === "tgt", col("text"), nB)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // pure-Scala replay: bucket via the same md5 scheme evaluated through Spark
    val tokRows = docs.select(col("grp") === "tgt", explode(split(lower(col("text")), "\\s+")))
      .collect().map(r => (r.getBoolean(0), r.getString(1)))
    val bucketOf = tokRows.map(_._2).distinct.map { t =>
      t -> Seq(t).toDF("t").select(Dsir.bucket(col("t"), nB)).head().getLong(0)
    }.toMap
    val cs = tokRows.groupBy(r => bucketOf(r._2)).map { case (b, rs) => b -> rs.size.toLong }
    val ct = tokRows.filter(_._1).groupBy(r => bucketOf(r._2))
      .map { case (b, rs) => b -> rs.size.toLong }.withDefaultValue(0L)
    val ns = cs.values.sum; val nt = ct.values.sum
    cs.foreach { case (b, c) =>
      val expect = mlog2Ref(ct(b) + 1) - mlog2Ref(nt + nB) - mlog2Ref(c + 1) + mlog2Ref(ns + nB)
      assert(lut(b) === expect, s"bucket $b")
    }

    // target vocabulary buckets carry positive llr, background negative
    assert(lut(bucketOf("alpha")) > 0)
    assert(lut(bucketOf("zeta")) < 0)

    // scoring ranks a target-vocab doc above a background-vocab doc
    val lutDf = Dsir.bucketLut(docs, col("grp") === "tgt", col("text"), nB)
    val scores = Dsir.scored(docs, lutDf, "doc_id", col("text"), nB)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(scores(1L) > scores(3L))
    assert(scores(5L) > scores(3L) && scores(5L) < scores(1L))

    // the frozen-LUT map-side form agrees exactly on the fit corpus,
    // scores unseen vocabulary 0, and is streaming-safe (stateless)
    val m = Dsir.lutMap(lutDf)
    val mapSide = Dsir.scoredMapSide(docs, m, "doc_id", col("text"), nB)
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getLong(2)))).toMap
    val joined = Dsir.scored(docs, lutDf, "doc_id", col("text"), nB)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    joined.foreach { case (id, (n, sc)) =>
      assert(mapSide(id) === ((n.toInt, sc)), s"doc $id") }
    // a token whose BUCKET is absent from the LUT scores 0 (hashed
    // features collide, so pick one with a provably unobserved bucket)
    val fresh = (0 until 200).map(i => s"tok$i").toDF("t")
      .select(col("t"), Dsir.bucket(col("t"), nB).as("b"))
      .collect().collectFirst { case r if !m.contains(r.getLong(1)) => r.getString(0) }.get
    val unseen = Seq((9L, s"$fresh $fresh")).toDF("doc_id", "text")
    val u = Dsir.scoredMapSide(unseen, m, "doc_id", col("text"), nB).head()
    assert(u.getInt(1) === 2 && u.getLong(2) === 0L)
  }

  test("map-side scoring over a stream equals the batch form under slicing") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val docs = Seq((1L, "alpha beta"), (2L, "zeta eta"), (3L, "alpha zeta"),
      (4L, "beta beta gamma"), (5L, "theta"))
    val lut = Dsir.lutMap(Dsir.bucketLut(
      docs.toDF("doc_id", "text"), col("doc_id") <= 2, col("text"), 32))
    val batch = Dsir.scoredMapSide(
      docs.toDF("doc_id", "text"), lut, "doc_id", col("text"), 32)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    for (sliceAt <- Seq(1, 3)) {
      val mem = MemoryStream[(Long, String)]
      val q = Dsir.scoredMapSide(mem.toDF().toDF("doc_id", "text"),
          lut, "doc_id", col("text"), 32)
        .writeStream.format("memory").queryName(s"dsir_$sliceAt")
        .outputMode("append").start()
      try {
        val (a, b) = docs.splitAt(sliceAt)
        mem.addData(a); q.processAllAvailable()
        mem.addData(b); q.processAllAvailable()
        val got = spark.table(s"dsir_$sliceAt")
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
        assert(got === batch, s"sliceAt=$sliceAt")
      } finally q.stop()
    }
  }
}
