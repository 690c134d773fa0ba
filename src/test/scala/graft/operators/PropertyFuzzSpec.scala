package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property-based cross-checks: each distributed operator against a
  * pure-Scala reference implementation on seeded random inputs. The
  * operators are all EXACT (integer arithmetic / total orders), so every
  * property is strict equality — no tolerances.
  */
class PropertyFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(name: String, prop: Prop, cases: Int = 8): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(cases)
      .withInitialSeed(Seed(0x5eed + name.hashCode.toLong))
    val res = SCTest.check(params, prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  // --- references -----------------------------------------------------------

  private def refLevenshtein(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def refPageRank(edges: Seq[(String, String)], iters: Int): Map[String, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val outdeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      for ((s, t) <- edges) contrib(t) += (r(s) * 85) / (100L * outdeg(s))
      r = nodes.map(n => n -> (150000L + contrib(n))).toMap
    }
    r
  }

  private def refComponents(edges: Seq[(Int, Int)]): Map[Int, Int] = {
    val parent = scala.collection.mutable.Map.empty[Int, Int]
    def find(x: Int): Int = { val p = parent.getOrElseUpdate(x, x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    for ((a, b) <- edges) parent(find(a)) = find(b)
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) => val m = ns.min; ns.map(_ -> m) }
  }

  private def refMd5Long(s: String): Long =
    graft.functions.Md5LongUtil.hashBytes(s.getBytes("UTF-8"))

  /** Spark `round(c, 3)` semantics: HALF_UP on the shortest-decimal string. */
  private def refRound3(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(3, java.math.RoundingMode.HALF_UP).doubleValue

  /** Full MinHash-LSH reference: shingle → hash set → signatures → band
    * candidacy → estimate prune → exact Jaccard (mirrors MinHashDedup +
    * TextHash step by step). */
  private def refMinhashPairs(
      docs: Seq[(Long, String)],
      cfg: MinHashDedup.Config): Set[(Long, Long, Double)] = {
    import graft.functions.TextHash.{P, permA, permB}
    val n = 3
    def shingleHashes(text: String): Seq[Long] = {
      val toks = text.trim.split("\\s+", -1).toSeq
      val sh = if (toks.length >= n) toks.sliding(n).map(_.mkString(" ")).toSeq.distinct
               else Seq(toks.mkString(" "))
      sh.map(s => refMd5Long(s) % P).distinct
    }
    val hs = docs.map { case (id, t) => id -> shingleHashes(t) }.toMap
    val sig = hs.view.mapValues { h =>
      (0 until cfg.numHashes).map(i => h.map(v => (v * permA(i) + permB(i)) % P).min)
    }.toMap
    val ids = docs.map(_._1)
    (for {
      a <- ids; b <- ids if a < b
      sa = sig(a); sb = sig(b)
      if (0 until cfg.bands).exists(band =>
        (0 until cfg.rows).forall(j => sa(band * cfg.rows + j) == sb(band * cfg.rows + j)))
      matches = (0 until cfg.numHashes).count(i => sa(i) == sb(i))
      if matches.toDouble / cfg.numHashes >= cfg.estimateCutoff
      ha = hs(a).toSet; hb = hs(b).toSet
      inter = (ha intersect hb).size.toDouble
      jac = inter / (ha.size + hb.size - inter)
      if jac >= cfg.jaccardThreshold
    } yield (a, b, refRound3(jac))).toSet
  }

  /** Occurrence-weighted 60-bit simhash reference (mirrors SimHashDedup /
    * the fused SimHash60 expression). */
  private def refSimhash(text: String): Long = {
    val hs = text.trim.split("\\s+", -1).toSeq.map(refMd5Long)
    (0 until 60).map { j =>
      val ones = hs.count(h => ((h >> j) & 1L) == 1L)
      if (2 * ones > hs.length) 1L << j else 0L
    }.sum
  }

  // --- properties -----------------------------------------------------------

  test("PrefixSum.running == sequential scan (negatives, random key order)") {
    val gen = for {
      n <- Gen.choose(1, 60)
      vals <- Gen.listOfN(n, Gen.choose(-1000L, 1000L))
      keys <- Gen.listOfN(n, Gen.choose(-100000L, 100000L)).map(_.distinct)
      parts <- Gen.choose(1, 8)
    } yield (keys.zip(vals), parts)
    check("prefixsum", Prop.forAll(gen) { case (rows, parts) =>
      rows.isEmpty || {
        val got = PrefixSum.running(rows.toDF("k", "v"), "k", "v", "cum", numParts = parts)
          .select("k", "cum").as[(Long, Long)].collect().toMap
        val want = rows.sortBy(_._1).scanLeft((0L, 0L)) {
          case ((_, acc), (k, v)) => (k, acc + v)
        }.drop(1).toMap
        spark.catalog.clearCache() // PrefixSum persists its pid-stamped relation
        got == want
      }
    })
  }

  test("PrefixSum.runningMulti == independent running calls per column") {
    val gen = for {
      n <- Gen.choose(1, 50)
      va <- Gen.listOfN(n, Gen.choose(-500L, 500L))
      vb <- Gen.listOfN(n, Gen.choose(0L, 9L))
      keys <- Gen.listOfN(n, Gen.choose(-100000L, 100000L)).map(_.distinct)
      parts <- Gen.choose(1, 8)
    } yield (keys.lazyZip(va).lazyZip(vb).toList, parts)
    check("prefixsummulti", Prop.forAll(gen) { case (rows, parts) =>
      rows.isEmpty || {
        val df = rows.toDF("k", "a", "b")
        val got = PrefixSum
          .runningMulti(df, "k", Seq("a" -> "ca", "b" -> "cb"), numParts = parts)
          .select("k", "ca", "cb").as[(Long, Long, Long)].collect()
          .map(t => t._1 -> (t._2, t._3)).toMap
        val wantA = PrefixSum.running(df, "k", "a", "ca", numParts = parts)
          .select("k", "ca").as[(Long, Long)].collect().toMap
        val wantB = PrefixSum.running(df, "k", "b", "cb", numParts = parts)
          .select("k", "cb").as[(Long, Long)].collect().toMap
        spark.catalog.clearCache() // PrefixSum persists its pid-stamped relation
        got == rows.map(_._1).map(k => k -> (wantA(k), wantB(k))).toMap
      }
    })
  }

  test("PrefixSum.runningScans min/max == sequential scan") {
    val gen = for {
      n <- Gen.choose(1, 50)
      vals <- Gen.listOfN(n, Gen.choose(-10000L, 10000L))
      keys <- Gen.listOfN(n, Gen.choose(-100000L, 100000L)).map(_.distinct)
      parts <- Gen.choose(1, 8)
    } yield (keys.zip(vals), parts)
    check("prefixscanminmax", Prop.forAll(gen) { case (rows, parts) =>
      rows.isEmpty || {
        val got = PrefixSum.runningScans(rows.toDF("k", "v"),
          "k", Seq(("v", "mn", "min"), ("v", "mx", "max")), numParts = parts)
          .select("k", "mn", "mx").as[(Long, Long, Long)].collect()
          .map(t => t._1 -> (t._2, t._3)).toMap
        val sorted = rows.sortBy(_._1)
        val wantMn = sorted.scanLeft((0L, Long.MaxValue)) {
          case ((_, acc), (k, v)) => (k, math.min(acc, v)) }.drop(1).toMap
        val wantMx = sorted.scanLeft((0L, Long.MinValue)) {
          case ((_, acc), (k, v)) => (k, math.max(acc, v)) }.drop(1).toMap
        spark.catalog.clearCache()
        got == rows.map(_._1).map(k => k -> (wantMn(k), wantMx(k))).toMap
      }
    })
  }

  test("FuzzyJoin.selfLinkage == brute force within blocks") {
    val word = Gen.choose(1, 4).flatMap(l => Gen.listOfN(l, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val name = for { w1 <- Gen.oneOf("red", "blue"); w2 <- word } yield s"$w1 $w2"
    val gen = for {
      n <- Gen.choose(1, 25)
      names <- Gen.listOfN(n, name)
      maxDist <- Gen.choose(1, 4)
    } yield (names, maxDist)
    check("fuzzyjoin", Prop.forAll(gen) { case (names, maxDist) =>
      val got = FuzzyJoin.selfLinkage(names.toDF("name"), "name",
          nm => split(nm, " ").getItem(0), maxDist)
        .select("name_a", "name_b", "dist").as[(String, String, Int)].collect().toSet
      val counts = names.groupBy(identity).view.mapValues(_.size).toMap
      val distinct = counts.keys.toSeq
      val want = (for {
        a <- distinct; b <- distinct
        if a < b && a.split(" ")(0) == b.split(" ")(0)
        d = refLevenshtein(a, b) if d <= maxDist
      } yield (a, b, d)).toSet
      got == want
    })
  }

  test("PageRank.ranksMicro == pure-Scala integer reference (exact)") {
    val node = Gen.choose(0, 9).map(i => s"n$i")
    val gen = for {
      n <- Gen.choose(1, 25)
      edges <- Gen.listOfN(n, Gen.zip(node, node)) // self-loops + dup edges allowed
      iters <- Gen.choose(1, 3)
    } yield (edges, iters)
    check("pagerank", Prop.forAll(gen) { case (edges, iters) =>
      edges.isEmpty || {
        val got = PageRank.ranksMicro(edges.toDF("src", "dst"), "src", "dst", iters)
          .as[(String, Long)].collect().toMap
        spark.catalog.clearCache() // PageRank persists its loop invariants
        got == refPageRank(edges, iters)
      }
    }, cases = 6)
  }

  test("ConnectedComponents.minLabel == union-find reference") {
    val gen = for {
      n <- Gen.choose(1, 30)
      edges <- Gen.listOfN(n, Gen.zip(Gen.choose(0, 14), Gen.choose(0, 14)))
    } yield edges // self-loops allowed: a node can pair with itself
    check("components", Prop.forAll(gen) { edges =>
      edges.isEmpty || {
        val got = ConnectedComponents.minLabel(edges.toDF("id_a", "id_b"))
          .as[(Int, Int)].collect().toMap
        got == refComponents(edges)
      }
    }, cases = 6)
  }

  test("RangeJoin.intervalsOverlap == naive quadratic join, no duplicate pairs") {
    val iv = for {
      s <- Gen.choose(0L, 500L)
      len <- Gen.choose(0L, 120L)
    } yield (s, s + len)
    val gen = for {
      nl <- Gen.choose(1, 20); nr <- Gen.choose(1, 20)
      l <- Gen.listOfN(nl, iv); r <- Gen.listOfN(nr, iv)
      w <- Gen.oneOf(7L, 50L, 1000L) // widths around / below / above interval scale
    } yield (l, r, w)
    check("overlap", Prop.forAll(gen) { case (l, r, w) =>
      val ldf = l.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }.toDF("lid", "ls", "le")
      val rdf = r.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }.toDF("rid", "rs", "re")
      val got = RangeJoin.intervalsOverlap(ldf, rdf, "ls", "le", "rs", "re", w)
        .select("lid", "rid").as[(Long, Long)].collect().toSeq
      val want = for {
        ((ls, le), i) <- l.zipWithIndex
        ((rs, re), j) <- r.zipWithIndex
        if ls <= re && rs <= le
      } yield (i.toLong, j.toLong)
      got.sorted == want.sorted && got.distinct.length == got.length
    })
  }

  test("MinHashDedup.pairs == pure-Scala LSH reference (near-dups + exact dups)") {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps")
    val doc = Gen.choose(3, 10).flatMap(l => Gen.listOfN(l, word).map(_.mkString(" ")))
    val gen = for {
      nb <- Gen.choose(2, 6)
      bases <- Gen.listOfN(nb, doc)
      // variants: verbatim copies (exact dups, jac 1.0) or one-word edits
      // (exercise candidacy + the estimate prune below the threshold)
      variants <- Gen.listOfN(nb,
        Gen.zip(Gen.choose(0, nb - 1), Gen.option(Gen.zip(Gen.choose(0, 20), word))))
    } yield {
      val vs = variants.map { case (bi, sub) =>
        val toks = bases(bi).split(" ")
        sub match {
          case Some((pos, w)) => toks.updated(pos % toks.length, w).mkString(" ")
          case None           => bases(bi)
        }
      }
      (bases ++ vs).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    }
    val cfg = MinHashDedup.Config(numHashes = 16, bands = 8, jaccardThreshold = 0.8)
    check("minhash", Prop.forAll(gen) { docs =>
      val got = MinHashDedup.pairs(docs.toDF("id", "text"), "id",
          graft.functions.VectorExpressions
            .wordShingleHashes(col("text"), 3, graft.functions.TextHash.P),
          cfg)
        .as[(Long, Long, Double)].collect().toSet
      spark.catalog.clearCache() // pairs() persists two intermediates
      got == refMinhashPairs(docs, cfg)
    }, cases = 5)
  }

  test("SimHashDedup.pairs == brute-force reference (chunk blocking is lossless)") {
    val word = Gen.oneOf("aa", "bb", "cc")
    val doc = Gen.choose(1, 6).flatMap(l => Gen.listOfN(l, word).map(_.mkString(" ")))
    val gen = for {
      n <- Gen.choose(2, 8)
      ds <- Gen.listOfN(n, doc)
    } yield ds.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    check("simhash", Prop.forAll(gen) { docs =>
      val got = SimHashDedup.pairs(docs.toDF("id", "text"), "id", "text", maxHamming = 3)
        .as[(Long, Long, Int)].collect().toSet
      spark.catalog.clearCache() // pairs() persists the simhash relation
      val sim = docs.map { case (i, t) => i -> refSimhash(t) }
      val want = (for {
        (a, ha) <- sim; (b, hb) <- sim if a < b
        d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
      } yield (a, b, d)).toSet
      got == want
    }, cases = 5)
  }

  test("Sessionize.batch == sequential gap-scan reference") {
    val gen = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 20000L)))
    } yield rows.map { case (u, sec) => (u, sec) }.distinct // unique (user, ts)
    check("sessionize", Prop.forAll(gen) { rows =>
      val df = rows.map { case (u, sec) =>
        (u, new java.sql.Timestamp(sec * 1000L), 1.0)
      }.toDF("user_id", "ts", "value")
      val got = Sessionize.batch(df, gapSeconds = 1800L)
        .select(col("user_id"), col("session_start_us"), col("session_end_us"),
          col("n_events"))
        .as[(Long, Long, Long, Long)].collect().toSet
      val want = rows.groupBy(_._1).flatMap { case (u, rs) =>
        val times = rs.map(_._2 * 1000000L).sorted // µs
        val sessions = times.foldLeft(Vector.empty[Vector[Long]]) { (acc, t) =>
          if (acc.nonEmpty && t - acc.last.last <= 1800000000L)
            acc.init :+ (acc.last :+ t)
          else acc :+ Vector(t)
        }
        sessions.map(s => (u, s.head, s.last, s.length.toLong))
      }.toSet
      got == want
    })
  }

  test("HistogramPercentile == Spark exact percentile (random groups, dups, negatives)") {
    val gen = for {
      n <- Gen.choose(4, 80)
      rows <- Gen.listOfN(n, Gen.zip(Gen.oneOf("x", "y"),
        Gen.oneOf(Gen.choose(-50, 50).map(_.toDouble), Gen.oneOf(0.0, 1.5, -2.25))))
    } yield rows
    check("percentile", Prop.forAll(gen) { rows =>
      val df = rows.toDF("g", "v")
      val got = HistogramPercentile.quantiles(df, "g", "v", Seq(0.1, 0.5, 0.9),
          bins = 8, collectCap = 4)
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
      val want = df.groupBy(col("g")).agg(
          expr("percentile(v, 0.1)"), expr("percentile(v, 0.5)"), expr("percentile(v, 0.9)"))
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
      got == want
    }, cases = 6)
  }

  test("TopKByScore == sort-take reference (unique scores)") {
    val gen = for {
      n <- Gen.choose(1, 50)
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(0, 4), Gen.choose(-100000, 100000), Gen.choose(0L, 99L)))
      k <- Gen.choose(1, 4)
    } yield (rows.distinctBy(r => (r._1, r._2)), k) // unique score per group
    check("topk", Prop.forAll(gen) { case (rows, k) =>
      val got = rows.toDF("g", "s", "p")
        .groupBy(col("g"))
        .agg(graft.functions.TopKAggregate.topK(col("s").cast("double"), col("p"), k).as("t"))
        .select(col("g"), col("t"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getDouble(0), x.getLong(1))))
        .toMap
      val want = rows.groupBy(_._1).map { case (g, rs) =>
        g -> rs.sortBy(-_._2).take(k).map(r => (r._2.toDouble, r._3))
      }
      got == want
    })
  }

  test("PrefixFilterJoin == brute-force all-pairs at random thresholds") {
    val gen = for {
      nSets <- Gen.choose(2, 20)
      universe <- Gen.choose(8, 40)
      density <- Gen.choose(2, 7)
      sets <- Gen.listOfN(nSets, Gen.someOf(1L to universe.toLong))
      tNum <- Gen.choose(1, 10)
      tDen <- Gen.choose(10, 12)
    } yield (sets.map(_.toSet).filter(_.nonEmpty).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }, tNum, tDen, density)
    check("prefixfilter", Prop.forAll(gen) { case (sets, tNum, tDen, _) =>
      sets.size < 2 || {
        val got = PrefixFilterJoin.jaccardSelfJoin(
            sets.map { case (id, s) => (id, s.toSeq.sorted) }.toDF("id", "hs"),
            "id", "hs", tNum, tDen)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
        val want = (for {
          (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
          inter = (sa & sb).size.toLong
          uni = (sa | sb).size.toLong
          if inter * tDen >= tNum * uni
        } yield (ia, ib, inter, uni)).toSet
        got == want
      }
    }, cases = 6)
  }

  test("TriangleCensus triple set == brute force on random multigraphs") {
    val gen = for {
      n <- Gen.choose(4, 18)
      m <- Gen.choose(3, 40)
      edges <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n.toLong), Gen.choose(0L, n.toLong)))
    } yield edges
    check("triangles", Prop.forAll(gen) { edges =>
      val got = TriangleCensus.triangles(edges.toDF("s", "d"), "s", "d")
        .collect().map { r =>
          val t = Seq(r.getLong(0), r.getLong(1), r.getLong(2)).sorted
          (t(0), t(1), t(2))
        }.toSet
      val e = edges.map { case (x, y) => (math.min(x, y), math.max(x, y)) }
        .filter(p => p._1 != p._2).toSet
      val vs = e.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
      val want = (for {
        a <- vs; b <- vs if a < b && e((a, b))
        c <- vs if b < c && e((b, c)) && e((a, c))
      } yield (a, b, c)).toSet
      got == want
    }, cases = 6)
  }

  test("KCore attrition == synchronous-peel reference at random k") {
    val gen = for {
      n <- Gen.choose(4, 16)
      m <- Gen.choose(3, 36)
      edges <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n.toLong), Gen.choose(0L, n.toLong)))
      k <- Gen.choose(1, 4)
    } yield (edges, k)
    check("kcore", Prop.forAll(gen) { case (edges, k) =>
      val e = edges.map { case (x, y) => (math.min(x, y), math.max(x, y)) }
        .filter(p => p._1 != p._2).toSet
      e.isEmpty || {
        val res = KCore.decompose(edges.toDF("s", "d"), "s", "d", k)
        val gotCore = res.core.collect().map(_.getLong(0)).toSet
        // reference synchronous peel
        val adj = e.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        var alive = adj.keySet
        val refDrops = Seq.newBuilder[(Int, Long)]
        var round = 0; var done = false
        while (!done) {
          round += 1
          val drop = alive.filter(v => (adj(v) & alive).size < k)
          if (drop.isEmpty) done = true
          else { refDrops += (round -> drop.size.toLong); alive = alive -- drop }
        }
        gotCore == alive && res.attrition == refDrops.result()
      }
    }, cases = 5)
  }
}
