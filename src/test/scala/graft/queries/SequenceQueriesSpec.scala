package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Unit-level checks for the event-sequence operators on crafted inputs
  * (the sf0.01 oracle gate covers them end-to-end on real data). The
  * queries read from Tables.events, so these specs re-implement the same
  * column logic on in-memory frames and assert the SEMANTICS: funnel stage
  * ordering, rolling-window frame bounds, exact-integer outlier algebra.
  */
class SequenceQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel stages respect strict event ordering") {
    // u1: view->click->purchase in order (stage 3)
    // u2: click before view, purchase after nothing (stage 1: click not after view)
    // u3: view then click, purchase BEFORE click (stage 2)
    val ev = Seq(
      (1L, "view", ts("2024-01-01 10:00:00")), (1L, "click", ts("2024-01-01 10:01:00")),
      (1L, "purchase", ts("2024-01-01 10:02:00")),
      (2L, "click", ts("2024-01-01 09:00:00")), (2L, "view", ts("2024-01-01 09:30:00")),
      (3L, "view", ts("2024-01-01 08:00:00")), (3L, "purchase", ts("2024-01-01 08:10:00")),
      (3L, "click", ts("2024-01-01 08:20:00"))
    ).toDF("user_id", "event_type", "ts")

    val us = unix_micros(col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(us).as("view_us"))
    val c = ev.filter(col("event_type") === "click").withColumn("us", us).join(v, "user_id")
      .filter(col("us") > col("view_us"))
      .groupBy(col("user_id")).agg(min(col("us")).as("click_us"))
    val p = ev.filter(col("event_type") === "purchase").withColumn("us", us).join(c, "user_id")
      .filter(col("us") > col("click_us"))
      .groupBy(col("user_id")).agg(min(col("us")).as("purchase_us"))
    val out = v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .select(col("user_id"),
        (lit(1) + when(col("click_us").isNotNull, 1).otherwise(0)
          + when(col("purchase_us").isNotNull, 1).otherwise(0)).as("stage"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 3, 2L -> 1, 3L -> 2))
  }

  test("rolling 1h range frame includes the 1-hour boundary and ts peers") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("u")).orderBy(col("us")).rangeBetween(-3600000000L, 0L)
    val rows = Seq(
      (1L, 0L), (1L, 3600000000L),          // exactly 1h apart: both in frame 2
      (1L, 7200000000L),                    // exactly 1h after #2: includes #2, excludes #1
      (2L, 5L), (2L, 5L)                    // equal ts: peers, both frames count 2
    ).toDF("u", "us")
    val got = rows.select(col("u"), col("us"), count(lit(1)).over(w).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 0L, 1L), (1L, 3600000000L, 2L), (1L, 7200000000L, 2L),
      (2L, 5L, 2L), (2L, 5L, 2L)))
  }

  test("exact-integer 2-sigma test agrees with the float formulation away from boundaries") {
    val xs = Seq(100L, 110L, 90L, 105L, 95L, 400L) // 400 is the obvious outlier
    val n = xs.length.toLong
    val s = xs.sum
    val q = xs.map(x => x * x).sum
    val mean = s.toDouble / n
    val varS = (q - s.toDouble * s / n) / (n - 1)
    def intFlag(x: Long) = (n * x - s) * (n * x - s) * (n - 1) > 4 * n * (n * q - s * s)
    def fltFlag(x: Long) = (x - mean) * (x - mean) > 4 * varS
    xs.foreach(x => assert(intFlag(x) == fltFlag(x), s"x=$x"))
    assert(intFlag(400L) && !intFlag(100L))
  }

  test("SCD2 run collapse: versions, validity chain, is_current (q95 semantics)") {
    // user 1: A A B A  → 3 runs; user 2: single event → 1 open run.
    val rows = Seq(
      (1L, 10L, "A", 100L), (1L, 11L, "A", 200L), (1L, 12L, "B", 300L),
      (1L, 13L, "A", 400L), (2L, 20L, "X", 500L))
    val df = rows.toDF("user_id", "event_id", "event_type", "us")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val wv = Window.partitionBy(col("user_id")).orderBy(col("ver"))
    val out = df
      .withColumn("chg",
        when(!(lag(col("event_type"), 1).over(w) <=> col("event_type")), 1L).otherwise(0L))
      .withColumn("ver", sum(col("chg")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("ver"), col("event_type").as("state"))
      .agg(min(col("us")).as("valid_from_us"), count(lit(1)).as("n_events"))
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(wv))
      .withColumn("is_current", col("valid_to_us").isNull)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), Option(r.get(5)).map(_.asInstanceOf[Long]),
        r.getBoolean(6))).toSeq.sortBy(t => (t._1, t._2))
    assert(out === Seq(
      (1L, 1L, "A", 100L, 2L, Some(300L), false),
      (1L, 2L, "B", 300L, 1L, Some(400L), false),
      (1L, 3L, "A", 400L, 1L, None, true),
      (2L, 1L, "X", 500L, 1L, None, true)))
    // intervals tile each user's timeline: valid_to of run k == valid_from of k+1
    val byUser = out.toSeq.groupBy(_._1).values
    byUser.foreach { runs =>
      runs.sortBy(_._2).sliding(2).foreach {
        case Seq(a, b) => assert(a._6.contains(b._4)); case _ =>
      }
    }
  }

  test("rolling 7-row median_x2 is exact for odd and even frames (q94 index algebra)") {
    // q94 emits arr[(n+1) div 2] + arr[n div 2 + 1] on the SORTED frame
    // (1-indexed): for odd n both indices hit the middle (2·median), for
    // even n they bracket it (sum of the two middle order stats). Check the
    // algebra against a scala reference over a growing 7-bounded frame.
    val vals = Seq(500L, 100L, 300L, 900L, 200L, 700L, 400L, 600L, 800L)
    val got = vals.indices.map { i =>
      val frame = vals.slice(math.max(0, i - 6), i + 1).sorted
      val n = frame.length
      frame((n + 1) / 2 - 1) + frame(n / 2) // 0-indexed forms of the query's 1-indexed picks
    }
    val want = vals.indices.map { i =>
      val frame = vals.slice(math.max(0, i - 6), i + 1).sorted
      val n = frame.length
      if (n % 2 == 1) 2 * frame(n / 2) else frame(n / 2 - 1) + frame(n / 2)
    }
    assert(got == want)
    // And the Spark expression itself agrees on a crafted frame.
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("u")).orderBy(col("i")).rowsBetween(-6, 0)
    val df = vals.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) }.toDF("u", "i", "cents")
      .withColumn("arr", sort_array(collect_list(col("cents")).over(w)))
      .select(col("i"),
        (element_at(col("arr"), expr("(size(arr) + 1) div 2").cast("int"))
          + element_at(col("arr"), expr("size(arr) div 2 + 1").cast("int"))).as("m2"))
    val sparkGot = df.collect().sortBy(_.getLong(0)).map(_.getLong(1)).toSeq
    assert(sparkGot == want.map(_.toLong))
  }

  test("q264 Markov eval: pooled row sums the per-prev rows; test split non-trivial") {
    val rows = SequenceQueries.queries("q264_markov_eval")(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val (nAll, cAll, accAll) = rows("ALL")
    assert(nAll > 0, "the temporal cutoff must leave a non-empty test split")
    val per = rows.view.filterKeys(_ != "ALL").values.toSeq
    assert(per.map(_._1).sum == nAll && per.map(_._2).sum == cAll,
      "ALL row must pool the per-prev rows")
    for ((n, c, bp) <- rows.values) {
      assert(c >= 0 && c <= n)
      assert(bp == c * 10000 / n)
    }
    assert(accAll == cAll * 10000 / nAll)
  }

  test("q247 window top-k: windowless plan, ranks dense, counts sorted with id tie-break") {
    val df = SequenceQueries.queries("q247_window_top_users")(spark, "/root/testdata/sf0.01")
    // ranking must ride the bounded TopKByScore aggregate — a row_number
    // window over (ws_us) would sort each window's full user set (q230)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"q247 must not contain a window:\n$plan")
    val rows = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    for ((ws, g) <- rows.groupBy(_._1)) {
      val byRank = g.sortBy(_._2)
      assert(byRank.map(_._2).toSeq == (1L to byRank.length).toSeq, s"window $ws ranks")
      // counts non-increasing; equal counts break ties on the smaller id
      for (Array((_, _, idA, cA), (_, _, idB, cB)) <- byRank.sliding(2).map(_.toArray)) {
        assert(cA > cB || (cA == cB && idA < idB), s"window $ws order violated")
      }
    }
  }
}
