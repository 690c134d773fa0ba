package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-engineering utility surface: embedding quantization (storage path
  * for 100 TB of vectors), column statistics, table profiling, and
  * snapshot diffing (the promote/backup lifecycle's audit view).
  */
object ProfileQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Int8 symmetric quantization with a per-vector scale — 4x storage
    // reduction for embedding corpora; pure portable arithmetic.
    "q38_embedding_quantize" -> ((s, d) => {
      val v = col("embedding").cast("array<double>")
      val maxabs = array_max(transform(v, x => abs(x)))
      Tables.embeddings(s, d).select(
        col("vec_id"),
        round(maxabs, 6).as("scale_maxabs"),
        // Emitted as a canonical CSV string (not array<int>) so downstream
        // comparers that can't sort/hash raw array cells still work.
        array_join(transform(v, x => round(x * 127.0 / maxabs).cast("int")), ",").as("q_int8"))
    }),

    // Cross-table reconciliation: does the order header total equal the
    // recomputed sum over its items? The classic ETL audit, as a FULL OUTER
    // join so orphans on EITHER side surface (no_order / no_items). All
    // arithmetic in exact integer micro-cents — cents × pct × pct — so the
    // diff is bit-reproducible (a float recompute would make `diff = 0`
    // depend on summation order). One shuffle each side on the order key.
    // (On this synthetic data the header totals deliberately DON'T match
    // the recompute — the report is all-nonzero diffs, which is the point.)
    "q86_total_reconciliation" -> ((s, d) => {
      def c(x: org.apache.spark.sql.Column) = round(x * 100).cast("long")
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"),
          (c(col("l_extendedprice")) * (lit(100L) - c(col("l_discount")))
            * (lit(100L) + c(col("l_tax")))).as("item_micro"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("item_micro")).as("recomputed_micro"))
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), (c(col("o_totalprice")) * 10000L).as("total_micro"))
      o.join(li, col("o_orderkey") === col("l_orderkey"), "full_outer")
        .select(
          coalesce(col("o_orderkey"), col("l_orderkey")).as("orderkey"),
          when(col("o_orderkey").isNull, "no_order")
            .when(col("l_orderkey").isNull, "no_items")
            .otherwise("both").as("status"),
          col("total_micro"), col("recomputed_micro"),
          (col("total_micro") - col("recomputed_micro")).as("diff_micro"))
    }),

    // Per-group column statistics (sample stddev/variance, correlation).
    "q39_column_stats" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(var_samp(col("l_discount")), 4).as("var_disc"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("cov_qty_price"))),

    // Table profile: per-column null and distinct counts in one pass.
    "q40_profile_orders" -> ((s, d) =>
      Tables.orders(s, d).agg(
        count(lit(1)).as("n_rows"),
        sum(col("o_custkey").isNull.cast("long")).as("nulls_custkey"),
        sum(col("o_orderstatus").isNull.cast("long")).as("nulls_status"),
        countDistinct(col("o_custkey")).as("d_custkey"),
        countDistinct(col("o_orderstatus")).as("d_status"),
        countDistinct(col("o_orderpriority")).as("d_priority"))),

    // Schema-GENERIC profiler (operators/Profiler): per-column stats rows
    // derived from df.schema at plan time — q40's hand-written profile
    // generalized to any table. One wide aggregate pass (4 aggs/column,
    // one scan regardless of column count) + a map-side explode unpivot.
    // min/max are truncated string reprs (documents has only bigint and
    // string columns, whose reprs are engine-identical).
    // Pearson CORRELATION MATRIX profiler — the bivariate half q101's
    // univariate profile is missing. ALL 4 column moments and 6 cross
    // moments come from ONE global wide aggregate over a single scan
    // (map-side partials; no per-pair rescans), then the 6 pair rows are
    // exploded from the 1-row result. Numerators n·Σxy − Σx·Σy and both
    // variance terms are exact decimal(38,0) (sums of cents² overflow
    // int64 at sf0.1 — the q215/q221 decimal-from-first-multiply idiom)
    // emitted as strings ⇔ DuckDB HUGEINT; the coefficient itself is the
    // mirrored IEEE sqrt tree + portable rounding (the q152 pattern).
    // Zero-variance sides yield NULL identically on both engines.
    "q251_correlation_matrix" -> ((s, d) => {
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val li = Tables.lineitem(s, d).select(
        round(col("l_quantity")).cast("long").as("qty"),
        round(col("l_extendedprice") * 100).cast("long").as("price"),
        round(col("l_discount") * 100).cast("long").as("disc"),
        round(col("l_tax") * 100).cast("long").as("tax"))
      val cols = Seq("qty", "price", "disc", "tax")
      val prs = for { i <- cols.indices; j <- cols.indices if i < j }
        yield (cols(i), cols(j))
      val aggs = Seq(count(lit(1)).as("n")) ++
        cols.map(c => sum(dec(col(c))).as(s"s_$c")) ++
        cols.map(c => sum(dec(col(c)) * dec(col(c))).as(s"ss_$c")) ++
        prs.map { case (a, b) => sum(dec(col(a)) * dec(col(b))).as(s"sp_${a}_$b") }
      val one = li.agg(aggs.head, aggs.tail: _*)
      val pcol = array(prs.map { case (a, b) =>
        struct(lit(s"$a~$b").as("pair"), col(s"sp_${a}_$b").as("sxy"),
          col(s"s_$a").as("sx"), col(s"s_$b").as("sy"),
          col(s"ss_$a").as("sxx"), col(s"ss_$b").as("syy"))
      }: _*)
      one.select(col("n"), explode(pcol).as("p"))
        .select(col("p.pair").as("pair"), col("n"),
          (dec(col("n")) * col("p.sxy") - col("p.sx") * col("p.sy")).as("num"),
          (dec(col("n")) * col("p.sxx") - col("p.sx") * col("p.sx")).as("dx"),
          (dec(col("n")) * col("p.syy") - col("p.sy") * col("p.sy")).as("dy"))
        .select(col("pair"), col("n"),
          col("num").cast("string").as("r_num"),
          col("dx").cast("string").as("r_den_x"),
          col("dy").cast("string").as("r_den_y"),
          when(col("dx") === 0 || col("dy") === 0, lit(null))
            .otherwise(graft.functions.PortableMath.roundPortable(
              col("num").cast("double") /
                (sqrt(col("dx").cast("double")) * sqrt(col("dy").cast("double"))),
              6)).as("r"))
    }),

    // FUNCTIONAL-DEPENDENCY discovery audit (Metanome/Deequ territory,
    // the constraint-mining sibling of q128's FK-orphan audit): for each
    // candidate FD A → B, the g3 error = minimum rows to delete so the
    // FD holds exactly = n − Σ_a max_b cnt(a,b). Exact FDs report 0
    // violations; near-FDs get an exact integer basis-point rate. The
    // candidate list deliberately mixes a key-FD (o_orderkey → status,
    // holds), plausible-but-false FDs, and the testdata's own quirk
    // (duplicate (l_orderkey, l_linenumber) pairs ⇒ even the "key" FD
    // can violate). Shape at scale: per candidate ONE (A,B) hash agg
    // then ONE A hash agg — both map-side-partial, linear, no windows;
    // max-of-counts needs no tie-break (the max is over values, never an
    // argmax payload).
    "q249_fd_audit" -> ((s, d) => {
      def fd(df: DataFrame, tbl: String, a: String, b: String): DataFrame =
        df.groupBy(col(a).as("a"), col(b).as("b")).agg(count(lit(1)).as("cnt"))
          .groupBy(col("a")).agg(max(col("cnt")).as("mx"), sum(col("cnt")).as("tot"))
          .agg(sum(col("mx")).as("kept"), sum(col("tot")).as("n"),
            count(lit(1)).as("n_lhs"))
          .select(lit(tbl).as("tbl"), lit(s"$a -> $b").as("fd"),
            col("n"), col("n_lhs"),
            (col("n") - col("kept")).as("violations"),
            expr("(n - kept) * 10000 div n").as("violation_bp"),
            (col("n") === col("kept")).as("holds"))
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val docs = Tables.documents(s, d)
      fd(li, "lineitem", "l_orderkey", "l_returnflag")
        .unionByName(fd(li, "lineitem", "l_orderkey", "l_linestatus"))
        .unionByName(fd(li, "lineitem", "l_partkey", "l_suppkey"))
        .unionByName(fd(li.select(
          concat_ws("|", col("l_orderkey"), col("l_linenumber")).as("line_key"),
          col("l_quantity")), "lineitem", "line_key", "l_quantity"))
        .unionByName(fd(o, "orders", "o_orderkey", "o_orderstatus"))
        .unionByName(fd(o, "orders", "o_custkey", "o_orderpriority"))
        .unionByName(fd(docs, "documents", "source", "lang"))
    }),

    "q101_profile_generic" -> ((s, d) =>
      graft.operators.Profiler.profile(Tables.documents(s, d))),

    // SCALE DUAL of q101 (the q31/q59 duality pattern): the sketch-based
    // profiler replaces N exact countDistincts — whose multi-distinct
    // rewrite Expands every row (N+1)× into the shuffle — with per-column
    // HLL++ buffers: one ordinary partial+final agg, shuffle = one row per
    // partition regardless of column count (no-Expand proven in
    // ProfilerSpec). Sketch estimates are engine-specific, so the
    // oracle-checked output is the EXACT distinct count next to a boolean
    // gating the estimate within 10% (rsd 0.02 ⇒ ~5 sigma, q32 pattern);
    // the audit join against the exact profile is 5 rows a side.
    "q113_profile_sketch" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val sk = graft.operators.Profiler.profileSketch(docs)
      val exact = graft.operators.Profiler.profile(docs)
        .select(col("col_name"), col("n_distinct").as("n_distinct_exact"))
      sk.join(exact, Seq("col_name"))
        .select(col("col_name"), col("dtype"), col("n_rows"), col("n_null"),
          col("n_distinct_exact"), col("min_repr"), col("max_repr"),
          (abs(col("n_distinct_est") - col("n_distinct_exact"))
            <= col("n_distinct_exact") * 0.10).as("est_within_10pct"))
    }),

    // Snapshot diff: previous snapshot (pre-2000 orders) vs current —
    // added/removed/changed audit, the K2/K3 lifecycle's companion view.
    "q41_snapshot_diff" -> ((s, d) => {
      val cur = Tables.orders(s, d).select(
        col("o_orderkey").as("k"), round(col("o_totalprice"), 2).as("cur_price"))
      val prev = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("2000-01-01"))
        .select(col("o_orderkey").as("k"),
          round(col("o_totalprice") * 0.9, 2).as("prev_price")) // drifted values
      cur.join(prev, Seq("k"), "full_outer")
        .select(
          when(col("prev_price").isNull, "added")
            .when(col("cur_price").isNull, "removed")
            .when(col("cur_price") =!= col("prev_price"), "changed")
            .otherwise("unchanged").as("status"))
        .groupBy(col("status")).agg(count(lit(1)).as("n"))
    }),
    // Change data feed under the hash gate: build a real SnapshotTable
    // (v1 = pre-1999 orders), run a file-granular UPSERT against it
    // ([1998,1999) keys drift +7 cents = updates; [1999,2000) keys are new
    // = inserts), then read `SnapshotTable.changes(v1, v2)`. The CDF reads
    // only rewritten files, but its multiset is LAYOUT-INDEPENDENT —
    // untouched files contribute identical rows to both versions and
    // exceptAll cancels them — so the oracle is the flat state diff
    // (state2 EXCEPT ALL state1 = inserts, state1 EXCEPT ALL state2 =
    // deletes), computed by DuckDB with no knowledge of files or
    // manifests. Equality proves the manifest-diff CDF emits exactly the
    // semantic row deltas (q41's diff pattern, upgraded from a synthetic
    // "previous snapshot" to the real table layer).
    "q115_cdf_window" -> ((s, d) => {
      val dir = graft.TempDirs.register(new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_snap_q115_${ProcessHandle.current().pid()}_" +
          java.lang.Integer.toHexString(d.hashCode)).getPath)
      // rebuild from scratch each invocation so versions are always (1, 2)
      graft.TempDirs.deleteRecursively(new java.io.File(dir))
      val cents = round(col("o_totalprice") * 100).cast("long")
      val base = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1999-01-01"))
        .select(col("o_orderkey").as("k"), cents.as("price_cents"))
      val v1 = graft.sources.SnapshotTable.commitAppend(base, dir)
      val updates = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1998-01-01") &&
          col("o_orderdate") < lit("2000-01-01"))
        .select(col("o_orderkey").as("k"), (cents + 7).as("price_cents"))
      val v2 = graft.sources.SnapshotTable.upsert(s, dir, updates, Seq("k"))
      graft.sources.SnapshotTable.changes(s, dir, v1, v2)
        .select(col("k"), col("price_cents"), col("_change"))
    }),

    // Durable CDC consumer protocol under the hash gate (extends q115,
    // round-6 verdict item 5): a REAL 3-step offset walk against a live
    // SnapshotTable — poll 1 bootstraps (the full snapshot as inserts,
    // there is no version 0 to diff), ack advances the durable offset,
    // then each subsequent poll returns exactly the manifest-diff CDF of
    // the window (offset, latest]. Two upserts between polls produce
    // update+insert mixes; the oracle replays the three windows as flat
    // multiset state diffs with no knowledge of files, manifests, or
    // offsets — hash equality proves (a) the bootstrap is the full state,
    // (b) acks never re-deliver a consumed window, (c) each window is
    // the exact semantic delta. The caught-up poll returning None and
    // every ack's CAS success are asserted in-query (a violation throws
    // and fails the gate).
    "q206_cdc_offset_walk" -> ((s, d) => {
      val dir = graft.TempDirs.register(new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_snap_q206_${ProcessHandle.current().pid()}_" +
          java.lang.Integer.toHexString(d.hashCode)).getPath)
      // rebuild from scratch each invocation: versions are always (1,2,3)
      graft.TempDirs.deleteRecursively(new java.io.File(dir))
      val st = graft.sources.SnapshotTable
      val cents = round(col("o_totalprice") * 100).cast("long")
      def slice(lo: String, hi: String, drift: Long) = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit(lo) && col("o_orderdate") < lit(hi))
        .select(col("o_orderkey").as("k"), (cents + drift).as("price_cents"))
      val base = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1998-01-01"))
        .select(col("o_orderkey").as("k"), cents.as("price_cents"))
      st.commitAppend(base, dir)
      def poll(batch: Int): DataFrame = {
        val b = st.pollChanges(s, dir, "walker").getOrElse(
          throw new IllegalStateException(s"expected change batch $batch"))
        // the df is pinned to committed version boundaries at poll time,
        // so later commits cannot bleed into an earlier batch
        val out = b.df.select(lit(batch).as("batch"),
          col("k"), col("price_cents"), col("_change"))
        require(b.ack(), s"ack of batch $batch lost its CAS (no rival exists here)")
        out
      }
      val b1 = poll(1) // bootstrap: full v1 state as inserts
      st.upsert(s, dir, slice("1997-01-01", "1999-01-01", 7), Seq("k"))
      val b2 = poll(2) // window (v1, v2]
      st.upsert(s, dir, slice("1998-06-01", "2000-01-01", 13), Seq("k"))
      val b3 = poll(3) // window (v2, v3]
      require(st.pollChanges(s, dir, "walker").isEmpty,
        "acked consumer must be caught up")
      b1.unionByName(b2).unionByName(b3)
    }),

    // Deterministic hash sampling: a reproducible ~10% sample selected by
    // the portable content hash — the scale-safe alternative to rand()
    // (same rows on every engine, every run, any partitioning).
    "q46_deterministic_sample" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(graft.functions.TextHash.md5Long(col("doc_id").cast("string")) % 100 < 10)
        .select(col("doc_id"), col("lang"), col("n_chars"))),

    // Pivot: events fanned out to one column per type, counts per user
    // (top 20 users by id for a bounded result).
    "q47_event_pivot" -> ((s, d) =>
      Tables.events(s, d)
        .filter(col("user_id") < 20)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)),

    // Semi-structured surface: JSON property extraction from the event
    // payload column + aggregation over the extracted value.
    "q42_json_props" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(col("k")).as("n_with_k"),
          // integer inputs: exact sum/count division + portable floor-round
          // (an integer avg CAN land exactly on a .005 boundary — engine
          // round()s split there; see functions/PortableMath)
          graft.functions.PortableMath.roundPortable(
            sum(col("k")).cast("double") / count(col("k")), 2).as("avg_k"),
          max(col("k")).as("max_k"))),

    // Dictionary-encoding benefit estimator — the profiling pass a layout
    // optimizer runs before choosing parquet encodings: per candidate
    // string column, raw byte volume vs (distinct-value dictionary +
    // 2-byte codes). The scan collapses to (column, value) COUNTS before
    // any sizing arithmetic, so the shuffle is bounded by the value
    // domains, never the row count; savings in exact ppm (negative when a
    // high-cardinality column would bloat — that is the signal).
    "q313_dict_savings" -> ((s, d) => {
      def melt(df: DataFrame, cols: Seq[(String, String)]): DataFrame =
        df.select(explode(array(cols.map { case (name, c) =>
          struct(lit(name).as("col_name"), col(c).as("v")) }: _*)).as("e"))
          .select(col("e.col_name").as("col_name"), col("e.v").as("v"))
      val vals = melt(Tables.documents(s, d),
          Seq("documents.lang" -> "lang", "documents.source" -> "source"))
        .unionByName(melt(Tables.orders(s, d),
          Seq("orders.status" -> "o_orderstatus",
            "orders.priority" -> "o_orderpriority")))
        .filter(col("v").isNotNull)
      vals.groupBy(col("col_name"), col("v")).agg(count(lit(1)).as("c"))
        .groupBy(col("col_name"))
        .agg(sum(col("c")).as("n_rows"), count(lit(1)).as("n_distinct"),
          sum(octet_length(col("v")).cast("long") * col("c")).as("raw_bytes"),
          sum(octet_length(col("v")).cast("long")).as("dict_str_bytes"))
        .select(col("col_name"), col("n_rows"), col("n_distinct"),
          col("raw_bytes"),
          (col("dict_str_bytes") + col("n_rows") * 2L).as("dict_bytes"),
          when(col("raw_bytes") > 0,
            expr("(raw_bytes - dict_str_bytes - 2 * n_rows) * 1000000 div raw_bytes"))
            .otherwise(lit(0L)).as("savings_ppm"))
    }),
  )

  val oracle: Map[String, String] = Map(
    "q313_dict_savings" ->
      """WITH vals AS (
        |  SELECT 'documents.lang' AS col_name, lang AS v FROM documents
        |  UNION ALL SELECT 'documents.source', source FROM documents
        |  UNION ALL SELECT 'orders.status', o_orderstatus FROM orders
        |  UNION ALL SELECT 'orders.priority', o_orderpriority FROM orders),
        |pv AS (SELECT col_name, v, count(*)::BIGINT AS c FROM vals
        |  WHERE v IS NOT NULL GROUP BY 1, 2),
        |a AS (SELECT col_name, sum(c)::BIGINT AS n_rows,
        |    count(*)::BIGINT AS n_distinct,
        |    sum(strlen(v) * c)::BIGINT AS raw_bytes,
        |    sum(strlen(v))::BIGINT AS dict_str_bytes
        |  FROM pv GROUP BY 1)
        |SELECT col_name, n_rows, n_distinct, raw_bytes,
        |  (dict_str_bytes + 2 * n_rows)::BIGINT AS dict_bytes,
        |  CASE WHEN raw_bytes > 0 THEN
        |    ((raw_bytes - dict_str_bytes - 2 * n_rows) * 1000000) // raw_bytes
        |  ELSE 0 END::BIGINT AS savings_ppm
        |FROM a""".stripMargin,

    "q86_total_reconciliation" ->
      """WITH li AS (SELECT l_orderkey,
        |    sum(CAST(round(l_extendedprice*100) AS BIGINT)
        |        * (100 - CAST(round(l_discount*100) AS BIGINT))
        |        * (100 + CAST(round(l_tax*100) AS BIGINT)))::BIGINT AS recomputed_micro
        |  FROM lineitem GROUP BY l_orderkey),
        |o AS (SELECT o_orderkey,
        |    CAST(round(o_totalprice*100) AS BIGINT) * 10000 AS total_micro FROM orders)
        |SELECT coalesce(o_orderkey, l_orderkey) AS orderkey,
        |  CASE WHEN o_orderkey IS NULL THEN 'no_order'
        |       WHEN l_orderkey IS NULL THEN 'no_items' ELSE 'both' END AS status,
        |  total_micro, recomputed_micro,
        |  (total_micro - recomputed_micro)::BIGINT AS diff_micro
        |FROM o FULL JOIN li ON o_orderkey = l_orderkey""".stripMargin,

    "q46_deterministic_sample" -> {
      val h = graft.functions.TextHash.md5LongSql("doc_id::VARCHAR")
      s"""SELECT doc_id, lang, n_chars FROM documents WHERE $h % 100 < 10"""
    },

    "q251_correlation_matrix" -> {
      val cols = Seq("qty", "price", "disc", "tax")
      val prs = for { i <- cols.indices; j <- cols.indices if i < j }
        yield (cols(i), cols(j))
      val sumCols = (cols.map(c => s"sum($c) AS s_$c") ++
        cols.map(c => s"sum($c*$c) AS ss_$c") ++
        prs.map { case (a, b) => s"sum($a*$b) AS sp_${a}_$b" }).mkString(", ")
      val pairSelects = prs.map { case (a, b) =>
        s"""SELECT '$a~$b' AS pair, n, sp_${a}_$b AS sxy, s_$a AS sx,
           |  s_$b AS sy, ss_$a AS sxx, ss_$b AS syy FROM a""".stripMargin
      }.mkString("\nUNION ALL\n")
      val r = graft.functions.PortableMath.roundPortableSql(
        "num::DOUBLE / (sqrt(dx::DOUBLE) * sqrt(dy::DOUBLE))", 6)
      s"""WITH li AS (SELECT CAST(round(l_quantity) AS BIGINT) AS qty,
         |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price,
         |    CAST(round(l_discount * 100) AS BIGINT) AS disc,
         |    CAST(round(l_tax * 100) AS BIGINT) AS tax
         |  FROM lineitem),
         |a AS (SELECT count(*) AS n, $sumCols FROM li),
         |p AS ($pairSelects),
         |m AS (SELECT pair, n, (n*sxy - sx*sy) AS num,
         |    (n*sxx - sx*sx) AS dx, (n*syy - sy*sy) AS dy FROM p)
         |SELECT pair, n::BIGINT AS n, num::VARCHAR AS r_num,
         |  dx::VARCHAR AS r_den_x, dy::VARCHAR AS r_den_y,
         |  CASE WHEN dx = 0 OR dy = 0 THEN NULL ELSE $r END AS r
         |FROM m""".stripMargin
    },

    "q249_fd_audit" -> {
      def fd(tbl: String, aExpr: String, bExpr: String, fdName: String): String =
        s"""SELECT '$tbl' AS tbl, '$fdName' AS fd,
           |  sum(tot)::BIGINT AS n, count(*)::BIGINT AS n_lhs,
           |  (sum(tot) - sum(mx))::BIGINT AS violations,
           |  ((sum(tot) - sum(mx)) * 10000 // sum(tot))::BIGINT AS violation_bp,
           |  (sum(tot) = sum(mx)) AS holds
           |FROM (SELECT a, max(cnt) AS mx, sum(cnt) AS tot
           |      FROM (SELECT $aExpr AS a, $bExpr AS b, count(*) AS cnt
           |            FROM $tbl GROUP BY 1, 2) GROUP BY a)""".stripMargin
      Seq(
        fd("lineitem", "l_orderkey", "l_returnflag", "l_orderkey -> l_returnflag"),
        fd("lineitem", "l_orderkey", "l_linestatus", "l_orderkey -> l_linestatus"),
        fd("lineitem", "l_partkey", "l_suppkey", "l_partkey -> l_suppkey"),
        fd("lineitem", "l_orderkey::VARCHAR || '|' || l_linenumber::VARCHAR",
          "l_quantity", "line_key -> l_quantity"),
        fd("orders", "o_orderkey", "o_orderstatus", "o_orderkey -> o_orderstatus"),
        fd("orders", "o_custkey", "o_orderpriority", "o_custkey -> o_orderpriority"),
        fd("documents", "source", "lang", "source -> lang"),
      ).mkString("", "\nUNION ALL\n", "")
    },

    "q47_event_pivot" ->
      """SELECT user_id,
        |  sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS click,
        |  sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS view,
        |  sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS purchase,
        |  sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS signup,
        |  sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS error
        |FROM events WHERE user_id < 20 GROUP BY user_id""".stripMargin,

    "q42_json_props" ->
      """SELECT event_type,
        |  count(CAST(json_extract(props, '$.k') AS BIGINT)) AS n_with_k,
        |  (floor(sum(CAST(json_extract(props, '$.k') AS BIGINT))::DOUBLE
        |         / count(CAST(json_extract(props, '$.k') AS BIGINT)) * 100 + 0.5) / 100) AS avg_k,
        |  max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,

    "q38_embedding_quantize" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS maxabs FROM e)
        |SELECT vec_id, round(maxabs, 6) AS scale_maxabs,
        |  array_to_string(list_transform(v, x -> round(x * 127.0 / maxabs)::INT), ',') AS q_int8
        |FROM m""".stripMargin,

    "q39_column_stats" ->
      """SELECT l_returnflag,
        |  round(stddev_samp(l_quantity), 4) AS sd_qty,
        |  round(var_samp(l_discount), 4) AS var_disc,
        |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
        |  round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qty_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    // same arms as q101 with the exact-count alias + TRUE for the sketch
    // gate: the oracle verifies every portable value and that the HLL
    // estimate met tolerance (q32 pattern)
    "q113_profile_sketch" -> {
      def arm(cname: String, dtype: String) =
        s"""SELECT '$cname' AS col_name, '$dtype' AS dtype,
           |  count(*) AS n_rows,
           |  (count(*) - count($cname))::BIGINT AS n_null,
           |  count(DISTINCT $cname) AS n_distinct_exact,
           |  substr(min($cname)::VARCHAR, 1, 24) AS min_repr,
           |  substr(max($cname)::VARCHAR, 1, 24) AS max_repr,
           |  TRUE AS est_within_10pct
           |FROM documents""".stripMargin
      Seq(("doc_id", "bigint"), ("text", "string"), ("lang", "string"),
        ("source", "string"), ("n_chars", "bigint"))
        .map { case (c, t) => arm(c, t) }.mkString("\nUNION ALL\n")
    },

    // one UNION ALL arm per documents column, mirroring the generic
    // plan-time expansion (dtype literals = Spark simpleString names)
    "q101_profile_generic" -> {
      def arm(cname: String, dtype: String) =
        s"""SELECT '$cname' AS col_name, '$dtype' AS dtype,
           |  count(*) AS n_rows,
           |  (count(*) - count($cname))::BIGINT AS n_null,
           |  count(DISTINCT $cname) AS n_distinct,
           |  substr(min($cname)::VARCHAR, 1, 24) AS min_repr,
           |  substr(max($cname)::VARCHAR, 1, 24) AS max_repr
           |FROM documents""".stripMargin
      Seq(("doc_id", "bigint"), ("text", "string"), ("lang", "string"),
        ("source", "string"), ("n_chars", "bigint"))
        .map { case (c, t) => arm(c, t) }.mkString("\nUNION ALL\n")
    },

    "q40_profile_orders" ->
      """SELECT count(*) AS n_rows,
        |  sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS nulls_custkey,
        |  sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)::BIGINT AS nulls_status,
        |  count(distinct o_custkey) AS d_custkey,
        |  count(distinct o_orderstatus) AS d_status,
        |  count(distinct o_orderpriority) AS d_priority
        |FROM orders""".stripMargin,

    // the flat multiset state diff — no files, no manifests: if the
    // manifest-diff CDF is correct they are the same multiset
    "q115_cdf_window" ->
      """WITH s1 AS (SELECT o_orderkey AS k,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'),
        |upd AS (SELECT o_orderkey AS k,
        |    CAST(round(o_totalprice * 100) AS BIGINT) + 7 AS price_cents
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '2000-01-01 00:00:00'),
        |s2 AS (SELECT * FROM upd
        |       UNION ALL
        |       SELECT * FROM s1 WHERE k NOT IN (SELECT k FROM upd)),
        |ins AS (SELECT k, price_cents FROM s2 EXCEPT ALL SELECT k, price_cents FROM s1),
        |del AS (SELECT k, price_cents FROM s1 EXCEPT ALL SELECT k, price_cents FROM s2)
        |SELECT k, price_cents, 'insert' AS _change FROM ins
        |UNION ALL
        |SELECT k, price_cents, 'delete' AS _change FROM del""".stripMargin,

    // the three consumer windows replayed as flat multiset state diffs —
    // no files, manifests, or offsets on the oracle side
    "q206_cdc_offset_walk" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |    o_orderdate AS od FROM orders),
        |s1 AS MATERIALIZED (SELECT k, cents AS price_cents FROM o
        |  WHERE od < TIMESTAMP '1998-01-01 00:00:00'),
        |u2 AS MATERIALIZED (SELECT k, cents + 7 AS price_cents FROM o
        |  WHERE od >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND od < TIMESTAMP '1999-01-01 00:00:00'),
        |s2 AS MATERIALIZED (SELECT * FROM u2
        |  UNION ALL SELECT * FROM s1 WHERE k NOT IN (SELECT k FROM u2)),
        |u3 AS MATERIALIZED (SELECT k, cents + 13 AS price_cents FROM o
        |  WHERE od >= TIMESTAMP '1998-06-01 00:00:00'
        |    AND od < TIMESTAMP '2000-01-01 00:00:00'),
        |s3 AS MATERIALIZED (SELECT * FROM u3
        |  UNION ALL SELECT * FROM s2 WHERE k NOT IN (SELECT k FROM u3)),
        |b2i AS (SELECT k, price_cents FROM s2 EXCEPT ALL SELECT k, price_cents FROM s1),
        |b2d AS (SELECT k, price_cents FROM s1 EXCEPT ALL SELECT k, price_cents FROM s2),
        |b3i AS (SELECT k, price_cents FROM s3 EXCEPT ALL SELECT k, price_cents FROM s2),
        |b3d AS (SELECT k, price_cents FROM s2 EXCEPT ALL SELECT k, price_cents FROM s3)
        |SELECT 1 AS batch, k, price_cents, 'insert' AS _change FROM s1
        |UNION ALL SELECT 2, k, price_cents, 'insert' FROM b2i
        |UNION ALL SELECT 2, k, price_cents, 'delete' FROM b2d
        |UNION ALL SELECT 3, k, price_cents, 'insert' FROM b3i
        |UNION ALL SELECT 3, k, price_cents, 'delete' FROM b3d""".stripMargin,

    "q41_snapshot_diff" ->
      """WITH cur AS (SELECT o_orderkey AS k, round(o_totalprice, 2) AS cur_price FROM orders),
        |prev AS (SELECT o_orderkey AS k, round(o_totalprice * 0.9, 2) AS prev_price
        |         FROM orders WHERE o_orderdate < TIMESTAMP '2000-01-01 00:00:00')
        |SELECT CASE WHEN prev_price IS NULL THEN 'added'
        |            WHEN cur_price IS NULL THEN 'removed'
        |            WHEN cur_price != prev_price THEN 'changed'
        |            ELSE 'unchanged' END AS status, count(*) AS n
        |FROM cur FULL OUTER JOIN prev USING (k)
        |GROUP BY 1""".stripMargin,
  )
}
