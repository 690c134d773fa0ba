package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextHash

/** Corpus-preparation operators: chunking for context windows, vocabulary
  * statistics, TF-IDF term scoring. All single-shuffle shapes (explode +
  * hash-aggregate with map-side combine).
  */
object CorpusQueries {

  private val ChunkLen = 200
  private val ChunkStride = 150

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Overlapping fixed-size character chunks (stride < size ⇒ overlap),
    // the standard pre-embedding segmentation.
    "q33_doc_chunking" -> ((s, d) => {
      val t = col("text")
      val starts = sequence(lit(0), greatest(length(t) - 1, lit(0)), lit(ChunkStride))
      val chunks = transform(starts, st => t.substr(st + 1, lit(ChunkLen)))
      Tables.documents(s, d)
        .select(col("doc_id"), posexplode(chunks).as(Seq("chunk_idx", "chunk_text")))
        .select(col("doc_id"), col("chunk_idx"), col("chunk_text"),
          length(col("chunk_text")).as("chunk_len"))
    }),

    // Corpus vocabulary: top-50 tokens by frequency (deterministic ties).
    "q34_vocab_topk" -> ((s, d) =>
      // spread the compact doc rows before the corpus-wide fan-out map
      // pass (no-op at scale, see operators/Spread)
      graft.operators.Spread.rows(Tables.documents(s, d))
        .select(explode(TextHash.tokens(lower(col("text")))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("freq"))
        .orderBy(desc("freq"), asc("token"))
        .limit(50)),

    // TF-IDF: top-3 terms per document by tf·ln((N+1)/(df+1)).
    "q35_tfidf_top_terms" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // spread the compact doc rows before the corpus-wide fan-out map
      // pass (no-op at scale, see operators/Spread)
      val tok = graft.operators.Spread.rows(docs).select(col("doc_id"),
        explode(TextHash.tokens(lower(col("text")))).as("token"))
      val tf = tok.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
      val df = tok.distinct().groupBy(col("token")).agg(count(lit(1)).as("df"))
      val n = docs.select(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy(col("doc_id")).orderBy(desc("weight"), asc("token"))
      // df (the vocabulary) is NOT broadcast-hinted: a 100 TB corpus has a
      // vocabulary far past any broadcast threshold, so this must stay an
      // AQE-adjudicated join — shuffle on `token` at scale, auto-broadcast
      // at test scale. (n_docs is one row; broadcasting that is always right.)
      tf.join(df, "token")
        .crossJoin(broadcast(n))
        .withColumn("weight",
          round(col("tf") * log((col("n_docs") + 1) / (col("df") + 1)), 4))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("token"), col("rank"), col("weight"))
    }),

    // Inverted-index construction: per token, document frequency + the 10
    // lowest posting doc_ids (CSV — the driver comparer can't sort raw
    // array cells). The posting sample rides the bounded TopKByScore
    // aggregate, NOT collect_list: a stopword's full posting list is the
    // whole corpus, but the k-row map-side buffer keeps the shuffle at
    // k·|vocab| regardless. df stays exact (plain count of distinct
    // (doc, token) pairs). At scale the full index would be written
    // sharded by token range; this query is its bounded per-token summary.
    "q69_inverted_index" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(array_distinct(TextHash.tokens(lower(col("text"))))).as("token"))
      tok.groupBy(col("token"))
        .agg(count(lit(1)).as("df"),
          graft.functions.TopKAggregate
            .topK((-col("doc_id")).cast("double"), col("doc_id"), 10).as("top"))
        .select(col("token"), col("df"),
          array_join(transform(col("top"), t => t.getField("payload").cast("string")), ",")
            .as("postings"))
        .orderBy(desc("df"), asc("token"))
        .limit(50)
    }),

    // BPE tokenizer induction (operators/BpeVocab): the first 32 corpus-wide
    // merges learned in 4 AMORTIZED batch rounds — each round counts pairs
    // once (one explode-agg shuffle) and greedily picks up to 8
    // symbol-disjoint merges from the deterministic top-64 prefix, so 32
    // merges cost 4 count jobs instead of 32 (the batched-trainer
    // approximation; batch=1 is classic BPE and stays covered by q178).
    // Only the bounded 64-row prefix ever reaches the driver. The oracle
    // unrolls every batch round AND every in-round greedy pick (iterated
    // argmax-with-exclusion), so prefix cuts, disjointness exclusions,
    // argmax ties, and early stopping are all hash-checked.
    "q92_bpe_merges" -> ((s, d) => {
      import s.implicits._
      graft.operators.BpeVocab
        .learnMergesSlotted(Tables.documents(s, d), "text", numMerges = 32,
          minCount = 2L, batch = 8)
        .map { case (slot, m) => (slot, m.a, m.b, m.count) }
        .toDF("rank", "a", "b", "n")
    }),

    // BPE ENCODE — the apply half of the tokenizer loop q92 learns: the 4
    // learned merges run over every document as one fused map-side column
    // expression (k nested codegen'd merge calls, no shuffles), and the
    // per-source rollup reports exactly how much the subword vocabulary
    // compresses each slice (merged/initial symbol counts, integer basis
    // points). The oracle replays the whole learn-then-encode chain —
    // greedy non-overlap scans included — so the ENCODING itself is
    // hash-checked, not just the merge table. At 100 TB: learning cost is
    // q92's; encoding is a single linear pass.
    "q178_bpe_encode" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val merges = graft.operators.BpeVocab
        .learnMerges(docs, "text", numMerges = 4, minCount = 2L)
      // spread the compact doc rows: the merge-chain encode is a fan-out
      // map pass (no-op at scale, see operators/Spread)
      graft.operators.Spread.rows(docs)
        .select(col("doc_id"), col("source"),
          graft.functions.BpeExpressions.initSymbols(col("text")).as("syms0"))
        .filter(size(col("syms0")) >= 1) // nonempty text ⇔ ≥2 symbols
        .withColumn("len0", size(col("syms0")).cast("long"))
        .withColumn("lenk", size(merges.foldLeft(col("syms0"))((acc, m) =>
          graft.functions.BpeExpressions.mergePair(acc, lit(m.a), lit(m.b))))
          .cast("long"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("len0")).as("initial_symbols"),
          sum(col("lenk")).as("merged_symbols"))
        .withColumn("ratio_bp",
          expr("(merged_symbols * 10000) div initial_symbols"))
    }),

    // BPE TOKEN-ID ENCODING + PACKING — the missing middle of the
    // learn → encode → pack tokenizer loop: q92 learns the merges, this
    // assigns every document a token-ID SEQUENCE against the induced
    // vocabulary (tok_id = rank by corpus frequency DESC, symbol ASC —
    // a deterministic total order, so both engines number the vocabulary
    // identically), and q235's concat-then-chunk packing runs on the id
    // counts. Encoding is one fused map-side merge chain + one explode;
    // the vocabulary is domain-bounded (init chars + numMerges symbols),
    // so its rank window and the id-mapping broadcast join are both
    // corpus-size-independent. The running token count rides PrefixSum
    // (range shuffle + partition cumsum + broadcast offsets — never a
    // partitionless window). head_ids emits the first 8 ids as CSV (the
    // q38 vector-as-string discipline) so the ORDER of ids inside each
    // document is hash-checked, not just the counts.
    "q326_bpe_token_pack" -> ((s, d) => {
      val C = 512L
      val docs = Tables.documents(s, d)
      val merges = graft.operators.BpeVocab
        .learnMerges(docs, "text", numMerges = 32, minCount = 2L, batch = 8)
      // one row per doc with its final symbol array; consumed by the
      // vocab agg AND the id mapping — persist (round-5 rule). Spread the
      // compact doc rows first: the fused 32-merge chain is the heaviest
      // map pass in the suite and would otherwise run on the single
      // local scan task (no-op at scale, see operators/Spread)
      val enc = graft.operators.Spread.rows(docs)
        .select(col("doc_id"),
          graft.operators.BpeVocab.applyMerges(col("text"), merges).as("syms"))
        .filter(size(col("syms")) >= 1)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val ex = enc.select(col("doc_id"), posexplode(col("syms")).as(Seq("pos", "sym")))
      val vocab = ex.groupBy(col("sym")).agg(count(lit(1)).as("n"))
        .withColumn("tok_id",
          row_number().over(Window.orderBy(desc("n"), asc("sym"))).cast("long"))
        .select(col("sym"), col("tok_id"))
      val perDoc = ex.join(broadcast(vocab), "sym")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("nt"),
          array_sort(collect_list(when(col("pos") < 8,
            struct(col("pos"), col("tok_id"))))).as("h8"))
        .withColumn("head_ids",
          concat_ws(",", transform(col("h8"), x => x.getField("tok_id").cast("string"))))
        .select(col("doc_id"), col("nt"), col("head_ids"))
      graft.operators.PrefixSum.running(perDoc, "doc_id", "nt")
        .select(col("doc_id"), col("nt").as("n_tokens"), col("head_ids"),
          expr(s"(cum - nt) div $C").as("first_seq"),
          expr(s"(cum - 1) div $C").as("last_seq"),
          expr(s"(cum - nt) % $C").as("start_off"))
    }),

    // Heavy hitters with a DETERMINISTIC guarantee: a Misra–Gries summary
    // (functions/MisraGriesAggregate, k=256 counters) over the corpus
    // char-trigram stream (~377 distinct keys — the table really does
    // overflow and decrement). The summary's exact contents are
    // execution-order-dependent BY THE ALGORITHM, so the query reports
    // what is invariant: each truly-heavy trigram (exact count·(k+1) > n,
    // computed as an exact hash-agg) with `in_summary` — guaranteed true
    // by the n/(k+1) undercount bound — and a corpus-wide `bounds_ok`
    // verifying 0 ≤ exact − estimate ≤ n/(k+1) over EVERY summary entry.
    // The oracle emits the exact heavy set with literal TRUEs: any
    // violated guarantee hash-mismatches (q32's tolerance-gate pattern,
    // but with a proof-backed bound instead of a probabilistic one).
    // Trigrams come from zip_with over a 3-way sliced char array — the
    // per-element lambda only concats (the HOF-lambda re-evaluation trap
    // re-runs lower(text) per POSITION if substr is used in transform).
    // Zipf HEAD-slope fit: the rank-frequency power-law exponent every
    // corpus report quotes, as exact-integer OLS of mlog2(freq) on
    // mlog2(rank) over the TOP-1024 vocabulary head (the head is where
    // Zipf's law is measured; bounding it also bounds the only global
    // sort — TakeOrdered(1024) + a window over ≤1024 rows, never a
    // vocab-scale sort). mlog2 keeps both axes int64, so the OLS
    // numerator/denominator and the milli-slope are hash-exact — a float
    // log-log regression would be an order-dependent float sum.
    "q360_zipf_slope" -> ((s, d) => {
      // spread the compact doc rows before the corpus-wide fan-out map
      // pass (no-op at scale, see operators/Spread)
      val f = graft.operators.Spread.rows(Tables.documents(s, d))
        .select(explode(TextHash.tokens(lower(col("text")))).as("t"))
        .groupBy("t").agg(count(lit(1)).as("freq"))
      val head = f.orderBy(desc("freq"), asc("t")).limit(1024)
      val w = Window.orderBy(desc("freq"), asc("t")) // ≤1024 rows — bounded
      head.withColumn("rank", row_number().over(w))
        .select(graft.functions.PortableMath.mlog2(col("rank")).as("x"),
          graft.functions.PortableMath.mlog2(col("freq")).as("y"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"))
        .select(col("n").as("n_head"),
          (col("n") * col("sxy") - col("sx") * col("sy")).as("num"),
          (col("n") * col("sxx") - col("sx") * col("sx")).as("den"))
        // den = 0 on a degenerate single-row head: gate on BOTH engines
        // (the q263 rule) — Spark div would NULL, DuckDB // would ERROR
        .withColumn("mslope",
          expr("CASE WHEN den > 0 THEN (num * 1000) div den END"))
    }),

    // Good–Turing frequency smoothing + unseen-mass estimate: the classic
    // "how much of the language haven't we seen" corpus statistic, over
    // word TRIGRAMS (this corpus's unigram vocabulary is 31 closed-class
    // tokens with min count ~26 — no tail; trigrams have ~9k singletons).
    // Everything is exact: unseen mass = n1/N in integer bp, smoothed
    // counts r* = (r+1)·n_{r+1}/n_r as integer numerator/denominator
    // pairs (the rational form downstream LM code actually wants).
    // Trigram build is the zip_with-of-slices form (arrays bind once —
    // the q97 shape, not the per-element re-split HOF trap). Shape: one
    // explode + the count agg + a tiny freq-of-freq agg + a ≤6-row join.
    "q363_good_turing" -> ((s, d) => {
      val t = TextHash.tokens(lower(col("text")))
      val len3 = greatest(size(t) - 2, lit(0))
      val g3 = zip_with(
        zip_with(slice(t, lit(1), len3), slice(t, lit(2), len3),
          (a, b) => concat(a, lit(" "), b)),
        slice(t, lit(3), len3), (ab, c) => concat(ab, lit(" "), c))
      // spread the compact doc rows before the corpus-wide fan-out map
      // pass (no-op at scale, see operators/Spread)
      val f = graft.operators.Spread.rows(Tables.documents(s, d))
        .select(explode(g3).as("g"))
        .groupBy("g").agg(count(lit(1)).as("cnt"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) // ff + totals
      val ff = f.groupBy(col("cnt")).agg(count(lit(1)).as("n_r"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) // rows + r+1 side
      val tot = f.agg(sum(col("cnt")).as("big_n"), count(lit(1)).as("vocab"),
        sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("n1"))
      ff.filter(col("cnt") <= 6)
        .join(ff.select((col("cnt") - 1).as("cnt"), col("n_r").as("n_rp1")),
          Seq("cnt"), "left")
        .crossJoin(broadcast(tot))
        .select(col("cnt").as("r"), col("n_r"),
          coalesce(col("n_rp1"), lit(0L)).as("n_rp1"),
          ((col("cnt") + 1) * coalesce(col("n_rp1"), lit(0L))).as("rstar_num"),
          col("n_r").as("rstar_den"),
          col("big_n"), col("vocab"),
          expr("(n1 * 10000) div big_n").as("unseen_bp"))
    }),

    // Count-Sketch (Charikar et al. 2002): d=5 signed hash rows × w=256
    // cells, estimate = MEDIAN over rows of sign·cell — the unbiased
    // sibling of Count-Min (whose estimates only over-count). Cells build
    // from the exact distinct-token counts (one explode + two bounded hash
    // aggs, 5·256 cells total); the top-20 probe re-derives each token's
    // (cell, sign) pair map-side and medians 5 integers via
    // element_at(array_sort(...), 3) — exact on both engines, so the
    // ESTIMATES themselves are hash-checked, not a tolerance. The exact
    // count and |error| ride alongside: the sketch-accuracy audit.
    "q357_count_sketch" -> ((s, d) => {
      val W = 256; val D = 5
      def hcell(r: org.apache.spark.sql.Column, t: org.apache.spark.sql.Column) =
        TextHash.md5Long(concat(lit("csh:"), r.cast("string"), lit(":"), t)) % W
      def hsign(r: org.apache.spark.sql.Column, t: org.apache.spark.sql.Column) =
        lit(1L) - lit(2L) * (TextHash.md5Long(
          concat(lit("css:"), r.cast("string"), lit(":"), t)) % 2)
      // spread the compact doc rows before the corpus-wide fan-out map
      // pass (no-op at scale, see operators/Spread)
      val exact = graft.operators.Spread.rows(Tables.documents(s, d))
        .select(explode(TextHash.tokens(lower(col("text")))).as("t"))
        .groupBy("t").agg(count(lit(1)).as("cnt"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) // sketch build + top-20 probe
      val sk = exact
        .select(col("t"), col("cnt"), explode(sequence(lit(0), lit(D - 1))).as("r"))
        .select(col("r"), hcell(col("r"), col("t")).as("cell"),
          (hsign(col("r"), col("t")) * col("cnt")).as("contrib"))
        .groupBy("r", "cell").agg(sum(col("contrib")).as("c"))
        .select(col("r").as("sk_r"), col("cell").as("sk_cell"), col("c"))
      exact.orderBy(desc("cnt"), asc("t")).limit(20)
        .select(col("t"), col("cnt"), explode(sequence(lit(0), lit(D - 1))).as("r"))
        .join(broadcast(sk),
          col("r") === col("sk_r") && hcell(col("r"), col("t")) === col("sk_cell"))
        .select(col("t"), col("cnt"), (hsign(col("r"), col("t")) * col("c")).as("ev"))
        .groupBy(col("t"), col("cnt"))
        .agg(element_at(array_sort(collect_list(col("ev"))), 3).as("cs_est"))
        .select(col("t"), col("cnt"), col("cs_est"),
          abs(col("cs_est") - col("cnt")).as("abs_err"))
    }),

    "q97_heavy_hitters" -> ((s, d) => {
      val k = 256
      val tg = Tables.documents(s, d)
        .select(split(lower(col("text")), "").as("c"))
        .select(explode(zip_with(
          zip_with(
            slice(col("c"), lit(1), greatest(size(col("c")) - 2, lit(0))),
            slice(col("c"), lit(2), greatest(size(col("c")) - 2, lit(0))),
            (x, y) => concat(x, y)),
          slice(col("c"), lit(3), greatest(size(col("c")) - 2, lit(0))),
          (xy, z) => concat(xy, z))).as("tg"))
      val tot = tg.agg(count(lit(1)).as("n"))
      val exact = tg.groupBy(col("tg")).agg(count(lit(1)).as("cnt"))
      val mg = tg.agg(graft.functions.MisraGriesAggregate.summary(col("tg"), k).as("s"))
        .select(explode(col("s")).as("e"))
        .select(col("e.key").as("tg"), col("e.est").as("est"))
      val sound = mg.join(exact, "tg").crossJoin(broadcast(tot))
        .agg(coalesce(
          bool_and(col("est") <= col("cnt") &&
            (col("cnt") - col("est")) * (k + 1) <= col("n")),
          lit(true)).as("bounds_ok"))
      exact.crossJoin(broadcast(tot))
        .filter(col("cnt") * (k + 1) > col("n"))
        .join(mg.select(col("tg"), lit(true).as("in_summary")), Seq("tg"), "left")
        .crossJoin(broadcast(sound))
        .select(col("tg"), col("cnt"),
          coalesce(col("in_summary"), lit(false)).as("in_summary"),
          col("bounds_ok"))
    }),

    // CCNet-style duplicated-passage removal: split every document into
    // consecutive 10-token chunks (the corpus has no newlines, so fixed
    // token windows stand in for paragraphs), count each chunk string's
    // GLOBAL frequency, drop chunks that appear anywhere else in the
    // corpus, and reassemble what's left in document order. Emitted per
    // doc: chunk/drop counts + an md5 of the reassembled text, so the
    // oracle hashes the exact surviving CONTENT, not just its size.
    // Shape at scale: explode → two chunk-keyed hash-aggs → one join back
    // on the chunk string — all linear in token volume, the same
    // inverted-index shuffle every corpus query here uses; per-doc state
    // is bounded by chunks/doc. (The per-group collect_list is one doc's
    // chunks, not the corpus.)
    // Positional phrase search — the corpus's most frequent bigram found
    // map-side (zip_with adjacency, the q53 shape), then every document
    // containing that exact phrase located through a POSITIONAL postings
    // join: term-filtered position lists equi-join on (doc, pos+1) —
    // the inverted-index phrase semantics (q69 gave AND-of-terms; this
    // completes the IR surface). The phrase pick is a bounded top-1
    // collect; the join touches only the two terms' postings.
    "q142_phrase_search" -> ((s, d) => {
      val ltoks = TextHash.tokens(lower(col("text")))
      // spread the compact doc rows before the corpus-wide fan-out map
      // pass (no-op at scale, see operators/Spread)
      val docs = graft.operators.Spread.rows(Tables.documents(s, d))
      val pos = docs
        .select(col("doc_id"), posexplode(ltoks).as(Seq("pos", "token")))
        .persist() // two term probes; harness clears cache per query
      val grams = filter(
        zip_with(ltoks, slice(ltoks, lit(2), greatest(size(ltoks) - 1, lit(0))),
          (a, b) => concat(a, lit(" "), b)),
        x => x.isNotNull)
      val top = docs.select(explode(grams).as("gram"))
        .groupBy(col("gram")).agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("gram")).limit(1).collect()(0).getString(0)
      val Array(t1, t2) = top.split(" ", 2)
      val p1 = pos.filter(col("token") === t1).select(col("doc_id"), col("pos"))
      val p2 = pos.filter(col("token") === t2)
        .select(col("doc_id"), (col("pos") - 1).as("pos"))
      p1.join(p2, Seq("doc_id", "pos"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_occurrences"))
        .select(lit(top).as("phrase"), col("doc_id"), col("n_occurrences"))
        .orderBy(desc("n_occurrences"), asc("doc_id")).limit(10)
    }),

    // Context-window packing — the sequence-packing step of LLM training
    // data prep: the corpus token stream (docs concatenated in id order)
    // is cut into fixed 512-token contexts; each context reports how many
    // docs it holds, how many start in it, how many straddle a boundary,
    // and its exact token fill. The running offset rides
    // operators/PrefixSum (range repartition + broadcast offsets, never
    // a single-task global window); span→context fan-out is a bounded
    // sequence explode; every quantity is exact integer arithmetic.
    "q140_context_packing" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), size(TextHash.tokens(col("text"))).cast("long").as("tok"))
        .filter(col("tok") > 0)
      graft.operators.PrefixSum.running(toks, "doc_id", "tok", cumCol = "cum")
        .select(col("doc_id"), col("tok"), col("cum"),
          expr("(cum - tok) div 512").as("c0"),
          expr("(cum - 1) div 512").as("c1"))
        .select(col("doc_id"), col("tok"), col("cum"), col("c0"), col("c1"),
          explode(sequence(col("c0"), col("c1"))).as("ctx"))
        .groupBy(col("ctx"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("ctx") === col("c0"), 1L).otherwise(0L)).as("n_starting"),
          sum(when(col("c1") > col("c0"), 1L).otherwise(0L)).as("n_split_docs"),
          sum(least(col("cum"), (col("ctx") + 1) * 512)
            - greatest(col("cum") - col("tok"), col("ctx") * 512)).as("n_tokens"))
    }),

    "q116_chunk_dedup" -> ((s, d) => {
      val W = 10
      val toks = Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(TextHash.tokens(col("text"))).as(Seq("pos", "tok")))
      val chunks = toks
        .groupBy(col("doc_id"), expr(s"pos div $W").as("chunk_idx"))
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          p => p.getField("tok")), " ").as("chunk"))
      val freq = chunks.groupBy(col("chunk")).agg(count(lit(1)).as("freq"))
      chunks.join(freq, "chunk")
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_chunks"),
          sum((col("freq") >= 2).cast("long")).as("n_dropped"),
          md5(array_join(transform(filter(
            array_sort(collect_list(struct(col("chunk_idx"), col("chunk"),
              (col("freq") < 2).as("keep")))),
            p => p.getField("keep")), p => p.getField("chunk")), "|"))
            .as("kept_md5"))
    }),
  )

  val oracle: Map[String, String] = Map(
    "q142_phrase_search" ->
      s"""WITH tk AS (SELECT doc_id, ${TextHash.tokensSql("lower(text)")} AS t FROM documents),
         |bg AS (SELECT unnest(CASE WHEN len(t) >= 2
         |    THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
         |    ELSE [] END) AS gram FROM tk),
         |top1 AS (SELECT gram, count(*) AS cnt FROM bg
         |  GROUP BY gram ORDER BY cnt DESC, gram LIMIT 1),
         |pos AS (SELECT doc_id, unnest(t) AS token,
         |    unnest(range(0, len(t))) AS pos FROM tk),
         |m AS (SELECT p1.doc_id, count(*) AS n_occurrences
         |  FROM pos p1, pos p2, top1
         |  WHERE p1.token = string_split(gram, ' ')[1]
         |    AND p2.token = string_split(gram, ' ')[2]
         |    AND p1.doc_id = p2.doc_id AND p2.pos = p1.pos + 1
         |  GROUP BY p1.doc_id)
         |SELECT (SELECT gram FROM top1) AS phrase, doc_id, n_occurrences
         |FROM m ORDER BY n_occurrences DESC, doc_id LIMIT 10""".stripMargin,

    "q140_context_packing" ->
      s"""WITH t AS (SELECT doc_id, len(${TextHash.tokensSql("text")})::BIGINT AS tok
         |  FROM documents WHERE len(${TextHash.tokensSql("text")}) > 0),
         |c AS (SELECT doc_id, tok,
         |    sum(tok) OVER (ORDER BY doc_id)::BIGINT AS cum FROM t),
         |sp AS (SELECT doc_id, tok, cum,
         |    (cum - tok) // 512 AS c0, (cum - 1) // 512 AS c1 FROM c),
         |x AS (SELECT doc_id, tok, cum, c0, c1,
         |    unnest(range(c0, c1 + 1)) AS ctx FROM sp)
         |SELECT ctx, count(*)::BIGINT AS n_docs,
         |  sum(CASE WHEN ctx = c0 THEN 1 ELSE 0 END)::BIGINT AS n_starting,
         |  sum(CASE WHEN c1 > c0 THEN 1 ELSE 0 END)::BIGINT AS n_split_docs,
         |  sum(least(cum, (ctx + 1) * 512)
         |      - greatest(cum - tok, ctx * 512))::BIGINT AS n_tokens
         |FROM x GROUP BY ctx""".stripMargin,

    "q33_doc_chunking" ->
      s"""WITH c AS (SELECT doc_id,
         |  list_transform(range(0, greatest(length(text), 1), $ChunkStride),
         |    st -> substr(text, st + 1, $ChunkLen)) AS chunks FROM documents)
         |SELECT doc_id,
         |  unnest(range(0, len(chunks)))::INT AS chunk_idx,
         |  unnest(chunks) AS chunk_text,
         |  length(unnest(chunks)) AS chunk_len
         |FROM c""".stripMargin,

    "q34_vocab_topk" ->
      s"""SELECT token, count(*) AS freq
         |FROM (SELECT unnest(${TextHash.tokensSql("lower(text)")}) AS token FROM documents)
         |GROUP BY token ORDER BY freq DESC, token LIMIT 50""".stripMargin,

    "q35_tfidf_top_terms" ->
      s"""WITH tok AS (SELECT doc_id, unnest(${TextHash.tokensSql("lower(text)")}) AS token FROM documents),
         |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
         |df AS (SELECT token, count(*) AS df FROM (SELECT DISTINCT doc_id, token FROM tok) GROUP BY token),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |scored AS (
         |  SELECT tf.doc_id, tf.token,
         |    round(tf.tf * ln((n.n_docs + 1)::DOUBLE / (df.df + 1)), 4) AS weight
         |  FROM tf JOIN df ON tf.token = df.token CROSS JOIN n),
         |ranked AS (SELECT doc_id, token, weight,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY weight DESC, token) AS rank
         |  FROM scored)
         |SELECT doc_id, token, rank::INT AS rank, weight FROM ranked WHERE rank <= 3""".stripMargin,

    "q69_inverted_index" ->
      s"""WITH tok AS (SELECT DISTINCT doc_id, token FROM
         |        (SELECT doc_id, unnest(${TextHash.tokensSql("lower(text)")}) AS token
         |         FROM documents)),
         |idx AS (SELECT token, count(*) AS df,
         |        array_to_string(list_slice(list(doc_id ORDER BY doc_id), 1, 10), ',') AS postings
         |      FROM tok GROUP BY token)
         |SELECT token, df, postings FROM idx
         |ORDER BY df DESC, token LIMIT 50""".stripMargin,

    "q92_bpe_merges" ->
      graft.operators.BpeVocab.oracleSql("documents", "text", numMerges = 32,
        minCount = 2L, batch = 8),

    "q178_bpe_encode" ->
      graft.operators.BpeVocab.encodeOracleSql("documents", "text",
        "doc_id", "source", numMerges = 4, minCount = 2L),

    "q326_bpe_token_pack" ->
      graft.operators.BpeVocab.tokenPackOracleSql("documents", "text",
        "doc_id", numMerges = 32, minCount = 2L, chunk = 512L, headN = 8,
        batch = 8),

    "q360_zipf_slope" -> {
      val m = (x: String) => graft.functions.PortableMath.mlog2Sql(x)
      s"""WITH tok AS (SELECT unnest(${TextHash.tokensSql("lower(text)")}) AS t
         |            FROM documents),
         |f AS (SELECT t, count(*)::BIGINT AS freq FROM tok GROUP BY t),
         |head AS (SELECT t, freq FROM f ORDER BY freq DESC, t LIMIT 1024),
         |r AS (SELECT freq, row_number() OVER (ORDER BY freq DESC, t) AS rank
         |      FROM head),
         |xy AS (SELECT ${m("rank")} AS x, ${m("freq")} AS y FROM r),
         |st AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
         |         sum(y)::BIGINT AS sy, sum(x*x)::BIGINT AS sxx,
         |         sum(x*y)::BIGINT AS sxy FROM xy)
         |SELECT n AS n_head, (n*sxy - sx*sy)::BIGINT AS num,
         |  (n*sxx - sx*sx)::BIGINT AS den,
         |  (CASE WHEN (n*sxx - sx*sx) > 0
         |        THEN ((n*sxy - sx*sy) * 1000) // (n*sxx - sx*sx) END)::BIGINT
         |    AS mslope
         |FROM st""".stripMargin
    },

    "q363_good_turing" ->
      s"""WITH tok AS (SELECT ${TextHash.tokensSql("lower(text)")} AS t
         |            FROM documents),
         |g AS (SELECT unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
         |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g FROM tok),
         |f AS (SELECT g, count(*)::BIGINT AS cnt FROM g GROUP BY g),
         |ff AS (SELECT cnt, count(*)::BIGINT AS n_r FROM f GROUP BY cnt),
         |tot AS (SELECT sum(cnt)::BIGINT AS big_n, count(*)::BIGINT AS vocab,
         |          sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)::BIGINT AS n1
         |        FROM f)
         |SELECT a.cnt AS r, a.n_r, coalesce(b.n_r, 0)::BIGINT AS n_rp1,
         |  ((a.cnt + 1) * coalesce(b.n_r, 0))::BIGINT AS rstar_num,
         |  a.n_r AS rstar_den, tot.big_n, tot.vocab,
         |  ((tot.n1 * 10000) // tot.big_n)::BIGINT AS unseen_bp
         |FROM ff a LEFT JOIN ff b ON b.cnt = a.cnt + 1
         |CROSS JOIN tot
         |WHERE a.cnt <= 6""".stripMargin,

    // full sketch replay: same md5 cell/sign hashes, same 5-row median.
    "q357_count_sketch" -> {
      def cell(r: String, t: String) =
        s"(${TextHash.md5LongSql(s"'csh:' || ($r) || ':' || ($t)")} % 256)"
      def sign(r: String, t: String) =
        s"(1 - 2 * (${TextHash.md5LongSql(s"'css:' || ($r) || ':' || ($t)")} % 2))"
      s"""WITH tok AS (SELECT unnest(${TextHash.tokensSql("lower(text)")}) AS t
         |            FROM documents),
         |exact AS (SELECT t, count(*)::BIGINT AS cnt FROM tok GROUP BY t),
         |cells AS (SELECT r, ${cell("r", "t")} AS cell,
         |            ${sign("r", "t")} * cnt AS contrib
         |          FROM exact, unnest(range(0, 5)) AS u(r)),
         |sk AS (SELECT r, cell, sum(contrib)::BIGINT AS c
         |       FROM cells GROUP BY r, cell),
         |top AS (SELECT t, cnt FROM exact ORDER BY cnt DESC, t LIMIT 20),
         |probe AS (SELECT t, cnt, r FROM top, unnest(range(0, 5)) AS u(r)),
         |est AS (SELECT p.t, p.cnt, ${sign("p.r", "p.t")} * sk.c AS ev
         |        FROM probe p JOIN sk
         |          ON sk.r = p.r AND sk.cell = ${cell("p.r", "p.t")})
         |SELECT t, cnt, (list_sort(list(ev)))[3]::BIGINT AS cs_est,
         |  abs((list_sort(list(ev)))[3] - cnt)::BIGINT AS abs_err
         |FROM est GROUP BY t, cnt""".stripMargin
    },

    // The heavy set is computed EXACTLY here; the guarantee booleans are
    // literal TRUE — the Spark side must reproduce them from the sketch.
    "q97_heavy_hitters" ->
      """WITH g AS (SELECT substr(lower(text), i, 3) AS tg
        |      FROM documents, unnest(range(1, length(text) - 1)) AS u(i)),
        |tot AS (SELECT count(*) AS n FROM g),
        |exact AS (SELECT tg, count(*) AS cnt FROM g GROUP BY tg)
        |SELECT tg, cnt, TRUE AS in_summary, TRUE AS bounds_ok
        |FROM exact, tot WHERE cnt * 257 > n""".stripMargin,

    // parallel unnests zip token with its position; list(ORDER BY) replays
    // the document-order reassembly; FILTER keeps only unique chunks.
    // array_to_string of an empty filtered list is NULL in DuckDB, so the
    // all-dropped case coalesces to '' (Spark's array_join emits '').
    "q116_chunk_dedup" ->
      s"""WITH t AS (SELECT doc_id, unnest(${TextHash.tokensSql("text")}) AS tok,
         |       unnest(range(0, len(${TextHash.tokensSql("text")}))) AS pos FROM documents),
         |chunks AS (SELECT doc_id, pos // 10 AS chunk_idx,
         |       array_to_string(list(tok ORDER BY pos), ' ') AS chunk
         |     FROM t GROUP BY doc_id, pos // 10),
         |freq AS (SELECT chunk, count(*) AS freq FROM chunks GROUP BY chunk)
         |SELECT doc_id, count(*)::BIGINT AS n_chunks,
         |  sum((freq >= 2)::BIGINT)::BIGINT AS n_dropped,
         |  md5(coalesce(array_to_string(
         |    list(chunk ORDER BY chunk_idx) FILTER (freq < 2), '|'), '')) AS kept_md5
         |FROM chunks JOIN freq USING (chunk) GROUP BY doc_id""".stripMargin,
  )
}
