package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextHash

/** Extension surface: corpus-statistics + data-mix operators of a training
  * pipeline — repetition filtering (Gopher-style), composite quality gating,
  * collocation mining, and per-source token budgeting (waterfill).
  *
  * Everything here is plain hash-shuffle aggregation or window math over
  * small per-group relations; nothing holds unbounded state per key, so each
  * query scales linearly in corpus size.
  */
object MixQueries {

  private[queries] val stopwords = Seq("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")
  private[queries] def stopSqlList = stopwords.map(w => s"'$w'").mkString(", ")

  /** Word 2-gram array (as "w1 w2" strings); empty for docs under 2 tokens.
    *
    * Shape matters here: zip the token array against its own 1-shifted
    * slice, so both arrays are evaluated ONCE per row and the lambda only
    * touches its two bound elements. The tempting
    * `transform(sequence(1, n-1), i -> element_at(toks, i) ...)` form
    * re-evaluates the full `split` per ELEMENT (HOF lambdas inline their
    * captured expression) — O(tokens²) per doc, measured 13× slower at
    * sf0.1. zip_with pads the tail pair with null; `concat` (null-strict,
    * unlike concat_ws) turns it into a null element that `filter` drops. */
  private def bigrams(toks: org.apache.spark.sql.Column) =
    filter(
      zip_with(toks, slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b)),
      x => x.isNotNull)

  // DuckDB twin of `bigrams` (lists are 1-indexed; range has exclusive end,
  // so range(1, len) = 1..len-1 — same index set as the Spark sequence).
  private def bigramsSql(toks: String) =
    s"""CASE WHEN len($toks) >= 2
       |     THEN list_transform(range(1, len($toks)), i -> $toks[i] || ' ' || $toks[i+1])
       |     ELSE [] END""".stripMargin

  /** The Gopher-rule columns over `text`, shared by q51 (per-doc gate),
    * q73 (per-source rollup), and q77 (curation pipeline). */
  private[queries] case class Quality(
      nTok: org.apache.spark.sql.Column, avgLen: org.apache.spark.sql.Column,
      stopRatio: org.apache.spark.sql.Column, symRatio: org.apache.spark.sql.Column,
      reasons: org.apache.spark.sql.Column)

  private[queries] def qualityCols: Quality = {
    val toks = TextHash.tokens(col("text"))
    val nTok = size(toks)
    val nonWs = length(regexp_replace(col("text"), "\\s", ""))
    val nStop = size(filter(toks, t => t.isin(stopwords: _*)))
    val stopRatio = nStop.cast("double") / nTok
    val avgLen = nonWs.cast("double") / nTok
    val nSym = length(regexp_replace(col("text"), "[a-z0-9\\s]", ""))
    // guard: a whitespace-only doc has nonWs = 0 — ANSI mode would throw
    // DIVIDE_BY_ZERO (and DuckDB would emit inf); define its ratio as 0
    val symRatio = when(nonWs > 0, nSym.cast("double") / nonWs).otherwise(0.0)
    // NULL text nulls every metric, which nulls every rule predicate —
    // without an explicit rule a NULL doc would PASS the gate (and the
    // q73/q77 oracles would disagree); fail it by name instead
    val reasons = concat_ws(",", filter(array(
      when(col("text").isNull, lit("null_text")),
      when(!(nTok >= 30 && nTok <= 100000), lit("n_tokens")),
      when(!(avgLen >= 3.0 && avgLen <= 10.0), lit("avg_token_len")),
      when(stopRatio < 0.05, lit("stopword_ratio")),
      when(symRatio > 0.1, lit("symbol_ratio"))), x => x.isNotNull))
    Quality(nTok, avgLen, stopRatio, symRatio, reasons)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Gopher-style repetition metrics: fraction of duplicate tokens,
    // fraction of duplicate word 2-grams, and the most-frequent-2-gram
    // share. Entirely MAP-SIDE: per-doc output needs no cross-doc state, so
    // exploding grams through a (doc, gram) hash-agg would be two pointless
    // shuffles of the full gram volume. The top-gram count is instead the
    // longest run in the SORTED gram array — one in-row fold. The oracle
    // computes the same exact integers via unnest + GROUP BY; only the
    // algorithm differs, not the values.
    "q50_repetition_stats" -> ((s, d) => {
      val toks = TextHash.tokens(col("text"))
      val gs = array_sort(bigrams(toks))
      val total = size(gs)
      val nDistG = size(array_distinct(gs))
      // fold: (prev gram, current run length, best run length)
      val maxRun = aggregate(gs,
        struct(lit(null).cast("string").as("prev"), lit(0).as("run"), lit(0).as("best")),
        (acc, x) => {
          val run = when(x === acc.getField("prev"), acc.getField("run") + 1).otherwise(1)
          struct(x.as("prev"), run.as("run"),
            greatest(acc.getField("best"), run).as("best"))
        },
        acc => acc.getField("best"))
      // spread the compact doc rows before the corpus-wide fan-out map
      // pass (no-op at scale, see operators/Spread)
      graft.operators.Spread.rows(Tables.documents(s, d))
        .select(col("doc_id"), size(toks).as("n_tokens"),
          size(array_distinct(toks)).as("n_dist_tok"),
          total.as("total"), nDistG.as("n_dist_gram"), maxRun.as("max_n"))
        .filter(col("total") >= 1) // align with the oracle: no-gram docs drop
        .select(col("doc_id"), col("n_tokens"),
          graft.functions.PortableMath.roundPortable((col("n_tokens") - col("n_dist_tok")).cast("double") / col("n_tokens"), 3)
            .as("dup_token_frac"),
          graft.functions.PortableMath.roundPortable((col("total") - col("n_dist_gram")).cast("double") / col("total"), 3)
            .as("dup_2gram_frac"),
          graft.functions.PortableMath.roundPortable(col("max_n").cast("double") / col("total"), 3).as("top_2gram_frac"))
    }),

    // Composite quality gate (Gopher-rule style): token count, mean token
    // length, stopword density, symbol density -> pass/fail + the list of
    // violated rules. Single-pass column math, no shuffle.
    "q51_quality_filter" -> ((s, d) => {
      val q = qualityCols
      // spread the compact doc rows before the corpus-wide fan-out map
      // pass (no-op at scale, see operators/Spread)
      graft.operators.Spread.rows(Tables.documents(s, d)).select(
        col("doc_id"), q.nTok.as("n_tokens"),
        graft.functions.PortableMath.roundPortable(q.avgLen, 3).as("avg_token_len"),
        graft.functions.PortableMath.roundPortable(q.stopRatio, 3).as("stopword_ratio"),
        graft.functions.PortableMath.roundPortable(q.symRatio, 3).as("symbol_ratio"),
        (q.reasons === "").as("passes"), q.reasons.as("fail_reasons"))
    }),

    // Collocation mining: corpus-wide word-bigram lift, top 20. Lift is the
    // exact rational (cab * totalU^2) / (cw1 * cw2 * totalB) evaluated in
    // identically-ordered double arithmetic on both engines (no log, whose
    // last-ulp differences could flip the round-3 boundary). Unigram and
    // bigram counts are two linear hash-aggs; the count joins shuffle on the
    // word key (no broadcast hint — a 100 TB vocabulary outgrows any
    // broadcast threshold; AQE may still pick one at small scale).
    "q53_bigram_lift" -> ((s, d) => {
      // spread the compact doc rows before the corpus-wide fan-out map
      // pass (no-op at scale, see operators/Spread)
      val docs = graft.operators.Spread.rows(Tables.documents(s, d))
      val toks = TextHash.tokens(col("text"))
      val uni = docs.select(explode(toks).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cw"))
      val bi = docs.select(explode(bigrams(toks)).as("gram"))
        .select(split(col("gram"), " ").getItem(0).as("w1"),
          split(col("gram"), " ").getItem(1).as("w2"))
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cab"))
      val tot = uni.agg(sum(col("cw")).as("total_uni"))
        .crossJoin(bi.agg(sum(col("cab")).as("total_bi")))
      val lift = (col("cab").cast("double") * col("total_uni") * col("total_uni")) /
        (col("cw1").cast("double") * col("cw2") * col("total_bi"))
      bi.join(uni.select(col("w").as("w1"), col("cw").as("cw1")), "w1")
        .join(uni.select(col("w").as("w2"), col("cw").as("cw2")), "w2")
        .crossJoin(broadcast(tot))
        .filter(col("cab") >= 5)
        .select(col("w1"), col("w2"), col("cab"), graft.functions.PortableMath.roundPortable(lift, 3).as("lift"))
        .orderBy(desc("lift"), asc("w1"), asc("w2"))
        .limit(20)
    }),

    // Kneser–Ney smoothed bigram probabilities (discount d = 1/2) — the
    // LM-smoothing counterpart of q53/q279. Continuation counts N1+(•w2)
    // (distinct left contexts) and N1+(w1•) (distinct successors) come
    // from the same bigram-TYPE relation as the counts (three linear
    // aggregations of it — the corpus is scanned once), and the smoothed
    // probability is the exact rational
    //   P_KN(w2|w1) · 2·c(w1)·D = D·max(2·c(w1w2) − 1, 0) + N1+(w1•)·N1+(•w2)
    // with D = distinct bigram types and c(w1) = Σ_b c(w1 b) (context
    // occurrences), emitted in micro via ONE decimal division — no float,
    // no log. Top-30 bigrams by count, (w1, w2) tie order (TakeOrdered —
    // bounded, never a full sort).
    "q314_kneser_ney" -> ((s, d) => {
      val toks = TextHash.tokens(col("text"))
      // spread the compact doc rows before the corpus-wide fan-out map
      // pass (no-op at scale, see operators/Spread)
      val bi = graft.operators.Spread.rows(Tables.documents(s, d))
        .select(explode(bigrams(toks)).as("gram"))
        .select(split(col("gram"), " ").getItem(0).as("w1"),
          split(col("gram"), " ").getItem(1).as("w2"))
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cab"))
        .persist() // context totals + both continuation counts + top-k
      val ca = bi.groupBy(col("w1"))
        .agg(sum(col("cab")).as("ca"), count(lit(1)).as("n_follow"))
      val np = bi.groupBy(col("w2")).agg(count(lit(1)).as("n_prec"))
      val dt = bi.agg(count(lit(1)).as("d_types"))
      bi.join(ca, "w1").join(np, "w2").crossJoin(broadcast(dt))
        .select(col("w1"), col("w2"), col("cab"), col("ca"),
          col("n_follow"), col("n_prec"), col("d_types"),
          expr("""(cast(d_types as decimal(38,0)) * greatest(2 * cab - 1, 0)
                 + cast(n_follow as decimal(38,0)) * n_prec) * 1000000
                 div (cast(ca as decimal(38,0)) * 2 * d_types)""")
            .cast("long").as("p_kn_micro"))
        .orderBy(desc("cab"), asc("w1"), asc("w2"))
        .limit(30)
    }),

    // Bigram language-model next-token evaluation — the classic n-gram LM
    // quality probe, with NO float surface: an 80/20 md5 doc split, a
    // bigram model fit on train (argmax successor per prev token, ties to
    // the lexicographically smallest — the q158 determinism rule), and
    // per-occurrence next-token accuracy on test. Bigrams ride the
    // zip_with shifted-slice idiom (bound once — the HOF lambda trap);
    // the model argmax is a window over each prev-token's successor
    // GROUP (vocabulary-keyed, never low-cardinality); accuracy and
    // coverage are exact integer basis points.
    "q279_bigram_lm_eval" -> ((s, d) => {
      // spread the compact doc rows before the corpus-wide fan-out map
      // pass (no-op at scale, see operators/Spread)
      val t = graft.operators.Spread.rows(Tables.documents(s, d)).select(
        (pmod(TextHash.md5Long(col("doc_id").cast("string")), lit(5L)) === 0L)
          .as("is_test"),
        TextHash.tokens(col("text")).as("toks"))
      val grams = t.select(col("is_test"), explode(bigrams(col("toks"))).as("gram"))
        .select(col("is_test"),
          split(col("gram"), " ").getItem(0).as("w1"),
          split(col("gram"), " ").getItem(1).as("w2"))
        .persist() // train counts + test evaluation
      val counts = grams.filter(!col("is_test"))
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("w1")).orderBy(desc("c"), asc("w2"))
      val pred = counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).select(col("w1"), col("w2").as("pred"))
      grams.filter(col("is_test"))
        .join(pred, Seq("w1"), "left")
        .agg(count(lit(1)).as("n_test"),
          sum(col("pred").isNotNull.cast("long")).as("n_covered"),
          sum(coalesce((col("pred") === col("w2")).cast("long"), lit(0L)))
            .as("n_correct"))
        .select(col("n_test"), col("n_covered"), col("n_correct"),
          expr("if(n_covered > 0, n_correct * 10000 div n_covered, 0L)").as("acc_bp"),
          expr("n_covered * 10000 div n_test").as("coverage_bp"))
    }),

    // Per-document LM-surprisal quality score WITHOUT a log surface — the
    // r8-verdict gap: per-doc perplexity needs log(p) products, which no
    // cross-engine-exact float log allows. The integer sidestep: each
    // bigram occurrence's model probability is the exact rational
    // c_ab/c_a, quantized to ppm = (c_ab·10⁶) div c_a ∈ [1, 10⁶]
    // (self-counted ⇒ never 0), and the per-doc aggregate is ORDER
    // statistics over those ppms — median (×2, the q94 bracketing-sum
    // idiom: no division), min, and the rare-bigram count — which rank
    // documents by typicality exactly like log-perplexity ranks them
    // monotonically would, with every value hash-checkable. One corpus
    // bigram model (two hash aggs), one join back, one per-doc bounded
    // fold; the keep gate composes median typicality with the worst-case
    // (min) bigram — thresholds tuned to DISCRIMINATE on this corpus
    // (~half keep), all integer compares so any threshold is portable.
    "q300_surprisal_quality" -> ((s, d) => {
      // spread the compact doc rows before the corpus-wide fan-out map
      // pass (no-op at scale, see operators/Spread)
      val docs = graft.operators.Spread.rows(Tables.documents(s, d))
        .select(col("doc_id"), TextHash.tokens(col("text")).as("toks"))
      val g = docs.select(col("doc_id"), explode(bigrams(col("toks"))).as("gram"))
        .select(col("doc_id"),
          split(col("gram"), " ").getItem(0).as("w1"),
          split(col("gram"), " ").getItem(1).as("w2"))
        .persist() // model counts (c_ab, c_a) + the scoring join
      val cab = g.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cab"))
      val ca = g.groupBy(col("w1")).agg(count(lit(1)).as("ca"))
      val per = g.join(cab, Seq("w1", "w2")).join(ca, Seq("w1"))
        .select(col("doc_id"), expr("(cab * 1000000) div ca").as("ppm"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), min(col("ppm")).as("min_ppm"),
          sum((col("ppm") < 5000L).cast("long")).as("n_rare"),
          sort_array(collect_list(col("ppm"))).as("arr"))
        .select(col("doc_id"), col("n_bigrams"), col("min_ppm"), col("n_rare"),
          expr("element_at(arr, cast((n_bigrams + 1) div 2 as int)) + " +
            "element_at(arr, cast(n_bigrams div 2 + 1 as int))").as("median2_ppm"))
      Tables.documents(s, d).select(col("doc_id")).join(per, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          coalesce(col("median2_ppm"), lit(0L)).as("median2_ppm"),
          coalesce(col("min_ppm"), lit(0L)).as("min_ppm"),
          coalesce(col("n_rare"), lit(0L)).as("n_rare"))
        .withColumn("keep",
          col("median2_ppm") >= 68000L && col("min_ppm") >= 10000L)
    }),

    // HBOS-style histogram outlier audit over the embedding corpus — the
    // cheap-and-portable cousin of density outlier detection: per
    // DIMENSION, 16 equal-width integer bins over the corpus [min, max];
    // a vector is suspicious where it sits in SPARSE bins. The classic
    // HBOS score multiplies inverse densities (a float/log surface); the
    // integer formulation keeps the same ranking signals exactly: the
    // vector's minimum bin density and its sparse-bin count. Per-dim
    // stats ride a 64-row broadcast join (never driver literals), bin
    // arithmetic is pure integer ((x−mn)·16 div (range+1) ∈ 0..15 by
    // construction), and the explode is ×dims on the narrow micro
    // relation only.
    "q304_hbos_outliers" -> ((s, d) => {
      val nBins = 16
      val ex = Tables.embeddings(s, d)
        .select(col("vec_id"), posexplode(
          transform(col("embedding").cast("array<double>"),
            x => round(x * 1000000.0).cast("long"))).as(Seq("dim", "x")))
        .persist() // per-dim stats + bin counts + the per-vector score
      val stats = ex.groupBy(col("dim"))
        .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      val binned = ex.join(broadcast(stats), Seq("dim"))
        .select(col("vec_id"), col("dim"),
          expr(s"((x - mn) * $nBins) div (mx - mn + 1)").as("bin"))
      val counts = binned.groupBy(col("dim"), col("bin")).agg(count(lit(1)).as("cnt"))
      binned.join(counts, Seq("dim", "bin"))
        .groupBy(col("vec_id"))
        .agg(min(col("cnt")).as("min_density"),
          sum((col("cnt") <= 5L).cast("long")).as("n_sparse"))
        .withColumn("outlier", col("n_sparse") >= 3L || col("min_density") <= 1L)
    }),

    // Padding-waste sweep for NO-SPLIT sequence packing — the context-
    // length sizing table a training job reads: if every doc keeps its
    // own ceil(tokens/L) sequences (no cross-doc concat — q235 is the
    // zero-waste concat-then-chunk dual), how much of each candidate
    // context length L is padding? One scan over token counts × a 3-row
    // explode; waste in exact integer bp.
    "q309_padding_waste" -> ((s, d) =>
      Tables.documents(s, d)
        .select(size(TextHash.tokens(col("text"))).cast("long").as("n"))
        .select(col("n"), explode(array(lit(128L), lit(256L), lit(512L))).as("max_len"))
        .groupBy(col("max_len"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("total_tokens"),
          sum(expr("(n + max_len - 1) div max_len")).as("n_seqs"))
        .select(col("max_len"), col("n_docs"), col("total_tokens"), col("n_seqs"),
          (col("n_seqs") * col("max_len") - col("total_tokens")).as("padding_tokens"),
          expr("((n_seqs * max_len - total_tokens) * 10000) div (n_seqs * max_len)")
            .as("waste_bp"))),

    // Integer Flesch reading-ease — the classic readability gate of a
    // text-quality panel, exact in milli-points: syllables ≈ vowel-run
    // count (runs never cross whitespace, so the whole-text regexp count
    // equals the per-word sum), sentences = terminator-run count floored
    // at 1, and FRE·1000 = 206835 − (1015·1000·W) div S − (84600·1000·Y)
    // div W — two integer divisions, identical truncation both engines.
    "q305_readability" -> ((s, d) =>
      // spread: three regexp/token folds per doc (see operators/Spread)
      graft.operators.Spread.rows(Tables.documents(s, d)).select(col("doc_id"),
          size(TextHash.tokens(col("text"))).cast("long").as("n_words"),
          greatest(size(expr("regexp_extract_all(text, '[.!?]+', 0)")).cast("long"),
            lit(1L)).as("n_sentences"),
          size(expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)")).cast("long")
            .as("n_syllables"))
        .filter(col("n_words") > 0)
        .withColumn("fre_milli",
          lit(206835L) - expr("(1015000 * n_words) div n_sentences")
            - expr("(84600000 * n_syllables) div n_words"))
        // band cuts calibrated to THIS corpus (synthetic text has no
        // sentence terminators, so the words/sentence term dominates and
        // classic Flesch cuts would label everything hard) — integer
        // compares, portable at any threshold
        .withColumn("band",
          when(col("fre_milli") >= -155000000L, "easy")
            .when(col("fre_milli") >= -199000000L, "standard").otherwise("hard"))),

    // Per-source language concentration — the Herfindahl index (Σ share²)
    // of each source's language mix, exact integer ppm: HHI = Σc_l²·10⁶
    // div n². The "is this source a monoculture" readout next to q241's
    // raw pivot; two tiny hash aggs (source×lang, then source), no float.
    "q295_language_hhi" -> ((s, d) => {
      val sl = Tables.documents(s, d)
        .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("c"))
      sl.groupBy(col("source"))
        .agg(sum(col("c")).as("n_docs"), count(lit(1)).as("n_langs"),
          sum(col("c") * col("c")).as("c2"))
        .select(col("source"), col("n_docs"), col("n_langs"),
          expr("(c2 * 1000000) div (n_docs * n_docs)").as("hhi_ppm"))
    }),

    // Leave-one-source-out ablation — the data-valuation table a corpus
    // curator reads before cutting a source: for every source, the corpus
    // quality metrics RECOMPUTED WITHOUT it, from sufficient statistics
    // (per-source n/Σ + one global rollup — removing a source is a
    // subtraction, never a rescan per source; q283's leave-one-out trick
    // at the source grain). Metrics: mean tokens/doc (×100) and the
    // q215-label pass rate (tokens ≥ 60) in bp, both exact integer
    // divisions; `raises_quality` is the cross-multiplied exact boolean
    // (pass_wo·N·den > pass_all·…) for "does dropping this source raise
    // the pass rate".
    "q286_loso_ablation" -> ((s, d) => {
      val per = Tables.documents(s, d)
        .select(col("source"), size(TextHash.tokens(col("text"))).cast("long").as("ntok"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("ntok")).as("tok"),
          sum((col("ntok") >= 60).cast("long")).as("pass"))
      val tot = per.agg(sum(col("n")).as("tn"), sum(col("tok")).as("ttok"),
        sum(col("pass")).as("tpass"))
      per.crossJoin(broadcast(tot))
        .select(col("source"), col("n").as("n_docs"),
          expr("(ttok - tok) * 100 div (tn - n)").as("loso_mean_tok_x100"),
          expr("(tpass - pass) * 10000 div (tn - n)").as("loso_pass_bp"),
          // exact rational compare: (tpass−pass)/(tn−n) > tpass/tn
          ((col("tpass") - col("pass")) * col("tn") >
            col("tpass") * (col("tn") - col("n"))).as("raises_quality"))
    }),

    // 5-fold cross-validated bigram LM — q279 generalized WITHOUT k
    // rescans: per-(fold, pair) counts are the sufficient statistics, so
    // fold f's training count is total − own (one subtraction, not a
    // 4/5-corpus re-aggregation per fold — the leave-one-out trick that
    // makes CV affordable at corpus scale). The fold×pair relation is
    // grams-bounded (5 rows per OBSERVED pair); per-fold argmax and
    // accuracy follow q279's determinism rules. Emits one row per fold —
    // the variance across folds is the readout a single split hides.
    "q283_bigram_cv" -> ((s, d) => {
      val nFolds = 5
      val t = Tables.documents(s, d).select(
        pmod(TextHash.md5Long(col("doc_id").cast("string")), lit(nFolds.toLong))
          .as("fold"),
        TextHash.tokens(col("text")).as("toks"))
      val grams = t.select(col("fold"), explode(bigrams(col("toks"))).as("gram"))
        .select(col("fold"),
          split(col("gram"), " ").getItem(0).as("w1"),
          split(col("gram"), " ").getItem(1).as("w2"))
        .persist() // per-fold counts + per-fold evaluation
      val cf = grams.groupBy(col("fold"), col("w1"), col("w2"))
        .agg(count(lit(1)).as("c_f"))
      val tot = cf.groupBy(col("w1"), col("w2")).agg(sum(col("c_f")).as("c_tot"))
      val folds = explode(array((0 until nFolds).map(f => lit(f.toLong)): _*)).as("fold")
      val train = tot.select(col("w1"), col("w2"), col("c_tot"), folds)
        .join(cf, Seq("fold", "w1", "w2"), "left")
        .select(col("fold"), col("w1"), col("w2"),
          (col("c_tot") - coalesce(col("c_f"), lit(0L))).as("c"))
        .filter(col("c") > 0)
      val w = Window.partitionBy(col("fold"), col("w1")).orderBy(desc("c"), asc("w2"))
      val pred = train.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).select(col("fold"), col("w1"), col("w2").as("pred"))
      grams.join(pred, Seq("fold", "w1"), "left")
        .groupBy(col("fold"))
        .agg(count(lit(1)).as("n_test"),
          sum(col("pred").isNotNull.cast("long")).as("n_covered"),
          sum(coalesce((col("pred") === col("w2")).cast("long"), lit(0L)))
            .as("n_correct"))
        .select(col("fold"), col("n_test"), col("n_covered"), col("n_correct"),
          expr("if(n_covered > 0, n_correct * 10000 div n_covered, 0L)").as("acc_bp"))
    }),

    // Stratified exact-k sampling: the 5 smallest-content-hash docs per
    // source — deterministic, engine-independent, and SCALABLE: selection
    // is the bounded TopKByScore aggregate (map-side k-row buffers; the
    // shuffle carries k rows per source), not row_number over a window
    // (which shuffles and sorts EVERY row of every group first). The hash
    // is range-reduced mod 2^40 so its negation is exact in the aggregate's
    // double score — ordering matches the oracle's exact-integer sort.
    "q56_stratified_sample" -> ((s, d) => {
      val h = pmod(TextHash.md5Long(col("doc_id").cast("string")), lit(1099511627776L))
      Tables.documents(s, d)
        .select(col("source"), col("doc_id"), h.as("hv"))
        .groupBy(col("source"))
        .agg(graft.functions.TopKAggregate.topK((-col("hv")).cast("double"), col("doc_id"), 5)
          .as("top"))
        .select(col("source"), posexplode(col("top")).as(Seq("pos", "t")))
        .select(col("source"), col("t.payload").as("doc_id"),
          (col("pos") + 1).cast("int").as("rank"))
    }),

    // Weighted sampling WITHOUT replacement (operators/WeightedSample):
    // the Efraimidis–Spirakis draw with pure-integer keys — each doc runs
    // `weight` md5 trials and keeps its min; ascending-key order IS the ES
    // u^(1/w) order (min-of-uniforms ≡ exponential race under one shared
    // monotone transform), so no float pow exists to diverge between
    // engines. Weight = 1 + n_chars div 64 (quantized length-proportional
    // draw, w ∈ 1..9 on this corpus). DuckDB replays the trials with
    // list_min over range.
    "q114_weighted_sample" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), (lit(1L) + expr("n_chars div 64")).as("weight"))
      graft.operators.WeightedSample.sampleK(docs, "doc_id", "weight", 50)
        .withColumnRenamed("id", "doc_id")
    }),

    // Data-mix budgeting: share a global token budget (80% of the corpus)
    // across sources by exact closed-form waterfill — small sources keep all
    // tokens, large sources are capped at one common fill level — computed
    // with window functions in ONE pass over the per-source rollup (no
    // iteration). The windows are global but run over the per-SOURCE
    // relation, whose cardinality is #domains, not #docs — trivially
    // driver-scale even at 100 TB.
    "q54_source_mix" -> ((s, d) => {
      val per = Tables.documents(s, d)
        .select(col("source"), size(TextHash.tokens(col("text"))).as("nt"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
      val tot = per.agg(sum(col("n_tokens")).as("total_tokens"),
        count(lit(1)).as("n_sources"))
      val wOrd = Window.orderBy(col("n_tokens"), col("source"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(lit(1))
      val b = floor(col("total_tokens") * 0.8).cast("long")
      // sorted ascending, a source is fully funded iff giving IT (and
      // implicitly everything larger) its own size still fits the budget
      // left after funding all smaller sources
      val staged = per.crossJoin(broadcast(tot))
        .withColumn("i", row_number().over(Window.orderBy(col("n_tokens"), col("source"))))
        .withColumn("cum", sum(col("n_tokens")).over(wOrd))
        .withColumn("b", b)
        .withColumn("funded",
          col("n_tokens") * (col("n_sources") - col("i") + 1) <= col("b") - (col("cum") - col("n_tokens")))
        .withColumn("s", sum(when(col("funded"), col("n_tokens")).otherwise(0L)).over(wAll))
        .withColumn("nf", sum(when(col("funded"), 1L).otherwise(0L)).over(wAll))
      val level = (col("b") - col("s")).cast("double") / (col("n_sources") - col("nf"))
      staged.select(col("source"), col("n_docs"), col("n_tokens"), col("funded"),
        graft.functions.PortableMath.roundPortable(when(col("funded"), col("n_tokens").cast("double")).otherwise(level), 2)
          .as("alloc_tokens"),
        graft.functions.PortableMath.roundPortable(when(col("funded"), lit(1.0)).otherwise(level / col("n_tokens")), 4)
          .as("keep_frac"))
    }),

    // TEMPERATURE-WEIGHTED source mixing (T = 2 ⇒ p_i ∝ √n_i — the
    // standard multilingual/multi-source rebalancing that upweights small
    // sources): weights are floor(√n) — IEEE sqrt is correctly rounded
    // and floor is exact, so the weights are INTEGERS and every quota is
    // an integer division (no order-dependent float sum across sources).
    // The sample is the per-source md5-order prefix of length quota,
    // picked with the q56 idiom: a per-source TopKByScore (k = K ≥ any
    // quota) keeps a bounded map-side-combinable buffer, so the shuffle
    // carries ≤ K rows per source — NEVER a source-partitioned window,
    // which would sort each source's ENTIRE document set in one task
    // (#sources tasks total at 100 TB). The hash is mod 2^40 so its
    // negation is double-exact for the aggregate's score, and the
    // aggregate's (score DESC, payload ASC) tie order == (hv, doc_id).
    // The emitted id-SUM proves exact sample membership without
    // shipping the rows.
    "q230_temperature_mix" -> ((s, d) => {
      val K = 1000
      val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
        .withColumn("hv",
          pmod(TextHash.md5Long(col("doc_id").cast("string")), lit(1099511627776L)))
        .persist() // counts + bounded top-K sampling
      val per = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        .withColumn("w", floor(sqrt(col("n_docs"))).cast("long"))
      val tot = per.agg(sum(col("w")).as("tw"))
      val quota = per.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("w"),
          expr(s"($K * w) div tw").as("quota"))
      val sm = docs
        .groupBy(col("source"))
        .agg(graft.functions.TopKAggregate
          .topK((-col("hv")).cast("double"), col("doc_id"), K).as("top"))
        .select(col("source"), posexplode(col("top")).as(Seq("pos", "t")))
        .join(broadcast(quota.select(col("source"), col("quota"))), "source")
        .filter(col("pos") < col("quota")) // pos 0-based == rank-1
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_sampled"), sum(col("t.payload")).as("sample_id_sum"))
      quota.join(sm, Seq("source"), "left")
        .select(col("source"), col("n_docs"), col("w").as("weight"), col("quota"),
          coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
          coalesce(col("sample_id_sum"), lit(0L)).as("sample_id_sum"))
    }),

    // SEQUENCE PACKING — the concat-then-chunk layout every LLM training
    // run performs: documents concatenate in doc_id order into one token
    // stream that is cut into fixed 512-token sequences; each doc reports
    // the sequences it spans and its offset in the first one (the
    // attention-mask / boundary-loss bookkeeping). The running token count
    // rides operators/PrefixSum (range shuffle + per-partition cumsum +
    // broadcast offsets — NEVER a partitionless window), so the layout of
    // a 100 TB corpus is one linear pass; every output column is integer
    // division on the prefix sums. Zero-token docs occupy no positions
    // and are excluded on both engines.
    "q235_sequence_packing" -> ((s, d) => {
      val C = 512L
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), size(TextHash.tokens(col("text"))).cast("long").as("nt"))
      graft.operators.PrefixSum.running(docs, "doc_id", "nt")
        .filter(col("nt") > 0)
        .select(col("doc_id"), col("nt").as("n_tokens"),
          expr(s"(cum - nt) div $C").as("first_seq"),
          expr(s"(cum - 1) div $C").as("last_seq"),
          expr(s"(cum - nt) % $C").as("start_off"))
    }),

    // Count-Min heavy hitters: every vocabulary token's exact count next to
    // its sketch estimate. The sketch is ONE bounded 4×1024 matrix combined
    // map-side (shuffle = one 32 KB buffer per partition); estimates read
    // min-of-4 cells via the same portable hash arithmetic the aggregate
    // writes them with, so the DuckDB oracle replays every cell and checks
    // the estimates EXACTLY — collisions included — not within a tolerance.
    "q63_count_min" -> ((s, d) => {
      val depth = 4; val width = 1024
      val toks = Tables.documents(s, d)
        .select(explode(TextHash.tokens(col("text"))).as("t"))
        .withColumn("hp", TextHash.baseHash(col("t")))
      val sketch = toks.agg(
        graft.functions.CountMinAggregate.countMin(col("hp"), depth, width).as("cms"))
      toks.groupBy(col("t"), col("hp")).agg(count(lit(1)).as("exact_n"))
        .crossJoin(broadcast(sketch))
        .select(col("t"), col("exact_n"),
          graft.functions.CountMinAggregate
            .estimate(col("cms"), col("hp"), depth, width).as("cms_n"))
    }),

    // Per-source quality panel: the q51 gate rolled up to the mix level —
    // the summary a curation run reads to decide which sources to keep.
    // Same single-pass rule math, then one hash-agg on source; the ratios
    // divide exact longs, so rounding is reproducible.
    // TRAINABLE QUALITY CLASSIFIER — the fastText-filter role, as an
    // EXACT-ARITHMETIC Bernoulli Naive Bayes so the whole train→score
    // loop is hash-checkable: the q51 rule gate provides weak labels, the
    // model is per-token quantized class-conditional presence
    // probabilities pq = ((df_pass+1)·10⁴) div (n_pass+2) (Laplace
    // smoothing, integer div — Q=10⁴ ≥ corpus+2 keeps every factor in
    // [1, Q−1], so absence factors Q−p are positive too), the FEATURE SET
    // is the K=8 globally most discriminative of the top-256-df
    // vocabulary (integer odds rank; global selection keeps scoring
    // ABSENCE-AWARE — the rule gate\'s strongest signal is missing
    // stopwords, which present-token-only scoring cannot see), and the
    // decision is an exact integer product comparison over K
    // presence/absence factors + the prior — no log anywhere
    // (decimal(38,0): 10⁴ prior × (10⁴)⁸ = 10³⁶). Training is two
    // hash-aggs + two domain-bounded rank windows; the fitted model is
    // EIGHT rows, collected and baked into a map-side scoring expression
    // (the KMeansIVF fit discipline) — at 100 TB nothing corpus-sized
    // sorts, collects, or broadcasts. Output: per-source confusion
    // counts vs the rule labels + integer accuracy_bp (measured at
    // sf0.1: 80.5% vs the 51.9% majority base rate).
    "q329_nb_quality_classifier" -> ((s, d) => {
      val V = 256; val K = 8; val Q = 10000L
      val q = qualityCols
      // spread the compact doc rows before the corpus-wide fan-out map
      // pass (no-op at scale, see operators/Spread)
      val lab = graft.operators.Spread.rows(Tables.documents(s, d))
        .select(col("doc_id"), col("source"), (q.reasons === "").as("pass"),
          array_distinct(TextHash.tokens(col("text"))).as("toks"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val pri = lab.agg(count(lit(1)).as("n"),
        sum(when(col("pass"), 1L).otherwise(0L)).as("np"))
        .withColumn("nf", col("n") - col("np"))
      val dt = lab.select(col("doc_id"), col("pass"), explode(col("toks")).as("tok"))
      val dfx = dt.groupBy(col("tok"))
        .agg(count(lit(1)).as("df"),
          sum(when(col("pass"), 1L).otherwise(0L)).as("dfp"))
        .withColumn("dff", col("df") - col("dfp"))
        .withColumn("hv", TextHash.md5Long(col("tok")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // top-V by (df DESC, hv ASC) via the bounded TopKByScore aggregate
      // (map-side V-row buffers; the shuffle carries V rows total) — NEVER
      // a partitionless row_number window over the full vocabulary, which
      // grows with the corpus (Heaps law) and would sort it in one task
      // (the q230/q56 discipline). The md5 hash is the tie key because the
      // aggregate's payload is a long; the oracle orders by the identical
      // (df DESC, hv ASC) rule. df < 2^53 ⇒ the double score is exact.
      val hvs = dfx
        .agg(graft.functions.TopKAggregate.topK(
          col("df").cast("double"), col("hv"), V).as("top"))
        .select(explode(col("top")).as("t"))
        .select(col("t.payload").as("hv"))
        .collect().map(_.getLong(0))
      val vocab = dfx.filter(col("hv").isin(hvs: _*))
      // a 64-bit md5 collision between a picked and an unpicked token
      // would silently widen the vocabulary — fail loudly instead
      require(vocab.count() == hvs.length,
        "md5 tie-key collision in NB top-V vocabulary selection")
      val feats = vocab
        .crossJoin(broadcast(pri))
        .withColumn("pq", expr(s"((dfp + 1) * $Q) div (np + 2)"))
        .withColumn("fq", expr(s"((dff + 1) * $Q) div (nf + 2)"))
        // a quantized prob of 0 (possible once a class outgrows Q docs)
        // is maximally discriminative, not a crash: cap at Q² instead of
        // dividing by zero (ANSI would throw; DuckDB // 0 errors too)
        .withColumn("disc",
          greatest(expr(s"if(fq > 0, (pq * $Q) div fq, ${Q * Q})"),
            expr(s"if(pq > 0, (fq * $Q) div pq, ${Q * Q})")))
        // this window is bounded: it ranks only the ≤V rows picked above
        .withColumn("k", row_number().over(Window.orderBy(desc("disc"), asc("tok"))))
        .filter(col("k") <= K)
        .select(col("tok"), col("pq"), col("fq")).orderBy(col("tok"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      // the oracle's fixed K cross joins produce ZERO rows if fewer than
      // K features exist — refuse the degenerate corpus loudly instead of
      // silently diverging; and the Q >= n+2 bound the quantization needs
      require(feats.length == K,
        s"vocabulary yields only ${feats.length} NB features, need $K")
      dfx.unpersist()
      val nDocs = lab.count()
      require(nDocs + 2 <= Q,
        s"NB quantization Q=$Q must be >= corpus size + 2 (n=$nDocs) — raise Q")
      def score(pc: ((String, Long, Long)) => Long, prior: String) =
        feats.foldLeft(expr(s"CAST(($prior * $Q) div n AS DECIMAL(38,0))")) {
          (acc, f) =>
            (acc * when(array_contains(col("toks"), lit(f._1)), lit(pc(f)))
              .otherwise(lit(Q - pc(f))).cast("decimal(38,0)"))
              .cast("decimal(38,0)")
        }
      lab.crossJoin(broadcast(pri))
        .withColumn("pred", score(_._2, "np") > score(_._3, "nf"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("pass"), 1L).otherwise(0L)).as("n_true_pass"),
          sum(when(col("pred"), 1L).otherwise(0L)).as("n_pred_pass"),
          sum(when(col("pass") === col("pred"), 1L).otherwise(0L)).as("n_correct"))
        .withColumn("accuracy_bp", expr("(n_correct * 10000) div n_docs"))
    }),

    "q73_source_quality_panel" -> ((s, d) => {
      val q = qualityCols
      // spread the compact doc rows before the corpus-wide fan-out map
      // pass (no-op at scale, see operators/Spread)
      graft.operators.Spread.rows(Tables.documents(s, d))
        .select(col("source"), q.nTok.as("nt"), (q.reasons === "").as("ok"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("nt")).as("total_tokens"),
          sum(when(col("ok"), 1L).otherwise(0L)).as("n_pass"))
        .select(col("source"), col("n_docs"), col("total_tokens"), col("n_pass"),
          graft.functions.PortableMath.roundPortable(col("n_pass").cast("double") / col("n_docs"), 4).as("pass_rate"),
          graft.functions.PortableMath.roundPortable(col("total_tokens").cast("double") / col("n_docs"), 2).as("mean_tokens"))
    }),

    // Systematic size-proportional sampling: walk the corpus in doc_id
    // order counting tokens; select every doc whose token interval crosses
    // a multiple of step = total/40 — i.e. inclusion probability
    // proportional to length, zero floats, exactly reproducible. The
    // running count uses the PrefixSum operator (range repartition +
    // per-partition cumsum + broadcast offsets), NOT a partitionless
    // window that would drag the corpus into one task.
    "q74_systematic_sample" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), size(TextHash.tokens(col("text"))).as("nt"))
      val cum = graft.operators.PrefixSum.running(docs, "doc_id", "nt")
      val tot = cum.agg(max(col("cum")).as("total"))
      cum.crossJoin(broadcast(tot))
        .withColumn("step", expr("total div 40")) // `/` on longs is double division
        .filter(col("step") > 0 &&
          expr("(cum - nt) div step") < expr("cum div step"))
        .select(col("doc_id"), col("nt"), col("cum"))
    }),

    // Embedding second-moment (gram) matrix — the whitening/PCA-prep
    // primitive — via ONE custom bounded-buffer aggregate: the upper
    // triangle accumulates map-side in a fixed long[d(d+1)/2] buffer in
    // exact integer micro-units, so the shuffle is one buffer per
    // partition (the relational explode+self-join form ships |vectors|·d²/2
    // product rows). Exact long sums = no accumulation-order dependence.
    "q57_embedding_gram" -> ((s, d) =>
      Tables.embeddings(s, d)
        .select(transform(col("embedding"), x => x.cast("double")).as("v"))
        .agg(graft.functions.GramMatrixAggregate.gramMicro(col("v"), 64).as("g"))
        .select(inline(col("g")))),

    // PCA fit audit (operators/Pca): the float Jacobi eigensolve is not
    // DuckDB-replayable, but everything AROUND it is — per-axis variances
    // n·Σx² − (Σx)² in exact integer micro² units (order-independent long
    // sums, BigInt driver arithmetic; emitted as strings — int128 has no
    // common arrow dtype), the covariance trace, and the eigen-OPTIMALITY
    // property: the top-k eigenvalue mass must dominate the variance of the
    // best k coordinate axes (q32's tolerance-boolean pattern — the oracle
    // re-derives the axis side exactly and asserts the boolean came out
    // TRUE). A broken gram, quantization, or eigensolve flips some column.
    "q93_pca_variance" -> ((s, d) => {
      val dims = 64; val k = 4
      val emb = Tables.embeddings(s, d)
        .select(transform(col("embedding"), x => x.cast("double")).as("v"))
      // ONE distributed pass: the fit's gram diagonal + micro sums ARE the
      // axis-variance moments — no second corpus aggregation
      val (model, mom) = graft.operators.Pca.fitWithMoments(emb, "v", dims, k)
      val n = mom.n
      val axisVars = (0 until dims).map { i =>
        (i, BigInt(n) * BigInt(mom.gramDiagMicro(i)) - BigInt(mom.sumMicro(i)).pow(2))
      }
      val trace = axisVars.map(_._2).sum
      val top = axisVars.sortBy { case (i, v) => (-v, BigInt(i)) }.take(k)
      // population eigenvariance (Jacobi) rescaled to the same n²·micro²
      // units; ≥ holds with strict slack unless the eigenbasis IS the axis
      // basis, which real embeddings never hit — 1e-9 relative absorbs the
      // float eigensolve's residual
      val pcaTop = model.eigenvalues.sum * n.toDouble * n.toDouble * 1e12
      val ok = pcaTop >= top.map(_._2).sum.toDouble * (1 - 1e-9)
      import s.implicits._
      Seq((n, trace.toString, top.map(_._2.toString).mkString(","), ok))
        .toDF("n", "trace_var", "top4_axis_var", "pca_captures_ge_axes")
    }),

    // Deterministic train/val/test split + stratification audit — the
    // last step before data ships to training. The split is a pure
    // function of the id (portable md5 % 100: <80 train, <90 val, else
    // test), so membership is reproducible anywhere, rows never move
    // between splits across reruns, and the oracle replays it exactly.
    // The audit reports the per-split label distribution with a portable-
    // rounded within-split fraction — the balance check a stratified
    // pipeline actually reads.
    "q107_dataset_split" -> ((s, d) => {
      val wsplit = Window.partitionBy(col("split"))
      Tables.embeddings(s, d)
        .select(col("label"),
          (TextHash.md5Long(col("vec_id").cast("string")) % 100).as("bucket"))
        .withColumn("split",
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val").otherwise("test"))
        .groupBy(col("split"), col("label"))
        .agg(count(lit(1)).as("n"))
        .withColumn("frac_of_split", graft.functions.PortableMath
          .roundPortable(col("n").cast("double") / sum(col("n")).over(wsplit), 4))
    }),

    // Cluster-quality audit of the q17 k-means fit: per-cluster member
    // count and within-cluster sum of squares, EXACT in integer micro²
    // units. Composes the oracle-replayed Lloyd fit (KMeansIVF — same
    // sample, same iterations) with a map-side assignment and a per-row
    // exact distance: micro values via the half-away rounding DuckDB's
    // round() computes, squared diffs summed as longs per row (≤ 64·(8e6)²
    // ≈ 4e15, safe), then decimal(38,0) across rows (cluster totals pass
    // int64) emitted as a string — q93's int128-as-VARCHAR pattern. A
    // drifted centroid, flipped assignment, or broken quantization moves
    // some cluster's WCSS and hash-fails.
    "q108_cluster_quality" -> ((s, d) => {
      val nClusters = 10; val iters = 4
      val c = Tables.embeddings(s, d).select(col("vec_id").as("neighbor_id"),
        graft.operators.VectorOps.asDouble(col("embedding")).as("cv"))
      // count-derived modulus (KMeansIVF.sampleModFor): the driver collect
      // stays ≤ 100 rows per corpus whatever the scale factor
      val sampleMod = graft.operators.KMeansIVF.sampleModFor(c.count(), 100L)
      val sample = c
        .filter(pmod(TextHash.md5Long(col("neighbor_id").cast("string")), lit(sampleMod)) === 0)
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      val centroids = graft.operators.KMeansIVF.fit(sample, nClusters, iters)
      val assigned = graft.operators.KMeansIVF.assignBuckets(c, centroids)
      // centroid micro ints are exact by construction (the fit's means are
      // micro-rounded); per-row WCSS selects the assigned centroid's
      // literal array via a when-chain — only the matched branch evaluates
      val xm = transform(col("cv"), x => graft.functions.PortableMath.microHalfAway(x))
      def wcssFor(b: Int): org.apache.spark.sql.Column = {
        val cm = array(centroids(b).map(x => lit(math.round(x * 1e6))): _*)
        aggregate(zip_with(xm, cm, (x, cc) => (x - cc) * (x - cc)),
          lit(0L), (acc, v) => acc + v)
      }
      val perRow = centroids.indices.tail.foldLeft(
        when(col("bucket") === 0, wcssFor(0))) {
        case (acc, b) => acc.when(col("bucket") === b, wcssFor(b))
      }
      assigned
        .select(col("bucket"), perRow.cast("decimal(38,0)").as("sq"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_members"),
          sum(col("sq")).cast("string").as("wcss_micro2"))
    }),

    // Join-cardinality estimation — the optimizer-statistics primitive at
    // sketch cost: |A ⋈ B on k| = Σ_k cntA(k)·cntB(k) is the inner product
    // of the two frequency vectors, and the Count-Min estimate is
    // min_i Σ_cell cmA[i,cell]·cmB[i,cell] — an UPPER bound by
    // construction (collisions only add mass), computed from two bounded
    // 32 KB sketches without ever joining. Both the exact size (hash-agg +
    // key join on the two count vectors) and the estimate (portable-hash
    // cells ⇒ deterministic) are hash-checked; `est_is_upper` is the
    // guarantee surface. A = lineitem partkeys, B = the 'R'-returnflag
    // subset — both sides carry real multiplicity.
    "q99_join_size_estimate" -> ((s, d) => {
      val depth = 4; val width = 1024
      val li = Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_returnflag"),
          TextHash.baseHash(col("l_partkey").cast("string")).as("hp"))
      val a = li
      val b = li.filter(col("l_returnflag") === "R")
      val skA = a.agg(graft.functions.CountMinAggregate
        .countMin(col("hp"), depth, width).as("ca"))
      val skB = b.agg(graft.functions.CountMinAggregate
        .countMin(col("hp"), depth, width).as("cb"))
      val exact = a.groupBy(col("l_partkey")).agg(count(lit(1)).as("na"))
        .join(b.groupBy(col("l_partkey")).agg(count(lit(1)).as("nb")), "l_partkey")
        .agg(sum(col("na") * col("nb")).as("exact_join_size"))
      val rowSums = (0 until depth).map(i =>
        expr(s"aggregate(slice(zip_with(ca, cb, (x, y) -> x * y), ${i * width + 1}, $width), 0L, (acc, v) -> acc + v)"))
      exact.crossJoin(broadcast(skA)).crossJoin(broadcast(skB))
        .select(col("exact_join_size"),
          least(rowSums: _*).as("est_join_size"))
        .withColumn("est_is_upper", col("est_join_size") >= col("exact_join_size"))
    }),

    // Embedding label-quality audit — the "are my labels coherent in
    // embedding space" check run before training on weak labels. Each
    // label's centroid DIRECTION is the component-wise SUM of
    // micro-quantized vectors (cosine is scale-invariant, so the sum IS
    // the mean direction — no division, the sums are exact int64); every
    // vector is scored against all 10 directions via the codegen'd
    // left-to-right double dot (bit-identical to DuckDB's
    // list_cosine_similarity, the q15 precedent), and the per-label
    // report aggregates own-vs-best-foreign margins in exact micro ints.
    // Shape at scale: centroid build is one posexplode + (label,pos)
    // hash-agg (640 output rows); scoring is a broadcast of 10 tiny
    // centroid rows against a linear scan — no shuffle of the corpus.
    "q120_label_margin" -> ((s, d) => {
      val xm = Tables.embeddings(s, d).select(col("vec_id"), col("label"),
        graft.operators.VectorOps.asDouble(col("embedding")).as("v"),
        transform(graft.operators.VectorOps.asDouble(col("embedding")),
          x => graft.functions.PortableMath.microHalfAway(x)).as("vm"))
      val cent = xm
        .select(col("label").as("clabel"), posexplode(col("vm")).as(Seq("pos", "x")))
        .groupBy(col("clabel"), col("pos")).agg(sum(col("x")).as("cx"))
        .groupBy(col("clabel"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("cx")))),
          p => p.getField("cx").cast("double")).as("cv"))
      val scored = xm.crossJoin(broadcast(cent))
        .select(col("vec_id"), col("label"), col("clabel"),
          graft.operators.VectorOps.cosine(col("v"), col("cv")).as("cos"))
      val per = scored.groupBy(col("vec_id"), col("label"))
        .agg(max(when(col("clabel") === col("label"), col("cos"))).as("cos_own"),
          max(when(col("clabel") =!= col("label"), col("cos"))).as("max_foreign"))
      per.groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
          sum((col("max_foreign") > col("cos_own")).cast("long")).as("n_confused"),
          sum(floor((col("cos_own") - col("max_foreign")) * lit(1000000.0) + lit(0.5))
            .cast("long")).as("sum_margin_micro"))
    }),
  )

  val oracle: Map[String, String] = {
    val toksSql = TextHash.tokensSql("text")
    Map(
      // lockstep trial replay: list_min over the same md5 trials, then the
      // deterministic (key, id) order — row_number is the oracle's luxury,
      // the Spark side keeps the bounded TopKByScore shape
      "q114_weighted_sample" -> {
        val rk = graft.operators.WeightedSample.raceKeySql("doc_id::VARCHAR", "weight")
        s"""WITH w AS (SELECT doc_id, 1 + n_chars // 64 AS weight FROM documents),
           |k AS (SELECT doc_id, weight, $rk AS rk FROM w),
           |r AS (SELECT doc_id, weight,
           |        row_number() OVER (ORDER BY rk, doc_id) AS rank FROM k)
           |SELECT doc_id, weight::BIGINT AS weight, rank::INT AS rank
           |FROM r WHERE rank <= 50""".stripMargin
      },

      "q50_repetition_stats" ->
        s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |g AS (SELECT doc_id, len(toks) AS n_tokens, len(list_distinct(toks)) AS n_dist_tok,
           |        ${bigramsSql("toks")} AS grams FROM t),
           |x AS (SELECT doc_id, n_tokens, n_dist_tok, unnest(grams) AS gram FROM g),
           |c AS (SELECT doc_id, n_tokens, n_dist_tok, gram, count(*) AS n
           |      FROM x GROUP BY 1, 2, 3, 4),
           |a AS (SELECT doc_id, n_tokens, n_dist_tok, sum(n) AS total,
           |        count(*) AS n_dist_gram, max(n) AS max_n FROM c GROUP BY 1, 2, 3)
           |SELECT doc_id, n_tokens,
           |  (floor((n_tokens - n_dist_tok)::DOUBLE / n_tokens * 1000 + 0.5) / 1000) AS dup_token_frac,
           |  (floor((total - n_dist_gram)::DOUBLE / total * 1000 + 0.5) / 1000) AS dup_2gram_frac,
           |  (floor(max_n::DOUBLE / total * 1000 + 0.5) / 1000) AS top_2gram_frac
           |FROM a""".stripMargin,

      "q51_quality_filter" ->
        s"""WITH t AS (SELECT doc_id, text IS NULL AS is_null, $toksSql AS toks,
           |  length(regexp_replace(text, '\\s', '', 'g')) AS nonws,
           |  length(regexp_replace(text, '[a-z0-9\\s]', '', 'g')) AS nsym FROM documents),
           |m AS (SELECT doc_id, is_null, len(toks) AS n_tokens, nonws, nsym,
           |  len(list_filter(toks, x -> x IN ($stopSqlList)))::DOUBLE / len(toks) AS stop_ratio,
           |  nonws::DOUBLE / len(toks) AS avg_len,
           |  CASE WHEN nonws > 0 THEN nsym::DOUBLE / nonws ELSE 0 END AS sym_ratio FROM t),
           |r AS (SELECT *, coalesce(array_to_string(list_filter([
           |    CASE WHEN is_null THEN 'null_text' END,
           |    CASE WHEN NOT (n_tokens >= 30 AND n_tokens <= 100000) THEN 'n_tokens' END,
           |    CASE WHEN NOT (avg_len >= 3.0 AND avg_len <= 10.0) THEN 'avg_token_len' END,
           |    CASE WHEN stop_ratio < 0.05 THEN 'stopword_ratio' END,
           |    CASE WHEN sym_ratio > 0.1 THEN 'symbol_ratio' END],
           |    x -> x IS NOT NULL), ','), '') AS fail_reasons FROM m)
           |SELECT doc_id, n_tokens,
           |  (floor(avg_len * 1000 + 0.5) / 1000) AS avg_token_len,
           |  (floor(stop_ratio * 1000 + 0.5) / 1000) AS stopword_ratio,
           |  (floor(sym_ratio * 1000 + 0.5) / 1000) AS symbol_ratio,
           |  fail_reasons = '' AS passes, fail_reasons
           |FROM r""".stripMargin,

      // DuckDB's global-window cumsum is the naive formulation the
      // PrefixSum operator must exactly reproduce
      "q74_systematic_sample" ->
        s"""WITH c AS (SELECT doc_id, len($toksSql) AS nt,
           |        sum(len($toksSql)) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)::BIGINT AS cum
           |      FROM documents),
           |t AS (SELECT max(cum) AS total FROM c)
           |SELECT doc_id, nt::BIGINT AS nt, cum FROM c, t
           |WHERE (total // 40) > 0
           |  AND (cum - nt) // (total // 40) < cum // (total // 40)""".stripMargin,

      "q329_nb_quality_classifier" -> {
        val V = 256; val K = 8; val Q = 10000L
        val fj = (1 to K).map(k =>
          s"CROSS JOIN (SELECT pq, fq, tok FROM feats WHERE k = $k) f$k")
          .mkString("\n  ")
        val sp = (1 to K).map(k =>
          s"(CASE WHEN list_contains(l.toks, f$k.tok) THEN f$k.pq ELSE $Q - f$k.pq END)::HUGEINT")
          .mkString(" * ")
        val sf = (1 to K).map(k =>
          s"(CASE WHEN list_contains(l.toks, f$k.tok) THEN f$k.fq ELSE $Q - f$k.fq END)::HUGEINT")
          .mkString(" * ")
        s"""WITH t AS (SELECT doc_id, source, text IS NULL AS is_null, $toksSql AS toks,
           |  length(regexp_replace(text, '\\s', '', 'g')) AS nonws,
           |  length(regexp_replace(text, '[a-z0-9\\s]', '', 'g')) AS nsym FROM documents),
           |m AS (SELECT doc_id, source, toks, is_null, len(toks) AS n_tokens, nonws, nsym,
           |  len(list_filter(toks, x -> x IN ($stopSqlList)))::DOUBLE / len(toks) AS stop_ratio,
           |  nonws::DOUBLE / len(toks) AS avg_len,
           |  CASE WHEN nonws > 0 THEN nsym::DOUBLE / nonws ELSE 0 END AS sym_ratio FROM t),
           |lab AS (SELECT doc_id, source, list_distinct(toks) AS toks,
           |  NOT (is_null OR NOT (n_tokens >= 30 AND n_tokens <= 100000)
           |     OR NOT (avg_len >= 3.0 AND avg_len <= 10.0)
           |     OR stop_ratio < 0.05 OR sym_ratio > 0.1) AS pass FROM m),
           |dt AS (SELECT doc_id, pass, unnest(toks) AS tok FROM lab),
           |pri2 AS (SELECT count(*)::BIGINT AS n,
           |          sum(CASE WHEN pass THEN 1 ELSE 0 END)::BIGINT AS np,
           |          count(*) - sum(CASE WHEN pass THEN 1 ELSE 0 END) AS nf FROM lab),
           |dfx AS (SELECT tok, count(*)::BIGINT AS df,
           |          sum(CASE WHEN pass THEN 1 ELSE 0 END)::BIGINT AS dfp
           |        FROM dt GROUP BY tok),
           |v0 AS (SELECT tok, dfp, df - dfp AS dff,
           |         row_number() OVER (ORDER BY df DESC, ${TextHash.md5LongSql("tok")}) AS vr FROM dfx),
           |v1 AS (SELECT tok, ((dfp + 1) * $Q) // (np + 2) AS pq,
           |         ((dff + 1) * $Q) // (nf + 2) AS fq
           |       FROM v0, pri2 WHERE vr <= $V),
           |v2 AS (SELECT tok, pq, fq,
           |         greatest(CASE WHEN fq > 0 THEN (pq * $Q) // fq ELSE ${Q * Q} END,
           |                  CASE WHEN pq > 0 THEN (fq * $Q) // pq ELSE ${Q * Q} END) AS disc FROM v1),
           |feats AS (SELECT tok, pq, fq, k FROM (
           |    SELECT tok, pq, fq,
           |      row_number() OVER (ORDER BY disc DESC, tok) AS k FROM v2)
           |  WHERE k <= $K),
           |score AS (SELECT l.doc_id, l.source, l.pass,
           |    ((np * $Q) // n)::HUGEINT * $sp AS sp,
           |    ((nf * $Q) // n)::HUGEINT * $sf AS sf
           |  FROM lab l CROSS JOIN pri2
           |  $fj)
           |SELECT source, count(*)::BIGINT AS n_docs,
           |  sum(CASE WHEN pass THEN 1 ELSE 0 END)::BIGINT AS n_true_pass,
           |  sum(CASE WHEN sp > sf THEN 1 ELSE 0 END)::BIGINT AS n_pred_pass,
           |  sum(CASE WHEN pass = (sp > sf) THEN 1 ELSE 0 END)::BIGINT AS n_correct,
           |  ((sum(CASE WHEN pass = (sp > sf) THEN 1 ELSE 0 END) * 10000) // count(*))::BIGINT AS accuracy_bp
           |FROM score GROUP BY source""".stripMargin
      },

      // same rule CTEs as q51, rolled up by source
      "q73_source_quality_panel" ->
        s"""WITH t AS (SELECT source, $toksSql AS toks,
           |  length(regexp_replace(text, '\\s', '', 'g')) AS nonws,
           |  length(regexp_replace(text, '[a-z0-9\\s]', '', 'g')) AS nsym FROM documents),
           |m AS (SELECT source, len(toks) AS n_tokens,
           |  len(list_filter(toks, x -> x IN ($stopSqlList)))::DOUBLE / len(toks) AS stop_ratio,
           |  nonws::DOUBLE / len(toks) AS avg_len,
           |  CASE WHEN nonws > 0 THEN nsym::DOUBLE / nonws ELSE 0 END AS sym_ratio FROM t),
           |r AS (SELECT source, n_tokens,
           |  (n_tokens >= 30 AND n_tokens <= 100000 AND avg_len >= 3.0 AND avg_len <= 10.0
           |   AND stop_ratio >= 0.05 AND sym_ratio <= 0.1) AS ok FROM m)
           |SELECT source, count(*)::BIGINT AS n_docs, sum(n_tokens)::BIGINT AS total_tokens,
           |  sum(CASE WHEN ok THEN 1 ELSE 0 END)::BIGINT AS n_pass,
           |  (floor(sum(CASE WHEN ok THEN 1 ELSE 0 END)::DOUBLE / count(*) * 10000 + 0.5) / 10000) AS pass_rate,
           |  (floor(sum(n_tokens)::DOUBLE / count(*) * 100 + 0.5) / 100) AS mean_tokens
           |FROM r GROUP BY source""".stripMargin,

      "q295_language_hhi" ->
        """WITH sl AS (SELECT source, lang, count(*)::BIGINT AS c
          |  FROM documents GROUP BY 1, 2)
          |SELECT source, sum(c)::BIGINT AS n_docs, count(*)::BIGINT AS n_langs,
          |  ((sum(c * c) * 1000000) // (sum(c) * sum(c)))::BIGINT AS hhi_ppm
          |FROM sl GROUP BY source""".stripMargin,

      "q286_loso_ablation" ->
        s"""WITH per AS (SELECT source, count(*)::BIGINT AS n,
           |    sum(len($toksSql))::BIGINT AS tok,
           |    sum(CASE WHEN len($toksSql) >= 60 THEN 1 ELSE 0 END)::BIGINT AS pass
           |  FROM documents GROUP BY source),
           |tot AS (SELECT sum(n)::BIGINT AS tn, sum(tok)::BIGINT AS ttok,
           |    sum(pass)::BIGINT AS tpass FROM per)
           |SELECT source, n AS n_docs,
           |  ((ttok - tok) * 100 // (tn - n))::BIGINT AS loso_mean_tok_x100,
           |  ((tpass - pass) * 10000 // (tn - n))::BIGINT AS loso_pass_bp,
           |  ((tpass - pass) * tn > tpass * (tn - n)) AS raises_quality
           |FROM per, tot""".stripMargin,

      "q283_bigram_cv" ->
        s"""WITH t AS (SELECT ${TextHash.md5LongSql("doc_id::VARCHAR")} % 5 AS fold,
           |    $toksSql AS toks FROM documents),
           |sg AS (SELECT fold, ${bigramsSql("toks")} AS grams FROM t),
           |g AS (SELECT fold,
           |    string_split(gram, ' ')[1] AS w1, string_split(gram, ' ')[2] AS w2
           |  FROM (SELECT fold, unnest(grams) AS gram FROM sg) z),
           |cf AS (SELECT fold, w1, w2, count(*)::BIGINT AS c_f FROM g GROUP BY 1, 2, 3),
           |tot AS (SELECT w1, w2, sum(c_f)::BIGINT AS c_tot FROM cf GROUP BY 1, 2),
           |train AS (SELECT fx.f AS fold, tot.w1, tot.w2,
           |    (c_tot - coalesce(cf.c_f, 0))::BIGINT AS c
           |  FROM tot CROSS JOIN (SELECT unnest(range(0, 5)) AS f) fx
           |  LEFT JOIN cf ON cf.fold = fx.f AND cf.w1 = tot.w1 AND cf.w2 = tot.w2),
           |pred AS (SELECT fold, w1, w2 AS pred FROM (
           |    SELECT fold, w1, w2, row_number() OVER (
           |      PARTITION BY fold, w1 ORDER BY c DESC, w2) AS rn
           |    FROM train WHERE c > 0) z WHERE rn = 1),
           |te AS (SELECT g.fold, g.w1, g.w2, pred.pred FROM g
           |  LEFT JOIN pred ON g.fold = pred.fold AND g.w1 = pred.w1),
           |agg AS (SELECT fold, count(*)::BIGINT AS n_test,
           |    sum(CASE WHEN pred IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_covered,
           |    sum(CASE WHEN pred = w2 THEN 1 ELSE 0 END)::BIGINT AS n_correct
           |  FROM te GROUP BY fold)
           |SELECT fold, n_test, n_covered, n_correct,
           |  (CASE WHEN n_covered > 0 THEN (n_correct * 10000) // n_covered
           |        ELSE 0 END)::BIGINT AS acc_bp
           |FROM agg""".stripMargin,

      "q279_bigram_lm_eval" ->
        s"""WITH t AS (SELECT (${TextHash.md5LongSql("doc_id::VARCHAR")} % 5 = 0) AS is_test,
           |    $toksSql AS toks FROM documents),
           |sg AS (SELECT is_test, ${bigramsSql("toks")} AS grams FROM t),
           |g AS (SELECT is_test,
           |    string_split(gram, ' ')[1] AS w1, string_split(gram, ' ')[2] AS w2
           |  FROM (SELECT is_test, unnest(grams) AS gram FROM sg) z),
           |bc AS (SELECT w1, w2, count(*)::BIGINT AS c FROM g WHERE NOT is_test GROUP BY 1, 2),
           |pred AS (SELECT w1, w2 AS pred FROM (
           |    SELECT w1, w2, row_number() OVER (PARTITION BY w1 ORDER BY c DESC, w2) AS rn
           |    FROM bc) z WHERE rn = 1),
           |te AS (SELECT g.w1, g.w2, pred.pred FROM g
           |  LEFT JOIN pred ON g.w1 = pred.w1 WHERE is_test),
           |agg AS (SELECT count(*)::BIGINT AS n_test,
           |    sum(CASE WHEN pred IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_covered,
           |    sum(CASE WHEN pred = w2 THEN 1 ELSE 0 END)::BIGINT AS n_correct
           |  FROM te)
           |SELECT n_test, n_covered, n_correct,
           |  (CASE WHEN n_covered > 0 THEN (n_correct * 10000) // n_covered
           |        ELSE 0 END)::BIGINT AS acc_bp,
           |  ((n_covered * 10000) // n_test)::BIGINT AS coverage_bp
           |FROM agg""".stripMargin,

      "q300_surprisal_quality" ->
        s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |sg AS (SELECT doc_id, ${bigramsSql("toks")} AS grams FROM t),
           |g AS (SELECT doc_id,
           |    string_split(gram, ' ')[1] AS w1, string_split(gram, ' ')[2] AS w2
           |  FROM (SELECT doc_id, unnest(grams) AS gram FROM sg) z),
           |ab AS (SELECT w1, w2, count(*)::BIGINT AS cab FROM g GROUP BY 1, 2),
           |ca AS (SELECT w1, count(*)::BIGINT AS ca FROM g GROUP BY 1),
           |p AS (SELECT doc_id, ((cab * 1000000) // ca)::BIGINT AS ppm
           |      FROM g JOIN ab USING (w1, w2) JOIN ca USING (w1)),
           |per AS (SELECT doc_id, count(*)::BIGINT AS nb, min(ppm) AS min_ppm,
           |    sum(CASE WHEN ppm < 5000 THEN 1 ELSE 0 END)::BIGINT AS n_rare,
           |    list(ppm ORDER BY ppm) AS arr
           |  FROM p GROUP BY doc_id),
           |m AS (SELECT doc_id, nb, min_ppm, n_rare,
           |    (arr[((nb + 1) // 2)::INT] + arr[(nb // 2 + 1)::INT])::BIGINT AS med2
           |  FROM per)
           |SELECT d.doc_id,
           |  coalesce(nb, 0)::BIGINT AS n_bigrams,
           |  coalesce(med2, 0)::BIGINT AS median2_ppm,
           |  coalesce(min_ppm, 0)::BIGINT AS min_ppm,
           |  coalesce(n_rare, 0)::BIGINT AS n_rare,
           |  (coalesce(med2, 0) >= 68000 AND
           |   coalesce(min_ppm, 0) >= 10000) AS keep
           |FROM documents d LEFT JOIN m ON d.doc_id = m.doc_id""".stripMargin,

      "q304_hbos_outliers" ->
        """WITH ex AS (SELECT vec_id, unnest(range(0, len(embedding))) AS dim,
          |    CAST(round(unnest(embedding::DOUBLE[]) * 1000000) AS BIGINT) AS x
          |  FROM embeddings),
          |st AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM ex GROUP BY dim),
          |b AS (SELECT vec_id, ex.dim, ((x - mn) * 16) // (mx - mn + 1) AS bin
          |      FROM ex JOIN st ON ex.dim = st.dim),
          |c AS (SELECT dim, bin, count(*)::BIGINT AS cnt FROM b GROUP BY 1, 2)
          |SELECT vec_id, min(cnt)::BIGINT AS min_density,
          |  sum(CASE WHEN cnt <= 5 THEN 1 ELSE 0 END)::BIGINT AS n_sparse,
          |  (sum(CASE WHEN cnt <= 5 THEN 1 ELSE 0 END) >= 3 OR min(cnt) <= 1) AS outlier
          |FROM b JOIN c ON b.dim = c.dim AND b.bin = c.bin
          |GROUP BY vec_id""".stripMargin,

      "q309_padding_waste" ->
        s"""WITH t AS (SELECT len($toksSql)::BIGINT AS n FROM documents),
           |x AS (SELECT n, unnest([128, 256, 512])::BIGINT AS max_len FROM t),
           |g AS (SELECT max_len, count(*)::BIGINT AS n_docs,
           |    sum(n)::BIGINT AS total_tokens,
           |    sum((n + max_len - 1) // max_len)::BIGINT AS n_seqs
           |  FROM x GROUP BY max_len)
           |SELECT max_len, n_docs, total_tokens, n_seqs,
           |  (n_seqs * max_len - total_tokens)::BIGINT AS padding_tokens,
           |  (((n_seqs * max_len - total_tokens) * 10000) // (n_seqs * max_len))::BIGINT
           |    AS waste_bp
           |FROM g""".stripMargin,

      "q305_readability" ->
        s"""WITH t AS (SELECT doc_id,
           |    len($toksSql)::BIGINT AS n_words,
           |    greatest(len(regexp_extract_all(text, '[.!?]+'))::BIGINT, 1) AS n_sentences,
           |    len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT AS n_syllables
           |  FROM documents),
           |f AS (SELECT doc_id, n_words, n_sentences, n_syllables,
           |    (206835 - (1015000 * n_words) // n_sentences
           |       - (84600000 * n_syllables) // n_words)::BIGINT AS fre_milli
           |  FROM t WHERE n_words > 0)
           |SELECT doc_id, n_words, n_sentences, n_syllables, fre_milli,
           |  (CASE WHEN fre_milli >= -155000000 THEN 'easy'
           |        WHEN fre_milli >= -199000000 THEN 'standard'
           |        ELSE 'hard' END) AS band
           |FROM f""".stripMargin,

      "q314_kneser_ney" ->
        s"""WITH t AS (SELECT $toksSql AS toks FROM documents),
           |g AS (SELECT ${bigramsSql("toks")} AS grams FROM t),
           |b0 AS (SELECT unnest(grams) AS gram FROM g),
           |bi AS (SELECT string_split(gram, ' ')[1] AS w1,
           |    string_split(gram, ' ')[2] AS w2, count(*)::BIGINT AS cab
           |  FROM b0 GROUP BY 1, 2),
           |ca AS (SELECT w1, sum(cab)::BIGINT AS ca,
           |    count(*)::BIGINT AS n_follow FROM bi GROUP BY 1),
           |np AS (SELECT w2, count(*)::BIGINT AS n_prec FROM bi GROUP BY 1),
           |dt AS (SELECT count(*)::BIGINT AS d_types FROM bi)
           |SELECT w1, w2, cab, ca, n_follow, n_prec, d_types,
           |  ((d_types::HUGEINT * greatest(2 * cab - 1, 0)
           |    + n_follow::HUGEINT * n_prec) * 1000000
           |   // (ca::HUGEINT * 2 * d_types))::BIGINT AS p_kn_micro
           |FROM bi JOIN ca USING (w1) JOIN np USING (w2), dt
           |ORDER BY cab DESC, w1, w2 LIMIT 30""".stripMargin,

      "q53_bigram_lift" ->
        s"""WITH t AS (SELECT $toksSql AS toks FROM documents),
           |u AS (SELECT unnest(toks) AS w FROM t),
           |uc AS (SELECT w, count(*)::BIGINT AS cw FROM u GROUP BY w),
           |g AS (SELECT ${bigramsSql("toks")} AS grams FROM t),
           |b0 AS (SELECT unnest(grams) AS gram FROM g),
           |bc AS (SELECT string_split(gram, ' ')[1] AS w1, string_split(gram, ' ')[2] AS w2,
           |        count(*)::BIGINT AS cab FROM b0 GROUP BY 1, 2),
           |tu AS (SELECT sum(cw)::BIGINT AS total_uni FROM uc),
           |tb AS (SELECT sum(cab)::BIGINT AS total_bi FROM bc),
           |l AS (SELECT w1, w2, cab,
           |        (cab::DOUBLE * total_uni * total_uni) /
           |        (a.cw::DOUBLE * b.cw * total_bi) AS lift
           |      FROM bc JOIN uc a ON bc.w1 = a.w JOIN uc b ON bc.w2 = b.w, tu, tb
           |      WHERE cab >= 5)
           |SELECT w1, w2, cab, (floor(lift * 1000 + 0.5) / 1000) AS lift FROM l
           |ORDER BY (floor(lift * 1000 + 0.5) / 1000) DESC, w1, w2 LIMIT 20""".stripMargin,

      // full sketch replay: per-row cell counts rebuilt with the same
      // portable permutations; estimates join each token to its 4 cells
      "q63_count_min" -> {
        val w = 1024
        val cellCtes = (0 until 4).map(i =>
          s"c$i AS (SELECT ${TextHash.permSql("hp", i)} % $w AS cell, count(*)::BIGINT AS n " +
            "FROM h GROUP BY 1)").mkString(",\n|")
        val joins = (0 until 4).map(i =>
          s"JOIN c$i ON ${TextHash.permSql("ex.hp", i)} % $w = c$i.cell").mkString("\n|")
        s"""WITH tk AS (SELECT unnest(${TextHash.tokensSql("text")}) AS t FROM documents),
           |h AS (SELECT t, ${TextHash.baseHashSql("t")} AS hp FROM tk),
           |ex AS (SELECT t, min(hp) AS hp, count(*)::BIGINT AS exact_n FROM h GROUP BY t),
           |$cellCtes
           |SELECT ex.t, ex.exact_n, least(c0.n, c1.n, c2.n, c3.n) AS cms_n
           |FROM ex
           |$joins""".stripMargin
      },

      // parallel unnests zip; products in exact integer micro-units match
      // the aggregate's long arithmetic bit-for-bit
      "q57_embedding_gram" ->
        """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          |x AS (SELECT vec_id, CAST(round(unnest(v) * 1000000) AS BIGINT) AS xm,
          |        unnest(range(0, len(v))) AS i FROM e),
          |p AS (SELECT a.i::INT AS i, b.i::INT AS j, sum(a.xm * b.xm)::BIGINT AS v_mu
          |      FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
          |      GROUP BY 1, 2)
          |SELECT i, j, v_mu FROM p""".stripMargin,

      // exact integer replay of the axis-variance side; the boolean is the
      // q32 pattern — TRUE asserted, engine must agree
      "q93_pca_variance" ->
        """WITH e AS (SELECT list_transform(embedding::DOUBLE[],
          |        x -> CAST(round(x * 1000000) AS BIGINT)) AS v FROM embeddings),
          |d AS (SELECT unnest(range(1, len(v) + 1)) AS i, unnest(v) AS x FROM e),
          |s AS (SELECT i, count(*) AS n, sum(x)::HUGEINT AS sm, sum(x * x)::HUGEINT AS q
          |      FROM d GROUP BY i),
          |a AS (SELECT i, (n::HUGEINT * q - sm * sm) AS av, n FROM s)
          |SELECT max(n)::BIGINT AS n,
          |  sum(av)::VARCHAR AS trace_var,
          |  array_to_string(list_slice(list(av::VARCHAR ORDER BY av DESC, i), 1, 4), ',')
          |    AS top4_axis_var,
          |  TRUE AS pca_captures_ge_axes
          |FROM a""".stripMargin,

      // the shared Lloyd-replay prefix (sample → unrolled fit → assignment)
      // + exact micro² distance sums; sum(BIGINT) is HUGEINT, emitted as
      // VARCHAR to match the Spark side's decimal-as-string
      "q108_cluster_quality" -> {
        val prefix = graft.operators.KMeansIVF.fitReplayCtes(
          "embeddings", "vec_id", "embedding", nClusters = 10, iters = 4, sampleCap = 100)
        s"""${prefix}xm AS (SELECT bucket, CAST(round(unnest(cv2) * 1000000) AS BIGINT) AS x,
           |        unnest(range(1, len(cv2) + 1)) AS pos FROM assigned),
           |cm AS (SELECT cid AS bucket, CAST(round(unnest(cv) * 1000000) AS BIGINT) AS cc,
           |        unnest(range(1, len(cv) + 1)) AS pos FROM c4),
           |dd AS (SELECT xm.bucket, (x - cc) AS df FROM xm JOIN cm
           |       ON xm.bucket = cm.bucket AND xm.pos = cm.pos),
           |nn AS (SELECT bucket, count(*) AS n_members FROM assigned GROUP BY bucket)
           |SELECT dd.bucket, n_members, sum(df * df)::VARCHAR AS wcss_micro2
           |FROM dd JOIN nn ON dd.bucket = nn.bucket
           |GROUP BY dd.bucket, n_members""".stripMargin
      },

      // centroid sums replayed with parallel unnests (exact int64), then
      // DuckDB's own list_cosine_similarity — bit-identical to the
      // Spark-side dot/norm fold (q15 precedent); margins floor-rounded
      // to micro ints so the per-label sums hash-compare exactly
      "q120_label_margin" ->
        """WITH xm AS (SELECT vec_id, label, embedding::DOUBLE[] AS v,
          |        list_transform(embedding::DOUBLE[],
          |          x -> CAST(round(x * 1000000) AS BIGINT)) AS vm
          |      FROM embeddings),
          |px AS (SELECT label AS clabel, unnest(vm) AS x,
          |        unnest(range(0, len(vm))) AS pos FROM xm),
          |cs AS (SELECT clabel, pos, sum(x)::BIGINT AS cx FROM px GROUP BY clabel, pos),
          |cent AS (SELECT clabel, list(cx::DOUBLE ORDER BY pos) AS cv FROM cs GROUP BY clabel),
          |scored AS (SELECT vec_id, label, clabel,
          |        list_cosine_similarity(v, cv) AS cos FROM xm, cent),
          |per AS (SELECT vec_id, label,
          |         max(CASE WHEN clabel = label THEN cos END) AS cos_own,
          |         max(CASE WHEN clabel <> label THEN cos END) AS max_foreign
          |        FROM scored GROUP BY vec_id, label)
          |SELECT label, count(*)::BIGINT AS n_vecs,
          |  sum((max_foreign > cos_own)::BIGINT)::BIGINT AS n_confused,
          |  sum(CAST(floor((cos_own - max_foreign) * 1000000 + 0.5) AS BIGINT))::BIGINT
          |    AS sum_margin_micro
          |FROM per GROUP BY label""".stripMargin,

      "q107_dataset_split" -> {
        val h = TextHash.md5LongSql("vec_id::VARCHAR")
        s"""WITH b AS (SELECT label, ($h) % 100 AS bucket FROM embeddings),
           |sp AS (SELECT label, CASE WHEN bucket < 80 THEN 'train'
           |        WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split FROM b),
           |g AS (SELECT split, label, count(*) AS n FROM sp GROUP BY 1, 2)
           |SELECT split, label, n,
           |  floor(n::DOUBLE / (sum(n) OVER (PARTITION BY split)) * 10000 + 0.5) / 10000
           |    AS frac_of_split
           |FROM g""".stripMargin
      },

      // both sketches' cells rebuilt with the portable permutations (the
      // q63 replay, twice); the estimate and even the upper-bound boolean
      // are COMPUTED on both engines — no tolerance, no literal TRUE
      "q99_join_size_estimate" -> {
        val w = 1024
        val cellA = (0 until 4).map(i =>
          s"a$i AS (SELECT ${TextHash.permSql("hp", i)} % $w AS cell, count(*)::BIGINT AS n FROM ha GROUP BY 1)")
          .mkString(",\n|")
        val cellB = (0 until 4).map(i =>
          s"b$i AS (SELECT ${TextHash.permSql("hp", i)} % $w AS cell, count(*)::BIGINT AS n FROM hb GROUP BY 1)")
          .mkString(",\n|")
        val est = (0 until 4).map(i =>
          s"(SELECT coalesce(sum(a$i.n * b$i.n), 0)::BIGINT FROM a$i JOIN b$i ON a$i.cell = b$i.cell)")
          .mkString("least(", ", ", ")")
        s"""WITH ha AS (SELECT ${TextHash.baseHashSql("l_partkey::VARCHAR")} AS hp FROM lineitem),
           |hb AS (SELECT ${TextHash.baseHashSql("l_partkey::VARCHAR")} AS hp FROM lineitem
           |       WHERE l_returnflag = 'R'),
           |$cellA,
           |$cellB,
           |ex AS (SELECT sum(na * nb)::BIGINT AS exact_join_size FROM
           |    (SELECT l_partkey, count(*) AS na FROM lineitem GROUP BY 1) x
           |  JOIN (SELECT l_partkey, count(*) AS nb FROM lineitem
           |        WHERE l_returnflag = 'R' GROUP BY 1) y USING (l_partkey))
           |SELECT exact_join_size, $est AS est_join_size,
           |  ($est >= exact_join_size) AS est_is_upper FROM ex""".stripMargin
      },

      "q56_stratified_sample" -> {
        val h = TextHash.md5LongSql("doc_id::VARCHAR")
        s"""WITH h AS (SELECT source, doc_id, ($h) % 1099511627776 AS hv FROM documents),
           |r AS (SELECT source, doc_id,
           |        row_number() OVER (PARTITION BY source ORDER BY hv, doc_id) AS rank
           |      FROM h)
           |SELECT source, doc_id, rank::INT AS rank FROM r WHERE rank <= 5""".stripMargin
      },

      "q54_source_mix" ->
        s"""WITH per AS (SELECT source, count(*)::BIGINT AS n_docs,
          |        sum(len($toksSql))::BIGINT AS n_tokens
          |      FROM documents GROUP BY source),
          |tot AS (SELECT sum(n_tokens)::BIGINT AS total_tokens, count(*)::BIGINT AS n_sources FROM per),
          |w AS (SELECT per.*, total_tokens, n_sources,
          |        floor(total_tokens * 0.8)::BIGINT AS b,
          |        row_number() OVER (ORDER BY n_tokens, source) AS i,
          |        sum(n_tokens) OVER (ORDER BY n_tokens, source ROWS UNBOUNDED PRECEDING) AS cum
          |      FROM per, tot),
          |f AS (SELECT *, n_tokens * (n_sources - i + 1) <= b - (cum - n_tokens) AS funded FROM w),
          |gl AS (SELECT *,
          |        sum(CASE WHEN funded THEN n_tokens ELSE 0 END) OVER () AS s,
          |        sum(CASE WHEN funded THEN 1 ELSE 0 END) OVER () AS nf FROM f)
          |SELECT source, n_docs, n_tokens, funded,
          |  (floor((CASE WHEN funded THEN n_tokens::DOUBLE
          |             ELSE (b - s)::DOUBLE / (n_sources - nf) END) * 100 + 0.5) / 100) AS alloc_tokens,
          |  (floor((CASE WHEN funded THEN 1.0
          |             ELSE ((b - s)::DOUBLE / (n_sources - nf)) / n_tokens END) * 10000 + 0.5) / 10000) AS keep_frac
          |FROM gl""".stripMargin,

      "q235_sequence_packing" ->
        s"""WITH dd AS (SELECT doc_id, len($toksSql)::BIGINT AS nt FROM documents),
           |c AS (SELECT doc_id, nt,
           |        (sum(nt) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING))::BIGINT AS cum
           |      FROM dd)
           |SELECT doc_id, nt AS n_tokens,
           |  ((cum - nt) // 512)::BIGINT AS first_seq,
           |  ((cum - 1) // 512)::BIGINT AS last_seq,
           |  ((cum - nt) % 512)::BIGINT AS start_off
           |FROM c WHERE nt > 0""".stripMargin,

      "q230_temperature_mix" ->
        s"""WITH docs AS (SELECT doc_id, source,
           |    (${TextHash.md5LongSql("doc_id::VARCHAR")}) % 1099511627776 AS h FROM documents),
           |per AS (SELECT source, count(*)::BIGINT AS n_docs,
           |    CAST(floor(sqrt(count(*))) AS BIGINT) AS w FROM docs GROUP BY source),
           |tot AS (SELECT sum(w)::BIGINT AS tw FROM per),
           |q AS (SELECT source, n_docs, w, ((1000 * w) // tw)::BIGINT AS quota
           |  FROM per, tot),
           |r AS (SELECT doc_id, source,
           |    row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
           |  FROM docs),
           |sm AS (SELECT source, count(*)::BIGINT AS n_sampled,
           |    sum(doc_id)::BIGINT AS sample_id_sum
           |  FROM r JOIN q USING (source) WHERE rn <= quota GROUP BY source)
           |SELECT q.source, n_docs, w AS weight, quota,
           |  coalesce(n_sampled, 0)::BIGINT AS n_sampled,
           |  coalesce(sample_id_sum, 0)::BIGINT AS sample_id_sum
           |FROM q LEFT JOIN sm ON sm.source = q.source""".stripMargin,
    )
  }
}
