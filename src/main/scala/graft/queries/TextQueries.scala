package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextHash
import graft.operators.{Dsir, Multimodal, Sessionize}

/** Extension surface: text analysis, sessionization, multimodal metadata —
  * the per-document / per-event operators of a training-data pipeline. All
  * are single-pass column math or one-shuffle aggregations.
  */
object TextQueries {

  private val stopwords = Seq("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")
  private def stopSqlList = stopwords.map(w => s"'$w'").mkString(", ")

  // language marker words for the n-gram-free heuristic language ID
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "es" -> Seq("el", "los", "de", "que"),
    "fr" -> Seq("le", "les", "et", "une"),
    "de" -> Seq("der", "die", "und", "das"))

  /** BPE-ish pre-tokenizer: letter runs, single digits, single punctuation. */
  private val bpePattern = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]"

  /** The q214 hashed-classifier score, shared verbatim by its two audit
    * queries (q215 AUC, q216 calibration) — one definition so the three
    * can never drift apart. token → md5 bucket (4096) → integer weight in
    * [-1000, 1000]; the whole score is one map-side fold. */
  private def classifierScore(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val toks = TextHash.tokens(text)
    def weight(t: org.apache.spark.sql.Column) = {
      val bucket = TextHash.md5Long(t) % 4096
      TextHash.md5Long(concat(lit("w:"), bucket.cast("string"))) % 2001 - 1000
    }
    aggregate(transform(toks, weight(_)), lit(0L), (acc, x) => acc + x)
  }

  /** DuckDB replay of the per-token classifier weight (over a lambda
    * variable named `t`). */
  private def classifierWSql: String =
    "(" + TextHash.md5LongSql(
      s"'w:' || (${TextHash.md5LongSql("t")} % 4096)::VARCHAR") + " % 2001 - 1000)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Quality scoring: token stats + stopword density -> composite score.
    // Ratio columns use PORTABLE rounding (floor(x·1000 + 0.5)/1000): the
    // engines' round() differ at exact .5 decimal boundaries (Spark rounds
    // the shortest-decimal string, DuckDB the binary double) — at sf0.1 a
    // quality_score landed on 0.5075 and split 0.508 vs 0.507. floor and
    // IEEE multiply/divide are bit-identical everywhere.
    "q18_text_stats" -> ((s, d) => {
      def r3(c: org.apache.spark.sql.Column) = floor(c * 1000 + 0.5) / 1000
      val toks = TextHash.tokens(col("text"))
      val nTok = size(toks)
      val nonWs = length(regexp_replace(col("text"), "\\s", ""))
      val nStop = size(filter(toks, t => t.isin(stopwords: _*)))
      val stopRatio = nStop.cast("double") / nTok
      val avgLen = nonWs.cast("double") / nTok
      val score = least(lit(1.0), nTok.cast("double") / 100.0) * 0.5 +
        stopRatio * 0.3 + least(lit(1.0), avgLen / 8.0) * 0.2
      Tables.documents(s, d).select(
        col("doc_id"), nTok.as("n_tokens"),
        nonWs.cast("long").as("n_nonws_chars"),
        r3(avgLen).as("avg_token_len"),
        r3(stopRatio).as("stopword_ratio"),
        r3(score).as("quality_score"))
    }),

    // Heuristic language ID by marker-word hits, deterministic tie-break.
    "q19_lang_id" -> ((s, d) => {
      val toks = TextHash.tokens(lower(col("text")))
      val hits = langMarkers.map { case (lang, ms) =>
        lang -> size(filter(toks, t => t.isin(ms: _*)))
      }.toMap
      val pred = when(hits("en") >= greatest(hits("es"), hits("fr"), hits("de")), "en")
        .when(hits("es") >= greatest(hits("fr"), hits("de")), "es")
        .when(hits("fr") >= hits("de"), "fr")
        .otherwise("de")
      // spread the compact doc rows before the corpus-wide fan-out map
      // pass (no-op at scale, see operators/Spread)
      graft.operators.Spread.rows(Tables.documents(s, d)).select(
        col("doc_id"), pred.as("lang_pred"),
        greatest(hits("en"), hits("es"), hits("fr"), hits("de")).as("marker_hits"))
    }),

    // LANGUAGE-CONSISTENCY audit — the mislabeled-data check a corpus
    // curator runs before trusting per-language slices: q19's marker
    // classifier vs the DECLARED lang column, as a per-source confusion
    // census. Declared 'zh' is outside the classifier's domain, so those
    // rows are structural mismatches — exactly what the audit should
    // surface (a slice the heuristic cannot vouch for). One row per
    // (source, declared, predicted) cell, each carrying its source's doc
    // count and exact mismatch bp.
    "q352_lang_consistency" -> ((s, d) => {
      val toks = TextHash.tokens(lower(col("text")))
      val hits = langMarkers.map { case (lang, ms) =>
        lang -> size(filter(toks, t => t.isin(ms: _*)))
      }.toMap
      val predExpr = when(hits("en") >= greatest(hits("es"), hits("fr"), hits("de")), "en")
        .when(hits("es") >= greatest(hits("fr"), hits("de")), "es")
        .when(hits("fr") >= hits("de"), "fr")
        .otherwise("de")
      // spread the compact doc rows before the corpus-wide fan-out map
      // pass (no-op at scale, see operators/Spread)
      val pred = graft.operators.Spread.rows(Tables.documents(s, d))
        .select(col("source"), col("lang"), predExpr.as("lang_pred"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cells = pred.groupBy(col("source"), col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("n"))
      val per = pred.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("lang") =!= col("lang_pred"), 1L).otherwise(0L))
            .as("n_mismatch"))
      cells.join(per, "source")
        .select(col("source"), col("lang"), col("lang_pred"), col("n"),
          col("n_docs"),
          expr("(n_mismatch * 10000) div n_docs").as("src_mismatch_bp"))
    }),

    // DSIR importance selection (Xie et al. 2023): hashed-unigram-bucket
    // log-likelihood-ratio scores against a target domain (declared-English
    // docs), integer milli-log2 LUT so every score is hash-exact, top-64
    // most target-like docs via TakeOrdered (map-side partial top-k — no
    // global sort materializes). The canonical "filter 100 TB of web text
    // toward a small high-quality target" curation operator.
    "q355_dsir_selection" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val lut = Dsir.bucketLut(docs, col("lang") === "en", col("text"), 512)
      Dsir.scored(docs, lut, "doc_id", col("text"), 512)
        .join(docs.select(col("doc_id"), col("lang"), col("source")), "doc_id")
        .orderBy(desc("dsir_mllr"), asc("doc_id"))
        .limit(64)
        .select(col("doc_id"), col("lang"), col("source"),
          col("n_tok"), col("dsir_mllr"))
    }),

    // The DSIR panel a curator reads before fixing a source mix: per
    // source, exact integer mllr mass and the share of docs scoring
    // target-positive — "which sources look like my target domain".
    // Same LUT as q355; one extra source-grain aggregation.
    "q359_dsir_source_panel" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val lut = Dsir.bucketLut(docs, col("lang") === "en", col("text"), 512)
      Dsir.scored(docs, lut, "doc_id", col("text"), 512)
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("dsir_mllr")).as("sum_mllr"),
          sum(when(col("dsir_mllr") > 0, 1L).otherwise(0L)).as("n_positive"))
        .withColumn("pos_bp", expr("(n_positive * 10000) div n_docs"))
    }),

    // Token counting: whitespace tokens + BPE-ish regex tokens.
    "q20_token_count" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        size(TextHash.tokens(col("text"))).as("ws_tokens"),
        regexp_count(col("text"), lit(bpePattern)).as("bpe_tokens"),
        length(col("text")).as("n_chars_calc"))),

    // Fingerprinting: whole-doc hash + min rolling 8-gram hash (winnowing).
    "q21_doc_fingerprint" -> ((s, d) => {
      val norm = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
      Tables.documents(s, d).select(
        col("doc_id"),
        TextHash.md5Long(norm).as("fingerprint"),
        // fused native form of array_min(transform(charShinglesStrided(..)))
        graft.functions.VectorExpressions.minRollingMd5(norm, 8, 4).as("fp_rolling_min"))
    }),

    // Dictionary PII scrub: word-boundary blocklist detection + redaction.
    // (The corpus has no pattern-shaped PII — emails/phones — so the
    // dictionary form is exercised; a production blocklist drops in as the
    // same alternation, and pattern classes are just more branches.) Pure
    // map-side regex — one pass, no shuffle, trivially partition-parallel.
    "q79_pii_redaction" -> ((s, d) => {
      val pat = "\\b(customer|key|value)\\b"
      Tables.documents(s, d).select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(pat), lit(0))).as("n_pii"),
        regexp_replace(col("text"), pat, "[PII]").as("redacted"))
        .withColumn("red_len", length(col("redacted")))
    }),

    // Sessionization: 30-minute inactivity gap per user.
    "q22_sessionize" -> ((s, d) => Sessionize.batch(Tables.events(s, d))),

    // Top-k aggregation over the event stream.
    // Exact-cents sum (2-decimal inputs): order-independent long sum, one
    // final division — the top-20 cutoff and the hash both see identical
    // doubles on either engine.
    "q23_top_users_by_value" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg((sum(round(col("value") * 100).cast("long")).cast("double") / 100)
          .as("total_value"), count(lit(1)).as("n_events"))
        .orderBy(desc("total_value"), asc("user_id"))
        .limit(20)),

    // Multimodal with a REAL decoder (round-7): construct genuine binary
    // P6 PPM payloads (header values derived from the text length), then
    // PARSE them byte-by-byte with Multimodal.PpmDecoder inside the
    // batched mapPartitions seam. The oracle replays only the payload
    // CONSTRUCTION arithmetic — it never sees the bytes — so the hash
    // match proves the parser recovers width/height/frames/byte-count
    // from the actual payload.
    "q24_media_meta" -> ((s, d) =>
      Multimodal.withMediaMeta(
        Tables.documents(s, d)
          .select(col("doc_id"),
            Multimodal.ppmPayload(octet_length(col("text"))).as("payload")),
        "payload", Multimodal.PpmDecoder)
        .select(col("doc_id"),
          col("media_meta.byte_len").as("byte_len"),
          col("media_meta.width").as("width"),
          col("media_meta.height").as("height"),
          col("media_meta.frames").as("frames"))),

    // Multimodal PATCH POOLING on REAL decoded pixels — the ViT
    // preprocessing shape (decode → 2×2 patch grid → pooled intensity):
    // payloads carry TEXTURED pixels (byte i = 97 + i mod 26), the
    // decoder parses the actual bytes, and per-patch integer sums ride
    // out as CSV. The oracle replays the construction arithmetic only —
    // it never sees a byte — so the hash match proves the pixel path
    // (header offset, frame-1 slice, patch geometry incl. ragged edges)
    // reads the payload correctly. Batched mapPartitions seam, map-side
    // only.
    "q272_patch_pool" -> ((s, d) =>
      Multimodal.withPatchSums(
        Tables.documents(s, d)
          .select(col("doc_id"),
            Multimodal.ppmPayloadTextured(octet_length(col("text"))).as("payload")),
        "payload", pw = 2, ph = 2)
        .select(col("doc_id"), col("width"), col("height"),
          col("n_patches"), col("patch_sums"), col("total_sum"))),

    // Multimodal frame sampling: every 4th frame index of each decoded
    // video payload fans out to its own row (the batch shape a frame-
    // extraction stage feeds to a vision encoder), tagged with a
    // deterministic per-frame signature. The frame count comes from the
    // REAL PpmDecoder parse of the constructed payload (q24's setup); the
    // explode multiplies rows ~frames/4× with no shuffle.
    "q60_frame_sample" -> ((s, d) =>
      Multimodal.withMediaMeta(
        Tables.documents(s, d)
          .select(col("doc_id"),
            Multimodal.ppmPayload(octet_length(col("text"))).as("payload")),
        "payload", Multimodal.PpmDecoder)
        .select(col("doc_id"), col("media_meta.frames").as("frames"))
        .select(col("doc_id"), col("frames"),
          explode(sequence(lit(0), col("frames") - 1, lit(4))).as("frame_idx"))
        .withColumn("frame_sig", TextHash.md5Long(
          concat(col("doc_id").cast("string"), lit(":"), col("frame_idx").cast("string"))))),

    // Hashed-bag-of-words LINEAR quality classifier — the fastText-style
    // scorer the real pipelines run per document, with deterministic
    // integer weights so the score is exact: token → md5 bucket (4096),
    // bucket → weight in [-1000, 1000] derived from md5("w:" + bucket).
    // The whole score is ONE map-side higher-order fold (no explode, no
    // shuffle — at 100 TB this is a pure scan stage); DuckDB replays the
    // identical hash chain per token.
    "q214_hashed_classifier" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
          size(TextHash.tokens(col("text"))).as("n_tokens"),
          classifierScore(col("text")).as("score"))
        .withColumn("keep", col("score") > 0)),

    // Exact tie-corrected Mann–Whitney AUC of the q214 classifier score
    // against a deterministic relevance label (≥ 60 ws-tokens) — THE
    // ranking metric of a filtering pipeline. The textbook sort-based
    // formulation needs a global rank of every document; here ranks live
    // on the distinct-SCORE relation instead (bounded by the score
    // DOMAIN — per-token weights in [-1000,1000] — independent of corpus
    // size): groupBy(score) counts, distributed PrefixSum for the
    // exclusive prefix C, then the midrank identity
    // 2·Σ_pos rank = Σ_g p_g·(2C_g + m_g + 1). Sums ride decimal(38,0)
    // (rank-sums are O(n²) — int64 dies near 3e9 docs), so 2U is exact
    // at any scale and hash-checked as a string next to the
    // portable-rounded AUC ratio (q154's HUGEINT⇔decimal discipline).
    "q215_auc_exact" -> ((s, d) => {
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val scored = Tables.documents(s, d).select(
        classifierScore(col("text")).as("score"),
        (size(TextHash.tokens(col("text"))) >= 60).cast("long").as("pos"))
      val grp = scored.groupBy(col("score"))
        .agg(count(lit(1)).as("m"), sum(col("pos")).as("p"))
      val cum = graft.operators.PrefixSum.running(grp, "score", "m", "cm")
      cum.select(col("p"), col("m"), (col("cm") - col("m")).as("c"))
        .agg(sum(col("p")).as("n_pos"), sum(col("m")).as("n_all"),
          sum(dec(col("p")) * dec(lit(2L) * col("c") + col("m") + 1)).as("r2"))
        .select(col("n_pos"), (col("n_all") - col("n_pos")).as("n_neg"),
          (col("r2") - dec(col("n_pos")) * (dec(col("n_pos")) + 1)).as("u2"))
        .select(col("n_pos"), col("n_neg"), col("u2").cast("string").as("u2_str"),
          graft.functions.PortableMath.roundPortable(
            col("u2").cast("double") /
              (lit(2.0) * col("n_pos").cast("double") * col("n_neg").cast("double")),
            4).as("auc"))
    }),

    // VOCABULARY GROWTH curve (Heaps' law) — how fast the distinct-token
    // vocabulary grows as the corpus is ingested in doc-id order, the
    // stats a tokenizer/vocab budget is sized from. Key idea: a token's
    // contribution to the curve is fully determined by its FIRST
    // occurrence, so one (token → min doc_id) aggregate collapses the
    // corpus to vocabulary-size rows, each binned to the decile of the
    // id range where it first appeared; the curve is then a cumsum over
    // TEN rows. Token volume per decile rides the same shape. Exact
    // integers throughout; type-token ratio in ppm via portable div.
    "q259_vocab_growth" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), TextHash.tokens(col("text")).as("toks"))
        .persist() // token volume + first-occurrence explode
      val n = docs.agg((max(col("doc_id")) + 1).as("idspan"))
      def decileOf(idCol: Column): Column =
        least(expr(s"${idCol.toString()} * 10 div idspan"), lit(9L))
      val docDec = docs.crossJoin(n)
        .select(decileOf(col("doc_id")).as("decile"),
          size(col("toks")).cast("long").as("ntok"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("docs"), sum(col("ntok")).as("tok"))
      val vocabDec = docs.select(col("doc_id"), explode(col("toks")).as("t"))
        .groupBy(col("t")).agg(min(col("doc_id")).as("first_id"))
        .crossJoin(n)
        .select(decileOf(col("first_id")).as("decile"))
        .groupBy(col("decile")).agg(count(lit(1)).as("vocab"))
      val w = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow) // 10 rows
      docDec.join(vocabDec, Seq("decile"), "left")
        .select(col("decile"), col("docs"), col("tok"),
          coalesce(col("vocab"), lit(0L)).as("vocab"))
        .select(col("decile"),
          sum(col("docs")).over(w).as("cum_docs"),
          sum(col("tok")).over(w).as("cum_tokens"),
          sum(col("vocab")).over(w).as("cum_vocab"))
        .withColumn("ttr_ppm", expr("cum_vocab * 1000000 div cum_tokens"))
    }),

    // PRECISION-RECALL CURVE of the q214 classifier — the threshold-sweep
    // companion to q215's single-number AUC: at every occupied score
    // threshold t (predict positive iff score ≥ t), exact tp/fp/fn plus
    // precision/recall/F1 in integer bp. Like q215, the sweep lives on
    // the distinct-SCORE relation (bounded by the weight domain, not the
    // corpus) with BOTH suffix counts from ONE PrefixSum range shuffle
    // (runningMulti) — never a corpus sort. F1 = 2·tp/(pred+P) is exactly
    // rational, no float harmonic mean (the q253 identity).
    "q257_pr_curve" -> ((s, d) => {
      val scored = Tables.documents(s, d).select(
        classifierScore(col("text")).as("score"),
        (size(TextHash.tokens(col("text"))) >= 60).cast("long").as("pos"))
      val grp = scored.groupBy(col("score"))
        .agg(count(lit(1)).as("m"), sum(col("pos")).as("p"))
      val cum = graft.operators.PrefixSum.runningMulti(grp, "score",
        Seq("m" -> "cm", "p" -> "cp"))
      val tot = grp.agg(sum(col("m")).as("n_all"), sum(col("p")).as("n_pos"))
      cum.crossJoin(tot)
        .select(col("score"),
          (col("n_pos") - (col("cp") - col("p"))).as("tp"),
          (col("n_all") - (col("cm") - col("m"))).as("pred"),
          col("n_pos"))
        .select(col("score"), col("tp"),
          (col("pred") - col("tp")).as("fp"),
          (col("n_pos") - col("tp")).as("fn"),
          expr("tp * 10000 div pred").as("precision_bp"),
          expr("tp * 10000 div n_pos").as("recall_bp"),
          expr("2 * tp * 10000 div (pred + n_pos)").as("f1_bp"))
    }),

    // SPLIT-CONFORMAL threshold calibration (α = 0.1) — the modern
    // distribution-free companion to q216's calibration bins: the decision
    // threshold is the ⌈(1−α)(n+1)⌉-th largest calibration-positive score
    // (equivalently the k = n−r+1 smallest), which guarantees ≥ 90%
    // recall on exchangeable test positives IN EXPECTATION over splits.
    // The order statistic comes from the distinct-SCORE relation via
    // PrefixSum (the q257 machinery — never a corpus sort); the test-split
    // audit (achieved coverage + prediction efficiency) rides alongside in
    // exact bp, so the whole calibration is hash-checked. r > n (tiny
    // calibration sets) degrades to threshold −∞ = predict everything,
    // exactly per the conformal construction.
    "q262_conformal_threshold" -> ((s, d) => {
      val NegInf = -1000000000000000L // far below any reachable score
      val scored = Tables.documents(s, d).select(col("doc_id"),
        classifierScore(col("text")).as("score"),
        (size(TextHash.tokens(col("text"))) >= 60).cast("long").as("pos"),
        (pmod(TextHash.md5Long(concat(lit("cal:"), col("doc_id").cast("string"))),
          lit(100L)) < 50).as("is_cal"))
        .persist() // calibration branch + test-audit branch
      val calPos = scored.filter(col("is_cal") && col("pos") === 1)
      val grp = calPos.groupBy(col("score")).agg(count(lit(1)).as("m"))
      val cum = graft.operators.PrefixSum.running(grp, "score", "m", "cm")
      val nCal = calPos.agg(count(lit(1)).as("n_cal_pos"))
      val thr = cum.crossJoin(nCal)
        .withColumn("r", expr("(9 * (n_cal_pos + 1) + 9) div 10"))
        .withColumn("kth", col("n_cal_pos") - col("r") + 1)
        .groupBy(col("n_cal_pos"), col("r"), col("kth"))
        .agg(min(when(col("cm") >= col("kth"), col("score"))).as("thr0"))
        .select(col("n_cal_pos"), col("r"),
          when(col("kth") < 1, lit(NegInf)).otherwise(col("thr0")).as("threshold"))
      scored.filter(!col("is_cal")).crossJoin(thr)
        .groupBy(col("n_cal_pos"), col("r"), col("threshold"))
        .agg(sum(col("pos")).as("n_test_pos"),
          sum(when(col("pos") === 1 && col("score") >= col("threshold"), 1L)
            .otherwise(0L)).as("covered"),
          count(lit(1)).as("n_test"),
          sum((col("score") >= col("threshold")).cast("long")).as("predicted_pos"))
        .select(col("n_cal_pos"), col("r"), col("threshold"),
          col("n_test_pos"), col("covered"), col("n_test"), col("predicted_pos"),
          expr("covered * 10000 div n_test_pos").as("coverage_bp"),
          expr("predicted_pos * 10000 div n_test").as("efficiency_bp"))
    }),

    // Reliability (calibration) curve for the q214 score against the q215
    // label: fixed-width score bins → observed positive rate per bin.
    // The at-scale shape is ONE map-side bin assignment + hash agg (bin
    // count is bounded by the score domain / width, not the corpus);
    // rates are integer basis points (div truncates toward zero
    // identically in both engines — q161 precedent), so the whole curve
    // is hash-checked with no float surface.
    "q216_calibration_bins" -> ((s, d) => {
      Tables.documents(s, d).select(
          classifierScore(col("text")).as("score"),
          (size(TextHash.tokens(col("text"))) >= 60).cast("long").as("pos"))
        .withColumn("bin", expr("score div 2000L"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"),
          sum(col("score")).as("ssum"))
        .select(col("bin"), col("n"), col("n_pos"),
          expr("(n_pos * 10000) div n").as("pos_rate_bp"),
          expr("(ssum * 100) div n").as("mean_score_x100"))
    }),

    // Isotonic (monotone) calibration of the q214 classifier over the
    // q216 reliability bins — the post-hoc calibration step a production
    // scorer ships with. The observed rate is non-INCREASING in score
    // here, so the monotone fit runs on the reversed bin axis (idx = rank
    // by bin DESC). The fit uses the exact minimax identity
    //   fit(i) = max_{j<=i} min_{k>=i} mean(bins j..k)
    // (provably equal to PAVA's pooled solution — spec-checked against a
    // pure-Scala PAVA with BigInt rationals): the interval relation is
    // B² rows and the candidate relation B³ for B = bin count, which is
    // bounded by the score DOMAIN / bin width (q216's bound), never the
    // corpus — so the argmin/argmax layers are two anti-joins over a tiny
    // relation, and every comparison is a decimal cross-multiplication
    // (no float; ties break to the smaller k then smaller j, making the
    // chosen interval — and hence the emitted num/den pair — unique).
    "q277_isotonic_calibration" -> ((s, d) => {
      val bins = Tables.documents(s, d).select(
          classifierScore(col("text")).as("score"),
          (size(TextHash.tokens(col("text"))) >= 60).cast("long").as("pos"))
        .withColumn("bin", expr("score div 2000L"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), sum(col("pos")).as("c"))
      val w = Window.orderBy(col("bin").desc) // <= B rows: domain-bounded
      val pref = bins.select(col("bin"), col("n"), col("c"),
          row_number().over(w).as("idx"),
          sum(col("n")).over(w).as("nn"), sum(col("c")).over(w).as("cc"))
        .persist() // intervals join + final output join
      val iv = pref.as("a").join(pref.as("b"), col("a.idx") <= col("b.idx"))
        .select(col("a.idx").as("j"), col("b.idx").as("k"),
          (col("b.cc") - col("a.cc") + col("a.c")).as("num"),
          (col("b.nn") - col("a.nn") + col("a.n")).as("den"))
      val cand = pref.select(col("idx").as("i"))
        .join(iv, col("j") <= col("i") && col("k") >= col("i")).persist()
      def dec(c: Column) = c.cast("decimal(38,0)")
      val inner = cand.as("x").join(cand.as("y"),
          col("x.i") === col("y.i") && col("x.j") === col("y.j") &&
            (dec(col("y.num")) * dec(col("x.den")) < dec(col("x.num")) * dec(col("y.den")) ||
              (dec(col("y.num")) * dec(col("x.den")) === dec(col("x.num")) * dec(col("y.den")) &&
                col("y.k") < col("x.k"))),
          "left_anti")
      val fit = inner.as("x").join(inner.as("y"),
          col("x.i") === col("y.i") &&
            (dec(col("y.num")) * dec(col("x.den")) > dec(col("x.num")) * dec(col("y.den")) ||
              (dec(col("y.num")) * dec(col("x.den")) === dec(col("x.num")) * dec(col("y.den")) &&
                col("y.j") < col("x.j"))),
          "left_anti")
        .select(col("i"), col("num").as("fit_num"), col("den").as("fit_den"))
      fit.join(pref, fit("i") === pref("idx"))
        .select(col("bin"), col("n"), col("c").as("n_pos"),
          expr("(c * 10000) div n").as("raw_bp"),
          col("fit_num"), col("fit_den"),
          expr("(fit_num * 10000) div fit_den").as("fit_bp"))
    }),

    // BM25 ranked retrieval (k1 = 1.2, b = 0.75) for a fixed 3-term query,
    // in EXACT integer arithmetic: the length-normalized saturating TF is
    // the exact rational 44·tf·L / (20·tf·L + 6·L + 18·dl·N) (k1, b
    // cleared to the common denominator 20·L), and the IDF is the
    // rational Robertson–Sparck-Jones weight (N−df+1)/(df+1) WITHOUT the
    // log — a deliberate deviation that keeps the whole score a single
    // integer division (numerator ≈ 44·tf·L·N·10^6 rides decimal(38,0);
    // a log IDF would put an unportable libm call inside the ranking).
    // Per-term micro-scores are exact longs, the doc score is their sum
    // (order-free), and the top-10 is the bounded TopKByScore aggregate —
    // ONE scan + one k-row-per-task agg, the at-scale retrieval plan.
    "q218_bm25_topk" -> ((s, d) => {
      val terms = Seq("hash", "merge", "spark")
      val docs = Tables.documents(s, d).select(col("doc_id"),
        TextHash.tokens(col("text")).as("toks"))
        .withColumn("dl", size(col("toks")).cast("long"))
      val withTf = terms.zipWithIndex.foldLeft(docs) { case (df, (t, i)) =>
        df.withColumn(s"tf$i",
          size(filter(col("toks"), x => x === t)).cast("long"))
      }.drop("toks").persist() // corpus stats + scoring read it twice
      val aggs = count(lit(1)).cast("long").as("n") +:
        sum(col("dl")).as("l") +:
        terms.indices.map(i => sum((col(s"tf$i") > 0).cast("long")).as(s"df$i"))
      val stats = withTf.agg(aggs.head, aggs.tail: _*)
      val scored = withTf.crossJoin(broadcast(stats))
      val scoreCols = terms.indices.map { i =>
        // decimal from the FIRST multiply: a bigint product inside the cast
        // would overflow long before the cast protects anything
        expr(s"""cast(44 as decimal(38,0)) * tf$i * l * (n - df$i + 1) * 1000000
                 div ((cast(20 as decimal(38,0)) * tf$i * l + 6 * l + 18 * dl * n) * (df$i + 1))""")
      }
      scored.withColumn("score_micro", scoreCols.reduce(_ + _))
        .agg(graft.functions.TopKAggregate.topK(
          col("score_micro").cast("double"), col("doc_id"), 10).as("top"))
        .select(posexplode(col("top")))
        .select((col("pos") + 1).as("rank"), col("col.payload").as("doc_id"),
          col("col.score").cast("long").as("score_micro"))
    }),

    // Character-set / gibberish audit: per-doc char collision probability
    // (Simpson index — the log-free dual of char entropy: repeated-char
    // pair chance in ppm), distinct-char count, digit mass. Σc² comes
    // from a MAP-SIDE sorted-run fold (extending a run from l−1 to l adds
    // 2l−1 — no explode, no shuffle; q50's idiom), so the whole audit is
    // one scan. Exact integers: (Σc²−n)·10⁶ div n(n−1) stays under int64
    // for docs to ~10⁶ chars.
    // Lexical diversity — the FREQUENCY-weighted panel q50's distinctness
    // ratios can't see (a doc repeating one word 50× in 100 tokens has the
    // same dup_token_frac as one with a flat tail): Gini–Simpson diversity
    // 1 − Σc²/n² and top-token dominance max(c)/n, both exact integer ppm.
    // Σc² and max(c) come from ONE map-side sorted-run fold over the
    // token array (run l→l+1 adds 2l−1 — the q226 idiom; no shuffle, no
    // per-doc token explode).
    "q294_lexical_diversity" -> ((s, d) => {
      val toks = array_sort(TextHash.tokens(col("text")))
      val fold = aggregate(toks,
        struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
          lit(0L).as("c2"), lit(0L).as("maxc")),
        (acc, x) => {
          val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
            .otherwise(1L)
          struct(x.as("prev"), run.as("run"),
            (acc.getField("c2") + lit(2L) * run - 1L).as("c2"),
            greatest(acc.getField("maxc"), run).as("maxc"))
        })
      // spread the compact doc rows before the corpus-wide fan-out map
      // pass (no-op at scale, see operators/Spread)
      graft.operators.Spread.rows(Tables.documents(s, d)).select(col("doc_id"),
          size(TextHash.tokens(col("text"))).cast("long").as("n_tokens"),
          size(array_distinct(TextHash.tokens(col("text")))).cast("long")
            .as("n_distinct"),
          fold.getField("c2").as("c2"), fold.getField("maxc").as("maxc"))
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
          when(col("n_tokens") >= 1,
            expr("((n_tokens * n_tokens - c2) * 1000000) div (n_tokens * n_tokens)"))
            .otherwise(0L).as("simpson_ppm"),
          when(col("n_tokens") >= 1,
            expr("(maxc * 1000000) div n_tokens")).otherwise(0L)
            .as("dominance_ppm"))
    }),

    "q226_charset_audit" -> ((s, d) => {
      // split('') yields [""] on EMPTY text in both engines — filter the
      // empty element so a zero-length doc audits as (0 chars, 0 distinct)
      // instead of one phantom character (latent oracle divergence)
      val chars = array_sort(filter(split(col("text"), ""), c => c =!= ""))
      val sumC2 = aggregate(chars,
        struct(lit(null).cast("string").as("prev"), lit(0L).as("run"), lit(0L).as("acc")),
        (acc, x) => {
          val run = when(x === acc.getField("prev"), acc.getField("run") + 1).otherwise(1L)
          struct(x.as("prev"), run.as("run"),
            (acc.getField("acc") + lit(2L) * run - 1L).as("acc"))
        },
        acc => acc.getField("acc"))
      // spread the compact doc rows before the corpus-wide fan-out map
      // pass (no-op at scale, see operators/Spread)
      graft.operators.Spread.rows(Tables.documents(s, d)).select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars"),
          size(array_distinct(filter(split(col("text"), ""), c => c =!= "")))
            .as("n_distinct_chars"),
          sumC2.as("c2"),
          length(regexp_replace(col("text"), "[^0-9]", "")).cast("long").as("n_digits"))
        .select(col("doc_id"), col("n_chars"), col("n_distinct_chars"),
          when(col("n_chars") >= 2,
            expr("((c2 - n_chars) * 1000000) div (n_chars * (n_chars - 1))"))
            .otherwise(lit(0L)).as("collision_ppm"),
          col("n_digits"))
    }),

    // VIDEO scene-cut detection on REAL decoded frames (round-9): the
    // multimodal family's per-FRAME stage (q60 samples frame indices;
    // this one decodes every frame's pixels). Payloads are multi-frame P6
    // animations whose frames carry constant scene-keyed bytes
    // (Multimodal.ppmPayloadScenes — scene = frame div 2); withFrameSums
    // parses the actual bytes and emits one row per frame with its exact
    // intensity sum, and a cut fires where adjacent frame sums differ
    // (a ≤5-row per-doc lag window — doc-keyed, high cardinality). The
    // oracle replays the construction arithmetic only, so the hash match
    // proves the frame-offset byte walk.
    "q319_scene_cuts" -> ((s, d) => {
      val frames = Multimodal.withFrameSums(
        Tables.documents(s, d).select(col("doc_id"),
          Multimodal.ppmPayloadScenes(col("doc_id")).as("payload")),
        "payload").select(col("doc_id"), col("frame_idx"), col("frame_sum"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
      frames.withColumn("prev_sum", lag(col("frame_sum"), 1).over(w))
        .select(col("doc_id"), col("frame_idx"), col("frame_sum"),
          coalesce(col("frame_sum") =!= col("prev_sum"), lit(false)).as("is_cut"))
    }),

    // Audio feature extraction on REAL decoded PCM (round-9): construct
    // genuine canonical WAV payloads (RIFF/WAVE header + 16-bit LE mono
    // samples whose values derive from md5-segmented amplitude laws),
    // parse them byte-by-byte with Multimodal.WavDecoder inside the
    // batched mapPartitions seam, and emit the silence-detection features
    // an audio-curation pipeline gates on (peak/mean level, 20 ms-window
    // silent count, longest silent run). The oracle replays only the
    // construction arithmetic — it never sees a byte — so the hash match
    // proves the header parse, the little-endian SIGN decode, and the
    // ragged window geometry (clip lengths are never a whole number of
    // windows by construction). Clip set bounded by a count-derived
    // modulus (sampleModFor) so the volume is ~constant at any SF.
    "q310_audio_features" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val clipMod = graft.operators.KMeansIVF.sampleModFor(docs.count(), 600L)
      val clips = docs.filter(
        pmod(TextHash.md5Long(concat(lit("aclip:"), col("doc_id").cast("string"))),
          lit(clipMod.toLong)) === 0)
        .select(col("doc_id"), Multimodal.wavPayload(col("doc_id")).as("payload"))
      Multimodal.withAudioFeatures(clips, "payload")
        .select(col("doc_id"), col("sample_rate"), col("n_samples"),
          col("duration_ms"), col("peak_abs"), col("sum_abs"), col("mean_abs"),
          col("n_windows"), col("n_silent"), col("longest_silence"))
    }),
  )

  val oracle: Map[String, String] = {
    val toksSql = TextHash.tokensSql("text")
    val ltoksSql = TextHash.tokensSql("lower(text)")
    val markerLen = langMarkers.map { case (lang, ms) =>
      lang -> s"len(list_filter($ltoksSql, t -> t IN (${ms.map(m => s"'$m'").mkString(", ")})))"
    }.toMap
    val normSql = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
    Map(
      "q18_text_stats" ->
        s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks,
           |  length(regexp_replace(text, '\\s', '', 'g')) AS nonws FROM documents),
           |m AS (SELECT doc_id, len(toks) AS n_tokens, nonws,
           |  len(list_filter(toks, x -> x IN ($stopSqlList)))::DOUBLE / len(toks) AS stop_ratio,
           |  nonws::DOUBLE / len(toks) AS avg_len FROM t)
           |SELECT doc_id, n_tokens, nonws::BIGINT AS n_nonws_chars,
           |  floor(avg_len * 1000 + 0.5) / 1000 AS avg_token_len,
           |  floor(stop_ratio * 1000 + 0.5) / 1000 AS stopword_ratio,
           |  floor((least(1.0, n_tokens::DOUBLE / 100.0) * 0.5 + stop_ratio * 0.3
           |        + least(1.0, avg_len / 8.0) * 0.2) * 1000 + 0.5) / 1000 AS quality_score
           |FROM m""".stripMargin,

      "q19_lang_id" ->
        s"""WITH h AS (SELECT doc_id,
           |  ${markerLen("en")} AS c_en, ${markerLen("es")} AS c_es,
           |  ${markerLen("fr")} AS c_fr, ${markerLen("de")} AS c_de
           |  FROM documents)
           |SELECT doc_id,
           |  CASE WHEN c_en >= greatest(c_es, c_fr, c_de) THEN 'en'
           |       WHEN c_es >= greatest(c_fr, c_de) THEN 'es'
           |       WHEN c_fr >= c_de THEN 'fr' ELSE 'de' END AS lang_pred,
           |  greatest(c_en, c_es, c_fr, c_de) AS marker_hits
           |FROM h""".stripMargin,

      "q352_lang_consistency" ->
        s"""WITH h AS (SELECT source, lang,
           |  ${markerLen("en")} AS c_en, ${markerLen("es")} AS c_es,
           |  ${markerLen("fr")} AS c_fr, ${markerLen("de")} AS c_de
           |  FROM documents),
           |p AS (SELECT source, lang,
           |  CASE WHEN c_en >= greatest(c_es, c_fr, c_de) THEN 'en'
           |       WHEN c_es >= greatest(c_fr, c_de) THEN 'es'
           |       WHEN c_fr >= c_de THEN 'fr' ELSE 'de' END AS lang_pred
           |  FROM h),
           |cells AS (SELECT source, lang, lang_pred, count(*)::BIGINT AS n
           |          FROM p GROUP BY 1, 2, 3),
           |per AS (SELECT source, count(*)::BIGINT AS n_docs,
           |          sum(CASE WHEN lang <> lang_pred THEN 1 ELSE 0 END)::BIGINT
           |            AS n_mismatch
           |        FROM p GROUP BY 1)
           |SELECT c.source, c.lang, c.lang_pred, c.n, per.n_docs,
           |  ((per.n_mismatch * 10000) // per.n_docs)::BIGINT AS src_mismatch_bp
           |FROM cells c JOIN per ON c.source = per.source""".stripMargin,

      "q355_dsir_selection" ->
        s"""WITH ${Dsir.replayCtes("lang = 'en'", 512)}
           |SELECT d.doc_id, d.lang, d.source, s.n_tok, s.dsir_mllr
           |FROM sc s JOIN documents d USING (doc_id)
           |ORDER BY s.dsir_mllr DESC, d.doc_id ASC LIMIT 64""".stripMargin,

      "q359_dsir_source_panel" ->
        s"""WITH ${Dsir.replayCtes("lang = 'en'", 512)}
           |SELECT d.source, count(*)::BIGINT AS n_docs,
           |  sum(s.dsir_mllr)::BIGINT AS sum_mllr,
           |  sum(CASE WHEN s.dsir_mllr > 0 THEN 1 ELSE 0 END)::BIGINT AS n_positive,
           |  ((sum(CASE WHEN s.dsir_mllr > 0 THEN 1 ELSE 0 END) * 10000)
           |    // count(*))::BIGINT AS pos_bp
           |FROM sc s JOIN documents d USING (doc_id)
           |GROUP BY d.source""".stripMargin,

      "q20_token_count" ->
        s"""SELECT doc_id, len($toksSql) AS ws_tokens,
           |  len(regexp_extract_all(text, '$bpePattern')) AS bpe_tokens,
           |  length(text) AS n_chars_calc
           |FROM documents""".stripMargin,

      "q21_doc_fingerprint" ->
        s"""SELECT doc_id,
           |  ${TextHash.md5LongSql(normSql)} AS fingerprint,
           |  list_min(list_transform(${TextHash.charShinglesStridedSql(normSql, 8, 4)},
           |    sh -> ${TextHash.md5LongSql("sh")})) AS fp_rolling_min
           |FROM documents""".stripMargin,

      "q79_pii_redaction" ->
        """WITH r AS (SELECT doc_id,
          |    len(regexp_extract_all(text, '\b(customer|key|value)\b'))::INT AS n_pii,
          |    regexp_replace(text, '\b(customer|key|value)\b', '[PII]', 'g') AS redacted
          |  FROM documents)
          |SELECT doc_id, n_pii, redacted, length(redacted)::INT AS red_len FROM r""".stripMargin,

      "q22_sessionize" -> Sessionize.batchOracleSql(),

      "q23_top_users_by_value" ->
        """SELECT user_id,
          |  (sum(CAST(round(value * 100) AS BIGINT))::DOUBLE / 100) AS total_value,
          |  count(*) AS n_events
          |FROM events GROUP BY user_id
          |ORDER BY total_value DESC, user_id LIMIT 20""".stripMargin,

      // the payload-construction arithmetic only (w/h single-digit by
      // construction ⇒ the P6 header is always 11 bytes); Spark's answer
      // came from byte-level PARSING of the constructed payload
      "q24_media_meta" ->
        """WITH n AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
          |d AS (SELECT doc_id, (n % 8 + 1) AS w, ((n * 7) % 6 + 1) AS h,
          |        (n % 5 + 1) AS f FROM n)
          |SELECT doc_id, (11 + w * h * 3 * f)::INT AS byte_len,
          |  w::INT AS width, h::INT AS height, f::INT AS frames
          |FROM d""".stripMargin,

      "q60_frame_sample" ->
        s"""WITH m AS (SELECT doc_id,
           |        (octet_length(encode(text)) % 5 + 1)::INT AS frames FROM documents),
           |f AS (SELECT doc_id, frames, unnest(range(0, frames, 4))::INT AS frame_idx FROM m)
           |SELECT doc_id, frames, frame_idx,
           |  ${TextHash.md5LongSql("doc_id::VARCHAR || ':' || frame_idx::VARCHAR")} AS frame_sig
           |FROM f""".stripMargin,

      "q272_patch_pool" ->
        """WITH d AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
          |g AS (SELECT doc_id, (n % 8 + 1) AS w, ((n * 7) % 6 + 1) AS h FROM d),
          |px AS (SELECT doc_id, w, h, unnest(range(0, w * h * 3)) AS i FROM g),
          |e AS (SELECT doc_id, w, h, (97 + (i % 26))::BIGINT AS b,
          |        ((i // 3) % w) AS x, ((i // 3) // w) AS y
          |      FROM px),
          |pa AS (SELECT doc_id, w, h,
          |         ((y // 2) * ((w + 1) // 2) + (x // 2)) AS patch,
          |         sum(b)::BIGINT AS s
          |       FROM e GROUP BY 1, 2, 3, 4)
          |SELECT doc_id, w::INT AS width, h::INT AS height,
          |  count(*)::INT AS n_patches,
          |  array_to_string(list(s ORDER BY patch), ',') AS patch_sums,
          |  sum(s)::BIGINT AS total_sum
          |FROM pa GROUP BY 1, 2, 3""".stripMargin,

      "q214_hashed_classifier" -> {
        val wSql = classifierWSql
        s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |s AS (SELECT doc_id, len(toks)::INT AS n_tokens,
           |        coalesce(list_sum(list_transform(toks, t -> $wSql)), 0)::BIGINT AS score
           |      FROM t)
           |SELECT doc_id, n_tokens, score, (score > 0) AS keep FROM s""".stripMargin
      },

      "q215_auc_exact" -> {
        val wSql = classifierWSql
        s"""WITH t AS (SELECT $toksSql AS toks FROM documents),
           |s AS (SELECT coalesce(list_sum(list_transform(toks, t -> $wSql)), 0)::BIGINT AS score,
           |        (CASE WHEN len(toks) >= 60 THEN 1 ELSE 0 END)::BIGINT AS pos FROM t),
           |g AS (SELECT score, count(*)::BIGINT AS m, sum(pos)::BIGINT AS p
           |      FROM s GROUP BY score),
           |c AS (SELECT m, p, coalesce(sum(m) OVER (ORDER BY score
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cexc
           |      FROM g),
           |a AS (SELECT sum(p)::HUGEINT AS np, sum(m)::HUGEINT AS nall,
           |        sum(p::HUGEINT * (2 * cexc::HUGEINT + m + 1)) AS r2 FROM c),
           |u AS (SELECT np, nall - np AS nn, r2 - np * (np + 1) AS u2 FROM a)
           |SELECT np::BIGINT AS n_pos, nn::BIGINT AS n_neg, u2::VARCHAR AS u2_str,
           |  ${graft.functions.PortableMath.roundPortableSql(
                 "u2::DOUBLE / (2.0 * np::DOUBLE * nn::DOUBLE)", 4)} AS auc
           |FROM u""".stripMargin
      },

      "q259_vocab_growth" ->
        s"""WITH docs AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |n AS (SELECT max(doc_id) + 1 AS idspan FROM docs),
           |dd AS (SELECT least((doc_id * 10) // idspan, 9) AS decile,
           |         len(toks)::BIGINT AS ntok FROM docs, n),
           |ddg AS (SELECT decile, count(*)::BIGINT AS docs,
           |          sum(ntok)::BIGINT AS tok FROM dd GROUP BY 1),
           |fo AS (SELECT t, min(doc_id) AS first_id
           |       FROM (SELECT doc_id, unnest(toks) AS t FROM docs)
           |       GROUP BY t),
           |vd AS (SELECT least((first_id * 10) // idspan, 9) AS decile,
           |         count(*)::BIGINT AS vocab FROM fo, n GROUP BY 1),
           |j AS (SELECT ddg.decile, docs, tok,
           |        coalesce(vocab, 0)::BIGINT AS vocab
           |      FROM ddg LEFT JOIN vd ON ddg.decile = vd.decile),
           |c AS (SELECT decile,
           |        (sum(docs) OVER w)::BIGINT AS cum_docs,
           |        (sum(tok) OVER w)::BIGINT AS cum_tokens,
           |        (sum(vocab) OVER w)::BIGINT AS cum_vocab
           |      FROM j
           |      WINDOW w AS (ORDER BY decile
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
           |SELECT decile, cum_docs, cum_tokens, cum_vocab,
           |  (cum_vocab * 1000000 // cum_tokens)::BIGINT AS ttr_ppm
           |FROM c""".stripMargin,

      "q257_pr_curve" -> {
        val wSql = classifierWSql
        s"""WITH t AS (SELECT $toksSql AS toks FROM documents),
           |s AS (SELECT coalesce(list_sum(list_transform(toks, t -> $wSql)), 0)::BIGINT AS score,
           |        (CASE WHEN len(toks) >= 60 THEN 1 ELSE 0 END)::BIGINT AS pos FROM t),
           |g AS (SELECT score, count(*)::BIGINT AS m, sum(pos)::BIGINT AS p
           |      FROM s GROUP BY score),
           |c AS (SELECT score, m, p,
           |        coalesce(sum(m) OVER (ORDER BY score
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cme,
           |        coalesce(sum(p) OVER (ORDER BY score
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cpe
           |      FROM g),
           |a AS (SELECT sum(m)::BIGINT AS n_all, sum(p)::BIGINT AS n_pos FROM g),
           |r AS (SELECT score, (n_pos - cpe)::BIGINT AS tp,
           |        (n_all - cme)::BIGINT AS pred, n_pos
           |      FROM c, a)
           |SELECT score, tp, (pred - tp)::BIGINT AS fp,
           |  (n_pos - tp)::BIGINT AS fn,
           |  (tp * 10000 // pred)::BIGINT AS precision_bp,
           |  (tp * 10000 // n_pos)::BIGINT AS recall_bp,
           |  (2 * tp * 10000 // (pred + n_pos))::BIGINT AS f1_bp
           |FROM r""".stripMargin
      },

      "q262_conformal_threshold" -> {
        val wSql = classifierWSql
        val split = TextHash.md5LongSql("'cal:' || doc_id::VARCHAR")
        s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |s AS (SELECT doc_id,
           |        coalesce(list_sum(list_transform(toks, t -> $wSql)), 0)::BIGINT AS score,
           |        (CASE WHEN len(toks) >= 60 THEN 1 ELSE 0 END)::BIGINT AS pos,
           |        (($split) % 100 < 50) AS is_cal
           |      FROM t),
           |cp AS (SELECT score FROM s WHERE is_cal AND pos = 1),
           |g AS (SELECT score, count(*) AS m FROM cp GROUP BY 1),
           |c AS (SELECT score, (sum(m) OVER (ORDER BY score
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cm
           |      FROM g),
           |n AS (SELECT count(*)::BIGINT AS n_cal_pos FROM cp),
           |k AS (SELECT n_cal_pos, (9 * (n_cal_pos + 1) + 9) // 10 AS r,
           |        n_cal_pos - ((9 * (n_cal_pos + 1) + 9) // 10) + 1 AS kth
           |      FROM n),
           |th AS (SELECT n_cal_pos, r::BIGINT AS r,
           |         (CASE WHEN kth < 1 THEN -1000000000000000
           |               ELSE (SELECT min(score) FROM c WHERE cm >= kth)
           |          END)::BIGINT AS threshold
           |       FROM k),
           |te AS (SELECT * FROM s WHERE NOT is_cal)
           |SELECT n_cal_pos, r, threshold,
           |  sum(pos)::BIGINT AS n_test_pos,
           |  sum(CASE WHEN pos = 1 AND score >= threshold THEN 1 ELSE 0 END)::BIGINT
           |    AS covered,
           |  count(*)::BIGINT AS n_test,
           |  sum(CASE WHEN score >= threshold THEN 1 ELSE 0 END)::BIGINT
           |    AS predicted_pos,
           |  (sum(CASE WHEN pos = 1 AND score >= threshold THEN 1 ELSE 0 END)
           |     * 10000 // sum(pos))::BIGINT AS coverage_bp,
           |  (sum(CASE WHEN score >= threshold THEN 1 ELSE 0 END)
           |     * 10000 // count(*))::BIGINT AS efficiency_bp
           |FROM te, th
           |GROUP BY 1, 2, 3""".stripMargin
      },

      "q216_calibration_bins" -> {
        val wSql = classifierWSql
        s"""WITH t AS (SELECT $toksSql AS toks FROM documents),
           |s AS (SELECT coalesce(list_sum(list_transform(toks, t -> $wSql)), 0)::BIGINT AS score,
           |        (CASE WHEN len(toks) >= 60 THEN 1 ELSE 0 END)::BIGINT AS pos FROM t)
           |SELECT (score // 2000)::BIGINT AS bin, count(*)::BIGINT AS n,
           |  sum(pos)::BIGINT AS n_pos,
           |  ((sum(pos) * 10000) // count(*))::BIGINT AS pos_rate_bp,
           |  ((sum(score) * 100) // count(*))::BIGINT AS mean_score_x100
           |FROM s GROUP BY 1""".stripMargin
      },

      "q277_isotonic_calibration" -> {
        val wSql = classifierWSql
        s"""WITH t AS (SELECT $toksSql AS toks FROM documents),
           |s AS (SELECT coalesce(list_sum(list_transform(toks, t -> $wSql)), 0)::BIGINT AS score,
           |        (CASE WHEN len(toks) >= 60 THEN 1 ELSE 0 END)::BIGINT AS pos FROM t),
           |bins AS (SELECT (score // 2000)::BIGINT AS bin, count(*)::BIGINT AS n,
           |    sum(pos)::BIGINT AS c FROM s GROUP BY 1),
           |pref AS (SELECT bin, n, c,
           |    row_number() OVER (ORDER BY bin DESC) AS idx,
           |    sum(n) OVER (ORDER BY bin DESC)::BIGINT AS nn,
           |    sum(c) OVER (ORDER BY bin DESC)::BIGINT AS cc
           |  FROM bins),
           |iv AS (SELECT a.idx AS j, b.idx AS k,
           |    (b.cc - a.cc + a.c)::BIGINT AS num,
           |    (b.nn - a.nn + a.n)::BIGINT AS den
           |  FROM pref a JOIN pref b ON a.idx <= b.idx),
           |cand AS (SELECT p.idx AS i, iv.j, iv.k, iv.num, iv.den
           |  FROM pref p JOIN iv ON iv.j <= p.idx AND iv.k >= p.idx),
           |inner_w AS (SELECT * FROM cand x WHERE NOT EXISTS (
           |    SELECT 1 FROM cand y WHERE y.i = x.i AND y.j = x.j
           |      AND (y.num * x.den < x.num * y.den
           |        OR (y.num * x.den = x.num * y.den AND y.k < x.k)))),
           |fit AS (SELECT i, num AS fit_num, den AS fit_den FROM inner_w x
           |  WHERE NOT EXISTS (
           |    SELECT 1 FROM inner_w y WHERE y.i = x.i
           |      AND (y.num * x.den > x.num * y.den
           |        OR (y.num * x.den = x.num * y.den AND y.j < x.j))))
           |SELECT bin, n, c AS n_pos,
           |  ((c * 10000) // n)::BIGINT AS raw_bp,
           |  fit_num, fit_den,
           |  ((fit_num * 10000) // fit_den)::BIGINT AS fit_bp
           |FROM fit JOIN pref ON fit.i = pref.idx""".stripMargin
      },

      "q218_bm25_topk" -> {
        val terms = Seq("hash", "merge", "spark")
        val tfCols = terms.zipWithIndex.map { case (t, i) =>
          s"len(list_filter(toks, x -> x = '$t'))::BIGINT AS tf$i" }.mkString(",\n           |    ")
        val dfCols = terms.indices.map(i =>
          s"sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END)::BIGINT AS df$i").mkString(", ")
        val scoreTerms = terms.indices.map(i =>
          s"((44::HUGEINT * tf$i * l * (n - df$i + 1) * 1000000) // ((20::HUGEINT * tf$i * l + 6 * l + 18 * dl * n) * (df$i + 1)))")
          .mkString("\n           |    + ")
        s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |d AS (SELECT doc_id, len(toks)::BIGINT AS dl,
           |    $tfCols
           |  FROM t),
           |g AS (SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS l, $dfCols FROM d),
           |sc AS (SELECT doc_id,
           |    ($scoreTerms)::BIGINT AS score_micro
           |  FROM d, g)
           |SELECT row_number() OVER (ORDER BY score_micro DESC, doc_id) AS rank,
           |  doc_id, score_micro
           |FROM sc ORDER BY score_micro DESC, doc_id LIMIT 10""".stripMargin
      },

      "q294_lexical_diversity" ->
        s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |u AS (SELECT doc_id, unnest(toks) AS w FROM t),
           |c AS (SELECT doc_id, w, count(*)::BIGINT AS cnt FROM u GROUP BY 1, 2),
           |a AS (SELECT doc_id, sum(cnt)::BIGINT AS n, count(*)::BIGINT AS nd,
           |    sum(cnt * cnt)::BIGINT AS c2, max(cnt)::BIGINT AS maxc
           |  FROM c GROUP BY 1)
           |SELECT t.doc_id, coalesce(n, 0)::BIGINT AS n_tokens,
           |  coalesce(nd, 0)::BIGINT AS n_distinct,
           |  (CASE WHEN n >= 1 THEN ((n * n - c2) * 1000000) // (n * n)
           |        ELSE 0 END)::BIGINT AS simpson_ppm,
           |  (CASE WHEN n >= 1 THEN (maxc * 1000000) // n
           |        ELSE 0 END)::BIGINT AS dominance_ppm
           |FROM t LEFT JOIN a ON t.doc_id = a.doc_id""".stripMargin,

      "q226_charset_audit" ->
        """WITH ch AS (SELECT doc_id,
          |    unnest(list_filter(string_split(text, ''), c -> c <> '')) AS c
          |  FROM documents),
          |cc AS (SELECT doc_id, c, count(*)::BIGINT AS n FROM ch GROUP BY 1, 2),
          |a AS (SELECT doc_id, sum(n)::BIGINT AS n_chars,
          |        count(*)::BIGINT AS n_distinct_chars,
          |        sum(n * n)::BIGINT AS c2 FROM cc GROUP BY 1)
          |SELECT d.doc_id, coalesce(a.n_chars, 0)::BIGINT AS n_chars,
          |  coalesce(n_distinct_chars, 0)::BIGINT AS n_distinct_chars,
          |  (CASE WHEN a.n_chars >= 2
          |        THEN ((c2 - a.n_chars) * 1000000) // (a.n_chars * (a.n_chars - 1))
          |        ELSE 0 END)::BIGINT AS collision_ppm,
          |  length(regexp_replace(d.text, '[^0-9]', '', 'g'))::BIGINT AS n_digits
          |FROM documents d LEFT JOIN a ON d.doc_id = a.doc_id""".stripMargin,

      "q319_scene_cuts" ->
        s"""WITH par AS (SELECT doc_id, (doc_id % 8) + 1 AS w,
           |    (doc_id * 7) % 6 + 1 AS h, (doc_id % 5) + 1 AS f
           |  FROM documents),
           |fr AS (SELECT doc_id, unnest(range(0, f)) AS frame_idx, w, h FROM par),
           |fs AS (SELECT doc_id, frame_idx,
           |    (w * h * 3) * (97 + ${TextHash.md5LongSql(
                  "'scn:' || doc_id::VARCHAR || ':' || (frame_idx // 2)::VARCHAR")} % 26)
           |      AS frame_sum
           |  FROM fr)
           |SELECT doc_id, frame_idx, frame_sum::BIGINT AS frame_sum,
           |  coalesce(frame_sum <> lag(frame_sum)
           |    OVER (PARTITION BY doc_id ORDER BY frame_idx), false) AS is_cut
           |FROM fs""".stripMargin,

      // Replays the WAV construction arithmetic (Multimodal.wavPayload)
      // per sample and recomputes the decoded features directly — the
      // payload bytes exist only on the Spark side, so the hash match
      // proves the byte-level decode.
      "q310_audio_features" ->
        s"""WITH clips AS (SELECT doc_id FROM documents
           |  WHERE ${TextHash.md5LongSql("'aclip:' || doc_id::VARCHAR")} %
           |    (SELECT greatest(1, (count(*) + 599) // 600) FROM documents) = 0),
           |par AS (SELECT doc_id, (doc_id % 7) * 160 + 400 AS n FROM clips),
           |samp AS (SELECT doc_id, n, unnest(range(0, n)) AS s FROM par),
           |sv AS (SELECT doc_id, n, s, s // 160 AS w,
           |    CASE WHEN ${TextHash.md5LongSql(
                    "'aud:' || doc_id::VARCHAR || ':' || (s // 160)::VARCHAR")} % 4 > 0
           |         THEN 12000 ELSE 40 END AS a
           |  FROM samp),
           |vals AS (SELECT doc_id, n, w,
           |    abs((s * 37 + doc_id * 13) % (2 * a + 1) - a) AS av FROM sv),
           |wins AS (SELECT doc_id, n, w, max(av) AS wmax, sum(av)::BIGINT AS wsum
           |  FROM vals GROUP BY 1, 2, 3),
           |silent AS (SELECT doc_id, w,
           |    row_number() OVER (PARTITION BY doc_id ORDER BY w) AS rn
           |  FROM wins WHERE wmax < 64),
           |runs AS (SELECT doc_id, count(*)::BIGINT AS runlen
           |  FROM silent GROUP BY doc_id, w - rn),
           |longest AS (SELECT doc_id, max(runlen) AS ls FROM runs GROUP BY doc_id),
           |agg AS (SELECT doc_id, max(n) AS n, count(*)::BIGINT AS n_windows,
           |    max(wmax)::BIGINT AS peak_abs, sum(wsum)::BIGINT AS sum_abs,
           |    count(*) FILTER (WHERE wmax < 64)::BIGINT AS n_silent
           |  FROM wins GROUP BY doc_id)
           |SELECT a.doc_id, 8000 AS sample_rate, a.n::BIGINT AS n_samples,
           |  (a.n * 1000 // 8000)::BIGINT AS duration_ms, a.peak_abs, a.sum_abs,
           |  (a.sum_abs // a.n)::BIGINT AS mean_abs, a.n_windows, a.n_silent,
           |  coalesce(l.ls, 0)::BIGINT AS longest_silence
           |FROM agg a LEFT JOIN longest l ON a.doc_id = l.doc_id""".stripMargin,
    )
  }
}
