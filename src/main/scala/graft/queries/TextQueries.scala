package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextHash
import graft.operators.{Multimodal, Sessionize}

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
      Tables.documents(s, d).select(
        col("doc_id"), pred.as("lang_pred"),
        greatest(hits("en"), hits("es"), hits("fr"), hits("de")).as("marker_hits"))
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
    "q214_hashed_classifier" -> ((s, d) => {
      val D = 4096
      val toks = TextHash.tokens(col("text"))
      def weight(t: org.apache.spark.sql.Column) = {
        val bucket = TextHash.md5Long(t) % D
        TextHash.md5Long(concat(lit("w:"), bucket.cast("string"))) % 2001 - 1000
      }
      Tables.documents(s, d).select(col("doc_id"),
          size(toks).as("n_tokens"),
          aggregate(transform(toks, weight(_)), lit(0L), (acc, x) => acc + x).as("score"))
        .withColumn("keep", col("score") > 0)
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

      "q214_hashed_classifier" -> {
        val wSql = "(" + TextHash.md5LongSql(
          s"'w:' || (${TextHash.md5LongSql("t")} % 4096)::VARCHAR") + " % 2001 - 1000)"
        s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |s AS (SELECT doc_id, len(toks)::INT AS n_tokens,
           |        coalesce(list_sum(list_transform(toks, t -> $wSql)), 0)::BIGINT AS score
           |      FROM t)
           |SELECT doc_id, n_tokens, score, (score > 0) AS keep FROM s""".stripMargin
      },
    )
  }
}
