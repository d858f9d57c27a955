package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryPack
import TextFunctions._

/** Text-analysis queries over the `documents` fixture — the
  * training-data-pipeline operator family (language-ID, quality scoring,
  * token counting, n-grams, fingerprinting). Every output column is either
  * exact-integer, exact-string, or a SINGLE division of exact integers, so
  * the DuckDB oracle compares value-for-value with no float-accumulation
  * ambiguity.
  *
  * Scale notes: q_text_stats / q_ngram_counts are one-shuffle partial+final
  * hash aggregates (shuffle bounded by group cardinality — (lang × source)
  * resp. distinct n-grams — not corpus size); everything else is a narrow
  * projection.
  */
object TextPack extends QueryPack {

  /** Per-language marker-hit scores as named columns. */
  private def scoreCols = LangMarkers.map { case (l, ms) =>
    langScore(col("text"), ms).as(s"score_$l")
  }

  /** The mixed-language fixture sentences (marker-unambiguous: each
    * carries only its own language's stopword markers). */
  private[functions] val MixSentences: Map[String, String] = Map(
    "en1" -> "The cat and the dog of the house sat.",
    "en2" -> "The bird and the fish of the sea swam.",
    "de1" -> "Der hund und die katze und der vogel.",
    "en3" -> "The end and the rest of it all.",
    "fr1" -> "Le chat et le chien et les amis.",
    "de2" -> "Der mann und die frau der stadt.")

  /** Constructed mixed-language documents: EN EN DE + (even ids: EN —
    * 750‰ English; odd ids: FR DE — English ties German at 2/5). */
  private def mixedDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Tables.spread(table(s, dir, "documents").select(col("doc_id"))).as[Long]
      .map { id =>
        val keys =
          if (id % 2 == 0) Seq("en1", "en2", "de1", "en3")
          else Seq("en1", "en2", "de1", "fr1", "de2")
        (id, keys.map(MixSentences).mkString(" "))
      }.toDF("doc_id", "text")
  }

  /** Multiscript tail appended to every document for q_script_mix —
    * identical literal in the oracle SQL, counted there by RE2's script
    * classes instead of Java's. */
  private val ScriptTail =
    " Привет мир 中文字 مرحبا γειά 한글 ひらがな カタカナ 42"

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Unicode-script histogram (r11): real document text plus a
    // constructed multiscript tail, counted per script — Java
    // \p{IsScript} classes on the Spark side, RE2 \p{Script} on the
    // DuckDB side: two independent script-property tables must agree.
    "q_script_mix" -> { (s, dir) =>
      graft.functions.TextFunctions // package anchor
      val docs = graft.Tables.spread(table(s, dir, "documents"))
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          concat(col("text"), lit(ScriptTail)).as("text"))
      TextFunctions.scriptMix(docs)
    },
    // Unicode NFC normalization (r11): document text plus a tail of
    // combining sequences (e+́, A+̊) and the ANGSTROM SIGN singleton —
    // the JDK's normalizer vs DuckDB's nfc_normalize, two independent
    // Unicode composition tables that must agree byte-for-byte.
    "q_nfc" -> { (s, dir) =>
      val docs = graft.Tables.spread(table(s, dir, "documents"))
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          concat(col("text"),
            lit(" café Ångström Å x")).as("text"))
      TextFunctions.nfcNormalize(docs)
        .select(col("doc_id"), col("text_nfc"),
          length(col("text_nfc")).cast("long").as("n_chars"))
    },
    // Sentence segmentation (r11): the packing/chunking unit step — a
    // constructed paragraph tortures every rule at once (title
    // abbreviations, an initial, the 'No.' abbrev, a digit-word
    // boundary, a decimal point, !/? enders, a trailing abbrev that
    // must NOT split). Four exact sentences per document, closed-form.
    "q_sentences" -> { (s, dir) =>
      import s.implicits._
      val docs = graft.Tables.spread(table(s, dir, "documents")
        .select(col("doc_id"))).as[Long]
        .map { id =>
          (id, "Dr. Smith met J. Doe at No. 5. It cost 3.14 dollars! " +
            s"Did d$id work? Yes, etc. followed.")
        }.toDF("doc_id", "text")
      TextFunctions.explodeSentences(docs)
        .select(col("doc_id"), col("sent_ix"), col("sentence"))
    },
    // Segment-level language ID (r12): a constructed mixed-language
    // document — an English head, a German sentence, then an English
    // tail (even docs) or a French+German tail (odd docs) — language-
    // identified PER SENTENCE with scores exposed, so the oracle pins
    // the per-segment heuristic itself, not just the argmax.
    "q_lang_segments" -> { (s, dir) =>
      TextFunctions.langSegments(mixedDocs(s, dir))
        .select(Seq(col("doc_id"), col("sent_ix"), col("pred_lang")) ++
          LangMarkers.map { case (l, _) => col(s"score_$l") }: _*)
    },
    // Contiguous language spans of the same fixture: the droppable unit
    // of a span-level extractor (even docs: en×2, de, en; odd: en×2,
    // de, fr, de). Closed-form oracle from the construction.
    "q_lang_spans" -> { (s, dir) =>
      TextFunctions.langSpans(TextFunctions.langSegments(mixedDocs(s, dir)))
        .select(col("doc_id"), col("span_ix"), col("span_lang"),
          col("n_sents"))
    },
    // SPAN-LEVEL extraction (r12): the salvage move — rebuild each
    // mixed document keeping only its dominant language's segments in
    // document order (even docs keep the three English sentences and
    // drop the German one; odd docs keep the two German and drop
    // three). Closed-form from the construction.
    "q_span_extract" -> { (s, dir) =>
      TextFunctions.keepDominantSpans(mixedDocs(s, dir))
        .select(col("doc_id"), col("text_kept"), col("n_kept"),
          col("n_dropped"))
    },
    // The mixed-language GATE as a curation stage (r11 verdict #4
    // "used as a filter stage"): keep documents whose dominant language
    // is English with ≥ 700‰ of segments — even docs pass at 750‰,
    // odd docs fail (en ties de at 2/5; the deterministic tie-break
    // makes 'de' dominant at 400‰). The kept set joins back to the
    // corpus the way the cascade's other gates do.
    "q_curated_multilang" -> { (s, dir) =>
      val dom = TextFunctions.langDominant(
        TextFunctions.langSegments(mixedDocs(s, dir)))
      graft.Tables.spread(table(s, dir, "documents")).select(col("doc_id"), col("lang"))
        .join(dom.filter(col("dom_lang") === "en" &&
          col("share_permille") >= 700), Seq("doc_id"))
        .select(col("doc_id"), col("lang"), col("dom_lang"),
          col("share_permille"))
    },
    // Corpus stats by (lang, source): counts + char/token sums (ints) + one
    // derived mean (single division).
    "q_text_stats" -> { (s, dir) =>
      table(s, dir, "documents")
        .withColumn("n_tokens", tokenCount(col("text")))
        .groupBy("lang", "source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("n_chars").as("total_chars"),
          min("n_chars").as("min_chars"),
          max("n_chars").as("max_chars"),
          sum("n_tokens").as("total_tokens"))
        .withColumn("avg_tokens",
          col("total_tokens").cast("double") / col("n_docs"))
    },
    // Per-document lexer-class token counts (regexp_count, ASCII classes).
    "q_token_counts" -> { (s, dir) =>
      graft.Tables.spread(table(s, dir, "documents")).select(
        col("doc_id"),
        tokenCount(col("text")).as("n_ws_tokens"),
        regexTokenCount(col("text"), AnyToken).as("n_rx_tokens"),
        regexTokenCount(col("text"), AlphaToken).as("n_alpha"),
        regexTokenCount(col("text"), NumToken).as("n_num"),
        regexTokenCount(col("text"), PunctToken).as("n_punct"))
    },
    // Marker-based language ID; scores exposed so the heuristic itself is
    // oracle-checked, not just the argmax.
    "q_lang_id" -> { (s, dir) =>
      graft.Tables.spread(table(s, dir, "documents")).select(
        Seq(col("doc_id"), col("lang"),
          langPredict(col("text")).as("pred_lang")) ++ scoreCols: _*)
    },
    // Quality components: exact ints + two single-division ratios.
    "q_quality_score" -> { (s, dir) =>
      graft.Tables.spread(table(s, dir, "documents"))
        .select(
          col("doc_id"),
          length(col("text")).as("len"),
          tokenCount(col("text")).as("n_tokens"),
          regexTokenCount(col("text"), PunctToken).as("n_punct"),
          length(regexp_replace(col("text"), "[^A-Za-z]", "")).as("n_alpha_chars"),
          langScore(col("text"), LangMarkers.toMap.apply("en")).as("stop_hits"))
        .withColumn("alpha_ratio", col("n_alpha_chars").cast("double") / col("len"))
        .withColumn("tokens_per_char", col("n_tokens").cast("double") / col("len"))
        .withColumn("looks_clean",
          col("n_tokens") >= 5 && col("n_punct") <= col("n_tokens"))
    },
    // Corpus-wide word-bigram counts above a support threshold.
    "q_ngram_counts" -> { (s, dir) =>
      graft.Tables.spread(table(s, dir, "documents"))
        .select(explode(wordNgrams(col("text"), 2)).as("ngram"))
        .groupBy("ngram").agg(count(lit(1)).as("count"))
        .filter(col("count") >= 20)
    },
    // Rank-free LM-style quality signal: per-doc sum of binary digit
    // counts of corpus bigram frequencies (integer-exact familiarity; see
    // TextFunctions.bigramFamiliarity for why there's no log in it).
    "q_bigram_familiarity" -> { (s, dir) =>
      TextFunctions.bigramFamiliarity(graft.Tables.spread(table(s, dir, "documents")))
    },
    // Held-out variant: the count model comes from the TRAIN split only
    // and scores val/test docs — the leakage-free quality filter, with
    // the OOV tally as the junk signal.
    "q_heldout_familiarity" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s) // md5_hash32 (the split draw)
      TextFunctions.bigramFamiliarityHeldOut(graft.Tables.spread(table(s, dir, "documents")),
        graft.operators.Curation.splitOf(col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)) === "train")
    },
    // Document fingerprint (md5 of normalized text) — the dedup identity.
    "q_fingerprint" -> { (s, dir) =>
      graft.Tables.spread(table(s, dir, "documents")).select(
        col("doc_id"), fingerprint(col("text")).as("fp"))
    },
    // Rabin–Karp rolling-hash fingerprint of the normalized text (codegen'd
    // rolling_hash expression; md5 variant above is the collision-resistant
    // sibling).
    "q_rolling_fp" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      graft.Tables.spread(table(s, dir, "documents")).select(col("doc_id"),
        call_function("rolling_hash", normalize(col("text"))).as("rfp"))
    },
    // Per-document top-3 terms by tf·idf (rational idf — see
    // TextFunctions.tfIdfTopK for why there's no log in it).
    "q_tfidf_topk" -> { (s, dir) =>
      val docs = graft.Tables.spread(table(s, dir, "documents"))
      TextFunctions.tfIdfTopK(docs, docs.count(), k = 3)
    },
    // Top-5 words per language — windowed analytics over the corpus
    // (explode → one grouped agg → rank; WindowGroupLimit prunes pre-shuffle).
    "q_top_words_per_lang" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val counts = graft.Tables.spread(table(s, dir, "documents"))
        .select(col("lang"), explode(words(col("text"))).as("word"))
        .groupBy("lang", "word").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("lang").orderBy(col("n").desc, col("word").asc)
      counts.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
    },
    // Per-language length quantiles — EXACT percentiles (Spark `percentile`
    // and DuckDB `quantile_cont` share the (n−1)·p linear-interpolation
    // definition; verified bit-identical on this fixture including ulp
    // noise). Exact percentile buffers each group's values, fine for
    // bounded groups like per-language stats; at open-ended cardinality
    // swap in approx_percentile and drop the oracle to rows-only — the
    // exact form is the verifiable twin.
    // Zipf-slope corpus audit: integer-exact log-log OLS over the
    // vocabulary (bit-length logs; ranks via the distributed two-pass
    // numbering, never a single-partition window).
    "q_zipf_slope" -> { (s, dir) =>
      TextFunctions.zipfSlope(graft.Tables.spread(table(s, dir, "documents")))
    },
    "q_token_quantiles" -> { (s, dir) =>
      graft.Tables.spread(table(s, dir, "documents")).groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        expr("percentile(n_chars, 0.1)").as("p10"),
        expr("percentile(n_chars, 0.25)").as("p25"),
        expr("percentile(n_chars, 0.5)").as("p50"),
        expr("percentile(n_chars, 0.75)").as("p75"),
        expr("percentile(n_chars, 0.9)").as("p90"))
    }
  )

  /** DuckDB-side replicas. Marker hits: length-difference over the
    * space-padded normalized text, exactly as the Spark side. */
  private def oracleMarkerHits(marker: String): String =
    s"(length(' ' || norm || ' ') - length(replace(' ' || norm || ' ', '$marker', ''))) // ${marker.length}"

  private def oracleScore(lang: String): String =
    LangMarkers.toMap.apply(lang).map(oracleMarkerHits).mkString("(", " + ", ")")

  /** All per-language score columns over a `norm` alias. */
  private def oracleScores: String = LangMarkers.map { case (l, _) =>
    s"${oracleScore(l)} AS score_$l"
  }.mkString(",\n  ")

  /** The argmax CASE cascade over score_<lang> columns (first-listed
    * tie-break, 'und' on all-zero) — shared by the document- and
    * segment-level language-ID oracles. */
  private def oracleCascade: String = {
    val langs = LangMarkers.map(_._1)
    langs.zipWithIndex.foldRight("'und'") { case ((l, i), els) =>
      val later = langs.drop(i + 1).map(l2 => s"score_$l >= score_$l2")
      val cond = (later :+ s"score_$l > 0").mkString(" AND ")
      s"CASE WHEN $cond THEN '$l' ELSE $els END"
    }
  }

  private val NormCte =
    "SELECT *, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm FROM documents"

  override def oracles: Map[String, String] = Map(
    "q_sentences" ->
      """SELECT doc_id, CAST(j AS BIGINT) AS sent_ix,
        |  CASE j
        |    WHEN 0 THEN 'Dr. Smith met J. Doe at No. 5.'
        |    WHEN 1 THEN 'It cost 3.14 dollars!'
        |    WHEN 2 THEN 'Did d' || CAST(doc_id AS VARCHAR) || ' work?'
        |    ELSE 'Yes, etc. followed.' END AS sentence
        |FROM documents, generate_series(0, 3) t(j)""".stripMargin,
    // Tail reassembled from raw code points: combining acute U+0301,
    // combining ring U+030A, combining diaeresis U+0308, ANGSTROM SIGN
    // U+212B — DuckDB's nfc_normalize composes them with ITS OWN
    // Unicode tables, independent of the JDK normalizer.
    "q_nfc" ->
      ("""WITH a AS (SELECT doc_id,
         |    text || ' cafe' || chr(769) || ' A' || chr(778) ||
         |    'ngstro' || chr(776) || 'm ' || chr(8491) || ' x' AS t
         |  FROM documents WHERE text IS NOT NULL)
         |SELECT doc_id, nfc_normalize(t) AS text_nfc,
         |  CAST(length(nfc_normalize(t)) AS BIGINT) AS n_chars
         |FROM a""".stripMargin),
    "q_script_mix" ->
      ("""WITH a AS (SELECT doc_id,
         |    text || ' Привет мир 中文字 مرحبا γειά 한글 ひらがな カタカナ 42'
         |      AS t
         |  FROM documents WHERE text IS NOT NULL)
         |SELECT doc_id,
         |  CAST(length(t) AS BIGINT) AS n_chars,
         |  CAST(len(regexp_extract_all(t, '\p{Latin}')) AS BIGINT)
         |    AS n_latin,
         |  CAST(len(regexp_extract_all(t, '\p{Cyrillic}')) AS BIGINT)
         |    AS n_cyrillic,
         |  CAST(len(regexp_extract_all(t, '\p{Han}')) AS BIGINT) AS n_han,
         |  CAST(len(regexp_extract_all(t, '\p{Arabic}')) AS BIGINT)
         |    AS n_arabic,
         |  CAST(len(regexp_extract_all(t, '\p{Greek}')) AS BIGINT)
         |    AS n_greek,
         |  CAST(len(regexp_extract_all(t, '\p{Hangul}')) AS BIGINT)
         |    AS n_hangul,
         |  CAST(len(regexp_extract_all(t, '\p{Hiragana}')) +
         |    len(regexp_extract_all(t, '\p{Katakana}')) AS BIGINT)
         |    AS n_kana,
         |  CAST(len(regexp_extract_all(t, '[0-9]')) AS BIGINT) AS n_digit
         |FROM a""".stripMargin),
    "q_text_stats" ->
      """WITH t AS (SELECT lang, source, n_chars,
        |  len(string_split_regex(trim(text), '\s+')) AS n_tokens FROM documents)
        |SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  CAST(sum(n_tokens) AS DOUBLE) / count(*) AS avg_tokens
        |FROM t GROUP BY 1, 2""".stripMargin,
    "q_token_counts" ->
      """SELECT doc_id,
        |  len(string_split_regex(trim(text), '\s+')) AS n_ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_rx_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+')) AS n_alpha,
        |  len(regexp_extract_all(text, '[0-9]+')) AS n_num,
        |  len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_punct
        |FROM documents""".stripMargin,
    "q_lang_id" -> {
      s"""WITH n AS ($NormCte), sc AS (SELECT doc_id, lang, $oracleScores FROM n)
         |SELECT doc_id, lang, $oracleCascade AS pred_lang,
         |  score_en, score_de, score_es, score_fr
         |FROM sc""".stripMargin
    },
    // Per-sentence scores + argmax re-derived from the constructed
    // sentences (the same marker arithmetic as q_lang_id, applied to
    // each segment).
    "q_lang_segments" -> {
      def lit(k: String): String = "'" + MixSentences(k) + "'"
      s"""WITH s AS (
         |  SELECT doc_id, CAST(j AS BIGINT) AS sent_ix,
         |    CASE WHEN j = 0 THEN ${lit("en1")}
         |         WHEN j = 1 THEN ${lit("en2")}
         |         WHEN j = 2 THEN ${lit("de1")}
         |         WHEN j = 3 AND doc_id % 2 = 0 THEN ${lit("en3")}
         |         WHEN j = 3 THEN ${lit("fr1")}
         |         ELSE ${lit("de2")} END AS sentence
         |  FROM documents, generate_series(0, 4) t(j)
         |  WHERE doc_id % 2 = 1 OR j < 4
         |), n AS (SELECT doc_id, sent_ix,
         |    lower(trim(regexp_replace(sentence, '\\s+', ' ', 'g'))) AS norm
         |  FROM s),
         |sc AS (SELECT doc_id, sent_ix, $oracleScores FROM n)
         |SELECT doc_id, sent_ix, $oracleCascade AS pred_lang,
         |  score_en, score_de, score_es, score_fr
         |FROM sc""".stripMargin
    },
    // Spans and the gate are pure functions of the construction:
    // even docs en(2) de(1) en(1) — dominant en at 750 permille; odd
    // docs en(2) de(1) fr(1) de(1) — en ties de at 2/5, the
    // lexicographic tie-break makes de dominant, the gate drops them.
    "q_lang_spans" ->
      """SELECT doc_id, CAST(j AS BIGINT) AS span_ix,
        |  CASE WHEN j = 0 THEN 'en'
        |       WHEN j = 1 THEN 'de'
        |       WHEN j = 2 AND doc_id % 2 = 0 THEN 'en'
        |       WHEN j = 2 THEN 'fr'
        |       ELSE 'de' END AS span_lang,
        |  CAST(CASE WHEN j = 0 THEN 2 ELSE 1 END AS BIGINT) AS n_sents
        |FROM documents, generate_series(0, 3) t(j)
        |WHERE doc_id % 2 = 1 OR j < 3""".stripMargin,
    "q_curated_multilang" ->
      """SELECT doc_id, lang, 'en' AS dom_lang,
        |  CAST(750 AS BIGINT) AS share_permille
        |FROM documents WHERE doc_id % 2 = 0""".stripMargin,
    "q_span_extract" -> {
      def lit(k: String): String = MixSentences(k)
      s"""SELECT doc_id,
         |  CASE WHEN doc_id % 2 = 0
         |    THEN '${lit("en1")} ${lit("en2")} ${lit("en3")}'
         |    ELSE '${lit("de1")} ${lit("de2")}' END AS text_kept,
         |  CAST(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 2 END AS BIGINT)
         |    AS n_kept,
         |  CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS BIGINT)
         |    AS n_dropped
         |FROM documents""".stripMargin
    },
    "q_quality_score" ->
      s"""WITH n AS ($NormCte)
         |SELECT doc_id, length(text) AS len,
         |  len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
         |  len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct,
         |  length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha_chars,
         |  ${oracleScore("en")} AS stop_hits,
         |  CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text) AS alpha_ratio,
         |  CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) / length(text) AS tokens_per_char,
         |  (len(string_split_regex(trim(text), '\\s+')) >= 5 AND
         |   len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) <= len(string_split_regex(trim(text), '\\s+'))) AS looks_clean
         |FROM n""".stripMargin,
    "q_bigram_familiarity" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        |  FROM documents),
        |bg AS (SELECT doc_id,
        |    unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]) AS ngram
        |  FROM w),
        |m AS (SELECT ngram, count(*) AS cnt FROM bg GROUP BY 1)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  CAST(sum(length(bin(cnt))) AS BIGINT) AS familiarity
        |FROM bg JOIN m USING (ngram)
        |GROUP BY 1""".stripMargin,
    "q_heldout_familiarity" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        |  FROM documents),
        |bg AS (SELECT doc_id,
        |    unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]) AS ngram
        |  FROM w),
        |sp AS (SELECT doc_id,
        |    ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |      % 1000000 < 800000 AS is_train FROM documents),
        |m AS (SELECT ngram, count(*) AS cnt
        |  FROM bg JOIN sp USING (doc_id) WHERE is_train GROUP BY 1)
        |SELECT bg.doc_id, count(*) AS n_bigrams,
        |  CAST(sum(CASE WHEN cnt IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  CAST(coalesce(sum(length(bin(cnt))), 0) AS BIGINT) AS familiarity
        |FROM bg JOIN sp USING (doc_id) LEFT JOIN m USING (ngram)
        |WHERE NOT is_train
        |GROUP BY 1""".stripMargin,
    "q_ngram_counts" ->
      """WITH w AS (SELECT string_split_regex(trim(text), '\s+') AS ws FROM documents),
        |g AS (SELECT unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]) AS ngram FROM w)
        |SELECT ngram, count(*) AS count FROM g GROUP BY 1 HAVING count(*) >= 20""".stripMargin,
    "q_fingerprint" ->
      s"WITH n AS ($NormCte) SELECT doc_id, md5(norm) AS fp FROM n",
    "q_rolling_fp" ->
      s"""WITH n AS ($NormCte)
         |SELECT doc_id, list_reduce(
         |  list_prepend(0::BIGINT,
         |    [unicode(substr(norm, i, 1))::BIGINT for i in range(1, length(norm) + 1)]),
         |  (h, c) -> (h * 1000003 + c) % 2147483647) AS rfp
         |FROM n""".stripMargin,
    "q_tfidf_topk" ->
      s"""WITH n AS ($NormCte),
         |tok AS (SELECT doc_id, unnest(string_split_regex(norm, '\\s+')) AS term FROM n),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |sc AS (SELECT t.doc_id, t.term, t.tf, d.df,
         |  round((t.tf * ((SELECT count(*) FROM documents) + 1.0)) / (d.df + 1.0), 6) AS score
         |  FROM tf t JOIN df d USING (term)),
         |r AS (SELECT *, row_number() OVER
         |  (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank FROM sc)
         |SELECT doc_id, term, tf, df, score, rank FROM r WHERE rank <= 3""".stripMargin,
    "q_top_words_per_lang" ->
      """WITH w AS (SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS word
        |  FROM documents),
        |c AS (SELECT lang, word, count(*) AS n FROM w GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER
        |  (PARTITION BY lang ORDER BY n DESC, word ASC) AS rank FROM c)
        |SELECT lang, word, n, rank FROM r WHERE rank <= 5""".stripMargin,
    // Identical regression: x = bitlen(rank), y = bitlen(freq); cross
    // products in HUGEINT (the oracle's DECIMAL(38,0) twin), one rounded
    // division; the degenerate all-x-equal case NULLs like the engine.
    "q_zipf_slope" ->
      s"""WITH n AS ($NormCte),
         |zw AS (SELECT unnest(string_split_regex(norm, '\\s+')) AS term FROM n),
         |zf AS (SELECT term, count(*) AS freq FROM zw GROUP BY 1),
         |zr AS (SELECT freq, row_number() OVER
         |  (ORDER BY freq DESC, term ASC) AS rank FROM zf),
         |zp AS (SELECT length(bin(rank)) AS x, length(bin(freq)) AS y FROM zr),
         |za AS (SELECT count(*) AS n_terms,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x * y) AS BIGINT) AS sxy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx FROM zp)
         |SELECT n_terms, sxy, sxx,
         |  CASE WHEN (n_terms::HUGEINT * sxx - sx::HUGEINT * sx) = 0 THEN NULL
         |    ELSE round((n_terms::HUGEINT * sxy - sx::HUGEINT * sy)::DOUBLE
         |      / (n_terms::HUGEINT * sxx - sx::HUGEINT * sx)::DOUBLE, 6)
         |  END AS slope
         |FROM za""".stripMargin,
    "q_token_quantiles" ->
      """SELECT lang, count(*) AS n_docs,
        |  quantile_cont(n_chars, 0.1) AS p10, quantile_cont(n_chars, 0.25) AS p25,
        |  quantile_cont(n_chars, 0.5) AS p50, quantile_cont(n_chars, 0.75) AS p75,
        |  quantile_cont(n_chars, 0.9) AS p90
        |FROM documents GROUP BY lang""".stripMargin
  )
}
