package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryPack

/** Corpus-curation queries over `documents`: deterministic stratified
  * sampling, intra-document repetition metrics, and the end-to-end keep-list
  * assembly. Oracles replicate the salted-md5 hash gate and the repetition
  * arithmetic value-for-value (gate thresholds are driver-computed integers
  * shared by both sides — see [[Curation.gateNumerator]]). */
object CurationPack extends QueryPack {

  /** Mixing rates by language — upsample the tail, downsample the head. */
  private val Rates = Map(
    "en" -> 0.5, "de" -> 1.0, "es" -> 0.25, "fr" -> 0.1, "zh" -> 0.05)

  private val RulesV = Curation.CurationRules(
    minWords = 20, minChars = 100L, maxChars = 2000L,
    maxDupWordFrac = 0.6, langRates = Rates)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Token-budget waterfill: allocate 2/3 of the corpus across sources as
    // min(avail, λ) with the water level λ integer-exact and the division
    // remainder spread deterministically — the cap-aware mixing allocation
    // every multi-source training run starts from.
    "q_budget_waterfill" -> { (s, dir) =>
      Curation.budgetWaterfill(graft.Tables.spread(table(s, dir, "documents")), "source", "n_chars")
    },
    // The allocation APPLIED: per source the hash-ordered document prefix
    // that fits its waterfilled budget — the deterministic corpus cut a
    // mixing run actually trains on.
    "q_budget_cut" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      Curation.budgetCut(graft.Tables.spread(table(s, dir, "documents")), "source", "n_chars")
    },
    // Leakage-safe split: the hash gate keyed on the GROUP (source domain)
    // instead of the document id, so every doc of a domain — including all
    // its intra-domain near-duplicates — lands in the same split and
    // train/test contamination through shared boilerplate is structurally
    // impossible. Same splitOf operator, different key: the leakage story
    // is a KEY CHOICE, not new machinery.
    // Small-files compaction plan: pack documents (in id order, n_chars
    // as the size) into ~4 KB output shards via the DISTRIBUTED prefix
    // sum — the table-maintenance bin-packer, oracle-pinned against the
    // textbook single-window cumulative sum.
    "q_compaction_plan" -> { (s, dir) =>
      Curation.compactionPlan(
        graft.Tables.spread(table(s, dir, "documents")).select(col("doc_id"), col("n_chars")),
        Seq(col("doc_id")), col("n_chars"), targetBytes = 4096L)
    },
    // Per-stage attrition accounting of the standard curation cascade —
    // the "where did my corpus go" report. Stage order matters (each
    // n_in is the previous n_kept) and matches how the gates run in
    // production: cheap length gates first, the tokenizing word-count
    // gate only on survivors, language routing last.
    "q_filter_cascade" -> { (s, dir) =>
      Integrity.filterCascade(graft.Tables.spread(table(s, dir, "documents")), Seq(
        "min_chars_100" -> (col("n_chars") >= 100L),
        "max_chars_450" -> (col("n_chars") <= 450L),
        "min_words_40" ->
          (size(graft.functions.TextFunctions.words(col("text"))) >= 40),
        "latin_lang" -> col("lang").isin("en", "es", "de", "fr")))
    },
    "q_split_by_group" -> { (s, dir) =>
      graft.Tables.spread(table(s, dir, "documents")).select(col("doc_id"), col("source"),
        Curation.splitOf(col("source"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
    },
    // Winsorize document lengths into the per-language [p05, p95] band —
    // exact order-statistic bounds, so the clamp is engine-exact.
    "q_winsorize" -> { (s, dir) =>
      Curation.winsorize(
        graft.Tables.spread(table(s, dir, "documents")).select(col("doc_id"), col("lang"), col("n_chars")),
        Seq("lang"), "n_chars", lo = (1L, 20L), hi = (19L, 20L))
        .select("doc_id", "lang", "n_chars", "clamped")
    },
    // Length outliers per language, all-integer ratio-to-mean bounds:
    // long > 1.5× the stratum mean, short < 0.5× it (cross-multiplied, no
    // float mean anywhere — the oracle replicates the comparison exactly).
    "q_length_outliers" -> { (s, dir) =>
      Curation.lengthOutliers(
          graft.Tables.spread(table(s, dir, "documents")).select(col("doc_id"), col("lang"), col("n_chars")),
          "n_chars", "lang", hiNum = 3L, hiDen = 2L, loNum = 1L, loDen = 2L)
        .select("doc_id", "lang", "n_chars", "outlier")
    },
    // Curriculum deciles by length within each language — total-order
    // ntile, so bucket edges are engine-stable through score ties.
    "q_curriculum" -> { (s, dir) =>
      Curation.curriculumBuckets(graft.Tables.spread(table(s, dir, "documents")), n = 10,
        strataCol = "lang", score = length(col("text")).cast("long"))
    },
    // Exactly 20 docs per language by salted-md5 draw — quota sampling
    // with an exact output size (eval-set construction).
    "q_sample_exact_k" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s) // md5_hash32 (the draw)
      Curation.sampleExactK(
          graft.Tables.spread(table(s, dir, "documents")).select("doc_id", "lang"),
          k = 20, strataCol = "lang")
        .select("doc_id", "lang", "draw_rank")
    },
    "q_sample_stratified" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      Curation.sampleStratified(graft.Tables.spread(table(s, dir, "documents")), Rates)
        .select("doc_id", "lang", "weight")
    },
    // α=1/2 temperature sampling toward 200 docs: keep rates ∝ √n_l/n_l,
    // so low-resource languages are upweighted — rates derived IN-plan
    // from the per-language counts (integer-exact, see
    // Curation.sampleTemperature).
    "q_sample_temperature" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      Curation.sampleTemperature(graft.Tables.spread(table(s, dir, "documents")), targetDocs = 200L)
        .select("doc_id", "lang", "n_strat", "gate_num")
    },
    // Poisson PPS sampling toward 150 expected docs, weighted by length —
    // inclusion test and audit probability both integer-exact
    // (Curation.samplePps).
    "q_sample_pps" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      Curation.samplePps(
        graft.Tables.spread(table(s, dir, "documents")).select("doc_id", "lang", "n_chars"),
        weightCol = "n_chars", k = 150L)
    },
    "q_repetition" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      Curation.repetition(graft.Tables.spread(table(s, dir, "documents")))
    },
    // Gopher duplicate-line signals (Curation.duplicateUnitStats). The
    // fixture text carries no newlines, so the lined form is constructed
    // in-query (the media-container pattern): normalized words wrapped
    // into 2-word lines joined by '\n' — duplicate lines then arise from
    // genuine intra-document phrase repetition (181/500 docs at sf0.01).
    "q_gopher_lines" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      val base = graft.Tables.spread(table(s, dir, "documents")).select(col("doc_id"),
        graft.functions.TextFunctions.words(
          graft.functions.TextFunctions.normalize(col("text"))).as("ws"))
      val lined = base.select(col("doc_id"),
        array_join(transform(
            sequence(lit(0), expr("(size(ws) + 1) div 2 - 1")),
            i => array_join(slice(col("ws"), i * 2 + 1, lit(2)), " ")),
          "\n").as("text"))
      Curation.duplicateUnitStats(lined)
    },
    // Gopher line-morphology battery (r11): the documents' words are
    // regrouped 3-per-line with bullets / trailing ellipses / #tags
    // injected on deterministic line indices, then lineMorphology must
    // produce the exact integer counts DuckDB re-derives from ITS OWN
    // identical construction (independent list-comprehension pipeline,
    // no shared code).
    "q_gopher_morph" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      val base = graft.Tables.spread(table(s, dir, "documents"))
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          graft.functions.TextFunctions.words(
            graft.functions.TextFunctions.normalize(col("text"))).as("ws"))
      val lined = base.select(col("doc_id"),
        array_join(transform(
            sequence(lit(0), expr("(size(ws) + 2) div 3 - 1")),
            i => concat(
              when(i % 3 === 0, lit("• ")).otherwise(lit("")),
              array_join(slice(col("ws"), i * 3 + 1, lit(3)), " "),
              when(i % 4 === 0, lit(" ...")).otherwise(lit("")),
              when(i % 5 === 0, lit(" #tag")).otherwise(lit("")))),
          "\n").as("text"))
      Curation.lineMorphology(lined)
    },
    // Gopher top word-n-gram character fraction for n = 2, 3, 4
    // (Curation.topNgramCharFrac) — deterministic argmax via max-struct,
    // oracle replicates with a window rank.
    "q_gopher_topngram" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      Curation.topNgramCharFrac(graft.Tables.spread(table(s, dir, "documents")))
    },
    "q_curated_corpus" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      Curation.curate(graft.Tables.spread(table(s, dir, "documents")), RulesV)
    },
    // Deterministic 80/10/10 train/val/test assignment — one hash draw on
    // contiguous ranges, disjoint and exhaustive by construction.
    "q_split_assign" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      graft.Tables.spread(table(s, dir, "documents"))
        .groupBy(Curation.splitOf(col("doc_id"),
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"),
          col("lang"))
        .agg(count(lit(1)).as("n_docs"))
    },
    // Sliding-window chunking into 32-token chunks with 8-token overlap —
    // context-window preparation, fully narrow (no shuffle).
    "q_doc_chunks" -> { (s, dir) =>
      Chunking.chunk(graft.Tables.spread(table(s, dir, "documents")), chunkTokens = 32,
        overlapTokens = 8)
    },
    // Greedy sequence packing into 512-token bins across 8 shards, ordered
    // by the salted-md5 global shuffle; one shuffle + one window pass.
    "q_pack_sequences" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      Chunking.packSequences(graft.Tables.spread(table(s, dir, "documents")), ctxTokens = 512,
          numShards = 8)
        .groupBy("shard", "bin")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("bin_tokens"))
    },
    // Deterministic per-epoch training order: 2 independent salted
    // permutations, positions via the distributed two-pass numbering.
    "q_epoch_order" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      Curation.epochOrder(graft.Tables.spread(table(s, dir, "documents")), epochs = 2)
    },
    // Deterministic 16-way output sharding + per-shard balance stats.
    "q_shard_assign" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      graft.Tables.spread(table(s, dir, "documents"))
        .groupBy(Curation.shardOf(col("doc_id"), 16).as("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("total_chars"))
    },
    // Key-list application with the bloom prefilter (BloomJoin): restrict /
    // exclude a fact table by a key set. Semantics are EXACT (verify join
    // removes false positives) — the oracle is the plain IN / NOT IN query.
    "q_bloom_semijoin" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      val ev = table(s, dir, "events")
      val keys = ev.filter(col("event_type") === "purchase" && col("value") > 200)
        .select("user_id").distinct()
      BloomJoin.semiJoin(ev, "user_id", keys, "user_id",
          estItems = 10000L, numBits = 65536L)
        .groupBy("user_id").agg(count(lit(1)).as("n_events"))
    },
    "q_bloom_anti" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      val ev = table(s, dir, "events")
      val keys = ev.filter(col("event_type") === "purchase" && col("value") > 200)
        .select("user_id").distinct()
      BloomJoin.antiJoin(ev, "user_id", keys, "user_id",
          estItems = 10000L, numBits = 65536L)
        .groupBy("user_id").agg(count(lit(1)).as("n_events"))
    }
  )

  /** `mix`-salted md5 gate, same integer threshold as the Spark literal. */
  private def gateSql(saltExpr: String): String =
    s"('0x' || substr(md5('mix:' || $saltExpr), 1, 8))::BIGINT % ${Curation.SampleDenom}"

  private def rateCase(f: Double => String): String =
    "CASE " + Rates.toSeq.sortBy(_._1).map { case (k, r) =>
      s"WHEN lang = '$k' THEN ${f(r)}"
    }.mkString(" ") + " ELSE NULL END"

  /** Normalized token list + repetition metrics, shared by two oracles.
    * Raw margins — interpolated into strings that stripMargin ONCE. */
  private val RepCtes =
    """w AS (SELECT doc_id, lang, text, string_split_regex(
      |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), '\s+') AS ws
      |  FROM documents),
      |rep AS (SELECT doc_id, lang, text, len(ws) AS n_words,
      |  1.0 - CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) AS dup_word_frac,
      |  len(ws) - 1 AS n_bigrams_raw,
      |  [ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))] AS bi
      |  FROM w)"""

  /** DuckDB CTE chain ending in `alloc(source, avail, allocated)` — the
    * integer waterfill over per-source n_chars at budget 2/3, replicating
    * [[Curation.budgetWaterfill]] step for step. Shared by the
    * `q_budget_waterfill` and `q_budget_cut` oracles. */
  private val WaterfillAllocCte: String =
    """per AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS avail
      |    FROM documents GROUP BY 1),
      |t AS (SELECT *,
      |    CAST(row_number() OVER (ORDER BY avail, source) AS BIGINT) AS rn,
      |    CAST(sum(avail) OVER (ORDER BY avail, source
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
      |    CAST(count(*) OVER () AS BIGINT) AS k,
      |    CAST((sum(avail) OVER () * 2) // 3 AS BIGINT) AS b
      |  FROM per),
      |f AS (SELECT *, cum + avail * (k - rn) <= b AS is_full FROM t),
      |g AS (SELECT *,
      |    CAST(coalesce(max(CASE WHEN is_full THEN rn END) OVER (), 0)
      |      AS BIGINT) AS p,
      |    CAST(coalesce(max(CASE WHEN is_full THEN cum END) OVER (), 0)
      |      AS BIGINT) AS cum_p
      |  FROM f),
      |alloc AS (SELECT source, avail,
      |  CAST(CASE WHEN is_full THEN avail
      |    WHEN rn - p <= (b - cum_p) % (k - p) THEN (b - cum_p) // (k - p) + 1
      |    ELSE (b - cum_p) // (k - p) END AS BIGINT) AS allocated
      |  FROM g)""".stripMargin

  override def oracles: Map[String, String] = Map(
    "q_budget_waterfill" ->
      s"""WITH $WaterfillAllocCte
        |SELECT source, avail, allocated FROM alloc""".stripMargin,
    "q_budget_cut" ->
      s"""WITH $WaterfillAllocCte,
        |d AS (SELECT doc_id, source, n_chars,
        |    ('0x' || substr(md5('cut:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |      AS h
        |  FROM documents),
        |c AS (SELECT doc_id, source, n_chars,
        |    CAST(sum(n_chars) OVER (PARTITION BY source ORDER BY h, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_chars
        |  FROM d)
        |SELECT doc_id, source, n_chars, cum_chars
        |FROM c JOIN alloc USING (source)
        |WHERE cum_chars <= allocated""".stripMargin,
    "q_compaction_plan" ->
      """WITH c AS (SELECT doc_id, n_chars,
        |    CAST(sum(n_chars) OVER (ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_bytes
        |  FROM documents)
        |SELECT doc_id, n_chars, cum_bytes,
        |  CAST(greatest(cum_bytes - 1, 0) // 4096 AS BIGINT) AS shard
        |FROM c""".stripMargin,
    "q_filter_cascade" ->
      """WITH f AS (SELECT n_chars >= 100 AS s1, n_chars <= 450 AS s2,
        |    len(string_split_regex(trim(text), '\s+')) >= 40 AS s3,
        |    lang IN ('en','es','de','fr') AS s4 FROM documents),
        |c AS (SELECT CAST(count(*) AS BIGINT) AS c0,
        |    CAST(sum(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(sum(CASE WHEN s1 AND s2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
        |    CAST(sum(CASE WHEN s1 AND s2 AND s3 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
        |    CAST(sum(CASE WHEN s1 AND s2 AND s3 AND s4 THEN 1 ELSE 0 END) AS BIGINT) AS c4
        |  FROM f)
        |SELECT 1::BIGINT AS stage, 'min_chars_100' AS filter,
        |    c0 AS n_in, c1 AS n_kept, c0 - c1 AS n_dropped FROM c
        |UNION ALL SELECT 2, 'max_chars_450', c1, c2, c1 - c2 FROM c
        |UNION ALL SELECT 3, 'min_words_40', c2, c3, c2 - c3 FROM c
        |UNION ALL SELECT 4, 'latin_lang', c3, c4, c3 - c4 FROM c""".stripMargin,
    "q_bloom_semijoin" ->
      """SELECT user_id, count(*) AS n_events FROM events
        |WHERE user_id IN (SELECT user_id FROM events
        |  WHERE event_type = 'purchase' AND value > 200)
        |GROUP BY 1""".stripMargin,
    "q_bloom_anti" ->
      """SELECT user_id, count(*) AS n_events FROM events
        |WHERE user_id NOT IN (SELECT user_id FROM events
        |  WHERE event_type = 'purchase' AND value > 200)
        |GROUP BY 1""".stripMargin,
    "q_winsorize" ->
      """WITH r AS (SELECT lang, n_chars,
        |    row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents),
        |b AS (SELECT lang,
        |    max(CASE WHEN rn = (n * 1 + 19) // 20 THEN n_chars END) AS lo,
        |    max(CASE WHEN rn = (n * 19 + 19) // 20 THEN n_chars END) AS hi
        |  FROM r GROUP BY 1)
        |SELECT doc_id, lang, n_chars,
        |  least(greatest(n_chars, lo), hi) AS clamped
        |FROM documents JOIN b USING (lang)""".stripMargin,
    "q_split_by_group" ->
      """WITH d AS (SELECT doc_id, source,
        |  ('0x' || substr(md5('split:' || source), 1, 8))::BIGINT
        |    % 1000000 AS h FROM documents)
        |SELECT doc_id, source,
        |  CASE WHEN h < 800000 THEN 'train'
        |       WHEN h < 900000 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM d""".stripMargin,
    "q_length_outliers" ->
      """WITH s AS (SELECT lang, count(*) AS n, sum(n_chars) AS tot
        |    FROM documents GROUP BY 1),
        |o AS (SELECT doc_id, lang, n_chars,
        |  CASE WHEN CAST(n_chars AS HUGEINT) * n * 2 > 3 * CAST(tot AS HUGEINT)
        |         THEN 'long'
        |       WHEN CAST(n_chars AS HUGEINT) * n * 2 < CAST(tot AS HUGEINT)
        |         THEN 'short' END AS outlier
        |  FROM documents JOIN s USING (lang))
        |SELECT * FROM o WHERE outlier IS NOT NULL""".stripMargin,
    "q_curriculum" ->
      """SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS score,
        |  CAST(ntile(10) OVER (PARTITION BY lang
        |    ORDER BY length(text), doc_id) AS BIGINT) AS bucket
        |FROM documents""".stripMargin,
    "q_sample_exact_k" ->
      """WITH h AS (SELECT doc_id, lang,
        |    ('0x' || substr(md5('exactk:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS hv
        |  FROM documents),
        |r AS (SELECT doc_id, lang, CAST(row_number() OVER (PARTITION BY lang
        |    ORDER BY hv, doc_id) AS BIGINT) AS draw_rank FROM h)
        |SELECT doc_id, lang, draw_rank FROM r WHERE draw_rank <= 20""".stripMargin,
    "q_sample_temperature" ->
      s"""WITH s AS (SELECT lang, count(*) AS n_strat,
         |    CAST(floor(sqrt(count(*))) AS BIGINT) AS w
         |  FROM documents GROUP BY 1),
         |r AS (SELECT lang, n_strat,
         |    CAST(least((200 * w * ${Curation.SampleDenom}) //
         |               (sum(w) OVER () * n_strat),
         |           ${Curation.SampleDenom}) AS BIGINT) AS gate_num FROM s)
         |SELECT d.doc_id, d.lang, r.n_strat, r.gate_num
         |FROM documents d JOIN r USING (lang)
         |WHERE ('0x' || substr(md5('temp:' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
         |      % ${Curation.SampleDenom} < r.gate_num""".stripMargin,
    // The inclusion product and the W multiplier run in HUGEINT, the same
    // exact arithmetic as Spark's DECIMAL(38,0) cross-multiply.
    "q_sample_pps" ->
      s"""WITH t AS (SELECT CAST(sum(n_chars) AS BIGINT) AS w_total
         |  FROM documents)
         |SELECT d.doc_id, d.lang, d.n_chars,
         |  CAST(least(1000, (1000::HUGEINT * 150 * d.n_chars) // t.w_total)
         |    AS BIGINT) AS p_permille
         |FROM documents d JOIN t ON TRUE
         |WHERE (('0x' || substr(md5('pps:' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
         |       % ${Curation.SampleDenom})::HUGEINT * t.w_total
         |      < 150::HUGEINT * d.n_chars * ${Curation.SampleDenom}""".stripMargin,
    "q_sample_stratified" ->
      s"""SELECT doc_id, lang,
         |  1.0 / ${rateCase(_.toString)} AS weight
         |FROM documents
         |WHERE ${rateCase(r => Curation.gateNumerator(r).toString)} IS NOT NULL
         |  AND ${gateSql("CAST(doc_id AS VARCHAR)")} <
         |      ${rateCase(r => Curation.gateNumerator(r).toString)}""".stripMargin,
    "q_repetition" ->
      s"""WITH $RepCtes
         |SELECT doc_id, n_words, dup_word_frac,
         |  greatest(n_bigrams_raw, 0) AS n_bigrams,
         |  CASE WHEN n_bigrams_raw > 0
         |    THEN 1.0 - CAST(len(list_distinct(bi)) AS DOUBLE) / n_bigrams_raw
         |    ELSE NULL END AS dup_bigram_frac
         |FROM rep""".stripMargin,
    // The lined form replicated step for step: normalized words → 2-word
    // wrap → non-empty units → per-(doc, unit) counts → per-doc sums.
    // Fractions are single divisions of exact integers on both engines.
    // Independent reconstruction + morphology: the same 3-word lines
    // with CASE-injected bullets/ellipses/#tags, then every count from
    // DuckDB's own list comprehensions and string arithmetic.
    "q_gopher_morph" ->
      """WITH w AS (SELECT doc_id, string_split_regex(
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), '\s+') AS ws
        |  FROM documents WHERE text IS NOT NULL),
        |built AS (SELECT doc_id, array_to_string(
        |  [(CASE WHEN i % 3 = 0 THEN chr(8226) || ' ' ELSE '' END) ||
        |   array_to_string(ws[3*i+1:3*i+3], ' ') ||
        |   (CASE WHEN i % 4 = 0 THEN ' ...' ELSE '' END) ||
        |   (CASE WHEN i % 5 = 0 THEN ' #tag' ELSE '' END)
        |   for i in range(0, (len(ws)+2)//3)], chr(10)) AS t
        |  FROM w),
        |p AS (SELECT doc_id, t,
        |    [x for x in list_transform(string_split(t, chr(10)),
        |       y -> trim(y)) if length(x) > 0] AS lines,
        |    [x for x in string_split_regex(trim(t), '\s+')
        |       if length(x) > 0] AS wds
        |  FROM built)
        |SELECT doc_id,
        |  CAST(len(lines) AS BIGINT) AS n_lines,
        |  CAST(len([x for x in lines
        |    if regexp_matches(x, '^[•‣▪◦·*-]')]) AS BIGINT)
        |    AS n_bullet_lines,
        |  CAST(len([x for x in lines
        |    if regexp_matches(x, '(\.\.\.|…)$')]) AS BIGINT)
        |    AS n_ellipsis_lines,
        |  CAST(len(wds) AS BIGINT) AS n_words,
        |  CAST(len([x for x in wds
        |    if regexp_matches(x, '\p{L}')]) AS BIGINT) AS n_alpha_words,
        |  CAST(coalesce(list_sum(list_transform(wds, x -> length(x))), 0)
        |    AS BIGINT) AS word_chars,
        |  CAST(length(t) - length(replace(t, '#', '')) AS BIGINT) AS n_hash,
        |  CAST((length(t) - length(replace(t, chr(8230), ''))) +
        |    (length(t) - length(replace(t, '...', ''))) // 3 AS BIGINT)
        |    AS n_ellipsis_sym
        |FROM p""".stripMargin,
    "q_gopher_lines" ->
      """WITH w AS (SELECT doc_id, string_split_regex(
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), '\s+') AS ws
        |  FROM documents),
        |l AS (SELECT doc_id, unnest(
        |    [array_to_string(ws[2*i+1:2*i+2], ' ')
        |     for i in range(0, (len(ws)+1)//2)]) AS unit FROM w),
        |nz AS (SELECT doc_id, unit FROM l WHERE length(trim(unit)) > 0),
        |c AS (SELECT doc_id, unit, count(*) AS c FROM nz GROUP BY 1, 2)
        |SELECT doc_id,
        |  CAST(sum(c) AS BIGINT) AS n_units,
        |  CAST(sum(c - 1) AS BIGINT) AS dup_units,
        |  CAST(sum(c - 1) AS DOUBLE) / CAST(sum(c) AS BIGINT) AS dup_unit_frac,
        |  CAST(sum(length(unit) * c) AS BIGINT) AS unit_chars,
        |  CAST(sum(length(unit) * (c - 1)) AS BIGINT) AS dup_unit_chars,
        |  CAST(sum(length(unit) * (c - 1)) AS DOUBLE)
        |    / CAST(sum(length(unit) * c) AS BIGINT) AS dup_char_frac
        |FROM c GROUP BY 1""".stripMargin,
    // Window-rank replica of the max-struct argmax: highest count, then
    // lexicographically largest n-gram (binary order on both engines).
    "q_gopher_topngram" ->
      """WITH t AS (SELECT doc_id,
        |    string_split_regex(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), '\s+') AS ws,
        |    length(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS tc
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, 2 AS n, tc, unnest(
        |    [ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]) AS ng FROM t
        |  UNION ALL
        |  SELECT doc_id, 3, tc, unnest(
        |    [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |     for i in range(1, len(ws)-1)]) FROM t
        |  UNION ALL
        |  SELECT doc_id, 4, tc, unnest(
        |    [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
        |     for i in range(1, len(ws)-2)]) FROM t),
        |c AS (SELECT doc_id, n, ng, tc, count(*) AS c FROM g GROUP BY 1, 2, 3, 4),
        |r AS (SELECT *, row_number() OVER (
        |    PARTITION BY doc_id, n ORDER BY c DESC, ng DESC) AS rn FROM c)
        |SELECT doc_id, n, ng AS top_ngram, CAST(c AS BIGINT) AS top_count,
        |  CAST(c * length(ng) AS BIGINT) AS ngram_chars,
        |  CAST(c * length(ng) AS DOUBLE) / tc AS top_char_frac
        |FROM r WHERE rn = 1""".stripMargin,
    "q_split_assign" ->
      """WITH d AS (SELECT lang,
        |  ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |    % 1000000 AS h FROM documents)
        |SELECT CASE WHEN h < 800000 THEN 'train'
        |            WHEN h < 900000 THEN 'val'
        |            ELSE 'test' END AS split,
        |  lang, count(*) AS n_docs
        |FROM d GROUP BY 1, 2""".stripMargin,
    "q_doc_chunks" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split_regex(trim(text), '\s+'),
        |                x -> x <> '') AS toks FROM documents),
        |n AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n FROM t
        |    WHERE len(toks) > 0),
        |c AS (SELECT doc_id, toks, n,
        |    unnest(generate_series(0, CASE WHEN n <= 32 THEN 0
        |      ELSE (n - 32 + 23) // 24 END)) AS chunk_ix FROM n)
        |SELECT doc_id, chunk_ix,
        |  array_to_string(list_slice(toks, chunk_ix*24 + 1, chunk_ix*24 + 32), ' ')
        |    AS chunk_text,
        |  CAST(least(32, n - chunk_ix*24) AS BIGINT) AS n_tokens
        |FROM c""".stripMargin,
    "q_pack_sequences" ->
      """WITH d AS (SELECT doc_id,
        |    ('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8 AS shard,
        |    md5(CAST(doc_id AS VARCHAR)) AS ord,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (SELECT shard, doc_id, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY ord, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum FROM d)
        |SELECT shard, CAST((cum - n_tokens) // 512 AS BIGINT) AS bin,
        |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
        |FROM c GROUP BY 1, 2""".stripMargin,
    // Same per-epoch salted permutation; positions = partitioned
    // row_number (the oracle can afford the per-epoch window — the engine
    // side uses the distributed numbering instead).
    "q_epoch_order" ->
      """WITH e AS (SELECT doc_id, unnest([0, 1]) AS epoch FROM documents),
        |h AS (SELECT doc_id, epoch,
        |    ('0x' || substr(md5('epoch' || CAST(epoch AS VARCHAR) || ':'
        |      || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS hv
        |  FROM e)
        |SELECT doc_id, CAST(epoch AS BIGINT) AS epoch,
        |  CAST(row_number() OVER (PARTITION BY epoch ORDER BY hv, doc_id)
        |    AS BIGINT) AS position
        |FROM h""".stripMargin,
    "q_shard_assign" ->
      s"""SELECT ('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 16 AS shard,
         |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
         |FROM documents GROUP BY 1""".stripMargin,
    "q_curated_corpus" ->
      s"""WITH keep AS (SELECT min(doc_id) AS doc_id FROM documents
         |  GROUP BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))),
         |$RepCtes,
         |gated AS (SELECT r.doc_id, r.lang, r.n_words, r.dup_word_frac
         |  FROM rep r JOIN keep k ON k.doc_id = r.doc_id
         |  WHERE r.n_words >= ${RulesV.minWords}
         |    AND length(r.text) BETWEEN ${RulesV.minChars} AND ${RulesV.maxChars}
         |    AND r.dup_word_frac <= ${RulesV.maxDupWordFrac})
         |SELECT doc_id, lang, n_words, dup_word_frac,
         |  1.0 / ${rateCase(_.toString)} AS weight
         |FROM gated
         |WHERE ${rateCase(r => Curation.gateNumerator(r).toString)} IS NOT NULL
         |  AND ${gateSql("CAST(doc_id AS VARCHAR)")} <
         |      ${rateCase(r => Curation.gateNumerator(r).toString)}""".stripMargin
  )
}
