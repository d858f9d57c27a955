package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryPack

/** Driver queries for [[Retrieval]] — BM25 ranking, hashed-linear
  * quality-filter inference, classifier evaluation (AUC / calibration),
  * and reciprocal-rank fusion over `documents`. Oracles replicate the
  * exact integer arithmetic (bit-length logs, scale-cleared tf
  * normalization, DECIMAL order-free sums, the md5-based feature hash),
  * so every query hash-compares value-for-value. Shared SQL fragments
  * ([[Bm25Tail]], [[LabeledTail]]) keep the two ranking definitions single
  * — q_rank_fusion composes the SAME CTE chains its input rankings use,
  * so they cannot drift apart.
  */
object RetrievalPack extends QueryPack {

  /** Fixed query-term set: one rare term (high integer idf) plus three
    * near-ubiquitous ones — exercises the idf spread AND the multi-term
    * decimal sum on the fixture vocabulary. */
  private[graft] val Bm25Terms = Seq("dup", "vector", "spark", "merge")
  private val TopN = 20
  private[graft] val ClassifierDim = 1024L
  private[graft] val LabelChars = 180L

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bm25_topk" -> { (s, dir) =>
      Retrieval.bm25TopK(table(s, dir, "documents"), Bm25Terms, TopN)
    },
    "q_quality_classifier" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s) // md5_hash32 (the feature hash)
      Retrieval.hashedLinearMargin(table(s, dir, "documents"), ClassifierDim)
    },
    // Exact ROC-AUC of the classifier margin against the length label —
    // the filter-quality audit: margin + label in ONE scan (no re-join),
    // ranks from the value-sized margin histogram.
    "q_classifier_auc" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      Retrieval.classifierAuc(labeled(s, dir))
    },
    // Margin-decile calibration of the same score/label pair.
    "q_classifier_calibration" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      Retrieval.classifierCalibration(labeled(s, dir), width = 10L)
    },
    // Per-language AUC of the same score/label pair — the per-slice model
    // audit, fully partitioned (no single-partition stage).
    "q_classifier_auc_by_lang" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      Retrieval.classifierAucBy(
        table(s, dir, "documents").select(col("lang"),
          (col("n_chars") >= LabelChars).as("label"),
          Retrieval.marginOf(col("text"), ClassifierDim).as("margin")),
        groupCol = "lang")
    },
    // Incremental BM25: every 10th doc scored as a NEW batch against the
    // frozen full-corpus index (N, S, df) — cost scales with the batch.
    "q_bm25_incremental" -> { (s, dir) =>
      val docs = table(s, dir, "documents")
      val idx = Retrieval.bm25Index(docs, Bm25Terms)
      Retrieval.bm25Score(docs.filter(col("doc_id") % 10 === 0), idx, Bm25Terms)
    },
    // Corpus-relative percentile of every doc's quality margin — the
    // threshold-free normalization (histogram broadcast-join, map-only).
    "q_score_percentiles" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      Retrieval.scorePercentiles(
        table(s, dir, "documents").select(col("doc_id"),
          Retrieval.marginOf(col("text"), ClassifierDim).as("margin")))
        .select("doc_id", "margin", "pct")
    },
    // RRF of the lexical BM25 top-20 with the model-quality top-20 — the
    // relevance×quality list merge; both inputs are the exact rankings
    // their standalone queries produce.
    "q_rank_fusion" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      val docs = table(s, dir, "documents")
      val bm = Retrieval.bm25TopK(docs, Bm25Terms, TopN)
        .select(col("doc_id"), col("rank"))
      val ord = Seq(col("margin").desc, col("doc_id").asc)
      val mr = docs
        .select(col("doc_id"),
          Retrieval.marginOf(col("text"), ClassifierDim).as("margin"))
        .orderBy(ord: _*).limit(TopN)
        .withColumn("rank", row_number().over(Window.orderBy(ord: _*)).cast("long"))
        .select("doc_id", "rank")
      Retrieval.rrfFuse(Seq(bm, mr), topN = 10)
    }
  )

  /** Margin + boolean label in one scan: label = "document is long"
    * (n_chars ≥ 180) — the deterministic stand-in target the audit queries
    * grade the hashed-linear score against. */
  private def labeled(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents").select(
      (col("n_chars") >= LabelChars).as("label"),
      Retrieval.marginOf(col("text"), ClassifierDim).as("margin"))

  private val NormCte =
    "SELECT *, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm FROM documents"

  private def termList = Bm25Terms.map(t => s"'$t'").mkString("(", ", ", ")")

  /** BM25 CTE chain after `n` (the normalized scan): per-doc token lists →
    * (N, S) one-row stats → query-term tf/df → integer-cleared score →
    * DECIMAL(20,6) per-doc sums → full ranking in `r`. `length(bin(x))`
    * is the shared exact log2. Margins raw — strip ONCE downstream. */
  private def Bm25Tail: String =
    s"""t AS (SELECT doc_id, string_split_regex(norm, '\\s+') AS toks FROM n),
       |d AS (SELECT doc_id, len(toks) AS dl, toks FROM t),
       |stats AS (SELECT count(*) AS nd, CAST(sum(dl) AS BIGINT) AS s FROM d),
       |base AS (SELECT doc_id, dl, unnest(toks) AS term FROM d),
       |m AS (SELECT doc_id, dl, term, count(*) AS tf FROM base
       |  WHERE term IN $termList GROUP BY 1, 2, 3),
       |df AS (SELECT term, count(*) AS df FROM m GROUP BY 1),
       |sc AS (SELECT m.doc_id,
       |    round(((length(bin(stats.nd)) - length(bin(df.df)) + 1)
       |        * (22 * stats.s * m.tf))::DOUBLE
       |      / (10 * stats.s * m.tf + 3 * stats.s + 9 * stats.nd * m.dl)::DOUBLE,
       |      6) AS score, m.tf
       |  FROM m JOIN df USING (term) CROSS JOIN stats),
       |agg AS (SELECT doc_id, count(*) AS n_terms,
       |    CAST(sum(tf) AS BIGINT) AS n_hits,
       |    CAST(sum(CAST(score AS DECIMAL(20,6))) AS DOUBLE) AS bm25
       |  FROM sc GROUP BY 1),
       |r AS (SELECT *, row_number() OVER
       |  (ORDER BY bm25 DESC, doc_id ASC) AS rank FROM agg)""".stripMargin

  /** Hashed-linear margin + n_chars label chain after `n` — the SQL twin
    * of [[labeled]], ending in `g` (doc_id, lang, label, margin). CTE
    * names are disjoint from [[Bm25Tail]] so the two chains compose in one
    * WITH. */
  private def LabeledTail: String =
    s"""lt AS (SELECT doc_id, lang, n_chars >= $LabelChars AS label,
       |  string_split_regex(norm, '\\s+') AS toks FROM n),
       |lu AS (SELECT doc_id, lang, label, unnest(toks) AS w FROM lt),
       |g AS (SELECT doc_id, any_value(lang) AS lang, any_value(label) AS label,
       |    CAST(sum(((('0x' || substr(md5(w), 1, 8))::BIGINT % $ClassifierDim)
       |      % 21) - 10) AS BIGINT) AS margin
       |  FROM lu GROUP BY 1)""".stripMargin

  override def oracles: Map[String, String] = Map(
    "q_bm25_topk" ->
      s"""WITH n AS ($NormCte),
         |$Bm25Tail
         |SELECT doc_id, n_terms, n_hits, bm25, rank FROM r WHERE rank <= $TopN""".stripMargin,
    // The identical fold, unrolled relationally: unnest → per-token integer
    // weight from the md5 feature hash → per-doc sum. The md5 prefix cast
    // is the shared 32-bit hash (cf. LmPack's split gate).
    "q_quality_classifier" ->
      s"""WITH n AS ($NormCte),
         |t AS (SELECT doc_id, lang, string_split_regex(norm, '\\s+') AS toks FROM n),
         |u AS (SELECT doc_id, lang, len(toks) AS n_tokens, unnest(toks) AS w FROM t),
         |g AS (SELECT doc_id, any_value(lang) AS lang,
         |    CAST(any_value(n_tokens) AS BIGINT) AS n_tokens,
         |    CAST(sum(((('0x' || substr(md5(w), 1, 8))::BIGINT % $ClassifierDim)
         |      % 21) - 10) AS BIGINT) AS margin
         |  FROM u GROUP BY 1)
         |SELECT doc_id, lang, n_tokens, margin, margin > 0 AS kept FROM g""".stripMargin,
    // Mann–Whitney AUC from the margin histogram: identical tie-averaged
    // rank algebra (Σ2R⁺ via 2·c_lt + n + 1), exact integers until the one
    // rounded division. Window frame: ORDER BY on distinct margins, so
    // RANGE-to-current-row matches Spark's default frame exactly.
    "q_classifier_auc" ->
      s"""WITH n AS ($NormCte),
         |$LabeledTail,
         |h AS (SELECT margin, count(*) AS n,
         |    CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS np
         |  FROM g GROUP BY 1),
         |w AS (SELECT *, sum(n) OVER (ORDER BY margin) - n AS c_lt FROM h),
         |a AS (SELECT CAST(sum(np * (2 * c_lt + n + 1)) AS BIGINT) AS s2r,
         |    CAST(sum(np) AS BIGINT) AS n_pos,
         |    CAST(sum(n - np) AS BIGINT) AS n_neg FROM w)
         |SELECT n_pos, n_neg,
         |  CAST(s2r - n_pos * (n_pos + 1) AS BIGINT) AS auc_num,
         |  round((s2r - n_pos * (n_pos + 1))::DOUBLE
         |    / (2 * n_pos * n_neg)::DOUBLE, 6) AS auc
         |FROM a""".stripMargin,
    "q_classifier_calibration" ->
      s"""WITH n AS ($NormCte),
         |$LabeledTail
         |SELECT CAST(floor(margin::DOUBLE / 10.0) AS BIGINT) AS bucket,
         |  count(*) AS n,
         |  CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         |  round(sum(CASE WHEN label THEN 1 ELSE 0 END)::DOUBLE
         |    / count(*)::DOUBLE, 6) AS pos_rate
         |FROM g GROUP BY 1""".stripMargin,
    // Per-language AUC: the same rank algebra with every window and
    // aggregate PARTITIONED by lang.
    "q_classifier_auc_by_lang" ->
      s"""WITH n AS ($NormCte),
         |$LabeledTail,
         |h AS (SELECT lang, margin, count(*) AS n,
         |    CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS np
         |  FROM g GROUP BY 1, 2),
         |w AS (SELECT *, sum(n) OVER
         |  (PARTITION BY lang ORDER BY margin) - n AS c_lt FROM h),
         |a AS (SELECT lang,
         |    CAST(sum(np * (2 * c_lt + n + 1)) AS BIGINT) AS s2r,
         |    CAST(sum(np) AS BIGINT) AS n_pos,
         |    CAST(sum(n - np) AS BIGINT) AS n_neg FROM w GROUP BY 1)
         |SELECT lang, n_pos, n_neg,
         |  CAST(s2r - n_pos * (n_pos + 1) AS BIGINT) AS auc_num,
         |  CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
         |    ELSE round((s2r - n_pos * (n_pos + 1))::DOUBLE
         |      / (2 * n_pos * n_neg)::DOUBLE, 6) END AS auc
         |FROM a""".stripMargin,
    // Incremental scoring against the frozen corpus index is pointwise, so
    // restricting the full-corpus per-doc table to the batch IS the
    // incremental result (per-doc score depends only on own tf/dl plus the
    // corpus N/S/df).
    "q_bm25_incremental" ->
      s"""WITH n AS ($NormCte),
         |$Bm25Tail
         |SELECT doc_id, n_terms, n_hits, bm25 FROM agg
         |WHERE doc_id % 10 = 0""".stripMargin,
    // Same tie-averaged midrank percentile from the margin histogram
    // ((2·c_lt + n + 1)/(2N)), joined back per doc.
    "q_score_percentiles" ->
      s"""WITH n AS ($NormCte),
         |$LabeledTail,
         |h AS (SELECT margin, count(*) AS cnt FROM g GROUP BY 1),
         |cum AS (SELECT margin, cnt,
         |    sum(cnt) OVER (ORDER BY margin) - cnt AS c_lt,
         |    sum(cnt) OVER () AS total FROM h)
         |SELECT g.doc_id, g.margin,
         |  round((2 * c.c_lt + c.cnt + 1)::DOUBLE / (2 * c.total)::DOUBLE, 6) AS pct
         |FROM g JOIN cum c USING (margin)""".stripMargin,
    // RRF over the two shared ranking chains: contribution rounded to 9 dp
    // once, summed as DECIMAL(12,9) — order-free exactly like the Spark
    // side's decimal sum.
    "q_rank_fusion" ->
      s"""WITH n AS ($NormCte),
         |$Bm25Tail,
         |$LabeledTail,
         |bm AS (SELECT doc_id, rank FROM r WHERE rank <= $TopN),
         |mrr AS (SELECT doc_id, row_number() OVER
         |  (ORDER BY margin DESC, doc_id ASC) AS rank FROM g),
         |mr AS (SELECT doc_id, rank FROM mrr WHERE rank <= $TopN),
         |u2 AS (SELECT doc_id,
         |    CAST(round(1.0 / (60 + rank), 9) AS DECIMAL(12,9)) AS c FROM bm
         |  UNION ALL SELECT doc_id,
         |    CAST(round(1.0 / (60 + rank), 9) AS DECIMAL(12,9)) AS c FROM mr),
         |f AS (SELECT doc_id, count(*) AS n_lists,
         |    CAST(sum(c) AS DOUBLE) AS rrf FROM u2 GROUP BY 1),
         |rr AS (SELECT *, row_number() OVER
         |  (ORDER BY rrf DESC, doc_id ASC) AS rank FROM f)
         |SELECT doc_id, n_lists, rrf, rank FROM rr WHERE rank <= 10""".stripMargin
  )
}
