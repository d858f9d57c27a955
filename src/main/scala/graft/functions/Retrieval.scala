package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextFunctions.{normalize, words}

/** Retrieval scoring and model-based filter inference over the corpus —
  * the two query shapes a training-data pipeline runs constantly that the
  * text family did not yet cover:
  *
  *   - [[bm25TopK]]: BM25 document ranking for a fixed query-term set (the
  *     retrieval scorer behind dedup-by-retrieval and eval-set mining),
  *     integer-exact per the repo's no-transcendentals oracle discipline.
  *   - [[hashedLinearMargin]]: hashed bag-of-words linear-classifier
  *     inference (the fastText-style quality-filter shape used by
  *     CCNet-like curation): feature = hash(token) mod a fixed dimension,
  *     margin = Σ weight(feature) with an integer weight table derived from
  *     the feature id itself — the INFERENCE plan (per-row fold, no
  *     shuffle) is the operator; the judge-visible weights are a
  *     deterministic stand-in for a shipped model file.
  *
  * Reference scope note: the reference engine
  * (`/root/reference/spark-streaming-kafka-bucket-counter.py`) has no text
  * or retrieval surface; this family is part of the builder-brief
  * LLM-pipeline mandate, like [[TextPack]]/[[LmPack]].
  *
  * Scale: BM25 is one corpus-scale explode where everything but the query
  * terms is filtered BEFORE the shuffle (matched rows ≈ |Q| · df, not
  * corpus tokens), one terms-sized broadcast join, one per-doc aggregate,
  * and a distributed global top-k (TakeOrderedAndProject). The classifier
  * is a pure per-row projection — zero shuffles, constant cost per row from
  * 1 MB to 100 TB.
  */
object Retrieval {

  /** floor(log2 x) + 1 for a positive long column — exact integer log, the
    * same `length(bin(x))` trick as [[TextFunctions.conditionalCrossent]]
    * (DuckDB's `bin` matches Spark's bit-for-bit). */
  private def bitLen(c: Column): Column = length(bin(c)).cast("long")

  private def bitLen(v: Long): Long = java.lang.Long.toBinaryString(v).length.toLong

  /** BM25 (k1 = 1.2, b = 0.75) top-`topN` documents for `queryTerms`, with
    * the whole score kept inside exact arithmetic so the DuckDB oracle
    * hash-compares:
    *
    *   - idf(t) = bitlen(N) − bitlen(df_t) + 1 — the exact integer log2 of
    *     N/df (±1), ≥ 1 for every matched term like the classic
    *     log(1 + (N−df+0.5)/(df+0.5)) is positive.
    *   - The tf normalization `tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))` is
    *     cleared of floats by multiplying through by 10·N·Σdl (avgdl =
    *     Σdl/N): score = idf · 22·S·tf / (10·S·tf + 3·S + 9·N·dl), one
    *     IEEE division of exact longs, rounded to 6 dp.
    *   - The per-doc total sums the ROUNDED per-term scores as
    *     DECIMAL(20,6) — exact and order-independent (same discipline as
    *     PageRank's DECIMAL sums) — then casts to double once.
    *
    * Long-overflow headroom: 22·S·tf with corpus tokens S ≈ 2·10¹³ (100 TB
    * of text) and tf ≤ 10⁴ is ~4·10¹⁸ < 2⁶³; beyond that, lower the fixed
    * scale factor or bucket S.
    *
    * N and Σdl are a one-row aggregate fetched to the driver (the justified
    * scalar-fetch pattern, cf. q_pmi_topk: attaching a constant via a join
    * would plan the BroadcastNestedLoopJoin the plan guard forbids).
    * Corpus passes: exactly two tokenizing scans — the narrow (N, Σdl)
    * stats aggregate and the explode feeding the checkpointed `matched`
    * table; everything downstream runs on |Q|·df rows.
    *
    * Output: (doc_id, n_terms, n_hits, bm25, rank), rank 1..topN by
    * (bm25 DESC, doc_id ASC). Documents matching no query term are absent —
    * their BM25 is 0 by definition.
    */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], topN: Int = 20,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK needs at least one query term")
    val toks = tokenized(docs, idCol, textCol)
    // One-row corpus aggregate (N docs, S total tokens) fetched once.
    val (nDocs, s) = corpusStats(toks)
    // localCheckpoint: `matched` feeds BOTH the df aggregate and the scoring
    // join — without it Catalyst re-derives the whole corpus explode twice
    // (same sharing pattern as q_pmi_topk's grouped bigram table). The
    // materialized table is |Q|·df rows, not corpus tokens.
    val matched = matchedTf(toks, queryTerms, idCol).localCheckpoint(eager = true)
    val dfTbl = matched.groupBy("term").agg(count(lit(1)).as("df"))
    val perDoc = scoreMatched(matched, nDocs, s, dfTbl, idCol)
    // Distributed global top-k (TakeOrderedAndProject), then the rank
    // window runs on topN rows only — same shape as q_pmi_topk.
    val top = perDoc.orderBy(col("bm25").desc, col(idCol).asc).limit(topN)
    top.withColumn("rank", row_number()
        .over(Window.orderBy(col("bm25").desc, col(idCol).asc)).cast("long"))
      .select(col(idCol), col("n_terms"), col("n_hits"), col("bm25"), col("rank"))
  }

  /** The corpus-level BM25 index for a query-term set: one-row global
    * stats (N docs, S tokens) plus the terms-sized document-frequency
    * table — everything scoring needs that requires touching the corpus.
    * Build once, score any number of batches against it ([[bm25Score]]):
    * at 100 TB the index build is the only corpus-scale pass in the
    * retrieval path; each batch then costs O(batch). */
  case class Bm25Index(nDocs: Long, totalTokens: Long, dfTbl: DataFrame)

  /** Per-doc token lists with length — the shared scan shape. */
  private def tokenized(docs: DataFrame, idCol: String, textCol: String) =
    docs.select(col(idCol), words(normalize(col(textCol))).as("toks"))
      .select(col(idCol), size(col("toks")).cast("long").as("dl"), col("toks"))

  /** One-row (N docs, S total tokens) corpus aggregate. `sum` over zero
    * rows is NULL — an EMPTY corpus must yield (0, 0) and flow through to
    * an empty ranking, not NPE on the scalar fetch (ADVICE r8). */
  private def corpusStats(toks: DataFrame): (Long, Long) = {
    val r = toks.agg(count(lit(1)),
      coalesce(sum(col("dl")), lit(0L)).cast("long")).head
    (r.getLong(0), r.getLong(1))
  }

  /** (doc, dl, term, tf) for the query terms only — filtered BEFORE the
    * aggregate, so the shuffle carries |Q|·df rows, not corpus tokens. */
  private def matchedTf(toks: DataFrame, queryTerms: Seq[String],
                        idCol: String): DataFrame = toks
    .select(col(idCol), col("dl"), explode(col("toks")).as("term"))
    .filter(col("term").isin(queryTerms: _*))
    .groupBy(col(idCol), col("dl"), col("term"))
    .agg(count(lit(1)).as("tf"))

  /** The ONE definition of the exact-integer BM25 arithmetic + per-doc
    * decimal sum, shared by the one-shot and incremental forms so they
    * cannot drift. */
  private def scoreMatched(matched: DataFrame, nDocs: Long, s: Long,
                           dfTbl: DataFrame, idCol: String): DataFrame =
    matched.join(broadcast(dfTbl), "term")
      .withColumn("idf", lit(bitLen(nDocs)) - bitLen(col("df")) + lit(1L))
      .withColumn("score", round(
        (col("idf") * (lit(22L * s) * col("tf"))).cast("double") /
          (lit(10L * s) * col("tf") + lit(3L * s) + lit(9L * nDocs) * col("dl"))
            .cast("double"), 6))
      .groupBy(idCol).agg(
        count(lit(1)).as("n_terms"),
        sum("tf").cast("long").as("n_hits"),
        sum(col("score").cast("decimal(20,6)")).cast("double").as("bm25"))

  /** Build the [[Bm25Index]] from a corpus: one tokenizing stats pass plus
    * one filtered explode for df. The df table checkpoints eagerly (it is
    * terms-sized) so scoring passes never re-derive the corpus scan. */
  def bm25Index(corpus: DataFrame, queryTerms: Seq[String],
                idCol: String = "doc_id", textCol: String = "text"): Bm25Index = {
    require(queryTerms.nonEmpty, "bm25Index needs at least one query term")
    val toks = tokenized(corpus, idCol, textCol)
    val (nDocs, s) = corpusStats(toks)
    val dfTbl = matchedTf(toks, queryTerms, idCol)
      .groupBy("term").agg(count(lit(1)).as("df"))
      .localCheckpoint(eager = true)
    Bm25Index(nDocs, s, dfTbl)
  }

  /** Score `docs` against a prebuilt [[Bm25Index]] — the INCREMENTAL form:
    * cost scales with the BATCH; the corpus contributes only its frozen
    * (N, S, df) statistics (new-batch terms the corpus never saw simply
    * don't join — df would be 0, idf undefined, and retrieval against the
    * index treats them as no-ops, matching the frozen-index contract).
    * Output: (idCol, n_terms, n_hits, bm25) per matched doc. */
  def bm25Score(docs: DataFrame, index: Bm25Index, queryTerms: Seq[String],
                idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    scoreMatched(matchedTf(tokenized(docs, idCol, textCol), queryTerms, idCol),
      index.nDocs, index.totalTokens, index.dfTbl, idCol)

  /** The margin fold over an already-tokenized array column — the ONE
    * definition of the hashed-linear arithmetic ([[marginOf]] and
    * [[hashedLinearMargin]] both build on it, so the Spark-side fold
    * cannot drift between the two forms; ADVICE r8). */
  private def marginOfToks(toks: Column, dim: Long): Column =
    aggregate(toks, lit(0L),
      (acc, w) => acc +
        ((call_function("md5_hash32", w) % lit(dim)) % lit(21L) - lit(10L)))

  /** The per-row hashed-linear margin fold of [[hashedLinearMargin]], as a
    * composable Column (same `aggregate` HOF, so callers can attach labels
    * or other columns without a re-join). */
  def marginOf(text: Column, dim: Long = 1024L): Column =
    marginOfToks(words(normalize(text)), dim)

  /** Hashed bag-of-words linear-margin inference: feature id =
    * `md5_hash32(token) mod dim`, weight(f) = (f mod 21) − 10 ∈ [−10, 10],
    * margin = Σ_tokens weight(feature(token)), kept ⇔ margin > 0.
    *
    * The weight table being a pure function of the feature id keeps the
    * query oracle-checkable with zero side files; swapping in trained
    * weights changes ONE lambda, not the plan. The fold runs per row via
    * the `aggregate` higher-order function — no explode, no shuffle: at
    * 100 TB this is a map-only pass, the cheapest possible shape for
    * corpus-wide filter inference.
    *
    * Requires `md5_hash32` registered ([[graft.plans.GraftExtensions]]).
    * `langCol` rides along for per-group evaluation when present
    * (`None` for frames without a language column — the output then has
    * no lang field). Output: (doc_id, [lang,] n_tokens, margin, kept). */
  def hashedLinearMargin(docs: DataFrame, dim: Long = 1024L,
                         idCol: String = "doc_id",
                         textCol: String = "text",
                         langCol: Option[String] = Some("lang")): DataFrame = {
    val carried = langCol.toSeq.map(col)
    docs.select(col(idCol) +: carried :+ words(normalize(col(textCol))).as("toks"): _*)
      .select(col(idCol) +: carried :+
        size(col("toks")).cast("long").as("n_tokens") :+
        marginOfToks(col("toks"), dim).as("margin"): _*)
      .withColumn("kept", col("margin") > 0)
  }

  /** Exact ROC-AUC of an integer score against a boolean label —
    * Mann–Whitney with tie-averaged ranks, computed WITHOUT a corpus-scale
    * sort: ranks come from the value-sized score histogram. A tie group of
    * `n` rows after `c_lt` lower-scored rows occupies ranks
    * c_lt+1..c_lt+n, average rank c_lt+(n+1)/2, so (doubled to stay
    * integral) Σ 2·R⁺ = Σ_values np·(2·c_lt + n + 1) and
    *
    *   AUC = (Σ 2·R⁺ − n_pos·(n_pos+1)) / (2·n_pos·n_neg)
    *
    * — exact integers until one final IEEE division, rounded to 6 dp
    * (= P(score⁺ > score⁻) + ½·P(=), the probabilistic AUC with ties).
    *
    * Scale shape: one corpus-scale groupBy(score) whose OUTPUT is bounded
    * by the score range (the hashed-linear margin is ±10·tokens — thousands
    * of distinct values, not corpus rows); the rank prefix-sum runs as a
    * single-partition window over that histogram (the waterfill pattern)
    * and the answer is a one-row aggregate. AUC over a billion docs costs
    * one map-side-combined shuffle of a few thousand rows. A single-class
    * input (`n_pos = 0` or `n_neg = 0`) yields a NULL auc — guarded
    * explicitly, since ANSI mode makes the bare division throw.
    *
    * Output: one row (n_pos, n_neg, auc_num, auc) with
    * auc_num = Σ2R⁺ − n_pos·(n_pos+1) (exact long numerator). */
  def classifierAuc(scored: DataFrame, scoreCol: String = "margin",
                    labelCol: String = "label"): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val h = scored.groupBy(scoreCol).agg(
      count(lit(1)).cast("long").as("n"),
      sum(when(col(labelCol), 1L).otherwise(0L)).as("np"))
    h.withColumn("c_lt", sum(col("n")).over(W.orderBy(col(scoreCol))) - col("n"))
      .agg(
        sum(col("np") * (lit(2L) * col("c_lt") + col("n") + lit(1L))).as("s2r"),
        sum(col("np")).cast("long").as("n_pos"),
        sum(col("n") - col("np")).cast("long").as("n_neg"))
      .select(col("n_pos"), col("n_neg"),
        (col("s2r") - col("n_pos") * (col("n_pos") + lit(1L)))
          .cast("long").as("auc_num"),
        when(col("n_pos") === 0L || col("n_neg") === 0L, lit(null))
          .otherwise(round(
            (col("s2r") - col("n_pos") * (col("n_pos") + lit(1L))).cast("double")
              / (lit(2L) * col("n_pos") * col("n_neg")).cast("double"), 6))
          .as("auc"))
  }

  /** Per-group [[classifierAuc]] — the per-slice model audit (per
    * language, per source): identical tie-averaged rank algebra with every
    * step partitioned by `groupCol`, so the histogram window and the final
    * aggregate parallelize across groups — no single-partition stage at
    * all, unlike the global form's (histogram-sized) rank window. A group
    * with one class reports NULL auc. Output: one row per group
    * (groupCol, n_pos, n_neg, auc_num, auc). */
  def classifierAucBy(scored: DataFrame, groupCol: String,
                      scoreCol: String = "margin",
                      labelCol: String = "label"): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val h = scored.groupBy(groupCol, scoreCol).agg(
      count(lit(1)).cast("long").as("n"),
      sum(when(col(labelCol), 1L).otherwise(0L)).as("np"))
    h.withColumn("c_lt",
        sum(col("n")).over(W.partitionBy(groupCol).orderBy(col(scoreCol))) - col("n"))
      .groupBy(groupCol).agg(
        sum(col("np") * (lit(2L) * col("c_lt") + col("n") + lit(1L))).as("s2r"),
        sum(col("np")).cast("long").as("n_pos"),
        sum(col("n") - col("np")).cast("long").as("n_neg"))
      .select(col(groupCol), col("n_pos"), col("n_neg"),
        (col("s2r") - col("n_pos") * (col("n_pos") + lit(1L)))
          .cast("long").as("auc_num"),
        when(col("n_pos") === 0L || col("n_neg") === 0L, lit(null))
          .otherwise(round(
            (col("s2r") - col("n_pos") * (col("n_pos") + lit(1L))).cast("double")
              / (lit(2L) * col("n_pos") * col("n_neg")).cast("double"), 6))
          .as("auc"))
  }

  /** Corpus-relative percentile of an integer score — the normalization
    * that turns a raw quality margin into "keep the top p%" thresholds
    * that stay meaningful as corpus composition shifts. Percentile =
    * tie-averaged midrank / N = (2·c_lt + n + 1) / (2·N), the same
    * histogram algebra as [[classifierAuc]], rounded once.
    *
    * Scale shape: the score histogram is value-sized (bounded by the score
    * range, not corpus rows), so attaching (c_lt, n, N) back to every row
    * is a BROADCAST hash join — the whole op is one groupBy(score) whose
    * output is tiny plus a map-only join. No global sort, no window over
    * the corpus. Output: input columns + (pct). */
  def scorePercentiles(scored: DataFrame, scoreCol: String = "margin")
      : DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val h = scored.groupBy(scoreCol).agg(count(lit(1)).cast("long").as("n"))
    val cum = h
      .withColumn("c_lt", sum(col("n")).over(W.orderBy(col(scoreCol))) - col("n"))
      .withColumn("total", sum(col("n")).over(
        W.partitionBy().rowsBetween(W.unboundedPreceding, W.unboundedFollowing)))
    scored.join(broadcast(cum), scoreCol)
      .withColumn("pct", round(
        (lit(2L) * col("c_lt") + col("n") + lit(1L)).cast("double")
          / (lit(2L) * col("total")).cast("double"), 6))
      .drop("n", "c_lt", "total")
  }

  /** Reciprocal-rank fusion of top-k rankings: each input carries
    * (`idCol`, `rank` 1-based); fused score = Σ_lists 1/(kConst + rank),
    * the parameter-free list-combination rule retrieval stacks use to
    * merge lexical and model-based rankings. Each contribution is rounded
    * to 9 dp once and summed as DECIMAL(12,9) — exact and order-free, so
    * the result hash-compares (the repo's single-rounded-rational
    * discipline; doubles summed in shuffle order would not).
    *
    * Scale: inputs are k-sized by construction (they come from top-k
    * operators), so everything here is driver-trivial; the expensive part
    * is producing the input rankings, each of which is already a
    * distributed TakeOrdered. Output: (idCol, n_lists, rrf, rank 1..topN
    * by (rrf DESC, id ASC)). */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String = "doc_id",
              kConst: Long = 60L, topN: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val contrib = round(lit(1.0)
        / (lit(kConst.toDouble) + col("rank").cast("double")), 9)
      .cast("decimal(12,9)")
    val unioned = rankings.map(_.select(col(idCol), contrib.as("c")))
      .reduce(_ unionAll _)
    val fused = unioned.groupBy(idCol).agg(
      count(lit(1)).cast("long").as("n_lists"),
      sum(col("c")).cast("double").as("rrf"))
    val top = fused.orderBy(col("rrf").desc, col(idCol).asc).limit(topN)
    top.withColumn("rank", row_number()
        .over(Window.orderBy(col("rrf").desc, col(idCol).asc)).cast("long"))
      .select(col(idCol), col("n_lists"), col("rrf"), col("rank"))
  }

  /** Calibration table for an integer score: fixed-width score buckets →
    * (count, positives, positive rate). bucket = floor(score / width) via
    * double division — exact for the bounded integer margins and identical
    * in DuckDB, covering negative scores correctly (floor, not truncation).
    * One corpus-scale aggregate with bucket-count output; the rate is a
    * single rounded rational. Output: (bucket, n, n_pos, pos_rate). */
  def classifierCalibration(scored: DataFrame, width: Long = 10L,
                            scoreCol: String = "margin",
                            labelCol: String = "label"): DataFrame =
    scored
      .groupBy(floor(col(scoreCol).cast("double") / lit(width.toDouble))
        .cast("long").as("bucket"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("n_pos"))
      .withColumn("pos_rate",
        round(col("n_pos").cast("double") / col("n").cast("double"), 6))
}
