package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus-curation operators — the selection stage of a training-data
  * pipeline (what runs AFTER dedup/quality/similarity have scored the
  * corpus): deterministic stratified sampling for dataset mixing,
  * intra-document repetition metrics (the classic "repetitious text"
  * quality filters), and the end-to-end keep-list assembly.
  *
  * Everything here is a NARROW projection or a broadcast join — at 100 TB
  * these run as map-only stages over the corpus scan; the only aggregates
  * are bounded (per-stratum counts, the exact-dedup keep list that
  * [[Dedup.exact]] already produces with one fingerprint shuffle).
  *
  * Determinism contract: sampling uses a salted md5 hash of the document id
  * — NO RNG, so the sample is reproducible across runs, partitionings, and
  * engines, and the DuckDB oracle replicates it value-for-value. (Spark's
  * `df.sample` is seed-stable only per partitioning, which makes it
  * unauditable at scale — hash gating is how production pipelines make
  * sampling a pure function of the data.)
  */
object Curation {

  /** Hash-gate denominator: rates are quantized to millionths. */
  val SampleDenom = 1000000L

  /** Rate → integer gate threshold, computed ONCE on the driver and inlined
    * as a literal on both the Spark side and the oracle side — the engines
    * must compare against the SAME integer (Spark's cast truncates, DuckDB's
    * rounds; 0.35·10⁶ sits exactly on that disagreement). */
  def gateNumerator(rate: Double): Long = (rate * SampleDenom).toLong

  /** The deterministic Bernoulli gate: keep row iff
    * `md5_32(salt:id) mod denom < numerator`. Uniform enough per salt, and
    * INDEPENDENT gates come from different salts (the md5 outputs for
    * different salts are unrelated) — so a held-out split is just a second
    * call with another salt. */
  def hashGate(idCol: Column, salt: String, numerator: Column): Column =
    pmod(Dedup.md5Hash32(concat(lit(salt), lit(":"), idCol.cast("string"))),
      lit(SampleDenom)) < numerator

  /** Stratified sampling for dataset mixing: each stratum (language, source,
    * quality band …) keeps its own rate; strata absent from `rates` are
    * dropped. Output adds the mixing `weight` = 1/rate (the inverse-
    * probability weight consumers need to de-bias counts over the sample).
    * Narrow per-row filter — no shuffle, no RNG. */
  def sampleStratified(docs: DataFrame, rates: Map[String, Double],
                       strataCol: String = "lang", idCol: String = "doc_id",
                       salt: String = "mix"): DataFrame = {
    require(rates.nonEmpty, "rates must name at least one stratum")
    rates.values.foreach(r => require(r >= 0d && r <= 1d, s"rate $r outside [0,1]"))
    // Fail fast rather than silently clobber caller data: `weight` is the
    // OUTPUT column, `_num` a transient internal.
    Seq("weight", "_num").foreach(c => require(!docs.columns.contains(c),
      s"input already has a '$c' column — rename it before sampling " +
        "(sampleStratified emits its own 'weight')"))
    // Rate/threshold as literal CASE chains (strata maps are small by
    // nature); keys sorted so the expression — and the plan — is
    // deterministic.
    def caseChain(f: Double => Column): Column =
      rates.toSeq.sortBy(_._1).foldLeft(lit(null)) {
        case (els, (k, r)) => when(col(strataCol) === k, f(r)).otherwise(els)
      }
    val num = caseChain(r => lit(gateNumerator(r)))
    docs
      .withColumn("_num", num)
      .filter(col("_num").isNotNull && hashGate(col(idCol), salt, col("_num")))
      .withColumn("weight", lit(1d) / caseChain(lit))
      .drop("_num")
  }

  /** TEMPERATURE sampling (α = 1/2) for multilingual mixing: per-stratum
    * keep rates proportional to `√n_l / n_l`, so the sampled corpus mixes
    * strata by `√n_l` — the classic α-sampling that upweights low-resource
    * languages relative to raw frequency (α=1 is proportional, α=0 uniform;
    * √ is the standard middle).
    *
    * Integer-exact end to end: stratum weight `w_l = ⌊√n_l⌋` (IEEE sqrt is
    * correctly rounded, so every engine floors the same value), and each
    * stratum's gate numerator is `min((target·w_l·denom) div (Σw·n_l),
    * denom)` — pure integer arithmetic inlined against the same salted-md5
    * gate as [[sampleStratified]]. Caller keeps `target·w_l·SampleDenom`
    * under 2⁶³ (true for any realistic target; rescale SampleDenom down
    * if sampling trillions).
    *
    * Unlike [[sampleStratified]] the rates are DATA-derived, so they ride
    * the plan: one tiny per-stratum aggregate, an empty-frame window to
    * total the weights (strata-count rows in one partition — never
    * row-scale), and a broadcast join back onto the corpus scan; the gate
    * itself stays a narrow filter. Output: sampled rows + (n_strat,
    * gate_num) for auditability. */
  def sampleTemperature(docs: DataFrame, targetDocs: Long,
                        strataCol: String = "lang", idCol: String = "doc_id",
                        salt: String = "temp"): DataFrame = {
    require(targetDocs > 0, "targetDocs must be positive")
    Seq("n_strat", "gate_num").foreach(c => require(!docs.columns.contains(c),
      s"input already has a '$c' column — rename it before sampling"))
    val win = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val rates = docs.groupBy(strataCol)
      .agg(count(lit(1)).as("n_strat"))
      .withColumn("_w", floor(sqrt(col("n_strat"))).cast("long"))
      .withColumn("_tw", sum("_w").over(win))
      // `div`, not `/`: Column./ on longs is DOUBLE division (exactness
      // gone past 2^53); this stays in integer arithmetic throughout.
      .withColumn("gate_num",
        least(expr(s"($targetDocs * _w * $SampleDenom) div (_tw * n_strat)"),
          lit(SampleDenom)))
      .drop("_w", "_tw")
    docs.join(broadcast(rates), strataCol)
      .filter(hashGate(col(idCol), salt, col("gate_num")))
  }

  /** The repetition metrics as one struct expression (the token array is
    * let-bound so the split runs once): n_words, dup_word_frac, n_bigrams,
    * dup_bigram_frac — the Gopher/C4-style "repetitious text" signals. */
  def repetitionStruct(text: Column): Column = {
    import graft.functions.SqlLet
    SqlLet.let(TextFunctions.words(TextFunctions.normalize(text)), ws => {
      val n = size(ws)
      val nd = size(array_distinct(ws))
      // Bigrams from the already-bound token array (wordNgrams would
      // re-split the text).
      val bi = TextFunctions.slidingNgrams(ws, 2)
      val nb = size(bi)
      val ndb = size(array_distinct(bi))
      struct(
        n.as("n_words"),
        (lit(1d) - nd.cast("double") / n).as("dup_word_frac"),
        nb.as("n_bigrams"),
        when(nb > 0, lit(1d) - ndb.cast("double") / nb).as("dup_bigram_frac"))
    })
  }

  /** Intra-document repetition metrics as a query: one narrow projection. */
  def repetition(docs: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol), repetitionStruct(col(textCol)).as("r"))
      .select(col(idCol), col("r.n_words"), col("r.dup_word_frac"),
        col("r.n_bigrams"), col("r.dup_bigram_frac"))

  /** Duplicate-UNIT statistics per document — the Gopher-style (Rae et
    * al. 2021, §A1.1) duplicate line / paragraph quality signals,
    * parametric on the unit separator (`"\n"` for lines, `"\n{2,}"` for
    * paragraphs): how many units repeat within the document, by COUNT and
    * by CHARACTER MASS. A "duplicate" is every non-first occurrence of a
    * unit's exact text, so `dup_unit_frac` = Σ(c−1)/Σc over the per-unit
    * occurrence counts c, and `dup_char_frac` weighs each unit by its
    * length — the two published cut dimensions. Empty units (consecutive
    * separators, leading/trailing) are dropped; documents with no
    * non-empty unit drop out of the result.
    *
    * Plan: explode → per-(doc, unit) hash count → per-doc re-aggregation
    * — two map-side-combined shuffles, linear in corpus size. The
    * shuffle-free alternative (array `exists` over earlier indices) is
    * quadratic per document, which is the wrong trade for exactly the
    * long repetitive documents this filter exists to catch. Fractions
    * are single IEEE divisions of exact integers — engine-identical, so
    * the DuckDB oracle hash-matches. */
  def duplicateUnitStats(docs: DataFrame, sepRegex: String = "\n",
                         textCol: String = "text",
                         idCol: String = "doc_id"): DataFrame = {
    val units = docs.select(col(idCol),
        explode(split(col(textCol), sepRegex)).as("unit"))
      .filter(length(trim(col("unit"))) > 0)
    units.groupBy(col(idCol), col("unit")).agg(count(lit(1)).as("c"))
      .groupBy(idCol).agg(
        sum("c").as("n_units"),
        sum(col("c") - 1).as("dup_units"),
        sum(length(col("unit")) * col("c")).as("unit_chars"),
        sum(length(col("unit")) * (col("c") - 1)).as("dup_unit_chars"))
      .select(col(idCol), col("n_units"), col("dup_units"),
        (col("dup_units").cast("double") / col("n_units"))
          .as("dup_unit_frac"),
        col("unit_chars"), col("dup_unit_chars"),
        (col("dup_unit_chars").cast("double") / col("unit_chars"))
          .as("dup_char_frac"))
  }

  /** Gopher line-morphology battery — the published rules the
    * repetition stats above do not cover: bullet-start and
    * ellipsis-end line fractions, the symbol-to-word signals (`#`
    * characters, `…`/`...` occurrences), alphabetic-word count and
    * total word characters (mean word length = word_chars / n_words).
    * Everything is emitted as an EXACT integer COUNT — consumers
    * derive the paper's fractions, and integer outputs hash-compare in
    * the oracle with no float-accumulation hazard.
    *
    * Plan shape: entirely NARROW — per-document array splits and
    * higher-order filters, no explode, no shuffle; at 100 TB this runs
    * inside the ingest scan like the HTML extractor. */
  def lineMorphology(docs: DataFrame, textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame = {
    val t = textCol
    docs.select(col(idCol),
      expr(s"filter(transform(split($t, '\\n'), l -> trim(l)), " +
        "l -> length(l) > 0)").as("_lines"),
      expr(s"filter(split(trim($t), '\\\\s+'), w -> length(w) > 0)")
        .as("_ws"),
      col(t).as("_t"))
      .select(col(idCol),
        size(col("_lines")).cast("long").as("n_lines"),
        expr("size(filter(_lines, l -> l rlike '^[•‣▪◦·*-]'))")
          .cast("long").as("n_bullet_lines"),
        expr("size(filter(_lines, l -> l rlike '(\\\\.\\\\.\\\\.|…)$'))")
          .cast("long").as("n_ellipsis_lines"),
        size(col("_ws")).cast("long").as("n_words"),
        expr("size(filter(_ws, w -> w rlike '\\\\p{L}'))")
          .cast("long").as("n_alpha_words"),
        expr("aggregate(_ws, 0L, (acc, w) -> acc + length(w))")
          .cast("long").as("word_chars"),
        (length(col("_t")) - length(expr("replace(_t, '#', '')")))
          .cast("long").as("n_hash"),
        ((length(col("_t")) - length(expr("replace(_t, '…', '')"))) +
          (length(col("_t")) - length(expr("replace(_t, '...', '')"))) / 3)
          .cast("long").as("n_ellipsis_sym"))
  }

  /** Top word-n-gram character fraction per document — the other half of
    * the Gopher repetition battery: for each n in `ns`, the single most
    * frequent word n-gram and the fraction of the document's normalized
    * characters its occurrences cover (`count · length(ngram) /
    * length(normalized text)`; overlapping occurrences can push the
    * fraction past 1, which is itself a strong repetition signal). Ties
    * break deterministically to the lexicographically LARGEST n-gram at
    * the max count (`max(struct(count, ngram))` — binary string order,
    * identical in DuckDB's default collation), so the oracle
    * hash-matches. Documents shorter than n words have no n-gram and
    * drop out for that n.
    *
    * Plan: one explode over all requested n (tagged rows) → per-(doc, n,
    * ngram) hash count → per-(doc, n) max-struct argmax — map-side
    * combined, linear; no window function, no per-doc quadratic array
    * scan. */
  def topNgramCharFrac(docs: DataFrame, ns: Seq[Int] = Seq(2, 3, 4),
                       textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 2), "ns must all be >= 2")
    // normalize() let-bound so its regexp_replace chain — the dominant
    // rowwise cost — runs ONCE per row for both the word split and the
    // character count.
    val base = docs.select(col(idCol),
        graft.functions.SqlLet.let(TextFunctions.normalize(col(textCol)),
          nm => struct(TextFunctions.words(nm).as("ws"),
            length(nm).cast("long").as("total_chars"))).as("b"))
      .select(col(idCol), col("b.ws").as("ws"),
        col("b.total_chars").as("total_chars"))
    val tagged = base.select(col(idCol), col("total_chars"),
        explode(array(ns.map(n => struct(lit(n).as("n"),
          TextFunctions.slidingNgrams(col("ws"), n).as("ngs"))): _*)).as("t"))
      .select(col(idCol), col("total_chars"), col("t.n").as("n"),
        explode(col("t.ngs")).as("ng"))
    tagged.groupBy(col(idCol), col("n"), col("ng"))
      .agg(count(lit(1)).as("c"), max("total_chars").as("total_chars"))
      .groupBy(col(idCol), col("n"))
      .agg(max(struct(col("c"), col("ng"))).as("m"),
        max("total_chars").as("total_chars"))
      .select(col(idCol), col("n"), col("m.ng").as("top_ngram"),
        col("m.c").as("top_count"),
        (col("m.c") * length(col("m.ng"))).as("ngram_chars"),
        ((col("m.c") * length(col("m.ng"))).cast("double") /
          col("total_chars")).as("top_char_frac"))
  }

  /** Deterministic train/val/test assignment: ONE hash draw per id mapped
    * onto contiguous integer ranges, so the splits are DISJOINT and
    * exhaustive BY CONSTRUCTION — no per-split gates whose acceptance sets
    * could overlap or leave gaps, and (like every gate here) no RNG, so a
    * rerun, a retried task, or next month's incremental batch assigns every
    * document identically. The last split absorbs integer rounding.
    * `fractions` must sum to 1. */
  def splitOf(idCol: Column, fractions: Seq[(String, Double)],
              salt: String = "split"): Column = {
    require(fractions.size >= 2, "need at least two splits")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val draw = pmod(
      Dedup.md5Hash32(concat(lit(salt), lit(":"), idCol.cast("string"))),
      lit(SampleDenom))
    val cuts = fractions.map(_._2).scanLeft(0L)((acc, f) => acc + gateNumerator(f))
      .tail.init // upper bounds for all but the last (absorbing) split
    cuts.zip(fractions.map(_._1)).foldRight(lit(fractions.last._1): Column) {
      case ((cut, name), rest) => when(draw < cut, name).otherwise(rest)
    }
  }

  /** Deterministic output sharding: shard = salted-md5 of the id mod
    * `numShards` — how a 100 TB job assigns rows to output files/workers so
    * reruns land identically (repartition(n) hashes by partition-internal
    * state; this is a pure data function, and doubles as the
    * `repartitionByRange`-free way to get stable bucketing for downstream
    * co-located joins). */
  def shardOf(idCol: Column, numShards: Int, salt: String = "shard"): Column =
    pmod(Dedup.md5Hash32(concat(lit(salt), lit(":"), idCol.cast("string"))),
      lit(numShards.toLong))

  /** Small-files compaction plan: pack size-carrying rows (files, docs,
    * chunks) in a caller-given total order into ~`targetBytes` output
    * shards — the greedy streaming bin-packer every 100 TB table
    * maintenance job runs (a shard may overrun by at most one row's
    * size; rows larger than the target get a shard of their own).
    * shard = (clamped running total − 1) div target, so the assignment
    * is a pure function of the inclusive prefix sum — computed
    * distributed via [[Numbering.prefixSum]], never a single-partition
    * window. Output: input columns + (cum_bytes, shard), integer-exact. */
  def compactionPlan(files: DataFrame, order: Seq[Column], sizeCol: Column,
                     targetBytes: Long): DataFrame = {
    require(targetBytes >= 1, "targetBytes must be positive")
    Numbering.prefixSum(files, order, sizeCol, out = "cum_bytes")
      // greatest(…, 0): a zero-size leading row has cum_bytes 0, and
      // (−1 div target) is 0 in Spark but −1 under DuckDB's floor
      // division — clamp before dividing so both engines agree.
      .withColumn("shard",
        expr(s"greatest(cum_bytes - 1, 0L) div ${targetBytes}L"))
  }

  /** Filter thresholds for [[curate]] — each is a classic curation rule.
    * Empty `langRates` (the default) means NO sampling stage: every gated
    * document is kept with weight 1.0. */
  final case class CurationRules(
      minWords: Int = 20,
      minChars: Long = 100L,
      maxChars: Long = 2000L,
      maxDupWordFrac: Double = 0.6,
      langRates: Map[String, Double] = Map.empty)

  /** The end-to-end keep-list assembly: exact-dedup representatives only
    * (via [[Dedup.exact]]'s keep ids — one fingerprint shuffle), length and
    * repetition gates (narrow), then stratified mixing rates. Output:
    * (doc_id, lang, n_words, dup_word_frac, weight) for the KEPT documents —
    * exactly what a downstream tokenizer job consumes.
    *
    * Join shape: the keep-list is (distinct fingerprints) rows — at worst
    * corpus-sized but typically far smaller; it joins back on the id. The
    * repetition metrics ride the same projection as the length gates, so
    * the text column is scanned once with no self-join. */
  def curate(docs: DataFrame, rules: CurationRules,
             textCol: String = "text", idCol: String = "doc_id",
             strataCol: String = "lang"): DataFrame = {
    val keep = Dedup.exact(docs, textCol, idCol)
      .select(col("keep_id").as(idCol))
    val withMetrics = docs.join(keep, idCol)
      .select(col(idCol), col(strataCol), col(textCol),
        repetitionStruct(col(textCol)).as("r"))
      .select(col(idCol), col(strataCol), col(textCol),
        col("r.n_words"), col("r.dup_word_frac"))
      .filter(col("n_words") >= rules.minWords &&
        length(col(textCol)) >= rules.minChars &&
        length(col(textCol)) <= rules.maxChars &&
        col("dup_word_frac") <= rules.maxDupWordFrac)
    val sampled =
      if (rules.langRates.isEmpty) withMetrics.withColumn("weight", lit(1d))
      else sampleStratified(withMetrics, rules.langRates, strataCol, idCol)
    sampled.select(idCol, strataCol, "n_words", "dup_word_frac", "weight")
  }

  /** Curriculum buckets: `ntile(n)` per stratum under the TOTAL order
    * (`score`, `idCol`) — the difficulty-ordering step of curriculum
    * training mixes. The id tie-break means equal scores can't wander
    * across bucket boundaries between runs or engines (bare `ntile` over a
    * non-total order is nondeterministic — the same trap
    * `q_latest_per_key` documents for max_by). One window pass = one
    * stratum-keyed shuffle; output adds `score` and `bucket` (1..n). */
  /** Per-stratum length outliers without a single float: a document is a
    * `long` outlier when its length exceeds `hiNum/hiDen` × the stratum
    * mean, a `short` outlier below `loNum/loDen` × it. The mean comparison
    * is cross-multiplied — `len · n · den  vs  num · Σlen` — so the whole
    * decision is integer arithmetic: partition-order-independent, exactly
    * replicable by any engine, never subject to float-mean drift. (The
    * classic z-score filter needs a sqrt; ratio-to-mean bounds are the
    * transcendental-free form, same discipline as rational idf.) Products
    * run in DECIMAL(38,0): a corpus-scale Σlen times a document length
    * would overflow a BIGINT silently under non-ANSI arithmetic.
    *
    * Plan: one bounded aggregate per stratum (count + sum), broadcast back
    * over the corpus scan, narrow filter — map-only over the data at any
    * scale. */
  def lengthOutliers(docs: DataFrame, lenCol: String, strataCol: String,
                     hiNum: Long, hiDen: Long, loNum: Long, loDen: Long): DataFrame = {
    require(hiNum > 0 && hiDen > 0 && loNum > 0 && loDen > 0, "bounds must be positive")
    val stats = docs.groupBy(col(strataCol))
      .agg(count(lit(1)).as("_n"), sum(col(lenCol)).as("_sum"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val lhs = dec(col(lenCol)) * dec(col("_n"))
    docs.join(broadcast(stats), strataCol)
      .withColumn("outlier",
        when(lhs * lit(hiDen) > lit(hiNum) * dec(col("_sum")), lit("long"))
          .when(lhs * lit(loDen) < lit(loNum) * dec(col("_sum")), lit("short")))
      .filter(col("outlier").isNotNull)
      .drop("_n", "_sum")
  }

  /** Winsorization — clamp `valueCol` into its own per-stratum exact
    * quantile band [`lo`, `hi`] (rational probabilities, e.g. (1,20) and
    * (19,20) for p05/p95): the tail-taming cleanup that keeps outlier
    * documents instead of dropping them ([[lengthOutliers]] is the DROP
    * decision; this is the KEEP-but-bound one). Bounds come from
    * [[Profiling.exactQuantiles]] — type-1 order statistics, so clamped
    * values are members of the data, bit-identical on any engine.
    *
    * Plan: the quantile aggregate's output is strata-sized → broadcast
    * back over the corpus scan, then a narrow `least/greatest` clamp —
    * the only heavy step is the quantile sort itself (see the
    * exactQuantiles scale note). */
  def winsorize(df: DataFrame, keys: Seq[String], valueCol: String,
                lo: (Long, Long), hi: (Long, Long),
                out: String = "clamped"): DataFrame = {
    Seq("_lo", "_hi", out).foreach(c => require(!df.columns.contains(c),
      s"input already has a '$c' column"))
    val bounds = Profiling.exactQuantiles(
        df.select((keys :+ valueCol).map(col): _*), keys, valueCol,
        Seq(("_lo", lo._1, lo._2), ("_hi", hi._1, hi._2)))
      .drop("n")
    df.join(broadcast(bounds), keys)
      .withColumn(out, least(greatest(col(valueCol), col("_lo")), col("_hi")))
      .drop("_lo", "_hi")
  }

  def curriculumBuckets(docs: DataFrame, n: Int, strataCol: String,
                        score: Column, idCol: String = "doc_id"): DataFrame = {
    require(n >= 1, "need at least one bucket")
    // Order by the PROJECTED score attribute, not the raw expression — the
    // projection below drops the expression's source columns.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(col("score"), col(idCol))
    docs.select(col(idCol), col(strataCol), score.as("score"))
      .withColumn("bucket", ntile(n).over(w).cast("long"))
  }

  /** Poisson PPS sampling (inclusion probability proportional to size):
    * keep each row with probability `min(1, k·w/W)` where `w` is the row's
    * weight (quality score, length, dup-cluster mass …) and `W = Σw` — the
    * survey-sampling scheme that makes a weighted corpus target an
    * EXPECTED k documents while favoring high-weight ones, with the exact
    * inverse-probability correction available from the emitted
    * probability.
    *
    * Exact end to end: the gate is the same salted-md5 draw as every
    * sampler here, and the inclusion test cross-multiplies in
    * DECIMAL(38,0) — `draw·W < k·w·denom` — so no float ever decides
    * membership, and any engine replays the sample identically.
    * `p_permille = min(1000, 1000·k·w div W)` rides along for audit and
    * de-biasing (integer, like the decision).
    *
    * Plan: `W` is ONE aggregate scalar fetched to the driver (the
    * [[Profiling.equiDepthHistogram]] cut-point shape — an index artifact,
    * not data motion) and re-enters as a literal, so the gate itself is a
    * narrow filter over the corpus scan: map-only at any scale. Weights
    * must be positive; `W` must fit a BIGINT (rescale w first otherwise —
    * asserted here, not silently wrapped). */
  def samplePps(docs: DataFrame, weightCol: String, k: Long,
                idCol: String = "doc_id", salt: String = "pps"): DataFrame = {
    require(k >= 1, "need k >= 1")
    require(!docs.columns.contains("p_permille"),
      "input already has a 'p_permille' column — rename it before sampling")
    val row = docs.agg(
      sum(col(weightCol)).as("w"), min(col(weightCol)).as("mn")).collect()(0)
    require(!row.isNullAt(0) && row.getLong(1) > 0,
      s"$weightCol must be positive on every row")
    val totalW = row.getLong(0)
    val draw = pmod(
      Dedup.md5Hash32(concat(lit(salt), lit(":"), col(idCol).cast("string"))),
      lit(SampleDenom))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    docs
      .filter(dec(draw) * lit(totalW) <
        lit(k) * dec(col(weightCol)) * lit(SampleDenom))
      .withColumn("p_permille",
        least(lit(1000L), expr(
          s"CAST((CAST(1000 AS DECIMAL(38,0)) * $k * $weightCol) div $totalW AS BIGINT)")))
  }

  /** Exactly-k-per-stratum sample — the quota twin of the rate gate in
    * [[sampleStratified]]: rank every row by its salted-md5 draw (total
    * order (hash, id)) and keep rank ≤ k. Deterministic and rerun-stable
    * like every sampling op here, but with an EXACT output size
    * min(k, |stratum|) — what eval-set construction needs, where a rate
    * gate's binomial wobble is unacceptable. One window pass; at extreme
    * stratum sizes swap ntile machinery for a per-stratum top-k aggregate
    * (the [[Similarity]] partial-top-k shape) to avoid the full sort. */
  def sampleExactK(docs: DataFrame, k: Int, strataCol: String,
                   idCol: String = "doc_id", salt: String = "exactk"): DataFrame = {
    require(k >= 1, "need k >= 1")
    val h = Dedup.md5Hash32(
      concat(lit(salt), lit(":"), col(idCol).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(col("_h"), col(idCol))
    docs.withColumn("_h", h)
      .withColumn("draw_rank", row_number().over(w).cast("long"))
      .filter(col("draw_rank") <= k)
      .drop("_h")
  }

  /** Token-budget waterfilling across sources — the data-mixing allocation
    * primitive: spread `budgetNum/budgetDen` of the total corpus size over
    * the sources as `allocated_s = min(avail_s, λ)`, with the water level
    * λ chosen so the allocations sum EXACTLY to the budget (the classic
    * cap-aware proportional fill: small sources are taken whole, large
    * ones are levelled). Output: (source, avail, allocated).
    *
    * All integer arithmetic: sources sorted ascending by (avail, source),
    * a prefix-sum finds the last fully-funded rank p (monotone condition
    * `cum + avail·(k−rn) ≤ B`), then λ = remainder div (k−p) with the
    * div-remainder distributed +1 to the first `mod` unfilled sources in
    * the same total order — deterministic, partitioning-independent, and
    * replicated verbatim by the DuckDB oracle. By the maximality of p,
    * λ+1 never exceeds any unfilled source's avail, so `allocated ≤ avail`
    * holds row-wise by construction.
    *
    * Scale shape: one shuffle for the per-source aggregate; the windows
    * run over the SOURCES-sized table (single partition by design — the
    * same bounded-cardinality discipline as [[lengthOutliers]]' stats
    * table), never over documents. */
  def budgetWaterfill(docs: DataFrame, srcCol: String, sizeCol: String,
                      budgetNum: Long = 2L, budgetDen: Long = 3L): DataFrame = {
    require(budgetNum >= 0 && budgetDen > 0, "budget fraction must be >= 0")
    val W = org.apache.spark.sql.expressions.Window
    val ord = W.orderBy(col("avail"), col(srcCol))
    val all = W.partitionBy().rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    docs
      .groupBy(srcCol).agg(sum(col(sizeCol)).cast("long").as("avail"))
      .withColumn("rn", row_number().over(ord).cast("long"))
      .withColumn("cum", sum(col("avail")).over(ord))
      .withColumn("k", count(lit(1)).over(all))
      .withColumn("b", expr(s"(sum(avail) OVER () * $budgetNum) div $budgetDen"))
      .withColumn("is_full", col("cum") + col("avail") * (col("k") - col("rn")) <= col("b"))
      .withColumn("p", coalesce(max(when(col("is_full"), col("rn"))).over(all), lit(0L)))
      .withColumn("cum_p", coalesce(max(when(col("is_full"), col("cum"))).over(all), lit(0L)))
      .withColumn("allocated",
        when(col("is_full"), col("avail"))
          .when(col("rn") - col("p") <= (col("b") - col("cum_p")) % (col("k") - col("p")),
            expr("(b - cum_p) div (k - p)") + 1L)
          .otherwise(expr("(b - cum_p) div (k - p)")))
      .select(col(srcCol), col("avail"), col("allocated"))
  }

  /** Apply a [[budgetWaterfill]] allocation: per source, keep the
    * hash-ordered PREFIX of documents whose cumulative size fits the
    * source's allocation. The salted-md5 order makes the cut an unbiased,
    * rerun-stable sample of each source (the same auditable-draw contract
    * as every sampling op here), and because the running total is
    * monotone along that order, `cum ≤ allocated` IS a prefix — greedy
    * fill, no knapsack ambiguity. Output: (idCol, srcCol, sizeCol,
    * cum_chars) for kept documents.
    *
    * Scale shape: the allocation table is sources-sized (broadcast); the
    * window is partitioned BY SOURCE over documents — one keyed shuffle,
    * parallel across sources, never a global sort. */
  /** Deterministic per-epoch training order: each epoch gets an
    * independent salted-md5 permutation of the corpus (the
    * reshuffle-between-epochs contract of a training DataLoader, made
    * rerun-stable and resumable — position (epoch, p) is a pure function
    * of the corpus and the salt, so a restarted run rebuilds the exact
    * order and can seek to where it left off).
    *
    * Scale shape: the epoch fan-out is a narrow explode; positions come
    * from ONE [[Numbering.assignGlobalIds]] pass over (epoch, hash) —
    * range-sort + driver prefix-sum — then per-epoch position = global id
    * − epoch·N. Never a per-epoch window (2 partitions of corpus size
    * each); the range sort spreads (epoch, hash) evenly across the
    * cluster. N is the one-row scalar fetch. Output:
    * (idCol, epoch, position 1..N). */
  def epochOrder(docs: DataFrame, epochs: Int, idCol: String = "doc_id",
                 salt: String = "epoch"): DataFrame = {
    require(epochs > 0, "need at least one epoch")
    val n = docs.count()
    val fanned = docs.select(col(idCol))
      .withColumn("epoch", explode(sequence(lit(0L), lit(epochs - 1L))))
      .withColumn("_h", Dedup.md5Hash32(concat(lit(salt),
        col("epoch").cast("string"), lit(":"), col(idCol).cast("string"))))
    Numbering.assignGlobalIds(fanned,
        order = Seq(col("epoch"), col("_h"), col(idCol)), out = "_gid")
      .select(col(idCol), col("epoch"),
        (col("_gid") - col("epoch") * lit(n)).as("position"))
  }

  def budgetCut(docs: DataFrame, srcCol: String, sizeCol: String,
                idCol: String = "doc_id", salt: String = "cut",
                budgetNum: Long = 2L, budgetDen: Long = 3L): DataFrame = {
    val alloc = budgetWaterfill(docs, srcCol, sizeCol, budgetNum, budgetDen)
      .select(col(srcCol), col("allocated"))
    val h = Dedup.md5Hash32(
      concat(lit(salt), lit(":"), col(idCol).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(srcCol)).orderBy(col("_h"), col(idCol))
    docs
      .select(col(idCol), col(srcCol), col(sizeCol))
      .withColumn("_h", h)
      .withColumn("cum_chars", sum(col(sizeCol)).over(w).cast("long"))
      .join(broadcast(alloc), srcCol)
      .filter(col("cum_chars") <= col("allocated"))
      .select(col(idCol), col(srcCol), col(sizeCol), col("cum_chars"))
  }
}
