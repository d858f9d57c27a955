package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Adaptive RECRAWL scheduling — the freshness half of crawl planning,
  * complementing [[graft.streaming.CrawlSchedule]]'s politeness half
  * (WHEN a host may be hit again vs WHICH pages are worth re-fetching).
  * The reference's bucket counter has no crawl loop at all; this is the
  * operator a production crawl runs nightly over its fetch log.
  *
  * Estimators follow Cho & Garcia-Molina, "Estimating Frequency of
  * Change" (ACM TOIT 3(3), 2003): a page's change process is modeled as
  * Poisson; with `n` fetches observing `X` digest changes over a span,
  * the naive rate is X/span and the bias-corrected MLE is
  * `-ln((n - X + 0.5) / (n + 0.5)) / meanInterval`. The SCHEDULING
  * columns (`next_interval_us`, `next_fetch_us`) use the naive
  * estimator in EXACT integer arithmetic — span DIV changes — so the
  * whole decision path is hash-comparable against a SQL oracle (the
  * repo's numeric-determinism rule: no float transcendentals in
  * oracle-gated output). The corrected MLE ships alongside as a double
  * (`lambda_cd`, changes/day) for ranking consumers; it is an API
  * column, never an oracle one.
  *
  * Scale: one window shuffle on the URL key (lag over the per-URL fetch
  * sequence) + one hash aggregation on the same key — the second
  * aggregation reuses the first's partitioning, so the whole estimate
  * is a single exchange over the fetch log. No driver collects.
  */
object Recrawl {

  /** Per-URL change-rate estimation over a fetch history
    * `(urlCol, usCol: epoch micros LONG, digestCol)` — derive micros
    * with `unix_micros(ts)`. One output row per URL:
    *
    *   - `n_fetches`, `n_changes` (digest differs from the previous
    *     fetch's), `span_us` (first→last fetch), `last_us` — exact.
    *   - `next_interval_us`: observed mean time between changes
    *     (`span_us DIV n_changes`), clamped to
    *     `[minIntervalUs, maxIntervalUs]`. Pages never seen to change
    *     back off to `2 * span_us` (we only know the period exceeds
    *     the span); single-fetch pages get `defaultIntervalUs` (no
    *     information yet). All integer.
    *   - `next_fetch_us = last_us + next_interval_us`.
    *   - `lambda_cd`: the bias-corrected Poisson MLE in changes/day
    *     (double; null below 2 fetches or zero span).
    */
  def changeRates(history: DataFrame, urlCol: String = "url",
                  usCol: String = "fetch_us",
                  digestCol: String = "digest",
                  minIntervalUs: Long = 3600L * 1000000L,
                  maxIntervalUs: Long = 30L * 86400L * 1000000L,
                  defaultIntervalUs: Long = 86400L * 1000000L,
                  /** Extra order columns breaking same-instant ties —
                    * without a total order per URL, the lag() change
                    * count is partition-arrival nondeterministic. */
                  tieBreak: Seq[String] = Nil): DataFrame = {
    require(minIntervalUs > 0 && maxIntervalUs >= minIntervalUs,
      "recrawl clamp must satisfy 0 < min <= max")
    val w = Window.partitionBy(col(urlCol))
      .orderBy((usCol +: tieBreak).map(col): _*)
    val perUrl = history
      .withColumn("_prev", lag(col(digestCol), 1).over(w))
      .groupBy(col(urlCol).as("url"))
      .agg(
        count(lit(1)).as("n_fetches"),
        sum(when(col("_prev").isNotNull &&
          col("_prev") =!= col(digestCol), 1L).otherwise(0L))
          .as("n_changes"),
        (max(col(usCol)) - min(col(usCol))).as("span_us"),
        max(col(usCol)).as("last_us"))
    withEstimates(perUrl, minIntervalUs, maxIntervalUs, defaultIntervalUs)
  }

  /** The estimator tail shared by [[changeRates]] and [[ratesFromStats]]
    * — input is one row per URL with `(url, n_fetches, n_changes,
    * span_us, last_us)`. */
  private def withEstimates(perUrl: DataFrame, minIntervalUs: Long,
                            maxIntervalUs: Long,
                            defaultIntervalUs: Long): DataFrame = {
    // `div`, not `/`: long / long is DOUBLE division in Spark SQL, and
    // floor-of-double can land one off the exact quotient when the
    // rational is within an ulp of an integer — `div` stays integral
    // end to end, matching the oracle's `//`. Divisors are made
    // structurally nonzero (greatest/nullif) rather than relying on
    // CASE branch laziness: under ANSI mode, subexpression elimination
    // may evaluate a guarded branch's division anyway.
    val est = when(col("n_fetches") < 2, lit(defaultIntervalUs))
      .when(col("n_changes") > 0,
        expr("span_us div greatest(n_changes, 1L)"))
      .otherwise(col("span_us") * 2L)
    val clamped = least(greatest(est, lit(minIntervalUs)),
      lit(maxIntervalUs))
    // Null (not zero, not a throw) below 2 fetches or zero span: the
    // double divisions see a null divisor there, never a zero one.
    val meanIntervalDays = when(
      col("n_fetches") >= 2 && col("span_us") > 0L,
      (col("span_us").cast("double") /
        greatest(col("n_fetches") - 1L, lit(1L)).cast("double"))
        / lit(86400.0e6))
    perUrl
      .withColumn("next_interval_us", clamped)
      .withColumn("next_fetch_us", col("last_us") + col("next_interval_us"))
      .withColumn("lambda_cd",
        (log(col("n_fetches").cast("double") + 0.5d)
          - log((col("n_fetches") - col("n_changes")).cast("double")
            + 0.5d))
          / meanIntervalDays)
  }

  // ---------------------------------------------------------------------
  // Incremental form — per-URL SUFFICIENT STATISTICS in a durable store.
  //
  // At 100 TB the fetch log is the largest table in the system and
  // [[changeRates]]'s window over it re-reads the full history every
  // planning run. The estimator only ever consumes five exactly-mergeable
  // numbers per URL — (n, X, first_us, last_us) plus the boundary digests
  // — so the scalable deployment keeps THOSE in a collapse-managed
  // delta-keyed store (O(urls) state, the [[graft.streaming
  // .CrawlSchedule]] pattern) and folds each batch in with one window +
  // one join: rates come out IDENTICAL to a full-history recompute
  // (oracle-gated, q_recrawl_inc) without a fetch log ever being kept.
  // ---------------------------------------------------------------------

  /** One row per URL: the mergeable estimator state. `batch_id`/`scope`
    * stamp which micro-batch advanced the row (−1/"" ad-hoc) — the
    * replay guard, [[graft.streaming.CrawlSchedule.StateSchema]]'s
    * convention. The boundary DIGESTS make the change count exact
    * across batches: a change falling exactly on a batch boundary is
    * visible to neither batch's lag window, only to the merge. */
  val StatsSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("url",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_fetches",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_changes",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("first_us",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("last_us",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("first_digest",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("last_digest",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("batch_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("scope",
        org.apache.spark.sql.types.StringType)))

  /** The per-lineage applied-batch sentinel key — the shared protocol,
    * [[graft.store.ParquetStore.sentinelKey]]. */
  private[operators] def sentinelKey(scope: String): String =
    graft.store.ParquetStore.sentinelKey(scope)

  /** Open (or resume) the recrawl-stats store — collapse-managed like
    * every delta-keyed store (one latest-per-URL base + bounded tail). */
  def statsStore(spark: org.apache.spark.sql.SparkSession,
                 storePath: String,
                 tableName: String = "recrawl_stats",
                 collapseEvery: Long = 16L)
      : graft.store.ParquetStore =
    new graft.store.ParquetStore(spark, StatsSchema, storePath, tableName,
      collapseKeys = Seq("url"), collapseEvery = collapseEvery)

  // ---------------------------------------------------------------------
  // BOUNDED RETAINED HISTORY (r16 — r15 verdict #4): interior backfills
  // used to require the caller to supply the touched URLs' COMPLETE
  // fetch history, because the stats store keeps none (O(urls) by
  // design). The ring below retains the last `keep` fetches per URL
  // beside the statistics — same collapse discipline, O(urls · keep)
  // state — and [[backfillStats]] rebuilds interior batches from it
  // WITHOUT an external history: the unretained prefix's contribution
  // is recovered exactly from the stored totals minus the retained
  // window's own recount (the sufficient statistics are subtractable),
  // so the fold stays exact as long as the late batch lands strictly
  // inside the retained window. A batch predating the window fails
  // fast, never approximates.
  // ---------------------------------------------------------------------

  /** Schema of the retained-history store: the fetch tuple, the url's
    * cumulative fetch ORDINAL (1-based position in the folded history —
    * nullable: rows recorded without a stats-store handle carry null
    * and downgrade the gap check, see [[recordHistory]]), the caller's
    * tie-break columns (typed by the caller — they must order
    * identically to the full-history window's), and the replay-guard
    * lineage pair. */
  def historySchema(tieBreak: Seq[org.apache.spark.sql.types.StructField]
                      = Nil): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(
      Seq(
        org.apache.spark.sql.types.StructField("url",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("fetch_us",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("digest",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("ord",
          org.apache.spark.sql.types.LongType)) ++ tieBreak ++ Seq(
        org.apache.spark.sql.types.StructField("batch_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("scope",
          org.apache.spark.sql.types.StringType)))

  /** Open (or resume) a retained-history ring store. Keyed by the full
    * fetch identity `(url, fetch_us, tieBreak…)` — a replayed batch's
    * rows collapse onto themselves; the ring trim is
    * [[recordHistory]]'s erase pass, not the collapse. */
  def historyStore(spark: org.apache.spark.sql.SparkSession,
                   storePath: String,
                   tableName: String = "recrawl_history",
                   tieBreak: Seq[org.apache.spark.sql.types.StructField]
                     = Nil,
                   collapseEvery: Long = 16L): graft.store.ParquetStore =
    new graft.store.ParquetStore(spark, historySchema(tieBreak),
      storePath, tableName,
      collapseKeys = Seq("url", "fetch_us") ++ tieBreak.map(_.name),
      collapseEvery = collapseEvery)

  /** Tie-break column names a history store was built with (everything
    * between the fixed fetch tuple and the lineage pair). */
  private def historyTieNames(h: graft.store.ParquetStore): Seq[String] =
    h.schema.fieldNames.toSeq
      .filterNot(Set("url", "fetch_us", "digest", "ord", "batch_id",
        "scope"))

  /** The live retained window: one row per recorded fetch, sentinels
    * excluded, lineage dropped. */
  def retainedHistory(h: graft.store.ParquetStore): DataFrame =
    h.latestPerKey(Seq("url", "fetch_us") ++ historyTieNames(h))
      .filter(!col("url").startsWith("#applied:"))
      .drop("rst_id", "batch_id", "scope")

  /** [[retainedHistory]] pruned to `urls` (a `url`-column frame) BELOW
    * the latest-per-key window (r18, guide §2.3: filter before the
    * shuffle): url is a prefix of the window's partition key, so
    * dropping whole url-partitions first yields identical rows while
    * the window runs over O(batch·keep) rows instead of the whole ring
    * — batch-bounded, not corpus-bounded, per trigger. */
  private def retainedHistoryFor(h: graft.store.ParquetStore,
                                 urls: DataFrame): DataFrame =
    h.latestPerKeySemi(Seq("url", "fetch_us") ++ historyTieNames(h),
        urls, Seq("url"))
      .filter(!col("url").startsWith("#applied:"))
      .drop("rst_id", "batch_id", "scope")

  /** Record one batch's fetch rows into the ring and TRIM each URL to
    * its newest `keep` fetches (victims erased copy-on-write — the
    * [[graft.store.ParquetStore.eraseKeys]] discipline, touched
    * generations only). Replay-guarded per (scope, batchId) like every
    * fold. EVERY batch folded into the stats store must be recorded
    * here too ([[foldBatch]] does both in order; [[backfillStats]]
    * re-records its late rows when handed the store) — and the ring is
    * CHECKABLE against that discipline: when `priorCounts` carries
    * each url's pre-fold `n_fetches` (what [[foldBatch]] passes), rows
    * are stamped with their 1-based fetch ORDINAL, and
    * [[backfillStats]]'s gap check can prove the retained window is
    * the exact contiguous suffix of the folded history — a fold whose
    * record call was skipped BETWEEN two recorded ones (tail intact,
    * interior gap) fails loud instead of silently mis-rebuilding.
    * Without `priorCounts`, ords are null and the check downgrades to
    * the tail comparison. */
  def recordHistory(h: graft.store.ParquetStore, batch: DataFrame,
                    keep: Int, urlCol: String = "url",
                    usCol: String = "fetch_us",
                    digestCol: String = "digest",
                    batchId: Long = -1L, scope: String = "",
                    /** `(url, _prior_n)` — each url's folded fetch
                      * count BEFORE this batch; absent urls count 0. */
                    priorCounts: DataFrame = null,
                    /** Optional TRIM-CANDIDATE narrowing (r17): a
                      * single-column `url` frame provably containing
                      * every url of this batch that can exceed `keep`
                      * retained rows (callers with a stats store pass
                      * the urls whose folded count exceeds keep — ring
                      * rows never exceed the folded count). Null = trim
                      * all batch urls, the exact legacy behavior. */
                    trimUrls: DataFrame = null): Unit = {
    val toTrim =
      if (trimUrls != null) trimUrls
      else batch.select(col(urlCol).as("url"))
    if (h.batchApplied(scope, batchId)) {
      // The append landed but a crash may have preceded the TRIM
      // (advice r16: append and sentinel ride one appendStreaming, the
      // erase follows — a crash between them would otherwise leave the
      // touched URLs above `keep` forever, silently eroding the
      // O(urls·keep) state bound). The trim is idempotent and bounded
      // by this batch's URLs, so the replay re-runs it and converges.
      trimRing(h, toTrim, keep, probeFirst = trimUrls != null)
      return
    }
    val tieNames = historyTieNames(h)
    val base = normalizedFetches(batch, urlCol, usCol, digestCol,
      tieNames)
    val rows =
      if (priorCounts == null)
        base.withColumn("ord", lit(null).cast("long"))
      else {
        val w = Window.partitionBy(col("url"))
          .orderBy((col("fetch_us") +: tieNames.map(col)): _*)
        base.join(priorCounts.select(col("url"),
            col("_prior_n")), Seq("url"), "left")
          .withColumn("ord",
            coalesce(col("_prior_n"), lit(0L)) + row_number().over(w))
          .drop("_prior_n")
      }
    appendRingRows(h, rows, keep, batchId, scope, trimUrls = trimUrls)
  }

  /** Shared ring append + trim tail ([[recordHistory]] and the
    * backfill's ordinal-corrected rewrite): `rows` already in history
    * shape (url, fetch_us, digest, ord, ties). Latest-per-fetch-key
    * collapse means a re-append of an existing fetch SUPERSEDES its
    * old row — the ordinal-rewrite primitive. */
  private def appendRingRows(h: graft.store.ParquetStore,
                             rows: DataFrame, keep: Int, batchId: Long,
                             scope: String,
                             /** r17 trim-candidate narrowing — see
                               * [[recordHistory]]. */
                             trimUrls: DataFrame = null): Unit = {
    require(keep >= 1, s"recordHistory: keep must be >= 1, got $keep")
    val tieNames = historyTieNames(h)
    val stamped = rows
      .withColumn("batch_id", lit(batchId))
      .withColumn("scope", lit(scope))
    val withSentinel =
      if (batchId < 0) stamped
      else stamped.unionByName(h.spark.range(1).select((Seq(
        lit(sentinelKey(scope)).as("url"), lit(0L).as("fetch_us"),
        lit(null).cast("string").as("digest"),
        lit(null).cast("long").as("ord")) ++
        tieNames.map(n => lit(null).cast(h.schema(n).dataType).as(n)) ++
        Seq(lit(batchId).as("batch_id"), lit(scope).as("scope"))): _*))
    h.appendStreaming(withSentinel)
    trimRing(h, if (trimUrls != null) trimUrls else rows.select(col("url")),
      keep, probeFirst = trimUrls != null)
  }

  /** Trim each of `urls` to its newest `keep` retained fetches (victims
    * erased copy-on-write — the [[graft.store.ParquetStore.eraseKeys]]
    * discipline, touched generations only). Trims ONLY the URLs given:
    * every other URL was at ≤ keep after its own last record call
    * (inductive invariant), so the rank window runs over O(batch·keep)
    * rows, not O(urls·keep) — at crawl scale the difference between a
    * batch-bounded and a corpus-bounded pass per trigger. Idempotent —
    * also the replay-path convergence step (advice r16). */
  private def trimRing(h: graft.store.ParquetStore, urls: DataFrame,
                       keep: Int,
                       /** When the caller's `urls` is a computed
                         * CANDIDATE set (often empty — the warm
                         * in-bound case), probe its emptiness first:
                         * one column-pruned job over the O(urls) stats
                         * store replaces the ring-store window scan
                         * below. Off for raw batch urls, which are
                         * rarely empty (the probe would be waste). */
                       probeFirst: Boolean = false): Unit = {
    require(keep >= 1, s"recordHistory: keep must be >= 1, got $keep")
    if (probeFirst && urls.isEmpty) return
    val tieNames = historyTieNames(h)
    val keys = Seq("url", "fetch_us") ++ tieNames
    val w = Window.partitionBy(col("url"))
      .orderBy((col("fetch_us").desc +: tieNames.map(col(_).desc)): _*)
    // PINNED (r17): eraseKeys' contract requires it — the victims
    // derive from the very store the rewrite mutates — and it turns
    // the O(touched-generations) anti-joins into re-reads of one
    // materialized batch-bounded set instead of re-running the
    // latest-per-key + rank window per generation. The pin also makes
    // the no-victim probe (every URL still within `keep` — the warm
    // common case for in-bound URLs) a metadata check that SKIPS the
    // erase's full-store touched-generation job entirely.
    val victims = retainedHistoryFor(h, urls)
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") > keep)
      .select(keys.map(col): _*)
      .localCheckpoint(eager = true)
    // Pinned-victims erase (r18): the frame above is already pinned,
    // unique per key (latest-per-key window rows), and projected in
    // store types — eraseKeys' re-normalization would be one redundant
    // distinct shuffle + checkpoint job per trim.
    if (!victims.isEmpty) h.eraseKeysPinned(victims, keys)
    ()
  }

  /** One IN-ORDER fold with the ring attached: [[batchStats]] →
    * [[updateStats]] → [[recordHistory]] with ordinal stamps, in the
    * crash-convergent order (stats first; a crash before the record
    * re-runs into a skip-stats + record-ring pass; ordinals are
    * replay-exact because the pre-fold count is re-derived as
    * `current − batch` once the fold is applied). The recommended fold
    * call for ring-attached deployments — calling [[updateStats]] and
    * [[recordHistory]] by hand works but leaves ords null. */
  def foldBatch(store: graft.store.ParquetStore, batch: DataFrame,
                urlCol: String = "url", usCol: String = "fetch_us",
                digestCol: String = "digest",
                tieBreak: Seq[String] = Nil,
                batchId: Long = -1L, scope: String = "",
                historyStore: graft.store.ParquetStore = null,
                keepHistory: Int = 0): Unit = {
    // No checkpoint of the batch stats (r18): each code path below
    // consumes the frame exactly once (inside the pinned merge, or
    // once in the replay path's re-derivation), so the eager
    // materialization was one redundant Spark job per trigger. No
    // pre-probe either: updateStats runs its own batchApplied guard —
    // a second identical full-store probe per fold was one redundant
    // job per trigger (r17, guide §1.2: the store-fold queries are
    // job-count-bound).
    val stats = batchStats(batch, urlCol, usCol, digestCol, tieBreak)
    val post = updateStatsReturning(store, stats, batchId, scope,
      pin = historyStore != null)
    if (historyStore != null) {
      // Pre-fold count per url: the fold has landed by now (either in
      // this call or before a crash-replay). The fold's OWN pinned
      // rows carry it outright (`_prior_n` — the stored count its
      // merge join already read, r18: the old post ⋈ stats join
      // re-derived a number the merge had in hand); the replay path
      // re-derives it from the store as before.
      val p = post.getOrElse(
        latestStats(store)
          .join(stats.select(col("url"), col("n_fetches").as("_bn")),
            Seq("url"))
          .withColumn("_prior_n", col("n_fetches") - col("_bn")))
      val prior = p.select(col("url"), col("_prior_n"))
      // Trim candidates (r17): a url can exceed `keep` retained rows
      // only if its FOLDED fetch count exceeds keep (ring rows ≤
      // n_fetches) — the stats row the fold just advanced knows that
      // without touching the ring store. Urls under the bound skip the
      // trim's ring-window scan entirely; the common in-bound case
      // becomes one column-pruned probe of the O(urls) stats store.
      val trimCand = p.filter(col("n_fetches") > keepHistory)
        .select(col("url"))
      recordHistory(historyStore, batch, keepHistory, urlCol, usCol,
        digestCol, batchId, scope, priorCounts = prior,
        trimUrls = trimCand)
    }
  }

  /** One batch of fetches reduced to its per-URL statistics: the same
    * lag window as [[changeRates]], plus the batch's boundary digests
    * (`min_by`/`max_by` on the same total order). */
  def batchStats(batch: DataFrame, urlCol: String = "url",
                 usCol: String = "fetch_us", digestCol: String = "digest",
                 tieBreak: Seq[String] = Nil): DataFrame = {
    val ord = struct((usCol +: tieBreak).map(col): _*)
    val w = Window.partitionBy(col(urlCol))
      .orderBy((usCol +: tieBreak).map(col): _*)
    batch
      .withColumn("_prev", lag(col(digestCol), 1).over(w))
      .groupBy(col(urlCol).as("url"))
      .agg(
        count(lit(1)).as("n_fetches"),
        sum(when(col("_prev").isNotNull &&
          col("_prev") =!= col(digestCol), 1L).otherwise(0L))
          .as("n_changes"),
        min(col(usCol)).as("first_us"),
        max(col(usCol)).as("last_us"),
        min_by(col(digestCol), ord).as("first_digest"),
        max_by(col(digestCol), ord).as("last_digest"))
  }

  /** Fold one batch's [[batchStats]] into the store. Batches must
    * arrive in STRICT per-URL time order (a crawl log's natural order);
    * the merge is then EXACT: counts and spans add, and a digest change
    * landing on the batch boundary is caught by comparing the stored
    * `last_digest` with the batch's `first_digest`. Replay-guarded the
    * [[graft.streaming.CrawlSchedule.scheduleBatch]] way: an applied
    * (scope, batch_id) appends nothing on its at-least-once re-run
    * (the sentinel row survives any collapse). One window + one
    * latest-per-URL join per trigger, both pruned by the collapse
    * policy — never a full-history scan.
    *
    * LATE BACKFILLS are rejected, not merged (review r14): a batch
    * starting at or before a URL's stored last fetch would count a
    * phantom boundary change and leave `last_digest` naming a fetch
    * older than `last_us`, silently corrupting every later estimate.
    * Equality is rejected too (advice r14): the stored tail's
    * tie-break columns are gone, so a batch tying the stored last
    * fetch's instant cannot be ordered against it — same-instant
    * fetches straddling a batch boundary could come out differently
    * from the full-history lag window. Both route to [[backfillStats]],
    * the out-of-order merge path. The guard rides the merge's own
    * projection (`raise_error` on the violating row — no second
    * batch-sized action per fold, r14 verdict #4): the fold fails
    * before the append lands, and a failed fold appends nothing. */
  def updateStats(store: graft.store.ParquetStore, stats: DataFrame,
                  batchId: Long = -1L, scope: String = ""): Unit = {
    updateStatsReturning(store, stats, batchId, scope); ()
  }

  /** [[updateStats]] handing back the POST-fold stats rows for the
    * batch's urls (pinned), or None when the batch was replay-skipped.
    * The fold computes these rows anyway; returning them spares the
    * caller ([[foldBatch]]) a full latest-per-key re-read of the store
    * it just wrote — one window-over-the-store job plus a join, per
    * trigger (r18, guide §1.2: the store-fold family is
    * job-count-bound, 111 jobs / 4 s of inter-job gaps at sf0.1).
    * Values are identical by construction: the appended rows ARE the
    * newest generation for exactly the batch's urls. */
  private[graft] def updateStatsReturning(store: graft.store.ParquetStore,
                                          stats: DataFrame,
                                          batchId: Long = -1L,
                                          scope: String = "",
                                          /** Pin (localCheckpoint) the
                                            * merged rows and hand them
                                            * back. Off for callers that
                                            * will not reuse them — the
                                            * pin is then pure overhead
                                            * (measured +4 jobs on
                                            * q_crawl_loop's 4 ring-less
                                            * folds). */
                                          pin: Boolean = false)
      : Option[DataFrame] = {
    if (store.batchApplied(scope, batchId)) return None
    val stored = latestStats(store).select(
      col("url"), col("n_fetches").as("_sn"), col("n_changes").as("_sx"),
      col("first_us").as("_sf"), col("last_us").as("_sl"),
      col("first_digest").as("_sfd"), col("last_digest").as("_sld"))
    val merged = stats.join(stored, Seq("url"), "left")
      .select(
        col("url"),
        // The backfill guard lives INSIDE the kept column (a CaseWhen
        // branch evaluates lazily; a standalone guard column would be
        // pruned away by the store's schema-align select and never
        // evaluate): the first violating row aborts the append action
        // itself, so a rejected fold leaves the store untouched.
        when(col("_sl").isNotNull && col("first_us") <= col("_sl"),
          raise_error(concat(lit("updateStats: URL '"), col("url"),
            lit("' starts at or before its stored last fetch — late " +
              "backfill; fold it via backfillStats instead"))).cast("long"))
          .otherwise(col("n_fetches") + coalesce(col("_sn"), lit(0L)))
          .as("n_fetches"),
        (col("n_changes") + coalesce(col("_sx"), lit(0L)) +
          when(col("_sld").isNotNull &&
            col("_sld") =!= col("first_digest"), 1L).otherwise(0L))
          .as("n_changes"),
        least(col("first_us"), coalesce(col("_sf"), col("first_us")))
          .as("first_us"),
        greatest(col("last_us"), coalesce(col("_sl"), col("last_us")))
          .as("last_us"),
        coalesce(col("_sfd"), col("first_digest")).as("first_digest"),
        col("last_digest"),
        // The url's PRE-fold count, carried for [[foldBatch]]'s ring
        // bookkeeping (r18): the merge join read it anyway, and
        // handing it back spares the caller a post ⋈ batch-stats join
        // per trigger. Dropped before the append (the sentinel union
        // and the store schema know nothing of it).
        coalesce(col("_sn"), lit(0L)).as("_prior_n"))
    if (!pin) {
      appendWithSentinel(store, merged.drop("_prior_n"), batchId, scope)
      None
    } else {
      // Pinned BEFORE the append: the raise_error guard fires here
      // (same fails-before-the-append-lands contract — earlier, even),
      // the append then writes a trivial scan of the checkpoint, and
      // the caller reuses the rows instead of re-reading the store.
      val pinned = merged.localCheckpoint(eager = true)
      appendWithSentinel(store, pinned.drop("_prior_n"), batchId, scope)
      Some(pinned)
    }
  }

  /** The OUT-OF-ORDER fold [[updateStats]] rejects to — real crawl logs
    * DO deliver late batches (retries, multi-DC merges), and before
    * this path existed the only recourse was a full-history
    * [[changeRates]] recompute. Takes the late batch's RAW fetch rows
    * (not its [[batchStats]] — the interior case below needs them) and
    * folds per URL by where the batch lands against the stored span:
    *
    *   - URL not in the store, or batch strictly AFTER the stored last
    *     fetch: the [[updateStats]] merge (exact).
    *   - Batch strictly BEFORE the stored first fetch: the mirror-image
    *     PREPEND merge — counts add, the boundary change compares the
    *     batch's `last_digest` with the stored `first_digest`, and the
    *     stored row keeps its first/last identity on the other side
    *     (exact: the sufficient statistics are order-independent under
    *     disjoint spans, which is why the store keeps BOTH boundary
    *     digests and timestamps).
    *   - Batch INSIDE the stored span (any overlap, including a tie on
    *     either boundary — ties are unorderable from statistics alone):
    *     exactness needs the interleaving, so the touched URLs — and
    *     ONLY those — are rebuilt from `history` (the complete
    *     already-folded fetch history for them, WITHOUT this batch's
    *     rows) unioned with the late batch; or, when a RETAINED-HISTORY
    *     ring is attached (`historyStore`, r15 verdict #4), rebuilt
    *     self-containedly from the ring — see below. Callers with
    *     neither get a fail-fast naming the URLs' count, never a
    *     silent approximation.
    *
    * RETAINED-HISTORY REBUILD (`historyStore` — [[historyStore]] /
    * [[recordHistory]]): the ring holds each URL's newest `keep`
    * fetches. For an overlap URL, the stored totals minus the ring
    * window's own recount give the unretained PREFIX's exact
    * contribution (counts and the prefix→window boundary change fold
    * into `n_changes_total − n_changes_window`); re-counting the
    * window WITH the late rows interleaved then restores exactness —
    * provided every late row lands STRICTLY after the window's first
    * fetch (otherwise its order against the unretained prefix is
    * unknowable → fail-fast says to pass `history` explicitly), unless
    * the window IS the URL's complete history (≤ keep fetches), where
    * any position folds. The window's tail is cross-checked against
    * the stored statistics first — a ring the operator forgot to feed
    * fails loudly, never silently corrupts. After the fold the late
    * rows are recorded into the ring (own replay guard), so the window
    * stays complete for the NEXT backfill.
    *
    * Scale: the exact classes are one join against the O(urls) store;
    * the rebuild touches `history` (or the O(urls·keep) ring) once,
    * semi-join-pruned to the overlap URLs — a late batch's overlap set
    * is batch-sized, so the rebuild is bounded by the batch, not the
    * log. Replay-guarded like [[updateStats]] (same sentinel
    * protocol). */
  def backfillStats(store: graft.store.ParquetStore, lateBatch: DataFrame,
                    history: DataFrame = null,
                    urlCol: String = "url", usCol: String = "fetch_us",
                    digestCol: String = "digest",
                    tieBreak: Seq[String] = Nil,
                    batchId: Long = -1L, scope: String = "",
                    historyStore: graft.store.ParquetStore = null,
                    keepHistory: Int = 0): Unit = {
    // ONE pinned read of the ring's rows for the late batch's URLs,
    // shared by the rebuild's window and the ordinal rewrite (both
    // consume it, and the rewrite supersedes the rows it was built
    // from — read-before-modify). Taken BEFORE the fold so the replay
    // branch sees the same shape.
    val ringRetained =
      if (historyStore == null) null
      else retainedHistoryFor(historyStore,
          lateBatch.select(col(urlCol).as("url")))
        .localCheckpoint(eager = true)
    if (store.batchApplied(scope, batchId)) {
      // The stats fold landed but a crash may have preceded the ring
      // append — converge it (the record has its own guard).
      if (historyStore != null)
        recordBackfillHistory(store, historyStore, ringRetained,
          lateBatch, urlCol, usCol, digestCol, keepHistory, batchId,
          scope)
      return
    }
    val lb = batchStats(lateBatch, urlCol, usCol, digestCol, tieBreak)
    val stored = latestStats(store).select(
      col("url"), col("n_fetches").as("_sn"), col("n_changes").as("_sx"),
      col("first_us").as("_sf"), col("last_us").as("_sl"),
      col("first_digest").as("_sfd"), col("last_digest").as("_sld"))
    val joined = lb.join(stored, Seq("url"), "left").persist()
    try {
      val isAppend = col("_sl").isNotNull && col("first_us") > col("_sl")
      val isPrepend = col("_sl").isNotNull && col("last_us") < col("_sf")
      val isOverlap = col("_sl").isNotNull && !isAppend && !isPrepend
      val exact = joined.filter(!isOverlap)
        .select(
          col("url"),
          (col("n_fetches") + coalesce(col("_sn"), lit(0L)))
            .as("n_fetches"),
          (col("n_changes") + coalesce(col("_sx"), lit(0L)) +
            when(isAppend && col("_sld") =!= col("first_digest"), 1L)
              .when(isPrepend && col("last_digest") =!= col("_sfd"), 1L)
              .otherwise(0L)).as("n_changes"),
          least(col("first_us"), coalesce(col("_sf"), col("first_us")))
            .as("first_us"),
          greatest(col("last_us"), coalesce(col("_sl"), col("last_us")))
            .as("last_us"),
          when(isAppend, col("_sfd")).otherwise(col("first_digest"))
            .as("first_digest"),
          when(isPrepend, col("_sld")).otherwise(col("last_digest"))
            .as("last_digest"))
      val overlapUrls = joined.filter(isOverlap)
        .select(col("url").as(urlCol))
      val out =
        if (history != null) {
          val sel = (Seq(urlCol, usCol, digestCol) ++ tieBreak).map(col)
          val touched = history.select(sel: _*)
            .unionByName(lateBatch.select(sel: _*))
            .join(overlapUrls, Seq(urlCol), "left_semi")
          exact.unionByName(
            batchStats(touched, urlCol, usCol, digestCol, tieBreak))
        } else if (historyStore != null) {
          exact.unionByName(rebuildFromRing(historyStore, ringRetained,
            joined, isOverlap, lateBatch, urlCol, usCol, digestCol,
            tieBreak))
        } else {
          // No retained history: fail fast IF any URL actually needs the
          // rebuild (one pruned probe — the disjoint classes still fold
          // exactly without a history).
          require(overlapUrls.isEmpty,
            "backfillStats: this batch lands inside (or ties) the " +
              "stored span for some URL(s) — exact rebuild needs the " +
              "`history` argument (their complete prior fetch history) " +
              "or an attached retained-history ring (`historyStore`)")
          exact
        }
      // Pinned before the append (r18): the guards fire here, the
      // append writes a trivial scan, and the ring record below reuses
      // the post-fold rows instead of re-reading the store twice
      // (nAfter + trim candidates were each a full latest-per-key
      // window over the store it just wrote).
      val outPinned = out.localCheckpoint(eager = true)
      appendWithSentinel(store, outPinned, batchId, scope)
      // Ring append AFTER the stats fold (a crash in between converges
      // on the re-run: stats skip by their sentinel, the ring records).
      // An out-of-order batch re-stamps the touched URLs' ORDINALS
      // wholesale — see [[recordBackfillHistory]].
      if (historyStore != null)
        recordBackfillHistory(store, historyStore, ringRetained,
          lateBatch, urlCol, usCol, digestCol, keepHistory, batchId,
          scope, postStats = outPinned)
    } finally { joined.unpersist(); () }
  }

  /** The backfill's ring record: an out-of-order batch shifts the
    * touched URLs' fetch ORDINALS (an interior insert renumbers every
    * later fetch; a prepend renumbers all of them), so instead of
    * appending the late rows with fresh stamps, the ENTIRE retained
    * window of each touched URL is re-appended with corrected ordinals
    * (`n_after − count + rank` — latest-per-fetch-key collapse makes a
    * re-append an in-place restamp). Corrected ords are written only
    * when the PRE-fold window was provably sound (non-null contiguous
    * ords ending at the pre-fold count); an unsound or legacy-null
    * window is stamped null — downgraded, never lied about. Own replay
    * guard; convergent with the stats fold across any crash point. */
  private def recordBackfillHistory(store: graft.store.ParquetStore,
                                    ring: graft.store.ParquetStore,
                                    /** Pinned ring rows for the late
                                      * batch's URLs (the caller's
                                      * read-before-modify snapshot). */
                                    retained: DataFrame,
                                    lateBatch: DataFrame, urlCol: String,
                                    usCol: String, digestCol: String,
                                    keep: Int, batchId: Long,
                                    scope: String,
                                    /** The backfill's pinned post-fold
                                      * stats rows (exactly the late
                                      * batch's urls) when this call
                                      * runs in the same fold; null on
                                      * the replay path, which re-reads
                                      * the store. */
                                    postStats: DataFrame = null): Unit = {
    // Post-fold stats for the late batch's urls: the fold's own pinned
    // output when available (r18 — it IS the newest generation for
    // those urls), else a latest-per-key read of the store.
    def postForBatch: DataFrame =
      if (postStats != null) postStats
      else latestStats(store)
        .join(lateBatch.select(col(urlCol).as("url")).distinct(),
          Seq("url"), "left_semi")
    // Trim candidates (r17, the [[foldBatch]] narrowing): only a url
    // whose post-fold count exceeds `keep` can hold trim victims — the
    // stats store knows that without a ring scan, and the backfill's
    // stats fold has landed by the time any trim below runs.
    def trimCand: DataFrame = postForBatch
      .filter(col("n_fetches") > keep)
      .select(col("url"))
    if (ring.batchApplied(scope, batchId)) {
      // Same replay-path trim convergence as [[recordHistory]] (advice
      // r16): the restamp landed, the trim may not have.
      trimRing(ring, trimCand, keep, probeFirst = true)
      return
    }
    val tieNames = historyTieNames(ring)
    val keysCols = Seq("url", "fetch_us") ++ tieNames
    val late = normalizedFetches(lateBatch, urlCol, usCol, digestCol,
      tieNames)
    val urls = late.select(col("url")).distinct()
    val lateNew = late.join(retained.select(keysCols.map(col): _*),
      keysCols, "left_anti")
    // Every join against nAfter below is keyed on this batch's urls,
    // so the batch-scoped post-fold rows are equivalent to the full
    // store read (r18).
    val nAfter = postForBatch
      .select(col("url"), col("n_fetches").as("_na"))
    // Pre-fold soundness: retained ords all present, contiguous, and
    // ending exactly at the pre-fold count (n_after minus the rows
    // this batch adds). An empty window is sound only for a url whose
    // WHOLE history is this batch.
    val rAgg = retained.groupBy(col("url")).agg(
      count(lit(1)).as("_rc"), count(col("ord")).as("_ro"),
      min(col("ord")).as("_rmin"), max(col("ord")).as("_rmax"))
    val lAgg = lateNew.groupBy(col("url")).agg(count(lit(1)).as("_ln"))
    val sound = urls.join(rAgg, Seq("url"), "left")
      .join(lAgg, Seq("url"), "left").join(nAfter, Seq("url"))
      .select(col("url"), (
        coalesce(col("_ro"), lit(0L)) === coalesce(col("_rc"), lit(0L)) &&
          coalesce(col("_rmax"), lit(0L)) ===
            col("_na") - coalesce(col("_ln"), lit(0L)) &&
          (coalesce(col("_rmax"), lit(0L)) -
            coalesce(col("_rmin"), lit(1L)) + 1L) ===
            coalesce(col("_rc"), lit(0L))).as("_sound"))
    val sel = (Seq("url", "fetch_us", "digest") ++ tieNames).map(col)
    val combined = retained.select(sel: _*)
      .unionByName(late.select(sel: _*))
      .dropDuplicates(keysCols)
    val w = Window.partitionBy(col("url"))
      .orderBy((col("fetch_us") +: tieNames.map(col)): _*)
    val cw = Window.partitionBy(col("url"))
    // Append only rows whose ordinal CHANGED — the late rows plus the
    // shifted suffix after each insertion point; rows before it keep
    // their stored stamps, so the write volume is bounded by the
    // displacement, not the window (with a tail-adjacent backfill
    // that's ~the batch itself).
    val oldOrd = retained.select((keysCols.map(col) :+
      col("ord").as("_old_ord")): _*)
    val rows = combined
      .withColumn("_rn", row_number().over(w))
      .withColumn("_cnt", count(lit(1)).over(cw))
      .join(nAfter, Seq("url"))
      .join(sound, Seq("url"), "left")
      .withColumn("ord", when(coalesce(col("_sound"), lit(false)),
        col("_na") - col("_cnt") + col("_rn")).cast("long"))
      .drop("_rn", "_cnt", "_na", "_sound")
      .join(oldOrd, keysCols, "left")
      // Keep late rows (no stored stamp — `_old_ord` null also covers
      // the retained-with-null-legacy-stamp rows, whose re-append is
      // harmless under latest-per-key) and any row whose stamp moved.
      .filter(col("_old_ord").isNull || !(col("ord") <=> col("_old_ord")))
      .drop("_old_ord")
    appendRingRows(ring, rows, keep, batchId, scope, trimUrls = trimCand)
  }

  /** Fetch rows under the history-store column names. */
  private def normalizedFetches(batch: DataFrame, urlCol: String,
                                usCol: String, digestCol: String,
                                tieBreak: Seq[String]): DataFrame =
    batch.select((Seq(col(urlCol).as("url"), col(usCol).as("fetch_us"),
      col(digestCol).as("digest")) ++ tieBreak.map(col)): _*)

  /** The retained-ring interior rebuild (see [[backfillStats]]):
    * overlap URLs' new stats from the ring window, the late rows, and
    * the stored totals' prefix algebra. `joined` is the (late-batch
    * stats ⟕ stored stats) frame. */
  private def rebuildFromRing(ring: graft.store.ParquetStore,
                              /** Pinned ring rows for the late batch's
                                * URLs — the window semi-joins its
                                * overlap subset from here instead of
                                * re-reading the store. */
                              ringRetained: DataFrame,
                              joined: DataFrame,
                              isOverlap: Column, lateBatch: DataFrame,
                              urlCol: String, usCol: String,
                              digestCol: String,
                              tieBreak: Seq[String]): DataFrame = {
    val tieNames = historyTieNames(ring)
    require(tieNames == tieBreak,
      s"backfillStats: the history store was built with tie-break " +
        s"columns [${tieNames.mkString(",")}] but the fold uses " +
        s"[${tieBreak.mkString(",")}]")
    val over = joined.filter(isOverlap).select(
      col("url"), col("first_us").as("_lfu"),
      col("_sn"), col("_sx"), col("_sf"), col("_sl"),
      col("_sfd"), col("_sld"))
    val overlapUrls = over.select(col("url"))
    // Already pinned by the caller (read-before-modify); the recount
    // feeds several aggregations below while the ordinal rewrite will
    // soon supersede the generations it came from.
    val window = ringRetained.join(overlapUrls, Seq("url"), "left_semi")
    val late = normalizedFetches(lateBatch, urlCol, usCol, digestCol,
      tieBreak).join(overlapUrls, Seq("url"), "left_semi")
    def statsOf(rows: DataFrame, prefix: String): DataFrame =
      batchStats(rows, "url", "fetch_us", "digest", tieBreak).select(
        col("url"), col("n_fetches").as(s"_${prefix}n"),
        col("n_changes").as(s"_${prefix}x"),
        col("first_us").as(s"_${prefix}fu"),
        col("last_us").as(s"_${prefix}lu"),
        col("first_digest").as(s"_${prefix}fd"),
        col("last_digest").as(s"_${prefix}ld"))
    val sel = (Seq("url", "fetch_us", "digest") ++ tieBreak).map(col)
    // Window stats AND the ordinal aggregates — the GAP detector's raw
    // material (r16): when every window row carries its fetch ordinal
    // ([[foldBatch]]'s stamps), the window can be PROVEN to be the
    // exact contiguous suffix of the folded history, catching the one
    // corruption the tail check cannot — a fold whose record call was
    // skipped BETWEEN two recorded ones. Both ride ONE aggregation over
    // the window (r18, guide §2.4: two aggregations keyed the same way
    // share one exchange — fused outright here, one groupBy and one
    // join instead of two of each).
    val wStats = {
      val ordS = struct((Seq("fetch_us") ++ tieBreak).map(col): _*)
      val w = Window.partitionBy(col("url"))
        .orderBy((Seq("fetch_us") ++ tieBreak).map(col): _*)
      window
        .withColumn("_prev", lag(col("digest"), 1).over(w))
        .groupBy(col("url")).agg(
          count(lit(1)).as("_wn"),
          sum(when(col("_prev").isNotNull &&
            col("_prev") =!= col("digest"), 1L).otherwise(0L)).as("_wx"),
          min(col("fetch_us")).as("_wfu"),
          max(col("fetch_us")).as("_wlu"),
          min_by(col("digest"), ordS).as("_wfd"),
          max_by(col("digest"), ordS).as("_wld"),
          count(col("ord")).as("_woc"), min(col("ord")).as("_wmo"),
          max(col("ord")).as("_wxo"))
    }
    val cStats = statsOf(window.select(sel: _*).unionByName(late)
      .dropDuplicates(Seq("url", "fetch_us") ++ tieBreak), "c")
    val o = over.join(wStats, Seq("url"), "left")
      .join(cStats, Seq("url"), "left")
    // The ring's window must END where the statistics say the history
    // ends — the tail cross-check every window passes…
    val inSync = col("_wlu").isNotNull && col("_wlu") === col("_sl") &&
      col("_wld") <=> col("_sld")
    // …and, when ordinals are present on every row, the window must be
    // CONTIGUOUS and end at the stored count — the exact-suffix proof.
    // Legacy/null-ord windows skip this (downgraded, documented).
    val ordsOk = col("_woc") === col("_wn")
    val contiguous = col("_wxo") === col("_sn") &&
      (col("_wxo") - col("_wmo") + 1L) === col("_wn")
    // Window == the URL's complete history → any late position folds;
    // otherwise every late row must land strictly after the window's
    // first fetch (its order against the unretained prefix is
    // unknowable at or before it).
    val complete = col("_wn") === col("_sn") && col("_wfu") === col("_sf")
    val covered = complete || col("_lfu") > col("_wfu")
    o.select(
      col("url"),
      // Guards ride the kept column (the updateStats raise_error
      // pattern): the first violating row aborts the append action.
      when(!inSync, raise_error(concat(
          lit("backfillStats: retained history out of sync for URL '"),
          col("url"),
          lit("' — record every folded batch with recordHistory")))
          .cast("long"))
        .when(ordsOk && !contiguous, raise_error(concat(
          lit("backfillStats: retained history has an INTERIOR GAP " +
            "for URL '"), col("url"),
          lit("' (a folded batch was never recorded) — rebuild the " +
            "ring or pass the complete `history` explicitly")))
          .cast("long"))
        .when(!covered, raise_error(concat(
          lit("backfillStats: late batch for URL '"), col("url"),
          lit("' predates the retained history window — pass the " +
            "complete `history` explicitly"))).cast("long"))
        .when(complete, col("_cn"))
        .otherwise(col("_sn") - col("_wn") + col("_cn"))
        .as("n_fetches"),
      when(complete, col("_cx"))
        .otherwise(col("_sx") - col("_wx") + col("_cx")).as("n_changes"),
      when(complete, col("_cfu")).otherwise(col("_sf")).as("first_us"),
      col("_clu").as("last_us"),
      when(complete, col("_cfd")).otherwise(col("_sfd"))
        .as("first_digest"),
      col("_cld").as("last_digest"))
  }

  /** Stamp merged stats rows with the batch lineage and append them with
    * the collapse-proof applied sentinel — the shared tail of
    * [[updateStats]] and [[backfillStats]]. */
  private def appendWithSentinel(store: graft.store.ParquetStore,
                                 merged: DataFrame, batchId: Long,
                                 scope: String): Unit = {
    val stamped = merged
      .withColumn("batch_id", lit(batchId))
      .withColumn("scope", lit(scope))
    val withSentinel =
      if (batchId < 0) stamped
      else stamped.unionByName(store.spark.range(1).select(
        lit(sentinelKey(scope)).as("url"),
        lit(0L).as("n_fetches"), lit(0L).as("n_changes"),
        lit(0L).as("first_us"), lit(0L).as("last_us"),
        lit(null).cast("string").as("first_digest"),
        lit(null).cast("string").as("last_digest"),
        lit(batchId).as("batch_id"), lit(scope).as("scope")))
    store.appendStreaming(withSentinel)
    ()
  }

  /** Latest stats row per URL, sentinels excluded. */
  private def latestStats(store: graft.store.ParquetStore): DataFrame =
    store.latestPerKey(Seq("url"))
      .filter(!col("url").startsWith("#applied:"))
      .drop("rst_id", "batch_id", "scope")

  /** [[changeRates]] read from the stats store instead of a fetch log —
    * identical output columns, identical values (oracle-gated), O(urls)
    * input. */
  def ratesFromStats(store: graft.store.ParquetStore,
                     minIntervalUs: Long = 3600L * 1000000L,
                     maxIntervalUs: Long = 30L * 86400L * 1000000L,
                     defaultIntervalUs: Long = 86400L * 1000000L)
      : DataFrame = {
    require(minIntervalUs > 0 && maxIntervalUs >= minIntervalUs,
      "recrawl clamp must satisfy 0 < min <= max")
    withEstimates(
      latestStats(store)
        .withColumn("span_us", col("last_us") - col("first_us"))
        .select(col("url"), col("n_fetches"), col("n_changes"),
          col("span_us"), col("last_us")),
      minIntervalUs, maxIntervalUs, defaultIntervalUs)
  }

  /** The DUE slice of a change-rate table at `nowUs`: URLs whose
    * `next_fetch_us` has passed, with `overdue_us` for ranking.
    * Feed the result (gated by [[graft.streaming.CrawlSchedule
    * .gateFrontier]] and paced by `scheduleBatch`) as the trigger's
    * frontier — recrawl decides WHAT, politeness decides WHEN. */
  def dueFrontier(rates: DataFrame, nowUs: Long): DataFrame =
    rates.filter(col("next_fetch_us") <= nowUs)
      .withColumn("overdue_us", lit(nowUs) - col("next_fetch_us"))

  /** PUBLISHER-HINT recrawl — the third freshness signal next to the
    * change-rate estimate and the error backoff: sitemap `<lastmod>`
    * declarations joined against the stored last-fetch instant; a URL
    * is due when the publisher says it changed after we last saw it.
    * `rates` is [[changeRates]]/[[ratesFromStats]] output (`url`,
    * `last_us`); `hints` is `(url, lastmod_us)` — feed it from
    * [[graft.sources.Sitemaps.entries]] with the lastmod parsed to
    * epoch micros. Hints reduce to the NEWEST declaration per URL
    * first: a URL listed in several stored sitemaps (or an old and a
    * re-fetched copy of one) must come out due once, not once per
    * declaration. One aggregation + one equi-join on the URL key; no
    * broadcast hint — a full-web sitemap sweep is not small, AQE picks
    * the strategy. */
  def dueByLastmod(rates: DataFrame, hints: DataFrame): DataFrame =
    rates.join(
        hints.groupBy(col("url"))
          .agg(max(col("lastmod_us")).as("lastmod_us")),
        Seq("url"))
      .filter(col("lastmod_us") > col("last_us"))

  /** Per-HOST error backoff over a recent fetch log
    * `(hostCol, statusCol)`: hosts answering 429 / 5xx get their crawl
    * delay scaled by `2^min(n_errors, maxExp)` — AIMD-style pressure
    * relief the next trigger applies via [[delaysWithBackoff]]. The
    * multiplier is an exact power of two (`pow` on small ints is
    * exactly representable), so scaled delays stay hash-comparable.
    * Output: `(domain, n_errors, backoff_mult)` for ERRORING hosts
    * only (review r14): the healthy majority of a crawl-scale host
    * universe would otherwise ride the compose join's broadcast side
    * as millions of no-op (0, ×1) rows — [[delaysWithBackoff]]'s
    * coalesce already treats an absent host as ×1. */
  def backoffMultipliers(fetchLog: DataFrame, hostCol: String = "url_host",
                         statusCol: String = "http_status",
                         maxExp: Int = 6): DataFrame = {
    // 2^63 overflows the long multiplier (advice r14): an unguarded
    // maxExp would saturate/overflow pow(2, n).cast(long) into wrong —
    // and non-oracle-comparable — backoff multipliers.
    require(maxExp >= 0 && maxExp <= 62,
      s"backoffMultipliers: maxExp must be in [0, 62], got $maxExp")
    fetchLog
      .groupBy(col(hostCol).as("domain"))
      .agg(sum(when(col(statusCol) === 429L ||
          (col(statusCol) >= 500L && col(statusCol) <= 599L), 1L)
        .otherwise(0L)).as("n_errors"))
      .filter(col("n_errors") > 0L)
      .withColumn("backoff_mult",
        pow(lit(2.0d), least(col("n_errors"), lit(maxExp.toLong))
          .cast("double")).cast("long"))
  }

  /** Compose a per-host delay table (e.g. [[graft.streaming
    * .CrawlSchedule.delaysFrom]]) with [[backoffMultipliers]]:
    * `crawl_delay * backoff_mult`, hosts without recent errors
    * unchanged. Power-of-two scaling of a double is exact — the
    * schedule arithmetic downstream stays deterministic. One
    * broadcast-sized left join. */
  def delaysWithBackoff(delays: DataFrame, backoff: DataFrame,
                        domainCol: String = "domain"): DataFrame =
    delays.join(
        broadcast(backoff.select(col("domain").as(domainCol),
          col("backoff_mult"))),
        Seq(domainCol), "left")
      .select(col(domainCol),
        (col("crawl_delay") *
          coalesce(col("backoff_mult"), lit(1L)).cast("double"))
          .as("crawl_delay"))
}
