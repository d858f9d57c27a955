package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryPack

/** Adaptive recrawl + error backoff as driver-checkable queries (r14).
  * The fetch history is synthesized from the `events` fixture: each
  * user is a URL, each event a fetch, and the content digest is a
  * deterministic bucket of `value` — so the DuckDB oracle re-derives
  * the identical history and walks the same lag window. Everything
  * oracle-gated is exact integer arithmetic (the repo's numeric-
  * determinism rule); the Cho–Garcia-Molina float MLE rides the API
  * only ([[Recrawl.changeRates]] doc). */
object RecrawlPack extends QueryPack {

  private val DayUs = 86400000000L

  private def history(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "events").select(
      concat(lit("https://h"), (col("user_id") % 17L).cast("string"),
        lit(".example/p"), col("user_id").cast("string")).as("url"),
      unix_micros(col("ts")).as("fetch_us"),
      (abs(floor(col("value")).cast("long")) % 5L).cast("string")
        .as("digest"),
      col("event_id"))

  /** The oracle's twin of [[history]]. */
  private val HistorySql =
    """SELECT 'https://h' || CAST(user_id % 17 AS VARCHAR) ||
      |    '.example/p' || CAST(user_id AS VARCHAR) AS url,
      |  epoch_us(ts) AS fetch_us,
      |  CAST(abs(CAST(floor(value) AS BIGINT)) % 5 AS VARCHAR) AS digest,
      |  event_id
      |FROM events""".stripMargin

  /** Per-URL estimate re-derived in SQL: lag window (same event_id
    * tie-break), exact `//` interval, same clamp ladder. */
  private val RatesSql =
    s"""WITH hist AS ($HistorySql),
       |lagged AS (
       |  SELECT url, fetch_us, digest,
       |    lag(digest) OVER (PARTITION BY url ORDER BY fetch_us, event_id)
       |      AS prev
       |  FROM hist),
       |rates AS (
       |  SELECT url, count(*) AS n_fetches,
       |    CAST(sum(CASE WHEN prev IS NOT NULL AND prev <> digest
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
       |    max(fetch_us) - min(fetch_us) AS span_us,
       |    max(fetch_us) AS last_us
       |  FROM lagged GROUP BY url),
       |est AS (
       |  SELECT url, n_fetches, n_changes, span_us, last_us,
       |    least(greatest(
       |      CASE WHEN n_fetches < 2 THEN $DayUs
       |        WHEN n_changes > 0 THEN span_us // n_changes
       |        ELSE span_us * 2 END,
       |      3600000000), 2592000000000) AS next_interval_us
       |  FROM rates)
       |SELECT url, n_fetches, n_changes, span_us, next_interval_us,
       |  last_us + next_interval_us AS next_fetch_us
       |FROM est""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map(
      "q_recrawl_rate" -> { (s, dir) =>
        Recrawl.changeRates(history(s, dir), tieBreak = Seq("event_id"))
          .select(col("url"), col("n_fetches"), col("n_changes"),
            col("span_us"), col("next_interval_us"), col("next_fetch_us"))
      },
      // The due slice at now = last fetch anywhere + 1 day: which URLs
      // a nightly planner would put on tomorrow's frontier, ranked by
      // how overdue they are. (The scalar now is one aggregate row —
      // not a driver loop.)
      "q_recrawl_due" -> { (s, dir) =>
        val hist = history(s, dir)
        val now = hist.agg(max(col("fetch_us"))).first().getLong(0) + DayUs
        Recrawl.dueFrontier(
            Recrawl.changeRates(hist, tieBreak = Seq("event_id")), now)
          .select(col("url"), col("n_changes"), col("next_fetch_us"),
            col("overdue_us"))
      },
      // The INCREMENTAL deployment, oracle-pinned to the full-history
      // answer: the same history split into three 10-day batches, each
      // reduced to per-URL sufficient statistics and folded into a
      // collapse-managed durable store (collapseEvery = 2, so the
      // re-snapshot actually trips mid-run) — [[Recrawl.updateStats]]'s
      // boundary-digest merge must reproduce changeRates EXACTLY
      // without the fetch log ever being kept. Same oracle SQL as
      // q_recrawl_rate by construction.
      "q_recrawl_inc" -> { (s, dir) =>
        val base = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
          f"graft_recrawl_${dir.hashCode}%08x").toString
        val store = Recrawl.statsStore(s, base, "recrawl_stats_q",
          collapseEvery = 2L)
        store.reset()
        val pinned = history(s, dir)
          // Clamped to {0,1,2}: monotone in ts, so per-URL batch order
          // stays time order even if a fixture regen widens the span.
          .withColumn("_b", expr(
            "least(greatest((fetch_us div 86400000000 - 19723) div 10, 0L), 2L)"))
          .localCheckpoint(true)
        (0L to 2L).foreach { b =>
          Recrawl.updateStats(store,
            Recrawl.batchStats(pinned.filter(col("_b") === b),
              tieBreak = Seq("event_id")),
            batchId = b, scope = "q_recrawl_inc")
        }
        Recrawl.ratesFromStats(store)
          .select(col("url"), col("n_fetches"), col("n_changes"),
            col("span_us"), col("next_interval_us"), col("next_fetch_us"))
      },
      // OUT-OF-ORDER fold (r15): the same three 10-day batches, but the
      // MIDDLE one arrives last — the late-backfill shape a real crawl
      // log delivers (retries, multi-DC merges) that updateStats
      // rejects by design. backfillStats folds it: URLs whose late rows
      // land strictly before/after their stored span merge exactly from
      // the sufficient statistics; URLs whose late rows land INSIDE the
      // span rebuild from the retained history, pruned to those URLs
      // only. Same full-history oracle as q_recrawl_rate: out-of-order
      // == in-order == full recompute.
      "q_recrawl_backfill" -> { (s, dir) =>
        val base = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
          f"graft_rebf_${dir.hashCode}%08x").toString
        val store = Recrawl.statsStore(s, base, "recrawl_stats_bf",
          collapseEvery = 2L)
        store.reset()
        val pinned = history(s, dir)
          .withColumn("_b", expr(
            "least(greatest((fetch_us div 86400000000 - 19723) div 10, 0L), 2L)"))
          .localCheckpoint(true)
        Seq(0L, 2L).foreach { b =>
          Recrawl.updateStats(store,
            Recrawl.batchStats(pinned.filter(col("_b") === b),
              tieBreak = Seq("event_id")),
            batchId = b, scope = "q_recrawl_backfill")
        }
        Recrawl.backfillStats(store, pinned.filter(col("_b") === 1L),
          history = pinned.filter(col("_b") =!= 1L),
          tieBreak = Seq("event_id"),
          batchId = 10L, scope = "q_recrawl_backfill")
        Recrawl.ratesFromStats(store)
          .select(col("url"), col("n_fetches"), col("n_changes"),
            col("span_us"), col("next_interval_us"), col("next_fetch_us"))
      },
      // SELF-CONTAINED backfill (r16 — r15 verdict #4): the same
      // out-of-order fold, but with NO external history argument — the
      // retained-history ring (recordHistory beside every in-order
      // fold) carries the interior rebuild: backfillStats cross-checks
      // the ring tail against the stored statistics, recounts the
      // touched URLs' windows with the late rows interleaved, and
      // recovers the unretained prefix exactly from the subtractable
      // totals. Same full-history oracle: ring-rebuilt == in-order ==
      // full recompute.
      "q_recrawl_backfill_ring" -> { (s, dir) =>
        val base = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
          f"graft_rebfr_${dir.hashCode}%08x").toString
        val store = Recrawl.statsStore(s, base, "recrawl_stats_bfr",
          collapseEvery = 2L)
        store.reset()
        val ring = Recrawl.historyStore(s, s"$base-ring",
          "recrawl_hist_bfr",
          tieBreak = Seq(org.apache.spark.sql.types.StructField(
            "event_id", org.apache.spark.sql.types.LongType)),
          collapseEvery = 4L)
        ring.reset()
        val pinned = history(s, dir)
          .withColumn("_b", expr(
            "least(greatest((fetch_us div 86400000000 - 19723) div 10, 0L), 2L)"))
          .localCheckpoint(true)
        // foldBatch = stats fold + ordinal-stamped ring record in one
        // crash-convergent call — the ords make the backfill's
        // exact-suffix gap check bite (r16).
        Seq(0L, 2L).foreach { b =>
          Recrawl.foldBatch(store, pinned.filter(col("_b") === b),
            tieBreak = Seq("event_id"),
            batchId = b, scope = "q_recrawl_bfr",
            historyStore = ring, keepHistory = 100000)
        }
        Recrawl.backfillStats(store, pinned.filter(col("_b") === 1L),
          tieBreak = Seq("event_id"),
          batchId = 10L, scope = "q_recrawl_bfr",
          historyStore = ring, keepHistory = 100000)
        Recrawl.ratesFromStats(store)
          .select(col("url"), col("n_fetches"), col("n_changes"),
            col("span_us"), col("next_interval_us"), col("next_fetch_us"))
      },
      // PRODUCTION-SHAPED ring backfill (r17 — r16 verdict #2 + #8):
      // q_recrawl_backfill_ring above keeps the WHOLE history
      // (keep=100000 — the adversarial integrity fixture, every ring
      // row re-ranked by the restamp); this runs the branch production
      // actually exercises — keep=64 ≪ history, so the interior
      // rebuild recovers the unretained PREFIX's contribution from the
      // subtractable stored totals (the prefix-algebra branch,
      // spec-only until now). The fixture is safe by measured
      // construction: the max per-URL batch-2 fetch count is 38 < 64
      // at sf0.001/0.01/0.1, so after the two in-order folds every
      // URL's retained window either IS its complete history or
      // reaches back into batch 0 — strictly before the late batch's
      // first fetch — and the predates-window fail-fast stays a
      // negative-spec concern (RecrawlSpec pins it); meanwhile
      // 10/85/876 URLs per SF exceed 64 total fetches, so the
      // partial-keep fold genuinely executes, not vacuously. Same
      // full-history oracle: prefix algebra == in-order == recompute.
      "q_recrawl_backfill_ring_k64" -> { (s, dir) =>
        val base = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
          f"graft_rebfk_${dir.hashCode}%08x").toString
        val store = Recrawl.statsStore(s, base, "recrawl_stats_bfk",
          collapseEvery = 2L)
        store.reset()
        val ring = Recrawl.historyStore(s, s"$base-ring",
          "recrawl_hist_bfk",
          tieBreak = Seq(org.apache.spark.sql.types.StructField(
            "event_id", org.apache.spark.sql.types.LongType)),
          collapseEvery = 4L)
        ring.reset()
        val pinned = history(s, dir)
          .withColumn("_b", expr(
            "least(greatest((fetch_us div 86400000000 - 19723) div 10, 0L), 2L)"))
          .localCheckpoint(true)
        Seq(0L, 2L).foreach { b =>
          Recrawl.foldBatch(store, pinned.filter(col("_b") === b),
            tieBreak = Seq("event_id"),
            batchId = b, scope = "q_recrawl_bfk",
            historyStore = ring, keepHistory = 64)
        }
        Recrawl.backfillStats(store, pinned.filter(col("_b") === 1L),
          tieBreak = Seq("event_id"),
          batchId = 10L, scope = "q_recrawl_bfk",
          historyStore = ring, keepHistory = 64)
        Recrawl.ratesFromStats(store)
          .select(col("url"), col("n_fetches"), col("n_changes"),
            col("span_us"), col("next_interval_us"), col("next_fetch_us"))
      },
      // PUBLISHER-HINT recrawl (r14): one genuine sitemap per host —
      // built as real urlset XML, exploded back through the repo's own
      // Sitemaps.entries walker — declares a lastmod per page, and the
      // due set is the URLs whose declared modification postdates the
      // stored last fetch. The oracle re-derives loc/lastmod
      // closed-form (the XML walk itself is q_sitemap's oracle).
      "q_sitemap_recrawl" -> { (s, dir) =>
        import s.implicits._
        val xmlRows = table(s, dir, "events")
          .select((col("user_id") % 17L).as("h"), col("user_id"))
          .distinct()
          .groupBy(col("h"))
          .agg(sort_array(collect_list(col("user_id"))).as("us"))
          .as[(Long, Seq[Long])]
          .map { case (h, us) =>
            val xml = "<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
              "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">" +
              us.map { u =>
                // A third of the pages claim a February edit — those
                // postdate every January fetch and must come out due;
                // the January claims mostly predate the last fetch and
                // must not (the fixture exercises both branches).
                val month = if (u % 3 == 0) "02" else "01"
                f"<url><loc>https://h$h.example/p$u</loc>" +
                  f"<lastmod>2024-$month-${u % 28 + 1}%02d</lastmod></url>"
              }.mkString + "</urlset>"
            (h, xml.getBytes("UTF-8"))
          }.toDF("h", "bytes")
        val hints = graft.sources.Sitemaps.entries(xmlRows)
          .select(col("loc").as("url"),
            unix_micros(to_timestamp(col("lastmod"))).as("lastmod_us"))
        Recrawl.dueByLastmod(
            Recrawl.changeRates(history(s, dir),
              tieBreak = Seq("event_id")), hints)
          .select(col("url"), col("last_us"), col("lastmod_us"))
      },
      // THE FULL CRAWL PLANNER, composed end to end (r14): change-rate
      // estimation decides WHAT is due, the robots store decides WHAT
      // IS ALLOWED (h3.example's deny-all drops its URLs before they
      // consume a politeness slot) and HOW FAST (h5.example declares
      // Crawl-delay 2), and the durable host state paces the batch —
      // most-overdue URLs first within each host. One oracle re-derives
      // the whole composition closed-form.
      "q_crawl_plan" -> { (s, dir) =>
        import s.implicits._
        import graft.streaming.CrawlSchedule
        val base = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
          f"graft_plan_${dir.hashCode}%08x").toString
        val hist = history(s, dir)
        val now = hist.agg(max(col("fetch_us"))).first().getLong(0) + DayUs
        val due = Recrawl.dueFrontier(
            Recrawl.changeRates(hist, tieBreak = Seq("event_id")), now)
          .withColumn("url_host",
            regexp_extract(col("url"), "https://([^/]+)/", 1))
        val rstore = CrawlSchedule.robotsStore(s, s"$base/robots",
          tableName = "plan_robots")
        rstore.reset()
        rstore.append(CrawlSchedule.robotsPolicies(Seq(
          ("https://h3.example/robots.txt", "User-agent: *\nDisallow: /\n"),
          ("https://h5.example/robots.txt",
            "User-agent: *\nCrawl-delay: 2\nDisallow:\n"))
          .toDF("url", "text"), "graftbot"))
        val state = CrawlSchedule.stateStore(s, s"$base/state",
          tableName = "plan_state")
        state.reset()
        val (gated, _) = CrawlSchedule.gateAndPace(state, rstore, due,
          "graftbot")
        CrawlSchedule.scheduleBatch(state, gated,
            domainCol = "url_host", delayCol = "crawl_delay",
            order = struct(lit(0L) - col("overdue_us"), col("url")))
          .select(col("url"), col("url_host"), col("fetch_seq"),
            col("start_offset_s"))
      },
      // THE CRAWL LOOP ACROSS TIME (r15 — r14 verdict #8): q_crawl_plan
      // proved due→gate→pace composes within ONE trigger; this runs the
      // full feedback cycle for THREE — plan → deterministic fetch
      // outcomes (every fetched page changes; some hosts answer 503) →
      // stats fold (updateStats) → error backoff scaling the next
      // trigger's delays → next plan against the ADVANCED host state.
      // Output: every trigger's planned rows; the DuckDB oracle
      // simulates all three cycles closed-form (estimator updates,
      // due-set evolution, backoff-scaled pacing, cross-trigger offset
      // accumulation).
      "q_crawl_loop" -> { (s, dir) =>
        import s.implicits._
        import graft.streaming.CrawlSchedule
        val base = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
          f"graft_loop_${dir.hashCode}%08x").toString
        val hist = history(s, dir)
        val store = Recrawl.statsStore(s, s"$base/stats", "loop_stats",
          collapseEvery = 4L)
        store.reset()
        Recrawl.updateStats(store,
          Recrawl.batchStats(hist, tieBreak = Seq("event_id")),
          batchId = 0L, scope = "q_crawl_loop")
        val rstore = CrawlSchedule.robotsStore(s, s"$base/robots",
          tableName = "loop_robots")
        rstore.reset()
        rstore.append(CrawlSchedule.robotsPolicies(Seq(
          ("https://h3.example/robots.txt", "User-agent: *\nDisallow: /\n"),
          ("https://h5.example/robots.txt",
            "User-agent: *\nCrawl-delay: 2\nDisallow:\n"))
          .toDF("url", "text"), "graftbot"))
        val state = CrawlSchedule.stateStore(s, s"$base/state",
          tableName = "loop_state")
        state.reset()
        val maxUs = hist.agg(max(col("fetch_us"))).first().getLong(0)
        var prevOutcomes: org.apache.spark.sql.DataFrame = null
        val plans = scala.collection.mutable.ArrayBuffer
          .empty[org.apache.spark.sql.DataFrame]
        for (t <- 1 to 3) {
          val now = maxUs + t * DayUs
          val due = Recrawl.dueFrontier(Recrawl.ratesFromStats(store), now)
            .withColumn("url_host",
              regexp_extract(col("url"), "https://([^/]+)/", 1))
          val (gated0, _) = CrawlSchedule.gateAndPace(state, rstore, due,
            "graftbot")
          // The PREVIOUS trigger's erroring hosts pace slower now —
          // backoff is a per-trigger pressure valve, not a cumulative
          // penalty, so only the most recent outcome log feeds it.
          val gated =
            if (prevOutcomes == null) gated0
            else gated0.join(
                broadcast(Recrawl.backoffMultipliers(prevOutcomes)
                  .select(col("domain").as("url_host"),
                    col("backoff_mult"))),
                Seq("url_host"), "left")
              .withColumn("crawl_delay", col("crawl_delay") *
                coalesce(col("backoff_mult"), lit(1L)).cast("double"))
              .drop("backoff_mult")
          val plan = CrawlSchedule.scheduleBatch(state, gated,
              domainCol = "url_host", delayCol = "crawl_delay",
              order = struct(lit(0L) - col("overdue_us"), col("url")),
              batchId = t, scope = "q_crawl_loop_sched")
            .select(col("url"), col("url_host"), col("fetch_seq"),
              col("start_offset_s"))
            .localCheckpoint(true)
          plans += plan.withColumn("trig", lit(t.toLong))
          // Deterministic outcomes: every fetched page changed (a fresh
          // digest per trigger), and uid % 5 == t answers 503 — next
          // trigger's backoff signal.
          val outcomes = plan.select(col("url"), col("url_host"),
              lit(now).as("fetch_us"),
              concat(lit("chg"), lit(t)).as("digest"),
              when(regexp_extract(col("url"), "/p(\\d+)$", 1)
                .cast("long") % 5L === t.toLong, 503L)
                .otherwise(200L).as("http_status"))
            .localCheckpoint(true)
          Recrawl.updateStats(store, Recrawl.batchStats(outcomes),
            batchId = t, scope = "q_crawl_loop")
          prevOutcomes = outcomes
        }
        plans.reduce(_ unionByName _)
          .select(col("trig"), col("url"), col("url_host"),
            col("fetch_seq"), col("start_offset_s"))
      },
      // Per-host error backoff composed onto the politeness delays:
      // hosts recently answering 429/5xx get their crawl delay scaled
      // 2^min(errors, 6) — exact power-of-two scaling of exact-half
      // base delays, so the composed delay hash-compares.
      "q_backoff" -> { (s, dir) =>
        val log = table(s, dir, "events").select(
          concat(lit("h"), (col("user_id") % 37L).cast("string"))
            .as("url_host"),
          when(col("event_id") % 11L === 0L, 503L)
            .when(col("event_id") % 13L === 0L, 429L)
            .otherwise(200L).as("http_status"))
        val base = log.select(col("url_host").as("domain")).distinct()
          .withColumn("crawl_delay",
            (substring(col("domain"), 2, 10).cast("long") % 4L)
              .cast("double") * 0.5d + 0.5d)
        // backoffMultipliers emits erroring hosts only (scale: the
        // healthy majority never rides the compose join) — the query
        // surfaces every host, absent ones at (0, ×1), matching the
        // oracle's full table.
        val mult = Recrawl.backoffMultipliers(log)
        Recrawl.delaysWithBackoff(base, mult)
          .join(mult, Seq("domain"), "left")
          .select(col("domain"),
            coalesce(col("n_errors"), lit(0L)).as("n_errors"),
            coalesce(col("backoff_mult"), lit(1L)).as("backoff_mult"),
            col("crawl_delay"))
      }
    )

  override def oracles: Map[String, String] = Map(
    "q_recrawl_rate" -> RatesSql,
    // Incremental == full recompute, so the oracle IS q_recrawl_rate's.
    "q_recrawl_inc" -> RatesSql,
    // Out-of-order fold == full recompute too (r15).
    "q_recrawl_backfill" -> RatesSql,
    "q_recrawl_backfill_ring" -> RatesSql,
    // The partial-keep (keep=64) branch folds to the identical answer.
    "q_recrawl_backfill_ring_k64" -> RatesSql,
    // Hint join re-derived closed-form: per-URL lastmod (same date
    // arithmetic as the XML construction) vs the lag-window last fetch.
    "q_sitemap_recrawl" ->
      s"""WITH hist AS ($HistorySql),
         |r AS (SELECT url, max(fetch_us) AS last_us FROM hist
         |  GROUP BY url),
         |sm AS (
         |  SELECT DISTINCT
         |    'https://h' || CAST(user_id % 17 AS VARCHAR) ||
         |      '.example/p' || CAST(user_id AS VARCHAR) AS url,
         |    epoch_us(CAST('2024-' ||
         |      CASE WHEN user_id % 3 = 0 THEN '02' ELSE '01' END ||
         |      '-' || lpad(CAST(user_id % 28 + 1 AS VARCHAR), 2, '0')
         |      AS TIMESTAMP)) AS lastmod_us
         |  FROM events)
         |SELECT r.url, r.last_us, sm.lastmod_us
         |FROM r JOIN sm USING (url)
         |WHERE sm.lastmod_us > r.last_us""".stripMargin,
    // The planner composition re-derived closed-form: due slice → host
    // extraction → h3 deny-all gate → per-host overdue-desc sequencing
    // at each host's declared (h5: 2 s) or default (1 s) delay.
    "q_crawl_plan" ->
      s"""WITH r AS ($RatesSql),
         |n AS (SELECT max(epoch_us(ts)) + $DayUs AS now_us FROM events),
         |due AS (
         |  SELECT url, now_us - next_fetch_us AS overdue_us
         |  FROM r, n WHERE next_fetch_us <= now_us),
         |hosted AS (
         |  SELECT url, regexp_extract(url, 'https://([^/]+)/', 1)
         |    AS url_host, overdue_us
         |  FROM due),
         |gated AS (SELECT * FROM hosted WHERE url_host <> 'h3.example'),
         |seqd AS (
         |  SELECT url, url_host,
         |    row_number() OVER (PARTITION BY url_host
         |      ORDER BY overdue_us DESC, url) - 1 AS seq
         |  FROM gated)
         |SELECT url, url_host, CAST(seq AS BIGINT) AS fetch_seq,
         |  CAST(seq AS DOUBLE) *
         |    (CASE url_host WHEN 'h5.example' THEN 2.0 ELSE 1.0 END)
         |    AS start_offset_s
         |FROM seqd""".stripMargin,
    // The 3-trigger loop simulated closed-form: per-URL sufficient
    // stats (nf, nx, first, last) evolve only when a URL is planned
    // (every fetch changes the digest → nx + 1; fetched at now_t →
    // last = now_t), the estimator re-derives each trigger's due set,
    // per-host offsets accumulate (next += n × delay), and trigger
    // t+1's delays scale by 2^min(errors_t, 6) for hosts whose planned
    // fetches answered 503 (uid % 5 = t).
    "q_crawl_loop" ->
      s"""WITH hist AS ($HistorySql),
         |lagged AS (
         |  SELECT url, fetch_us, digest,
         |    lag(digest) OVER (PARTITION BY url ORDER BY fetch_us,
         |      event_id) AS prev
         |  FROM hist),
         |s0 AS (
         |  SELECT url, regexp_extract(url, 'https://([^/]+)/', 1) AS host,
         |    CAST(regexp_extract(url, '/p(\\d+)$$', 1) AS BIGINT) AS uid,
         |    count(*) AS nf,
         |    CAST(sum(CASE WHEN prev IS NOT NULL AND prev <> digest
         |      THEN 1 ELSE 0 END) AS BIGINT) AS nx,
         |    min(fetch_us) AS first_us, max(fetch_us) AS last_us
         |  FROM lagged GROUP BY 1, 2, 3),
         |nn AS (SELECT max(epoch_us(ts)) AS mx FROM events),
         |d1 AS (
         |  SELECT url, host, uid, last_us + least(greatest(
         |    CASE WHEN nf < 2 THEN $DayUs
         |      WHEN nx > 0 THEN (last_us - first_us) // nx
         |      ELSE (last_us - first_us) * 2 END,
         |    3600000000), 2592000000000) AS nxt
         |  FROM s0),
         |p1 AS (
         |  SELECT url, host, uid, CAST(row_number() OVER (
         |    PARTITION BY host ORDER BY nxt ASC, url) - 1 AS BIGINT)
         |    AS seq
         |  FROM d1, nn
         |  WHERE nxt <= mx + $DayUs AND host <> 'h3.example'),
         |plan1 AS (
         |  SELECT CAST(1 AS BIGINT) AS trig, url, host, seq AS fetch_seq,
         |    CAST(seq AS DOUBLE) *
         |      (CASE host WHEN 'h5.example' THEN 2.0 ELSE 1.0 END)
         |      AS start_offset_s
         |  FROM p1),
         |h1 AS (
         |  SELECT host, count(*) AS cnt,
         |    count(*) * (CASE host WHEN 'h5.example' THEN 2.0 ELSE 1.0
         |      END) AS nxt_off,
         |    CAST(sum(CASE WHEN uid % 5 = 1 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS ne
         |  FROM p1 GROUP BY host),
         |s1 AS (
         |  SELECT s0.url, s0.host, s0.uid,
         |    s0.nf + (CASE WHEN p1.url IS NOT NULL THEN 1 ELSE 0 END)
         |      AS nf,
         |    s0.nx + (CASE WHEN p1.url IS NOT NULL THEN 1 ELSE 0 END)
         |      AS nx,
         |    s0.first_us,
         |    CASE WHEN p1.url IS NOT NULL THEN mx + $DayUs
         |      ELSE s0.last_us END AS last_us
         |  FROM s0 LEFT JOIN p1 ON s0.url = p1.url, nn),
         |d2 AS (
         |  SELECT url, host, uid, last_us + least(greatest(
         |    CASE WHEN nf < 2 THEN $DayUs
         |      WHEN nx > 0 THEN (last_us - first_us) // nx
         |      ELSE (last_us - first_us) * 2 END,
         |    3600000000), 2592000000000) AS nxt
         |  FROM s1),
         |p2 AS (
         |  SELECT url, host, uid, CAST(row_number() OVER (
         |    PARTITION BY host ORDER BY nxt ASC, url) - 1 AS BIGINT)
         |    AS seq
         |  FROM d2, nn
         |  WHERE nxt <= mx + 2 * $DayUs AND host <> 'h3.example'),
         |del2 AS (
         |  SELECT p.host,
         |    (CASE p.host WHEN 'h5.example' THEN 2.0 ELSE 1.0 END) *
         |      power(2, least(COALESCE(h1.ne, 0), 6)) AS delay
         |  FROM (SELECT DISTINCT host FROM p2) p
         |  LEFT JOIN h1 ON p.host = h1.host),
         |plan2 AS (
         |  SELECT CAST(2 AS BIGINT) AS trig, p2.url, p2.host,
         |    COALESCE(h1.cnt, 0) + p2.seq AS fetch_seq,
         |    COALESCE(h1.nxt_off, 0.0) +
         |      CAST(p2.seq AS DOUBLE) * del2.delay AS start_offset_s,
         |    p2.uid, del2.delay
         |  FROM p2
         |  LEFT JOIN h1 ON p2.host = h1.host
         |  JOIN del2 ON p2.host = del2.host),
         |h2 AS (
         |  SELECT COALESCE(a.host, b.host) AS host,
         |    COALESCE(a.cnt, 0) + COALESCE(b.c2, 0) AS cnt,
         |    COALESCE(a.nxt_off, 0.0) + COALESCE(b.o2, 0.0) AS nxt_off,
         |    COALESCE(b.ne, 0) AS ne
         |  FROM h1 a FULL OUTER JOIN (
         |    SELECT host, count(*) AS c2,
         |      count(*) * max(delay) AS o2,
         |      CAST(sum(CASE WHEN uid % 5 = 2 THEN 1 ELSE 0 END)
         |        AS BIGINT) AS ne
         |    FROM plan2 GROUP BY host) b ON a.host = b.host),
         |s2 AS (
         |  SELECT s1.url, s1.host, s1.uid,
         |    s1.nf + (CASE WHEN p2.url IS NOT NULL THEN 1 ELSE 0 END)
         |      AS nf,
         |    s1.nx + (CASE WHEN p2.url IS NOT NULL THEN 1 ELSE 0 END)
         |      AS nx,
         |    s1.first_us,
         |    CASE WHEN p2.url IS NOT NULL THEN mx + 2 * $DayUs
         |      ELSE s1.last_us END AS last_us
         |  FROM s1 LEFT JOIN p2 ON s1.url = p2.url, nn),
         |d3 AS (
         |  SELECT url, host, uid, last_us + least(greatest(
         |    CASE WHEN nf < 2 THEN $DayUs
         |      WHEN nx > 0 THEN (last_us - first_us) // nx
         |      ELSE (last_us - first_us) * 2 END,
         |    3600000000), 2592000000000) AS nxt
         |  FROM s2),
         |p3 AS (
         |  SELECT url, host, uid, CAST(row_number() OVER (
         |    PARTITION BY host ORDER BY nxt ASC, url) - 1 AS BIGINT)
         |    AS seq
         |  FROM d3, nn
         |  WHERE nxt <= mx + 3 * $DayUs AND host <> 'h3.example'),
         |del3 AS (
         |  SELECT p.host,
         |    (CASE p.host WHEN 'h5.example' THEN 2.0 ELSE 1.0 END) *
         |      power(2, least(COALESCE(h2.ne, 0), 6)) AS delay
         |  FROM (SELECT DISTINCT host FROM p3) p
         |  LEFT JOIN h2 ON p.host = h2.host),
         |plan3 AS (
         |  SELECT CAST(3 AS BIGINT) AS trig, p3.url, p3.host,
         |    COALESCE(h2.cnt, 0) + p3.seq AS fetch_seq,
         |    COALESCE(h2.nxt_off, 0.0) +
         |      CAST(p3.seq AS DOUBLE) * del3.delay AS start_offset_s
         |  FROM p3
         |  LEFT JOIN h2 ON p3.host = h2.host
         |  JOIN del3 ON p3.host = del3.host)
         |SELECT trig, url, host AS url_host, fetch_seq, start_offset_s
         |FROM plan1
         |UNION ALL
         |SELECT trig, url, host, fetch_seq, start_offset_s FROM plan2
         |UNION ALL
         |SELECT trig, url, host, fetch_seq, start_offset_s FROM plan3"""
        .stripMargin,
    "q_recrawl_due" ->
      s"""WITH r AS ($RatesSql),
         |n AS (SELECT max(epoch_us(ts)) + $DayUs AS now_us FROM events)
         |SELECT url, n_changes, next_fetch_us,
         |  now_us - next_fetch_us AS overdue_us
         |FROM r, n WHERE next_fetch_us <= now_us""".stripMargin,
    "q_backoff" ->
      """WITH log AS (
        |  SELECT 'h' || CAST(user_id % 37 AS VARCHAR) AS domain,
        |    CASE WHEN event_id % 11 = 0 THEN 503
        |      WHEN event_id % 13 = 0 THEN 429 ELSE 200 END AS status
        |  FROM events),
        |agg AS (
        |  SELECT domain,
        |    CAST(sum(CASE WHEN status = 429 OR status BETWEEN 500 AND 599
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_errors
        |  FROM log GROUP BY domain)
        |SELECT domain, n_errors,
        |  CAST(power(2, least(n_errors, 6)) AS BIGINT) AS backoff_mult,
        |  (CAST(CAST(substr(domain, 2, 10) AS BIGINT) % 4 AS DOUBLE)
        |    * 0.5 + 0.5) * power(2, least(n_errors, 6)) AS crawl_delay
        |FROM agg""".stripMargin
  )
}
