package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryPack

/** Robots-policy coverage: every document becomes a URL path routed
  * through a realistic robots.txt (wildcards, end anchors, an Allow
  * carve-out inside a Disallow subtree, a deny-all `*` group) — the
  * allow/deny decision per variant is closed-form in doc_id, which
  * DuckDB re-derives with no robots parsing anywhere. */
object RobotsPack extends QueryPack {

  private val Fixture =
    """User-agent: graftbot
      |Disallow: /private/
      |Allow: /private/public/
      |Disallow: /*.pdf$
      |Crawl-delay: 2
      |
      |User-agent: *
      |Disallow: /
      |""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map(
      "q_robots" -> { (s, dir) =>
        import s.implicits._
        val urls = table(s, dir, "documents")
          .select(col("doc_id")).as[Long]
          .map { id =>
            val path = (id % 5).toInt match {
              case 0 => s"/articles/$id.html"
              case 1 => s"/private/$id.html"
              case 2 => s"/private/public/$id.html"
              case 3 => s"/docs/$id.pdf"
              case _ => s"/private/public/$id.pdf"
            }
            (id, Fixture, path)
          }.toDF("doc_id", "robots", "path")
        Robots.withAllowed(urls, "robots", "path", "graftbot")
          .select(col("doc_id"), col("allowed"), col("crawl_delay"))
      },
      // Sitemap explode (r11): a genuine urlset per document — three
      // URLs, one entity-escaped query string, one lastmod, the whole
      // file gzipped on even ids (the .xml.gz auto-detect path) — and
      // the exploded entries re-derived closed-form in SQL.
      "q_sitemap" -> { (s, dir) =>
        import s.implicits._
        val maps = table(s, dir, "documents")
          .select(col("doc_id")).as[Long]
          .map { id =>
            val xml = "<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
              "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">" +
              (0 until 3).map { j =>
                val loc = s"https://example.org/d/$id/p$j" +
                  (if (j == 2) "?a=1&amp;b=2" else "")
                "<url><loc>" + loc + "</loc>" +
                  (if (j == 0)
                    f"<lastmod>2024-01-${id % 28 + 1}%02d</lastmod>"
                  else "") + "</url>"
              }.mkString + "</urlset>"
            val bytes = xml.getBytes("UTF-8")
            (id, if (id % 2 == 0) WarcPack.gzipBytes(bytes) else bytes)
          }.toDF("doc_id", "bytes")
        Sitemaps.entries(maps)
          .select(col("doc_id"), col("entry_ix"), col("loc"),
            col("lastmod"), col("is_index"))
      },
      // Feed explode (r11): the third discovery leg — even ids a
      // genuine RSS 2.0 channel (link/pubDate as element TEXT), odd
      // ids an Atom feed (link as the href ATTRIBUTE, with a
      // rel="self" decoy that must lose to the alternate link,
      // published falling back to updated on the second entry), one
      // entity-escaped title each, gzipped every fourth id.
      "q_feed_entries" -> { (s, dir) =>
        import s.implicits._
        val feeds = table(s, dir, "documents")
          .select(col("doc_id")).as[Long]
          .map { id =>
            val xml =
              if (id % 2 == 0)
                "<?xml version=\"1.0\"?><rss version=\"2.0\"><channel>" +
                  s"<title>Feed $id</title>" +
                  (0 until 2).map { j =>
                    s"<item><title>T $id &amp; $j</title>" +
                      s"<link>https://f.org/$id/r$j</link>" +
                      (if (j == 0)
                        f"<pubDate>Mon, ${id % 28 + 1}%02d Jan 2024 " +
                          "13:05:07 GMT</pubDate>"
                      else "") + "</item>"
                  }.mkString + "</channel></rss>"
              else
                "<?xml version=\"1.0\"?>" +
                  "<feed xmlns=\"http://www.w3.org/2005/Atom\">" +
                  s"<title>Feed $id</title>" +
                  "<link rel=\"self\" href=\"https://f.org/feed.xml\"/>" +
                  (0 until 2).map { j =>
                    s"<entry><title>T $id &amp; $j</title>" +
                      "<link rel=\"self\" href=\"https://f.org/decoy\"/>" +
                      s"""<link href="https://f.org/$id/a$j"/>""" +
                      (if (j == 0)
                        s"<published>2024-01-02T00:00:0${id % 10}Z</published>"
                      else s"<updated>2024-02-03T00:00:0${id % 10}Z</updated>") +
                      "</entry>"
                  }.mkString + "</feed>"
            val bytes = xml.getBytes("UTF-8")
            (id, if (id % 4 == 0) WarcPack.gzipBytes(bytes) else bytes)
          }.toDF("doc_id", "bytes")
        Feeds.entries(feeds)
          .select(col("doc_id"), col("entry_ix"), col("title"),
            col("link"), col("published"), col("published_iso"),
            col("is_atom"))
      },
      // Politeness schedule (r11): robots-declared crawl delays turned
      // into per-host fetch offsets — each of the five domains paces
      // its fetches at its OWN delay, so fetch_seq and the offset are
      // both closed-form in the id (contiguous ids round-robin the
      // domains: the k-th fetch of domain g is id = 5k + g).
      "q_fetch_schedule" -> { (s, dir) =>
        import s.implicits._
        val urls = table(s, dir, "documents")
          .select(col("doc_id")).as[Long]
          .map { id =>
            val g = id % 5
            val robots = s"User-agent: *\nCrawl-delay: ${g + 1}\n"
            (id, s"site$g.com", robots, s"/p$id")
          }.toDF("doc_id", "url_domain", "robots", "path")
        val gated = Robots.withAllowed(urls, "robots", "path", "graftbot")
          .filter(col("allowed"))
        graft.operators.Url.politenessSchedule(gated, "url_domain",
            "crawl_delay", col("doc_id"))
          .select(col("doc_id"), col("url_domain"), col("fetch_seq"),
            col("start_offset_s"))
      },
      // INCREMENTAL politeness (r12): the frontier arrives as two
      // batches (even ids, then odd) scheduled against a DURABLE
      // host-state store — each host's batch-2 offsets must CONTINUE
      // from its batch-1 state at its own delay, never restart at 0.
      // The oracle re-derives the global sequence with one window over
      // (batch, id) arrival order — incremental == one batch pass over
      // the arrival-ordered union.
      "q_fetch_schedule_inc" -> { (s, dir) =>
        import s.implicits._
        def urls(batch2: Boolean) = table(s, dir, "documents")
          .select(col("doc_id")).as[Long]
          .filter((id: Long) => (id % 2 == 1) == batch2)
          .map { id =>
            val g = id % 5
            (id, s"site$g.com", (g + 1).toDouble)
          }.toDF("doc_id", "url_domain", "crawl_delay")
        val tmp = java.nio.file.Files.createTempDirectory("graft_sched")
        try {
          val store = graft.streaming.CrawlSchedule.stateStore(s,
            tmp.toString, s"crawl_schedule_${System.nanoTime()}")
          val s1 = graft.streaming.CrawlSchedule.scheduleBatch(store,
            urls(batch2 = false), order = col("doc_id"))
          val s2 = graft.streaming.CrawlSchedule.scheduleBatch(store,
            urls(batch2 = true), order = col("doc_id"))
          s1.union(s2).select(col("doc_id"), col("url_domain"),
            col("fetch_seq"), col("start_offset_s"))
        } finally {
          graft.Fs.deleteRecursively(tmp)
        }
      },
      // ROBOTS-GATED frontier (r13): URLs run through the REAL RFC
      // 9309 matcher against their domain's STORED robots body —
      // site0's policy (the q_robots fixture: Allow carve-out inside a
      // Disallow subtree, pdf end-anchor wildcard) drops variants 1
      // and 3; site1 has no robots row and is fully allowed. Closed
      // form in doc_id.
      // The discovery hop robots feeds (r14): `Sitemap:` directives
      // from each host's latest STORED policy, exploded to the fetch
      // list a discovery loop enqueues — the previously-unwired link
      // between the robots store and the urlset walker
      // (q_sitemap → q_sitemap_recrawl downstream). Hosts declaring
      // none contribute nothing.
      "q_robots_sitemaps" -> { (s, dir) =>
        import s.implicits._
        import graft.streaming.CrawlSchedule
        val tmp = java.nio.file.Files.createTempDirectory("graft_rsm")
        try {
          val rstore = CrawlSchedule.robotsStore(s, tmp.toString,
            s"robots_sm_${System.nanoTime()}")
          val fetches = table(s, dir, "documents")
            .select((col("doc_id") % 9L).as("g")).distinct().as[Long]
            .map { g =>
              val body = "User-agent: *\nDisallow:\n" +
                (0 until (g % 3).toInt).map(j =>
                  s"Sitemap: https://s$g.com/maps/m$j.xml\n").mkString
              (s"https://s$g.com/robots.txt", body)
            }.toDF("url", "text")
          rstore.append(CrawlSchedule.robotsPolicies(fetches, "graftbot"))
          CrawlSchedule.sitemapTargets(rstore)
            .localCheckpoint(eager = true)
        } finally {
          graft.Fs.deleteRecursively(tmp)
        }
      },
      "q_frontier_gate" -> { (s, dir) =>
        import s.implicits._
        import graft.streaming.CrawlSchedule
        val tmp = java.nio.file.Files.createTempDirectory("graft_gate")
        try {
          val rstore = CrawlSchedule.robotsStore(s, tmp.toString,
            s"crawl_gate_${System.nanoTime()}")
          rstore.append(CrawlSchedule.robotsPolicies(
            Seq(("https://site0.com/robots.txt", Fixture))
              .toDF("url", "text"), "graftbot"))
          val urls = table(s, dir, "documents")
            .select(col("doc_id")).as[Long]
            .map { id =>
              val path = (id % 5).toInt match {
                case 0 => s"/articles/$id.html"
                case 1 => s"/private/$id.html"
                case 2 => s"/private/public/$id.html"
                case 3 => s"/docs/$id.pdf"
                case _ => s"/private/public/$id.pdf"
              }
              (id, s"https://site${id % 2}.com$path", s"site${id % 2}.com")
            }.toDF("doc_id", "url", "url_host")
          CrawlSchedule.gateFrontier(urls, rstore, "graftbot")
            .select(col("doc_id"), col("url"))
            .localCheckpoint(eager = true)
        } finally {
          graft.Fs.deleteRecursively(tmp)
        }
      },
      // ROBOTS-STORE-DRIVEN politeness (r12 verdict #3): pacing comes
      // from what the crawler actually FETCHED — robots.txt bodies
      // parse into a durable policy store (latest generation per
      // domain wins: site0's re-fetch updates 1 s → 7 s), the
      // scheduler reads the store's delay table, a host whose robots
      // declares no Crawl-delay (site3) and a host never fetched
      // (site4) both pace at the 1 s default. The oracle re-derives
      // the whole composition closed-form.
      "q_fetch_schedule_robots" -> { (s, dir) =>
        import s.implicits._
        import graft.streaming.CrawlSchedule
        val tmpR = java.nio.file.Files.createTempDirectory("graft_robots")
        val tmpS = java.nio.file.Files.createTempDirectory("graft_schedr")
        try {
          val rstore = CrawlSchedule.robotsStore(s, tmpR.toString,
            s"crawl_robots_${System.nanoTime()}")
          rstore.append(CrawlSchedule.robotsPolicies(Seq(
            ("https://site0.com/robots.txt",
              "User-agent: *\nCrawl-delay: 1\n"),
            ("https://site1.com/robots.txt",
              "User-agent: *\nCrawl-delay: 2\n"),
            ("https://site2.com/robots.txt",
              "User-agent: *\nCrawl-delay: 3\n"),
            ("https://site3.com/robots.txt",
              "User-agent: *\nDisallow: /private/\n"),
            ("https://site2.com/page.html", "Crawl-delay: 99\n"))
            .toDF("url", "text"), "graftbot"))
          // Re-fetch lands a new generation: latest policy wins.
          rstore.append(CrawlSchedule.robotsPolicies(Seq(
            ("https://site0.com/robots.txt",
              "User-agent: *\nCrawl-delay: 7\n")).toDF("url", "text"),
            "graftbot"))
          val delays = CrawlSchedule.delaysFrom(rstore)
            .withColumnRenamed("domain", "url_domain")
          val store = CrawlSchedule.stateStore(s, tmpS.toString,
            s"crawl_schedule_r_${System.nanoTime()}")
          def urls(batch2: Boolean) = table(s, dir, "documents")
            .select(col("doc_id")).as[Long]
            .filter((id: Long) => (id % 2 == 1) == batch2)
            .map(id => (id, s"site${id % 5}.com"))
            .toDF("doc_id", "url_domain")
            .join(delays, Seq("url_domain"), "left")
            .withColumn("crawl_delay",
              coalesce(col("crawl_delay"), lit(1.0d)))
          val s1 = CrawlSchedule.scheduleBatch(store,
            urls(batch2 = false), order = col("doc_id"))
          val s2 = CrawlSchedule.scheduleBatch(store,
            urls(batch2 = true), order = col("doc_id"))
          s1.union(s2).select(col("doc_id"), col("url_domain"),
            col("fetch_seq"), col("start_offset_s"))
        } finally {
          graft.Fs.deleteRecursively(tmpR)
          graft.Fs.deleteRecursively(tmpS)
        }
      }
    )

  // Closed-form expectation: variant 0 has no matching rule (allowed
  // by default); 1 hits Disallow /private/ (9 octets); 2 and 4 hit the
  // 16-octet Allow /private/public/ which outranks both the 9-octet
  // Disallow and the 7-octet pdf-wildcard rule; 3 hits only the
  // pdf-wildcard Disallow.
  override def oracles: Map[String, String] = Map(
    "q_robots" ->
      """SELECT doc_id,
        |  CAST(doc_id % 5 IN (0, 2, 4) AS BOOLEAN) AS allowed,
        |  CAST(2.0 AS DOUBLE) AS crawl_delay
        |FROM documents""".stripMargin,
    "q_sitemap" ->
      """SELECT doc_id, CAST(j AS BIGINT) AS entry_ix,
        |  'https://example.org/d/' || CAST(doc_id AS VARCHAR) || '/p' ||
        |    CAST(j AS VARCHAR) ||
        |    CASE WHEN j = 2 THEN '?a=1&b=2' ELSE '' END AS loc,
        |  CASE WHEN j = 0 THEN '2024-01-' ||
        |    lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
        |    ELSE NULL END AS lastmod,
        |  CAST(FALSE AS BOOLEAN) AS is_index
        |FROM documents, generate_series(0, 2) t(j)""".stripMargin,
    "q_feed_entries" ->
      """SELECT doc_id, CAST(j AS BIGINT) AS entry_ix,
        |  'T ' || CAST(doc_id AS VARCHAR) || ' & ' || CAST(j AS VARCHAR)
        |    AS title,
        |  CASE WHEN doc_id % 2 = 0
        |    THEN 'https://f.org/' || CAST(doc_id AS VARCHAR) || '/r' ||
        |      CAST(j AS VARCHAR)
        |    ELSE 'https://f.org/' || CAST(doc_id AS VARCHAR) || '/a' ||
        |      CAST(j AS VARCHAR) END AS link,
        |  CASE
        |    WHEN doc_id % 2 = 0 AND j = 0 THEN 'Mon, ' ||
        |      lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') ||
        |      ' Jan 2024 13:05:07 GMT'
        |    WHEN doc_id % 2 = 0 THEN NULL
        |    WHEN j = 0 THEN '2024-01-02T00:00:0' ||
        |      CAST(doc_id % 10 AS VARCHAR) || 'Z'
        |    ELSE '2024-02-03T00:00:0' ||
        |      CAST(doc_id % 10 AS VARCHAR) || 'Z' END AS published,
        |  CASE
        |    WHEN doc_id % 2 = 0 AND j = 0 THEN '2024-01-' ||
        |      lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') ||
        |      'T13:05:07Z'
        |    WHEN doc_id % 2 = 0 THEN NULL
        |    WHEN j = 0 THEN '2024-01-02T00:00:0' ||
        |      CAST(doc_id % 10 AS VARCHAR) || 'Z'
        |    ELSE '2024-02-03T00:00:0' ||
        |      CAST(doc_id % 10 AS VARCHAR) || 'Z' END AS published_iso,
        |  doc_id % 2 = 1 AS is_atom
        |FROM documents, generate_series(0, 1) t(j)""".stripMargin,
    "q_fetch_schedule" ->
      """SELECT doc_id,
        |  'site' || CAST(doc_id % 5 AS VARCHAR) || '.com' AS url_domain,
        |  CAST(doc_id // 5 AS BIGINT) AS fetch_seq,
        |  CAST((doc_id // 5) * (doc_id % 5 + 1) AS DOUBLE)
        |    AS start_offset_s
        |FROM documents""".stripMargin,
    // One window over (batch, id) arrival order per host — the
    // cross-batch continuation the durable state must reproduce.
    "q_fetch_schedule_inc" ->
      """WITH s AS (SELECT doc_id, doc_id % 5 AS g,
        |    row_number() OVER (PARTITION BY doc_id % 5
        |      ORDER BY doc_id % 2, doc_id) - 1 AS seq
        |  FROM documents)
        |SELECT doc_id,
        |  'site' || CAST(g AS VARCHAR) || '.com' AS url_domain,
        |  CAST(seq AS BIGINT) AS fetch_seq,
        |  CAST(seq * (g + 1) AS DOUBLE) AS start_offset_s
        |FROM s""".stripMargin,
    // Gate: site0 (even ids) keeps variants 0/2/4 (allowed by default,
    // the 16-octet Allow carve-out, the carve-out again over the pdf
    // wildcard) and drops 1/3; site1 (odd ids) has no stored robots —
    // RFC 9309 allows everything.
    // Hosts g%3=0 declare no sitemap (absent), g%3=1 one, g%3=2 two.
    "q_robots_sitemaps" ->
      """WITH g AS (SELECT DISTINCT doc_id % 9 AS g FROM documents),
        |j AS (SELECT 0 AS j UNION ALL SELECT 1)
        |SELECT 's' || CAST(g AS VARCHAR) || '.com' AS domain,
        |  'https://s' || CAST(g AS VARCHAR) || '.com/maps/m' ||
        |    CAST(j AS VARCHAR) || '.xml' AS sitemap_url
        |FROM g JOIN j ON j < g % 3""".stripMargin,
    "q_frontier_gate" ->
      """SELECT doc_id,
        |  'https://site' || CAST(doc_id % 2 AS VARCHAR) || '.com' ||
        |  CASE CAST(doc_id % 5 AS INTEGER)
        |    WHEN 0 THEN '/articles/' || CAST(doc_id AS VARCHAR) || '.html'
        |    WHEN 1 THEN '/private/' || CAST(doc_id AS VARCHAR) || '.html'
        |    WHEN 2 THEN '/private/public/' || CAST(doc_id AS VARCHAR)
        |      || '.html'
        |    WHEN 3 THEN '/docs/' || CAST(doc_id AS VARCHAR) || '.pdf'
        |    ELSE '/private/public/' || CAST(doc_id AS VARCHAR) || '.pdf'
        |  END AS url
        |FROM documents
        |WHERE doc_id % 2 = 1 OR doc_id % 5 IN (0, 2, 4)""".stripMargin,
    // Robots-driven pacing: site0 re-fetched 1→7 (latest generation
    // wins), sites 1/2 declare 2/3, site3 fetched but declares no
    // delay → default 1, site4 never fetched → default 1; the non-
    // robots URL (site2/page.html) must contribute nothing.
    "q_fetch_schedule_robots" ->
      """WITH s AS (SELECT doc_id, doc_id % 5 AS g,
        |    row_number() OVER (PARTITION BY doc_id % 5
        |      ORDER BY doc_id % 2, doc_id) - 1 AS seq
        |  FROM documents)
        |SELECT doc_id,
        |  'site' || CAST(g AS VARCHAR) || '.com' AS url_domain,
        |  CAST(seq AS BIGINT) AS fetch_seq,
        |  CAST(seq * (CASE g WHEN 0 THEN 7 WHEN 1 THEN 2 WHEN 2 THEN 3
        |    ELSE 1 END) AS DOUBLE) AS start_offset_s
        |FROM s""".stripMargin
  )
}
