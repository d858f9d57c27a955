package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryPack

/** HTML-extraction coverage: each document's text is entity-escaped and
  * wrapped in genuinely hostile markup built in-query — a script whose
  * CODE contains markup, a style rule containing `>`, a comment, a
  * quoted attribute containing an entity — and [[Html.extract]] must
  * recover exactly the whitespace-normalized original text plus the
  * constructed title; DuckDB re-derives both independently of the state
  * machine. (The tokenizer's edge cases — unterminated constructs,
  * entity torture, no-double-decode — are spec-pinned in `HtmlSpec`.) */
object HtmlPack extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map(
      "q_html_extract" -> { (s, dir) =>
        import s.implicits._
        val pages = table(s, dir, "documents")
          .filter(col("text").isNotNull) // builder dereferences text
          .select(col("doc_id"), col("text")).transform(graft.Tables.spread).as[(Long, String)]
          .map { case (id, text) =>
            val esc = text.replace("&", "&amp;").replace("<", "&lt;")
              .replace(">", "&gt;")
            (id, s"<html><head><title>t$id</title>" +
              "<script type=\"text/javascript\">var x = '<p>not text</p>';" +
              "</script><style>p > em { color: red; }</style></head>" +
              "<body><!-- skipped --><p class=\"a&quot;b\">" + esc +
              "</p></body></html>")
          }.toDF("doc_id", "html")
        Html.extract(pages)
          .select(col("doc_id"), col("title"),
            col("text").as("extracted"),
            length(col("text")).cast("long").as("n_chars"))
      },
      // WHATWG entity fidelity (r10 verdict #3): astral numerics (emoji
      // surrogate pairs), the C1→cp1252 remap, extended named set, the
      // nbsp/shy corpus normalizations, whitespace refs, and a legacy
      // no-semicolon form — all in one constructed paragraph whose
      // decode DuckDB re-derives from raw code points, no HTML anywhere.
      "q_html_entities" -> { (s, dir) =>
        import s.implicits._
        val pages = table(s, dir, "documents")
          .select(col("doc_id")).transform(graft.Tables.spread).as[Long]
          .map { id =>
            (id, s"<p>d$id A&mdash;B &#x1F600; it&#146;s " +
              "caf&eacute; &hellip; &Omega;&ne;&frac12; x&#10;y " +
              "hy&shy;phen &amp z</p>")
          }.toDF("doc_id", "html")
        Html.extract(pages)
          .select(col("doc_id"), col("text").as("extracted"))
      },
      // Boilerplate extraction (r10 verdict #4): the document text is
      // embedded as the article body of a page dressed in the real
      // chrome a crawler meets — a nav bar of links, a header
      // masthead, a link-dense cookie banner, a share button, a
      // footer. mainText must strip ALL of it and return exactly the
      // whitespace-normalized article (or '' below the prose
      // threshold) — DuckDB re-derives that from the raw text alone.
      "q_html_main" -> { (s, dir) =>
        import s.implicits._
        val pages = table(s, dir, "documents")
          .filter(col("text").isNotNull)
          .select(col("doc_id"), col("text")).transform(graft.Tables.spread).as[(Long, String)]
          .map { case (id, text) =>
            val esc = text.replace("&", "&amp;").replace("<", "&lt;")
              .replace(">", "&gt;")
            (id, s"<html><head><title>t$id</title></head><body>" +
              "<nav><a href=\"/\">Home</a> <a href=\"/a\">About</a> " +
              "<a href=\"/c\">Contact</a></nav>" +
              s"<header><h1>Site $id</h1></header>" +
              "<div>We use cookies <a href=\"#\">Accept</a> " +
              "<a href=\"#\">Decline</a></div>" +
              "<article><p>" + esc + "</p></article>" +
              "<div><a href=\"/s\">Share</a></div>" +
              s"<footer>(c) 2024 Example $id</footer></body></html>")
          }.toDF("doc_id", "html")
        Html.extractMain(pages)
          .select(col("doc_id"), col("main_text"))
      },
      // Outlink extraction + RFC 3986 resolution (r11): eight href
      // shapes — absolute, relative, root-relative, ../ climb,
      // query-only, fragment-only, entity-escaped query, and a mailto
      // that must be filtered — resolved against the page URL; the
      // kept seven re-derived closed-form in SQL.
      "q_html_links" -> { (s, dir) =>
        import s.implicits._
        val pages = table(s, dir, "documents")
          .select(col("doc_id")).transform(graft.Tables.spread).as[Long]
          .map { id =>
            val hrefs = Seq("https://other.org/abs", "rel/p.html",
              "/root.html", "../up.html", "?page=2", "#frag",
              "x.html?a=1&amp;b=2", "mailto:contact@example.org")
            val html = "<html><body>" +
              hrefs.map(h => s"""<a href="$h">l</a>""").mkString +
              "<script>var a = '<a href=\"/code\">no</a>';</script>" +
              "</body></html>"
            (id, s"https://site$id.org/a/b/page.html", html)
          }.toDF("doc_id", "base_url", "html")
        Html.extractLinks(pages, "html", "base_url")
          .filter(col("target_url").startsWith("http"))
          .select(col("doc_id"), col("link_ix"), col("target_url"))
      },
      // Canonical-URL dedup (r11): pages arrive in triples that all
      // declare the same canonical — one bare (its URL IS the key), one
      // via <link rel="alternate canonical"> with a RELATIVE href (and
      // an og:url decoy that must LOSE the precedence), one via og:url
      // alone — plus a canonical inside a comment that must be ignored.
      // Dedup on coalesce(canonical, url) collapses each triple; DuckDB
      // re-derives the key closed-form from the id arithmetic.
      "q_canonical_dedup" -> { (s, dir) =>
        import s.implicits._
        val pages = table(s, dir, "documents")
          .select(col("doc_id")).transform(graft.Tables.spread).as[Long]
          .map { id =>
            val key = s"https://s.org/p${id - id % 3}"
            (id % 3).toInt match {
              case 0 => (id, s"https://s.org/p$id",
                "<html><head><!-- <link rel=\"canonical\" href=\"/evil\"> -->" +
                  "</head><body>x</body></html>")
              case 1 => (id, s"https://s.org/q$id",
                "<html><head>" +
                  s"""<link rel="alternate canonical" href="/p${id - 1}">""" +
                  "<meta property=\"og:url\" content=\"https://decoy.org/x\">" +
                  "</head><body>x</body></html>")
              case _ => (id, s"https://s.org/r$id",
                "<html><head>" +
                  s"""<meta property="og:url" content="$key">""" +
                  "</head><body>x</body></html>")
            }
          }.toDF("doc_id", "url", "html")
        Html.withPageMeta(pages)
          .groupBy(coalesce(col("canonical_url"), col("url")).as("canon_key"))
          .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_dups"))
          .select(col("doc_id"), col("canon_key"), col("n_dups"))
      },
      // The noindex gate (r11): pages a corpus must NOT ingest declare
      // it at the PAGE level (<meta name=robots> listing noindex/none)
      // or the HEADER level (X-Robots-Tag) — real crawl payloads carry
      // both, so the fixture wraps each page in a full HTTP response
      // and the gate reads the META from the parsed html AND the header
      // from the parsed header array. Kept ids are closed-form.
      "q_noindex_gate" -> { (s, dir) =>
        import s.implicits._
        val responses = table(s, dir, "documents")
          .select(col("doc_id")).transform(graft.Tables.spread).as[Long]
          .map { id =>
            val meta = (id % 4).toInt match {
              case 0 => "<meta name=\"robots\" content=\"noindex, nofollow\">"
              case 1 => "<meta name=\"ROBOTS\" content=\"index, follow\">"
              case _ => ""
            }
            val xrobots =
              if (id % 4 == 2) "X-Robots-Tag: noindex\r\n" else ""
            val html = s"<html><head>$meta</head><body>d$id</body></html>"
            val payload = ("HTTP/1.1 200 OK\r\n" +
              "Content-Type: text/html; charset=utf-8\r\n" + xrobots +
              "\r\n" + html).getBytes("UTF-8")
            (id, s"https://n.org/p$id", payload)
          }.toDF("doc_id", "url", "payload")
        val parsed = graft.sources.Http.responses(responses)
        val headerNoindex = exists(col("http_headers"),
          h => lower(h.getField("name")) === "x-robots-tag" &&
            lower(h.getField("value")).contains("noindex"))
        Html.withPageMeta(parsed, "text", "url")
          .filter(!col("noindex") && !coalesce(headerNoindex, lit(false)))
          .select(col("doc_id"))
      },
      // Publish-date extraction (r11): the temporal-filtering key of a
      // news/blog corpus — article:published_time meta (wins, with a
      // <time> decoy that must lose), <time datetime> fallback, and
      // dateless pages staying null; all closed-form in the id.
      "q_page_dates" -> { (s, dir) =>
        import s.implicits._
        val pages = table(s, dir, "documents")
          .select(col("doc_id")).transform(graft.Tables.spread).as[Long]
          .map { id =>
            val mm = f"${id % 12 + 1}%02d"
            val dd = f"${id % 28 + 1}%02d"
            val html = (id % 3).toInt match {
              case 0 =>
                "<html><head><meta property=\"article:published_time\" " +
                  s"""content="2024-$mm-${dd}T06:00:00Z">""" +
                  "</head><body><time datetime=\"1999-01-01\">decoy" +
                  "</time></body></html>"
              case 1 =>
                "<html><body><p>posted " +
                  s"""<time datetime="2023-$mm-$dd">then</time>""" +
                  "</p></body></html>"
              case _ => s"<html><body><p>undated $id</p></body></html>"
            }
            (id, s"https://d.org/p$id", html)
          }.toDF("doc_id", "url", "html")
        Html.withPageMeta(pages)
          .select(col("doc_id"), col("published_time"))
      },
      // JSON-LD extraction (r11): the machine-readable metadata channel
      // — a schema.org NewsArticle block located by the state machine
      // (type-attribute essence match; the plain-JS script is NOT
      // captured), then parsed by Catalyst's from_json. Everything
      // closed-form in the id.
      "q_jsonld" -> { (s, dir) =>
        import s.implicits._
        val pages = table(s, dir, "documents")
          .select(col("doc_id")).transform(graft.Tables.spread).as[Long]
          .map { id =>
            val dd = f"${id % 28 + 1}%02d"
            val ld = s"""{"@type":"NewsArticle","headline":"H $id",""" +
              s""""datePublished":"2024-02-$dd"}"""
            val html = "<html><head>" +
              "<script type=\"application/ld+json; charset=utf-8\">" +
              ld + "</script>" +
              "<script type=\"text/javascript\">var x='<p>no</p>';</script>" +
              "</head><body><p>b</p></body></html>"
            (id, html)
          }.toDF("doc_id", "html")
        val ldSchema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("@type",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("headline",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("datePublished",
            org.apache.spark.sql.types.StringType)))
        Html.extractJsonLd(pages)
          .select(col("doc_id"), col("ld_ix"),
            from_json(col("ld_json"), ldSchema).as("ld"))
          .select(col("doc_id"), col("ld_ix"),
            col("ld").getField("@type").as("ld_type"),
            col("ld").getField("headline").as("headline"),
            col("ld").getField("datePublished").as("date_published"))
      }
    )

  /** The page construction round-trips by design: extraction must yield
    * the whitespace-normalized text (the state machine collapses runs
    * and trims) and the constructed title — both re-derived in SQL with
    * no HTML anywhere. */
  override def oracles: Map[String, String] = Map(
    // trim AFTER the collapse: DuckDB trim() strips spaces only, so a
    // leading/trailing tab/newline would otherwise survive as a stray
    // edge space the state machine correctly drops (review r10 — latent
    // on the current all-space fixture, live on any realistic one).
    "q_html_extract" ->
      """SELECT doc_id, 't' || CAST(doc_id AS VARCHAR) AS title,
        |  trim(regexp_replace(text, '\s+', ' ', 'g')) AS extracted,
        |  CAST(length(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS BIGINT)
        |    AS n_chars
        |FROM documents WHERE text IS NOT NULL""".stripMargin,
    // Expected decode assembled from raw code points: — U+2014, 😀
    // U+1F600, ’ U+2019 (the cp1252 remap of 146), é U+00E9, … U+2026,
    // Ω U+03A9, ≠ U+2260, ½ U+00BD; &#10; collapses to a space, &shy;
    // vanishes, legacy '&amp ' decodes unterminated.
    "q_html_entities" ->
      """SELECT doc_id,
        |  'd' || CAST(doc_id AS VARCHAR) || ' A' || chr(8212) || 'B ' ||
        |  chr(128512) || ' it' || chr(8217) || 's caf' || chr(233) ||
        |  ' ' || chr(8230) || ' ' || chr(937) || chr(8800) || chr(189) ||
        |  ' x y hyphen & z' AS extracted
        |FROM documents""".stripMargin,
    // The chrome is dropped by construction (landmark scopes + the
    // banner's 13 anchor chars against 29 total + the sub-threshold
    // share block); what survives is the article paragraph iff it
    // clears the 25-char prose floor.
    "q_html_main" ->
      """SELECT doc_id,
        |  CASE WHEN length(trim(regexp_replace(text, '\s+', ' ', 'g'))) >= 25
        |    THEN trim(regexp_replace(text, '\s+', ' ', 'g'))
        |    ELSE '' END AS main_text
        |FROM documents WHERE text IS NOT NULL""".stripMargin,
    "q_html_links" ->
      """SELECT doc_id, CAST(j AS BIGINT) AS link_ix,
        |  CASE j
        |    WHEN 0 THEN 'https://other.org/abs'
        |    WHEN 1 THEN 'https://site' || CAST(doc_id AS VARCHAR) ||
        |      '.org/a/b/rel/p.html'
        |    WHEN 2 THEN 'https://site' || CAST(doc_id AS VARCHAR) ||
        |      '.org/root.html'
        |    WHEN 3 THEN 'https://site' || CAST(doc_id AS VARCHAR) ||
        |      '.org/a/up.html'
        |    WHEN 4 THEN 'https://site' || CAST(doc_id AS VARCHAR) ||
        |      '.org/a/b/page.html?page=2'
        |    WHEN 5 THEN 'https://site' || CAST(doc_id AS VARCHAR) ||
        |      '.org/a/b/page.html'
        |    ELSE 'https://site' || CAST(doc_id AS VARCHAR) ||
        |      '.org/a/b/x.html?a=1&b=2' END AS target_url
        |FROM documents, generate_series(0, 6) t(j)""".stripMargin,
    // Every page in a triple keys to the triple head's URL; partial
    // trailing triples fall out of the GROUP BY naturally.
    "q_canonical_dedup" ->
      """SELECT min(doc_id) AS doc_id,
        |  'https://s.org/p' || CAST(doc_id - doc_id % 3 AS VARCHAR)
        |    AS canon_key,
        |  count(*) AS n_dups
        |FROM documents GROUP BY doc_id - doc_id % 3""".stripMargin,
    "q_noindex_gate" ->
      "SELECT doc_id FROM documents WHERE doc_id % 4 IN (1, 3)",
    "q_page_dates" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 3 AS INTEGER)
        |    WHEN 0 THEN '2024-' ||
        |      lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0') || '-' ||
        |      lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') || 'T06:00:00Z'
        |    WHEN 1 THEN '2023-' ||
        |      lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0') || '-' ||
        |      lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
        |    ELSE NULL END AS published_time
        |FROM documents""".stripMargin,
    "q_jsonld" ->
      """SELECT doc_id, CAST(0 AS BIGINT) AS ld_ix,
        |  'NewsArticle' AS ld_type,
        |  'H ' || CAST(doc_id AS VARCHAR) AS headline,
        |  '2024-02-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
        |    AS date_published
        |FROM documents""".stripMargin
  )
}
