package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryPack

/** URL-operator coverage: six deliberately messy raw-URL shapes per
  * document (case soup, default ports, dot segments, percent forms,
  * tracking params, raw spaces) whose canonical forms DuckDB re-derives
  * as pure string construction; a URL-exact dedup where two different
  * raw spellings collapse onto one canonical key; and the per-domain
  * cap replicated by a window QUALIFY. */
object UrlPack extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map(
      "q_url_normalize" -> { (s, dir) =>
        import s.implicits._
        val urls = table(s, dir, "documents")
          .select(col("doc_id")).as[Long]
          .map { id =>
            val u = (id % 6).toInt match {
              case 0 => s"HTTP://WWW.Example$id.COM:80/a/b/../c/./d.html?x=1#frag"
              case 1 => s"https://Example$id.com:443/%7euser/%41bc%2fd"
              case 2 => s"http://example$id.co.uk"
              case 3 => s"http://sub.blog.example$id.org/p?utm_source=x&id=5&utm_campaign=y"
              case 4 => s"https://example$id.com/a/?gclid=123"
              case _ => s"http://example$id.com/path with space#x"
            }
            (id, u)
          }.toDF("doc_id", "url")
        Url.withUrlParts(urls)
          .select(col("doc_id"), col("url_norm"), col("url_host"),
            col("url_domain"))
      },
      // Two raw spellings per page (dot segments + case/port soup)
      // collapse onto ONE canonical key: the URL-exact dedup pass.
      "q_url_dedup" -> { (s, dir) =>
        import s.implicits._
        val urls = table(s, dir, "documents")
          .select(col("doc_id")).as[Long]
          .map { id =>
            val u =
              if (id % 2 == 0) s"http://Example${id / 2}.com/a/../b"
              else s"HTTP://example${id / 2}.COM:80/b"
            (id, u)
          }.toDF("doc_id", "url")
        Url.withUrlParts(urls)
          .groupBy(col("url_norm"))
          .agg(min(col("doc_id")).as("doc_id"),
            count(lit(1)).as("n_dups"))
          .select(col("doc_id"), col("url_norm"), col("n_dups"))
      },
      // Per-domain quota: at most 3 pages per registrable domain,
      // earliest doc_ids win — one shuffle on the domain key.
      "q_url_domain_cap" -> { (s, dir) =>
        import s.implicits._
        val urls = table(s, dir, "documents")
          .select(col("doc_id")).as[Long]
          .map(id => (id, s"https://site${id % 7}.com/page$id"))
          .toDF("doc_id", "url")
        Url.capPerDomain(Url.withUrlParts(urls), "url_domain", 3,
            col("doc_id"))
          .select(col("doc_id"), col("url_domain"))
      },
      // Redirect-chain resolution: each document contributes a chain of
      // (doc_id % 4 + 1) 301 hops with RELATIVE Locations ending at a
      // 200, every fifth also a 302 two-cycle that must hit the hop cap
      // with resolved = false. DuckDB re-derives the walk closed-form:
      // chain position k resolves to the chain end in L − k hops; a
      // cycle of period 2 is back at its start after the (even) cap.
      "q_redirect_chains" -> { (s, dir) =>
        import s.implicits._
        val fetches = table(s, dir, "documents")
          .select(col("doc_id")).as[Long]
          .flatMap { id =>
            val L = (id % 4).toInt + 1
            val chain = (0 until L).map { k =>
              (s"https://r$id.org/p$k", 301L, s"/p${k + 1}")
            } :+ ((s"https://r$id.org/p$L", 200L, null: String))
            val loop =
              if (id % 5 == 0)
                Seq((s"https://loop$id.org/a", 302L, "/b"),
                  (s"https://loop$id.org/b", 302L, "/a"))
              else Seq.empty
            chain ++ loop
          }.toDF("url", "status", "location")
        Redirects.resolveFetches(fetches)
          .select(col("start"), col("final_url"),
            col("hops").cast("long").as("hops"), col("resolved"))
      },
      // THE document-identity pipeline (r11): what a corpus actually
      // dedups on — redirect-resolved URL → page-declared canonical →
      // RFC 3986 normalization + tracking strip — composed end-to-end.
      // Quads of pages converge on one identity by four different
      // routes: the head directly, a case/port/dot-segment/utm mess
      // that only NORMALIZATION collapses, a page whose CANONICAL link
      // declares the head, and a URL whose fetch 301-REDIRECTS to the
      // head. Dropping any stage leaves its quarter of the corpus
      // duplicated; DuckDB re-derives the identity closed-form.
      "q_doc_identity" -> { (s, dir) =>
        import s.implicits._
        val docs = table(s, dir, "documents")
          .select(col("doc_id")).as[Long]
          .map { id =>
            val g = id / 4
            val (url, html) = (id % 4).toInt match {
              case 0 => (s"https://site$g.com/a",
                "<html><body>head</body></html>")
              case 1 => (s"HTTPS://SITE$g.COM:443/b/../a?utm_source=z",
                "<html><body>messy</body></html>")
              case 2 => (s"https://site$g.com/c",
                "<html><head><link rel=canonical href=\"/a\"></head>" +
                  "<body>canonical</body></html>")
              case _ => (s"https://site$g.com/d",
                "<html><body>redirected</body></html>")
            }
            (id, url, html)
          }.toDF("doc_id", "url", "html")
        val log = table(s, dir, "documents")
          .select(col("doc_id")).as[Long]
          .flatMap { id =>
            val g = id / 4
            if (id % 4 == 3)
              Seq((s"https://site$g.com/d", 301L, "/a"),
                (s"https://site$g.com/a", 200L, null: String))
            else Seq.empty
          }.toDF("url", "status", "location")
        // The r12-extracted reusable stage: canonical from the page,
        // then Url.withIdentity (redirect-follow → canonical override →
        // normalize) — the same composition the streaming identity
        // dedup keys on.
        Url.withIdentity(Html.withPageMeta(docs), log)
          .groupBy(col("identity"))
          .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_dups"))
          .select(col("doc_id"), col("identity"), col("n_dups"))
      },
      // IDENTITY-KEYED incremental dedup against a DURABLE store (r12):
      // batch 1 (the direct + messy quarters) lands each group's page
      // once; batch 2 (the canonical + redirected quarters) dedups
      // CROSS-BATCH against the stored identities — except every third
      // group, whose canonical page points at a genuinely NEW identity
      // and must land in the second generation. The store survives between the
      // two calls (the streamed-crawl steady state); replays are
      // idempotent by the same anti-join.
      "q_doc_identity_inc" -> { (s, dir) =>
        import s.implicits._
        import org.apache.spark.sql.types._
        val quot = "\""
        def pages(batch2: Boolean) = table(s, dir, "documents")
          .select(col("doc_id")).as[Long]
          .filter((id: Long) => (id % 4 >= 2) == batch2)
          .map { id =>
            val g = id / 4
            val (url, html) = (id % 4).toInt match {
              case 0 => (s"https://site$g.com/a",
                "<html><body>head</body></html>")
              case 1 => (s"HTTPS://SITE$g.COM:443/b/../a?utm_source=z",
                "<html><body>messy</body></html>")
              case 2 =>
                val target = if (g % 3 == 0) "/q" else "/a"
                (s"https://site$g.com/c",
                  s"<html><head><link rel=canonical href=$quot$target$quot>" +
                    "</head><body>canonical</body></html>")
              case _ => (s"https://site$g.com/d",
                "<html><body>redirected</body></html>")
            }
            (id, url, html)
          }.toDF("doc_id", "url", "html")
        def log(batch2: Boolean) =
          if (!batch2) Seq.empty[(String, Long, String)]
            .toDF("url", "status", "location")
          else table(s, dir, "documents")
            .select(col("doc_id")).as[Long]
            .flatMap { id =>
              val g = id / 4
              if (id % 4 == 3)
                Seq((s"https://site$g.com/d", 301L, "/a"),
                  (s"https://site$g.com/a", 200L, null: String))
              else Seq.empty
            }.toDF("url", "status", "location")
        def keyed(batch2: Boolean) =
          Url.withIdentity(Html.withPageMeta(pages(batch2)), log(batch2))
            .select(col("doc_id"), col("url"), col("identity"))
        val tmp = java.nio.file.Files.createTempDirectory("graft_ident_store")
        try {
          val store = new graft.store.ParquetStore(s,
            StructType(Seq(StructField("doc_id", LongType),
              StructField("url", StringType),
              StructField("identity", StringType))),
            tmp.toString, s"doc_identity_${System.nanoTime()}")
          graft.streaming.CrawlIngest.dedupAppendByKey(store,
            keyed(batch2 = false), "identity", col("doc_id"))
          graft.streaming.CrawlIngest.dedupAppendByKey(store,
            keyed(batch2 = true), "identity", col("doc_id"))
          store.selectAll
            .select(col("doc_id"), col("identity"),
              col("rst_id").cast("long").as("batch_gen"))
            .localCheckpoint(eager = true)
        } finally {
          graft.Fs.deleteRecursively(tmp)
        }
      }
    )

  override def oracles: Map[String, String] = Map(
    "q_url_normalize" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 6 AS INTEGER)
        |    WHEN 0 THEN 'http://www.example' || CAST(doc_id AS VARCHAR) ||
        |      '.com/a/c/d.html?x=1'
        |    WHEN 1 THEN 'https://example' || CAST(doc_id AS VARCHAR) ||
        |      '.com/~user/Abc%2Fd'
        |    WHEN 2 THEN 'http://example' || CAST(doc_id AS VARCHAR) ||
        |      '.co.uk/'
        |    WHEN 3 THEN 'http://sub.blog.example' || CAST(doc_id AS VARCHAR) ||
        |      '.org/p?id=5'
        |    WHEN 4 THEN 'https://example' || CAST(doc_id AS VARCHAR) ||
        |      '.com/a/'
        |    ELSE 'http://example' || CAST(doc_id AS VARCHAR) ||
        |      '.com/path%20with%20space' END AS url_norm,
        |  CASE CAST(doc_id % 6 AS INTEGER)
        |    WHEN 0 THEN 'www.example' || CAST(doc_id AS VARCHAR) || '.com'
        |    WHEN 2 THEN 'example' || CAST(doc_id AS VARCHAR) || '.co.uk'
        |    WHEN 3 THEN 'sub.blog.example' || CAST(doc_id AS VARCHAR) || '.org'
        |    ELSE 'example' || CAST(doc_id AS VARCHAR) || '.com' END
        |    AS url_host,
        |  CASE CAST(doc_id % 6 AS INTEGER)
        |    WHEN 2 THEN 'example' || CAST(doc_id AS VARCHAR) || '.co.uk'
        |    WHEN 3 THEN 'example' || CAST(doc_id AS VARCHAR) || '.org'
        |    ELSE 'example' || CAST(doc_id AS VARCHAR) || '.com' END
        |    AS url_domain
        |FROM documents""".stripMargin,
    "q_url_dedup" ->
      """SELECT min(doc_id) AS doc_id,
        |  'http://example' || CAST(doc_id // 2 AS VARCHAR) || '.com/b'
        |    AS url_norm,
        |  count(*) AS n_dups
        |FROM documents GROUP BY doc_id // 2""".stripMargin,
    "q_url_domain_cap" ->
      """SELECT doc_id,
        |  'site' || CAST(doc_id % 7 AS VARCHAR) || '.com' AS url_domain
        |FROM documents
        |QUALIFY row_number() OVER (PARTITION BY doc_id % 7
        |  ORDER BY doc_id) <= 3""".stripMargin,
    "q_redirect_chains" ->
      """WITH chains AS (
        |  SELECT doc_id, doc_id % 4 + 1 AS L FROM documents
        |)
        |SELECT 'https://r' || CAST(doc_id AS VARCHAR) || '.org/p' ||
        |    CAST(k AS VARCHAR) AS start,
        |  'https://r' || CAST(doc_id AS VARCHAR) || '.org/p' ||
        |    CAST(L AS VARCHAR) AS final_url,
        |  CAST(L - k AS BIGINT) AS hops, true AS resolved
        |FROM chains, generate_series(0, 3) t(k) WHERE k < L
        |UNION ALL
        |SELECT 'https://loop' || CAST(doc_id AS VARCHAR) || '.org/' || s
        |    AS start,
        |  'https://loop' || CAST(doc_id AS VARCHAR) || '.org/' || s
        |    AS final_url,
        |  CAST(10 AS BIGINT) AS hops, false AS resolved
        |FROM documents, (VALUES ('a'), ('b')) t(s)
        |WHERE doc_id % 5 = 0""".stripMargin,
    // All four members of a quad (and whatever partial tail quad
    // exists) key to the quad head's canonical URL.
    "q_doc_identity" ->
      """SELECT min(doc_id) AS doc_id,
        |  'https://site' || CAST(doc_id // 4 AS VARCHAR) || '.com/a'
        |    AS identity,
        |  count(*) AS n_dups
        |FROM documents GROUP BY doc_id // 4""".stripMargin,
    // Batch 1 lands each quad's head (min id of the two batch-1
    // members, identity /a) as the store's first generation (rst_id
    // counts from 1); batch 2's canonical and redirected members dedup
    // against the STORE — except every third quad's canonical page,
    // which points at the new /q identity and lands as generation 2.
    "q_doc_identity_inc" ->
      """SELECT min(doc_id) AS doc_id,
        |  'https://site' || CAST(doc_id // 4 AS VARCHAR) || '.com/a'
        |    AS identity,
        |  CAST(1 AS BIGINT) AS batch_gen
        |FROM documents WHERE doc_id % 4 < 2 GROUP BY doc_id // 4
        |UNION ALL
        |SELECT doc_id,
        |  'https://site' || CAST(doc_id // 4 AS VARCHAR) || '.com/q',
        |  CAST(2 AS BIGINT)
        |FROM documents WHERE doc_id % 4 = 2 AND (doc_id // 4) % 3 = 0""".stripMargin
  )
}
