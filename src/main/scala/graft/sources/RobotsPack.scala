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
        |FROM documents, generate_series(0, 2) t(j)""".stripMargin
  )
}
