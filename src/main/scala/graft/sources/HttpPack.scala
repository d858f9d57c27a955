package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryPack
import graft.operators.Html

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

/** HTTP response-layer coverage: each document becomes a genuine
  * HTTP/1.1 message — three charset variants (header-declared latin1,
  * meta-prescan windows-1252, utf-8), with gzip content-coding and
  * chunked transfer-coding layered on deterministic subsets — and
  * [[Http.responses]] must recover the status, resolved charset, and
  * exact decoded text, re-derived in DuckDB from raw code points with
  * no HTTP anywhere. `q_crawl_text` is the full crawl front door:
  * WARC file (gzipped) → [[Warc.records]] → [[Http.responses]] →
  * [[Html.extract]], one narrow pass end-to-end, landing at the same
  * whitespace-normalized text the q_html_extract oracle pins. */
object HttpPack extends QueryPack {

  /** A genuine HTTP/1.1 200 message around `body`. */
  private[graft] def httpMessage(headers: Seq[(String, String)],
                                 body: Array[Byte]): Array[Byte] =
    ("HTTP/1.1 200 OK\r\n" +
      headers.map { case (k, v) => s"$k: $v\r\n" }.mkString +
      "\r\n").getBytes(ISO_8859_1) ++ body

  /** Chunked transfer-coding with deliberately small (≤7-byte) chunks
    * so every fixture exercises multi-chunk reassembly. */
  private[graft] def chunked(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length + 64)
    b.grouped(7).foreach { c =>
      out.write((c.length.toHexString + "\r\n").getBytes(ISO_8859_1))
      out.write(c)
      out.write("\r\n".getBytes(ISO_8859_1))
    }
    out.write("0\r\n\r\n".getBytes(ISO_8859_1))
    out.toByteArray
  }

  /** The per-document HTTP message: charset by doc_id%3, gzip
    * content-coding on %7==0, chunked transfer-coding on %5==0 (wire
    * order: content-code first, then transfer-code). */
  private def httpFor(id: Long, text: String): Array[Byte] = {
    val (raw, ctype) = (id % 3).toInt match {
      case 0 => (s"café nº $id".getBytes(ISO_8859_1),
        "text/html; charset=iso-8859-1")
      case 1 => (("<meta charset=\"windows-1252\">€ — " + id)
        .getBytes("windows-1252"), "text/html")
      case _ => (text.getBytes(UTF_8), "text/html; charset=utf-8")
    }
    var body = raw
    var headers = Vector("Content-Type" -> ctype,
      "X-Folded" -> "part1\r\n part2") // folded header on every record
    if (id % 7 == 0) {
      body = WarcPack.gzipBytes(body)
      headers :+= ("Content-Encoding" -> "gzip")
    }
    if (id % 5 == 0) {
      body = chunked(body)
      headers :+= ("Transfer-Encoding" -> "chunked")
    }
    httpMessage(headers, body)
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map(
      "q_http_response" -> { (s, dir) =>
        import s.implicits._
        val wire = table(s, dir, "documents")
          .filter(col("text").isNotNull)
          .select(col("doc_id"), col("text")).as[(Long, String)]
          .map { case (id, text) => (id, httpFor(id, text)) }
          .toDF("doc_id", "payload")
        Http.responses(wire)
          .select(col("doc_id"), col("http_status"), col("http_charset"),
            col("text").as("body_text"))
      },
      // The complete crawl front door in ONE narrow pass: a real
      // .warc.gz whose response payload is an HTTP message whose body
      // is gzipped, chunked HTML — through WARC framing, gzip member
      // walk, HTTP split, charset decode, and tag stripping back to
      // the document's own text.
      "q_crawl_text" -> { (s, dir) =>
        import s.implicits._
        val files = table(s, dir, "documents")
          .filter(col("text").isNotNull)
          .select(col("doc_id"), col("text")).as[(Long, String)]
          .map { case (id, text) =>
            val esc = text.replace("&", "&amp;").replace("<", "&lt;")
              .replace(">", "&gt;")
            val page = s"<html><head><title>t$id</title></head>" +
              "<body><p>" + esc + "</p></body></html>"
            val http = httpMessage(
              Seq("Content-Type" -> "text/html; charset=utf-8",
                "Content-Encoding" -> "gzip",
                "Transfer-Encoding" -> "chunked"),
              chunked(WarcPack.gzipBytes(page.getBytes(UTF_8))))
            (id, WarcPack.gzipBytes(WarcPack.warcFile(id, http)))
          }.toDF("media_id", "bytes")
        val docs = Http.responses(
          Warc.records(files, gzipped = true)
            .filter(col("warc_type") === "response"))
          .select(col("media_id").as("doc_id"), col("text").as("html"))
        Html.extract(docs, "html")
          .select(col("doc_id"), col("title"), col("text").as("extracted"),
            length(col("text")).cast("long").as("n_chars"))
      },
      // Content sniffing (r11): eight payload shapes per documents
      // table — HTML behind leading whitespace, PNG/BMP/WAV/TIFF
      // magics, PDF, plain text, a control-byte binary, gzip — half of
      // them behind LYING Content-Type headers (the reason routing
      // sniffs at all). Sniffed and claimed-essence types are
      // closed-form in the id arithmetic.
      "q_mime_sniff" -> { (s, dir) =>
        import s.implicits._
        val payloads = table(s, dir, "documents")
          .select(col("doc_id")).as[Long]
          .map { id =>
            val (body, ct) = (id % 8).toInt match {
              case 0 => (s"\n\t <!DOCTYPE html><html><body>d$id</body></html>"
                .getBytes(UTF_8), "text/plain") // lying header
              case 1 => (Array[Byte](0x89.toByte, 'P'.toByte, 'N'.toByte,
                'G'.toByte, 0x0d, 0x0a, 0x1a, 0x0a, 0, 0, 1),
                "text/html") // lying header
              case 2 => ("BM".getBytes(UTF_8) ++ new Array[Byte](12),
                "image/bmp")
              case 3 => ("RIFF1234WAVE".getBytes(UTF_8) ++
                new Array[Byte](8), null: String) // header absent
              case 4 => (s"%PDF-1.4\n$id obj".getBytes(UTF_8),
                "Application/PDF; version=1.4") // essence normalizes
              case 5 => (s"hello world $id".getBytes(UTF_8),
                "text/plain; charset=utf-8")
              case 6 => (Array[Byte](0x01, 0x02, 'a'.toByte, 'b'.toByte,
                0x00), "text/plain") // lying header over binary bytes
              case _ => (Array[Byte](0x1f, 0x8b.toByte, 0x08) ++
                s"$id".getBytes(UTF_8), "application/octet-stream")
            }
            (id, body, ct)
          }.toDF("doc_id", "body", "ct")
        Mime.withSniffed(payloads, "body", "ct")
          .select(col("doc_id"), col("mime_sniffed"), col("mime_claimed"))
      },
      // Per-domain crawl health (r11): the rollup every crawl operation
      // watches — fetch counts, 2xx rate, redirect rate, noindex rate
      // per registrable domain — composed over the REAL parsers (HTTP
      // status from the wire bytes, noindex from the page meta walk,
      // domain from the URL ops), one groupBy shuffle. Closed-form in
      // the id arithmetic.
      "q_crawl_stats" -> { (s, dir) =>
        import s.implicits._
        val responses = table(s, dir, "documents")
          .select(col("doc_id")).as[Long]
          .map { id =>
            val g = id % 5
            val payload = (id % 4).toInt match {
              case 0 => "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
                s"<html><body><p>page $id</p></body></html>"
              case 1 => "HTTP/1.1 301 Moved Permanently\r\n" +
                "Location: /new\r\nContent-Type: text/html\r\n\r\n"
              case 2 => "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
                "<html><head><meta name=\"robots\" content=\"noindex\">" +
                s"</head><body><p>hidden $id</p></body></html>"
              case _ => "HTTP/1.1 404 Not Found\r\n" +
                "Content-Type: text/html\r\n\r\n<html><body>nope</body></html>"
            }
            (id, s"https://site$g.com/p$id", payload.getBytes(UTF_8))
          }.toDF("doc_id", "url", "payload")
        val parsed = Html.withPageMeta(Http.responses(responses),
          "text", "url")
        graft.operators.Url.withUrlParts(parsed)
          .groupBy(col("url_domain"))
          .agg(count(lit(1)).as("n_fetches"),
            sum(when(col("http_status") === 200, 1).otherwise(0))
              .as("n_ok"),
            sum(when(col("http_status").between(300, 399), 1).otherwise(0))
              .as("n_redirects"),
            sum(when(col("noindex"), 1).otherwise(0)).as("n_noindex"))
          .select(col("url_domain"), col("n_fetches"), col("n_ok"),
            col("n_redirects"), col("n_noindex"))
      }
    )

  override def oracles: Map[String, String] = Map(
    // Expected decode re-derived from raw code points: é U+00E9,
    // º U+00BA (the latin1 variant), € U+20AC, — U+2014 (the
    // meta-prescan cp1252 variant); utf-8 round-trips the document
    // text byte-exactly. The chunked/gzip wire codings are invisible
    // by construction.
    "q_http_response" ->
      """SELECT doc_id, CAST(200 AS BIGINT) AS http_status,
        |  CASE WHEN doc_id % 3 = 2 THEN 'UTF-8' ELSE 'windows-1252' END
        |    AS http_charset,
        |  CASE doc_id % 3
        |    WHEN 0 THEN 'caf' || chr(233) || ' n' || chr(186) || ' ' ||
        |      CAST(doc_id AS VARCHAR)
        |    WHEN 1 THEN '<meta charset="windows-1252">' || chr(8364) ||
        |      ' ' || chr(8212) || ' ' || CAST(doc_id AS VARCHAR)
        |    ELSE text END AS body_text
        |FROM documents WHERE text IS NOT NULL""".stripMargin,
    // Same contract as q_html_extract: the chain must land at the
    // whitespace-normalized document text plus the constructed title,
    // with every wire layer (WARC gzip, HTTP chunking, body gzip,
    // charset) stripped away.
    "q_crawl_text" ->
      """SELECT doc_id, 't' || CAST(doc_id AS VARCHAR) AS title,
        |  trim(regexp_replace(text, '\s+', ' ', 'g')) AS extracted,
        |  CAST(length(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS BIGINT)
        |    AS n_chars
        |FROM documents WHERE text IS NOT NULL""".stripMargin,
    "q_mime_sniff" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 8 AS INTEGER)
        |    WHEN 0 THEN 'text/html'
        |    WHEN 1 THEN 'image/png'
        |    WHEN 2 THEN 'image/bmp'
        |    WHEN 3 THEN 'audio/wav'
        |    WHEN 4 THEN 'application/pdf'
        |    WHEN 5 THEN 'text/plain'
        |    WHEN 6 THEN 'application/octet-stream'
        |    ELSE 'application/gzip' END AS mime_sniffed,
        |  CASE CAST(doc_id % 8 AS INTEGER)
        |    WHEN 0 THEN 'text/plain'
        |    WHEN 1 THEN 'text/html'
        |    WHEN 2 THEN 'image/bmp'
        |    WHEN 3 THEN NULL
        |    WHEN 4 THEN 'application/pdf'
        |    WHEN 5 THEN 'text/plain'
        |    WHEN 6 THEN 'text/plain'
        |    ELSE 'application/octet-stream' END AS mime_claimed
        |FROM documents""".stripMargin,
    "q_crawl_stats" ->
      """SELECT 'site' || CAST(doc_id % 5 AS VARCHAR) || '.com'
        |    AS url_domain,
        |  count(*) AS n_fetches,
        |  CAST(sum(CASE WHEN doc_id % 4 IN (0, 2) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_ok,
        |  CAST(sum(CASE WHEN doc_id % 4 = 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_redirects,
        |  CAST(sum(CASE WHEN doc_id % 4 = 2 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_noindex
        |FROM documents GROUP BY doc_id % 5""".stripMargin
  )
}
