package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryPack

/** WARC ingestion coverage: each document becomes a genuine two-record
  * WARC file (warcinfo + response, deterministic ids — the byte layout
  * ISO 28500 prescribes and Common Crawl ships), exploded back by
  * [[Warc.records]]; the recovered framing fields and payload hashes
  * must reproduce DuckDB's independent derivation from the construction.
  * `q_warc_gzip` routes the same file through a real gzip member first —
  * the `.warc.gz` path ([[Warc.gunzip]]). */
object WarcPack extends QueryPack {

  /** The warcinfo record's fixed payload (length 17 incl. CRLF). */
  private val InfoPayload = "software: graft\r\n"

  /** Genuine two-record WARC file around `data`. */
  private[graft] def warcFile(id: Long, data: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
      .append("WARC-Type: warcinfo\r\n")
      .append(f"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-$id%012d>\r\n")
      .append("WARC-Date: 2024-01-01T00:00:00Z\r\n")
      .append(s"Content-Length: ${InfoPayload.length}\r\n\r\n")
      .append(InfoPayload).append("\r\n\r\n")
      .append("WARC/1.0\r\n")
      .append("WARC-Type: response\r\n")
      .append(s"WARC-Target-URI: https://example.org/doc/$id\r\n")
      .append(f"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0001-$id%012d>\r\n")
      .append("WARC-Date: 2024-01-01T00:00:00Z\r\n")
      .append(s"Content-Length: ${data.length}\r\n\r\n")
    sb.toString.getBytes("ISO-8859-1") ++ data ++
      "\r\n\r\n".getBytes("ISO-8859-1")
  }

  private[graft] def gzipBytes(data: Array[Byte]): Array[Byte] =
    Warc.gzipMember(data) // one member-encoder: the fixtures exercise
                          // the WRITER's real gzip shape (review r13)

  private def warcQuery(gzipped: Boolean)
      : (SparkSession, String) => DataFrame = { (s, dir) =>
    import s.implicits._
    val media = table(s, dir, "documents")
      .filter(octet_length(col("text")) > 0)
      .select(col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("bytes"))
      .as[(Long, Array[Byte])]
      .map { case (id, data) =>
        val w = warcFile(id, data)
        (id, if (gzipped) gzipBytes(w) else w)
      }
      .toDF("media_id", "bytes")
    Warc.records(media, gzipped = gzipped)
      .select(col("media_id"), col("record_ix"), col("warc_type"),
        col("target_uri"), col("content_length"),
        md5(col("payload")).as("payload_hash"))
  }

  /** A WARC file holding one `response` (payload = `data`, with its
    * REAL spec-form payload digest — corrupted when `corrupt`) and one
    * payload-free `revisit` of it (identical-payload-digest profile,
    * same digest + a Refers-To-Target-URI) — the URL-level crawl-time
    * dedup shape Common Crawl archives actually contain. */
  private def warcRevisitFile(id: Long, data: Array[Byte],
                              corrupt: Boolean): Array[Byte] = {
    val digest0 = Warc.sha1Digest(data)
    val digest =
      if (!corrupt) digest0
      else digest0.substring(0, digest0.length - 1) +
        (if (digest0.last == 'A') 'B' else 'A')
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
      .append("WARC-Type: response\r\n")
      .append(s"WARC-Target-URI: https://example.org/orig/$id\r\n")
      .append(f"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0002-$id%012d>\r\n")
      .append("WARC-Date: 2024-01-01T00:00:00Z\r\n")
      .append(s"WARC-Payload-Digest: $digest\r\n")
      .append(s"Content-Length: ${data.length}\r\n\r\n")
    val head = sb.toString.getBytes("ISO-8859-1") ++ data ++
      "\r\n\r\n".getBytes("ISO-8859-1")
    val revisit = new StringBuilder
    revisit.append("WARC/1.0\r\n")
      .append("WARC-Type: revisit\r\n")
      .append(s"WARC-Target-URI: https://example.org/re/$id\r\n")
      .append(f"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0003-$id%012d>\r\n")
      .append("WARC-Date: 2024-02-01T00:00:00Z\r\n")
      .append("WARC-Profile: http://netpreserve.org/warc/1.0/revisit/identical-payload-digest\r\n")
      .append(s"WARC-Refers-To-Target-URI: https://example.org/orig/$id\r\n")
      .append(s"WARC-Payload-Digest: $digest\r\n")
      .append("Content-Length: 0\r\n\r\n")
      .append("\r\n\r\n")
    head ++ revisit.toString.getBytes("ISO-8859-1")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map(
      "q_warc_records" -> warcQuery(gzipped = false),
      "q_warc_gzip" -> warcQuery(gzipped = true),
      // WARC EXPORT round trip (r13): documents rendered as HTML pages,
      // exported via Warc.encodeResponses (grouped .warc.gz files, one
      // gzip member per response record, deterministic record ids),
      // then read BACK through the repo's own full ingest chain
      // (records → HTTP → sniff → extract). The oracle re-derives
      // every field from the source table — the writer and the whole
      // reader stack must be mutual inverses.
      "q_warc_export" -> { (s, dir) =>
        import s.implicits._
        val rows = table(s, dir, "documents")
          .filter(col("text").isNotNull)
          .select(col("doc_id"), col("text")).as[(Long, String)]
          .map { case (id, text) =>
            val esc = text.replace("&", "&amp;").replace("<", "&lt;")
              .replace(">", "&gt;")
            val page = s"<html><head><title>t$id</title></head>" +
              "<body><p>" + esc + "</p></body></html>"
            (s"exp${id % 7}", s"https://export.org/doc/$id",
              "2024-01-01T00:00:00Z", "text/html; charset=utf-8",
              page.getBytes("UTF-8"))
          }.toDF("file_group", "url", "warc_date", "content_type", "body")
        // No checkpoint: single downstream consumer — lineage streams
        // the archives once instead of pinning every blob in executor
        // storage (review r13).
        val files = Warc.encodeResponses(rows)
        graft.streaming.CrawlIngest.documentsFrom(files)
          .select(col("url"), col("http_status"), col("title"),
            col("text"))
      },
      // Revisit resolution + digest verification (r11): each file holds
      // a response and its payload-free revisit twin; the revisit must
      // join back to the original by digest, and the response's
      // DECLARED digest must verify against the payload bytes — except
      // every seventh file, whose digest is corrupted one character and
      // must flag false (sha1/base32 themselves are pinned to external
      // test vectors in WarcSpec; the corruption keeps this check
      // non-tautological).
      "q_warc_revisit" -> { (s, dir) =>
        import s.implicits._
        val media = table(s, dir, "documents")
          .filter(octet_length(col("text")) > 0)
          .select(col("doc_id").as("media_id"),
            encode(col("text"), "UTF-8").as("bytes"))
          .as[(Long, Array[Byte])]
          .map { case (id, data) =>
            (id, warcRevisitFile(id, data, corrupt = id % 7 == 0))
          }
          .toDF("media_id", "bytes")
        val recs = Warc.records(media)
        val checked = Warc.withDigestCheck(recs)
          .filter(col("warc_type") === "response")
          .select(col("media_id").as("m2"), col("digest_ok"))
        Warc.resolveRevisits(recs)
          .join(checked, col("media_id") === col("m2"))
          .select(col("media_id"), col("target_uri").as("revisit_uri"),
            col("original_uri"), col("original_ix"),
            (col("refers_to_uri") === col("original_uri"))
              .as("refers_match"),
            col("digest_ok").as("orig_digest_ok"))
      }
    )

  /** Both records re-derived from the construction: the warcinfo row's
    * hash is md5 of the fixed payload, the response row's is md5(text) —
    * DuckDB's md5 over UTF-8 bytes, independent of the framing walk (and
    * of the DEFLATE round-trip in the gzip variant) by construction. */
  private val OracleSql =
    """SELECT doc_id AS media_id, CAST(0 AS BIGINT) AS record_ix,
      |  'warcinfo' AS warc_type, NULL AS target_uri,
      |  CAST(17 AS BIGINT) AS content_length,
      |  md5('software: graft' || chr(13) || chr(10)) AS payload_hash
      |FROM documents WHERE octet_length(encode(text)) > 0
      |UNION ALL
      |SELECT doc_id, 1, 'response',
      |  'https://example.org/doc/' || CAST(doc_id AS VARCHAR),
      |  CAST(octet_length(encode(text)) AS BIGINT), md5(text)
      |FROM documents WHERE octet_length(encode(text)) > 0""".stripMargin

  override def oracles: Map[String, String] = Map(
    // Write→read inverse: the exported archive must land back at the
    // whitespace-normalized document text with the constructed title
    // and the synthetic URL/status — same contract as q_crawl_text,
    // but through OUR OWN writer's bytes.
    "q_warc_export" ->
      """SELECT 'https://export.org/doc/' || CAST(doc_id AS VARCHAR)
        |    AS url,
        |  CAST(200 AS BIGINT) AS http_status,
        |  't' || CAST(doc_id AS VARCHAR) AS title,
        |  trim(regexp_replace(text, '\s+', ' ', 'g')) AS text
        |FROM documents WHERE text IS NOT NULL""".stripMargin,
    "q_warc_records" -> OracleSql,
    "q_warc_gzip" -> OracleSql,
    "q_warc_revisit" ->
      """SELECT doc_id AS media_id,
        |  'https://example.org/re/' || CAST(doc_id AS VARCHAR)
        |    AS revisit_uri,
        |  'https://example.org/orig/' || CAST(doc_id AS VARCHAR)
        |    AS original_uri,
        |  CAST(0 AS BIGINT) AS original_ix,
        |  true AS refers_match,
        |  doc_id % 7 <> 0 AS orig_digest_ok
        |FROM documents WHERE octet_length(encode(text)) > 0""".stripMargin
  )
}
