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

  private[graft] def gzipBytes(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(data); gz.close()
    bos.toByteArray
  }

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

  override def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map(
      "q_warc_records" -> warcQuery(gzipped = false),
      "q_warc_gzip" -> warcQuery(gzipped = true)
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
    "q_warc_records" -> OracleSql,
    "q_warc_gzip" -> OracleSql
  )
}
