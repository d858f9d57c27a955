package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Content sniffing for crawl payloads — the router between the byte
  * layer and the typed pipelines. A real crawl's `Content-Type` headers
  * LIE constantly (images served as `text/html`, HTML as
  * `application/octet-stream`, everything as `text/plain`), so every
  * corpus pipeline routes on SNIFFED type: magic bytes first, then the
  * tag-shaped-text check, then the binary-byte scan. This is the core
  * of the WHATWG MIME-sniffing algorithm (the published standard
  * browsers implement) reduced to its deterministic byte rules — no
  * `supplied-type` special cases, because the router's whole point is
  * to not trust the header.
  *
  * Reference analog: the value-decode dispatch seam
  * (spark-streaming-kafka-bucket-counter.py:104-116) — the reference
  * decides how to parse each record before counting; sniffing is that
  * decision for crawl bytes.
  *
  * Scale: a prefix check over ≤1445 bytes per record in the same
  * narrow per-partition pass as the other byte decoders — no shuffle,
  * no full-payload scan. */
object Mime {

  /** The type/subtype essence of a Content-Type header value: params
    * stripped, trimmed, lowercased; null stays null. */
  def essence(contentType: String): String = {
    if (contentType == null) return null
    val semi = contentType.indexOf(';')
    val t = (if (semi < 0) contentType else contentType.substring(0, semi))
      .trim.toLowerCase(java.util.Locale.ROOT)
    if (t.isEmpty) null else t
  }

  private def startsWith(b: Array[Byte], at: Int, magic: Array[Int]): Boolean = {
    if (at + magic.length > b.length) return false
    var i = 0
    while (i < magic.length) {
      if (magic(i) >= 0 && (b(at + i) & 0xff) != magic(i)) return false
      i += 1
    }
    true
  }

  private def m(s: String): Array[Int] = s.map(_.toInt).toArray

  /** (offset, pattern with −1 wildcards, sniffed type) in match order —
    * longer/stricter patterns before their prefixes. */
  private val Magic: Seq[(Int, Array[Int], String)] = Seq(
    (0, Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a), "image/png"),
    (0, Array(0xff, 0xd8, 0xff), "image/jpeg"),
    (0, m("GIF87a"), "image/gif"),
    (0, m("GIF89a"), "image/gif"),
    (0, m("RIFF") ++ Array(-1, -1, -1, -1) ++ m("WEBP"), "image/webp"),
    (0, m("RIFF") ++ Array(-1, -1, -1, -1) ++ m("WAVE"), "audio/wav"),
    (0, m("RIFF") ++ Array(-1, -1, -1, -1) ++ m("AVI "), "video/avi"),
    (0, m("BM"), "image/bmp"),
    (0, m("OggS"), "application/ogg"),
    (0, m("fLaC"), "audio/flac"),
    (0, m("ID3"), "audio/mpeg"),
    (4, m("ftyp"), "video/mp4"),
    (0, Array(0x1f, 0x8b), "application/gzip"),
    (0, Array('P', 'K', 0x03, 0x04), "application/zip"),
    (0, m("%PDF-"), "application/pdf"),
    (0, m("%!PS-Adobe-"), "application/postscript"),
    (0, m("wOFF"), "font/woff"),
    (0, m("wOF2"), "font/woff2"),
    (0, m("II") ++ Array(0x2a, 0x00), "image/tiff"),
    (0, m("MM") ++ Array(0x00, 0x2a), "image/tiff"),
    (0, Array(0xef, 0xbb, 0xbf), "text/plain"), // UTF-8 BOM
    (0, Array(0xfe, 0xff), "text/plain"), // UTF-16BE BOM
    (0, Array(0xff, 0xfe), "text/plain")) // UTF-16LE BOM

  /** The WHATWG tag set whose case-insensitive appearance (after
    * leading whitespace, followed by space or `>`) marks HTML. */
  private val HtmlTags = Seq("!DOCTYPE HTML", "HTML", "HEAD", "SCRIPT",
    "IFRAME", "H1", "DIV", "FONT", "TABLE", "A", "STYLE", "TITLE", "B",
    "BODY", "BR", "P", "!--")

  /** Bytes whose presence marks a payload as binary per the WHATWG
    * binary-data-byte table. */
  @inline private def binaryByte(b: Int): Boolean =
    b <= 0x08 || b == 0x0b || (b >= 0x0e && b <= 0x1a) ||
      (b >= 0x1c && b <= 0x1f)

  /** Sniff a payload's MIME type from its bytes alone. Deterministic:
    * magic table → HTML tag shape → `<?xml` → binary-byte scan of the
    * first 1445 bytes (the standard's resource-header length) deciding
    * text/plain vs application/octet-stream. Null input → null; empty
    * → application/octet-stream (nothing to identify). */
  def sniff(bytes: Array[Byte]): String = {
    if (bytes == null) return null
    if (bytes.isEmpty) return "application/octet-stream"
    val it = Magic.iterator
    while (it.hasNext) {
      val (off, pat, t) = it.next()
      if (startsWith(bytes, off, pat)) return t
    }
    val n = math.min(bytes.length, 1445)
    // Tag-shaped text: skip leading HTML whitespace, then match a tag.
    var i = 0
    while (i < n && (bytes(i) == ' ' || bytes(i) == '\t' ||
      bytes(i) == '\n' || bytes(i) == '\r' || bytes(i) == 0x0c)) i += 1
    if (i < n && bytes(i) == '<') {
      val ht = HtmlTags.iterator
      while (ht.hasNext) {
        val tag = ht.next()
        val end = i + 1 + tag.length
        if (end <= bytes.length) {
          var k = 0
          var ok = true
          while (ok && k < tag.length) {
            val c = (bytes(i + 1 + k) & 0xff).toChar
            if (Character.toUpperCase(c) != tag.charAt(k)) ok = false
            k += 1
          }
          // A terminator is required: '<b>'/'<b ' is HTML, '<binary'
          // is not (WHATWG: space or '>').
          if (ok && end < bytes.length &&
            (bytes(end) == ' ' || bytes(end) == '>')) return "text/html"
          if (ok && tag == "!--") return "text/html" // comment needs no terminator
        }
      }
      if (startsWith(bytes, i, m("<?xml"))) return "text/xml"
    }
    var j = 0
    while (j < n) {
      if (binaryByte(bytes(j) & 0xff)) return "application/octet-stream"
      j += 1
    }
    "text/plain"
  }

  /** DataFrame form: appends `mime_sniffed` ([[sniff]] of the body
    * bytes) and `mime_claimed` (the [[essence]] of the Content-Type
    * column) — the routing pair. One narrow per-partition pass. */
  def withSniffed(df: DataFrame, bodyCol: String = "body",
                  ctCol: String = "http_content_type"): DataFrame = {
    val bi = df.schema.fieldIndex(bodyCol)
    val ci = df.schema.fieldIndex(ctCol)
    val schema = df.schema
      .add("mime_sniffed", StringType).add("mime_claimed", StringType)
    df.mapPartitions { it =>
      it.map { row =>
        Row.fromSeq(row.toSeq :+ sniff(row.getAs[Array[Byte]](bi)) :+
          essence(row.getAs[String](ci)))
      }
    }(Encoders.row(schema))
  }
}
