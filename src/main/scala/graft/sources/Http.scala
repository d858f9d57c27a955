package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

import java.nio.ByteBuffer
import java.nio.charset.{Charset, CodingErrorAction}

/** The HTTP response layer between WARC framing and HTML extraction —
  * the missing middle of a real crawl pipeline: a Common Crawl
  * `response` record's payload is not HTML, it is an HTTP/1.1 MESSAGE
  * (status line, headers, then a body that is frequently chunked,
  * gzipped, and in a non-UTF-8 charset). Feeding that payload straight
  * into a tag stripper ingests header lines as corpus text and
  * mojibakes every ISO-8859-1/GBK page. (Reference analog: the
  * ingest-decode seam, S3's `valueDecoder` at
  * `spark-streaming-kafka-bucket-counter.py:104,116` — the layer
  * between wire bytes and parsed record.)
  *
  * [[Http.parseResponse]] splits the message on the first blank line
  * (CRLF canonical, bare LF tolerated — real servers emit it), parses
  * the status line and `Name: value` headers (RFC 9112: latin1 on the
  * wire, folded continuations unfolded, repeated names preserved,
  * junk header lines skipped rather than failing the record — crawl
  * captures are routinely damaged). The advertised `Content-Length`
  * is deliberately IGNORED for framing: the body is whatever the
  * capture holds (WARC truncation is normal), and trusting the header
  * would silently drop or invent bytes.
  *
  * [[Http.decodedBody]] then unwraps the two wire encodings in wire
  * order — `Transfer-Encoding: chunked` (hex-size chunk walk; malformed
  * chunking degrades to the raw bytes, never to a throw) and
  * `Content-Encoding: gzip|deflate` (via [[Warc.gunzip]]'s validated
  * member walk / a zlib-or-raw `Inflater` with the same bomb cap) —
  * and [[Http.bodyText]] decodes bytes→text by the browser precedence:
  * BOM, then the `Content-Type` charset parameter, then a bounded
  * `<meta charset>` prescan of the body, then UTF-8; every path decodes
  * with REPLACE (a lying charset yields U+FFFD, never an exception),
  * and the WHATWG supersets apply (iso-8859-1/ascii label →
  * windows-1252, the encoding those pages actually use).
  *
  * [[Http.responses]] is the DataFrame form: one narrow per-partition
  * pass over the payload column — no shuffle, no UDF registry — with
  * parse failures KEPT as `http_status = -1` rows (the audit must see
  * them). Text is only materialized for textual media types; a JPEG
  * body stays binary. */
object Http {

  /** One parsed HTTP response: status line fields, headers in file
    * order with repeated names preserved, and the raw (still
    * transfer/content-encoded) body bytes. */
  final case class HttpResponse(version: String, status: Int,
                                reason: String,
                                headers: Seq[(String, String)],
                                body: Array[Byte]) {
    /** First header with the given name, case-insensitively. */
    def header(name: String): Option[String] =
      headers.collectFirst {
        case (k, v) if k.equalsIgnoreCase(name) => v
      }
  }

  /** Parse an HTTP/1.x response message. None only when the payload is
    * not an HTTP response at all (no `HTTP/` status line with a numeric
    * status); damaged headers are skipped and a capture truncated
    * before the blank line yields an empty body — crawl data is never
    * all-or-nothing at this layer, one broken page must not fail the
    * record the way broken WARC FRAMING fails the file. */
  def parseResponse(bytes: Array[Byte]): Option[HttpResponse] = {
    if (bytes == null || bytes.length < 12) return None
    val n = bytes.length
    // Line reader: CRLF canonical, bare LF tolerated.
    var pos = 0
    def readLine(): String = {
      var i = pos
      while (i < n && bytes(i) != '\n') i += 1
      val end = if (i > pos && bytes(i - 1) == '\r') i - 1 else i
      val s = new String(bytes, pos, end - pos,
        java.nio.charset.StandardCharsets.ISO_8859_1)
      pos = if (i < n) i + 1 else n
      s
    }
    val statusLine = readLine()
    if (!statusLine.startsWith("HTTP/")) return None
    val sp1 = statusLine.indexOf(' ')
    if (sp1 < 0) return None
    val version = statusLine.substring(0, sp1)
    val rest = statusLine.substring(sp1 + 1).trim
    val sp2 = rest.indexOf(' ')
    val codeStr = if (sp2 < 0) rest else rest.substring(0, sp2)
    if (codeStr.length != 3 || !codeStr.forall(_.isDigit)) return None
    val status = codeStr.toInt
    val reason = if (sp2 < 0) "" else rest.substring(sp2 + 1).trim
    val headers = Vector.newBuilder[(String, String)]
    var lastKey: String = null
    var lastVal: String = null
    var blank = false
    while (!blank && pos < n) {
      val line = readLine()
      if (line.isEmpty) blank = true
      else if ((line.head == ' ' || line.head == '\t') && lastKey != null)
        lastVal = lastVal + " " + line.trim // folded continuation
      else {
        val colon = line.indexOf(':')
        if (colon > 0) {
          if (lastKey != null) headers += (lastKey -> lastVal)
          lastKey = line.substring(0, colon).trim
          lastVal = line.substring(colon + 1).trim
        } // else: junk line in a damaged capture — skip, keep the record
      }
    }
    if (lastKey != null) headers += (lastKey -> lastVal)
    val body =
      if (pos >= n) Array.emptyByteArray
      else java.util.Arrays.copyOfRange(bytes, pos, n)
    Some(HttpResponse(version, status, reason, headers.result(), body))
  }

  /** De-chunk a `Transfer-Encoding: chunked` body: hex-size lines
    * (chunk extensions after `;` ignored), chunks, the `0` terminator,
    * trailers dropped. Malformed chunking returns the input unchanged —
    * on crawl captures a half-chunked body is still mostly text, and
    * "best bytes available" beats an empty record. */
  private[sources] def dechunk(body: Array[Byte]): Array[Byte] = {
    val n = body.length
    val out = new java.io.ByteArrayOutputStream(math.min(n, 1 << 16))
    var pos = 0
    @inline def hexVal(c: Byte): Int =
      if (c >= '0' && c <= '9') c - '0'
      else if (c >= 'a' && c <= 'f') c - 'a' + 10
      else if (c >= 'A' && c <= 'F') c - 'A' + 10
      else -1
    while (true) {
      // chunk-size line
      var i = pos
      var size = 0L
      var digits = 0
      var v = if (i < n) hexVal(body(i)) else -1
      while (v >= 0 && digits <= 8) {
        size = size * 16 + v; digits += 1; i += 1
        v = if (i < n) hexVal(body(i)) else -1
      }
      if (digits == 0 || digits > 8) return body
      // optional extension to end of line
      while (i < n && body(i) != '\n') i += 1
      if (i >= n) return body
      i += 1
      if (size == 0) return out.toByteArray // trailers dropped
      if (i + size > n) return body // truncated chunk → raw bytes
      out.write(body, i, size.toInt)
      i += size.toInt
      // chunk data is followed by CRLF (tolerate LF / missing at EOF)
      if (i < n && body(i) == '\r') i += 1
      if (i < n && body(i) == '\n') i += 1
      else if (i < n) return body // garbage between chunks
      if (i >= n) return out.toByteArray // capture ended at a boundary
      pos = i
    }
    body // unreachable
  }

  /** Inflate a `Content-Encoding: deflate` body. Servers ship BOTH
    * zlib-wrapped and raw-DEFLATE under this label (the RFC says zlib;
    * IIS historically sent raw) — try zlib, fall back to raw. Same
    * bomb cap discipline as [[Warc.gunzip]]. */
  private[sources] def inflate(body: Array[Byte],
                               maxOut: Int): Option[Array[Byte]] = {
    def run(raw: Boolean): Option[Array[Byte]] = {
      val inf = new java.util.zip.Inflater(raw)
      try {
        inf.setInput(body)
        val out = new java.io.ByteArrayOutputStream(
          math.min(math.max(body.length * 2, 1024), maxOut))
        val buf = new Array[Byte](8192)
        var total = 0L
        while (!inf.finished()) {
          val got = inf.inflate(buf)
          if (got == 0) {
            if (!inf.finished()) return None
          } else {
            total += got
            if (total > maxOut) return None
            out.write(buf, 0, got)
          }
        }
        Some(out.toByteArray)
      } catch {
        case _: java.util.zip.DataFormatException => None
      } finally inf.end()
    }
    if (body.isEmpty) Some(Array.emptyByteArray)
    else run(raw = false).orElse(run(raw = true))
  }

  /** The body with its wire encodings unwrapped, in wire order:
    * transfer coding first (chunked), then content coding (gzip /
    * x-gzip / deflate; unknown codings and decode failures keep the
    * raw bytes — visible-but-garbled beats silently-empty, and the
    * charset REPLACE decode marks it). */
  def decodedBody(r: HttpResponse,
                  maxInflate: Int = 64 * 1024 * 1024): Array[Byte] = {
    val afterTransfer = r.header("Transfer-Encoding") match {
      case Some(te) if te.toLowerCase.contains("chunked") => dechunk(r.body)
      case _ => r.body
    }
    r.header("Content-Encoding").map(_.trim.toLowerCase) match {
      case Some("gzip") | Some("x-gzip") =>
        Warc.gunzip(afterTransfer, maxInflate).getOrElse(afterTransfer)
      case Some("deflate") =>
        inflate(afterTransfer, maxInflate).getOrElse(afterTransfer)
      case _ => afterTransfer
    }
  }

  /** The charset label from a `Content-Type` value's `charset=`
    * parameter (quoted or bare), or None. */
  private[sources] def charsetParam(contentType: String): Option[String] = {
    if (contentType == null) return None
    val lower = contentType.toLowerCase
    // The match must start at a parameter boundary (start of string,
    // ';', whitespace, or a quote) — a longer name containing the
    // token (data-charset=…, x-charset=…) is a different attribute and
    // must not supply the body-decode label.
    var at = lower.indexOf("charset")
    while (at > 0 && {
      val p = lower.charAt(at - 1)
      !(p == ';' || p == ' ' || p == '\t' || p == '"' || p == '\'')
    }) at = lower.indexOf("charset", at + 1)
    if (at < 0) return None
    var i = at + 7
    while (i < contentType.length && contentType.charAt(i) == ' ') i += 1
    if (i >= contentType.length || contentType.charAt(i) != '=') return None
    i += 1
    while (i < contentType.length && contentType.charAt(i) == ' ') i += 1
    val quote = if (i < contentType.length &&
      (contentType.charAt(i) == '"' || contentType.charAt(i) == '\''))
      contentType.charAt(i) else 0
    if (quote != 0) i += 1
    val start = i
    while (i < contentType.length && {
      val c = contentType.charAt(i)
      if (quote != 0) c != quote
      // Bare tokens also stop at quotes, '>' and '/': inside a meta
      // prescan span the label is often followed by the CLOSING quote
      // of a content="..." attribute or the tag's own '>'.
      else c != ';' && c != ' ' && c != '\t' && c != '"' && c != '\'' &&
        c != '>' && c != '/'
    }) i += 1
    val label = contentType.substring(start, i).trim
    if (label.isEmpty) None else Some(label)
  }

  /** Bounded `<meta charset>` prescan of an HTML body's head (the
    * WHATWG fallback when the header declares no charset): scan the
    * first `limit` bytes for `<meta ...>` tags and take the first
    * `charset=` inside one — this also catches the
    * `http-equiv="Content-Type" content="...; charset=..."` form, since
    * the parameter text sits inside the same tag span. */
  private[sources] def sniffMetaCharset(body: Array[Byte],
                                        limit: Int = 1024): Option[String] = {
    if (body == null || body.isEmpty) return None
    val n = math.min(body.length, limit)
    val head = new String(body, 0, n,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val lower = head.toLowerCase
    var from = 0
    while (from < lower.length) {
      val open = lower.indexOf("<meta", from)
      if (open < 0) return None
      val close = lower.indexOf('>', open)
      val span = if (close < 0) lower.length else close
      val cs = lower.indexOf("charset", open)
      if (cs >= 0 && cs < span) {
        charsetParam(head.substring(cs, span)) match {
          case some @ Some(_) => return some
          case None => // charset word without '=': keep scanning
        }
      }
      from = span + 1
    }
    None
  }

  /** A charset label → JVM [[Charset]], with the WHATWG superset
    * mappings browsers apply (pages labeled iso-8859-1 / latin1 /
    * ascii are windows-1252 in practice — cp1252 is a strict superset
    * that turns the 0x80–0x9F range into the punctuation those pages
    * actually contain). Unknown labels → None. */
  def resolveCharset(label: String): Option[Charset] = {
    if (label == null || label.isEmpty) return None
    val l = label.trim.toLowerCase
    val mapped = l match {
      case "iso-8859-1" | "iso8859-1" | "latin1" | "latin-1" | "l1" |
           "ascii" | "us-ascii" | "windows-1252" | "cp1252" |
           "x-cp1252" => "windows-1252"
      case "utf8" => "UTF-8"
      case "shift-jis" | "x-sjis" | "sjis" => "Shift_JIS"
      case other => other
    }
    try Some(Charset.forName(mapped))
    catch { case _: Exception => None }
  }

  /** Structural UTF-8 validation (lead-byte classes, continuation
    * count, overlong/surrogate/range rejection) — the cheap one-pass
    * test behind the unlabeled-page fallback below. */
  private[sources] def isValidUtf8(b: Array[Byte], from: Int): Boolean = {
    var i = from
    val n = b.length
    while (i < n) {
      val c = b(i) & 0xff
      if (c < 0x80) i += 1
      else {
        val (len, min) =
          if (c >= 0xc2 && c <= 0xdf) (2, 0x80)
          else if (c >= 0xe0 && c <= 0xef) (3, 0x800)
          else if (c >= 0xf0 && c <= 0xf4) (4, 0x10000)
          else return false // 0x80–0xC1 lead, 0xF5+: never valid
        if (i + len > n) return false
        var cp = c & (0x3f >> (len - 1))
        var k = 1
        while (k < len) {
          val cont = b(i + k) & 0xff
          if ((cont & 0xc0) != 0x80) return false
          cp = (cp << 6) | (cont & 0x3f)
          k += 1
        }
        if (cp < min || cp > 0x10ffff ||
          (cp >= 0xd800 && cp <= 0xdfff)) return false
        i += len
      }
    }
    true
  }

  /** Decode body bytes → text by the browser precedence: BOM beats the
    * header charset beats the meta prescan; a page with NO label
    * anywhere decodes UTF-8 when it validates as UTF-8 and
    * windows-1252 otherwise (unlabeled legacy pages are cp1252 in
    * practice — defaulting them to UTF-8-with-replacement would turn
    * every accented character into U+FFFD); ALWAYS with
    * malformed/unmappable → U+FFFD (a lying charset garbles, it never
    * throws and never drops the record). Returns (text, resolved
    * charset name). */
  def bodyText(body: Array[Byte],
               contentType: Option[String]): (String, String) = {
    if (body == null || body.isEmpty) return ("", "UTF-8")
    val (bomCharset, bomLen) =
      if (body.length >= 3 && (body(0) & 0xff) == 0xef &&
        (body(1) & 0xff) == 0xbb && (body(2) & 0xff) == 0xbf)
        (Some(java.nio.charset.StandardCharsets.UTF_8), 3)
      else if (body.length >= 2 && (body(0) & 0xff) == 0xff &&
        (body(1) & 0xff) == 0xfe)
        (Some(java.nio.charset.StandardCharsets.UTF_16LE), 2)
      else if (body.length >= 2 && (body(0) & 0xff) == 0xfe &&
        (body(1) & 0xff) == 0xff)
        (Some(java.nio.charset.StandardCharsets.UTF_16BE), 2)
      else (None, 0)
    val cs = bomCharset
      .orElse(contentType.flatMap(charsetParam).flatMap(resolveCharset))
      .orElse(sniffMetaCharset(body).flatMap(resolveCharset))
      .getOrElse(
        if (isValidUtf8(body, bomLen)) java.nio.charset.StandardCharsets.UTF_8
        else Charset.forName("windows-1252"))
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    val text =
      try dec.decode(ByteBuffer.wrap(body, bomLen, body.length - bomLen))
        .toString
      catch { case scala.util.control.NonFatal(_) =>
        new String(body, bomLen, body.length - bomLen,
          java.nio.charset.StandardCharsets.UTF_8)
      }
    (text, cs.name())
  }

  /** Is this media type text we should materialize as a string column?
    * (A JPEG body decoded with REPLACE is megabytes of U+FFFD — keep
    * binary binary.) Missing Content-Type attempts text: small servers
    * omit it and their pages are overwhelmingly HTML. */
  private[sources] def isTextual(contentType: Option[String]): Boolean =
    contentType match {
      case None => true
      case Some(ct) =>
        val mt = {
          val semi = ct.indexOf(';')
          (if (semi < 0) ct else ct.substring(0, semi)).trim.toLowerCase
        }
        mt.startsWith("text/") || mt.endsWith("+xml") ||
          mt.endsWith("+json") ||
          Set("application/json", "application/xml",
            "application/javascript", "application/x-javascript",
            "application/xhtml", "application/ecmascript")(mt)
    }

  private val HeaderType =
    ArrayType(StructType(Seq(StructField("name", StringType),
      StructField("value", StringType))), containsNull = false)

  /** DataFrame form: parse each payload as an HTTP response, appending
    * `http_status` (−1 = not an HTTP message — kept, never dropped),
    * `http_reason`, `http_content_type` (raw header value),
    * `http_headers` (file-order name/value pairs), `http_charset` (the
    * charset the text decode actually used), `body` (transfer+content
    * decoded bytes) and `text` (charset-decoded, textual media types
    * only). One narrow per-partition pass — no shuffle. */
  def responses(df: DataFrame, payloadCol: String = "payload",
                maxInflate: Int = 64 * 1024 * 1024): DataFrame = {
    val pi = df.schema.fieldIndex(payloadCol)
    val schema = df.schema
      .add("http_status", LongType).add("http_reason", StringType)
      .add("http_content_type", StringType)
      .add("http_headers", HeaderType)
      .add("http_charset", StringType)
      .add("body", BinaryType).add("text", StringType)
    df.mapPartitions { it =>
      it.map { row =>
        val payload = row.getAs[Array[Byte]](pi)
        parseResponse(payload) match {
          case Some(r) =>
            val body = decodedBody(r, maxInflate)
            val ct = r.header("Content-Type")
            val (text, charset) =
              if (isTextual(ct)) bodyText(body, ct)
              else (null, null)
            Row.fromSeq(row.toSeq :+ r.status.toLong :+ r.reason :+
              ct.orNull :+ r.headers.map(h => Row(h._1, h._2)) :+
              charset :+ body :+ text)
          case None =>
            Row.fromSeq(row.toSeq :+ -1L :+ null :+ null :+ null :+
              null :+ null :+ null)
        }
      }
    }(Encoders.row(schema))
  }
}
