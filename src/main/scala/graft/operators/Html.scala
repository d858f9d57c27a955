package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** HTML → visible text, the step between WARC ingest and the `documents`
  * table of every web-scale training corpus: a single-pass character
  * state machine — no parser library — that strips tags with
  * script/style/comment awareness, decodes the standard entities, and
  * collapses whitespace. Regex-free by design: a regex tag stripper
  * backtracks pathologically on crafted markup and cannot express
  * "inside <script>", while the state machine is strictly O(n) per
  * document with no stack — hostile markup (unterminated tags, nested
  * quotes, megabyte comments) degrades to dropping the malformed tail,
  * never to quadratic time or a throw.
  *
  * [[Html.extract]] is the DataFrame form: ONE narrow per-partition
  * pass, no shuffle — title and text come out of the same walk (r10
  * review: the earlier separate `indexOf`-based title scan both
  * triple-scanned the document and mis-indexed after length-changing
  * `toLowerCase` characters like U+0130). At 100 TB this runs inside
  * the same ingest scan as [[graft.sources.Warc.records]].
  */
object Html {

  private val Basic = Map("amp" -> '&', "lt" -> '<', "gt" -> '>',
    "quot" -> '"', "apos" -> '\'', "nbsp" -> ' ')

  /** Decode one entity starting AT `&` (index `i`); returns (decoded
    * char, index after). Unknown, unterminated, or non-WHATWG forms
    * (non-ASCII digits, signs, control/astral code points) stay a
    * literal `&` — never dropped, never decoded twice. */
  private def entity(s: String, i: Int): (Char, Int) = {
    val n = s.length
    val semi = {
      var k = i + 1
      val limit = math.min(n, i + 12) // longest accepted form: &#x10FFFF;
      while (k < limit && s.charAt(k) != ';') k += 1
      if (k < limit && k > i + 1 && s.charAt(k) == ';') k else -1
    }
    if (semi < 0) return ('&', i + 1)
    val body = s.substring(i + 1, semi)
    @inline def dec(c: Char) = c >= '0' && c <= '9'
    @inline def hex(c: Char) = dec(c) || (c >= 'a' && c <= 'f') ||
      (c >= 'A' && c <= 'F')
    if (body.startsWith("#")) {
      val num = body.substring(1)
      val cp =
        try {
          if (num.length > 1 && (num.charAt(0) == 'x' || num.charAt(0) == 'X')
            && num.substring(1).forall(hex))
            Integer.parseInt(num.substring(1), 16)
          else if (num.nonEmpty && num.forall(dec)) num.toInt
          else -1 // ASCII digits only — browsers leave '&#٦٥;' literal
        } catch { case _: NumberFormatException => -1 }
      if (cp >= 32 && cp <= 0xffff && !Character.isSurrogate(cp.toChar))
        (cp.toChar, semi + 1)
      else ('&', i + 1) // control/astral/invalid → literal ampersand
    } else Basic.get(body) match {
      case Some(c) => (c, semi + 1)
      case None => ('&', i + 1)
    }
  }

  /** Case-insensitive match of `what` at position `i`. */
  private def matches(s: String, i: Int, what: String): Boolean =
    i + what.length <= s.length &&
      s.regionMatches(true, i, what, 0, what.length)

  /** A TAG-NAME boundary at `j`: end of input, whitespace, `>`, or `/`
    * — so `<title-bar>` is a custom element, not a `<title>` (r10
    * review: bare prefix matching swallowed any tag whose name merely
    * starts with script/style/title). */
  private def boundary(s: String, j: Int): Boolean =
    j >= s.length || {
      val c = s.charAt(j)
      c == '>' || c == '/' || c == ' ' || c == '\t' || c == '\n' ||
        c == '\r' || c == '\f'
    }

  /** `<name` with a proper name boundary at `i`. */
  private def openTagAt(s: String, i: Int, name: String): Boolean =
    s.charAt(i) == '<' && matches(s, i + 1, name) &&
      boundary(s, i + 1 + name.length)

  /** Scan a tag from just after its `<` to the closing `>`, honoring
    * quoted attribute values (a `>` or `</script>` INSIDE quotes is
    * data). Returns (index after `>`, selfClosing); (n, false) when
    * unterminated. */
  private def tagEnd(s: String, from: Int): (Int, Boolean) = {
    val n = s.length
    var k = from
    var quote: Char = 0
    var lastMeaningful: Char = 0
    while (k < n) {
      val ch = s.charAt(k)
      if (quote != 0) { if (ch == quote) quote = 0 }
      else if (ch == '"' || ch == '\'') quote = ch
      else if (ch == '>') return (k + 1, lastMeaningful == '/')
      else if (!ch.isWhitespace) lastMeaningful = ch
      k += 1
    }
    (n, false)
  }

  /** The single-pass walk: returns (visible text, first title). `title`
    * capture recurses once into the title's content with capture OFF, so
    * nested-title bombs cannot grow the stack. */
  private def extractCore(html: String,
                          captureTitle: Boolean): (String, Option[String]) = {
    if (html == null) return ("", None)
    val n = html.length
    val out = new java.lang.StringBuilder(math.min(n, 1 << 16))
    var firstTitle: String = null
    var pendingSpace = false
    @inline def emit(c: Char): Unit = {
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f')
        pendingSpace = true
      else {
        if (pendingSpace && out.length > 0) out.append(' ')
        pendingSpace = false
        out.append(c)
      }
    }
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        val dropName =
          if (openTagAt(html, i, "script")) "script"
          else if (openTagAt(html, i, "style")) "style"
          else if (captureTitle && openTagAt(html, i, "title")) "title"
          else null
        if (matches(html, i, "<!--")) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
          pendingSpace = true
        } else if (matches(html, i, "<![CDATA[")) {
          val e = html.indexOf("]]>", i + 9)
          i = if (e < 0) n else e + 3
          pendingSpace = true
        } else if (dropName != null) {
          // Parse the OPEN tag fully first (quote-aware — a '</script>'
          // inside an attribute value is data, not the close; r10
          // review), then scan for the boundary-checked close tag.
          val (openEnd, selfClosing) = tagEnd(html, i + 1)
          if (selfClosing || openEnd >= n) i = openEnd
          else {
            var k = openEnd
            var contentEnd = -1
            var end = -1
            while (end < 0 && k < n) {
              if (html.charAt(k) == '<' && k + 1 < n &&
                html.charAt(k + 1) == '/' && matches(html, k + 2, dropName) &&
                boundary(html, k + 2 + dropName.length)) {
                contentEnd = k
                var g = k + 2 + dropName.length
                while (g < n && html.charAt(g) != '>') g += 1
                end = if (g < n) g + 1 else n
              } else k += 1
            }
            if (dropName == "title" && firstTitle == null) {
              val ce = if (contentEnd < 0) n else contentEnd
              val t = extractCore(html.substring(openEnd, ce), false)._1
              if (t.nonEmpty) firstTitle = t
            }
            i = if (end < 0) n else end
          }
          pendingSpace = true
        } else if (i + 1 < n && (html.charAt(i + 1).isLetter ||
          html.charAt(i + 1) == '/' || html.charAt(i + 1) == '!' ||
          html.charAt(i + 1) == '?')) {
          i = tagEnd(html, i + 1)._1
          pendingSpace = true // tag boundaries separate words
        } else { emit('<'); i += 1 } // bare '<' is text
      } else if (c == '&') {
        val (d, next) = entity(html, i)
        emit(d)
        i = next
      } else { emit(c); i += 1 }
    }
    (out.toString, Option(firstTitle))
  }

  /** Visible text of an HTML document: `<script>`/`<style>`/`<title>`
    * elements dropped whole (code and head metadata, not body text —
    * the title is [[Html.title]]'s output), comments and CDATA dropped,
    * every other tag replaced by a single separator, entities decoded
    * once, whitespace collapsed to single spaces and trimmed.
    * Null-safe; never throws on any input. */
  def extractText(html: String): String = extractCore(html, true)._1

  /** First `<title>` element's content (same machine, same walk), None
    * when absent/empty. A `<title>` mentioned inside script CODE or a
    * comment is data, not the title. */
  def title(html: String): Option[String] = extractCore(html, true)._2

  /** DataFrame form: appends `title` (nullable) and `text` (the visible
    * text), both from ONE extraction walk per document — one narrow
    * per-partition pass, no shuffle. */
  def extract(df: DataFrame, htmlCol: String = "html"): DataFrame = {
    val hi = df.schema.fieldIndex(htmlCol)
    val schema = df.schema.add("title", StringType).add("text", StringType)
    df.mapPartitions { it =>
      it.map { row =>
        val (text, t) = extractCore(row.getAs[String](hi), true)
        Row.fromSeq(row.toSeq :+ t.orNull :+ text)
      }
    }(Encoders.row(schema))
  }
}
