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
  * [[Html.extract]] is the DataFrame form: one narrow per-partition
  * pass, no shuffle — at 100 TB this runs inside the same ingest scan
  * as [[graft.sources.Warc.records]].
  */
object Html {

  private val Basic = Map("amp" -> '&', "lt" -> '<', "gt" -> '>',
    "quot" -> '"', "apos" -> '\'', "nbsp" -> ' ')

  /** Decode one entity starting AT `&` (index `i`); returns (decoded
    * char or null-for-literal, index after the entity). Unknown or
    * unterminated entities stay literal — never dropped, never decoded
    * twice. */
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
    if (body.startsWith("#")) {
      val num = body.substring(1)
      val cp =
        try {
          if (num.length > 1 && (num.charAt(0) == 'x' || num.charAt(0) == 'X'))
            Integer.parseInt(num.substring(1), 16)
          else if (num.nonEmpty && num.forall(_.isDigit)) num.toInt
          else -1
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

  /** Visible text of an HTML document: `<script>`/`<style>`/`<title>`
    * elements dropped whole (code and head metadata, not body text —
    * the title is [[Html.title]]'s job), comments and CDATA dropped, every other tag replaced by a single separator,
    * entities decoded once, whitespace collapsed to single spaces and
    * trimmed. Null-safe; never throws on any input. */
  def extractText(html: String): String = {
    if (html == null) return ""
    val n = html.length
    val out = new java.lang.StringBuilder(math.min(n, 1 << 16))
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
        if (matches(html, i, "<!--")) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
          pendingSpace = true
        } else if (matches(html, i, "<![CDATA[")) {
          val e = html.indexOf("]]>", i + 9)
          i = if (e < 0) n else e + 3
          pendingSpace = true
        } else if (matches(html, i, "<script") || matches(html, i, "<style") ||
          matches(html, i, "<title")) {
          val close =
            if (matches(html, i, "<script")) "</script"
            else if (matches(html, i, "<style")) "</style"
            else "</title" // title is head METADATA, not visible text
          // To the matching close tag's '>', case-insensitive; content
          // (code) is dropped whole, '<'s inside it included.
          var k = i + 1
          var end = -1
          while (end < 0 && k < n) {
            if (html.charAt(k) == '<' && matches(html, k, close)) {
              var g = k + close.length
              while (g < n && html.charAt(g) != '>') g += 1
              end = if (g < n) g + 1 else n
            } else k += 1
          }
          i = if (end < 0) n else end
          pendingSpace = true
        } else if (i + 1 < n && (html.charAt(i + 1).isLetter ||
          html.charAt(i + 1) == '/' || html.charAt(i + 1) == '!' ||
          html.charAt(i + 1) == '?')) {
          // A tag: to the closing '>', honoring quoted attribute values
          // (a '>' inside quotes does not end the tag).
          var k = i + 1
          var quote: Char = 0
          var end = -1
          while (end < 0 && k < n) {
            val ch = html.charAt(k)
            if (quote != 0) { if (ch == quote) quote = 0 }
            else if (ch == '"' || ch == '\'') quote = ch
            else if (ch == '>') end = k + 1
            k += 1
          }
          i = if (end < 0) n else end
          pendingSpace = true // tag boundaries separate words
        } else { emit('<'); i += 1 } // bare '<' is text
      } else if (c == '&') {
        val (d, next) = entity(html, i)
        emit(d)
        i = next
      } else { emit(c); i += 1 }
    }
    out.toString
  }

  /** First `<title>` content (extracted with the same machine), None
    * when absent/empty. */
  def title(html: String): Option[String] = {
    if (html == null) return None
    val lower = html.toLowerCase(java.util.Locale.ROOT)
    val s = lower.indexOf("<title")
    if (s < 0) return None
    val gt = html.indexOf('>', s)
    if (gt < 0) return None
    val e = lower.indexOf("</title", gt)
    if (e < 0) return None
    val t = extractText(html.substring(gt + 1, e))
    if (t.isEmpty) None else Some(t)
  }

  /** DataFrame form: appends `title` (nullable) and `text` (the visible
    * text) extracted from an HTML string column — one narrow
    * per-partition pass, no shuffle. */
  def extract(df: DataFrame, htmlCol: String = "html"): DataFrame = {
    val hi = df.schema.fieldIndex(htmlCol)
    val schema = df.schema.add("title", StringType).add("text", StringType)
    df.mapPartitions { it =>
      it.map { row =>
        val h = row.getAs[String](hi)
        Row.fromSeq(row.toSeq :+ title(h).orNull :+ extractText(h))
      }
    }(Encoders.row(schema))
  }
}
