package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Sitemap parsing (sitemaps.org protocol) — the discovery layer next
  * to [[Robots]] (whose `Sitemap:` lines point here): `<urlset>` files
  * yield page URLs with optional `<lastmod>`, `<sitemapindex>` files
  * yield child sitemap URLs. Hand-rolled lenient tag scan, no XML
  * library: real sitemaps are machine-generated but still arrive
  * truncated, mis-nested, or with stray bytes — a conforming parser
  * that throws loses the file, this one yields the entries it can see.
  * XML's predefined entities and numeric references are decoded in
  * `<loc>` text (URLs in XML MUST escape `&`). The protocol's 50k-URL
  * cap doubles as the bomb guard. Gzipped sitemaps (`.xml.gz`) are
  * auto-detected by magic bytes and inflated through [[Warc.gunzip]]'s
  * validated member walk. */
object Sitemaps {

  /** One sitemap entry: the (entity-decoded) URL and the raw
    * `<lastmod>` value when present. */
  final case class Entry(loc: String, lastmod: Option[String])

  private[sources] def matchesAt(s: String, i: Int, what: String): Boolean =
    i + what.length <= s.length &&
      s.regionMatches(true, i, what, 0, what.length)

  /** First `<tag>text</tag>` child inside [from, until); returns the
    * raw inner text or null. Tag-name boundary checked so `<locale>`
    * is not a `<loc>`. */
  private[sources] def childText(s: String, from: Int, until: Int,
                        tag: String): String = {
    var i = from
    while (i < until) {
      if (s.charAt(i) == '<' && matchesAt(s, i + 1, tag)) {
        val after = i + 1 + tag.length
        if (after < until &&
          (s.charAt(after) == '>' || s.charAt(after) == ' ')) {
          val open = s.indexOf('>', after)
          if (open < 0 || open >= until) return null
          // CDATA child (RSS commonly wraps <link>/<title> in
          // <![CDATA[…]]>): take the literal section content — which
          // may itself contain "</" — re-protecting '&' so the
          // callers' entity unescape round-trips it unchanged.
          var k = open + 1
          while (k < until && Character.isWhitespace(s.charAt(k))) k += 1
          if (k + 9 <= until && s.regionMatches(k, "<![CDATA[", 0, 9)) {
            val cend = s.indexOf("]]>", k + 9)
            if (cend >= 0 && cend <= until)
              return s.substring(k + 9, cend).replace("&", "&amp;").trim
          }
          val close = s.indexOf("</", open + 1)
          if (close < 0 || close > until) return null
          return s.substring(open + 1, close).trim
        }
      }
      i += 1
    }
    null
  }

  /** XML text unescape: the five predefined entities plus numeric
    * references; unknown forms stay literal (lenient, never throws). */
  private[sources] def unescape(s: String): String = {
    if (s == null || s.indexOf('&') < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        val body = if (semi > i && semi <= i + 10)
          s.substring(i + 1, semi) else null
        val rep = body match {
          case "amp" => "&"
          case "lt" => "<"
          case "gt" => ">"
          case "quot" => "\""
          case "apos" => "'"
          case b if b != null && b.startsWith("#") =>
            try {
              val cp =
                if (b.length > 2 && (b.charAt(1) == 'x' || b.charAt(1) == 'X'))
                  Integer.parseInt(b.substring(2), 16)
                else Integer.parseInt(b.substring(1))
              if (cp > 0 && cp <= 0x10ffff &&
                !(cp >= 0xd800 && cp <= 0xdfff))
                new String(Character.toChars(cp))
              else null
            } catch { case _: NumberFormatException => null }
          case _ => null
        }
        if (rep != null) { out.append(rep); i = semi + 1 }
        else { out.append('&'); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Does the document's ROOT element (first tag that is not a
    * prolog/comment/doctype) match `name` as a whole tag name? The
    * shared root-detection for [[isIndex]] and [[Feeds.isAtom]] — a
    * document-wide substring scan would let body text that merely
    * mentions the token flip the parse mode. */
  private[sources] def rootIs(xml: String, name: String): Boolean = {
    if (xml == null) return false
    var i = 0
    val n = xml.length
    while (i < n) {
      if (xml.charAt(i) == '<') {
        if (i + 1 < n && (xml.charAt(i + 1) == '?' ||
          xml.charAt(i + 1) == '!')) { // prolog/doctype/comment
          val e = xml.indexOf('>', i + 1)
          if (e < 0) return false
          i = e + 1
        } else {
          return matchesAt(xml, i + 1, name) && {
            val a = i + 1 + name.length
            a >= n || xml.charAt(a) == '>' || xml.charAt(a) == ' ' ||
              xml.charAt(a) == '\t' || xml.charAt(a) == '\n' ||
              xml.charAt(a) == '\r' || xml.charAt(a) == '/'
          }
        }
      } else i += 1
    }
    false
  }

  /** Is this a `<sitemapindex>` (child-sitemap list) rather than a
    * `<urlset>` (page list)? Decided by the ROOT element — a urlset
    * whose text mentions "<sitemapindex" must not switch block tags. */
  def isIndex(xml: String): Boolean = rootIs(xml, "sitemapindex")

  /** All entries of a sitemap document: `<url>` blocks of a urlset or
    * `<sitemap>` blocks of an index, each yielding its `<loc>` (
    * entity-decoded; block skipped when absent/empty) and optional
    * `<lastmod>`. Capped at the protocol's 50,000; never throws. */
  def parse(xml: String): Seq[Entry] = {
    if (xml == null) return Nil
    val blockTag = if (isIndex(xml)) "sitemap" else "url"
    val out = Vector.newBuilder[Entry]
    var count = 0
    var i = 0
    val n = xml.length
    while (i < n && count < 50000) {
      if (xml.charAt(i) == '<' && matchesAt(xml, i + 1, blockTag) && {
        val a = i + 1 + blockTag.length
        a < n && (xml.charAt(a) == '>' || xml.charAt(a) == ' ')
      }) {
        val open = xml.indexOf('>', i + 1)
        if (open < 0) return out.result()
        val close = {
          // Case-insensitive close-tag scan: the open tag matched via
          // regionMatches(true, …), so an uppercase/mixed-case sitemap
          // (<URL>…</URL>) must find its close the same way or the rest
          // of the file collapses into one block.
          var c = -1
          var j = open + 1
          while (c < 0 && j + 1 < n) {
            if (xml.charAt(j) == '<' && xml.charAt(j + 1) == '/' &&
              matchesAt(xml, j + 2, blockTag)) c = j
            j += 1
          }
          if (c < 0) n else c
        }
        val loc = childText(xml, open + 1, close, "loc")
        if (loc != null && loc.nonEmpty) {
          out += Entry(unescape(loc),
            Option(childText(xml, open + 1, close, "lastmod"))
              .filter(_.nonEmpty))
          count += 1
        }
        i = close
      } else i += 1
    }
    out.result()
  }

  /** DataFrame explode: each row's sitemap bytes (gzip auto-detected
    * by magic) yield one row per entry with (entry_ix, loc, lastmod,
    * is_index). Unparseable/empty sitemaps yield a single coded
    * `entry_ix = −1` row — kept, never silently dropped. One narrow
    * per-partition pass. */
  def entries(df: DataFrame, bytesCol: String = "bytes",
              maxInflate: Int = 64 * 1024 * 1024): DataFrame = {
    val bi = df.schema.fieldIndex(bytesCol)
    val schema = df.schema
      .add("entry_ix", LongType).add("loc", StringType)
      .add("lastmod", StringType).add("is_index", BooleanType)
    df.mapPartitions { it =>
      it.flatMap { row =>
        val raw = row.getAs[Array[Byte]](bi)
        val bytes =
          if (raw != null && raw.length > 2 && (raw(0) & 0xff) == 0x1f &&
            (raw(1) & 0xff) == 0x8b)
            Warc.gunzip(raw, maxInflate).orNull
          else raw
        val xml = if (bytes == null) null
        else new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        val parsed = parse(xml)
        if (parsed.isEmpty)
          Iterator.single(Row.fromSeq(
            row.toSeq :+ -1L :+ null :+ null :+ null))
        else {
          val idx = isIndex(xml)
          parsed.iterator.zipWithIndex.map { case (e, ix) =>
            Row.fromSeq(row.toSeq :+ ix.toLong :+ e.loc :+
              e.lastmod.orNull :+ idx)
          }
        }
      }
    }(Encoders.row(schema))
  }
}
