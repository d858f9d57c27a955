package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** RSS 2.0 / Atom feed parsing — the third leg of crawl discovery next
  * to [[Robots]] and [[Sitemaps]]: feeds are how a crawler finds NEW
  * pages between sitemap refreshes, and their `pubDate`/`published`
  * stamps feed the same temporal keys as `Html.pageMeta`. Same
  * hand-rolled lenient tag scan as [[Sitemaps]] (shared helpers, no
  * XML library — real feeds arrive truncated and mis-nested), same
  * gzip auto-detect, same coded-failure-row discipline.
  *
  * Format detection is by root token: `<feed` → Atom (entries are
  * `<entry>` blocks, the link is the `href` ATTRIBUTE of the first
  * `<link>` child preferring `rel="alternate"`/unmarked over
  * self/edit links, the timestamp `<published>` falling back to
  * `<updated>`); anything else parses as RSS 2.0 (`<item>` blocks,
  * `<link>` text, `<pubDate>`). Titles and links entity-decode with
  * the XML predefined set. Capped at 10k entries per feed. */
object Feeds {

  /** One feed entry: entity-decoded title and link, raw timestamp. */
  final case class Entry(title: String, link: String,
                         published: Option[String])

  /** Is this an Atom feed rather than RSS? Decided by the ROOT element
    * (the first tag that is not a prolog/comment/doctype), not a
    * whole-document substring — an RSS item whose content mentions
    * "<feed" must not flip the whole file to Atom parsing. */
  def isAtom(xml: String): Boolean = Sitemaps.rootIs(xml, "feed")

  /** The `href` attribute of the first `<link>` tag inside
    * [from, until) whose `rel` is absent or `alternate` — Atom's link
    * convention (self/hub/edit links carry explicit other rels). */
  private def atomLinkHref(s: String, from: Int, until: Int): String = {
    var i = from
    while (i < until) {
      if (s.charAt(i) == '<' && Sitemaps.matchesAt(s, i + 1, "link")) {
        val after = i + 1 + 4
        if (after < until && (s.charAt(after) == ' ' ||
          s.charAt(after) == '>' || s.charAt(after) == '/')) {
          val end = s.indexOf('>', after)
          val tagEnd = if (end < 0 || end > until) until else end
          val tag = s.substring(i, tagEnd)
          val rel = attr(tag, "rel")
          if (rel == null || rel.equalsIgnoreCase("alternate")) {
            val href = attr(tag, "href")
            if (href != null && href.nonEmpty) return href
          }
          i = tagEnd
        } else i += 1
      } else i += 1
    }
    null
  }

  /** `name="value"` / `name='value'` inside one tag's text — the name
    * must be PRECEDED BY WHITESPACE (an attribute boundary: `data-rel`
    * is not a `rel`, letter/digit rejection alone passes the '-'), and
    * the scan is quote-aware (a name inside another attribute's VALUE
    * is data). Case-insensitive. */
  private def attr(tag: String, name: String): String = {
    var i = 1
    val n = tag.length
    var quote: Char = 0
    while (i < n) {
      val c = tag.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0; i += 1 }
      else if (c == '"' || c == '\'') { quote = c; i += 1 }
      else if (tag.charAt(i - 1).isWhitespace &&
        Sitemaps.matchesAt(tag, i, name)) {
        var j = i + name.length
        while (j < n && tag.charAt(j).isWhitespace) j += 1
        if (j < n && tag.charAt(j) == '=') {
          j += 1
          while (j < n && tag.charAt(j).isWhitespace) j += 1
          if (j < n && (tag.charAt(j) == '"' || tag.charAt(j) == '\'')) {
            val q = tag.charAt(j)
            val close = tag.indexOf(q, j + 1)
            if (close > 0) return tag.substring(j + 1, close)
          }
          i = j
        } else i = j
      } else i += 1
    }
    null
  }

  private val Months = Map("jan" -> 1, "feb" -> 2, "mar" -> 3, "apr" -> 4,
    "may" -> 5, "jun" -> 6, "jul" -> 7, "aug" -> 8, "sep" -> 9,
    "oct" -> 10, "nov" -> 11, "dec" -> 12)

  private val ZoneNames = Map("GMT" -> "Z", "UT" -> "Z", "UTC" -> "Z",
    "Z" -> "Z", "EST" -> "-05:00", "EDT" -> "-04:00", "CST" -> "-06:00",
    "CDT" -> "-05:00", "MST" -> "-07:00", "MDT" -> "-06:00",
    "PST" -> "-08:00", "PDT" -> "-07:00")

  /** RSS `pubDate` (RFC 822/1123, `[Dow, ]DD Mon YYYY HH:MM[:SS] ZONE`)
    * → ISO-8601, the same normalization [[graft.sources.Pdf.pdfDate]]
    * applies to PDF dates — so feed, page, and PDF timestamps all land
    * in one comparable key space. Two-digit years pivot per RFC 2822
    * (<50 → 2000s); named zones cover the RFC 822 set; numeric
    * `±HHMM` offsets pass through as `±HH:MM`. Null when the shape is
    * not a date. Atom timestamps are already ISO — pass them through
    * the identity. */
  def rfc822ToIso(s: String): String = {
    if (s == null) return null
    val t0 = s.trim
    val comma = t0.indexOf(',')
    val t = (if (comma >= 0) t0.substring(comma + 1) else t0).trim
    val parts = t.split("\\s+")
    if (parts.length < 4) return null
    val dayOk = parts(0).nonEmpty && parts(0).length <= 2 &&
      parts(0).forall(_.isDigit)
    val mon = Months.get(parts(1).toLowerCase(java.util.Locale.ROOT)
      .take(3))
    val yearOk = parts(2).nonEmpty && parts(2).length <= 4 &&
      parts(2).forall(_.isDigit)
    val time = parts(3).split(':')
    if (!dayOk || mon.isEmpty || !yearOk || time.length < 2 ||
      !time.forall(p => p.nonEmpty && p.length <= 2 &&
        p.forall(_.isDigit))) return null
    val year = {
      val y = parts(2).toInt
      if (parts(2).length <= 2) { if (y < 50) 2000 + y else 1900 + y }
      else y
    }
    val zone =
      if (parts.length < 5) ""
      else {
        val z = parts(4)
        ZoneNames.getOrElse(z.toUpperCase(java.util.Locale.ROOT), {
          if (z.length == 5 && (z.charAt(0) == '+' || z.charAt(0) == '-')
            && z.substring(1).forall(_.isDigit))
            s"${z.substring(0, 3)}:${z.substring(3)}"
          else ""
        })
      }
    f"$year%04d-${mon.get}%02d-${parts(0).toInt}%02dT" +
      f"${time(0).toInt}%02d:${time(1).toInt}%02d:" +
      f"${if (time.length > 2) time(2).toInt else 0}%02d$zone"
  }

  /** All entries of a feed document; never throws. */
  def parse(xml: String): Seq[Entry] = {
    if (xml == null) return Nil
    val atom = isAtom(xml)
    val blockTag = if (atom) "entry" else "item"
    val out = Vector.newBuilder[Entry]
    var count = 0
    var i = 0
    val n = xml.length
    while (i < n && count < 10000) {
      if (xml.charAt(i) == '<' && Sitemaps.matchesAt(xml, i + 1, blockTag) && {
        val a = i + 1 + blockTag.length
        a < n && (xml.charAt(a) == '>' || xml.charAt(a) == ' ')
      }) {
        val open = xml.indexOf('>', i + 1)
        if (open < 0) return out.result()
        val close = {
          var c = -1
          var j = open + 1
          while (c < 0 && j + 1 < n) {
            if (xml.charAt(j) == '<' && xml.charAt(j + 1) == '/' &&
              Sitemaps.matchesAt(xml, j + 2, blockTag)) c = j
            j += 1
          }
          if (c < 0) n else c
        }
        val title = Sitemaps.childText(xml, open + 1, close, "title")
        val link =
          if (atom) atomLinkHref(xml, open + 1, close)
          else Sitemaps.childText(xml, open + 1, close, "link")
        val published =
          if (atom)
            Option(Sitemaps.childText(xml, open + 1, close, "published"))
              .orElse(Option(
                Sitemaps.childText(xml, open + 1, close, "updated")))
              .filter(_.nonEmpty)
          else Option(Sitemaps.childText(xml, open + 1, close, "pubDate"))
            .filter(_.nonEmpty)
        if (link != null && link.nonEmpty) {
          out += Entry(Sitemaps.unescape(title), Sitemaps.unescape(link),
            published)
          count += 1
        }
        i = close
      } else i += 1
    }
    out.result()
  }

  /** DataFrame explode: one row per feed entry with (entry_ix, title,
    * link, published raw, published_iso — RSS pubDates through
    * [[rfc822ToIso]], Atom timestamps already ISO pass through —
    * is_atom); unparseable/empty feeds yield a coded `entry_ix = −1`
    * row. Gzip auto-detected. One narrow per-partition pass. */
  def entries(df: DataFrame, bytesCol: String = "bytes",
              maxInflate: Int = 64 * 1024 * 1024): DataFrame = {
    val bi = df.schema.fieldIndex(bytesCol)
    val schema = df.schema
      .add("entry_ix", LongType).add("title", StringType)
      .add("link", StringType).add("published", StringType)
      .add("published_iso", StringType).add("is_atom", BooleanType)
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
            row.toSeq :+ -1L :+ null :+ null :+ null :+ null :+ null))
        else {
          val atom = isAtom(xml)
          parsed.iterator.zipWithIndex.map { case (e, ix) =>
            val iso =
              if (atom) e.published.orNull
              else e.published.map(rfc822ToIso).orNull
            Row.fromSeq(row.toSeq :+ ix.toLong :+ e.title :+ e.link :+
              e.published.orNull :+ iso :+ atom)
          }
        }
      }
    }(Encoders.row(schema))
  }
}
