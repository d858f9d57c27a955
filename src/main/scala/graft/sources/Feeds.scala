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

  /** Is this an Atom feed rather than RSS? */
  def isAtom(xml: String): Boolean =
    xml != null && xml.toLowerCase.contains("<feed")

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

  /** `name="value"` / `name='value'` inside one tag's text, name at a
    * word boundary, case-insensitive. */
  private def attr(tag: String, name: String): String = {
    var i = 0
    val n = tag.length
    while (i < n) {
      if (Sitemaps.matchesAt(tag, i, name) &&
        (i == 0 || !tag.charAt(i - 1).isLetterOrDigit)) {
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
        }
      }
      i += 1
    }
    null
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
    * link, published, is_atom); unparseable/empty feeds yield a coded
    * `entry_ix = −1` row. Gzip auto-detected. One narrow per-partition
    * pass. */
  def entries(df: DataFrame, bytesCol: String = "bytes",
              maxInflate: Int = 64 * 1024 * 1024): DataFrame = {
    val bi = df.schema.fieldIndex(bytesCol)
    val schema = df.schema
      .add("entry_ix", LongType).add("title", StringType)
      .add("link", StringType).add("published", StringType)
      .add("is_atom", BooleanType)
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
            row.toSeq :+ -1L :+ null :+ null :+ null :+ null))
        else {
          val atom = isAtom(xml)
          parsed.iterator.zipWithIndex.map { case (e, ix) =>
            Row.fromSeq(row.toSeq :+ ix.toLong :+ e.title :+ e.link :+
              e.published.orNull :+ atom)
          }
        }
      }
    }(Encoders.row(schema))
  }
}
