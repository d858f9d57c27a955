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

  /** WHATWG numeric-reference override: `&#128;`–`&#159;` decode as the
    * windows-1252 characters every browser substitutes (the C1 controls
    * they nominally name never appear intentionally on the web — `&#146;`
    * is an apostrophe, `&#151;` an em-dash). The five holes (0x81, 0x8D,
    * 0x8F, 0x90, 0x9D) have no cp1252 glyph and stay literal. */
  private val Cp1252 = Map(
    0x80 -> 0x20ac, 0x82 -> 0x201a, 0x83 -> 0x0192, 0x84 -> 0x201e,
    0x85 -> 0x2026, 0x86 -> 0x2020, 0x87 -> 0x2021, 0x88 -> 0x02c6,
    0x89 -> 0x2030, 0x8a -> 0x0160, 0x8b -> 0x2039, 0x8c -> 0x0152,
    0x8e -> 0x017d, 0x91 -> 0x2018, 0x92 -> 0x2019, 0x93 -> 0x201c,
    0x94 -> 0x201d, 0x95 -> 0x2022, 0x96 -> 0x2013, 0x97 -> 0x2014,
    0x98 -> 0x02dc, 0x99 -> 0x2122, 0x9a -> 0x0161, 0x9b -> 0x203a,
    0x9c -> 0x0153, 0x9e -> 0x017e, 0x9f -> 0x0178)

  /** Named references: the full HTML4/Latin-1/Greek/symbol set (the
    * entities that dominate real crawl text — the long tail of the
    * WHATWG table is compound math forms that essentially never appear).
    * Values are chosen for CORPUS text, not glyph fidelity: the
    * `&nbsp;` family decodes to a plain space (it separates words; a
    * literal U+00A0 would split tokens differently from visually
    * identical pages) and `&shy;` (invisible soft hyphen) is removed —
    * both documented normalizations, applied identically to the numeric
    * forms. */
  private[operators] val Named: Map[String, String] = {
    val m = Map.newBuilder[String, String]
    def e(pairs: (String, Int)*): Unit = pairs.foreach { case (k, cp) =>
      m += k -> new String(Character.toChars(cp))
    }
    m ++= Seq("amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
      "apos" -> "'", "nbsp" -> " ", "ensp" -> " ", "emsp" -> " ",
      "thinsp" -> " ", "shy" -> "")
    // Latin-1 punctuation + signs.
    e("iexcl" -> 0xa1, "cent" -> 0xa2, "pound" -> 0xa3, "curren" -> 0xa4,
      "yen" -> 0xa5, "brvbar" -> 0xa6, "sect" -> 0xa7, "uml" -> 0xa8,
      "copy" -> 0xa9, "ordf" -> 0xaa, "laquo" -> 0xab, "not" -> 0xac,
      "reg" -> 0xae, "macr" -> 0xaf, "deg" -> 0xb0, "plusmn" -> 0xb1,
      "sup2" -> 0xb2, "sup3" -> 0xb3, "acute" -> 0xb4, "micro" -> 0xb5,
      "para" -> 0xb6, "middot" -> 0xb7, "cedil" -> 0xb8, "sup1" -> 0xb9,
      "ordm" -> 0xba, "raquo" -> 0xbb, "frac14" -> 0xbc, "frac12" -> 0xbd,
      "frac34" -> 0xbe, "iquest" -> 0xbf, "times" -> 0xd7,
      "divide" -> 0xf7, "szlig" -> 0xdf)
    // Latin-1 letters, lowercase + the uppercase partners at cp−0x20.
    val l1 = Seq("agrave" -> 0xe0, "aacute" -> 0xe1, "acirc" -> 0xe2,
      "atilde" -> 0xe3, "auml" -> 0xe4, "aring" -> 0xe5, "aelig" -> 0xe6,
      "ccedil" -> 0xe7, "egrave" -> 0xe8, "eacute" -> 0xe9,
      "ecirc" -> 0xea, "euml" -> 0xeb, "igrave" -> 0xec, "iacute" -> 0xed,
      "icirc" -> 0xee, "iuml" -> 0xef, "eth" -> 0xf0, "ntilde" -> 0xf1,
      "ograve" -> 0xf2, "oacute" -> 0xf3, "ocirc" -> 0xf4,
      "otilde" -> 0xf5, "ouml" -> 0xf6, "oslash" -> 0xf8,
      "ugrave" -> 0xf9, "uacute" -> 0xfa, "ucirc" -> 0xfb, "uuml" -> 0xfc,
      "yacute" -> 0xfd, "thorn" -> 0xfe, "yuml" -> 0xff)
    l1.foreach { case (nm, cp) =>
      e(nm -> cp)
      if (cp != 0xff) { // 0xDF is szlig, not an uppercase yuml
        val up = nm match {
          case "aelig" => "AElig"; case "eth" => "ETH"
          case "thorn" => "THORN"; case x => x.capitalize
        }
        e(up -> (cp - 0x20))
      }
    }
    // Greek, both cases (0x3C2/0x3A2 final-sigma slot skipped).
    val greek = ("alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon phi chi " +
      "psi omega").split(' ')
    greek.zipWithIndex.foreach { case (nm, ix) =>
      val off = if (ix >= 17) ix + 1 else ix
      e(nm -> (0x3b1 + off), nm.capitalize -> (0x391 + off))
    }
    e("sigmaf" -> 0x3c2)
    // General punctuation, currency, symbols.
    e("ndash" -> 0x2013, "mdash" -> 0x2014, "lsquo" -> 0x2018,
      "rsquo" -> 0x2019, "sbquo" -> 0x201a, "ldquo" -> 0x201c,
      "rdquo" -> 0x201d, "bdquo" -> 0x201e, "dagger" -> 0x2020,
      "Dagger" -> 0x2021, "bull" -> 0x2022, "hellip" -> 0x2026,
      "permil" -> 0x2030, "prime" -> 0x2032, "Prime" -> 0x2033,
      "lsaquo" -> 0x2039, "rsaquo" -> 0x203a, "oline" -> 0x203e,
      "frasl" -> 0x2044, "euro" -> 0x20ac, "trade" -> 0x2122,
      "alefsym" -> 0x2135, "fnof" -> 0x192, "circ" -> 0x2c6,
      "tilde" -> 0x2dc, "OElig" -> 0x152, "oelig" -> 0x153,
      "Scaron" -> 0x160, "scaron" -> 0x161, "Yuml" -> 0x178,
      "loz" -> 0x25ca, "spades" -> 0x2660, "clubs" -> 0x2663,
      "hearts" -> 0x2665, "diams" -> 0x2666)
    // Arrows + math.
    e("larr" -> 0x2190, "uarr" -> 0x2191, "rarr" -> 0x2192,
      "darr" -> 0x2193, "harr" -> 0x2194, "crarr" -> 0x21b5,
      "lArr" -> 0x21d0, "uArr" -> 0x21d1, "rArr" -> 0x21d2,
      "dArr" -> 0x21d3, "hArr" -> 0x21d4, "forall" -> 0x2200,
      "part" -> 0x2202, "exist" -> 0x2203, "empty" -> 0x2205,
      "nabla" -> 0x2207, "isin" -> 0x2208, "notin" -> 0x2209,
      "ni" -> 0x220b, "prod" -> 0x220f, "sum" -> 0x2211,
      "minus" -> 0x2212, "lowast" -> 0x2217, "radic" -> 0x221a,
      "prop" -> 0x221d, "infin" -> 0x221e, "ang" -> 0x2220,
      "and" -> 0x2227, "or" -> 0x2228, "cap" -> 0x2229, "cup" -> 0x222a,
      "int" -> 0x222b, "there4" -> 0x2234, "sim" -> 0x223c,
      "cong" -> 0x2245, "asymp" -> 0x2248, "ne" -> 0x2260,
      "equiv" -> 0x2261, "le" -> 0x2264, "ge" -> 0x2265, "sub" -> 0x2282,
      "sup" -> 0x2283, "nsub" -> 0x2284, "sube" -> 0x2286,
      "supe" -> 0x2287, "oplus" -> 0x2295, "otimes" -> 0x2297,
      "perp" -> 0x22a5, "sdot" -> 0x22c5)
    m.result()
  }

  /** The no-semicolon LEGACY names (WHATWG's historical set — in text
    * content browsers decode `&amp` / `&copy` etc. even unterminated),
    * longest-first so `&quot` wins over a hypothetical shorter prefix.
    * Matched case-insensitively like the browser tables' dual entries. */
  private val Legacy = Seq("quot", "apos", "nbsp", "copy", "amp", "reg",
    "lt", "gt")

  /** The subset whose ALL-UPPERCASE semicolon forms (&AMP; &LT; …) the
    * WHATWG table actually defines — &NBSP;/&APOS; do not exist. */
  private val UpperLegacy = Set("quot", "copy", "amp", "reg", "lt", "gt")

  /** Decode one entity starting AT `&` (index `i`); returns (decoded
    * string, index after). Follows the WHATWG character-reference rules
    * that matter for corpus text: ASCII-digit numeric forms up to
    * U+10FFFF (astral code points — every emoji — emit a surrogate
    * pair), the C1 range remapped per windows-1252, TAB/LF/CR accepted
    * as whitespace, the named table above, and the legacy no-semicolon
    * forms. Everything else (unknown names, non-ASCII digits, signs,
    * other controls, surrogates, out-of-range) stays a literal `&` —
    * never dropped, never decoded twice. */
  private def entity(s: String, i: Int,
                     attr: Boolean = false): (String, Int) = {
    val n = s.length
    // WHATWG: unterminated legacy forms decode in text content; in
    // ATTRIBUTE values a legacy name followed by [a-zA-Z0-9=] stays
    // literal ('?x=1&copy=2' in an href is a query parameter, not ©).
    def legacyAt(): (String, Int) = {
      var res: (String, Int) = null
      val it = Legacy.iterator
      while (res == null && it.hasNext) {
        val nm = it.next()
        if (matches(s, i + 1, nm)) {
          val after = i + 1 + nm.length
          val blocked = attr && after < n && {
            val c = s.charAt(after)
            (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
              (c >= '0' && c <= '9') || c == '='
          }
          if (!blocked) res = (Named(nm), after)
        }
      }
      if (res == null) ("&", i + 1) else res
    }
    val semi = {
      var k = i + 1
      val limit = math.min(n, i + 12) // longest form: &#x10FFFF; / 10-char name
      while (k < limit && s.charAt(k) != ';') k += 1
      if (k < limit && k > i + 1 && s.charAt(k) == ';') k else -1
    }
    if (semi < 0) return legacyAt()
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
      val mapped =
        if (cp >= 0x80 && cp <= 0x9f) Cp1252.getOrElse(cp, -1) else cp
      if (mapped == 0xa0) (" ", semi + 1) // same normalization as &nbsp;
      else if (mapped == 0xad) ("", semi + 1) // same removal as &shy;
      else if (mapped == 9 || mapped == 10 || mapped == 13)
        (" ", semi + 1) // legal whitespace controls
      else if (mapped >= 32 && mapped != 127 && mapped <= 0x10ffff &&
        !(mapped >= 0xd800 && mapped <= 0xdfff))
        (new String(Character.toChars(mapped)), semi + 1)
      else ("&", i + 1) // control/surrogate/invalid → literal ampersand
    } else Named.get(body) match {
      case Some(v) => (v, semi + 1)
      case None =>
        // ALL-UPPERCASE semicolon forms exist in the WHATWG table only
        // for AMP/COPY/GT/LT/QUOT/REG — those decode (consuming the
        // ';'). Other case variants of legacy names (&NBSP; &AmP;) are
        // NOT entities: browsers render them literally, so falling
        // through to legacyAt() (which would decode the name and leave
        // a stray ';') must not happen either.
        val lower = body.toLowerCase(java.util.Locale.ROOT)
        if (Legacy.contains(lower)) {
          if (UpperLegacy.contains(lower) &&
            body.forall(c => !(c >= 'a' && c <= 'z')))
            (Named(lower), semi + 1)
          else ("&", i + 1)
        } else legacyAt() // '&ampx;' decodes the legacy prefix
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
  private[graft] def extractCore(html: String,
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
        var j = 0
        while (j < d.length) { emit(d.charAt(j)); j += 1 }
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

  // ---------------------------------------------------------------------
  // Boilerplate / main-content extraction — the step AFTER tag stripping
  // in every published web-corpus pipeline: nav bars, footers, cookie
  // banners are the #1 contaminant plain tag-stripping leaves behind.

  /** One structural block of a page: its whitespace-normalized visible
    * text and how many of those characters sat inside `<a>` elements
    * (anchor TEXT, not href). `linkChars` counts non-whitespace
    * characters only — separator spaces belong to the block, not to
    * the link. */
  final case class HtmlBlock(text: String, linkChars: Int)

  /** Block-level boundary tags: opening OR closing one flushes the
    * current block. The HTML5 flow-content splitters plus the legacy
    * table/form tags real pages still use. */
  private val BlockTags: Set[String] = Set(
    "p", "div", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5", "h6",
    "table", "thead", "tbody", "tfoot", "tr", "td", "th", "caption",
    "section", "article", "main", "blockquote", "pre", "br", "hr",
    "form", "dl", "dt", "dd", "figure", "figcaption", "body", "html",
    "head", "center", "fieldset", "legend", "address", "summary",
    "details")

  /** Semantic boilerplate scopes dropped WHOLE, nesting-aware: the
    * HTML5 landmark tags whose content is site chrome by definition.
    * An unclosed scope swallows the tail — the same degradation as an
    * unclosed `<script>`, and the right trade on hostile markup. */
  private val DropScopes: Set[String] = Set("nav", "footer", "header",
    "aside")

  /** ASCII-lowercased tag name starting at `from` (letters, digits,
    * dashes). Manual A–Z fold — locale-dependent `toLowerCase` changes
    * string length on e.g. U+0130 (the r10 title-misalignment bug
    * class). */
  private def tagNameAt(s: String, from: Int): String = {
    var i = from
    val sb = new java.lang.StringBuilder(8)
    var ok = true
    while (ok && i < s.length) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '-')
        { sb.append(c); i += 1 }
      else if (c >= 'A' && c <= 'Z') { sb.append((c + 32).toChar); i += 1 }
      else ok = false
    }
    sb.toString
  }

  /** Skip a drop-whole element (`script`/`style`/`title`) starting at
    * its `<`: parse the open tag quote-aware, then scan for the
    * boundary-checked close tag. Returns the index after the close (or
    * n when unterminated — same tail-drop degradation as
    * [[extractCore]]). */
  private def skipDropWhole(s: String, i: Int, name: String): Int = {
    val n = s.length
    val (openEnd, selfClosing) = tagEnd(s, i + 1)
    if (selfClosing || openEnd >= n) return openEnd
    var k = openEnd
    while (k < n) {
      if (s.charAt(k) == '<' && k + 1 < n && s.charAt(k + 1) == '/' &&
        matches(s, k + 2, name) && boundary(s, k + 2 + name.length)) {
        var g = k + 2 + name.length
        while (g < n && s.charAt(g) != '>') g += 1
        return if (g < n) g + 1 else n
      }
      k += 1
    }
    n
  }

  /** JSON-LD blocks — the machine-readable metadata channel
    * (schema.org `@type`/`headline`/`datePublished`/`author`) news and
    * product pages publish alongside the visible markup: the RAW
    * contents of every `<script type="application/ld+json">` element,
    * in document order. The type attribute matches its MIME essence
    * (parameters ignored, case-insensitive); script content is CDATA
    * to the parser so the capture runs to the real `</script`
    * close-tag like [[skipDropWhole]]. Parsing the JSON itself belongs
    * to Catalyst (`from_json` with the caller's schema) — this layer
    * only locates the payloads. Null-safe, never throws. */
  def jsonLd(html: String): Vector[String] = {
    if (html == null) return Vector.empty
    val n = html.length
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < n) {
      if (html.charAt(i) == '<') {
        if (matches(html, i, "<!--")) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (openTagAt(html, i, "script")) {
          val typ = attrValue(html, i, "type")
          val essence =
            if (typ == null) null
            else {
              val semi = typ.indexOf(';')
              (if (semi < 0) typ else typ.substring(0, semi)).trim
                .toLowerCase(java.util.Locale.ROOT)
            }
          val (openEnd, selfClosing) = tagEnd(html, i + 1)
          if (essence == "application/ld+json" && !selfClosing &&
            openEnd < n) {
            // Same close-tag walk as skipDropWhole, but keeping the
            // content range. An unterminated block is a malformed tail:
            // dropped, like every other truncated construct.
            var k = openEnd
            var contentEnd = -1
            var resume = n
            while (contentEnd < 0 && k < n) {
              if (html.charAt(k) == '<' && k + 1 < n &&
                html.charAt(k + 1) == '/' && matches(html, k + 2, "script") &&
                boundary(html, k + 8)) {
                contentEnd = k
                var g = k + 8
                while (g < n && html.charAt(g) != '>') g += 1
                resume = if (g < n) g + 1 else n
              }
              k += 1
            }
            if (contentEnd >= 0) {
              val body = html.substring(openEnd, contentEnd).trim
              if (body.nonEmpty) out += body
            }
            i = resume
          } else i = skipDropWhole(html, i, "script")
        } else if (i + 1 < n && (html.charAt(i + 1).isLetter ||
          html.charAt(i + 1) == '/' || html.charAt(i + 1) == '!' ||
          html.charAt(i + 1) == '?'))
          i = tagEnd(html, i + 1)._1
        else i += 1
      } else i += 1
    }
    out.result()
  }

  /** DataFrame explode of [[jsonLd]]: one row per JSON-LD block with
    * (`ld_ix`, `ld_json` raw). Pages without blocks yield no rows. One
    * narrow per-partition pass; parse downstream with `from_json`. */
  def extractJsonLd(df: DataFrame, htmlCol: String = "html"): DataFrame = {
    val hi = df.schema.fieldIndex(htmlCol)
    val schema = df.schema
      .add("ld_ix", LongType).add("ld_json", StringType)
    df.mapPartitions { it =>
      it.flatMap { row =>
        jsonLd(row.getAs[String](hi)).iterator.zipWithIndex.map {
          case (j, ix) => Row.fromSeq(row.toSeq :+ ix.toLong :+ j)
        }
      }
    }(Encoders.row(schema))
  }

  /** Segment a page into structural blocks: the same single-pass O(n)
    * machine as [[extractCore]], but flushing a block at every
    * block-level tag boundary, dropping the [[DropScopes]] landmarks
    * whole (nesting-aware with a floor — stray closes never underflow),
    * and counting anchor-text characters per block for the link-density
    * signal. Null-safe; never throws. */
  def blocks(html: String): Vector[HtmlBlock] = {
    if (html == null) return Vector.empty
    val n = html.length
    val out = Vector.newBuilder[HtmlBlock]
    val cur = new java.lang.StringBuilder(256)
    var linkChars = 0
    var pendingSpace = false
    var linkDepth = 0
    var dropDepth = 0 // combined depth across all DropScopes tags
    @inline def emit(c: Char): Unit = {
      if (dropDepth > 0) return
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f')
        pendingSpace = true
      else {
        if (pendingSpace && cur.length > 0) cur.append(' ')
        pendingSpace = false
        cur.append(c)
        if (linkDepth > 0) linkChars += 1
      }
    }
    def flush(): Unit = {
      if (cur.length > 0) out += HtmlBlock(cur.toString, linkChars)
      cur.setLength(0)
      linkChars = 0
      pendingSpace = false
    }
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        val dropName =
          if (openTagAt(html, i, "script")) "script"
          else if (openTagAt(html, i, "style")) "style"
          else if (openTagAt(html, i, "title")) "title"
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
          i = skipDropWhole(html, i, dropName)
          pendingSpace = true
        } else if (i + 1 < n && (html.charAt(i + 1).isLetter ||
          html.charAt(i + 1) == '/' || html.charAt(i + 1) == '!' ||
          html.charAt(i + 1) == '?')) {
          val closing = html.charAt(i + 1) == '/'
          val name = tagNameAt(html, if (closing) i + 2 else i + 1)
          val (after, selfClosing) = tagEnd(html, i + 1)
          if (DropScopes(name)) {
            if (closing) { if (dropDepth > 0) dropDepth -= 1 }
            else if (!selfClosing) {
              if (dropDepth == 0) flush()
              dropDepth += 1
            }
          } else if (dropDepth == 0) {
            if (name == "a") {
              // Browsers forbid nested <a>: an open implicitly closes
              // any open anchor (bounds sloppy unclosed-<a> damage),
              // and link-ness deliberately persists across block
              // boundaries — an <a> wrapping whole <div> cards is the
              // densest chrome there is.
              if (closing) linkDepth = 0
              else if (!selfClosing) linkDepth = 1
            } else if (BlockTags(name)) flush()
          }
          pendingSpace = true
          i = after
        } else { emit('<'); i += 1 }
      } else if (c == '&') {
        val (d, next) = entity(html, i)
        var j = 0
        while (j < d.length) { emit(d.charAt(j)); j += 1 }
        i = next
      } else { emit(c); i += 1 }
    }
    flush()
    out.result()
  }

  /** The value of attribute `name` inside the tag whose `<` is at
    * `tagStart` — quote-aware (a `>` inside a quoted value is data),
    * name matched case-insensitively at an attribute boundary (so
    * `data-href` is not an `href`), quoted or bare values. Null when
    * absent. */
  private def attrValue(s: String, tagStart: Int, name: String): String = {
    val limit = tagEnd(s, tagStart + 1)._1
    var k = tagStart + 1
    var quote: Char = 0
    // An attribute NAME may start after whitespace OR immediately after
    // a closing quote (`class="x"href="y"` — missing-whitespace-between-
    // attributes is a recoverable parse error browsers accept). `bnd`
    // tracks whether position k is such a boundary; it starts false so
    // the tag name itself is never matched as an attribute.
    var bnd = false
    while (k < limit) {
      val c = s.charAt(k)
      if (quote != 0) {
        if (c == quote) { quote = 0; bnd = true }
        k += 1
      } else if (bnd && matches(s, k, name) && {
        val a = k + name.length
        a >= limit || s.charAt(a) == '=' || s.charAt(a).isWhitespace ||
          s.charAt(a) == '>' || s.charAt(a) == '/'
      }) {
        var j = k + name.length
        while (j < limit && s.charAt(j).isWhitespace) j += 1
        if (j < limit && s.charAt(j) == '=') {
          j += 1
          while (j < limit && s.charAt(j).isWhitespace) j += 1
          if (j >= limit) return ""
          val q = s.charAt(j)
          if (q == '"' || q == '\'') {
            val close = s.indexOf(q, j + 1)
            // Unterminated quoted value: malformed tail, no attribute
            // (same degradation as every other truncated construct).
            if (close < 0 || close >= limit) return null
            return s.substring(j + 1, close)
          } else {
            var e = j
            while (e < limit && !s.charAt(e).isWhitespace &&
              s.charAt(e) != '>') e += 1
            return s.substring(j, e)
          }
        } else { // valueless attribute; keep scanning
          bnd = j > k + name.length
          k = j
        }
      } else if (c == '"' || c == '\'') { quote = c; bnd = false; k += 1 }
      else { bnd = c.isWhitespace; k += 1 }
    }
    null
  }

  /** Entity-decode an attribute value (the `&amp;` every href query
    * string carries) with the same decode-once entity machine. */
  private def decodeEntities(v: String): String = {
    if (v == null || v.indexOf('&') < 0) return v
    val out = new java.lang.StringBuilder(v.length)
    var i = 0
    while (i < v.length) {
      if (v.charAt(i) == '&') {
        val (d, next) = entity(v, i, attr = true)
        out.append(d)
        i = next
      } else { out.append(v.charAt(i)); i += 1 }
    }
    out.toString
  }

  /** All `<a href>` values of a page in document order, entity-decoded,
    * raw (unresolved): the outlink source of the crawl graph. Links in
    * script/style CODE and comments are data, not links. Null-safe,
    * never throws. */
  def links(html: String): Vector[String] = {
    if (html == null) return Vector.empty
    val n = html.length
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < n) {
      if (html.charAt(i) == '<') {
        if (matches(html, i, "<!--")) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (matches(html, i, "<![CDATA[")) {
          val e = html.indexOf("]]>", i + 9)
          i = if (e < 0) n else e + 3
        } else if (openTagAt(html, i, "script"))
          i = skipDropWhole(html, i, "script")
        else if (openTagAt(html, i, "style"))
          i = skipDropWhole(html, i, "style")
        else if (openTagAt(html, i, "title"))
          // RCDATA: no elements parse inside <title> — an '<a href'
          // there is literal text to a browser, not an outlink (and
          // extractCore/blocks already drop title whole).
          i = skipDropWhole(html, i, "title")
        else if (openTagAt(html, i, "a")) {
          val v = attrValue(html, i, "href")
          if (v != null && v.trim.nonEmpty) out += decodeEntities(v.trim)
          i = tagEnd(html, i + 1)._1
        } else if (i + 1 < n && (html.charAt(i + 1).isLetter ||
          html.charAt(i + 1) == '/' || html.charAt(i + 1) == '!' ||
          html.charAt(i + 1) == '?'))
          i = tagEnd(html, i + 1)._1
        else i += 1
      } else i += 1
    }
    out.result()
  }

  /** Space-separated token-list membership, case-insensitive — the
    * `rel` attribute's grammar (`rel="alternate canonical"` contains
    * the canonical token; `rel="canonicalish"` does not). */
  private def hasToken(list: String, token: String): Boolean =
    list.split(Array(' ', '\t', '\n', '\r', '\f'))
      .exists(_.equalsIgnoreCase(token))

  /** Robots-directive membership: `content="noindex, nofollow"` is a
    * comma-separated directive list; `none` means noindex+nofollow. */
  private[operators] def robotsNoindex(content: String): Boolean =
    content.split(',').exists { d =>
      val t = d.trim
      t.equalsIgnoreCase("noindex") || t.equalsIgnoreCase("none")
    }

  /** Page-level crawl metadata: canonical URL (with precedence),
    * noindex flag, and declared publish time. */
  final case class PageMeta(canonicalUrl: String, noindex: Boolean,
                            publishedTime: String)

  /** Page-level crawl metadata in ONE walk: the canonical URL (first
    * `<link rel=canonical href>`, falling back to the first
    * `<meta property="og:url" content>` — the precedence every search
    * pipeline applies; null when neither exists), the noindex flag
    * (`<meta name=robots>` whose content lists `noindex` or `none`),
    * and the declared publish time (first
    * `<meta property="article:published_time">`, falling back to the
    * first `<time datetime>` — the temporal-filtering key of every
    * news/blog corpus; raw string, normalization is the caller's
    * bucketing layer). Same skip rules as [[links]]: markup inside
    * comments, CDATA, script/style CODE, and RCDATA title is data, not
    * tags. Null-safe, never throws. The HEADER side of noindex
    * (`X-Robots-Tag`) lives on the HTTP layer — gate on BOTH (see
    * `q_noindex_gate`). */
  def pageMeta(html: String): PageMeta = {
    if (html == null) return PageMeta(null, false, null)
    val n = html.length
    var canonical: String = null
    var ogUrl: String = null
    var published: String = null
    var timeTag: String = null
    var noidx = false
    var i = 0
    while (i < n) {
      if (html.charAt(i) == '<') {
        if (matches(html, i, "<!--")) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (matches(html, i, "<![CDATA[")) {
          val e = html.indexOf("]]>", i + 9)
          i = if (e < 0) n else e + 3
        } else if (openTagAt(html, i, "script"))
          i = skipDropWhole(html, i, "script")
        else if (openTagAt(html, i, "style"))
          i = skipDropWhole(html, i, "style")
        else if (openTagAt(html, i, "title"))
          i = skipDropWhole(html, i, "title")
        else if (openTagAt(html, i, "link")) {
          val rel = attrValue(html, i, "rel")
          if (canonical == null && rel != null &&
            hasToken(rel, "canonical")) {
            val href = attrValue(html, i, "href")
            if (href != null && href.trim.nonEmpty)
              canonical = decodeEntities(href.trim)
          }
          i = tagEnd(html, i + 1)._1
        } else if (openTagAt(html, i, "meta")) {
          val nm = attrValue(html, i, "name")
          if (nm != null && nm.trim.equalsIgnoreCase("robots")) {
            val content = attrValue(html, i, "content")
            if (content != null && robotsNoindex(content)) noidx = true
          } else {
            val prop = attrValue(html, i, "property")
            val p = if (prop == null) "" else prop.trim
            if (ogUrl == null && p.equalsIgnoreCase("og:url")) {
              val c = attrValue(html, i, "content")
              if (c != null && c.trim.nonEmpty) ogUrl = decodeEntities(c.trim)
            } else if (published == null &&
              p.equalsIgnoreCase("article:published_time")) {
              val c = attrValue(html, i, "content")
              if (c != null && c.trim.nonEmpty)
                published = decodeEntities(c.trim)
            }
          }
          i = tagEnd(html, i + 1)._1
        } else if (timeTag == null && openTagAt(html, i, "time")) {
          val dt = attrValue(html, i, "datetime")
          if (dt != null && dt.trim.nonEmpty) timeTag = decodeEntities(dt.trim)
          i = tagEnd(html, i + 1)._1
        } else if (i + 1 < n && (html.charAt(i + 1).isLetter ||
          html.charAt(i + 1) == '/' || html.charAt(i + 1) == '!' ||
          html.charAt(i + 1) == '?'))
          i = tagEnd(html, i + 1)._1
        else i += 1
      } else i += 1
    }
    PageMeta(if (canonical != null) canonical else ogUrl, noidx,
      if (published != null) published else timeTag)
  }

  /** DataFrame form of [[pageMeta]]: appends `canonical_url` (resolved
    * against `baseCol` per RFC 3986 — canonical links are frequently
    * relative; null when the page declares none), `noindex`, and
    * `published_time`. One narrow per-partition pass. */
  def withPageMeta(df: DataFrame, htmlCol: String = "html",
                   baseCol: String = "url"): DataFrame = {
    val hi = df.schema.fieldIndex(htmlCol)
    val bi = df.schema.fieldIndex(baseCol)
    val schema = df.schema
      .add("canonical_url", StringType).add("noindex", BooleanType)
      .add("published_time", StringType)
    df.mapPartitions { it =>
      it.map { row =>
        val m = pageMeta(row.getAs[String](hi))
        val resolved =
          if (m.canonicalUrl == null) null
          else graft.operators.Url.resolve(row.getAs[String](bi),
            m.canonicalUrl)
        Row.fromSeq(row.toSeq :+ resolved :+ m.noindex :+ m.publishedTime)
      }
    }(Encoders.row(schema))
  }

  /** DataFrame outlink explode: one row per `<a href>` with
    * (`link_ix`, `href` raw, `target_url` resolved against `baseCol`
    * via RFC 3986 — the (source, target) edge of the crawl/link
    * graph). Pages without links yield no rows. Narrow per-partition
    * pass. */
  def extractLinks(df: DataFrame, htmlCol: String = "html",
                   baseCol: String = "url"): DataFrame = {
    val hi = df.schema.fieldIndex(htmlCol)
    val bi = df.schema.fieldIndex(baseCol)
    val schema = df.schema
      .add("link_ix", LongType).add("href", StringType)
      .add("target_url", StringType)
    df.mapPartitions { it =>
      it.flatMap { row =>
        val base = row.getAs[String](bi)
        links(row.getAs[String](hi)).iterator.zipWithIndex.map {
          case (href, ix) =>
            Row.fromSeq(row.toSeq :+ ix.toLong :+ href :+
              graft.operators.Url.resolve(base, href))
        }
      }
    }(Encoders.row(schema))
  }

  /** Main-content text: the [[blocks]] that read as prose rather than
    * chrome — at least `minChars` of visible text AND anchor-text
    * density of at most one third (`linkChars * 3 <= chars`; a cookie
    * banner or a "related links" box is mostly anchor text, a paragraph
    * is not) — joined with newlines. The landmark scopes (`nav`,
    * `footer`, `header`, `aside`) are already gone at this layer. The
    * thresholds are the classic text-density heuristic (jusText /
    * boilerpipe family) reduced to its deterministic core: local,
    * reproducible, no trained model. */
  def mainText(html: String, minChars: Int = 25): String = {
    val kept = blocks(html).iterator.filter { b =>
      b.text.length >= minChars && b.linkChars * 3 <= b.text.length
    }
    kept.map(_.text).mkString("\n")
  }

  /** DataFrame form of [[mainText]]: appends `main_text` — one narrow
    * per-partition pass, no shuffle, same scan as the ingest chain. */
  def extractMain(df: DataFrame, htmlCol: String = "html",
                  minChars: Int = 25): DataFrame = {
    val hi = df.schema.fieldIndex(htmlCol)
    val schema = df.schema.add("main_text", StringType)
    df.mapPartitions { it =>
      it.map { row =>
        Row.fromSeq(row.toSeq :+ mainText(row.getAs[String](hi), minChars))
      }
    }(Encoders.row(schema))
  }

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
