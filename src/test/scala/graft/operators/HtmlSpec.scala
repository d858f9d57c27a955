package graft.operators

import graft.SparkSpec

/** The HTML state machine's contract: hand-built pages extract to exact
  * text, the drop-whole elements (script/style/title) swallow embedded
  * markup, quoted attributes hide '>', entities decode exactly once,
  * malformed/hostile markup degrades cleanly, and nothing ever throws. */
class HtmlSpec extends SparkSpec {

  test("extractText: tags, drop-whole elements, comments, quoted attrs") {
    assert(Html.extractText(
      "<html><body><p>Hello <b>world</b></p></body></html>") ===
      "Hello world")
    // script/style content is CODE — dropped whole, embedded tags and
    // all; title is head metadata.
    assert(Html.extractText(
      "<head><title>T</title><script>var a = '<p>no</p>';</script>" +
        "<style>p > em { }</style></head><body>yes</body>") === "yes")
    // Case-insensitive close tags; attributes on the close-scan target.
    assert(Html.extractText(
      "<SCRIPT type=\"x\">code</SCRIPT>after") === "after")
    // A '>' inside a quoted attribute does not end the tag.
    assert(Html.extractText("<a title=\"1 > 0\">link</a>") === "link")
    assert(Html.extractText("<a title='1 > 0'>link</a>") === "link")
    // Comments and CDATA drop; bare '<' not starting a tag is text.
    assert(Html.extractText("a <!-- <b>x</b> --> b") === "a b")
    assert(Html.extractText("a <![CDATA[ <raw> ]]> b") === "a b")
    assert(Html.extractText("1 < 2 and 3 > 2") === "1 < 2 and 3 > 2")
    // Tag boundaries separate words; whitespace collapses and trims.
    assert(Html.extractText("  <p>a</p><p>b</p>\n\t ") === "a b")
  }

  test("extractText: entities decode exactly once; invalid forms stay literal") {
    assert(Html.extractText("&lt;tag&gt; &amp; &quot;q&quot; &apos;a&apos;") ===
      "<tag> & \"q\" 'a'")
    assert(Html.extractText("&#65;&#x42;&#X43;") === "ABC")
    assert(Html.extractText("x&nbsp;y") === "x y")
    // Double-encoded: &amp;lt; decodes ONCE to the literal '&lt;'.
    assert(Html.extractText("&amp;lt;") === "&lt;")
    // Unknown, unterminated, out-of-range → literal ampersand, text kept.
    assert(Html.extractText("&unknown; &#; &# &") === "&unknown; &#; &# &")
    assert(Html.extractText("&#1;") === "&#1;") // control chars refused
    // A decoded '<' is TEXT, not markup (no double-parse injection).
    assert(Html.extractText("&lt;script&gt;alert(1)&lt;/script&gt;") ===
      "<script>alert(1)</script>")
  }

  test("entities: WHATWG astral/cp1252/named/legacy forms (r10 verdict #3)") {
    // Astral numeric references — every emoji — emit the surrogate pair.
    assert(Html.extractText("&#128512;") === "😀")
    assert(Html.extractText("a&#x1F600;b") === "a😀b")
    // The WHATWG C1→windows-1252 numeric remap: &#146; is an apostrophe,
    // &#151; an em-dash, &#133; an ellipsis; the 5 cp1252 holes refuse.
    assert(Html.extractText("it&#146;s") === "it’s")
    assert(Html.extractText("a&#151;b &#133;") === "a—b …")
    assert(Html.extractText("&#129;") === "&#129;")
    // TAB/LF/CR numeric refs are legal whitespace, collapsed like any.
    assert(Html.extractText("x&#10;y") === "x y")
    assert(Html.extractText("x&#9;&#13;y") === "x y")
    // Surrogate / past-Unicode / NUL / DEL refs stay literal.
    assert(Html.extractText("&#xD800;") === "&#xD800;")
    assert(Html.extractText("&#1114112;") === "&#1114112;") // 0x110000
    assert(Html.extractText("&#0;") === "&#0;")
    assert(Html.extractText("&#127;") === "&#127;")
    // Extended named set: punctuation, Latin-1, Greek, math.
    assert(Html.extractText("A&mdash;B&ndash;C") === "A—B–C")
    assert(Html.extractText("&ldquo;q&rdquo;&hellip;") ===
      "“q”…")
    assert(Html.extractText("caf&eacute; &Eacute;") === "café É")
    assert(Html.extractText("&alpha;&Omega;&sigma;&sigmaf;") ===
      "αΩσς")
    assert(Html.extractText("&le;&ne;&rarr;&euro;&frac12;") ===
      "≤≠→€½")
    assert(Html.extractText("&AElig;&szlig;&THORN;&yuml;&Yuml;") ===
      "ÆßÞÿŸ")
    // Corpus normalizations: nbsp-family → plain space, shy removed —
    // numeric and named forms identically.
    assert(Html.extractText("x&#160;y") === "x y")
    assert(Html.extractText("x&ensp;y&thinsp;z") === "x y z")
    assert(Html.extractText("hy&shy;phen&#173;ate") === "hyphenate")
    // Legacy no-semicolon forms decode in text content (case-insensitive
    // like the browser tables); unknown names that START with a legacy
    // name decode the prefix, exactly as the longest-match tokenizer does.
    assert(Html.extractText("a &amp b") === "a & b")
    assert(Html.extractText("&copy 2024 &reg &AMP") === "© 2024 ® &")
    assert(Html.extractText("1 &lt 2 &gt 0") === "1 < 2 > 0")
    assert(Html.extractText("&ampx;") === "&x;")
    // Decode-once still holds with the legacy forms in play.
    assert(Html.extractText("&amp;amp;") === "&amp;")
    assert(Html.extractText("&amp;mdash;") === "&mdash;")
    // Named lookup is case-sensitive outside the legacy set.
    assert(Html.extractText("&MDASH;") === "&MDASH;")
    // Uppercase SEMICOLON forms of the legacy set are real WHATWG
    // entities — the ';' must be consumed, not left as stray text.
    assert(Html.extractText("1 &LT; 2 &GT; 0") === "1 < 2 > 0")
    assert(Html.extractText("&COPY; &REG; &AMP; &QUOT;q&QUOT;") ===
      "© ® & \"q\"")
    // …but ONLY all-uppercase and only for the six names the WHATWG
    // table defines: &NBSP;/&APOS;/mixed case render literally in every
    // browser (and must not half-decode leaving a stray ';').
    assert(Html.extractText("&NBSP;x&APOS;y&AmP;z") === "&NBSP;x&APOS;y&AmP;z")
  }

  test("extractText/title: hostile + malformed inputs degrade cleanly, never throw") {
    assert(Html.extractText(null) === "")
    assert(Html.extractText("") === "")
    // Unterminated constructs drop the malformed tail, keep the prefix.
    assert(Html.extractText("keep <script>never closed") === "keep")
    assert(Html.extractText("keep <!-- never closed") === "keep")
    assert(Html.extractText("keep <a href=\"never closed") === "keep")
    // O(n) on pathological inputs a regex stripper would backtrack on.
    val hostile = "<a b=\"" + "x" * 100000 + "\">t</a>" + "<p>" * 10000
    assert(Html.extractText(hostile) === "t")
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 300) {
      val cs = Array.fill(rnd.nextInt(300))(
        "<>&;\"' ab#x/!-".charAt(rnd.nextInt(14)))
      Html.extractText(new String(cs)) // must not throw
      Html.title(new String(cs)) // must not throw
    }
    // Title: extracted via the same machine, None when absent/empty.
    assert(Html.title("<title>A &amp; B</title>") === Some("A & B"))
    assert(Html.title("<TITLE lang=\"en\">t</TITLE>") === Some("t"))
    assert(Html.title("<title></title>") === None)
    assert(Html.title("no title") === None)
  }

  test("review pins: name boundaries, quoted close tags, title via the same walk") {
    // Custom elements whose names merely START with a drop-name are NOT
    // swallowed (r10 review: <title-bar> content vanished).
    assert(Html.extractText("<title-bar>Breaking</title-bar> body") ===
      "Breaking body")
    assert(Html.extractText("<styled-div>x</styled-div>") === "x")
    // The close tag needs the same boundary: '</scripts>' is NOT the
    // close of a <script> element.
    assert(Html.extractText("<script>a</scripts>b</script>c") === "c")
    // A close-tag string INSIDE the open tag's quoted attribute is data
    // (r10 review: script code leaked into the text).
    assert(Html.extractText(
      "<script src=\"a</script>\">code</script>after") === "after")
    // Self-closing drop-elements have no content to skip.
    assert(Html.extractText("<script src=\"x\"/>after") === "after")
    // The title comes from the same machine walk: '<title>' inside
    // script CODE is data; attribute '>' inside quotes is honored; a
    // length-changing lowercase char (U+0130) before the title cannot
    // misalign anything (r10 review: all three produced wrong titles).
    assert(Html.title("<script>document.title = \"<title>fake</title>\";" +
      "</script><title>Real</title>") === Some("Real"))
    assert(Html.title("<title data-x=\"a>b\">T</title>") === Some("T"))
    assert(Html.title("<p>İstanbul</p><title>Real Title</title>") ===
      Some("Real Title"))
    assert(Html.extractText("<p>İstanbul</p><title>Real Title</title>") ===
      "İstanbul")
    // Non-WHATWG numeric forms stay literal: non-ASCII digits, signs.
    assert(Html.extractText("&#٦٥;") === "&#٦٥;")
    assert(Html.extractText("&#x+41;") === "&#x+41;")
    // A nested-title bomb cannot grow the stack (capture recurses ONCE
    // with capture off).
    val bomb = "<title>" * 2000 + "x" + "</title>" * 2000
    assert(Html.extractText(bomb) === "") // all inside the first title
    assert(Html.title(bomb).nonEmpty)
  }

  test("blocks/mainText: landmark scopes dropped, link-density chrome filtered") {
    val page = "<html><head><title>T</title><style>p{}</style></head><body>" +
      "<nav><a href=\"/\">Home</a> <a href=\"/a\">About</a></nav>" +
      "<header><h1>Site Name</h1></header>" +
      "<div>We use cookies <a href=\"#\">Accept</a> " +
      "<a href=\"#\">Decline</a></div>" +
      "<p>This paragraph is the actual article body of the page.</p>" +
      "<div>Share</div>" +
      "<footer>© 2024 Example Corp</footer></body></html>"
    val bs = Html.blocks(page)
    // nav/header/footer content never reaches a block.
    assert(!bs.exists(_.text.contains("Home")))
    assert(!bs.exists(_.text.contains("Site Name")))
    assert(!bs.exists(_.text.contains("Example Corp")))
    // The cookie banner block counts its anchor text exactly.
    val banner = bs.find(_.text.startsWith("We use cookies")).get
    assert(banner.text === "We use cookies Accept Decline")
    assert(banner.linkChars === 13) // "Accept" + "Decline"
    // minChars drops "Share"; link density drops the banner; the
    // article paragraph is the only survivor.
    assert(Html.mainText(page) ===
      "This paragraph is the actual article body of the page.")
    // Nested landmark scopes are depth-counted; stray closes floor at 0.
    assert(Html.mainText("<aside><nav><a>x</a></nav>junk</aside>" +
      "<p>Real content paragraph here ok</p>") ===
      "Real content paragraph here ok")
    assert(Html.mainText("</nav></footer>" +
      "<p>Real content paragraph here ok</p>") ===
      "Real content paragraph here ok")
    // Multiple kept blocks join with newlines, in document order.
    assert(Html.mainText(
      "<p>First real paragraph with enough characters.</p>" +
        "<p>Second real paragraph with enough characters.</p>") ===
      "First real paragraph with enough characters.\n" +
        "Second real paragraph with enough characters.")
    // Mostly-anchor blocks are dropped even when long.
    assert(Html.mainText("<div><a>A long list of related article " +
      "links goes here</a> x</div>") === "")
    // An <a> wrapping whole blocks (click-anywhere card links) marks
    // them ALL as anchor text; the next <a> open implicitly closes a
    // sloppy unclosed one (browsers forbid nested anchors).
    val card = Html.blocks("<a href=\"/x\"><div>Card title</div>" +
      "<div>Card description text</div></a>")
    assert(card.nonEmpty &&
      card.forall(b => b.linkChars === b.text.count(_ != ' ')))
    val sloppy = Html.blocks("<p><a href=\"#\">one</p>" +
      "<p><a href=\"#\">two</a> free text</p>")
    assert(sloppy.last.text === "two free text" &&
      sloppy.last.linkChars === 3)
    // Null / hostile safety; script/style/comment still dropped whole.
    assert(Html.blocks(null).isEmpty && Html.mainText(null) === "")
    assert(Html.mainText("<script>var x = '<p>no</p>';</script>" +
      "<p>Real content paragraph here ok</p>") ===
      "Real content paragraph here ok")
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 300) {
      val cs = Array.fill(rnd.nextInt(300))(
        "<>&;\"' abnav#x/!-".charAt(rnd.nextInt(17)))
      Html.blocks(new String(cs)) // must not throw
    }
  }

  test("links: href extraction — quotes, entities, code exclusion, attr boundaries") {
    val page = "<a href=\"/one\">1</a>" +
      "<a class=\"x\" HREF='two.html'>2</a>" +
      "<a href=three>3</a>" + // bare value
      "<a href=\"?a=1&amp;b=2\">4</a>" + // entity in query
      "<a href=\"?x=1&copy=2\">5</a>" + // attr context: NOT ©
      "<script>var a = '<a href=\"/code\">no</a>';</script>" +
      "<!-- <a href=\"/comment\">no</a> -->" +
      "<a data-href=\"/not-href\">6</a>" + // boundary: not an href
      "<a href=\"/q>r\">7</a>" + // '>' inside quotes is data
      "<a name=\"anchor\">8</a>" // no href at all
    assert(Html.links(page) === Vector("/one", "two.html", "three",
      "?a=1&b=2", "?x=1&copy=2", "/q>r"))
    assert(Html.links(null).isEmpty)
    assert(Html.links("no links here").isEmpty)
    assert(Html.links("<a href=\"unterminated") === Vector.empty)
    // Missing-whitespace-between-attributes (recoverable parse error —
    // browsers read href="/target" here).
    assert(Html.links("<a class=\"x\"href=\"/target\">t</a>") ===
      Vector("/target"))
    assert(Html.links("<a rel='nofollow'href='/n'>t</a>") === Vector("/n"))
    // <title> is RCDATA: an '<a href' inside it is literal text, not a
    // link, to every browser.
    assert(Html.links(
      "<title>Read <a href=\"/phantom\">this</a></title>" +
        "<body><a href=\"/real\">r</a></body>") === Vector("/real"))
    val rnd = new scala.util.Random(19)
    for (_ <- 1 to 300) {
      val cs = Array.fill(rnd.nextInt(300))(
        "<>&;\"'= ahref/!-".charAt(rnd.nextInt(16)))
      Html.links(new String(cs)) // must not throw
    }
  }

  test("pageMeta: canonical precedence, rel token list, og:url fallback, noindex, dates") {
    // link rel=canonical wins over og:url; rel is a TOKEN LIST.
    assert(Html.pageMeta(
      "<link rel=\"alternate canonical\" href=\"/c\">" +
        "<meta property=\"og:url\" content=\"https://decoy/x\">") ===
      Html.PageMeta("/c", false, null))
    // og:url is the fallback when no canonical link exists.
    assert(Html.pageMeta(
      "<meta property=\"OG:URL\" content=\"https://real/y\">") ===
      Html.PageMeta("https://real/y", false, null))
    // rel="canonicalish" is NOT the canonical token; first canonical wins.
    assert(Html.pageMeta(
      "<link rel=\"canonicalish\" href=\"/no\">" +
        "<link rel=canonical href=\"/first\">" +
        "<link rel=canonical href=\"/second\">") ===
      Html.PageMeta("/first", false, null))
    // Canonicals inside comments and script CODE are data, not tags.
    assert(Html.pageMeta(
      "<!-- <link rel=canonical href=\"/evil\"> -->" +
        "<script>var s='<link rel=canonical href=\"/js\">';</script>") ===
      Html.PageMeta(null, false, null))
    // Robots directives: comma list, case-insensitive, 'none' implies
    // noindex; plain index/follow does not.
    assert(Html.pageMeta(
      "<meta name=\"robots\" content=\"noindex, nofollow\">").noindex)
    assert(Html.pageMeta(
      "<meta name=\"ROBOTS\" content=\" NONE \">").noindex)
    assert(!Html.pageMeta(
      "<meta name=\"robots\" content=\"index, follow\">").noindex)
    // name=robots only — a description meta mentioning noindex is text.
    assert(!Html.pageMeta(
      "<meta name=\"description\" content=\"noindex tips\">").noindex)
    // Publish time: article:published_time wins over <time datetime>;
    // the time tag is the fallback; timeless pages stay null.
    assert(Html.pageMeta(
      "<meta property=\"article:published_time\" content=\"2024-03-01T10:00:00Z\">" +
        "<time datetime=\"1999-01-01\">old</time>").publishedTime ===
      "2024-03-01T10:00:00Z")
    assert(Html.pageMeta(
      "<p>posted <time datetime=\"2023-07-04\">July 4</time></p>")
      .publishedTime === "2023-07-04")
    assert(Html.pageMeta("<p>undated</p>").publishedTime === null)
    assert(Html.pageMeta(null) === Html.PageMeta(null, false, null))
    assert(Html.pageMeta("") === Html.PageMeta(null, false, null))
  }

  test("jsonLd: type-essence match, plain scripts skipped, close-tag rules") {
    val page = "<script type=\"application/ld+json\">{\"a\":1}</script>" +
      "<script type=\"APPLICATION/LD+JSON; charset=utf-8\"> {\"b\":2} </script>" +
      "<script type=\"text/javascript\">{\"no\":0}</script>" +
      "<script>{\"untyped\":0}</script>"
    assert(Html.jsonLd(page) === Vector("{\"a\":1}", "{\"b\":2}"))
    // '</scriptx' is NOT a close tag (name boundary); a real '</script>'
    // closes even inside a JSON string — the HTML parser's rule.
    assert(Html.jsonLd(
      "<script type=\"application/ld+json\">{\"s\":\"a</scriptx b\"}</script>") ===
      Vector("{\"s\":\"a</scriptx b\"}"))
    // Unterminated block: malformed tail, dropped — never captured to EOF.
    assert(Html.jsonLd(
      "<script type=\"application/ld+json\">{\"cut\":").isEmpty)
    assert(Html.jsonLd(null).isEmpty)
    assert(Html.jsonLd("<!-- <script type=\"application/ld+json\">x</script> -->")
      .isEmpty)
  }

  test("extractLinks: DataFrame explode resolves against the page URL") {
    val sparkSession = spark
    import sparkSession.implicits._
    val out = Html.extractLinks(Seq(
        (1L, "https://e.org/a/p.html",
          "<a href=\"x.html\">x</a><a href=\"/y\">y</a>"),
        (2L, "https://e.org/", "no links")
      ).toDF("id", "url", "html"), "html", "url")
      .selectExpr("id", "link_ix", "href", "target_url").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getString(3)))).toMap
    assert(out((1L, 0L)) === (("x.html", "https://e.org/a/x.html")))
    assert(out((1L, 1L)) === (("/y", "https://e.org/y")))
    assert(out.size === 2) // linkless pages yield no rows
  }

  test("extract: DataFrame form appends title + text in one narrow pass") {
    val sparkSession = spark
    import sparkSession.implicits._
    val out = Html.extract(Seq(
        (1L, "<html><head><title>T1</title></head><body>b1</body></html>"),
        (2L, "plain, no markup")).toDF("id", "html"))
      .select("id", "title", "text").collect()
      .map(r => r.getLong(0) -> ((Option(r.getString(1)), r.getString(2))))
      .toMap
    assert(out(1L) === ((Some("T1"), "b1")))
    assert(out(2L) === ((None, "plain, no markup")))
  }
}
