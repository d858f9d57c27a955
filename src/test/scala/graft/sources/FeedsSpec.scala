package graft.sources

import graft.SparkSpec

/** Feed parsing contract: RSS item text-links vs Atom href-attribute
  * links (rel precedence), published/updated fallback, entity decode,
  * lenient damage handling, and the never-throws guarantee. */
class FeedsSpec extends SparkSpec {

  test("RSS 2.0: items, text links, pubDate, entities") {
    val rss = "<rss version=\"2.0\"><channel><title>c</title>" +
      "<item><title>A &amp; B</title><link>https://x/1</link>" +
      "<pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate></item>" +
      "<item><title>no date</title><link>https://x/2?a=1&amp;b=2</link></item>" +
      "<item><title>linkless — skipped</title></item>" +
      "</channel></rss>"
    assert(Feeds.parse(rss) === Seq(
      Feeds.Entry("A & B", "https://x/1",
        Some("Mon, 01 Jan 2024 00:00:00 GMT")),
      Feeds.Entry("no date", "https://x/2?a=1&b=2", None)))
    assert(!Feeds.isAtom(rss))
  }

  test("Atom: href attributes, rel precedence, published/updated fallback") {
    val atom = "<feed xmlns=\"http://www.w3.org/2005/Atom\">" +
      "<link rel=\"self\" href=\"https://x/feed\"/>" +
      "<entry><title>t1</title>" +
      "<link rel=\"self\" href=\"https://x/decoy\"/>" +
      "<link href=\"https://x/e1\"/>" +
      "<published>2024-01-01T00:00:00Z</published></entry>" +
      "<entry><title>t2</title>" +
      "<link rel=\"alternate\" href=\"https://x/e2\"/>" +
      "<updated>2024-02-02T00:00:00Z</updated></entry>" +
      "</feed>"
    assert(Feeds.parse(atom) === Seq(
      Feeds.Entry("t1", "https://x/e1", Some("2024-01-01T00:00:00Z")),
      Feeds.Entry("t2", "https://x/e2", Some("2024-02-02T00:00:00Z"))))
    assert(Feeds.isAtom(atom))
  }

  test("isAtom is decided by the ROOT element; data-rel is not a rel") {
    // An RSS feed MENTIONING '<feed' in content must stay RSS.
    val rss = "<?xml version=\"1.0\"?><rss><channel>" +
      "<item><title>about &lt;feed&gt; and <feed></title>" +
      "<link>https://x/1</link></item></channel></rss>"
    assert(!Feeds.isAtom(rss))
    assert(Feeds.parse(rss).map(_.link) === Seq("https://x/1"))
    // Root detection skips prolog/doctype/comments.
    assert(Feeds.isAtom("<?xml version=\"1.0\"?><!-- c --><feed>"))
    assert(!Feeds.isAtom("<feedlike>")) // name boundary
    // 'data-rel' must not match 'rel': the unmarked link IS the
    // alternate and must win despite the decoy attribute.
    val atom = "<feed><entry><title>t</title>" +
      "<link data-rel=\"self\" href=\"https://x/page\"/></entry></feed>"
    assert(Feeds.parse(atom).map(_.link) === Seq("https://x/page"))
    // A name inside another attribute's quoted VALUE is data.
    val tricky = "<feed><entry><title>t</title>" +
      "<link title=\"rel=self stuff\" href=\"https://x/k\"/></entry></feed>"
    assert(Feeds.parse(tricky).map(_.link) === Seq("https://x/k"))
  }

  test("CDATA-wrapped titles and links unwrap to literal content") {
    // RSS very commonly wraps <link>/<title> in <![CDATA[...]]> — the
    // section content is LITERAL: no entity decode inside, and a '</'
    // inside the section must not truncate the child.
    val rss = "<rss><channel>" +
      "<item><title><![CDATA[Tom & Jerry </b> &amp; co]]></title>" +
      "<link><![CDATA[https://x/1?a=1&b=2]]></link></item>" +
      "<item><title> <![CDATA[ws before CDATA]]> </title>" +
      "<link>https://x/2</link></item>" +
      "<item><title>unterminated</title>" +
      "<link><![CDATA[https://x/broken</link></item>" +
      "</channel></rss>"
    val out = Feeds.parse(rss)
    assert(out.head === Feeds.Entry("Tom & Jerry </b> &amp; co",
      "https://x/1?a=1&b=2", None))
    assert(out(1).title === "ws before CDATA")
    // Unterminated CDATA degrades to the plain scan (never throws).
    assert(out.length >= 2)
  }

  test("rfc822ToIso: RFC 822/1123 forms, zones, two-digit years, garbage") {
    assert(Feeds.rfc822ToIso("Mon, 01 Jan 2024 13:05:07 GMT") ===
      "2024-01-01T13:05:07Z")
    assert(Feeds.rfc822ToIso("1 Feb 2024 08:00 +0530") === // no DoW, no secs
      "2024-02-01T08:00:00+05:30")
    assert(Feeds.rfc822ToIso("Tue, 31 Dec 2024 23:59:59 EST") ===
      "2024-12-31T23:59:59-05:00")
    assert(Feeds.rfc822ToIso("Wed, 02 Oct 02 15:00:00 UT") === // 2-digit year
      "2002-10-02T15:00:00Z")
    assert(Feeds.rfc822ToIso("Thu, 05 Mar 98 10:00:00 GMT") ===
      "1998-03-05T10:00:00Z")
    assert(Feeds.rfc822ToIso("Sat, 07 Sep 2024 12:00:00") === // zone absent
      "2024-09-07T12:00:00")
    assert(Feeds.rfc822ToIso("not a date") === null)
    assert(Feeds.rfc822ToIso("99 Xyz 2024 10:00:00 GMT") === null)
    assert(Feeds.rfc822ToIso(null) === null)
  }

  test("hostile/truncated input degrades, never throws") {
    assert(Feeds.parse(null) === Nil)
    assert(Feeds.parse("") === Nil)
    assert(Feeds.parse("not xml") === Nil)
    val trunc = "<rss><channel><item><link>https://a/1</link></item>" +
      "<item><link>htt"
    assert(Feeds.parse(trunc).map(_.link) === Seq("https://a/1"))
    val rnd = new scala.util.Random(29)
    for (_ <- 1 to 200) {
      val cs = Array.fill(rnd.nextInt(200))(
        "<>&;/feditmlnkhrpub= \"".charAt(rnd.nextInt(22)))
      Feeds.parse(new String(cs)) // must not throw
    }
  }
}
