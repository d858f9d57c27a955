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
