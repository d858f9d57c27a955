package graft.sources

import graft.SparkSpec

/** Sitemap parsing contract: urlset/index detection, loc+lastmod
  * extraction, XML entity decode, lenient damage handling, gzip
  * auto-detection, and the coded failure row. */
class SitemapsSpec extends SparkSpec {

  private val UrlSet =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |<url><loc>https://a.org/p1</loc><lastmod>2024-01-02</lastmod></url>
      |<url><loc> https://a.org/p2?x=1&amp;y=2 </loc></url>
      |<url><priority>0.5</priority></url>
      |</urlset>""".stripMargin

  test("parse: urlset entries, lastmod, entity decode, loc-less blocks skipped") {
    val es = Sitemaps.parse(UrlSet)
    assert(es === Seq(
      Sitemaps.Entry("https://a.org/p1", Some("2024-01-02")),
      Sitemaps.Entry("https://a.org/p2?x=1&y=2", None)))
    assert(!Sitemaps.isIndex(UrlSet))
    // <locale> is not a <loc>; <sitemapindex> flips the block tag.
    assert(Sitemaps.parse(
      "<urlset><url><locale>x</locale><loc>https://b</loc></url></urlset>")
      === Seq(Sitemaps.Entry("https://b", None)))
    val idx = "<sitemapindex><sitemap><loc>https://a.org/s1.xml</loc>" +
      "</sitemap><sitemap><loc>https://a.org/s2.xml</loc></sitemap>" +
      "</sitemapindex>"
    assert(Sitemaps.isIndex(idx))
    assert(Sitemaps.parse(idx).map(_.loc) ===
      Seq("https://a.org/s1.xml", "https://a.org/s2.xml"))
    // isIndex is decided by the ROOT element: a urlset whose page text
    // merely mentions '<sitemapindex' must keep the <url> block tag.
    val mentions = "<?xml version=\"1.0\"?><!-- <sitemapindex> --><urlset>" +
      "<url><loc>https://a.org/docs-about-&lt;sitemapindex&gt;</loc></url>" +
      "<url><loc>https://a.org/p&amp;q</loc><note><sitemapindex/></note>" +
      "</url></urlset>"
    assert(!Sitemaps.isIndex(mentions))
    assert(Sitemaps.parse(mentions).map(_.loc) ===
      Seq("https://a.org/docs-about-<sitemapindex>", "https://a.org/p&q"))
    // CDATA-wrapped <loc>: literal content, no entity decode inside.
    assert(Sitemaps.parse(
      "<urlset><url><loc><![CDATA[https://a.org/x?a=1&b=2]]></loc></url>" +
        "</urlset>").map(_.loc) === Seq("https://a.org/x?a=1&b=2"))
    // Uppercase/mixed-case tags: open tags matched case-insensitively,
    // so the CLOSE-tag scan must be too — else N entries collapse to 1.
    assert(Sitemaps.parse(
      "<URLSET><URL><LOC>https://a/1</LOC></URL>" +
        "<Url><Loc>https://a/2</Loc></Url></URLSET>").map(_.loc) ===
      Seq("https://a/1", "https://a/2"))
  }

  test("parse: truncated/hostile input degrades, never throws") {
    assert(Sitemaps.parse(null) === Nil)
    assert(Sitemaps.parse("") === Nil)
    assert(Sitemaps.parse("not xml at all") === Nil)
    // Truncated mid-block: the complete entries survive.
    val trunc = "<urlset><url><loc>https://a/1</loc></url><url><loc>htt"
    assert(Sitemaps.parse(trunc).map(_.loc) === Seq("https://a/1"))
    val rnd = new scala.util.Random(17)
    for (_ <- 1 to 200) {
      val cs = Array.fill(rnd.nextInt(200))(
        "<>&;/locurlsitemap ".charAt(rnd.nextInt(19)))
      Sitemaps.parse(new String(cs)) // must not throw
    }
    // Numeric refs decode; unknown entities stay literal.
    assert(Sitemaps.unescape("a&#65;&#x42;&amp;&nope;") === "aAB&&nope;")
  }

  test("entries: DataFrame explode, gzip auto-detect, coded failure row") {
    val sparkSession = spark
    import sparkSession.implicits._
    val plain = UrlSet.getBytes("UTF-8")
    val gz = WarcPack.gzipBytes(plain)
    val df = Seq((1L, plain), (2L, gz), (3L, "garbage".getBytes("UTF-8")))
      .toDF("id", "bytes")
    val out = Sitemaps.entries(df)
      .selectExpr("id", "entry_ix", "loc", "is_index").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), Option(r.get(3)))))
      .toMap
    assert(out((1L, 0L)) === (("https://a.org/p1", Some(false))))
    assert(out((2L, 1L)) === (("https://a.org/p2?x=1&y=2", Some(false))))
    assert(out((3L, -1L)) === ((null, None)))
    assert(out.size === 5)
  }
}
