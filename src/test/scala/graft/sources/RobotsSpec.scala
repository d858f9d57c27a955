package graft.sources

import graft.SparkSpec

/** RFC 9309 contract: group collection + merging, `*`/`$` pattern
  * semantics, most-octets precedence with Allow winning ties, the
  * allowed-by-default rule, crawl-delay/sitemap extraction, and
  * hostile input never throwing. */
class RobotsSpec extends SparkSpec {

  private val Fixture =
    """# corpus policy
      |User-agent: graftbot
      |Disallow: /private/
      |Allow: /private/public/
      |Disallow: /*.pdf$
      |Crawl-delay: 2
      |
      |User-agent: *
      |Disallow: /
      |
      |Sitemap: https://example.org/sitemap.xml
      |""".stripMargin

  test("parse: groups, merging, crawl-delay, sitemaps, junk tolerance") {
    val r = Robots.parse(Fixture)
    assert(r.groups.keySet === Set("graftbot", "*"))
    assert(r.groups("graftbot").rules.size === 3)
    assert(r.groups("graftbot").crawlDelay === Some(2.0))
    assert(r.groups("*").rules === Seq(Robots.Rule(false, "/")))
    assert(r.sitemaps === Seq("https://example.org/sitemap.xml"))
    // Consecutive user-agent lines share one rule block; a second group
    // for the SAME agent merges (RFC 9309 §2.2.1).
    val multi = Robots.parse(
      "User-agent: a\nUser-agent: b\nDisallow: /x\n\n" +
        "User-agent: a\nDisallow: /y\n")
    assert(multi.groups("a").rules.map(_.pattern) === Seq("/x", "/y"))
    assert(multi.groups("b").rules.map(_.pattern) === Seq("/x"))
    // Rules before any user-agent line are dropped; junk lines, empty
    // patterns (classic 'Disallow:'), and garbage never throw.
    val junk = Robots.parse(
      "Disallow: /orphan\nUser-agent: a\nDisallow:\nnonsense line\n" +
        "Unknown-Key: v\nCrawl-delay: wat\n")
    assert(junk.groups("a").rules.isEmpty)
    assert(junk.groups("a").crawlDelay === None)
    assert(Robots.parse(null) === Robots.Empty)
    assert(Robots.parse("") === Robots.Empty)
  }

  test("matches: prefix, *, $, and their compositions") {
    assert(Robots.matches("/private/", "/private/x.html"))
    assert(!Robots.matches("/private/", "/other/"))
    assert(Robots.matches("/*.pdf$", "/docs/a.pdf"))
    assert(!Robots.matches("/*.pdf$", "/docs/a.pdfx"))
    assert(Robots.matches("/a*b", "/aXXb-tail"))
    assert(Robots.matches("/a*b$", "/aXXb"))
    assert(!Robots.matches("/a*b$", "/aXXbY"))
    assert(Robots.matches("/p$", "/p") && !Robots.matches("/p$", "/pq"))
    // Multiple wildcards; earliest middle placement leaves maximal room.
    assert(Robots.matches("/x*ab*b$", "/xabb"))
    assert(!Robots.matches("/x*aa*aa$", "/xaaa"))
    assert(Robots.matches("/*", "/anything"))
    assert(!Robots.matches(null, "/p") && !Robots.matches("/p", null))
  }

  test("isAllowed: most-octets precedence, Allow ties, default-allow") {
    val r = Robots.parse(Fixture)
    assert(Robots.isAllowed(r, "graftbot", "/articles/x.html"))
    assert(!Robots.isAllowed(r, "graftbot", "/private/x.html"))
    // Allow (16 octets) beats Disallow /private/ (9).
    assert(Robots.isAllowed(r, "graftbot", "/private/public/x.html"))
    assert(!Robots.isAllowed(r, "graftbot", "/docs/a.pdf"))
    // The 16-octet Allow beats the 7-octet /*.pdf$ Disallow.
    assert(Robots.isAllowed(r, "graftbot", "/private/public/a.pdf"))
    // Unknown agents fall to the * group (Disallow: /).
    assert(!Robots.isAllowed(r, "otherbot", "/anything"))
    // Agent lookup is case-insensitive on the product token.
    assert(!Robots.isAllowed(r, "GraftBot", "/private/x.html"))
    // No applicable group at all → allowed (protocol default).
    val own = Robots.parse("User-agent: someone\nDisallow: /\n")
    assert(Robots.isAllowed(own, "graftbot", "/x"))
    assert(Robots.isAllowed(Robots.Empty, "graftbot", "/x"))
    // Equal-length Allow/Disallow tie → Allow wins (RFC 9309 §2.2.2).
    val tie = Robots.parse(
      "User-agent: a\nDisallow: /dir/\nAllow: /dir2$\n" +
        "User-agent: a\nAllow: /dir/\n")
    assert(Robots.isAllowed(tie, "a", "/dir/x"))
    assert(Robots.crawlDelay(r, "graftbot") === Some(2.0))
    assert(Robots.crawlDelay(r, "otherbot") === None)
  }

  test("withAllowed: per-partition parse cache, DataFrame form") {
    val sparkSession = spark
    import sparkSession.implicits._
    val df = Seq(
      (1L, Fixture, "/articles/a.html"),
      (2L, Fixture, "/private/b.html"),
      (3L, "User-agent: *\nAllow: /\n", "/private/b.html"),
      (4L, null.asInstanceOf[String], "/anything")
    ).toDF("id", "robots", "path")
    val out = Robots.withAllowed(df, "robots", "path", "graftbot")
      .selectExpr("id", "allowed", "crawl_delay").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), Option(r.get(2)))))
      .toMap
    assert(out(1L) === ((true, Some(2.0))))
    assert(out(2L) === ((false, Some(2.0))))
    assert(out(3L) === ((true, None)))
    assert(out(4L) === ((true, None))) // no robots → allowed
  }
}
