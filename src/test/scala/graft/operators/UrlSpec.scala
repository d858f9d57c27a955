package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** URL operator contract: lenient parse on crawl-grade garbage, the
  * RFC 3986 normalizations, tracking-param stripping, the eTLD+1
  * approximation, and the DataFrame forms. */
class UrlSpec extends SparkSpec {

  test("parse: lenient split, userinfo, ports, IPv6; non-hierarchical → None") {
    val p = Url.parse("https://u:p@www.Example.com:8443/a/b?x=1&y=2#frag").get
    assert(p.scheme === "https" && p.userinfo === "u:p" &&
      p.host === "www.Example.com" && p.port === 8443 &&
      p.path === "/a/b" && p.query === "x=1&y=2" && p.fragment === "frag")
    val bare = Url.parse("http://example.com").get
    assert(bare.path === "" && bare.query === null && bare.port === -1)
    val v6 = Url.parse("http://[2001:db8::1]:8080/x").get
    assert(v6.host === "[2001:db8::1]" && v6.port === 8080)
    // Trailing colon / garbage port: host survives, port absent.
    assert(Url.parse("http://example.com:/x").get.port === -1)
    assert(Url.parse("http://example.com:http/x").get.port === -1)
    // Fragment before query: everything after # is fragment.
    val fq = Url.parse("http://a.com/p#frag?notquery").get
    assert(fq.query === null && fq.fragment === "frag?notquery")
    assert(Url.parse("mailto:a@b.com") === None)
    assert(Url.parse("data:text/plain,hi") === None)
    assert(Url.parse("not a url") === None)
    assert(Url.parse(null) === None)
    assert(Url.parse("http://") === None) // empty host
  }

  test("normalize: case, default ports, dot segments, percent forms, fragment") {
    assert(Url.normalize(
      "HTTP://WWW.Example.COM:80/a/b/../c/./d.html?x=1#frag") ===
      "http://www.example.com/a/c/d.html?x=1")
    // Unreserved escapes decode, others uppercase; empty path → "/".
    assert(Url.normalize("https://Example.com:443/%7euser/%41bc%2fd") ===
      "https://example.com/~user/Abc%2Fd")
    assert(Url.normalize("http://example.com") === "http://example.com/")
    // Non-default port survives; ws/wss defaults drop.
    assert(Url.normalize("http://example.com:8080/") ===
      "http://example.com:8080/")
    assert(Url.normalize("wss://a.com:443/s") === "wss://a.com/s")
    // Illegal raw characters are encoded (space, non-ASCII → UTF-8).
    assert(Url.normalize("http://example.com/path with space") ===
      "http://example.com/path%20with%20space")
    assert(Url.normalize("http://example.com/café") ===
      "http://example.com/caf%C3%A9")
    // %2E decodes to '.', THEN dot-removal sees it (the WHATWG order).
    assert(Url.normalize("http://example.com/%2e%2e/a") ===
      "http://example.com/a")
    // Bare % repaired; duplicate slashes preserved (semantic).
    assert(Url.normalize("http://example.com/100%") ===
      "http://example.com/100%25")
    assert(Url.normalize("http://example.com/a//b") ===
      "http://example.com/a//b")
    // Trailing /. and /.. keep directory meaning; leading .. clamps.
    assert(Url.normalize("http://e.com/a/b/..") === "http://e.com/a/")
    assert(Url.normalize("http://e.com/a/.") === "http://e.com/a/")
    assert(Url.normalize("http://e.com/../a") === "http://e.com/a")
    // Unparseable input comes back trimmed, never throws.
    assert(Url.normalize("  not a url ") === "not a url")
    assert(Url.normalize(null) === null)
  }

  test("resolve: RFC 3986 reference classes against a base document") {
    val base = "https://example.org/a/b/page.html?q=1"
    assert(Url.resolve(base, "https://other.org/abs#x") ===
      "https://other.org/abs")
    assert(Url.resolve(base, "//cdn.org/lib.js") ===
      "https://cdn.org/lib.js")
    assert(Url.resolve(base, "/root.html") ===
      "https://example.org/root.html")
    assert(Url.resolve(base, "rel/p.html") ===
      "https://example.org/a/b/rel/p.html")
    assert(Url.resolve(base, "../up.html") ===
      "https://example.org/a/up.html")
    assert(Url.resolve(base, "../../../clamp.html") ===
      "https://example.org/clamp.html")
    assert(Url.resolve(base, "?page=2") ===
      "https://example.org/a/b/page.html?page=2")
    assert(Url.resolve(base, "#sec") ===
      "https://example.org/a/b/page.html?q=1")
    assert(Url.resolve(base, "") ===
      "https://example.org/a/b/page.html?q=1")
    assert(Url.resolve(base, "x.html?a=1&b=2#f") ===
      "https://example.org/a/b/x.html?a=1&b=2")
    // Bare-host base: empty path acts as "/".
    assert(Url.resolve("https://example.org", "p.html") ===
      "https://example.org/p.html")
    // Non-hierarchical refs keep their scheme (filtered downstream).
    assert(Url.resolve(base, "mailto:a@b.c") === "mailto:a@b.c")
    assert(Url.resolve(base, "javascript:void(0)") === "javascript:void(0)")
    // Unparseable base: the reference comes back unchanged.
    assert(Url.resolve("not a url", "x.html") === "x.html")
    assert(Url.resolve(base, null) === null)
  }

  test("stripTracking: utm family + click ids out, real params kept") {
    assert(Url.stripTracking(
      "http://a.com/p?utm_source=x&id=5&UTM_Campaign=y") ===
      "http://a.com/p?id=5")
    assert(Url.stripTracking("https://a.com/p?gclid=1") ===
      "https://a.com/p")
    assert(Url.stripTracking("https://a.com/p?fbclid=1&q=search&spm=x") ===
      "https://a.com/p?q=search")
    assert(Url.stripTracking("http://a.com/p?gclid=1#sec") ===
      "http://a.com/p#sec")
    assert(Url.stripTracking("http://a.com/p") === "http://a.com/p")
    assert(Url.stripTracking("garbage") === "garbage")
  }

  test("registrableDomain: gTLD rule, ccTLD second levels, literals") {
    assert(Url.registrableDomain("www.example.com") === "example.com")
    assert(Url.registrableDomain("a.b.c.example.org") === "example.org")
    assert(Url.registrableDomain("a.b.example.co.uk") === "example.co.uk")
    assert(Url.registrableDomain("shop.example.com.au") ===
      "example.com.au")
    assert(Url.registrableDomain("Example.CO.JP") === "example.co.jp")
    // The suffix itself, single labels, IP literals: unchanged.
    assert(Url.registrableDomain("co.uk") === "co.uk")
    assert(Url.registrableDomain("localhost") === "localhost")
    assert(Url.registrableDomain("192.168.0.1") === "192.168.0.1")
    assert(Url.registrableDomain("[2001:db8::1]") === "[2001:db8::1]")
    assert(Url.registrableDomain(null) === null)
  }

  test("withUrlParts + capPerDomain: narrow pass, one-shuffle quota") {
    val sparkSession = spark
    import sparkSession.implicits._
    val df = Seq(
      (1L, "HTTP://Example.com:80/a/../b?utm_source=x&k=1"),
      (2L, "http://example.com/b?k=1"),
      (3L, "https://sub.other.co.uk/x"),
      (4L, "mailto:no@host")
    ).toDF("id", "url")
    val parts = Url.withUrlParts(df).collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getString(3),
        r.getString(4)))).toMap
    // Two raw spellings of the same page share one canonical key.
    assert(parts(1L)._1 === "http://example.com/b?k=1")
    assert(parts(1L) === parts(2L))
    assert(parts(3L) === (("https://sub.other.co.uk/x",
      "sub.other.co.uk", "other.co.uk")))
    assert(parts(4L)._2 === null && parts(4L)._3 === null)
    // Cap: 2 per domain by id.
    val capped = Url.capPerDomain(
      Url.withUrlParts(Seq.tabulate(10)(i =>
        (i.toLong, s"http://site${i % 2}.com/p$i")).toDF("id", "url")),
      "url_domain", 2, col("id")).select("id").as[Long].collect().sorted
    assert(capped.toSeq === Seq(0L, 1L, 2L, 3L))
  }

  test("politenessSchedule: per-domain pacing at each domain's own delay") {
    val sparkSession = spark
    import sparkSession.implicits._
    val fetches = Seq(
      (0L, "a.com", 2.0), (1L, "b.com", 5.0), (2L, "a.com", 2.0),
      (3L, "a.com", 2.0), (4L, "b.com", 5.0))
      .toDF("id", "url_domain", "crawl_delay")
    val out = Url.politenessSchedule(fetches, "url_domain",
        "crawl_delay", col("id"))
      .select("id", "fetch_seq", "start_offset_s").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out === Set((0L, 0L, 0.0), (2L, 1L, 2.0), (3L, 2L, 4.0),
      (1L, 0L, 0.0), (4L, 1L, 5.0)))
  }
}
