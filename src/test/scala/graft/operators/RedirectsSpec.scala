package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Redirect-chain resolution contract: chains follow to their terminal
  * URL with exact hop counts, relative Locations resolve against the
  * fetch URL, duplicate fetches pick the deterministic (min) target,
  * cycles and over-long chains hit the cap with `resolved = false`, and
  * a chain that finishes exactly at the cap still counts as resolved. */
class RedirectsSpec extends SparkSpec {

  private def rows(out: org.apache.spark.sql.DataFrame) =
    out.collect().map(r => (r.getString(0), r.getString(1),
      r.getInt(2), r.getBoolean(3))).toSet

  test("chains resolve with exact hops; relative Locations; dangling terminal") {
    val sparkSession = spark
    import sparkSession.implicits._
    val fetches = Seq(
      // 3-hop chain, mixed relative/absolute Locations.
      ("https://a.org/1", 301L, "/2"),
      ("https://a.org/2", 302L, "https://b.org/3"),
      ("https://b.org/3", 308L, "end"), // relative path merge
      ("https://b.org/end", 200L, null),
      // Redirect to a target never fetched: still terminal.
      ("https://c.org/x", 307L, "https://external.org/gone"),
      // Non-redirect and null-location rows contribute no edges.
      ("https://d.org/ok", 200L, "/ignored"),
      ("https://d.org/nul", 301L, null)
    ).toDF("url", "status", "location")
    val out = rows(Redirects.resolveFetches(fetches))
    assert(out === Set(
      ("https://a.org/1", "https://b.org/end", 3, true),
      ("https://a.org/2", "https://b.org/end", 2, true),
      ("https://b.org/3", "https://b.org/end", 1, true),
      ("https://c.org/x", "https://external.org/gone", 1, true)))
  }

  test("duplicate fetches of one src keep the min target") {
    val sparkSession = spark
    import sparkSession.implicits._
    val fetches = Seq(
      ("https://a.org/p", 301L, "https://z.org/late"),
      ("https://a.org/p", 301L, "https://m.org/early")
    ).toDF("url", "status", "location")
    assert(rows(Redirects.resolveFetches(fetches)) ===
      Set(("https://a.org/p", "https://m.org/early", 1, true)))
  }

  test("cycles and over-long chains hit the cap unresolved; exact-cap chains resolve") {
    val sparkSession = spark
    import sparkSession.implicits._
    val cyc = Seq(
      ("https://l.org/a", 302L, "/b"),
      ("https://l.org/b", 302L, "/a")).toDF("url", "status", "location")
    // Period-2 cycle: after the (even) 10-hop cap each start is back home.
    assert(rows(Redirects.resolveFetches(cyc)) === Set(
      ("https://l.org/a", "https://l.org/a", 10, false),
      ("https://l.org/b", "https://l.org/b", 10, false)))
    // A straight chain of 12 hops: starts deeper than (12 - cap) resolve,
    // the head is cut off at 10 hops unresolved.
    val long = (0 until 12).map(k =>
      (s"https://n.org/$k", 301L, s"/${k + 1}")).toDF("url", "status", "location")
    val out = rows(Redirects.resolveFetches(long))
    assert(out.contains(("https://n.org/0", "https://n.org/10", 10, false)))
    assert(out.contains(("https://n.org/2", "https://n.org/12", 10, true)))
    assert(out.contains(("https://n.org/11", "https://n.org/12", 1, true)))
    assert(out.size === 12)
  }

  test("self-redirects surface as unresolved loops, not silent drops") {
    val sparkSession = spark
    import sparkSession.implicits._
    val fetches = Seq(("https://s.org/x", 301L, "https://s.org/x"))
      .toDF("url", "status", "location")
    // A URL whose Location resolves to itself is a loop: it must appear
    // in the output with resolved = false (capped), never vanish and
    // read as a terminal 200 downstream.
    assert(rows(Redirects.resolveFetches(fetches)) ===
      Set(("https://s.org/x", "https://s.org/x", 10, false)))
  }
}
