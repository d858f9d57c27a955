package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** robots.txt (RFC 9309) for crawl curation — the policy layer of the
  * crawl front door: a corpus pipeline that re-crawls or audits a crawl
  * needs per-URL allow/deny under the Robots Exclusion Protocol, and a
  * WARC audit wants to know which captured URLs a polite crawler would
  * have fetched.
  *
  * The implementation follows RFC 9309's normative rules exactly where
  * they matter for corpus work: group collection (consecutive
  * `User-agent` lines share the following rule block; multiple groups
  * for the same agent MERGE), `*`/`$` pattern syntax (leftmost-greedy
  * `*`, end anchor `$`), and most-specific-match precedence — the
  * matching rule with the MOST OCTETS wins, `Allow` winning length
  * ties; no matching rule (or no applicable group, or unparseable
  * input) means ALLOWED, the protocol's explicit default. Agent lookup
  * is by case-insensitive product token, `*` as fallback — callers
  * pass the bare token ("graftbot"), not the full user-agent string.
  *
  * Scale: a crawl has ONE robots.txt per host, not per URL — the
  * intended shape is distinct-robots-per-domain parsed once and joined
  * back (broadcast when the domain set is small). [[Robots.withAllowed]]
  * is the row-level form with a per-partition parse cache keyed on the
  * robots text, so a domain-sorted or domain-partitioned frame parses
  * each robots.txt once per partition, not once per row. */
object Robots {

  /** One rule: allow/disallow + its raw path pattern. */
  final case class Rule(allow: Boolean, pattern: String)

  /** One agent group after merging: rules in file order, plus the
    * non-standard-but-universal `Crawl-delay` when present. */
  final case class Group(rules: Seq[Rule], crawlDelay: Option[Double])

  /** A parsed robots.txt: merged groups by lowercased agent token
    * (`*` included when present) and the global `Sitemap` lines. */
  final case class RobotsTxt(groups: Map[String, Group],
                             sitemaps: Seq[String])

  val Empty: RobotsTxt = RobotsTxt(Map.empty, Nil)

  /** Parse a robots.txt body. Never throws: junk lines are skipped,
    * unknown directives ignored (per spec), an empty/garbage file
    * parses to [[Empty]] (which allows everything). */
  def parse(text: String): RobotsTxt = {
    if (text == null) return Empty
    val groups = scala.collection.mutable.LinkedHashMap
      .empty[String, (scala.collection.mutable.ArrayBuffer[Rule],
        Option[Double])]
    val sitemaps = Vector.newBuilder[String]
    var currentAgents: List[String] = Nil
    var collectingAgents = false
    for (raw <- text.linesIterator) {
      val line = {
        val h = raw.indexOf('#')
        (if (h >= 0) raw.substring(0, h) else raw).trim
      }
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            // Consecutive user-agent lines open ONE group; a user-agent
            // line after rules starts a fresh group (RFC 9309 §2.2.1).
            if (!collectingAgents) currentAgents = Nil
            collectingAgents = true
            val agent = value.toLowerCase
            if (agent.nonEmpty) {
              currentAgents = agent :: currentAgents
              if (!groups.contains(agent))
                groups(agent) =
                  (scala.collection.mutable.ArrayBuffer.empty[Rule], None)
            }
          case "allow" | "disallow" =>
            collectingAgents = false
            // An empty pattern is spec-defined as "no rule" (classic
            // `Disallow:` = allow everything).
            if (value.nonEmpty) currentAgents.foreach { a =>
              groups(a)._1 += Rule(key == "allow", value)
            }
          case "crawl-delay" =>
            collectingAgents = false
            val d = try Some(value.toDouble).filter(_ >= 0)
            catch { case _: NumberFormatException => None }
            if (d.isDefined) currentAgents.foreach { a =>
              val (rules, old) = groups(a)
              groups(a) = (rules, old.orElse(d))
            }
          case "sitemap" =>
            // Global, group-independent (RFC 9309 §2.2.4 "other records").
            if (value.nonEmpty) sitemaps += value
          case _ => collectingAgents = false // unknown directive: ignore
        }
      }
    }
    RobotsTxt(
      groups.map { case (a, (rules, delay)) =>
        a -> Group(rules.toSeq, delay)
      }.toMap,
      sitemaps.result())
  }

  /** RFC 9309 §2.2.3 path matching: literal prefix with `*` matching
    * any run (leftmost-greedy is sufficient — patterns are anchored at
    * the start, so leftmost placement never loses a match except
    * against the `$` anchor, which gets its own suffix check). */
  def matches(pattern0: String, path: String): Boolean = {
    if (pattern0 == null || path == null) return false
    val anchored = pattern0.endsWith("$")
    val pattern = if (anchored) pattern0.dropRight(1) else pattern0
    val parts = pattern.split("\\*", -1)
    if (!path.startsWith(parts(0))) return false
    var pos = parts(0).length
    var k = 1
    while (k < parts.length - 1) {
      val i = path.indexOf(parts(k), pos)
      if (i < 0) return false
      pos = i + parts(k).length
      k += 1
    }
    if (parts.length == 1) !anchored || pos == path.length
    else {
      val last = parts(parts.length - 1)
      if (anchored)
        path.length - last.length >= pos && path.endsWith(last)
      else path.indexOf(last, pos) >= 0
    }
  }

  /** The group a crawler token uses: its own (case-insensitive), else
    * `*`, else none (→ everything allowed). */
  def groupFor(r: RobotsTxt, agent: String): Option[Group] = {
    val a = if (agent == null) "" else agent.toLowerCase
    r.groups.get(a).orElse(r.groups.get("*"))
  }

  /** Is `path` fetchable for `agent`? Most-specific (most-octets)
    * matching rule decides, Allow winning ties; no match → allowed. */
  def isAllowed(r: RobotsTxt, agent: String, path: String): Boolean =
    groupFor(r, agent) match {
      case None => true
      case Some(g) =>
        val p = if (path == null || path.isEmpty) "/" else path
        var bestLen = -1
        var bestAllow = true
        g.rules.foreach { rule =>
          if (matches(rule.pattern, p)) {
            val len = rule.pattern.length
            if (len > bestLen || (len == bestLen && rule.allow)) {
              if (len > bestLen) { bestLen = len; bestAllow = rule.allow }
              else bestAllow = bestAllow || rule.allow
            }
          }
        }
        bestAllow
    }

  /** `Crawl-delay` for `agent` (its group or `*`), None when absent. */
  def crawlDelay(r: RobotsTxt, agent: String): Option[Double] =
    groupFor(r, agent).flatMap(_.crawlDelay)

  /** DataFrame form: appends `allowed` (and `crawl_delay`, nullable)
    * per row from a robots-text column and a path column. Narrow
    * per-partition pass with a last-parse cache — a domain-partitioned
    * or domain-sorted frame parses each robots.txt once, not once per
    * URL (there is one robots.txt per host, not per URL). */
  def withAllowed(df: DataFrame, robotsCol: String, pathCol: String,
                  agent: String): DataFrame = {
    val ri = df.schema.fieldIndex(robotsCol)
    val pi = df.schema.fieldIndex(pathCol)
    val schema = df.schema.add("allowed", BooleanType)
      .add("crawl_delay", DoubleType)
    df.mapPartitions { it =>
      var lastText: String = null
      var lastParsed: RobotsTxt = Empty
      it.map { row =>
        val text = row.getAs[String](ri)
        if (text != lastText || lastText == null) {
          lastText = text
          lastParsed = parse(text)
        }
        val allowed = isAllowed(lastParsed, agent, row.getAs[String](pi))
        val delay = crawlDelay(lastParsed, agent)
        Row.fromSeq(row.toSeq :+ allowed :+
          delay.map(Double.box).orNull)
      }
    }(Encoders.row(schema))
  }
}
