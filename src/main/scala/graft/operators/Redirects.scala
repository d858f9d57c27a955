package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HTTP redirect-chain resolution — the step between "fetched
  * responses" and "which URL a document actually lives at". A crawl's
  * fetch log is full of 301/302/303/307/308 rows whose `Location`
  * points at the page that finally answered 200; dedup keys, canonical
  * URLs, and the crawl frontier all need the FINAL URL, chains and all
  * (a moved site re-redirects every legacy deep link through 2-4 hops).
  *
  * Reference analog: the projection/decode seam — the reference engine
  * reshapes each record before counting
  * (spark-streaming-kafka-bucket-counter.py:104-116); redirect
  * resolution is the same record-canonicalization step for URL-keyed
  * web data.
  *
  * Semantics (deterministic, oracle-replicable):
  *   - An edge src→tgt exists for every row whose status is a redirect
  *     (301/302/303/307/308) with a non-null `Location`, resolved
  *     against the fetch URL per RFC 3986 ([[Url.resolve]] — Location
  *     is frequently relative in the wild).
  *   - Duplicate fetches of one src keep the lexicographically-least
  *     target (min) — deterministic under re-runs and re-orderings.
  *   - Following stops at a URL with no outgoing edge (a 200 row, an
  *     unfetched external target — terminal either way) or after
  *     `maxHops` follows; a walk still on a redirect at the cap reports
  *     `resolved = false` (covers loops too: a cycle never terminates,
  *     so it hits the cap). Browsers/crawlers cap between 10 and 20;
  *     default 10.
  *
  * Scale: each iteration is one equi-join of the live walks against the
  * edge set — both sides are REDIRECT-sized (a few percent of fetches),
  * not corpus-sized, and finished walks leave the loop eagerly, so
  * iteration i touches only chains longer than i (the vast majority of
  * real chains are 1-2 hops — the join shrinks geometrically). The edge
  * set is localCheckpointed once and reused by all iterations; with a
  * dims-sized edge table Catalyst broadcasts it and the whole resolve
  * is shuffle-free. No driver collect anywhere. */
object Redirects {

  private val RedirectStatuses = Seq(301L, 302L, 303L, 307L, 308L)

  /** The redirect edge set of a fetch log: `(src, tgt)` with Location
    * resolved against the fetch URL ([[Url.resolve]] applied in the
    * same justified narrow mapPartitions boundary as
    * [[Url.withUrlParts]] — Spark has no RFC 3986 resolve), one row per
    * src (min target). The redirect filter runs BEFORE the resolve, so
    * the string work touches only the redirect rows. */
  def edges(fetches: DataFrame, urlCol: String = "url",
            statusCol: String = "status",
            locationCol: String = "location"): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val filtered = fetches
      .filter(col(statusCol).isin(RedirectStatuses: _*) &&
        col(locationCol).isNotNull)
      .select(col(urlCol).as("src"), col(locationCol).as("loc"))
    val schema = StructType(Seq(StructField("src", StringType),
      StructField("tgt", StringType)))
    filtered.mapPartitions { it =>
      it.map { row =>
        Row(row.getString(0), Url.resolve(row.getString(0), row.getString(1)))
      }
    }(Encoders.row(schema))
      // Self-edges (Location resolving back to the fetch URL) are KEPT:
      // dropping them would erase the walk from resolve() output
      // entirely, so a self-redirect loop would read as a terminal 200
      // downstream. Kept, the walk spins to maxHops and is reported
      // with resolved = false — the honest answer for a loop.
      .filter(col("tgt").isNotNull)
      .groupBy("src").agg(min("tgt").as("tgt"))
  }

  /** Resolve every redirect source to its final URL: `(start,
    * final_url, hops, resolved)`. `hops` counts follows (≥1 — only
    * redirect rows appear; terminal 200 rows are their own final URL
    * and are not re-listed). `resolved = false` marks walks still on a
    * redirect after `maxHops` (loop or over-long chain); their
    * `final_url` is the position at the cap. */
  def resolve(edgeDf: DataFrame, maxHops: Int = 10): DataFrame = {
    val e = edgeDf.select(col("src").as("e_src"), col("tgt").as("e_tgt"))
      .localCheckpoint(true)
    // Walk state: (start, cur, hops). A walk leaves the loop the
    // iteration its cur has no outgoing edge.
    var live = e.select(col("e_src").as("start"), col("e_tgt").as("cur"),
      lit(1).as("hops"))
    var done: DataFrame = null
    var i = 1
    while (i < maxHops) {
      val stepped = live.join(e, live("cur") === e("e_src"), "left")
        .select(col("start"),
          coalesce(col("e_tgt"), col("cur")).as("cur"),
          when(col("e_tgt").isNotNull, col("hops") + 1)
            .otherwise(col("hops")).as("hops"),
          col("e_tgt").isNull.as("terminal"))
        .localCheckpoint(true)
      val finished = stepped.filter(col("terminal"))
        .select(col("start"), col("cur"), col("hops"), lit(true).as("resolved"))
      done = if (done == null) finished else done.union(finished)
      live = stepped.filter(!col("terminal"))
        .select("start", "cur", "hops")
      if (live.isEmpty) i = maxHops // early exit: all walks terminal
      i += 1
    }
    // Walks alive at the cap: terminal iff their final position has no
    // outgoing edge (they might finish exactly at maxHops).
    val atCap = live.join(e, live("cur") === e("e_src"), "left")
      .select(col("start"), col("cur"), col("hops"),
        col("e_tgt").isNull.as("resolved"))
    val all = if (done == null) atCap else done.union(atCap)
    all.select(col("start"), col("cur").as("final_url"), col("hops"),
      col("resolved"))
  }

  /** End-to-end: fetch log in, `(start, final_url, hops, resolved)`
    * out. */
  def resolveFetches(fetches: DataFrame, urlCol: String = "url",
                     statusCol: String = "status",
                     locationCol: String = "location",
                     maxHops: Int = 10): DataFrame =
    resolve(edges(fetches, urlCol, statusCol, locationCol), maxHops)
}
