package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.QueryPack

/** Compliance takedown, end to end (r14): a 3-generation durable corpus
  * store, a victim list recorded into a takedown store, PHYSICAL erasure
  * of every victim row ([[ParquetStore.eraseKeys]] — copy-on-write,
  * touched generations only, slots preserved), then a re-crawl batch
  * containing the banned keys pushed through the ingest gate
  * ([[Takedown.scrub]]) — which must admit nothing: the non-victims are
  * already stored (keyed dedup) and the victims are banned. The final
  * store state must equal "everything except the victims, at the
  * original generations" — erasure may not disturb a surviving row's
  * rst_id, and the gated re-crawl may not create a generation. */
object TakedownPack extends QueryPack {

  private val DocSchema = StructType(Seq(
    StructField("doc_key", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private val RevokeDocSchema = StructType(Seq(
    StructField("doc_key", StringType),
    StructField("url_host", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  override def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map(
      "q_takedown" -> { (s, dir) =>
        val base = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
          f"graft_takedown_${dir.hashCode}%08x").toString
        val docs = table(s, dir, "documents").select(
          concat(lit("https://ex.org/d/"), col("doc_id")).as("doc_key"),
          col("source"), col("n_chars"),
          (col("doc_id") % 3L).as("_b")).localCheckpoint(true)
        val store = new ParquetStore(s, DocSchema, s"$base/docs",
          tableName = "takedown_docs", cleanFreq = 1000L)
        store.reset()
        (0L to 2L).foreach { b =>
          store.append(docs.filter(col("_b") === b).drop("_b"))
        }
        val td = Takedown.takedownStore(s, s"$base/td",
          tableName = "takedown_list")
        td.reset()
        // Every 13th document (offset 5) is taken down…
        Takedown.request(td,
          table(s, dir, "documents").filter(col("doc_id") % 13L === 5L)
            .select(concat(lit("https://ex.org/d/"), col("doc_id"))
              .as("key"), lit("dmca").as("reason")))
        // …erased physically (only generations holding a victim are
        // rewritten; surviving rows keep their slots)…
        Takedown.erase(store, td, "doc_key")
        // …and a re-crawl REDELIVERING batch-1 (victims included) hits
        // the ingest gate + keyed dedup: zero admissions, zero new
        // generations — the victim store, not the data store, is what
        // remembers the ban after erasure.
        val redelivered = docs.filter(col("_b") === 1L).drop("_b")
        graft.streaming.CrawlIngest.dedupAppendByKey(store,
          Takedown.scrub(redelivered, td, "doc_key"),
          "doc_key", col("doc_key"))
        store.selectAll
      },
      // TAKEDOWN REACHES SHIPPED ARCHIVES (r15 — r14 verdict #1): the
      // q_warc_cdx fixture exported to DISK with its CDX manifests,
      // every 13th document taken down, then eraseExports rewrites only
      // victim-bearing archives (survivor members byte-verbatim,
      // indexes regenerated with corrected offsets). The re-read runs
      // the SAME byte-exactness machinery as q_warc_cdx — slicing each
      // archive at the regenerated offsets and re-parsing — so one
      // query proves both halves: no victim record survives anywhere,
      // and the surviving index is still byte-exact against the
      // rewritten archives.
      "q_takedown_export" -> { (s, dir) =>
        val expDir = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
          f"graft_tdexp_${dir.hashCode}%08x").toString
        graft.Fs.deleteRecursively(java.nio.file.Paths.get(expDir))
        graft.sources.Warc.writeFiles(
          graft.sources.Warc.encodeResponses(
            graft.sources.WarcPack.cdxRows(s, dir),
            statusCol = "http_status", withCdx = true),
          expDir)
        val td = Takedown.takedownStore(s, s"$expDir-td",
          tableName = "takedown_export_list")
        td.reset()
        Takedown.request(td,
          table(s, dir, "documents").filter(col("doc_id") % 13L === 5L)
            .select(concat(lit("https://export.org/doc/"), col("doc_id"))
              .as("key"), lit("dmca").as("reason")))
        Takedown.eraseExports(s, expDir, td)
        val back = s.read.format("binaryFile").load(expDir)
          .select(regexp_extract(col("path"), "([^/]+)$", 1).as("path"),
            col("content"))
        graft.sources.WarcPack.cdxSliceCheck(back)
      },
      // COMPLIANCE ATTESTATION (r16): the evidence loop a real notice
      // closes with — export with manifests, attest BEFORE the erase
      // (every victim names exactly its one shipped record), erase,
      // attest AFTER (every victim at zero, present in the output as
      // an explicit 0 — "no row" is never mistakable for "not
      // checked"). Index-only both times.
      "q_takedown_attest" -> { (s, dir) =>
        val expDir = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
          f"graft_tdatt_${dir.hashCode}%08x").toString
        graft.Fs.deleteRecursively(java.nio.file.Paths.get(expDir))
        graft.sources.Warc.writeFiles(
          graft.sources.Warc.encodeResponses(
            graft.sources.WarcPack.cdxRows(s, dir),
            statusCol = "http_status", withCdx = true),
          expDir)
        val td = Takedown.takedownStore(s, s"$expDir-td",
          tableName = "takedown_attest_list")
        td.reset()
        Takedown.request(td,
          table(s, dir, "documents")
            .filter(col("doc_id") % 13L === 5L && col("text").isNotNull)
            .select(concat(lit("https://export.org/doc/"), col("doc_id"))
              .as("key"), lit("dmca").as("reason")))
        // Pin the PRE attestation — the frame is lazy and the files it
        // reads are about to be rewritten.
        val pre = Takedown.exportVictimHits(s, expDir, td)
          .withColumnRenamed("hits", "pre_hits")
          .localCheckpoint(true)
        Takedown.eraseExports(s, expDir, td)
        val post = Takedown.exportVictimHits(s, expDir, td)
          .withColumnRenamed("hits", "post_hits")
        pre.join(post, Seq("key"))
      },
      // TAKEDOWN REACHES THE COLLECTION INDEX (r16 — r15 verdict #2):
      // the export ships with its per-archive CDX manifests AND a
      // zipnum cluster built over them; a takedown then erases every
      // 13th document and — in the SAME eraseExports call — rebuilds
      // the cluster from the rewritten indexes (geometry from the
      // cluster's own manifest). The rebuilt cluster, read back from
      // DISK, must hold exactly the survivors, every line reachable by
      // byte-exact block seeks, blocks sorted, block keys matching the
      // summary — the q_warc_zipnum contract minus the victims. The
      // erase-to-rebuild staleness gate itself is spec-pinned
      // (TakedownSpec: a stale cluster REFUSES verified lookups).
      "q_takedown_zipnum" -> { (s, dir) =>
        val expDir = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
          f"graft_tdzn_${dir.hashCode}%08x").toString
        val znDir = s"$expDir-zn"
        graft.Fs.deleteRecursively(java.nio.file.Paths.get(expDir))
        graft.Fs.deleteRecursively(java.nio.file.Paths.get(znDir))
        val files = graft.sources.Warc.encodeResponses(
            graft.sources.WarcPack.cdxRows(s, dir),
            statusCol = "http_status", withCdx = true)
          .localCheckpoint(true)
        graft.sources.Warc.writeFiles(files, expDir)
        graft.sources.Warc.writeZipnum(files, znDir, shards = 4,
          blockLines = 8)
        val td = Takedown.takedownStore(s, s"$expDir-td",
          tableName = "takedown_zipnum_list")
        td.reset()
        Takedown.request(td,
          table(s, dir, "documents").filter(col("doc_id") % 13L === 5L)
            .select(concat(lit("https://export.org/doc/"), col("doc_id"))
              .as("key"), lit("dmca").as("reason")))
        Takedown.eraseExports(s, expDir, td, zipnumDir = znDir)
        val disk = s.read.format("binaryFile").load(znDir)
          .select(regexp_extract(col("path"), "([^/]+)$", 1).as("path"),
            col("content"))
          .localCheckpoint(true)
        graft.sources.WarcPack.zipnumSliceCheck(
          graft.sources.WarcPack.zipnumEntries(
            disk.filter(col("path") === "cluster.idx")),
          disk.filter(col("path").endsWith(".gz"))
            .select(col("path").as("fn"), col("content")))
      },
      // ROBOTS REVOCATION (r14): the retroactive half of robots
      // compliance. Pages already in the corpus were crawled under a
      // permissive robots.txt; the publisher tightens it (Disallow
      // /private with an Allow carve-out, plus a *.pdf$ end anchor —
      // the q_frontier_gate rule set), and the inverse gate
      // ([[graft.streaming.CrawlSchedule.revokedFrontier]] — the REAL
      // RFC 9309 matcher, latest policy generation wins) turns the
      // now-disallowed stored rows into takedown requests that are
      // physically erased. Hosts without robots revoke nothing.
      "q_robots_revoke" -> { (s, dir) =>
        import s.implicits._
        import graft.streaming.CrawlSchedule
        val base = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
          f"graft_revoke_${dir.hashCode}%08x").toString
        val docs = table(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"))
          .as[(Long, String, Long)]
          .map { case (id, src, n) =>
            val path = (id % 5).toInt match {
              case 0 => s"/articles/$id.html"
              case 1 => s"/private/$id.html"
              case 2 => s"/private/public/$id.html"
              case 3 => s"/docs/$id.pdf"
              case _ => s"/private/public/$id.pdf"
            }
            (s"https://site${id % 2}.com$path", s"site${id % 2}.com",
              src, n)
          }.toDF("doc_key", "url_host", "source", "n_chars")
        val store = new ParquetStore(s, RevokeDocSchema, s"$base/docs",
          tableName = "revoke_docs", cleanFreq = 1000L)
        store.reset()
        store.append(docs)
        val rstore = CrawlSchedule.robotsStore(s, s"$base/robots",
          tableName = "revoke_robots")
        rstore.reset()
        // The crawl-time policy allowed everything…
        rstore.append(CrawlSchedule.robotsPolicies(
          Seq(("https://site0.com/robots.txt",
            "User-agent: *\nDisallow:\n")).toDF("url", "text"),
          "graftbot"))
        // …then the tightened re-fetch lands (latest generation wins).
        rstore.append(CrawlSchedule.robotsPolicies(
          Seq(("https://site0.com/robots.txt",
            """User-agent: graftbot
              |Disallow: /private/
              |Allow: /private/public/
              |Disallow: /*.pdf$
              |""".stripMargin)).toDF("url", "text"),
          "graftbot"))
        val revoked = CrawlSchedule.revokedFrontier(store.selectAll,
          rstore, "graftbot", urlCol = "doc_key", hostCol = "url_host")
        val td = Takedown.takedownStore(s, s"$base/td",
          tableName = "revoke_list")
        td.reset()
        Takedown.request(td, revoked.select(col("doc_key").as("key"),
          lit("robots-revoked").as("reason")))
        Takedown.erase(store, td, "doc_key")
        store.selectAll
      }
    )

  override def oracles: Map[String, String] = Map(
    // Survivors only, at their ORIGINAL generation (doc_id mod 3 + 1):
    // erase rewrites in place, and the gated redelivery appends nothing.
    "q_takedown" ->
      """SELECT 'https://ex.org/d/' || CAST(doc_id AS VARCHAR) AS doc_key,
        |  source, n_chars, doc_id % 3 + 1 AS rst_id
        |FROM documents WHERE doc_id % 13 <> 5""".stripMargin,
    // The q_warc_cdx oracle minus the victims: erasure removed exactly
    // the banned records, and the regenerated offsets still slice to
    // the right bytes for every survivor.
    "q_takedown_export" ->
      """SELECT 'https://export.org/doc/' || CAST(doc_id AS VARCHAR)
        |    AS url,
        |  CAST(CASE doc_id % 3 WHEN 1 THEN 301 WHEN 2 THEN 404
        |    ELSE 200 END AS BIGINT) AS cdx_status,
        |  'https://export.org/doc/' || CAST(doc_id AS VARCHAR)
        |    AS rec_uri,
        |  CAST(CASE doc_id % 3 WHEN 1 THEN 301 WHEN 2 THEN 404
        |    ELSE 200 END AS BIGINT) AS rec_status
        |FROM documents
        |WHERE text IS NOT NULL AND doc_id % 13 <> 5""".stripMargin,
    // Each victim named exactly its one shipped record before the
    // erase, and zero after.
    "q_takedown_attest" ->
      """SELECT 'https://export.org/doc/' || CAST(doc_id AS VARCHAR)
        |    AS key,
        |  CAST(1 AS BIGINT) AS pre_hits, CAST(0 AS BIGINT) AS post_hits
        |FROM documents
        |WHERE text IS NOT NULL AND doc_id % 13 = 5""".stripMargin,
    // The q_warc_zipnum oracle minus the victims: the rebuilt cluster
    // holds exactly the surviving lines, block-seekable and sorted.
    "q_takedown_zipnum" ->
      """SELECT 'https://export.org/doc/' || CAST(doc_id AS VARCHAR)
        |    AS url,
        |  CAST(CASE doc_id % 3 WHEN 1 THEN 301 WHEN 2 THEN 404
        |    ELSE 200 END AS BIGINT) AS cdx_status,
        |  true AS key_match, true AS in_order
        |FROM documents
        |WHERE text IS NOT NULL AND doc_id % 13 <> 5""".stripMargin,
    // site1 has no robots (revokes nothing); site0 keeps /articles
    // (g=0), the /private/public Allow carve-outs (g=2,4 — longest
    // match beats both Disallows) and loses /private html (g=1) and
    // the *.pdf$ anchor (g=3).
    "q_robots_revoke" ->
      """SELECT 'https://site' || CAST(doc_id % 2 AS VARCHAR) || '.com' ||
        |  CASE CAST(doc_id % 5 AS INTEGER)
        |    WHEN 0 THEN '/articles/' || CAST(doc_id AS VARCHAR) || '.html'
        |    WHEN 1 THEN '/private/' || CAST(doc_id AS VARCHAR) || '.html'
        |    WHEN 2 THEN '/private/public/' || CAST(doc_id AS VARCHAR)
        |      || '.html'
        |    WHEN 3 THEN '/docs/' || CAST(doc_id AS VARCHAR) || '.pdf'
        |    ELSE '/private/public/' || CAST(doc_id AS VARCHAR) || '.pdf'
        |  END AS doc_key,
        |  'site' || CAST(doc_id % 2 AS VARCHAR) || '.com' AS url_host,
        |  source, n_chars, CAST(1 AS BIGINT) AS rst_id
        |FROM documents
        |WHERE doc_id % 2 = 1 OR doc_id % 5 IN (0, 2, 4)""".stripMargin
  )
}
