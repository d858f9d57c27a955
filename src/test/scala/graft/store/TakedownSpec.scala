package graft.store

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Compliance takedown: logical scrub is immediate, physical erasure
  * removes victim rows from every on-disk generation without disturbing
  * survivors, and the takedown store — not the data store — is the
  * durable memory that a key is banned (a re-crawl after erasure must
  * not resurrect the row). */
class TakedownSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("v", LongType)))

  private def tmp(): String =
    Files.createTempDirectory("graft_takedown").toString

  private def batch(rows: (String, Long)*) = {
    val sparkSession = spark
    import sparkSession.implicits._
    rows.toDF("k", "v")
  }

  private def victims(keys: String*) = {
    val sparkSession = spark
    import sparkSession.implicits._
    keys.map(k => (k, "notice")).toDF("key", "reason")
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "v", "rst_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("erase removes victims from EVERY generation, survivors keep slots, untouched generations are not rewritten") {
    val store = new ParquetStore(spark, schema, tmp(), "td_erase",
      cleanFreq = 1000L)
    store.append(batch("a" -> 1L, "bad" -> 2L))  // gen 1: touched
    store.append(batch("c" -> 3L, "d" -> 4L))    // gen 2: untouched
    store.append(batch("bad" -> 5L, "e" -> 6L))  // gen 3: touched
    val td = Takedown.takedownStore(spark, tmp(), "td_list_erase")
    assert(Takedown.request(td, victims("bad")) === 1L)
    // Untouched-generation proof: gen 2's files must be byte-identical
    // after the erase (copy-on-write only rewrites touched slots).
    val gen2 = Files.list(java.nio.file.Paths.get(store.path, "rst_id=2"))
      .toArray.map(_.toString).sorted.mkString(",")
    assert(Takedown.erase(store, td, "k") === 2L)
    val gen2After = Files.list(java.nio.file.Paths.get(store.path, "rst_id=2"))
      .toArray.map(_.toString).sorted.mkString(",")
    assert(gen2After === gen2)
    // No parquet file anywhere still holds a victim row — read each
    // generation directly, not through any scrub.
    assert(rows(store.selectAll) ===
      Set(("a", 1L, 1L), ("c", 3L, 2L), ("d", 4L, 2L), ("e", 6L, 3L)))
    store.generations.foreach { g =>
      assert(store.directFetch(g).filter(col("k") === "bad").isEmpty,
        s"victim row survived in generation $g")
    }
  }

  test("a re-crawl after erasure resurrects the row UNGATED and stays out GATED") {
    val td = Takedown.takedownStore(spark, tmp(), "td_list_regate")
    Takedown.request(td, victims("bad"))
    val recrawl = batch("bad" -> 9L, "new" -> 10L)
    // Ungated: the keyed-dedup anti-join no longer sees the erased key,
    // so the banned row comes straight back — the hazard the gate closes.
    val ungated = new ParquetStore(spark, schema, tmp(), "td_ungated",
      cleanFreq = 1000L)
    ungated.append(batch("a" -> 1L, "bad" -> 2L))
    Takedown.erase(ungated, td, "k")
    graft.streaming.CrawlIngest.dedupAppendByKey(ungated, recrawl, "k",
      col("k"))
    assert(!ungated.selectAll.filter(col("k") === "bad").isEmpty)
    // Gated: scrub before the keyed dedup — banned key never re-enters,
    // the genuinely new key does.
    val gated = new ParquetStore(spark, schema, tmp(), "td_gated",
      cleanFreq = 1000L)
    gated.append(batch("a" -> 1L, "bad" -> 2L))
    Takedown.erase(gated, td, "k")
    graft.streaming.CrawlIngest.dedupAppendByKey(gated,
      Takedown.scrub(recrawl, td, "k"), "k", col("k"))
    assert(gated.selectAll.filter(col("k") === "bad").isEmpty)
    assert(!gated.selectAll.filter(col("k") === "new").isEmpty)
  }

  test("requests are idempotent per key (re-delivered notices append nothing)") {
    val td = Takedown.takedownStore(spark, tmp(), "td_list_idem")
    assert(Takedown.request(td, victims("x", "y")) === 2L)
    assert(Takedown.request(td, victims("y", "z")) === 1L)
    assert(Takedown.request(td, victims("x", "y", "z")) === 0L)
    assert(Takedown.victimKeys(td).count() === 3L)
  }

  test("erase reaches rows already folded into a collapse base") {
    val store = new ParquetStore(spark, schema, tmp(), "td_collapsed",
      cleanFreq = 1000L, collapseKeys = Seq("k"), collapseEvery = 2L)
    // Three streamed appends trip the collapse (keeps latest per key in
    // a base + one kept delta); the victim's row lives in the BASE now.
    store.appendStreaming(batch("bad" -> 1L, "a" -> 2L))
    store.appendStreaming(batch("b" -> 3L))
    store.appendStreaming(batch("c" -> 4L))
    assert(store.generations.length <= 3)
    val td = Takedown.takedownStore(spark, tmp(), "td_list_collapsed")
    Takedown.request(td, victims("bad"))
    Takedown.erase(store, td, "k")
    assert(store.selectAll.filter(col("k") === "bad").isEmpty)
    assert(store.selectAll.filter(col("k") =!= "bad").count() === 3L)
  }

  test("digest-level media takedown: one notice erases every mirror and blocks re-crawled copies") {
    import org.apache.spark.sql.Row
    import graft.streaming.CrawlMedia
    def mediaRow(url: String, sha1: String): Row =
      Row("f.warc.gz", 0L, url, 200L, "image/gif", "image", 10L, sha1,
        7L, null, url)
    def frame(rows: Row*) = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), CrawlMedia.MediaSchema)
    val media = CrawlMedia.mediaStore(spark, tmp(), "td_media")
    val reps = CrawlMedia.repStore(spark, tmp(), "td_media_reps")
    val batch = frame(
      mediaRow("https://a.com/x", "D1"), mediaRow("https://b.com/x", "D1"),
      mediaRow("https://c.com/x", "D1"), mediaRow("https://a.com/y", "D2"))
    media.append(batch)
    CrawlMedia.recordReps(reps, batch)
    // A DMCA notice targets CONTENT, not a URL: the victim key is the
    // payload digest, so one request covers every mirror.
    val td = Takedown.takedownStore(spark, tmp(), "td_media_list")
    Takedown.request(td, victims("D1"))
    Takedown.erase(media, td, "sha1_b32")
    Takedown.erase(reps, td, "sha1_b32")
    assert(media.selectAll.select("url").collect().map(_.getString(0))
      .toSet === Set("https://a.com/y"))
    assert(reps.selectAll.select("sha1_b32").collect().map(_.getString(0))
      .toSet === Set("D2"))
    // A mirror of the banned bytes re-crawled at a NEW URL: the digest
    // scrub blocks it before the keyed-dedup append (which, keyed on
    // media_key, would otherwise admit the unseen URL).
    val recrawl = frame(mediaRow("https://d.com/x", "D1"),
      mediaRow("https://d.com/z", "D3"))
    graft.streaming.CrawlIngest.dedupAppendByKey(media,
      Takedown.scrub(recrawl, td, "sha1_b32"), "media_key", col("media_key"))
    val urls = media.selectAll.select("url").collect()
      .map(_.getString(0)).toSet
    assert(!urls.contains("https://d.com/x"))
    assert(urls.contains("https://d.com/z"))
  }

  test("erase is idempotent: a crashed-and-rerun pass touches nothing the second time") {
    val store = new ParquetStore(spark, schema, tmp(), "td_idem_erase",
      cleanFreq = 1000L)
    store.append(batch("a" -> 1L, "bad" -> 2L))
    store.append(batch("bad" -> 3L, "b" -> 4L))
    val td = Takedown.takedownStore(spark, tmp(), "td_list_idem_erase")
    Takedown.request(td, victims("bad"))
    assert(Takedown.erase(store, td, "k") === 2L)
    val after = rows(store.selectAll)
    // The re-run (a crash mid-delete leaves the pass resumable): erased
    // generations no longer probe as touched — zero rewrites, same rows.
    assert(Takedown.erase(store, td, "k") === 0L)
    assert(rows(store.selectAll) === after)
  }

  test("scrubPairs kills a pair when EITHER endpoint is banned") {
    val sparkSession = spark
    import sparkSession.implicits._
    val td = Takedown.takedownStore(spark, tmp(), "td_list_pairs")
    Takedown.request(td, victims("bad"))
    val pairs = Seq(("bad", "x"), ("x", "bad"), ("x", "y"))
      .toDF("a", "b")
    assert(Takedown.scrubPairs(pairs, td, "a", "b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
      === Seq(("x", "y")))
  }

  // ---- eraseExports (r15): takedown reaches shipped archives ----

  /** A small on-disk export: 3 groups, one a victim-free control; doc 4
    * is a byte-duplicate of victim doc 1 at a second URL, exported with
    * withRevisits so a revisit record IMPLICATES the banned original. */
  private def exportFixture(): (String, ParquetStore) = {
    val sparkSession = spark
    import sparkSession.implicits._
    val rows = Seq(
      ("g0", "https://e.org/keep/0", "body zero"),
      ("g0", "https://e.org/bad/1", "banned body"),
      ("g1", "https://e.org/keep/2", "body two"),
      ("g1", "https://e.org/keep/3", "body three"),
      ("g2", "https://e.org/dup/4", "banned body"), // revisit of bad/1
      ("g2", "https://e.org/keep/5", "body five"))
      .map { case (g, u, b) =>
        (g, u, "2024-01-01T00:00:00Z", "text/plain", b.getBytes("UTF-8"))
      }.toDF("file_group", "url", "warc_date", "content_type", "body")
    val dir = tmp()
    graft.sources.Warc.writeFiles(graft.sources.Warc.encodeResponses(
      rows, withCdx = true, withRevisits = true), dir)
    val td = Takedown.takedownStore(spark, tmp(), "td_exp_list")
    Takedown.request(td, victims("https://e.org/bad/1"))
    (dir, td)
  }

  private def dirBytes(dir: String): Map[String, Seq[Byte]] = {
    val s = Files.list(java.nio.file.Paths.get(dir))
    try s.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
      .map(p => p.getFileName.toString ->
        Files.readAllBytes(p).toSeq).toMap
    finally s.close()
  }

  private def readUris(dir: String) = {
    val back = spark.read.format("binaryFile").load(dir)
      .filter(col("path").endsWith(".warc.gz"))
      .select(col("path"), col("content").as("bytes"))
    graft.sources.Warc.records(back, gzipped = true)
      .select(col("warc_type"), col("target_uri"), col("refers_to_uri"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2))).toSet
  }

  test("eraseExports removes victim records AND implicating revisits; untouched archives keep their bytes") {
    val (dir, td) = exportFixture()
    val before = dirBytes(dir)
    // The revisit in g2 names the banned original.
    assert(readUris(dir).exists { case (t, _, ref) =>
      t == "revisit" && ref == "https://e.org/bad/1" })
    assert(Takedown.eraseExports(spark, dir, td) === 2L) // g0 + g2
    val uris = readUris(dir)
    assert(!uris.exists(_._2 == "https://e.org/bad/1"))
    assert(!uris.exists(_._3 == "https://e.org/bad/1")) // revisit gone
    assert(uris.map(_._2) === Set("https://e.org/keep/0",
      "https://e.org/keep/2", "https://e.org/keep/3",
      "https://e.org/keep/5"))
    val after = dirBytes(dir)
    // The victim-free archive and its index are byte-untouched.
    assert(after("g1.warc.gz") === before("g1.warc.gz"))
    assert(after("g1.cdx") === before("g1.cdx"))
    // Survivor members are byte-verbatim: keep/0's member bytes appear
    // in the rewritten g0 exactly as exported (offset shifted only).
    val spans0 = graft.sources.Warc.memberSpans(
      after("g0.warc.gz").toArray).get
    assert(spans0.size === 1)
    val oldSpans0 = graft.sources.Warc.memberSpans(
      before("g0.warc.gz").toArray).get
    val oldMembers = oldSpans0.map { case (o, l) =>
      before("g0.warc.gz").slice(o, o + l) }
    assert(oldMembers.exists(_ == after("g0.warc.gz")))
  }

  test("eraseExports is idempotent — a second pass (and a crashed-then-rerun pass) touches nothing") {
    val (dir, td) = exportFixture()
    assert(Takedown.eraseExports(spark, dir, td) === 2L)
    val clean = dirBytes(dir)
    // Re-run: the manifests no longer bear victims — zero rewrites,
    // bytes identical.
    assert(Takedown.eraseExports(spark, dir, td) === 0L)
    assert(dirBytes(dir) === clean)
    // Crash window: archive swapped but the OLD index restored (the
    // stale-cdx state a crash between the two renames leaves). The
    // rerun heals the index — regenerated from the clean archive —
    // without rewriting the archive again.
    val staleCdx = exportFixture()
    Files.write(java.nio.file.Paths.get(dir, "g0.cdx"),
      dirBytes(staleCdx._1)("g0.cdx").toArray)
    assert(Takedown.eraseExports(spark, dir, td) === 0L)
    assert(dirBytes(dir) === clean)
  }

  test("eraseExports slice-checks: regenerated CDX offsets are byte-exact against the rewritten archives") {
    val (dir, td) = exportFixture()
    Takedown.eraseExports(spark, dir, td)
    val back = spark.read.format("binaryFile").load(dir)
      .select(regexp_extract(col("path"), "([^/]+)$", 1).as("path"),
        col("content"))
    val checked = graft.sources.WarcPack.cdxSliceCheck(back)
      .collect().map(r => (r.getString(0), r.getString(2))).toSet
    // Every surviving entry's slice re-parses to its own record.
    assert(checked.forall { case (u, ru) => u == ru })
    assert(checked.size === 4) // keep/0, keep/2, keep/3, keep/5 —
                               // bad/1 and its dup/4 revisit are gone.
  }

  test("eraseExports sniffs the index's key style: a SURT export keeps SURT keys after the rewrite") {
    val sparkSession = spark
    import sparkSession.implicits._
    val rows = Seq(
      ("g0", "https://Keep.ORG/A/0", "body zero"),
      ("g0", "https://e.org/bad/1", "banned body"))
      .map { case (g, u, b) =>
        (g, u, "2024-01-01T00:00:00Z", "text/plain", b.getBytes("UTF-8"))
      }.toDF("file_group", "url", "warc_date", "content_type", "body")
    val dir = tmp()
    graft.sources.Warc.writeFiles(graft.sources.Warc.encodeResponses(
      rows, withCdx = true, cdxSurt = true), dir)
    val td = Takedown.takedownStore(spark, tmp(), "td_surt_list")
    Takedown.request(td, victims("https://e.org/bad/1"))
    assert(Takedown.eraseExports(spark, dir, td) === 1L)
    val cdx = new String(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "g0.cdx")), "UTF-8")
    // The regenerated line carries the SURT key, not a percent-encoded
    // regression (no flag to mismatch — the style is sniffed from the
    // index itself, review r15).
    assert(cdx.startsWith("org,keep)/a/0 "))
    assert(!cdx.contains("bad/1"))
  }

  test("eraseExports sniffs CANON keys whose first distinguishing line needs normalizeEncoding (review r17)") {
    val sparkSession = spark
    import sparkSession.implicits._
    // The only non-victim URL distinguishes canon from plain SOLELY
    // via encoding normalization (IDN host + unreserved escape): the
    // pre-fix sniff candidates (plain / surt / surt+www+session)
    // all mismatched the on-disk key, the index mis-sniffed as
    // plain-keyed, and the rewrite regenerated raw-URL keys — every
    // post-erase lookup by canonical key then missed.
    val rows = Seq(
      ("g0", "https://BÜcher.example/%41rchiv/0", "keep me"),
      ("g0", "https://plain.org/bad/1", "banned body"))
      .map { case (g, u, b) =>
        (g, u, "2024-01-01T00:00:00Z", "text/plain", b.getBytes("UTF-8"))
      }.toDF("file_group", "url", "warc_date", "content_type", "body")
    val dir = tmp()
    graft.sources.Warc.writeFiles(graft.sources.Warc.encodeResponses(
      rows, withCdx = true, cdxSurt = true, cdxCanon = true), dir)
    val cdxBefore = new String(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "g0.cdx")), "UTF-8")
    assert(cdxBefore.contains("example,xn--bcher-kva)/archiv/0 "))
    val td = Takedown.takedownStore(spark, tmp(), "td_canon_list")
    Takedown.request(td, victims("https://plain.org/bad/1"))
    assert(Takedown.eraseExports(spark, dir, td) === 1L)
    val cdx = new String(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "g0.cdx")), "UTF-8")
    assert(cdx.startsWith("example,xn--bcher-kva)/archiv/0 "),
      s"canon key style must survive the rewrite, got: $cdx")
    assert(!cdx.contains("bad/1"))
  }

  test("eraseExports keeps a LEGACY (reversed-IPv4) SURT index in its own style") {
    val sparkSession = spark
    import sparkSession.implicits._
    // A pre-r17 SURT export whose dotted-quad host was reversed like
    // a name ('7,113,0,203)/…') — built by writing a current export
    // and rewriting the IPv4 line's key to its legacy form, the index
    // a pre-upgrade deployment actually has on disk. The sniff must
    // settle on surtIp4 (the name-host line rules out plain; the
    // reversed quad rules out modern surt) and regenerate the
    // surviving IPv4 line byte-stable — without the Ip4 style twins
    // the line matched NO candidate and the rewrite re-keyed it in
    // the new unreversed style, breaking the byte-identical contract.
    val rows = Seq(
      ("g0", "http://203.0.113.7:8080/ip/0?x=1", "keep ip"),
      ("g0", "https://Keep.org/a/0", "keep name"),
      ("g0", "https://plain.org/bad/1", "banned body"))
      .map { case (g, u, b) =>
        (g, u, "2024-01-01T00:00:00Z", "text/plain", b.getBytes("UTF-8"))
      }.toDF("file_group", "url", "warc_date", "content_type", "body")
    val dir = tmp()
    graft.sources.Warc.writeFiles(graft.sources.Warc.encodeResponses(
      rows, withCdx = true, cdxSurt = true), dir)
    val cdxP = java.nio.file.Paths.get(dir, "g0.cdx")
    val modern = new String(Files.readAllBytes(cdxP), "UTF-8")
    assert(modern.contains("203.0.113.7:8080)/ip/0?x=1 "))
    Files.write(cdxP, modern.replace("203.0.113.7:8080)/ip/0?x=1 ",
      "7,113,0,203:8080)/ip/0?x=1 ").getBytes("UTF-8"))
    val td = Takedown.takedownStore(spark, tmp(), "td_ip4_list")
    Takedown.request(td, victims("https://plain.org/bad/1"))
    assert(Takedown.eraseExports(spark, dir, td) === 1L)
    val cdx = new String(Files.readAllBytes(cdxP), "UTF-8")
    assert(cdx.contains("7,113,0,203:8080)/ip/0?x=1 "),
      s"legacy reversed-IPv4 key must survive byte-stable, got: $cdx")
    assert(cdx.contains("org,keep)/a/0 "))
    assert(!cdx.contains("bad/1"))
  }

  test("eraseExports keeps a LEGACY (pre-encoding) canon index in its own style (review r17 #2)") {
    val sparkSession = spark
    import sparkSession.implicits._
    // A pre-r17 canon export: www/session canonicalization WITHOUT
    // encoding normalization. Built by writing a current canon export
    // and rewriting the IDN/escape line's key to its legacy form —
    // the index a pre-upgrade deployment actually has on disk. The
    // intersection sniff must settle on canonLegacy (the www/session
    // line rules out plain SURT, the legacy IDN key rules out full
    // canon) and regenerate byte-stable legacy keys — the first-
    // distinguishing-line latch flipped such an index to un-stripped
    // SURT keys.
    val rows = Seq(
      ("g0", "https://BÜcher.example/%41rchiv/0", "keep idn"),
      ("g0", "https://WWW.Shop.org/p?sid=1&x=2", "keep www"),
      ("g0", "https://plain.org/bad/1", "banned body"))
      .map { case (g, u, b) =>
        (g, u, "2024-01-01T00:00:00Z", "text/plain", b.getBytes("UTF-8"))
      }.toDF("file_group", "url", "warc_date", "content_type", "body")
    val dir = tmp()
    graft.sources.Warc.writeFiles(graft.sources.Warc.encodeResponses(
      rows, withCdx = true, cdxSurt = true, cdxCanon = true), dir)
    val cdxP = java.nio.file.Paths.get(dir, "g0.cdx")
    val legacy = new String(Files.readAllBytes(cdxP), "UTF-8")
      .replace("example,xn--bcher-kva)/archiv/0 ",
        "example,bücher)/%41rchiv/0 ")
    Files.write(cdxP, legacy.getBytes("UTF-8"))
    val td = Takedown.takedownStore(spark, tmp(), "td_legacy_list")
    Takedown.request(td, victims("https://plain.org/bad/1"))
    assert(Takedown.eraseExports(spark, dir, td) === 1L)
    val cdx = new String(Files.readAllBytes(cdxP), "UTF-8")
    assert(cdx.contains("example,bücher)/%41rchiv/0 "),
      s"legacy canon keys must survive byte-stable, got: $cdx")
    assert(cdx.contains("org,shop)/p?x=2 "),
      s"www/session canonicalization must survive, got: $cdx")
    assert(!cdx.contains("bad/1"))
  }

  test("eraseExports reaches raw .warc archives too — framing-derived spans, survivors verbatim") {
    val sparkSession = spark
    import sparkSession.implicits._
    val rows = Seq(
      ("g0", "https://e.org/keep/0", "body zero"),
      ("g0", "https://e.org/bad/1", "banned body"),
      ("g1", "https://e.org/keep/2", "body two"))
      .map { case (g, u, b) =>
        (g, u, "2024-01-01T00:00:00Z", "text/plain", b.getBytes("UTF-8"))
      }.toDF("file_group", "url", "warc_date", "content_type", "body")
    val dir = tmp()
    graft.sources.Warc.writeFiles(graft.sources.Warc.encodeResponses(
      rows, gzipped = false, withCdx = true), dir)
    val g1Before = Files.readAllBytes(
      java.nio.file.Paths.get(dir, "g1.warc")).toSeq
    val td = Takedown.takedownStore(spark, tmp(), "td_raw_list")
    Takedown.request(td, victims("https://e.org/bad/1"))
    assert(Takedown.eraseExports(spark, dir, td) === 1L)
    // Victim gone, survivor's archive byte-untouched, offsets exact.
    val back = spark.read.format("binaryFile").load(dir)
      .filter(col("path").endsWith(".warc"))
      .select(col("path"), col("content").as("bytes"))
    val uris = graft.sources.Warc.records(back)
      .select("target_uri").collect().map(_.getString(0)).toSet
    assert(uris === Set("https://e.org/keep/0", "https://e.org/keep/2"))
    assert(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "g1.warc")).toSeq === g1Before)
    val cdx = new String(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "g0.cdx")), "UTF-8")
    assert(!cdx.contains("bad/1") && cdx.contains("\"offset\":0"))
    // Idempotent rerun: clean manifests, nothing touched.
    assert(Takedown.eraseExports(spark, dir, td) === 0L)
  }

  test("erase then cluster rebuild: the collection-level zipnum index purges victims and stays seek-exact") {
    val sparkSession = spark
    import sparkSession.implicits._
    val rows = Seq(
      ("g0", "https://e.org/keep/0", "body zero"),
      ("g0", "https://e.org/bad/1", "banned body"),
      ("g1", "https://e.org/keep/2", "body two"),
      ("g1", "https://e.org/keep/3", "body three"))
      .map { case (g, u, b) =>
        (g, u, "2024-01-01T00:00:00Z", "text/plain", b.getBytes("UTF-8"))
      }.toDF("file_group", "url", "warc_date", "content_type", "body")
    val dir = tmp()
    val files = graft.sources.Warc.encodeResponses(rows, withCdx = true)
      .localCheckpoint(true)
    graft.sources.Warc.writeFiles(files, dir)
    graft.sources.Warc.writeZipnum(files, dir, shards = 2, blockLines = 2)
    // Pre-erasure cluster holds the victim line.
    def clusterLines(): Seq[String] = {
      val idx = new String(Files.readAllBytes(
        java.nio.file.Paths.get(dir, "cluster.idx")), "UTF-8")
        .split("\n").filter(_.nonEmpty).toSeq
      idx.flatMap { e =>
        val f = e.split("\t")
        val bytes = Files.readAllBytes(
          java.nio.file.Paths.get(dir, f(1)))
        new String(graft.sources.Warc.gunzip(java.util.Arrays
          .copyOfRange(bytes, f(2).toInt, f(2).toInt + f(3).toInt)).get,
          "UTF-8").split("\n").filter(_.nonEmpty).toSeq
      }
    }
    assert(clusterLines().exists(_.contains("bad/1")))
    val td = Takedown.takedownStore(spark, tmp(), "td_zn_list")
    Takedown.request(td, victims("https://e.org/bad/1"))
    assert(Takedown.eraseExports(spark, dir, td) === 1L)
    // REBUILD from the directory (the rewritten indexes, not the stale
    // export frame) — the derived-data cadence zipnumCdx documents.
    val back = spark.read.format("binaryFile").load(dir)
      .filter(col("path").endsWith(".cdx"))
      .select(regexp_extract(col("path"), "([^/]+)$", 1).as("path"),
        col("content"))
    graft.sources.Warc.writeZipnum(back, dir, shards = 2, blockLines = 2)
    val after = clusterLines()
    // Victims gone; every surviving line still recovers via the
    // summary's byte-exact offsets, sorted.
    assert(!after.exists(_.contains("bad/1")))
    assert(after.size === 3 && after === after.sorted)
  }

  test("exportVictimHits: counts direct AND revisit-implicated records, zero after erase, fails fast on an index-less archive") {
    val (dir, td) = exportFixture()
    def hits() = Takedown.exportVictimHits(spark, dir, td).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // bad/1's own record plus the g2 revisit that names it by refers.
    assert(hits() === Map("https://e.org/bad/1" -> 2L))
    Takedown.eraseExports(spark, dir, td)
    // After the erase: the victim still appears in the output, at an
    // EXPLICIT zero — absence must never read as "not checked".
    assert(hits() === Map("https://e.org/bad/1" -> 0L))
    // An archive without a manifest cannot be index-attested — loud
    // failure, never a silent partial attestation.
    graft.FsIO.local.delete(graft.FsIO.local.resolve(dir, "g1.cdx"))
    intercept[IllegalArgumentException] {
      Takedown.exportVictimHits(spark, dir, td)
    }
  }

  test("zipnum takedown-awareness: a stale cluster refuses, eraseExports(zipnumDir) rebuilds, erase-then-crash converges on rerun") {
    val sparkSession = spark
    import sparkSession.implicits._
    import graft.sources.Warc
    val rows = Seq(
      ("g0", "https://e.org/keep/0", "body zero"),
      ("g0", "https://e.org/bad/1", "banned body"),
      ("g1", "https://e.org/keep/2", "body two"),
      ("g1", "https://e.org/keep/3", "body three"))
      .map { case (g, u, b) =>
        (g, u, "2024-01-01T00:00:00Z", "text/plain", b.getBytes("UTF-8"))
      }.toDF("file_group", "url", "warc_date", "content_type", "body")
    val expDir = tmp()
    val znDir = tmp()
    val files = graft.sources.Warc.encodeResponses(rows, withCdx = true)
      .localCheckpoint(true)
    Warc.writeFiles(files, expDir)
    Warc.writeZipnum(files, znDir, shards = 2, blockLines = 2)
    // Fresh cluster: manifest matches, verified lookups serve.
    assert(!Warc.zipnumStale(znDir, expDir))
    assert(Warc.zipnumLookup(znDir, "https://e.org/bad/1",
      verifyExports = expDir).size === 1)
    val td = Takedown.takedownStore(spark, tmp(), "td_znstale_list")
    Takedown.request(td, victims("https://e.org/bad/1"))
    // CRASH WINDOW: the erase ran but the rebuild never did (no
    // zipnumDir — the r15 shape). The cluster is now STALE and the
    // verified lookup REFUSES to serve the banned attribution line the
    // unverified read would still leak (r15 verdict #2).
    assert(Takedown.eraseExports(spark, expDir, td) === 1L)
    assert(Warc.zipnumStale(znDir, expDir))
    assert(Warc.zipnumLookup(znDir, "https://e.org/bad/1").nonEmpty,
      "the unverified read serves the stale line — that's the hole")
    intercept[IllegalStateException] {
      Warc.zipnumLookup(znDir, "https://e.org/bad/1",
        verifyExports = expDir)
    }
    // RERUN with the cluster attached: the erase pass is idempotent
    // (touches nothing) but detects the staleness and heals — the
    // crash-between-erase-and-rebuild convergence.
    assert(Takedown.eraseExports(spark, expDir, td,
      zipnumDir = znDir) === 0L)
    assert(!Warc.zipnumStale(znDir, expDir))
    assert(Warc.zipnumGeometry(znDir) === Some((2, 2)),
      "the rebuild keeps the operator's geometry")
    assert(Warc.zipnumLookup(znDir, "https://e.org/bad/1",
      verifyExports = expDir).isEmpty)
    assert(Warc.zipnumLookup(znDir, "https://e.org/keep/2",
      verifyExports = expDir).size === 1)
    // ONE-SHOT path: a second victim erased WITH the cluster attached
    // rebuilds in the same call.
    Takedown.request(td, victims("https://e.org/keep/3"))
    assert(Takedown.eraseExports(spark, expDir, td,
      zipnumDir = znDir) === 1L)
    assert(!Warc.zipnumStale(znDir, expDir))
    assert(Warc.zipnumLookup(znDir, "https://e.org/keep/3",
      verifyExports = expDir).isEmpty)
    assert(Warc.zipnumLookup(znDir, "https://e.org/keep/0",
      verifyExports = expDir).size === 1)
  }

  test("eraseReps: after a takedown, re-exported banned bytes become a fresh response, never a revisit of the banned original") {
    val sparkSession = spark
    import sparkSession.implicits._
    def rows(group: String, entries: (String, String)*) =
      entries.map { case (u, b) =>
        (group, u, "2024-01-01T00:00:00Z", "text/plain",
          b.getBytes("UTF-8"))
      }.toDF("file_group", "url", "warc_date", "content_type", "body")
    val dir = tmp()
    val reps = graft.sources.Warc.revisitStore(spark, tmp(),
      "td_reps_spec")
    graft.sources.Warc.exportIncremental(
      rows("g0", "https://e.org/bad/1" -> "banned body"), reps, dir)
    val td = Takedown.takedownStore(spark, tmp(), "td_reps_list")
    Takedown.request(td, victims("https://e.org/bad/1"))
    assert(Takedown.eraseExports(spark, dir, td) === 1L)
    assert(Takedown.eraseReps(reps, td) >= 1L)
    // A re-crawl surfaces the same bytes at a NEW url: with the rep
    // purged, it ships as a fresh response (new owner) — not a revisit
    // naming removed content.
    graft.sources.Warc.exportIncremental(
      rows("g1", "https://e.org/elsewhere/2" -> "banned body"), reps, dir)
    val recs = graft.sources.Warc.records(
      spark.read.format("binaryFile").load(dir)
        .filter(col("path").endsWith(".warc.gz"))
        .select(col("path"), col("content").as("bytes")),
      gzipped = true)
    val types = recs.select("target_uri", "warc_type").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(types === Map("https://e.org/elsewhere/2" -> "response"))
  }

  test("numeric-keyed stores erase through the string-keyed victim list") {
    val numSchema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    val store = new ParquetStore(spark, numSchema, tmp(), "td_numeric",
      cleanFreq = 1000L)
    val sparkSession = spark
    import sparkSession.implicits._
    store.append(Seq((5L, "keep"), (13L, "drop")).toDF("id", "v"))
    val td = Takedown.takedownStore(spark, tmp(), "td_list_numeric")
    Takedown.request(td, victims("13"))
    assert(Takedown.erase(store, td, "id") === 1L)
    assert(store.selectAll.select("id").collect().map(_.getLong(0)).toSeq
      === Seq(5L))
    // scrub casts the frame side too
    val scrubbed = Takedown.scrub(
      Seq((5L, "keep"), (13L, "drop")).toDF("id", "v"), td, "id")
    assert(scrubbed.collect().map(_.getLong(0)).toSeq === Seq(5L))
  }
}
