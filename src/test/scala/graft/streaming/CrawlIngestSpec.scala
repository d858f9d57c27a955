package graft.streaming

import java.nio.file.{Files, Paths}
import graft.SparkSpec
import graft.sources.{HttpPack, WarcPack}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

/** The crawl drop-folder stream: files in → extracted documents in a
  * durable store, exactly-once across restarts (checkpointed file
  * tracking), corrupt files dropped without failing the trigger. */
class CrawlIngestSpec extends SparkSpec {

  /** One .warc.gz file whose response payload is a real HTTP message
    * wrapping an HTML page around `body` — with a nav bar of links, so
    * main_text (boilerplate-filtered) differs from text. */
  private def warcGz(id: Long, body: String): Array[Byte] = {
    val page = s"<html><head><title>t$id</title></head><body>" +
      "<nav><a href=\"/\">Home</a> <a href=\"/a\">About</a></nav><p>" +
      body + "</p></body></html>"
    val http = HttpPack.httpMessage(
      Seq("Content-Type" -> "text/html; charset=utf-8"),
      page.getBytes("UTF-8"))
    WarcPack.gzipBytes(WarcPack.warcFile(id, http))
  }

  private def runAvailable(dropDir: String, store: graft.store.ParquetStore,
                           checkpoint: String): Unit = {
    val q = CrawlIngest.attach(spark, dropDir, store, checkpoint,
      trigger = Trigger.AvailableNow())
    q.awaitTermination()
  }

  test("drop-folder ingest: WARC→HTTP→HTML chain lands documents; restarts are exactly-once") {
    val dropDir = Files.createTempDirectory("graft_crawl_in").toString
    val storeDir = Files.createTempDirectory("graft_crawl_store").toString
    val ckpt = Files.createTempDirectory("graft_crawl_ckpt").toString
    Files.write(Paths.get(dropDir, "a.warc.gz"),
      warcGz(1L, "alpha document one with enough prose to keep"))
    Files.write(Paths.get(dropDir, "b.warc.gz"),
      warcGz(2L, "beta document two with enough prose to keep"))
    // A corrupt file must not fail the trigger or land rows.
    Files.write(Paths.get(dropDir, "junk.warc.gz"),
      Array[Byte](1, 2, 3, 4, 5))
    // A non-matching extension is not picked up at all.
    Files.write(Paths.get(dropDir, "notes.txt"), "ignore".getBytes)

    val store = CrawlIngest.docStore(spark, storeDir)
    runAvailable(dropDir, store, ckpt)
    val docs = store.selectAll
      .selectExpr("url", "http_status", "title", "text", "main_text")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2),
        r.getString(3), r.getString(4)))).toMap
    assert(docs.size === 2)
    // text keeps everything visible; main_text drops the nav chrome.
    assert(docs("https://example.org/doc/1") ===
      ((200L, "t1", "Home About alpha document one with enough prose to keep",
        "alpha document one with enough prose to keep")))
    assert(docs("https://example.org/doc/2") ===
      ((200L, "t2", "Home About beta document two with enough prose to keep",
        "beta document two with enough prose to keep")))

    // "Restart": a new stream on the SAME checkpoint sees the old files
    // as consumed — only the newly dropped file lands, no duplicates.
    Files.write(Paths.get(dropDir, "c.warc.gz"), warcGz(3L, "gamma doc three"))
    val store2 = CrawlIngest.docStore(spark, storeDir)
    runAvailable(dropDir, store2, ckpt)
    val after = store2.selectAll.selectExpr("url").collect()
      .map(_.getString(0)).sorted.toSeq
    assert(after === Seq("https://example.org/doc/1",
      "https://example.org/doc/2", "https://example.org/doc/3"))
  }

  test("attachByIdentity: revisits, redirect-moved and canonical copies dedup ACROSS batches") {
    def record(uri: String, status: String,
               headers: Seq[(String, String)], body: String): Array[Byte] = {
      val http = (s"HTTP/1.1 $status\r\n" +
        headers.map { case (k, v) => s"$k: $v\r\n" }.mkString +
        "\r\n" + body).getBytes("ISO-8859-1")
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
        "WARC-Date: 2024-01-01T00:00:00Z\r\n" +
        s"Content-Length: ${http.length}\r\n\r\n").getBytes("ISO-8859-1") ++
        http ++ "\r\n\r\n".getBytes("ISO-8859-1")
    }
    def page(body: String, canonical: String = null): String =
      "<html><head>" +
        (if (canonical == null) ""
         else s"""<link rel=canonical href="$canonical">""") +
        s"</head><body><p>$body enough prose to extract</p></body></html>"
    val html = Seq("Content-Type" -> "text/html; charset=utf-8")
    val dropDir = Files.createTempDirectory("graft_ident_in").toString
    val storeDir = Files.createTempDirectory("graft_ident_st").toString
    val ckpt = Files.createTempDirectory("graft_ident_ck").toString
    def run(): Unit = {
      val q = CrawlIngest.attachByIdentity(spark, dropDir,
        CrawlIngest.identityStore(spark, storeDir), ckpt,
        trigger = Trigger.AvailableNow())
      q.awaitTermination()
    }
    // Batch 1: one page, fetched with a tracking param the identity
    // normalization strips.
    Files.write(Paths.get(dropDir, "b1.warc.gz"), WarcPack.gzipBytes(
      record("https://e.org/a?utm_source=x", "200 OK", html, page("alpha"))))
    run()
    val store = CrawlIngest.identityStore(spark, storeDir)
    assert(store.selectAll.count() === 1)
    assert(store.selectAll.select("identity").head().getString(0) ===
      "https://e.org/a")
    // Batch 2: a REVISIT of the same page (re-crawl, clean URL), a
    // REDIRECT-MOVED copy (content recorded under the requested URL
    // /moved whose 301 chain lands on /a — the batch's own 3xx record
    // carries the edge), a CANONICAL copy (/alt declaring /a), and one
    // genuinely new page. Only the new page may land.
    Files.write(Paths.get(dropDir, "b2.warc.gz"), WarcPack.gzipBytes(
      record("https://e.org/a", "200 OK", html, page("alpha revisited")) ++
        record("https://e.org/moved", "301 Moved Permanently",
          Seq("Location" -> "/a"), "") ++
        record("https://e.org/moved", "200 OK", html, page("alpha moved")) ++
        record("https://e.org/alt", "200 OK", html,
          page("alpha alt", canonical = "/a")) ++
        record("https://e.org/fresh", "200 OK", html, page("brand new"))))
    run()
    val rows = store.selectAll.select("url", "identity", "rst_id").collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(rows.size === 2, s"expected 2 identities, got: $rows")
    assert(rows("https://e.org/a?utm_source=x") === (("https://e.org/a", 1L)))
    assert(rows("https://e.org/fresh") === (("https://e.org/fresh", 2L)))
    // Replay idempotence: a re-attach on a FRESH checkpoint re-reads
    // every file (simulating a replayed trigger after a crash) — the
    // store-side anti-join must refuse all of it.
    val ckpt2 = Files.createTempDirectory("graft_ident_ck2").toString
    val q2 = CrawlIngest.attachByIdentity(spark, dropDir,
      CrawlIngest.identityStore(spark, storeDir), ckpt2,
      trigger = Trigger.AvailableNow())
    q2.awaitTermination()
    assert(store.selectAll.count() === 2)

    // A 301 with an HTML STUB body ("Moved…" pages — common in real
    // crawls) is an EDGE, never a document: admitted, its stub would
    // take the TARGET's identity and shadow the real page forever
    // (review r12). The genuine page, arriving in the SAME batch with
    // a later record_ix, must be the one stored.
    Files.write(Paths.get(dropDir, "b3.warc.gz"), WarcPack.gzipBytes(
      record("https://e.org/stub", "301 Moved Permanently",
        html ++ Seq("Location" -> "/target"),
        "<html><body>Moved to target enough prose here</body></html>") ++
        record("https://e.org/target", "200 OK", html,
          page("the real target page"))))
    run()
    val t = store.selectAll
      .filter(col("identity") === "https://e.org/target")
      .select("url", "text").collect()
    assert(t.length === 1)
    assert(t.head.getString(0) === "https://e.org/target")
    assert(t.head.getString(1).contains("the real target page"))
  }

  test("withIdentity: a RELATIVE canonical on a redirect-recorded page resolves against the FINAL host") {
    val sparkSession = spark
    import sparkSession.implicits._
    // Content recorded under old.com/p, whose fetch 301s to new.com/p;
    // the page declares <link rel=canonical href="/p"> — the canonical
    // belongs to the SERVING host (new.com), not the fetch URL's.
    val pages = Seq(("https://old.com/p", "/p"))
      .toDF("url", "canonical_raw")
    val log = Seq(("https://old.com/p", 301L, "https://new.com/p"))
      .toDF("url", "status", "location")
    val out = graft.operators.Url.withIdentity(pages, log,
        canonicalCol = "canonical_raw")
      .select("identity").head().getString(0)
    assert(out === "https://new.com/p")
    // An ABSOLUTE canonical passes through resolve unchanged, so
    // pre-resolved callers (q_doc_identity's withPageMeta) are intact.
    val abs = Seq(("https://old.com/p", "https://canon.org/x"))
      .toDF("url", "canonical_raw")
    assert(graft.operators.Url.withIdentity(abs, log,
      canonicalCol = "canonical_raw")
      .select("identity").head().getString(0) === "https://canon.org/x")
  }

  test("attachDeduped: the same URL across files and restarts lands ONCE") {
    val dropDir = Files.createTempDirectory("graft_crawl_dd_in").toString
    val storeDir = Files.createTempDirectory("graft_crawl_dd_store").toString
    val ckpt = Files.createTempDirectory("graft_crawl_dd_ckpt").toString
    // Two files carrying the SAME doc id → same URL; one distinct.
    Files.write(Paths.get(dropDir, "a.warc.gz"),
      warcGz(1L, "first capture of the duplicated page body"))
    Files.write(Paths.get(dropDir, "b.warc.gz"),
      warcGz(1L, "second capture of the duplicated page body"))
    Files.write(Paths.get(dropDir, "c.warc.gz"),
      warcGz(2L, "a distinct page with its own url body"))
    val store = CrawlIngest.docStore(spark, storeDir, "crawl_dd")
    val q = CrawlIngest.attachDeduped(spark, dropDir, store, ckpt,
      trigger = Trigger.AvailableNow())
    q.awaitTermination()
    val urls = store.selectAll.selectExpr("url").collect()
      .map(_.getString(0)).sorted.toSeq
    assert(urls === Seq("https://example.org/doc/1",
      "https://example.org/doc/2"))
    // Restart on the same checkpoint: the dedup STATE survives — a new
    // file with an already-ingested URL is refused, a new URL lands.
    Files.write(Paths.get(dropDir, "d.warc.gz"),
      warcGz(1L, "third capture after restart must be refused"))
    Files.write(Paths.get(dropDir, "e.warc.gz"),
      warcGz(3L, "a brand new page arriving after restart"))
    val store2 = CrawlIngest.docStore(spark, storeDir, "crawl_dd2")
    val q2 = CrawlIngest.attachDeduped(spark, dropDir, store2, ckpt,
      trigger = Trigger.AvailableNow())
    q2.awaitTermination()
    val after = store2.selectAll.selectExpr("url").collect()
      .map(_.getString(0)).sorted.toSeq
    assert(after === Seq("https://example.org/doc/1",
      "https://example.org/doc/2", "https://example.org/doc/3"))
  }

  test("documentsFrom: the shared batch transform extracts through the full chain") {
    val sparkSession = spark
    import sparkSession.implicits._
    val files = Seq(
      ("f1", warcGz(7L, "doc seven text")),
      ("f2", Array[Byte](9, 9, 9)) // corrupt → dropped, not thrown
    ).toDF("path", "content")
    val out = CrawlIngest.documentsFrom(files)
      .selectExpr("path", "url", "title", "text").collect()
    assert(out.length === 1)
    assert(out(0).getString(1) === "https://example.org/doc/7")
    assert(out(0).getString(2) === "t7")
    assert(out(0).getString(3) === "Home About doc seven text")
  }

  test("documentsFrom routes by SNIFFED type: html, pdf, plain text, binary dropped") {
    val sparkSession = spark
    import sparkSession.implicits._
    import graft.sources.PdfPack
    def respGz(id: Long, ct: String, body: Array[Byte]): Array[Byte] =
      WarcPack.gzipBytes(WarcPack.warcFile(id,
        HttpPack.httpMessage(Seq("Content-Type" -> ct), body)))
    val files = Seq(
      ("html", respGz(1L, "text/html",
        "<html><head><title>h</title></head><body><p>web page</p></body></html>"
          .getBytes("UTF-8"))),
      // A PDF served under a LYING text/html header still routes to
      // the PDF extractor (the body sniffs %PDF).
      ("pdf", respGz(2L, "text/html",
        PdfPack.pdfFile(2L, "pdf body", compress = true, hexFirst = false,
          withInfo = true))),
      ("plain", respGz(3L, "application/octet-stream",
        "just plain words".getBytes("UTF-8"))),
      // A PNG is not a text document: dropped from the documents table.
      ("png", respGz(4L, "text/plain",
        Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a, 1).map(_.toByte))),
      // XHTML: the '<?xml' prolog wins the sniff (text/xml) but the
      // page must still extract — dropping it would silently lose a
      // common page class.
      ("xhtml", respGz(5L, "application/xhtml+xml",
        ("<?xml version=\"1.0\"?><!DOCTYPE html><html><head>" +
          "<title>x5</title></head><body><p>xhtml body</p></body></html>")
          .getBytes("UTF-8")))
    ).toDF("path", "content")
    val out = CrawlIngest.documentsFrom(files)
      .selectExpr("path", "title", "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(out === Set(
      ("html", "h", "web page"),
      ("pdf", "Title 2", "d2 says:\npdf \nbody\nkern gapx\nesc (x) \\ done"),
      ("plain", null, "just plain words"),
      ("xhtml", "x5", "xhtml body")))
  }
}
