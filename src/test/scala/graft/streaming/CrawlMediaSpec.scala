package graft.streaming

import java.nio.file.{Files, Paths}
import graft.SparkSpec
import graft.multimodal.{AudioFp, CrawlMediaPack, Media}
import graft.sources.WarcPack
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The crawl→media pipe: WARC/HTTP-framed image and audio payloads —
  * with LYING Content-Type headers — route on sniffed bytes into the
  * durable media store already carrying dedup fingerprints; re-encoded
  * duplicates (BMP vs TIFF pictures, PCM vs FLAC audio) pair up; the
  * incremental pair query against the store returns exactly the full
  * recompute's new rows; restarts are exactly-once. */
class CrawlMediaSpec extends SparkSpec {

  private def dropFile(dir: String, name: String, id: Long): Unit = {
    Files.write(Paths.get(dir, name),
      WarcPack.gzipBytes(CrawlMediaPack.mediaWarc(id)))
    ()
  }

  test("fixture encoders decode to the group picture through both formats") {
    val pix = CrawlMediaPack.pixels16(0x2bL) // rows 0,1,3,5 lit
    for ((name, bytes) <- Seq("bmp" -> CrawlMediaPack.bmp16(pix),
      "tiff" -> CrawlMediaPack.tiff16(pix))) {
      val img = Media.decodeImage(bytes)
        .getOrElse(fail(s"$name did not decode"))
      assert((img.width, img.height) === ((16, 16)), name)
      assert(img.pixels.toSeq === pix.toSeq, s"$name pixels")
    }
    // The aHash of the constructed plane IS the group id (row means
    // against the overall mean) — the property the oracle re-derives.
    assert(Media.phashOf(CrawlMediaPack.bmp16(pix)) === 0x2bL)
    assert(Media.phashOf(CrawlMediaPack.tiff16(pix)) === 0x2bL)
  }

  test("streamed ingest: lying headers route on sniff; fingerprints land; restart exactly-once") {
    val dropDir = Files.createTempDirectory("graft_media_in").toString
    val storeDir = Files.createTempDirectory("graft_media_store").toString
    val ckpt = Files.createTempDirectory("graft_media_ckpt").toString
    dropFile(dropDir, "a.warc.gz", 6L) // gid 3: BMP + PCM WAV
    dropFile(dropDir, "b.warc.gz", 7L) // gid 3: TIFF + FLAC (re-encoded)
    Files.write(Paths.get(dropDir, "junk.warc.gz"), Array[Byte](9, 9, 9))

    val store = CrawlMedia.mediaStore(spark, storeDir)
    CrawlMedia.attach(spark, dropDir, store, ckpt,
      trigger = Trigger.AvailableNow()).awaitTermination()

    val rows = store.selectAll
      .selectExpr("url", "kind", "mime", "phash", "fp")
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) null else r.getSeq[Int](4)))).toMap
    assert(rows.size === 4)
    // The image records' Content-Type header said text/html — the sniff
    // of the body bytes must route them as images anyway.
    assert(rows("https://media.org/img/6")._1 === "image")
    assert(rows("https://media.org/img/6")._2 === "image/bmp")
    assert(rows("https://media.org/img/7")._2 === "image/tiff")
    // Same picture re-encoded → identical perceptual hash (= gid 3).
    assert(rows("https://media.org/img/6")._3 === 3L)
    assert(rows("https://media.org/img/7")._3 === 3L)
    // Same waveform re-encoded losslessly → identical fingerprint.
    val fp6 = rows("https://media.org/aud/6")._4
    val fp7 = rows("https://media.org/aud/7")._4
    assert(fp6 != null && fp6.nonEmpty && fp6 === fp7)
    assert(rows("https://media.org/aud/6")._2 === "audio/wav")
    assert(rows("https://media.org/aud/7")._2 === "audio/flac")

    // Pair search over the store: both modalities pair at distance 0.
    val pairs = CrawlMedia.pairsAll(store.selectAll)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    assert(pairs === Set(
      ("image", "https://media.org/img/6", "https://media.org/img/7", 0L),
      ("audio", "https://media.org/aud/6", "https://media.org/aud/7", 0L)))

    // Restart on the same checkpoint: only the new file lands.
    dropFile(dropDir, "c.warc.gz", 8L) // gid 4
    CrawlMedia.attach(spark, dropDir, CrawlMedia.mediaStore(spark, storeDir),
      ckpt, trigger = Trigger.AvailableNow()).awaitTermination()
    assert(store.selectAll.count() === 6)

    // A revisited URL (same media re-fetched in a later file) must NOT
    // land a second row — duplicate keys would violate the pair
    // searches' uniqueness precondition and fan out their verify joins
    // (review r12). Same for a full replay on a fresh checkpoint.
    dropFile(dropDir, "d.warc.gz", 8L) // exact same URLs as c.warc.gz
    CrawlMedia.attach(spark, dropDir, CrawlMedia.mediaStore(spark, storeDir),
      ckpt, trigger = Trigger.AvailableNow()).awaitTermination()
    assert(store.selectAll.count() === 6)
    val ckpt2 = Files.createTempDirectory("graft_media_ckpt2").toString
    CrawlMedia.attach(spark, dropDir, CrawlMedia.mediaStore(spark, storeDir),
      ckpt2, trigger = Trigger.AvailableNow()).awaitTermination()
    assert(store.selectAll.count() === 6)
    assert(store.selectAll.select("media_key").distinct().count() === 6)
  }

  /** A mixed crawl file: an HTML page (with a canonical), a plain-text
    * doc, a payload-less 301 edge, a 302 WITH an image body (must reach
    * BOTH pipelines: redirect edge + fingerprint), plus the media
    * pack's BMP/TIFF + WAV/FLAC records. */
  private def mixedWarc(id: Long): Array[Byte] = {
    import CrawlMediaPack.{http200, warcResponse}
    def http3xx(status: Int, location: String,
                cType: String, body: Array[Byte]): Array[Byte] =
      (s"HTTP/1.1 $status Moved\r\nLocation: $location\r\n" +
        s"Content-Type: $cType\r\nContent-Length: ${body.length}\r\n\r\n")
        .getBytes("ISO-8859-1") ++ body
    val html = ("<html><head><title>T" + id + "</title>" +
      "<link rel=\"canonical\" href=\"/canon" + id + "\"></head>" +
      "<body><p>hello " + id + "</p></body></html>").getBytes("UTF-8")
    warcResponse(s"https://mix.org/page/$id", id, 10,
      http200("text/html", html)) ++
      warcResponse(s"https://mix.org/plain/$id", id, 11,
        http200("text/plain", s"plain $id".getBytes("UTF-8"))) ++
      warcResponse(s"https://mix.org/old/$id", id, 12,
        http3xx(301, s"https://mix.org/page/$id", "text/html",
          Array.empty)) ++
      warcResponse(s"https://mix.org/imgmoved/$id", id, 13,
        http3xx(302, s"https://mix.org/img/$id", "image/bmp",
          CrawlMediaPack.bmp16(CrawlMediaPack.pixels16(id)))) ++
      CrawlMediaPack.mediaWarc(id)
  }

  test("shared decode: combined views == the independent passes, record for record") {
    val sparkSession = spark
    import sparkSession.implicits._
    val files = (0L until 4L).map(id =>
      (s"mem://mix/$id.warc.gz", WarcPack.gzipBytes(mixedWarc(id))))
      .toDF("path", "content")
    val combined = CrawlMedia.combinedFrom(files).localCheckpoint(true)
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).toSet
    // Text route parity (fetch rows: html+canonical, plain, BOTH 3xx
    // edges — including the image-bodied 302).
    val fetches = asSet(CrawlIngest.fetchesFrom(files))
    assert(asSet(CrawlMedia.docsView(combined)) === fetches)
    assert(fetches.nonEmpty)
    // Media route parity (image/audio fingerprints, incl. the 302's).
    val media = asSet(CrawlMedia.mediaFrom(files))
    assert(asSet(CrawlMedia.mediaView(combined)) === media)
    assert(media.nonEmpty)
    // The image-bodied 302 really is in BOTH views.
    assert(CrawlMedia.docsView(combined)
      .filter(col("url").contains("imgmoved")).count() === 4)
    assert(CrawlMedia.mediaView(combined)
      .filter(col("url").contains("imgmoved")).count() === 4)
  }

  test("attachShared: one decode pass feeds both stores; restart exactly-once") {
    val dropDir = Files.createTempDirectory("graft_shared_in").toString
    val docDir = Files.createTempDirectory("graft_shared_doc").toString
    val mediaDir = Files.createTempDirectory("graft_shared_med").toString
    val ckpt = Files.createTempDirectory("graft_shared_ck").toString
    Files.write(Paths.get(dropDir, "a.warc.gz"),
      WarcPack.gzipBytes(mixedWarc(6L)))
    val docStore = CrawlIngest.identityStore(spark, docDir,
      s"shared_docs_${System.nanoTime()}")
    val mediaStore = CrawlMedia.mediaStore(spark, mediaDir,
      s"shared_media_${System.nanoTime()}")
    def run(): Unit =
      CrawlMedia.attachShared(spark, dropDir, docStore, mediaStore, ckpt,
        trigger = Trigger.AvailableNow()).awaitTermination()
    run()
    // Identity store: html (deduped under its canonical), plain text —
    // 3xx records are edges, never documents.
    val ids = docStore.selectAll.select("identity").collect()
      .map(_.getString(0)).toSet
    assert(ids === Set("https://mix.org/canon6", "https://mix.org/plain/6"))
    // Media store: the mediaWarc pair + the 302's image fingerprint.
    assert(mediaStore.selectAll.count() === 3)
    val moved = mediaStore.selectAll
      .filter(col("url") === "https://mix.org/imgmoved/6")
      .select("kind", "phash").head()
    assert(moved.getString(0) === "image")
    assert(moved.getLong(1) === 6L) // pixels16(6) aHash = id
    // Restart: the processed file is not re-ingested; a re-crawl of the
    // same URLs dedups in both stores (identity / media_key).
    Files.write(Paths.get(dropDir, "b.warc.gz"),
      WarcPack.gzipBytes(mixedWarc(6L)))
    run()
    assert(docStore.selectAll.count() === 2)
    assert(mediaStore.selectAll.count() === 3)
    // New content still lands.
    Files.write(Paths.get(dropDir, "c.warc.gz"),
      WarcPack.gzipBytes(mixedWarc(7L)))
    run()
    assert(docStore.selectAll.count() === 4)
    assert(mediaStore.selectAll.count() === 6)
  }

  test("attachSharedRobots: robots.txt bytes in batch N gate and pace batch N+1 (three-way fork)") {
    import CrawlMediaPack.{http200, warcResponse}
    val dropDir = Files.createTempDirectory("graft_shrb_in").toString
    val docDir = Files.createTempDirectory("graft_shrb_doc").toString
    val mediaDir = Files.createTempDirectory("graft_shrb_med").toString
    val robotsDir = Files.createTempDirectory("graft_shrb_rb").toString
    val ckpt = Files.createTempDirectory("graft_shrb_ck").toString
    val docStore = CrawlIngest.identityStore(spark, docDir,
      s"shrb_docs_${System.nanoTime()}")
    val mediaStore = CrawlMedia.mediaStore(spark, mediaDir,
      s"shrb_media_${System.nanoTime()}")
    val robotsStore = CrawlSchedule.robotsStore(spark, robotsDir,
      s"shrb_rb_${System.nanoTime()}")
    def run(): Unit =
      CrawlMedia.attachSharedRobots(spark, dropDir, docStore, mediaStore,
        robotsStore, agent = "graftbot", ckpt,
        trigger = Trigger.AvailableNow()).awaitTermination()
    // Batch 1: ONE crawl file carrying a robots.txt (text/plain), an
    // HTML page, and an image — the three routes of one decode pass.
    val robots1 = "User-agent: *\nDisallow: /private/\nCrawl-delay: 5\n"
    Files.write(Paths.get(dropDir, "a.warc.gz"), WarcPack.gzipBytes(
      warcResponse("https://h1.org/robots.txt", 1L, 0,
        http200("text/plain", robots1.getBytes("UTF-8"))) ++
        warcResponse("https://h1.org/page", 1L, 1,
          http200("text/html",
            "<html><body><p>hello</p></body></html>".getBytes("UTF-8"))) ++
        warcResponse("https://h1.org/img", 1L, 2,
          http200("image/bmp", CrawlMediaPack.bmp16(
            CrawlMediaPack.pixels16(3L))))))
    run()
    // All three sinks fed from the one pass.
    assert(docStore.selectAll.filter(col("url") === "https://h1.org/page")
      .count() === 1)
    assert(mediaStore.selectAll.filter(col("kind") === "image")
      .count() === 1)
    // The policy store now gates and paces — end to end from bytes.
    val sparkSession = spark
    import sparkSession.implicits._
    val frontier = Seq(
      ("https://h1.org/ok", "h1.org"),
      ("https://h1.org/private/x", "h1.org")).toDF("url", "url_host")
    def kept() = CrawlSchedule.gateFrontier(frontier, robotsStore,
      "graftbot").select("url").collect().map(_.getString(0)).toSet
    def delay() = CrawlSchedule.delaysFrom(robotsStore)
      .filter(col("domain") === "h1.org").select("crawl_delay")
      .head().getDouble(0)
    assert(kept() === Set("https://h1.org/ok"))
    assert(delay() === 5.0)
    // Batch 2: a robots RE-FETCH with a new policy — treatment changes
    // for the batch after it (the q_fetch_schedule_robots semantics).
    Files.write(Paths.get(dropDir, "b.warc.gz"), WarcPack.gzipBytes(
      warcResponse("https://h1.org/robots.txt", 2L, 0,
        http200("text/plain",
          "User-agent: *\nCrawl-delay: 2\n".getBytes("UTF-8")))))
    run()
    assert(kept() === Set("https://h1.org/ok", "https://h1.org/private/x"))
    assert(delay() === 2.0)
  }

  test("digest pre-cluster: mirrors collapse to one representative before the banded search") {
    val sparkSession = spark
    import sparkSession.implicits._
    // Docs 2 and 3 share gid 1: the same BMP bytes at three hosts each
    // (6 exact copies) + a TIFF re-encode each (2 exact copies).
    val files = Seq(2L, 3L).map(id =>
      (s"mem://mir/$id.warc.gz",
        WarcPack.gzipBytes(CrawlMediaPack.mirrorWarc(id))))
      .toDF("path", "content")
    val media = CrawlMedia.mediaFrom(files).localCheckpoint(true)
    // Membership: one 6-member bmp cluster, one 2-member tiff cluster.
    val clusters = CrawlMedia.digestClusters(media)
      .collect().map(r => r.getString(2) -> r.getString(3)).toMap
    assert(clusters.size === 8)
    for (m <- 0 until 3; id <- Seq(2L, 3L))
      assert(clusters(s"https://m$m.org/img/$id") === "https://m0.org/img/2")
    assert(clusters("https://t.org/img/2") === "https://t.org/img/2")
    assert(clusters("https://t.org/img/3") === "https://t.org/img/2")
    // Verify fan-in: all 8 records hash identically (same picture), so
    // the un-clustered search scores every one of the 28 pairs; the
    // pre-clustered search scores exactly ONE — rep vs rep.
    assert(CrawlMedia.pairsAll(media).count() === 28L)
    val pairs = CrawlMedia.pairsAllByDigest(media)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    assert(pairs === Set(
      ("image", "https://m0.org/img/2", "https://t.org/img/2", 0L)))
  }

  test("incremental digest pre-cluster: pure mirror arrivals cost ZERO pairs; new clusters score") {
    val sparkSession = spark
    import sparkSession.implicits._
    import CrawlMediaPack.{bmp16, http200, pixels16, tiff16, warcResponse}
    def file(name: String, bytes: Array[Byte]) =
      (s"mem://minc/$name.warc.gz", WarcPack.gzipBytes(bytes))
    // Store: gid-1 and gid-2 pictures as BMPs at m0.
    val storeFiles = Seq(
      file("s1", warcResponse("https://m0.org/img/1", 1L, 0,
        http200("image/bmp", bmp16(pixels16(1L))))),
      file("s2", warcResponse("https://m0.org/img/2", 2L, 0,
        http200("image/bmp", bmp16(pixels16(2L))))))
      .toDF("path", "content")
    val store = CrawlMedia.mediaFrom(storeFiles).localCheckpoint(true)
    // Batch A: EXACT mirrors of both stored pictures at other hosts —
    // existing digests join existing clusters, zero pair memberships.
    val mirrorBatch = CrawlMedia.mediaFrom(Seq(
      file("a1", warcResponse("https://m7.org/img/1", 1L, 0,
        http200("image/bmp", bmp16(pixels16(1L))))),
      file("a2", warcResponse("https://m8.org/img/2", 2L, 0,
        http200("image/bmp", bmp16(pixels16(2L))))))
      .toDF("path", "content")).localCheckpoint(true)
    assert(CrawlMedia.pairsIncrementalByDigest(store, mirrorBatch)
      .isEmpty, "pure mirror arrivals must cost zero pair memberships")
    // Batch B: a TIFF re-encode of gid 1 (new digest, near-dup of the
    // stored BMP at ham 0, and of stored gid 2 at ham 2) + one more
    // exact mirror that must still contribute nothing.
    val newBatch = CrawlMedia.mediaFrom(Seq(
      file("b1", warcResponse("https://t.org/img/1", 1L, 0,
        http200("image/tiff", tiff16(pixels16(1L))))),
      file("b2", warcResponse("https://m9.org/img/2", 2L, 0,
        http200("image/bmp", bmp16(pixels16(2L))))))
      .toDF("path", "content")).localCheckpoint(true)
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2), r.getLong(3))).toSet
    val inc = asSet(CrawlMedia.pairsIncrementalByDigest(store, newBatch))
    // hash(gid 1) = 1, hash(gid 2) = 2 → ham(1,2) = 2 ≤ budget: the new
    // TIFF rep pairs with BOTH store reps; the m9 mirror with neither.
    assert(inc === Set(
      ("image", "https://m0.org/img/1", "https://t.org/img/1", 0L),
      ("image", "https://m0.org/img/2", "https://t.org/img/1", 2L)))
    // Equivalence: the full digest-pre-clustered recompute over
    // store ∪ batch, minus store-only pairs (ids arranged so the
    // union's min-rep equals the sticky rep).
    val full = asSet(
      CrawlMedia.pairsAllByDigest(store.unionByName(newBatch)))
    val storeOnly = asSet(CrawlMedia.pairsAllByDigest(store))
    assert(inc === (full -- storeOnly))
  }

  test("durable reps: first-seen names survive smaller keys, 4 batches, and a collapse") {
    val sparkSession = spark
    import sparkSession.implicits._
    import CrawlMediaPack.{bmp16, http200, pixels16, tiff16, warcResponse}
    def media(rows: (String, Long, Array[Byte])*) =
      CrawlMedia.mediaFrom(rows.zipWithIndex.map { case ((u, id, b), i) =>
        (s"mem://rep/$u/$i.warc.gz",
          WarcPack.gzipBytes(warcResponse(u, id, i, http200("image/bmp", b))))
      }.toDF("path", "content")).localCheckpoint(true)
    val repDir = Files.createTempDirectory("graft_reps").toString
    // collapseEvery = 2: the third append re-snapshots — rep names must
    // not care.
    val reps = CrawlMedia.repStore(spark, repDir,
      s"reps_${System.nanoTime()}", collapseEvery = 2L)
    def pairs(batch: org.apache.spark.sql.DataFrame) =
      CrawlMedia.pairsIncrementalStable(batch, reps)
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getString(2), r.getLong(3))).toSet
    def repOf(bytes: Array[Byte]): String = reps.selectAll
      .filter(col("digest_key") ===
        "image#" + graft.sources.Warc.sha1Digest(bytes))
      .select("rep").collect()
      .map(_.getString(0)).toList match { case r :: Nil => r }
    // Batch 1: gid-1 picture FIRST SEEN at m5 → the cluster's name,
    // forever.
    assert(pairs(media(("https://m5.org/img/1", 1L, bmp16(pixels16(1L)))))
      === Set.empty)
    assert(repOf(bmp16(pixels16(1L))) === "https://m5.org/img/1")
    // Batch 2: an exact mirror at a0 — ALPHABETICALLY SMALLER, the key
    // a min()-over-store rep would rename to — plus a new gid-2
    // cluster. The mirror contributes nothing and renames nothing.
    val p2 = pairs(media(
      ("https://a0.org/img/1", 1L, bmp16(pixels16(1L))),
      ("https://m5.org/img/2", 2L, bmp16(pixels16(2L)))))
    assert(p2 === Set(("image", "https://m5.org/img/1",
      "https://m5.org/img/2", 2L))) // ham(1,2) = 2
    assert(repOf(bmp16(pixels16(1L))) === "https://m5.org/img/1")
    // Batch 3 (this append trips the collapse): another smaller-key
    // mirror (a1) + a TIFF re-encode of gid 1 (new digest). Pairs must
    // reference the FIRST-SEEN m5 names, not a0/a1.
    val b3 = CrawlMedia.mediaFrom(Seq(
      ("mem://rep/a1.warc.gz", WarcPack.gzipBytes(
        warcResponse("https://a1.org/img/1", 1L, 0,
          http200("image/bmp", bmp16(pixels16(1L)))))),
      ("mem://rep/t.warc.gz", WarcPack.gzipBytes(
        warcResponse("https://t.org/img/1", 1L, 1,
          http200("image/tiff", tiff16(pixels16(1L)))))))
      .toDF("path", "content")).localCheckpoint(true)
    assert(pairs(b3) === Set(
      ("image", "https://m5.org/img/1", "https://t.org/img/1", 0L),
      ("image", "https://m5.org/img/2", "https://t.org/img/1", 2L)))
    // The collapse ran (generations folded to ≤ collapseEvery+1) and
    // the table still holds exactly one FIRST-SEEN row per cluster.
    assert(reps.generations.length <= 3)
    assert(reps.selectAll.count() === 3)
    assert(repOf(bmp16(pixels16(1L))) === "https://m5.org/img/1")
    assert(repOf(bmp16(pixels16(2L))) === "https://m5.org/img/2")
    // Batch 4, post-collapse: yet another smaller-key mirror — still
    // zero pairs, still no rename (the r13 weak-mark scenario).
    assert(pairs(media(("https://a2.org/img/1", 1L, bmp16(pixels16(1L)))))
      === Set.empty)
    assert(repOf(bmp16(pixels16(1L))) === "https://m5.org/img/1")
    // TIFF cluster keeps ITS first-seen name too.
    assert(reps.selectAll.filter(col("rep") === "https://t.org/img/1")
      .count() === 1)
  }

  test("incremental pairs == full recompute minus base-only pairs") {
    val sparkSession = spark
    import sparkSession.implicits._
    // Groups of four docs → rich pair structure; split 0-5 base, 6-11 new.
    val all = (0L to 11L).map { id =>
      (s"mem://w/$id.warc.gz",
        WarcPack.gzipBytes(CrawlMediaPack.mediaWarc(id)))
    }
    def media(rows: Seq[(String, Array[Byte])]) =
      CrawlMedia.mediaFrom(rows.toDF("path", "content"))
        .withColumn("media_id",
          regexp_extract(col("url"), "(\\d+)$", 1).cast("long") * 2 +
            when(col("kind") === "audio", 1).otherwise(0))
    val base = media(all.take(6)).localCheckpoint(true)
    val batch = media(all.drop(6)).localCheckpoint(true)
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val full = asSet(CrawlMedia.pairsAll(base.union(batch), "media_id"))
    val baseOnly = asSet(CrawlMedia.pairsAll(base, "media_id"))
    val inc = asSet(CrawlMedia.pairsIncremental(base, batch, "media_id"))
    assert(inc === (full -- baseOnly))
    assert(inc.nonEmpty && baseOnly.nonEmpty, "degenerate fixture")
  }
}
