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
