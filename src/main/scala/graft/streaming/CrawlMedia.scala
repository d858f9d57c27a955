package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.multimodal.{AudioFp, Media}
import graft.sources.{Http, Mime, Warc}
import graft.store.ParquetStore

/** The crawl→media pipe (r11 verdict #1): the sibling of
  * [[CrawlIngest]] for the records its text route drops. A `.warc.gz`
  * crawl carries images and audio alongside pages; this routes the
  * sniff-identified `image/⋆` / `audio/⋆` payloads (crawl Content-Type
  * headers lie — routing is on [[Mime.sniff]] of the body bytes, same
  * as the text route) into a durable [[ParquetStore]] whose rows
  * already carry the DEDUP FINGERPRINTS — the image perceptual hash
  * ([[Media.phashOf]]: real decode → 16×16 luma thumbnail → aHash) and
  * the audio Haar fingerprint ([[AudioFp.fingerprintBytes]]: real
  * PCM/G.711/FLAC decode → sign-of-band-delta codes) — so cross-batch
  * pair search never touches payload bytes again.
  *
  * Scale shape: extraction is ONE narrow per-partition byte pass (scan
  * → mapPartitions → write, no shuffle — each of 1000 executors
  * fingerprints its own files); the store grows by one compacted
  * generation per trigger; and [[pairsIncremental]] scores a new batch
  * against the accumulated store with banded equi-joins only — the
  * store side is never self-joined, so steady-state cost is O(batch),
  * the [[graft.store.PrefixIndexStore]] discipline applied to media.
  *
  * Raw payload bytes are NOT stored — at 100 TB the media store is a
  * fingerprint index (a few dozen bytes per object keyed by URL), not
  * a blob store; `byte_len` + `sha1_b32` keep enough identity to fetch
  * the original from the WARC (path, record_ix) when a keep-decision
  * needs it. */
object CrawlMedia {

  /** The media-store schema: provenance (path, record_ix, url, status),
    * the sniffed type + kind route, payload length and content digest,
    * and the kind's fingerprint — `phash` for images (null for audio),
    * `fp` for audio (null for images; empty array = decoded but shorter
    * than two analysis frames). Undecodable payloads keep NULL in their
    * kind's fingerprint column rather than vanishing — a corrupt image
    * is still a crawl fact, and the pair queries skip nulls. */
  val MediaSchema: StructType = StructType(Seq(
    StructField("path", StringType), StructField("record_ix", LongType),
    StructField("url", StringType), StructField("http_status", LongType),
    StructField("mime", StringType), StructField("kind", StringType),
    StructField("byte_len", LongType), StructField("sha1_b32", StringType),
    StructField("phash", LongType), StructField("fp", ArrayType(IntegerType)),
    StructField("media_key", StringType)))

  /** The batch transform: (path, content) `.warc.gz` file rows → media
    * rows with fingerprints. Shares [[CrawlIngest.documentsFrom]]'s
    * single-decode dispatch discipline: ONE mapPartitions pass computes
    * route + fingerprint per record (a per-kind filtered union would
    * re-run the gunzip→WARC→HTTP→sniff chain once per kind —
    * measured +47% for the text route, SCALE.md r11). Video payloads
    * are excluded: frame location is real but payload decode is the
    * documented codec boundary, so there is no honest fingerprint to
    * index yet. `nCells` sizes the perceptual hash (16 keeps the
    * oracle-checked default; production corpora want 48+ — pigeonhole
    * banding cuts the hash into maxHamming+1 segments, and 16-bit
    * hashes leave ~6-bit band keys whose buckets grow with the corpus:
    * the measured band-entropy trap, SCALE.md r11). */
  def mediaFrom(files: DataFrame, bytesCol: String = "content",
                gzipped: Boolean = true, nCells: Int = 16): DataFrame = {
    val recs = Warc.records(
        files.select(col("path"), col(bytesCol).as("bytes")),
        bytesCol = "bytes", gzipped = gzipped)
      .filter(col("record_ix") >= 0 && col("warc_type") === "response")
    val base = Mime.withSniffed(
        Http.responses(recs).filter(col("http_status") >= 0),
        "body", "http_content_type")
      .select(col("path"), col("record_ix"),
        col("target_uri").as("url"), col("http_status"),
        col("mime_sniffed"), col("body"))
    base.mapPartitions { it =>
      it.flatMap { row =>
        val mime = row.getString(4)
        val kind =
          if (mime != null && mime.startsWith("image/")) "image"
          else if (mime != null && (mime.startsWith("audio/") ||
            mime == "application/ogg")) "audio"
          else null
        if (kind == null) Iterator.empty
        else {
          val body = row.getAs[Array[Byte]](5)
          val (phash, fp) = kind match {
            case "image" =>
              // Index only REAL decodes: phashOf's raw-bytes fallback
              // would "fingerprint" corrupt payloads by their encoded
              // bytes, pairing identical files but nothing re-encoded —
              // a dedup key that silently stops meaning "same picture".
              (Media.decodeImage(body)
                .map(Media.phashOfImage(_, nCells)): Option[Long], None)
            case _ =>
              (None, AudioFp.fingerprintBytes(body))
          }
          val url = row.getString(2)
          // The store's dedup identity: the URL when present, the
          // provenance pair otherwise (rare URI-less records must not
          // collapse onto one null key).
          val mediaKey =
            if (url != null) url
            else row.getString(0) + "#" + row.getLong(1)
          Iterator.single(Row(row.getString(0), row.getLong(1),
            url, row.getLong(3), mime, kind,
            if (body == null) 0L else body.length.toLong,
            if (body == null) null else Warc.sha1Digest(body),
            phash.map(java.lang.Long.valueOf).orNull,
            fp.orNull, mediaKey))
        }
      }
    }(org.apache.spark.sql.Encoders.row(MediaSchema))
  }

  /** Open (or resume) the media store at `storePath`. */
  def mediaStore(spark: SparkSession, storePath: String,
                 tableName: String = "crawl_media"): ParquetStore =
    new ParquetStore(spark, MediaSchema, storePath, tableName)

  /** Attach the drop-folder stream (the [[CrawlIngest.attach]] twin):
    * every trigger fingerprints newly arrived `.warc.gz` files' media
    * records and appends one compacted generation. Run it NEXT TO the
    * text attach on the same drop dir — each stream has its own
    * checkpoint and reads the files independently (media is typically a
    * small fraction of records; sharing one pass would weld the two
    * pipelines' failure domains together for a minor decode saving). */
  def attach(spark: SparkSession, dropDir: String, store: ParquetStore,
             checkpoint: String,
             trigger: Trigger = Trigger.ProcessingTime(10000L),
             maxFilesPerTrigger: Int = 64): StreamingQuery = {
    val binarySchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    spark.readStream.format("binaryFile")
      .schema(binarySchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("pathGlobFilter", "*.warc.gz")
      .load(dropDir)
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // Exact-dedup append by media_key (URL): a re-fetched URL
        // (revisit, mirror) or a crashed-and-replayed batch must not
        // land a second row — duplicate ids would violate the pair
        // searches' uniqueness precondition and fan out their verify
        // joins. First capture per key wins; content-version tracking
        // is the WARC revisit surface's job, not the dedup store's.
        if (!batch.isEmpty)
          CrawlIngest.dedupAppendByKey(store, mediaFrom(batch),
            "media_key", struct(col("path"), col("record_ix")))
        ()
      }
      .start()
  }

  /** Near-duplicate media pairs between a NEW batch and the
    * accumulated store (plus within the batch itself): image pairs by
    * perceptual-hash hamming ([[Media.phashPairsIncremental]] — exact
    * pigeonhole banding), audio pairs by fingerprint hamming
    * ([[AudioFp.pairsIncremental]] — packed-band LSH + verify). Both
    * sides keyed by `idCol` (default `url` — the crawl identity; pass a
    * digest- or identity-derived column to dedup across mirrors).
    * Undecoded rows (null fingerprint) are skipped; `media_key` (the
    * store's dedup identity) is the default key. Output:
    * (kind, media_a, media_b, ham) with media_a < media_b — exactly the
    * pairs a full recompute over store ∪ batch would add. */
  def pairsIncremental(baseMedia: DataFrame, batchMedia: DataFrame,
                       idCol: String = "media_key", nBits: Int = 16,
                       imageMaxHamming: Int = 2,
                       audioMaxHamming: Int = 4): DataFrame = {
    def img(df: DataFrame) = df
      .filter(col("kind") === "image" && col("phash").isNotNull)
      .select(col(idCol), col("phash"))
    def aud(df: DataFrame) = df
      .filter(col("kind") === "audio" && col("fp").isNotNull)
      .select(col(idCol), col("fp"))
    val imgPairs = Media.phashPairsIncremental(img(baseMedia),
        img(batchMedia), nBits, imageMaxHamming, idCol)
      .select(lit("image").as("kind"), col("a").as("media_a"),
        col("b").as("media_b"), col("hamming").as("ham"))
    val audPairs = AudioFp.pairsIncremental(aud(baseMedia),
        aud(batchMedia), audioMaxHamming, idCol = idCol)
      .select(lit("audio").as("kind"), col("media_a"), col("media_b"),
        col("ham"))
    imgPairs.union(audPairs)
  }

  /** Full-corpus variant of [[pairsIncremental]] (first snapshot / the
    * batch-mode audit): all ≤-budget pairs within `media`. */
  def pairsAll(media: DataFrame, idCol: String = "media_key", nBits: Int = 16,
               imageMaxHamming: Int = 2, audioMaxHamming: Int = 4)
      : DataFrame = {
    val imgPairs = Media.phashPairs(
        media.filter(col("kind") === "image" && col("phash").isNotNull)
          .select(col(idCol), col("phash")),
        nBits, imageMaxHamming, idCol)
      .select(lit("image").as("kind"), col("a").as("media_a"),
        col("b").as("media_b"), col("hamming").as("ham"))
    val audPairs = AudioFp.pairs(
        media.filter(col("kind") === "audio" && col("fp").isNotNull)
          .select(col(idCol), col("fp")),
        audioMaxHamming, idCol = idCol)
      .select(lit("audio").as("kind"), col("media_a"), col("media_b"),
        col("ham"))
    imgPairs.union(audPairs)
  }
}
