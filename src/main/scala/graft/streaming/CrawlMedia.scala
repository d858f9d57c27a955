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
  /** Per-record MEDIA-ROUTE dispatch — the [[MediaSchema]] row for one
    * decoded response record, None for non-media. Extracted as a plain
    * function so the independent pass and the combined text+media pass
    * ([[combinedFrom]]) share it verbatim. */
  private[streaming] def mediaRowOf(path: String, recordIx: Long,
                                    url: String, status: Long, mime: String,
                                    body: Array[Byte], nCells: Int)
      : Option[Row] = {
    val kind =
      if (mime != null && mime.startsWith("image/")) "image"
      else if (mime != null && (mime.startsWith("audio/") ||
        mime == "application/ogg")) "audio"
      else null
    if (kind == null) None
    else {
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
      // The store's dedup identity: the URL when present, the
      // provenance pair otherwise (rare URI-less records must not
      // collapse onto one null key).
      val mediaKey = if (url != null) url else path + "#" + recordIx
      Some(Row(path, recordIx, url, status, mime, kind,
        if (body == null) 0L else body.length.toLong,
        if (body == null) null else Warc.sha1Digest(body),
        phash.map(java.lang.Long.valueOf).orNull,
        fp.orNull, mediaKey))
    }
  }

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
        mediaRowOf(row.getString(0), row.getLong(1), row.getString(2),
          row.getLong(3), row.getString(4), row.getAs[Array[Byte]](5),
          nCells).iterator
      }
    }(org.apache.spark.sql.Encoders.row(MediaSchema))
  }

  /** Open (or resume) the media store at `storePath`. Collapse-managed
    * (r12 verdict #1): the `media_key`-deduped appends keep rows unique
    * per key, so the periodic re-snapshot is a pure compaction — the
    * store side of [[pairsIncremental]] reads one base + a bounded
    * delta tail however long the crawl has run. `collapseEvery = 0`
    * restores full history. */
  def mediaStore(spark: SparkSession, storePath: String,
                 tableName: String = "crawl_media",
                 collapseEvery: Long = 16L): ParquetStore =
    new ParquetStore(spark, MediaSchema, storePath, tableName,
      collapseKeys = Seq("media_key"), collapseEvery = collapseEvery)

  /** One row per ROUTED record of the SHARED-DECODE pass
    * ([[combinedFrom]]): `rec_kind` discriminates (`doc` rows carry
    * [[CrawlIngest.FetchSchema]]'s columns, media fields null; `media`
    * rows the reverse). The four provenance columns are shared. A
    * media-typed 3xx record yields BOTH rows — its fingerprint for the
    * media store AND its redirect edge for the identity walk — exactly
    * as the two independent passes would. */
  val CombinedSchema: StructType = StructType(
    StructField("rec_kind", StringType) +:
      (CrawlIngest.FetchSchema.fields ++ MediaSchema.fields.drop(4)))

  /** The SHARED-DECODE crawl pass (r12 verdict #2): ONE gunzip → WARC →
    * HTTP → sniff chain ([[CrawlIngest.responseBase]]) dispatching each
    * record through BOTH routes' per-record functions
    * ([[CrawlIngest.docRowsOf]] / [[mediaRowOf]] — the same code the
    * independent passes run, so parity is by construction and
    * spec-pinned). [[CrawlIngest.fetchesFrom]] + [[mediaFrom]] on the
    * same files decode every `.warc.gz` TWICE — the documented
    * failure-domain tradeoff of running the attaches independently;
    * this pass is the opt-in alternative when decode dominates (the
    * corpus's dominant stage: soaked at 1×/2×/4×, SCALE.md r13).
    * Split the result with [[docsView]]/[[mediaView]]. */
  def combinedFrom(files: DataFrame, bytesCol: String = "content",
                   gzipped: Boolean = true, nCells: Int = 16): DataFrame = {
    val nMediaFields = MediaSchema.fields.length - 4
    val nFetchExtra = CrawlIngest.FetchSchema.fields.length - 4
    CrawlIngest.responseBase(files, bytesCol, gzipped).mapPartitions { it =>
      it.flatMap { row =>
        val path = row.getString(0)
        val recordIx = row.getLong(1)
        val url = row.getString(2)
        val status = row.getLong(3)
        val mime = row.getString(4)
        val body = row.getAs[Array[Byte]](5)
        val docs = CrawlIngest.docRowsOf(path, recordIx, url, status,
          mime, body, row.getString(6),
          if (row.isNullAt(7)) null else row.getString(7),
          withCanonical = true)
          .map(d => Row.fromSeq("doc" +: d.toSeq ++:
            Seq.fill[Any](nMediaFields)(null)))
        val media = mediaRowOf(path, recordIx, url, status, mime, body,
          nCells).iterator
          .map(m => Row.fromSeq("media" +: (m.toSeq.take(4) ++
            Seq.fill[Any](nFetchExtra)(null) ++ m.toSeq.drop(4))))
        docs ++ media
      }
    }(org.apache.spark.sql.Encoders.row(CombinedSchema))
  }

  /** The text route's view of a [[combinedFrom]] frame —
    * [[CrawlIngest.FetchSchema]] rows, identical to
    * [[CrawlIngest.fetchesFrom]] on the same files. */
  def docsView(combined: DataFrame): DataFrame =
    combined.filter(col("rec_kind") === "doc")
      .select(CrawlIngest.FetchSchema.fieldNames.map(col).toIndexedSeq: _*)

  /** The media route's view of a [[combinedFrom]] frame —
    * [[MediaSchema]] rows, identical to [[mediaFrom]] on the same
    * files. */
  def mediaView(combined: DataFrame): DataFrame =
    combined.filter(col("rec_kind") === "media")
      .select(MediaSchema.fieldNames.map(col).toIndexedSeq: _*)

  /** The SHARED-DECODE attach (r12 verdict #2): one drop-folder stream,
    * one checkpoint, one decode pass per trigger — forked AFTER the
    * response parse into the identity-deduped documents store
    * ([[CrawlIngest.ingestByIdentity]]) and the `media_key`-deduped
    * media store. The independent attaches ([[CrawlIngest.attach]] /
    * [[attach]]) remain the default where isolated failure domains
    * matter more than the decode saving; here one malformed batch
    * stalls BOTH stores — the documented tradeoff, now a choice
    * instead of a constraint. The combined frame persists across the
    * two sinks so the decode chain runs once (both sinks' writes
    * materialize inside the same foreachBatch invocation — the
    * at-least-once replay is absorbed by each store's keyed dedup). */
  def attachShared(spark: SparkSession, dropDir: String,
                   docStore: ParquetStore, mediaStore: ParquetStore,
                   checkpoint: String,
                   trigger: Trigger = Trigger.ProcessingTime(10000L),
                   maxFilesPerTrigger: Int = 64, nCells: Int = 16,
                   reps: ParquetStore = null): StreamingQuery =
    attachSharedCore(spark, dropDir, docStore, mediaStore, checkpoint,
      trigger, maxFilesPerTrigger, nCells, reps,
      robotsStore = null, agent = null)

  /** [[attachShared]] with the ROBOTS ROUTE forked in (r13 verdict
    * #5): one crawl stream, one decode pass, THREE sinks — documents,
    * media fingerprints, and the durable per-host robots policy store
    * that drives [[CrawlSchedule.attachRobots]]' gate and pace. The
    * robots rows need no third per-record dispatcher: a fetched
    * `/robots.txt` is a `text/plain` response, so the text route
    * already carries its body in the combined frame's `text` column —
    * [[CrawlSchedule.robotsPolicies]] filters the doc view down to
    * robots URLs and parses the agent's effective policy. A robots.txt
    * arriving in batch N is in the policy store when batch N ends, so
    * a frontier trigger after it gates and paces under the new policy
    * (the q_fetch_schedule_robots semantics, end-to-end from crawl
    * bytes — spec-pinned). A replayed batch re-appends identical
    * policy rows; latest-per-host reads make that harmless (same
    * treatment either way). */
  def attachSharedRobots(spark: SparkSession, dropDir: String,
                         docStore: ParquetStore, mediaStore: ParquetStore,
                         robotsStore: ParquetStore, agent: String,
                         checkpoint: String,
                         trigger: Trigger = Trigger.ProcessingTime(10000L),
                         maxFilesPerTrigger: Int = 64, nCells: Int = 16,
                         reps: ParquetStore = null): StreamingQuery = {
    require(robotsStore != null && agent != null,
      "attachSharedRobots needs a robots store and an agent")
    attachSharedCore(spark, dropDir, docStore, mediaStore, checkpoint,
      trigger, maxFilesPerTrigger, nCells, reps, robotsStore, agent)
  }

  /** The ONE shared-decode foreachBatch body behind [[attachShared]]
    * and [[attachSharedRobots]] (review r14: the two attaches had
    * drifted into parallel copies of the same ingest sequence —
    * persist discipline, reps-before-members ordering, keyed dedup —
    * differing only in the optional robots sink). */
  private def attachSharedCore(spark: SparkSession, dropDir: String,
                               docStore: ParquetStore,
                               mediaStore: ParquetStore,
                               checkpoint: String, trigger: Trigger,
                               maxFilesPerTrigger: Int, nCells: Int,
                               reps: ParquetStore,
                               robotsStore: ParquetStore,
                               agent: String): StreamingQuery = {
    CrawlIngest.fileSource(spark, dropDir, maxFilesPerTrigger)
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val combined = combinedFrom(batch, nCells = nCells).persist()
          try {
            val docs = docsView(combined)
            CrawlIngest.ingestByIdentity(docStore, docs)
            val media = mediaView(combined)
            // Naming authority first (r13 verdict #1): the durable
            // first-seen rep table must cover every digest the member
            // store holds, so the rename-free pair search can treat it
            // as the complete cluster index.
            if (reps != null) recordReps(reps, media)
            CrawlIngest.dedupAppendByKey(mediaStore, media,
              "media_key", struct(col("path"), col("record_ix")))
            if (robotsStore != null) {
              val pol = CrawlSchedule.robotsPolicies(docs, agent)
              // Empty-guard: a robots-less trigger must not burn a
              // policy-store generation.
              if (!pol.isEmpty) robotsStore.appendStreaming(pol)
              ()
            }
            ()
          } finally { combined.unpersist(); () }
        }
        ()
      }
      .start()
  }

  /** Attach the drop-folder stream (the [[CrawlIngest.attach]] twin):
    * every trigger fingerprints newly arrived `.warc.gz` files' media
    * records and appends one compacted generation. Run it NEXT TO the
    * text attach on the same drop dir — each stream has its own
    * checkpoint and reads the files independently, keeping the two
    * pipelines' failure domains apart at the cost of decoding each
    * file twice. When decode dominates, [[attachShared]] is the
    * opt-in single-pass alternative (r12 verdict #2). */
  def attach(spark: SparkSession, dropDir: String, store: ParquetStore,
             checkpoint: String,
             trigger: Trigger = Trigger.ProcessingTime(10000L),
             maxFilesPerTrigger: Int = 64,
             reps: ParquetStore = null): StreamingQuery = {
    CrawlIngest.fileSource(spark, dropDir, maxFilesPerTrigger)
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
        if (!batch.isEmpty) {
          val media = mediaFrom(batch).persist()
          try {
            // Rename-free cluster naming (r13 verdict #1), recorded
            // before membership so the rep table covers every stored
            // digest from the first batch on.
            if (reps != null) recordReps(reps, media)
            CrawlIngest.dedupAppendByKey(store, media,
              "media_key", struct(col("path"), col("record_ix")))
            ()
          } finally { media.unpersist(); () }
        }
        ()
      }
      .start()
  }

  /** Near-duplicate media pairs between a NEW batch and the
    * accumulated store (plus within the batch itself): image pairs by
    * perceptual-hash hamming ([[Media.phashPairsIncremental]] — exact
    * pigeonhole banding), audio pairs by fingerprint hamming
    * ([[AudioFp.pairsIncremental]] — packed-band LSH + verify). Both
    * sides keyed by `idCol`, defaulting to `media_key` — the store's
    * dedup identity (the URL when the record has one, the
    * `path#record_ix` provenance fallback otherwise; pass a digest- or
    * identity-derived column to dedup across mirrors).
    * Undecoded rows (null fingerprint) are skipped. Output:
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

  /** EXACT byte-duplicate clusters by content digest (r12 verdict #4):
    * mirrored media — the same bytes served at many URLs — grouped on
    * `(kind, sha1_b32)` with the minimum `idCol` as the cluster
    * REPRESENTATIVE. ONE shuffle on the digest key. Undigested rows
    * (null `sha1_b32` — payload-less records) self-represent. Output:
    * (kind, sha1_b32, member, rep). */
  /** The shared representative expression: min `idCol` over the
    * (kind, digest) cluster, self for undigested rows — ONE definition
    * so membership ([[digestClusters]]) and the pair search's rep set
    * ([[representatives]]) can never diverge (review r13). */
  private def repCol(idCol: String): org.apache.spark.sql.Column =
    when(col("sha1_b32").isNotNull,
      min(col(idCol)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("kind"), col("sha1_b32"))))
      .otherwise(col(idCol))

  def digestClusters(media: DataFrame, idCol: String = "media_key")
      : DataFrame =
    media.withColumn("rep", repCol(idCol))
      .select(col("kind"), col("sha1_b32"), col(idCol).as("member"),
        col("rep"))

  /** One row per digest cluster — the cluster representatives' media
    * rows, all columns intact. The pre-cluster step of
    * [[pairsAllByDigest]], exposed so callers composing their own
    * pair search (or an incremental one over a store whose reps are
    * precomputed) reuse it. */
  def representatives(media: DataFrame, idCol: String = "media_key")
      : DataFrame =
    media.withColumn("_rep", repCol(idCol))
      .filter(col(idCol) === col("_rep")).drop("_rep")

  /** [[pairsAll]] with DIGEST PRE-CLUSTERING (r12 verdict #4): exact
    * byte-duplicates collapse to one representative BEFORE the banded
    * searches, so a popular image mirrored at M hosts costs ONE
    * fingerprint-pair membership instead of M rows fanning out every
    * band bucket and verify join it touches (M mirrors of the same
    * bytes share every band key by construction — the worst hot-bucket
    * shape there is, and pure waste: their pairwise "near-dup" pairs
    * carry no information an exact digest join doesn't). Near-dup
    * pairs are reported BY REPRESENTATIVE; join [[digestClusters]] to
    * fan a keep-decision back out to the mirror members. Pass an
    * identity-derived `idCol` to make the representative the composed
    * document identity where one exists. */
  def pairsAllByDigest(media: DataFrame, idCol: String = "media_key",
                       nBits: Int = 16, imageMaxHamming: Int = 2,
                       audioMaxHamming: Int = 4): DataFrame =
    pairsAll(representatives(media, idCol), idCol, nBits,
      imageMaxHamming, audioMaxHamming)

  /** INCREMENTAL [[pairsAllByDigest]] — the steady-state mirror story
    * (r12 verdict #4 composed with the durable pipe): a batch row whose
    * (kind, digest) already exists in the store joins an EXISTING
    * cluster — a MEMBER, never a new representative — so re-crawled
    * mirrors cost ZERO new pair memberships (spec-pinned); only
    * new-digest batch rows form new clusters, and only their
    * representatives enter the banded search against the store's
    * representatives. Representative STABILITY contract (review r13):
    * the store side's rep is min(`idCol`) over the CURRENT store, so
    * it is stable across batches only while later-arriving members
    * never take a smaller key than the cluster's first member. With
    * the default `media_key` (URLs) that is NOT guaranteed — a mirror
    * at an alphabetically-earlier host appended between batches
    * RENAMES the cluster's rep, and subsequent pairs reference the new
    * name (cluster membership via [[digestClusters]] stays correct —
    * it is digest-keyed — but accumulated pair output is no longer
    * the exact full-recompute delta). Callers needing rename-free
    * accumulation should use [[pairsIncrementalStable]] with a durable
    * [[repStore]] (r13 verdict #1): first-seen naming survives
    * smaller-key arrivals, batches, and collapses, spec-pinned.
    * Scale: one digest anti-join
    * (store side pruned to two columns, bounded by the collapse
    * policy) + [[pairsIncremental]]'s batch-proportional banding; the
    * store is never self-joined. Output: pairs with ≥ 1 new-cluster
    * side, exactly [[pairsAllByDigest]] over store ∪ batch minus
    * store-only pairs (spec-pinned with ids arranged so union reps ==
    * sticky reps). */
  def pairsIncrementalByDigest(baseMedia: DataFrame, batchMedia: DataFrame,
                               idCol: String = "media_key", nBits: Int = 16,
                               imageMaxHamming: Int = 2,
                               audioMaxHamming: Int = 4): DataFrame = {
    val newDigests = batchMedia.filter(col("sha1_b32").isNotNull)
      .join(baseMedia.select(col("kind"), col("sha1_b32")).distinct(),
        Seq("kind", "sha1_b32"), "left_anti")
    // Undigested rows (null sha1 — payload-less records) never cluster:
    // they self-represent on both the full and incremental paths.
    val batchReps = representatives(
      newDigests.unionByName(batchMedia.filter(col("sha1_b32").isNull)),
      idCol)
    pairsIncremental(representatives(baseMedia, idCol), batchReps,
      idCol, nBits, imageMaxHamming, audioMaxHamming)
  }

  // ---------------------------------------------------------------
  // DURABLE FIRST-SEEN REPRESENTATIVES (r13 verdict #1 — clears the
  // rename hazard documented on pairsIncrementalByDigest): the store
  // side's min(idCol) rep is stable only while later arrivals never
  // take a smaller key; a mirror at an alphabetically-earlier host
  // landing between batches RENAMES its cluster. The fix is a naming
  // AUTHORITY: a durable (digest → rep) table where the FIRST batch to
  // introduce a digest names its cluster forever (first-writer-wins
  // via the same keyed-dedup append the sibling stores use, so replay
  // is idempotent). The table carries the cluster's fingerprints too —
  // members of a digest cluster are byte-identical, so one row per
  // cluster holds everything the banded pair search needs, and the
  // search's store side becomes the REP STORE ITSELF: one row per
  // cluster, already named — no corpus-wide min() window, no rename
  // join against the member-level media store.

  /** One row per (kind, content digest) cluster: the composed key, the
    * first-seen representative id, and the cluster's fingerprints
    * (byte-identical members share them by construction). */
  val RepSchema: StructType = StructType(Seq(
    StructField("digest_key", StringType),
    StructField("kind", StringType), StructField("sha1_b32", StringType),
    StructField("rep", StringType),
    StructField("phash", LongType), StructField("fp", ArrayType(IntegerType))))

  /** Open (or resume) the durable digest→representative store —
    * collapse-managed like its siblings (keys are unique across
    * generations by [[recordReps]]' anti-join, so the periodic
    * re-snapshot is a pure compaction). */
  def repStore(spark: SparkSession, storePath: String,
               tableName: String = "crawl_media_reps",
               collapseEvery: Long = 16L): ParquetStore =
    new ParquetStore(spark, RepSchema, storePath, tableName,
      collapseKeys = Seq("digest_key"), collapseEvery = collapseEvery)

  /** Batch rows reduced to one REP CANDIDATE per digest: the minimum
    * `idCol` member (deterministic within the batch), carrying the
    * cluster fingerprints. */
  private def repCandidates(batchMedia: DataFrame, idCol: String)
      : DataFrame =
    batchMedia.filter(col("sha1_b32").isNotNull)
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("kind"), col("sha1_b32"))
          .orderBy(col(idCol))))
      .filter(col("_rn") === 1)
      .select(
        concat_ws("#", col("kind"), col("sha1_b32")).as("digest_key"),
        col("kind"), col("sha1_b32"), col(idCol).as("rep"),
        col("phash"), col("fp"))

  /** Record the batch's first-seen representatives into the durable
    * rep store: one candidate per new digest (the batch's minimum
    * `idCol` member), appended first-writer-wins — a digest already
    * named keeps its name no matter how small the new arrival's key is,
    * and a crashed-and-replayed batch re-records identically
    * ([[CrawlIngest.dedupAppendByKey]]' anti-join). Returns the number
    * of NEW clusters named. Run it from the media attach's first batch
    * onward (or backfill once with `recordReps(reps,
    * store.selectAll)`) so the table covers every stored digest. */
  def recordReps(reps: ParquetStore, batchMedia: DataFrame,
                 idCol: String = "media_key"): Long =
    CrawlIngest.dedupAppendByKey(reps, repCandidates(batchMedia, idCol),
      "digest_key", col("rep"))

  /** RENAME-FREE incremental mirror pairs (r13 verdict #1): exactly
    * [[pairsIncrementalByDigest]]'s contract — pairs with ≥ 1
    * new-cluster side, re-deliveries of stored bytes costing zero —
    * but cluster names come from the durable first-seen table, so the
    * accumulated pair output across batches IS the full-recompute
    * delta under first-seen naming even when a later mirror takes a
    * smaller key (the default `media_key` hazard, spec-pinned across
    * batches and collapses). The mechanics are also cheaper at scale:
    * the search's store side is the rep store itself (one row per
    * cluster, fingerprints included) instead of a corpus-wide min()
    * window over the member-level media store; the batch side is the
    * pre-append anti-join of the batch's candidates (batch-sized,
    * eagerly pinned so the append below cannot race it). One
    * batch-vs-store anti-join + [[pairsIncremental]]'s
    * batch-proportional banding; neither store is self-joined.
    * Undigested rows (null sha1 — payload-less records) carry no
    * fingerprints, so unlike the window variant they need no
    * self-representation path here: the banded searches skip null
    * fingerprints either way. */
  def pairsIncrementalStable(batchMedia: DataFrame, reps: ParquetStore,
                             idCol: String = "media_key", nBits: Int = 16,
                             imageMaxHamming: Int = 2,
                             audioMaxHamming: Int = 4): DataFrame = {
    val fresh = repCandidates(batchMedia, idCol)
      .join(reps.selectAll.select(col("digest_key")), Seq("digest_key"),
        "left_anti")
      // Eager pin BEFORE the append: a lazy frame would re-list the
      // store after the new generation (and a possible collapse)
      // landed and see its own output as "already known".
      .localCheckpoint(true)
    if (!fresh.isEmpty) reps.appendStreaming(fresh)
    val base = reps.selectAll
      .join(fresh.select(col("digest_key")), Seq("digest_key"),
        "left_anti")
      .select(col("kind"), col("rep").as(idCol), col("phash"), col("fp"))
    pairsIncremental(base,
      fresh.select(col("kind"), col("rep").as(idCol), col("phash"),
        col("fp")),
      idCol, nBits, imageMaxHamming, audioMaxHamming)
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
