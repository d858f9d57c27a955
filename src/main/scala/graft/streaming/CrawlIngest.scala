package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.operators.Html
import graft.sources.{Http, Mime, Pdf, Warc}
import graft.store.ParquetStore

/** The crawl front door AS A STREAM (r10 verdict #6): a `.warc.gz`
  * drop folder — the operational shape of a continuously-arriving crawl
  * — ingested file-by-file through the complete batch chain
  * ([[Warc.records]] → [[Http.responses]] → [[Html.extract]]) into a
  * durable [[ParquetStore]] with the r10 auto-compaction, checkpointed
  * for exactly-once file tracking.
  *
  * Everything between source and sink is ONE narrow per-partition byte
  * pass (no shuffle anywhere in the chain — the plan is scan →
  * mapPartitions → write), so per-trigger cost is proportional to the
  * new files alone and the 1000-executor shape is "each executor
  * ingests its own files". The store lands one generation per trigger;
  * consumers read documents with the same partition-pruned generation
  * surface as every other store.
  *
  * Records that fail WARC framing, gzip, or HTTP parsing are DROPPED
  * from the documents store (a corpus table is not an audit table) —
  * run the batch [[Warc.records]] surface over the same files for the
  * coded −1/−2 failure audit; the batch and stream paths share the
  * parsers, so their disagreement is impossible by construction. */
object CrawlIngest {

  /** The documents-store schema: where the doc came from (file path +
    * record index + URI), what the server said (status), and the
    * extracted title/full-text/main-content (the boilerplate-filtered
    * [[Html.mainText]] — the column a training corpus actually reads;
    * `text` keeps the complete visible text for audits). */
  val DocSchema: StructType = StructType(Seq(
    StructField("path", StringType), StructField("record_ix", LongType),
    StructField("url", StringType), StructField("http_status", LongType),
    StructField("title", StringType), StructField("text", StringType),
    StructField("main_text", StringType)))

  /** [[DocSchema]] plus the redirect/canonical facts the IDENTITY
    * composition needs: `location` (the 3xx Location header, resolved
    * against the fetch URL) and `canonical_raw` (the page-declared
    * canonical EXACTLY as written — possibly relative). The canonical
    * is deliberately NOT resolved here: a relative canonical on a page
    * recorded under a pre-redirect URL must resolve against the
    * redirect-FINAL URL, which only [[graft.operators.Url.withIdentity]]
    * knows after the chain walk. */
  val FetchSchema: StructType = StructType(DocSchema.fields ++ Seq(
    StructField("location", StringType),
    StructField("canonical_raw", StringType)))

  /** The batch transform: (path, content) file rows → extracted
    * document rows. Exposed separately so the streaming path, tests,
    * and the soak share one definition.
    *
    * FORMAT-AWARE (r11): records route on the SNIFFED type of the body
    * bytes ([[graft.sources.Mime.sniff]] — crawl Content-Type headers
    * lie), not the header: `text/html` through the extractor +
    * boilerplate filter, `application/pdf` through the PDF text/info
    * extractors (title from /Info), `text/plain` verbatim. Anything
    * else (images, archives, binaries) is NOT a text document and is
    * dropped here — the media pipeline reads the same records through
    * its own surface. A body sniffing textual but served under a
    * non-textual header decodes as UTF-8 (the header already proved
    * untrustworthy). */
  def documentsFrom(files: DataFrame, bytesCol: String = "content",
                    gzipped: Boolean = true): DataFrame =
    fetchCore(files, bytesCol, gzipped, withCanonical = false)
      .filter(col("text").isNotNull)
      .select(DocSchema.fieldNames.map(col).toIndexedSeq: _*)

  /** The SUPERSET pass behind [[documentsFrom]] (r11 verdict #5): the
    * same single-decode dispatch, additionally keeping 3xx redirect
    * records (`location` set, `text` null — the edges the identity
    * composition follows) and the html route's page-declared canonical
    * (`canonical_raw`, UNRESOLVED — see [[FetchSchema]]: the right
    * base for a relative canonical is the redirect-final URL, known
    * only after the chain walk). Records that are neither textual nor
    * redirects are still dropped here. */
  def fetchesFrom(files: DataFrame, bytesCol: String = "content",
                  gzipped: Boolean = true): DataFrame =
    fetchCore(files, bytesCol, gzipped, withCanonical = true)

  /** The shared decoded-response base every crawl consumer dispatches
    * over: gunzip → WARC member walk → HTTP response parse → byte
    * sniff, projected to (path, record_ix, url, http_status,
    * mime_sniffed, body, decoded, location). ONE pass produces it; the
    * text route, and the COMBINED text+media route
    * ([[CrawlMedia.combinedFrom]]), fork per RECORD after it — never
    * per branch (see [[fetchCore]]'s union-trap note). */
  private[streaming] def responseBase(files: DataFrame, bytesCol: String,
                                      gzipped: Boolean): DataFrame = {
    val recs = Warc.records(
        files.select(col("path"), col(bytesCol).as("bytes")),
        bytesCol = "bytes", gzipped = gzipped)
      .filter(col("record_ix") >= 0 && col("warc_type") === "response")
    Mime.withSniffed(
        Http.responses(recs).filter(col("http_status") >= 0),
        "body", "http_content_type")
      .select(col("path"), col("record_ix"),
        col("target_uri").as("url"), col("http_status"),
        col("mime_sniffed"), col("body"),
        // The UTF-8 fallback (body sniffing textual under a non-textual
        // header) is VALIDITY-GUARDED: ANSI decode THROWS on malformed
        // bytes, and a crawl is full of binary bodies with null `text`
        // (a WAV under application/octet-stream killed the whole
        // query before the guard — r13 shared-decode fixture). Invalid
        // bytes yield null → the record is not a text document.
        coalesce(col("text"), when(expr("is_valid_utf8(body)"),
          decode(col("body"), "UTF-8"))).as("decoded"),
        // try_element_at: most responses carry no Location header and
        // the filtered array is empty — plain element_at throws under
        // ANSI semantics.
        try_element_at(filter(col("http_headers"),
          h => lower(h.getField("name")) === "location"), lit(1))
          .getField("value").as("location"))
  }

  /** Per-record TEXT-ROUTE dispatch over one [[responseBase]] record —
    * [[FetchSchema]] rows (0 for non-textual non-redirects, up to 1
    * otherwise). Extracted as a plain function so the independent pass
    * here and the combined text+media pass
    * ([[CrawlMedia.combinedFrom]]) share it VERBATIM — their parity is
    * by construction, not by parallel maintenance (spec-pinned
    * anyway). */
  private[streaming] def docRowsOf(path: String, recordIx: Long,
                                   url: String, status: Long, mime: String,
                                   body: Array[Byte], decoded: String,
                                   rawLocation: String,
                                   withCanonical: Boolean)
      : Iterator[org.apache.spark.sql.Row] = {
    val location =
      if (status >= 300 && status < 400 && rawLocation != null) {
        if (url == null) rawLocation
        else graft.operators.Url.resolve(url, rawLocation)
      } else null
    def doc(title: String, text: String, main: String,
            canonical: String) =
      org.apache.spark.sql.Row(path, recordIx, url,
        status, title, text, main, location, canonical)
    mime match {
      // text/xml covers XHTML and XML-prologue pages ('<?xml' wins
      // the sniff even when <html> follows) — the extractor handles
      // them; dropping them would silently lose a common page class.
      case "text/html" | "text/xml" if decoded != null =>
        val (text, title) = Html.extractCore(decoded, true)
        val canonical =
          if (withCanonical) Html.pageMeta(decoded).canonicalUrl
          else null
        Iterator.single(doc(title.orNull, text, Html.mainText(decoded),
          canonical))
      case "text/plain" if decoded != null =>
        Iterator.single(doc(null, decoded, decoded, null))
      case "application/pdf" =>
        // extractWithTitle: text AND /Info title from ONE parse
        // (extract + docInfo would scan and inflate twice).
        Pdf.extractWithTitle(body).iterator
          .map { case (d, title) => doc(title, d.text, d.text, null) }
      case _ if location != null =>
        // Payload-less (or non-textual) 3xx: the redirect EDGE is
        // the crawl fact the identity walk needs.
        Iterator.single(doc(null, null, null, null))
      case _ => Iterator.empty // images/archives: the media pipeline's
    }
  }

  /** Shared dispatch; `withCanonical` gates the per-page pageMeta walk
    * so the plain documents path pays nothing for the identity
    * columns it immediately drops. */
  private def fetchCore(files: DataFrame, bytesCol: String,
                        gzipped: Boolean, withCanonical: Boolean): DataFrame = {
    // ONE narrow pass dispatching per record. The obvious alternative —
    // a filtered union of three DataFrame branches — re-executes the
    // whole gunzip→WARC→HTTP→sniff chain once PER BRANCH (uncached
    // diverging plans share nothing), tripling the decode cost of the
    // corpus's dominant stage; measured +47% soak cost even with two
    // branches empty. Per-record dispatch keeps decode at exactly one
    // pass regardless of how many formats route.
    responseBase(files, bytesCol, gzipped).mapPartitions { it =>
      it.flatMap { row =>
        docRowsOf(row.getString(0), row.getLong(1), row.getString(2),
          row.getLong(3), row.getString(4), row.getAs[Array[Byte]](5),
          row.getString(6),
          if (row.isNullAt(7)) null else row.getString(7), withCanonical)
      }
    }(org.apache.spark.sql.Encoders.row(FetchSchema))
  }

  /** Open (or resume) the documents store at `storePath`. */
  def docStore(spark: SparkSession, storePath: String,
               tableName: String = "crawl_docs"): ParquetStore =
    new ParquetStore(spark, DocSchema, storePath, tableName)

  /** The shared drop-folder source: binaryFile over `*.warc.gz`. The
    * binaryFile source's schema is FIXED by the format, but the
    * streaming reader still demands it explicitly. Shared with the
    * media and combined attaches ([[CrawlMedia]]) — one definition of
    * the glob/schema, not three drifting copies (review r13). */
  private[streaming] def fileSource(spark: SparkSession, dropDir: String,
                                    maxFilesPerTrigger: Int): DataFrame = {
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
  }

  /** Append `docs` unless empty (an empty trigger must not burn a store
    * generation) — persisted first so the emptiness check and the write
    * share ONE pass over the decode chain instead of running the whole
    * gunzip→WARC→HTTP→HTML pipeline twice per trigger. */
  private def appendNonEmpty(store: ParquetStore, docs: DataFrame): Unit = {
    val p = docs.persist()
    try { if (!p.isEmpty) store.appendStreaming(p) }
    finally { p.unpersist(); () }
  }

  /** Attach the drop-folder stream: every trigger picks up newly
    * arrived `.warc.gz` files (binaryFile source, checkpoint-tracked →
    * a restart never re-ingests a file) and appends one compacted
    * generation of extracted documents. */
  def attach(spark: SparkSession, dropDir: String, store: ParquetStore,
             checkpoint: String,
             trigger: Trigger = Trigger.ProcessingTime(10000L),
             maxFilesPerTrigger: Int = 64): StreamingQuery = {
    fileSource(spark, dropDir, maxFilesPerTrigger).writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // Cheap file-row check first: a no-new-files trigger skips the
        // decode chain entirely.
        if (!batch.isEmpty) appendNonEmpty(store, documentsFrom(batch))
        ()
      }
      .start()
  }

  /** [[attach]] with exactly-once-by-URL ingestion: a crawl delivers
    * the same page many times (re-crawls, mirrors, duplicate WARC
    * segments), and a documents store should hold each URL once. The
    * extraction chain moves INTO the streaming plan so Spark's
    * stateful `dropDuplicates` can key on the extracted URL — state is
    * checkpointed, so a restart still refuses URLs ingested before the
    * crash. State grows with distinct URLs (one small row each, no
    * watermark to bound it — URLs never expire); at corpus scale point
    * the checkpoint at a real state store backend (RocksDB) exactly as
    * any unbounded-key streaming dedup, or re-snapshot via a batch
    * URL-dedup pass. Null-URL records (rare records without a
    * WARC-Target-URI) are kept un-deduped rather than collapsing onto
    * one null key. */
  def attachDeduped(spark: SparkSession, dropDir: String,
                    store: ParquetStore, checkpoint: String,
                    trigger: Trigger = Trigger.ProcessingTime(10000L),
                    maxFilesPerTrigger: Int = 64): StreamingQuery = {
    val deduped = documentsFrom(fileSource(spark, dropDir, maxFilesPerTrigger))
      .withColumn("_k", coalesce(col("url"),
        concat(col("path"), lit("#"), col("record_ix"))))
      .dropDuplicates("_k")
      .drop("_k")
    deduped.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        appendNonEmpty(store, batch)
        ()
      }
      .start()
  }

  /** The identity-keyed documents store: [[DocSchema]] + the composed
    * `identity` the dedup keys on. */
  val IdentityDocSchema: StructType =
    StructType(DocSchema.fields :+ StructField("identity", StringType))

  /** Open (or resume) an identity-keyed documents store.
    * Collapse-managed (r12 verdict #1): [[dedupAppendByKey]] keeps rows
    * unique per identity, so the periodic latest-per-key re-snapshot is
    * a pure compaction — same rows, ONE base + a bounded delta tail —
    * and the per-trigger anti-join probes a store whose file/partition
    * count is bounded instead of growing one generation per trigger
    * for the crawl's lifetime. `collapseEvery = 0` restores full
    * history. */
  def identityStore(spark: SparkSession, storePath: String,
                    tableName: String = "crawl_docs_by_identity",
                    collapseEvery: Long = 16L)
      : ParquetStore =
    new ParquetStore(spark, IdentityDocSchema, storePath, tableName,
      collapseKeys = Seq("identity"), collapseEvery = collapseEvery)

  /** Exact-dedup append against a DURABLE store: within-batch rows
    * collapse per `keyCol` (first by `order` — deterministic), then the
    * survivors anti-join the STORE's keys and only genuinely-new rows
    * land as a generation. Returns the appended row count. Scale: one
    * window shuffle on the key (batch-sized) + one anti-join whose
    * store side prunes to the key column; the store is never
    * self-joined. This also makes replay IDEMPOTENT: a crashed-and-
    * replayed batch's rows are already in the store, so the anti-join
    * drops them — exactly-once by key without streaming state. */
  def dedupAppendByKey(store: ParquetStore, batch: DataFrame,
                       keyCol: String, order: Column): Long = {
    import org.apache.spark.sql.expressions.Window
    val inBatch = batch
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(keyCol)).orderBy(order)))
      .filter(col("_rn") === 1).drop("_rn")
    val fresh = inBatch.join(
        store.selectAll.select(col(keyCol)).distinct(),
        Seq(keyCol), "left_anti")
      .persist()
    try {
      val n = fresh.count()
      if (n > 0) store.appendStreaming(fresh)
      n
    } finally { fresh.unpersist(); () }
  }

  /** One IDENTITY-DEDUPED ingest step over extracted fetch rows: the
    * batch's own 3xx records provide the redirect edges, the html
    * route's canonical annotations the overrides, and
    * [[graft.operators.Url.withIdentity]] composes the key — so a
    * revisit (same page re-fetched later) and a redirect-moved page
    * (old URL now 301s to a page already ingested) both dedup against
    * the store even when the copies arrive in DIFFERENT batches. */
  def ingestByIdentity(store: ParquetStore, fetches: DataFrame): Long = {
    // 3xx records are EDGES, never documents — real crawls record 301s
    // with small HTML stub bodies ("Moved…"), and a stub admitted as a
    // document would resolve to the TARGET's identity and permanently
    // shadow the real page (the store's anti-join refuses the genuine
    // content forever after).
    val docs = fetches.filter(col("text").isNotNull &&
      (col("http_status").isNull || col("http_status") < 300 ||
        col("http_status") >= 400))
    val log = fetches.select(col("url"),
      col("http_status").as("status"), col("location"))
    val keyed = graft.operators.Url.withIdentity(docs, log,
        canonicalCol = "canonical_raw")
      .withColumn("identity",
        coalesce(col("identity"),
          concat(col("path"), lit("#"), col("record_ix"))))
      .select(IdentityDocSchema.fieldNames.map(col).toIndexedSeq: _*)
    dedupAppendByKey(store, keyed, "identity",
      struct(col("path"), col("record_ix")))
  }

  /** [[attachDeduped]] keyed by the composed DOCUMENT IDENTITY
    * (r11 verdict #5): a streamed crawl dedups on
    * redirect-resolved → canonical-overridden → normalized URL, not the
    * raw fetch URL — the durable store IS the dedup state (no unbounded
    * streaming state; restarts and replays are idempotent by
    * construction, see [[dedupAppendByKey]]). The redirect edges used
    * for a batch are the batch's OWN 3xx records — the same-capture
    * convention (a crawler writes the hop chain next to its terminal
    * fetch); cross-batch dedup needs no cross-batch edges because the
    * MOVED copy's chain arrives with it. */
  def attachByIdentity(spark: SparkSession, dropDir: String,
                       store: ParquetStore, checkpoint: String,
                       trigger: Trigger = Trigger.ProcessingTime(10000L),
                       maxFilesPerTrigger: Int = 64): StreamingQuery = {
    fileSource(spark, dropDir, maxFilesPerTrigger).writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val fetches = fetchesFrom(batch).persist()
          try { ingestByIdentity(store, fetches); () }
          finally { fetches.unpersist(); () }
        }
        ()
      }
      .start()
  }
}
