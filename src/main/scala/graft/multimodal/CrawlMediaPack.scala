package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryPack
import graft.streaming.CrawlMedia

/** Crawl→media-dedup coverage (r11 verdict #1): re-encoded duplicate
  * images AND audio inside REAL WARC/HTTP framing, in one end-to-end
  * pass — `.warc.gz` bytes → [[graft.sources.Warc]] member walk →
  * [[graft.sources.Http]] response parse → [[graft.sources.Mime]]
  * sniff (the image's Content-Type header LIES as `text/html`; routing
  * must come from the body bytes) → real pixel/PCM decode →
  * fingerprint → banded pair search.
  *
  * The fixture is built so BOTH fingerprints are SQL-re-derivable:
  *
  *  - Images: each doc-pair group `gid` renders a 16×16 gray picture
  *    whose row r is solid 255 when bit r of `gid` is set — encoded as
  *    a genuine bottom-up 24bpp BMP for even docs and a genuine
  *    little-endian uncompressed TIFF for odd docs (two REAL formats,
  *    two REAL decoders, same pixels). The oracle recomputes the aHash
  *    from the pixel construction (cell-mean cross-multiply over the
  *    16 rows), never trusting that it happens to equal `gid`.
  *  - Audio: group `gid`'s waveform is [[AudioFpPack.baseSamples]] —
  *    8-bit PCM WAV for even docs, FLAC verbatim for odd (both decode
  *    losslessly to the same samples) — and the oracle re-derives the
  *    Haar fingerprint with the same SQL the audio pack pins.
  *
  * `q_crawl_media_dedup` runs the batch pipe; `q_crawl_media_dedup_inc`
  * appends batch 1 (even docs) to a DURABLE [[graft.store.ParquetStore]]
  * media store and scores batch 2 (odd docs) incrementally against it —
  * the output must be exactly the full recompute minus the base-only
  * pairs, which the oracle states closed-form (≥ one odd doc per pair).
  */
object CrawlMediaPack extends QueryPack {

  /** The group picture: row r (16 px) solid 255 iff bit r of gid set. */
  private[graft] def pixels16(gid: Long): Array[Byte] =
    Array.tabulate(256)(i =>
      if (((gid >> (i / 16)) & 1L) == 1L) 255.toByte else 0.toByte)

  /** Genuine 16×16 24bpp BMP of the pixels (bottom-up rows — the
    * format's positive-height convention; stride 48 is 4-aligned). */
  private[graft] def bmp16(pix: Array[Byte]): Array[Byte] = {
    val size = 54 + 48 * 16
    val buf = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    buf.putInt(40).putInt(16).putInt(16).putShort(1).putShort(24)
      .putInt(0).putInt(48 * 16).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    var y = 15
    while (y >= 0) {
      var x = 0
      while (x < 16) {
        val v = pix(y * 16 + x)
        buf.put(v).put(v).put(v)
        x += 1
      }
      y -= 1
    }
    buf.array()
  }

  /** Genuine little-endian uncompressed 8-bit grayscale TIFF (one
    * strip, BlackIsZero) of the pixels — the baseline-TIFF byte layout,
    * IFD entries in ascending tag order as the spec requires. */
  private[graft] def tiff16(pix: Array[Byte]): Array[Byte] = {
    val entries = 9
    val dataOff = 8 + 2 + entries * 12 + 4
    val buf = java.nio.ByteBuffer.allocate(dataOff + pix.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('I'.toByte).put('I'.toByte).putShort(42).putInt(8)
    buf.putShort(entries.toShort)
    def short(tag: Int, v: Int): Unit = {
      buf.putShort(tag.toShort).putShort(3).putInt(1)
        .putShort(v.toShort).putShort(0)
    }
    def long(tag: Int, v: Int): Unit =
      { buf.putShort(tag.toShort).putShort(4).putInt(1).putInt(v); () }
    short(256, 16); short(257, 16); short(258, 8); short(259, 1)
    short(262, 1); long(273, dataOff); short(277, 1); short(278, 16)
    long(279, pix.length)
    buf.putInt(0).put(pix)
    buf.array()
  }

  /** An HTTP/1.1 200 wire response around `body`. */
  private[graft] def http200(contentType: String, body: Array[Byte]): Array[Byte] =
    (s"HTTP/1.1 200 OK\r\nContent-Type: $contentType\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes("ISO-8859-1") ++ body

  /** One WARC response record (ISO 28500 framing). */
  private[graft] def warcResponse(uri: String, id: Long, seq: Int,
                           payload: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
      .append("WARC-Type: response\r\n")
      .append(s"WARC-Target-URI: $uri\r\n")
      .append(f"WARC-Record-ID: <urn:uuid:00000000-0000-0000-000$seq%d-$id%012d>\r\n")
      .append("WARC-Date: 2024-01-01T00:00:00Z\r\n")
      .append(s"Content-Length: ${payload.length}\r\n\r\n")
    sb.toString.getBytes("ISO-8859-1") ++ payload ++
      "\r\n\r\n".getBytes("ISO-8859-1")
  }

  /** Doc `id`'s WARC file: its group's picture (BMP for even ids, TIFF
    * for odd — the image record's Content-Type header LIES as
    * text/html) and its group's audio (8-bit PCM WAV for even, FLAC for
    * odd). */
  private[graft] def mediaWarc(id: Long): Array[Byte] = {
    val gid = id / 2
    val img =
      if (id % 2 == 0) bmp16(pixels16(gid)) else tiff16(pixels16(gid))
    val aud =
      if (id % 2 == 0) AudioFpPack.encodeKind(gid, 0)
      else AudioFpPack.encodeKind(gid, 2)
    warcResponse(s"https://media.org/img/$id", id, 0,
      http200("text/html", img)) ++
      warcResponse(s"https://media.org/aud/$id", id, 1,
        http200("application/octet-stream", aud))
  }

  /** (path, content) `.warc.gz` file rows for the given docs. */
  private def warcFiles(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    graft.Tables.spread(docs.select(col("doc_id"))).as[Long]
      .map(id => (s"mem://crawl/$id.warc.gz",
        graft.sources.WarcPack.gzipBytes(mediaWarc(id))))
      .toDF("path", "content")
  }

  /** Doc `id`'s MIRRORED capture (r12 verdict #4): the group picture as
    * the SAME BMP bytes at three mirror hosts (m0/m1/m2 — the exact
    * byte-dup cluster a digest groups) plus a TIFF re-encode at a
    * fourth host (different bytes, same pixels — a NEAR-dup only the
    * banded search pairs). */
  private[graft] def mirrorWarc(id: Long): Array[Byte] = {
    val gid = id / 2
    val bmp = bmp16(pixels16(gid))
    val tif = tiff16(pixels16(gid))
    (0 until 3).map(m =>
      warcResponse(s"https://m$m.org/img/$id", id, m,
        http200("image/bmp", bmp))).reduce(_ ++ _) ++
      warcResponse(s"https://t.org/img/$id", id, 3,
        http200("image/tiff", tif))
  }

  private def mirrorFiles(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    graft.Tables.spread(docs.select(col("doc_id"))).as[Long]
      .map(id => (s"mem://mirror/$id.warc.gz",
        graft.sources.WarcPack.gzipBytes(mirrorWarc(id))))
      .toDF("path", "content")
  }

  /** The mirror-INCREMENTAL fixture (gid = doc_id): the STORE holds
    * each picture as a BMP at host m0; the BATCH re-delivers the same
    * picture twice — as a TIFF at host t (NEW bytes → a new cluster
    * whose rep enters the pair search) and as an exact BMP mirror at
    * host m1 (EXISTING digest → a member of the store's cluster,
    * contributing ZERO pair memberships). */
  private def mirrorIncFiles(s: SparkSession, docs: DataFrame,
                             batch: Boolean): DataFrame = {
    import s.implicits._
    graft.Tables.spread(docs.select(col("doc_id"))).as[Long]
      .map { id =>
        val bytes =
          if (!batch)
            warcResponse(s"https://m0.org/img/$id", id, 0,
              http200("image/bmp", bmp16(pixels16(id))))
          else
            warcResponse(s"https://t.org/img/$id", id, 0,
              http200("image/tiff", tiff16(pixels16(id)))) ++
              warcResponse(s"https://m1.org/img/$id", id, 1,
                http200("image/bmp", bmp16(pixels16(id))))
        (s"mem://mirrorinc/${if (batch) "b" else "s"}/$id.warc.gz",
          graft.sources.WarcPack.gzipBytes(bytes))
      }.toDF("path", "content")
  }

  /** The RENAME-HAZARD fixture (r13 verdict #1): the STORE's clusters
    * were first seen at host m5; the BATCH re-delivers the same bytes
    * at host a0 — an alphabetically-EARLIER key that a min()-over-
    * current-store representative would rename the cluster to — plus a
    * TIFF re-encode at host t (genuinely new bytes). The durable
    * first-seen rep table must keep the m5 name. */
  private def mirrorStableFiles(s: SparkSession, docs: DataFrame,
                                batch: Boolean): DataFrame = {
    import s.implicits._
    graft.Tables.spread(docs.select(col("doc_id"))).as[Long]
      .map { id =>
        val bytes =
          if (!batch)
            warcResponse(s"https://m5.org/img/$id", id, 0,
              http200("image/bmp", bmp16(pixels16(id))))
          else
            warcResponse(s"https://a0.org/img/$id", id, 0,
              http200("image/bmp", bmp16(pixels16(id)))) ++
              warcResponse(s"https://t.org/img/$id", id, 1,
                http200("image/tiff", tiff16(pixels16(id))))
        (s"mem://mirrorstable/${if (batch) "b" else "s"}/$id.warc.gz",
          graft.sources.WarcPack.gzipBytes(bytes))
      }.toDF("path", "content")
  }

  /** Numeric media identity for the oracle: the doc id parsed back from
    * the record's target URI (kind disambiguates img/aud). */
  private def withMediaId(media: DataFrame): DataFrame =
    media.withColumn("media_id",
      regexp_extract(col("url"), "(\\d+)$", 1).cast("long"))

  override def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map(
      "q_crawl_media_dedup" -> { (s, dir) =>
        // localCheckpoint: the media table feeds SIX join branches
        // (phash l/r, audio bands a/b + verify fa/fb) — without it each
        // branch re-runs the whole gunzip→WARC→HTTP→decode→fingerprint
        // chain (the documentsFrom union trap; measured 6.5→4.5 s warm at
        // sf0.1).
        val media = withMediaId(
          CrawlMedia.mediaFrom(warcFiles(s, table(s, dir, "documents"))))
          .localCheckpoint(true)
        CrawlMedia.pairsAll(media, idCol = "media_id")
      },
      // The DURABLE incremental pipe: batch 1 (even docs) ingested into
      // a media store on disk, batch 2 (odd docs) scored against the
      // STORED fingerprints — store side never self-joined. The result
      // checkpoints eagerly so the temp store dir can be removed before
      // the caller materializes (the q_dedup_prefix_indexed pattern).
      "q_crawl_media_dedup_inc" -> { (s, dir) =>
        val docs = table(s, dir, "documents")
        val tmp = java.nio.file.Files.createTempDirectory("graft_media_store")
        try {
          val store = CrawlMedia.mediaStore(s, tmp.toString,
            s"crawl_media_${System.nanoTime()}")
          store.append(CrawlMedia.mediaFrom(
            warcFiles(s, docs.filter(col("doc_id") % 2 === 0))))
          // Same localCheckpoint rationale as the full query: the
          // batch side feeds the banded-join and verify branches.
          val batch = CrawlMedia.mediaFrom(
            warcFiles(s, docs.filter(col("doc_id") % 2 === 1)))
            .localCheckpoint(true)
          CrawlMedia.pairsIncremental(withMediaId(store.selectAll),
              withMediaId(batch), idCol = "media_id")
            .localCheckpoint(eager = true)
        } finally {
          graft.Fs.deleteRecursively(tmp)
        }
      },
      // The PRODUCTION phash geometry, correctness-gated (r12 verdict
      // #6): SCALE.md's band-entropy rule wants nCells = 48 at corpus
      // scale (16-bit hashes leave ~6-bit band keys whose buckets grow
      // with the corpus), but the oracle only pinned nCells = 16 — so
      // the production banding path was soak-covered, not
      // correctness-gated. Same WARC pipe, 48-cell hash over the 16×16
      // luma plane (cell width 6, last cell ragged at 4 px, cells
      // 43–47 empty → bits forced 0), 48-bit pigeonhole banding. The
      // oracle re-derives the 48-cell aHash per pixel.
      "q_crawl_media_dedup48" -> { (s, dir) =>
        val media = withMediaId(CrawlMedia.mediaFrom(
            warcFiles(s, table(s, dir, "documents")), nCells = 48))
          .filter(col("kind") === "image" && col("phash").isNotNull)
          .select(col("media_id"), col("phash"))
          .localCheckpoint(true)
        Media.phashPairs(media, nBits = 48, maxHamming = 2,
            idCol = "media_id")
          .select(lit("image").as("kind"), col("a").as("media_a"),
            col("b").as("media_b"), col("hamming").as("ham"))
      },
      // Digest pre-cluster (r12 verdict #4), membership side: the same
      // bytes served at three mirror hosts — and at BOTH docs of a
      // group (the encoders are deterministic) — collapse into one
      // cluster whose representative is the minimum URL; the TIFF
      // re-encode (different bytes) clusters separately. The oracle
      // re-derives membership closed-form, including the cross-doc
      // least().
      "q_media_mirrors" -> { (s, dir) =>
        CrawlMedia.digestClusters(
            CrawlMedia.mediaFrom(mirrorFiles(s, table(s, dir, "documents"))))
          .select(col("member"), col("rep"))
      },
      // Digest pre-cluster, pair side: near-dup pairs among the
      // REPRESENTATIVES only — a mirror family costs one membership in
      // the banded search instead of fanning out every band bucket and
      // verify join (the SCALE.md fan-in note). The oracle recomputes
      // the aHash from the pixel construction and brute-forces pairs
      // over the closed-form representative set.
      "q_media_mirror_pairs" -> { (s, dir) =>
        val media = CrawlMedia.mediaFrom(
            mirrorFiles(s, table(s, dir, "documents")))
          .localCheckpoint(true)
        CrawlMedia.pairsAllByDigest(media)
      },
      // INCREMENTAL mirror dedup against a DURABLE store: exact
      // re-deliveries (host m1, bytes already stored) join existing
      // clusters and cost ZERO pair memberships; only the genuinely
      // new TIFF re-encodes form clusters whose representatives enter
      // the banded search. The oracle brute-forces pairs over the
      // closed-form representative set with at least one new side.
      "q_media_mirror_pairs_inc" -> { (s, dir) =>
        val docs = table(s, dir, "documents")
        val tmp =
          java.nio.file.Files.createTempDirectory("graft_mirror_store")
        try {
          val store = CrawlMedia.mediaStore(s, tmp.toString,
            s"mirror_inc_${System.nanoTime()}")
          store.append(CrawlMedia.mediaFrom(
            mirrorIncFiles(s, docs, batch = false)))
          val batch = CrawlMedia.mediaFrom(
              mirrorIncFiles(s, docs, batch = true))
            .localCheckpoint(true)
          CrawlMedia.pairsIncrementalByDigest(store.selectAll, batch)
            .localCheckpoint(eager = true)
        } finally {
          graft.Fs.deleteRecursively(tmp)
        }
      },
      // RENAME-FREE incremental mirror pairs (r13 verdict #1): the
      // batch lands an exact mirror at host a0 — ALPHABETICALLY BEFORE
      // the stored cluster's first-seen rep at m5 — and the pairs must
      // still name the cluster m5 (a min()-over-current-store rep
      // would rename it to a0 and break the accumulated-pairs ≡
      // full-recompute-delta contract). Only the TIFF re-encodes form
      // new clusters; the a0 mirrors contribute zero memberships. The
      // oracle states the first-seen reps closed-form.
      "q_media_mirror_pairs_stable" -> { (s, dir) =>
        val docs = table(s, dir, "documents")
        val tmp =
          java.nio.file.Files.createTempDirectory("graft_rep_store")
        try {
          val reps = CrawlMedia.repStore(s, tmp.toString,
            s"media_reps_${System.nanoTime()}")
          CrawlMedia.recordReps(reps, CrawlMedia.mediaFrom(
            mirrorStableFiles(s, docs, batch = false)))
          val batch = CrawlMedia.mediaFrom(
              mirrorStableFiles(s, docs, batch = true))
            .localCheckpoint(true)
          CrawlMedia.pairsIncrementalStable(batch, reps)
            .localCheckpoint(eager = true)
        } finally {
          graft.Fs.deleteRecursively(tmp)
        }
      }
    )

  /** aHash re-derivation from the pixel construction: cell c (= row c)
    * has mean 255·bit_c(gid); bit c of the hash is set when the cell
    * mean exceeds the overall mean, as the integer cross-multiply
    * cellSum·len > totalSum·cellLen the engine computes. `gidExpr`
    * maps a document to its picture group (the paired fixtures use
    * `doc_id // 2`, the mirror-incremental one `doc_id`). */
  private def phashCte(gidExpr: String): String =
    s"""gids AS (SELECT DISTINCT $gidExpr AS gid FROM documents),
       |cells AS (
       |  SELECT g.gid, t.c, 255 * 16 * ((g.gid >> t.c) & 1) AS cellsum
       |  FROM gids g, generate_series(0, 15) t(c)
       |),
       |celltot AS (
       |  SELECT gid, c, cellsum,
       |    sum(cellsum) OVER (PARTITION BY gid) AS total
       |  FROM cells
       |),
       |ph AS (
       |  SELECT gid,
       |    CAST(sum(CASE WHEN cellsum * 256 > total * 16
       |      THEN 1 << c ELSE 0 END) AS BIGINT) AS phash
       |  FROM celltot GROUP BY gid
       |)""".stripMargin

  private val PhashCte = phashCte("doc_id // 2")

  /** Haar-fingerprint re-derivation keyed by GROUP (the audio-pack SQL
    * with gid = doc_id // 2 as the waveform key — both encodings are
    * lossless, so fp is a pure function of the group). */
  private val AudioFpCte = {
    val n = 4096
    val frames = (n - 256) / 128 + 1
    s"""ii AS (SELECT i FROM generate_series(0, ${n - 1}) t(i)),
       |samples AS (
       |  SELECT g.gid, ii.i,
       |    CAST(8 * (((g.gid * ii.i
       |      + (1 + ((g.gid // 31) % 29)) * ii.i * ii.i + g.gid)
       |      % 31) - 15) AS BIGINT) AS x
       |  FROM gids g, ii
       |),
       |fr AS (SELECT f FROM generate_series(0, ${frames - 1}) t(f)),
       |lv AS (SELECT l FROM generate_series(1, 8) t(l)),
       |blocks AS (
       |  SELECT s.gid, fr.f, lv.l,
       |    (s.i - fr.f * 128) // (1 << (lv.l - 1)) AS b, sum(s.x) AS sb
       |  FROM samples s, fr, lv
       |  WHERE s.i >= fr.f * 128 AND s.i < fr.f * 128 + 256
       |  GROUP BY ALL
       |),
       |pairsum AS (
       |  SELECT gid, f, l, b // 2 AS p,
       |    max(CASE WHEN b % 2 = 0 THEN sb END) AS se,
       |    max(CASE WHEN b % 2 = 1 THEN sb END) AS so
       |  FROM blocks GROUP BY ALL
       |),
       |energies AS (
       |  SELECT gid, f, l, sum((se - so) * (se - so)) AS e
       |  FROM pairsum GROUP BY ALL
       |),
       |bands AS (
       |  SELECT a.gid, a.f, a.l AS kk, a.e - b.e AS d
       |  FROM energies a JOIN energies b USING (gid, f)
       |  WHERE b.l = a.l + 1 AND a.l <= 7
       |),
       |bits AS (
       |  SELECT gid, f, kk,
       |    CASE WHEN d - lag(d) OVER (PARTITION BY gid, kk
       |      ORDER BY f) > 0 THEN 1 ELSE 0 END AS bit
       |  FROM bands
       |),
       |afp AS (
       |  SELECT gid, f,
       |    CAST(sum(bit * (1 << (kk - 1))) AS BIGINT) AS fp
       |  FROM bits WHERE f >= 1 GROUP BY ALL
       |)""".stripMargin
  }

  /** Brute-force pair derivation over both modalities; `filter` narrows
    * to the incremental variant's "≥ one new (odd) doc" pair set. */
  private def pairsSql(filter: String): String =
    s"""WITH $PhashCte,
       |$AudioFpCte,
       |img_pairs AS (
       |  SELECT 'image' AS kind, a.doc_id AS media_a, b.doc_id AS media_b,
       |    CAST(bit_count(xor(pa.phash, pb.phash)) AS BIGINT) AS ham
       |  FROM documents a JOIN documents b ON a.doc_id < b.doc_id
       |  JOIN ph pa ON pa.gid = a.doc_id // 2
       |  JOIN ph pb ON pb.gid = b.doc_id // 2
       |  WHERE bit_count(xor(pa.phash, pb.phash)) <= 2 $filter
       |),
       |aud_ham AS (
       |  SELECT a.doc_id AS media_a, b.doc_id AS media_b,
       |    sum(bit_count(xor(fa.fp, fb.fp))) AS h
       |  FROM documents a JOIN documents b ON a.doc_id < b.doc_id
       |  JOIN afp fa ON fa.gid = a.doc_id // 2
       |  JOIN afp fb ON fb.gid = b.doc_id // 2 AND fb.f = fa.f
       |  WHERE true $filter
       |  GROUP BY 1, 2
       |),
       |aud_pairs AS (
       |  SELECT 'audio' AS kind, media_a, media_b, CAST(h AS BIGINT) AS ham
       |  FROM aud_ham WHERE h <= 4
       |)
       |SELECT kind, media_a, media_b, ham FROM img_pairs
       |UNION ALL
       |SELECT kind, media_a, media_b, ham FROM aud_pairs""".stripMargin

  override def oracles: Map[String, String] = Map(
    "q_crawl_media_dedup" -> pairsSql(""),
    "q_crawl_media_dedup_inc" ->
      pairsSql("AND (a.doc_id % 2 = 1 OR b.doc_id % 2 = 1)"),
    // The 48-cell aHash re-derived PER PIXEL: pixel i of group gid is
    // 255·bit_{i div 16}(gid); cells are 6 px wide (ceil(256/48), the
    // ragged last data cell holds 4, cells 43–47 are EMPTY and their
    // bits forced 0 — matched here by simply not generating them), bit
    // c set by the integer cross-multiply cellSum·len > totalSum·cellLen.
    "q_crawl_media_dedup48" ->
      """WITH gids AS (SELECT DISTINCT doc_id // 2 AS gid FROM documents),
        |px AS (
        |  SELECT g.gid, t.i, 255 * ((g.gid >> (t.i // 16)) & 1) AS v
        |  FROM gids g, generate_series(0, 255) t(i)
        |),
        |cells AS (
        |  SELECT gid, i // 6 AS c, sum(v) AS cellsum, count(*) AS celllen
        |  FROM px GROUP BY ALL
        |),
        |tot AS (
        |  SELECT gid, c, cellsum, celllen,
        |    sum(cellsum) OVER (PARTITION BY gid) AS total
        |  FROM cells
        |),
        |ph48 AS (
        |  SELECT gid,
        |    CAST(sum(CASE WHEN cellsum * 256 > total * celllen
        |      THEN CAST(1 AS BIGINT) << c ELSE 0 END) AS BIGINT) AS phash
        |  FROM tot GROUP BY gid
        |)
        |SELECT 'image' AS kind, a.doc_id AS media_a, b.doc_id AS media_b,
        |  CAST(bit_count(xor(pa.phash, pb.phash)) AS BIGINT) AS ham
        |FROM documents a JOIN documents b ON a.doc_id < b.doc_id
        |JOIN ph48 pa ON pa.gid = a.doc_id // 2
        |JOIN ph48 pb ON pb.gid = b.doc_id // 2
        |WHERE bit_count(xor(pa.phash, pb.phash)) <= 2""".stripMargin,
    // Mirror membership: both docs of a gid serve IDENTICAL bmp bytes
    // at m0/m1/m2, so the 6-member cluster's representative is the
    // least m0 URL across the gid's two doc ids (string order — '10'
    // sorts before '9'); each gid's tiff pair clusters separately.
    "q_media_mirrors" ->
      """WITH m AS (
        |  SELECT doc_id, doc_id // 2 AS gid, t.m,
        |    'https://m' || CAST(t.m AS VARCHAR) || '.org/img/' ||
        |      CAST(doc_id AS VARCHAR) AS member
        |  FROM documents, generate_series(0, 2) t(m)),
        |reps AS (
        |  SELECT gid,
        |    least('https://m0.org/img/' || CAST(2 * gid AS VARCHAR),
        |      'https://m0.org/img/' || CAST(2 * gid + 1 AS VARCHAR))
        |      AS bmp_rep,
        |    least('https://t.org/img/' || CAST(2 * gid AS VARCHAR),
        |      'https://t.org/img/' || CAST(2 * gid + 1 AS VARCHAR))
        |      AS tif_rep
        |  FROM (SELECT DISTINCT doc_id // 2 AS gid FROM documents))
        |SELECT m.member, r.bmp_rep AS rep
        |FROM m JOIN reps r USING (gid)
        |UNION ALL
        |SELECT 'https://t.org/img/' || CAST(doc_id AS VARCHAR) AS member,
        |  r.tif_rep AS rep
        |FROM documents d JOIN reps r ON r.gid = d.doc_id // 2""".stripMargin,
    // Incremental mirror pairs: reps are the store's m0 BMPs (old) and
    // the batch's t TIFFs (new — the m1 exact mirrors join existing
    // clusters and must contribute nothing); every surviving pair has
    // ≥ 1 new side. gid = doc_id here (one picture per document).
    "q_media_mirror_pairs_inc" ->
      s"""WITH ${phashCte("doc_id")},
         |reps AS (
         |  SELECT gid, 'https://m0.org/img/' || CAST(gid AS VARCHAR)
         |    AS id, FALSE AS is_new FROM gids
         |  UNION ALL
         |  SELECT gid, 'https://t.org/img/' || CAST(gid AS VARCHAR)
         |    AS id, TRUE AS is_new FROM gids)
         |SELECT 'image' AS kind, least(a.id, b.id) AS media_a,
         |  greatest(a.id, b.id) AS media_b,
         |  CAST(bit_count(xor(pa.phash, pb.phash)) AS BIGINT) AS ham
         |FROM reps a JOIN reps b
         |  ON a.id < b.id AND (a.is_new OR b.is_new)
         |JOIN ph pa ON pa.gid = a.gid
         |JOIN ph pb ON pb.gid = b.gid
         |WHERE bit_count(xor(pa.phash, pb.phash)) <= 2""".stripMargin,
    // Stable incremental mirror pairs: the store cluster keeps its
    // FIRST-SEEN rep (m5 — the a0 re-delivery must neither rename it
    // nor contribute memberships); the new TIFF clusters' reps are the
    // batch's t URLs; every surviving pair has ≥ 1 new side. gid =
    // doc_id (one picture per document).
    "q_media_mirror_pairs_stable" ->
      s"""WITH ${phashCte("doc_id")},
         |reps AS (
         |  SELECT gid, 'https://m5.org/img/' || CAST(gid AS VARCHAR)
         |    AS id, FALSE AS is_new FROM gids
         |  UNION ALL
         |  SELECT gid, 'https://t.org/img/' || CAST(gid AS VARCHAR)
         |    AS id, TRUE AS is_new FROM gids)
         |SELECT 'image' AS kind, least(a.id, b.id) AS media_a,
         |  greatest(a.id, b.id) AS media_b,
         |  CAST(bit_count(xor(pa.phash, pb.phash)) AS BIGINT) AS ham
         |FROM reps a JOIN reps b
         |  ON a.id < b.id AND (a.is_new OR b.is_new)
         |JOIN ph pa ON pa.gid = a.gid
         |JOIN ph pb ON pb.gid = b.gid
         |WHERE bit_count(xor(pa.phash, pb.phash)) <= 2""".stripMargin,
    // Mirror pairs: brute-force hamming over the representative set
    // (one bmp rep + one tiff rep per gid, both hashing to the gid's
    // re-derived aHash).
    "q_media_mirror_pairs" ->
      s"""WITH $PhashCte,
         |reps AS (
         |  SELECT gid,
         |    least('https://m0.org/img/' || CAST(2 * gid AS VARCHAR),
         |      'https://m0.org/img/' || CAST(2 * gid + 1 AS VARCHAR))
         |      AS id
         |  FROM gids
         |  UNION ALL
         |  SELECT gid,
         |    least('https://t.org/img/' || CAST(2 * gid AS VARCHAR),
         |      'https://t.org/img/' || CAST(2 * gid + 1 AS VARCHAR))
         |      AS id
         |  FROM gids)
         |SELECT 'image' AS kind, a.id AS media_a, b.id AS media_b,
         |  CAST(bit_count(xor(pa.phash, pb.phash)) AS BIGINT) AS ham
         |FROM reps a JOIN reps b ON a.id < b.id
         |JOIN ph pa ON pa.gid = a.gid
         |JOIN ph pb ON pb.gid = b.gid
         |WHERE bit_count(xor(pa.phash, pb.phash)) <= 2""".stripMargin
  )
}
