package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryPack

/** Multimodal coverage: opaque binary payloads (no binary fixture ships,
  * so genuine containers — PGM, WAV, BMP, FLAC, MP4, Ogg — are built
  * IN-QUERY around `documents.text` bytes) pushed through the REAL
  * decode/demux paths, with DuckDB oracles that re-derive the decoded
  * statistics from independent byte arithmetic; plus the narrow
  * feature/hash/sampling projections. Entropy-coded formats with no SQL
  * replica (JPEG/PNG/GIF, Rice-coded FLAC subframe modes) are
  * conformance-pinned in `MediaSpec` instead. */
object MediaPack extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_meta" -> { (s, dir) =>
      val media = table(s, dir, "documents")
        .select(col("doc_id").as("media_id"),
          encode(col("text"), "UTF-8").as("bytes"))
      Media.features(media)
        .withColumn("n_chunks", size(Media.sampleChunks("bytes", 16, 4)))
        .select("media_id", "n_bytes", "content_hash", "n_chunks")
    },
    // Batched codec path: per-payload byte sums computed through the
    // fixed-size batch contract ([[Media.extractFeaturesBatched]]) — the
    // oracle pins that every byte of every row was touched exactly once
    // REGARDLESS of how rows fell into batches/partitions.
    "q_media_features" -> { (s, dir) =>
      val media = table(s, dir, "documents")
        .select(col("doc_id").as("media_id"),
          encode(col("text"), "UTF-8").as("bytes"))
      Media.extractFeaturesBatched(media, batchSize = 64)
        .select(col("media_id"), col("byte_sum"),
          octet_length(col("bytes")).cast("long").as("n_bytes"))
    },
    // REAL pixel decode, oracle-verified end to end: each document's text
    // bytes are wrapped into a genuine binary PGM payload (header built
    // in-query), pushed through the batched decoder, and the DECODED
    // pixel statistics must reproduce DuckDB's independent byte
    // arithmetic — the decode path itself is on the correctness gate, not
    // just spec-pinned.
    // REAL compressed-audio decode on the oracle gate (r10): each
    // document's ASCII bytes become the µ-law (tag 7) / A-law (tag 6)
    // coded DATA of a genuine WAV container built in-query, pushed
    // through the batched decoder; the decoded 16-bit linear loudness sum
    // must reproduce DuckDB's independent transcription of the ITU-T
    // G.711 expansion formulas — arithmetic pinned end to end.
    "q_media_decode_ulaw" -> g711Query(7),
    "q_media_decode_alaw" -> g711Query(6),
    // REAL Ogg demux on the oracle gate (r10): each document's bytes
    // become the single packet of a genuine one-page Ogg stream (real
    // capture pattern, lacing, and CRC-32), located by the
    // CRC-validating page walk behind extractFrameSamples — the first
    // oracle coverage of the frame-LOCATION path (the mp3/ADTS/MP4
    // walks share its dispatch); the recovered packet must hash back to
    // the text. Packets over the one-page lacing budget (65024 bytes)
    // are filtered on both sides.
    "q_media_frames_ogg" -> { (s, dir) =>
      import s.implicits._
      val media = table(s, dir, "documents")
        .filter(octet_length(col("text")).between(1, 65024))
        .select(col("doc_id").as("media_id"),
          encode(col("text"), "UTF-8").as("bytes"))
        .transform(graft.Tables.spread).as[(Long, Array[Byte])]
        .map { case (id, data) => (id, oggContainer(data)) }
        .toDF("media_id", "bytes")
      Media.extractFrameSamples(media)
        .select(col("media_id"), col("n_frames"),
          md5(element_at(col("frame_samples"), 1)).as("frame_hash"))
    },
    // REAL FLAC sample decode on the oracle gate (r10): each document's
    // bytes become the verbatim-subframe samples of a genuine FLAC
    // stream (STREAMINFO + one frame with real CRC-8/CRC-16), pushed
    // through decodeFlac's full frame layer; ASCII bytes are positive
    // 8-bit samples, so the decoded loudness sum must reproduce DuckDB's
    // ascii() arithmetic. (Rice/fixed/LPC/stereo paths are conformance-
    // pinned in MediaSpec from hand-packed RFC 9639 fixtures — entropy
    // coding has no SQL replica.)
    "q_media_decode_flac" -> { (s, dir) =>
      import s.implicits._
      val media = table(s, dir, "documents")
        .filter(octet_length(col("text")) > 0)
        .select(col("doc_id").as("media_id"),
          encode(col("text"), "UTF-8").as("bytes"))
        .transform(graft.Tables.spread).as[(Long, Array[Byte])]
        .map { case (id, data) => (id, flacContainer(data)) }
        .toDF("media_id", "bytes")
      Media.extractFeaturesBatched(media)
        .select(col("media_id"), col("decoded"),
          col("n_samples"), col("sample_sum"))
    },
    // REAL BMP pixel decode on the oracle gate (r10): each document's
    // bytes become the gray (v,v,v) 24bpp pixel row of a genuine
    // height-1 BMP (BITMAPINFOHEADER built in-query, 4-byte row stride
    // padding included), decoded by the JDK readers through the batch
    // contract; the decoded gray stats must reproduce DuckDB's
    // independent byte arithmetic — (v+v+v)/3 = v, so sample_sum is the
    // ascii() sum. (GIF's LZW has no SQL replica — spec-pinned in
    // MediaSpec like JPEG.)
    "q_media_decode_bmp" -> { (s, dir) =>
      import s.implicits._
      val media = table(s, dir, "documents")
        .filter(octet_length(col("text")) > 0)
        .select(col("doc_id").as("media_id"),
          encode(col("text"), "UTF-8").as("bytes"))
        .transform(graft.Tables.spread).as[(Long, Array[Byte])]
        .map { case (id, data) => (id, bmpContainer(data)) }
        .toDF("media_id", "bytes")
      Media.extractFeaturesBatched(media)
        .select(col("media_id"), col("decoded"),
          col("n_samples"), col("sample_sum"))
    },
    // REAL video-frame decode on the oracle gate (r10): each document's
    // bytes become TWO complete picture frames (forward + reversed PGM)
    // inside a genuine MP4 (full stbl built in-query); decodeFrames must
    // locate both via the demuxer tables AND decode their pixels — the
    // oracle reproduces the decoded statistics from DuckDB byte
    // arithmetic. (JPEG frames — the actual MJPEG case — are spec-pinned
    // in MediaSpec; entropy coding has no SQL replica.)
    "q_media_video_frames" -> { (s, dir) =>
      import s.implicits._
      val media = table(s, dir, "documents")
        .filter(octet_length(col("text")) > 0)
        .select(col("doc_id").as("media_id"),
          encode(col("text"), "UTF-8").as("bytes"))
        .transform(graft.Tables.spread).as[(Long, Array[Byte])]
        .map { case (id, data) =>
          (id, mp4Video(Seq(pgmFrame(data), pgmFrame(data.reverse))))
        }
        .toDF("media_id", "bytes")
      Media.decodeFrames(media)
        .select(col("media_id"), col("n_frames"), col("frames_decoded"),
          col("frame_pixels"), col("frame_luma_sum"))
    },
    "q_media_decode" -> { (s, dir) =>
      val media = table(s, dir, "documents")
        .filter(octet_length(col("text")) > 0)
        .select(col("doc_id").as("media_id"),
          encode(concat(lit("P5 "), octet_length(col("text")).cast("string"),
            lit(" 1 255\n"), col("text")), "UTF-8").as("bytes"))
      Media.extractFeaturesBatched(media)
        .select(col("media_id"), col("decoded"),
          col("n_samples"), col("sample_sum"), col("byte_sum"))
    },
    // Perceptual hash over the payload bytes (aHash construction at the
    // stubbed codec boundary — integer cross-multiply mean bits, engine
    // bit-identical).
    "q_media_phash" -> { (s, dir) =>
      val media = table(s, dir, "documents")
        .select(col("doc_id").as("media_id"),
          encode(col("text"), "UTF-8").as("bytes"))
      Media.perceptualHash(media, nCells = 16)
        .select("media_id", "phash")
    },
    // Multimodal NEAR-dup: every payload pair within hamming 2 of each
    // other's perceptual hash — exact via pigeonhole segment banding; the
    // oracle is the independent brute-force n² scan.
    "q_media_phash_pairs" -> { (s, dir) =>
      val media = table(s, dir, "documents")
        .select(col("doc_id").as("media_id"),
          encode(col("text"), "UTF-8").as("bytes"))
      Media.phashPairs(Media.perceptualHash(media, nCells = 16)
        .select("media_id", "phash"), nBits = 16, maxHamming = 2)
    },
    // Frame-sample CONTENT check: the first/last sampled 16-byte chunks of
    // each payload, hashed — proves the binary slicing math (offsets,
    // stride, tail truncation), not just the chunk count.
    "q_media_sample" -> { (s, dir) =>
      val media = table(s, dir, "documents")
        .select(col("doc_id").as("media_id"),
          encode(col("text"), "UTF-8").as("bytes"))
      media.select(col("media_id"), Media.sampleChunks("bytes", 16, 4).as("chunks"))
        .select(col("media_id"),
          size(col("chunks")).as("n_chunks"),
          md5(element_at(col("chunks"), 1)).as("first_chunk_hash"),
          md5(element_at(col("chunks"), size(col("chunks")))).as("last_chunk_hash"))
    },
    // Sniff-routed crawl media (r11): HTTP responses whose Content-Type
    // headers LIE in both directions — BMP images claimed text/html,
    // HTML pages claimed octet-stream — routed by [[Mime.sniff]] of the
    // BODY bytes: image/* payloads land in the pixel decoder, text/html
    // in the extractor. The oracle re-derives both routes' outputs
    // (pixel sums / extracted-text lengths) from the raw text alone —
    // trusting the header would send every row down the wrong pipe and
    // fail both halves.
    "q_crawl_media" -> { (s, dir) =>
      import s.implicits._
      import graft.sources.{Http, Mime}
      import graft.operators.Html
      val responses = table(s, dir, "documents")
        .filter(octet_length(col("text")) > 0)
        .select(col("doc_id"), col("text")).transform(graft.Tables.spread).as[(Long, String)]
        .map { case (id, text) =>
          val (body, ct) =
            if (id % 2 == 1)
              (bmpContainer(text.getBytes("UTF-8")), "text/html")
            else {
              val esc = text.replace("&", "&amp;").replace("<", "&lt;")
                .replace(">", "&gt;")
              (s"<html><body><p>$esc</p></body></html>".getBytes("UTF-8"),
                "application/octet-stream")
            }
          (id, ("HTTP/1.1 200 OK\r\nContent-Type: " + ct +
            "\r\n\r\n").getBytes("UTF-8") ++ body)
        }.toDF("doc_id", "payload")
      val sniffed = Mime.withSniffed(Http.responses(responses),
        "body", "http_content_type")
      val images = Media.extractFeaturesBatched(
        sniffed.filter(col("mime_sniffed").startsWith("image/"))
          .select(col("doc_id").as("media_id"), col("body").as("bytes")))
        .select(col("media_id").as("doc_id"), lit("image").as("route"),
          col("sample_sum").as("n"))
      val htmls = Html.extract(
        sniffed.filter(col("mime_sniffed") === "text/html")
          .select(col("doc_id"), decode(col("body"), "UTF-8").as("html")),
        "html")
        .select(col("doc_id"), lit("html").as("route"),
          length(col("text")).cast("long").as("n"))
      images.union(htmls)
    }
  )

  /** Shared µ-law/A-law decode query (r10): each document's ASCII bytes
    * become the G.711-coded data of a genuine WAV container (format `tag`),
    * decoded through the batch contract; the oracle reproduces the decoded
    * 16-bit statistics from an independent SQL transcription of the ITU-T
    * expansion formulas. */
  private def g711Query(tag: Int): (SparkSession, String) => DataFrame = {
    (s, dir) =>
      import s.implicits._
      val media = table(s, dir, "documents")
        .filter(octet_length(col("text")) > 0)
        .select(col("doc_id").as("media_id"),
          encode(col("text"), "UTF-8").as("bytes"))
        .transform(graft.Tables.spread).as[(Long, Array[Byte])]
        .map { case (id, data) => (id, wavContainer(tag, data)) }
        .toDF("media_id", "bytes")
      Media.extractFeaturesBatched(media)
        .select(col("media_id"), col("decoded"),
          col("n_samples"), col("sample_sum"))
  }

  /** Minimal genuine WAV container around pre-coded sample data: RIFF/WAVE
    * + fmt(16) with the given format tag (mono, 8 kHz, 8-bit) + data — the
    * byte layout every WAV writer emits. */
  private[graft] def wavContainer(tag: Int, data: Array[Byte]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(tag.toShort).putShort(1).putInt(8000)
      .putInt(8000).putShort(1).putShort(8)
      .put("data".getBytes("US-ASCII")).putInt(data.length).put(data)
    buf.array()
  }

  /** Genuine one-page Ogg stream whose single packet is `data`: "OggS"
    * BOS page with the real lacing encoding (⌊n/255⌋ 255-values + the
    * remainder) and the real Ogg CRC-32 patched in — the byte layout
    * every Ogg muxer emits. */
  private def oggContainer(data: Array[Byte]): Array[Byte] = {
    val n = data.length
    // nseg is one byte: ⌊n/255⌋+1 lacing values ≤ 255 → n ≤ 65024.
    require(n >= 1 && n <= 65024, s"oggContainer: need 1..65024, got $n")
    // A final lacing value < 255 ends the packet; an exact multiple of
    // 255 needs a trailing 0 lacing value.
    val full = n / 255
    val rem = n % 255
    val lacing = Array.fill(full)(255.toByte) ++ Array(rem.toByte)
    val b = java.nio.ByteBuffer.allocate(27 + lacing.length + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("OggS".getBytes("US-ASCII")).put(0.toByte).put(0x02.toByte)
    b.putLong(0L).putInt(0).putInt(0).putInt(0) // granule, serial, seq, crc
    b.put(lacing.length.toByte).put(lacing).put(data)
    val page = b.array()
    val crc = Media.oggCrc(page, 0, page.length)
    page(22) = (crc & 0xff).toByte; page(23) = ((crc >> 8) & 0xff).toByte
    page(24) = ((crc >> 16) & 0xff).toByte
    page(25) = ((crc >> 24) & 0xff).toByte
    page
  }

  /** Genuine FLAC stream whose samples are `data` as signed 8-bit values:
    * "fLaC" + STREAMINFO (8 kHz mono, bps 8, total = n) + ONE frame — a
    * verbatim subframe is byte-aligned throughout, so this needs no bit
    * packer, only the real CRC-8 (header) and CRC-16 (frame). */
  private[multimodal] def flacContainer(data: Array[Byte]): Array[Byte] = {
    val n = data.length
    // The STREAMINFO blocksize fields are 16-bit (so ≤ 65535, not the
    // frame header's 65536); a bigger payload needs a multi-frame split
    // this fixture builder deliberately doesn't do — fail LOUD rather
    // than emit a silently-truncated header (review r10, twice).
    require(n >= 1 && n <= 65535, s"flacContainer: need 1..65535 bytes, got $n")
    val si = java.nio.ByteBuffer.allocate(4 + 4 + 34)
    si.put("fLaC".getBytes("US-ASCII"))
    si.put(0x80.toByte).put(0.toByte).put(0.toByte).put(34.toByte)
    si.putShort(n.toShort).putShort(n.toShort) // min/max blocksize
    si.put(Array[Byte](0, 0, 0, 0, 0, 0)) // min/max frame size unset
    // rate 8000 (20 bits) | channels-1 (3) | bps-1 (5) | total (36)
    si.put((8000 >> 12).toByte).put(((8000 >> 4) & 0xff).toByte)
      .put((((8000 & 0xf) << 4) | (0 << 1) | (7 >> 4)).toByte)
      .put((((7 & 0xf) << 4) | 0).toByte)
    si.putInt(n) // total samples, low 32 of the 36
    si.put(new Array[Byte](16)) // md5 unset
    // frame: sync+codes (16-bit blocksize-1 form) | crc8 | verbatim
    val hdr = Array[Byte](0xFF.toByte, 0xF8.toByte, 0x74.toByte, 0x02,
      0x00, ((n - 1) >> 8).toByte, ((n - 1) & 0xff).toByte)
    val crc8 = Media.flacCrc8(hdr, 0, hdr.length).toByte
    val body = hdr ++ Array(crc8, 0x02.toByte) ++ data
    val crc16 = Media.flacCrc16(body, 0, body.length)
    si.array() ++ body ++
      Array((crc16 >> 8).toByte, (crc16 & 0xff).toByte)
  }

  /** Genuine height-1 24bpp BMP whose pixel row is `data` as gray
    * (v,v,v) triples: "BM" file header + BITMAPINFOHEADER + the row,
    * padded to the format's 4-byte stride — the byte layout every BMP
    * writer emits. */
  private def bmpContainer(data: Array[Byte]): Array[Byte] = {
    val w = data.length
    val stride = (w * 3 + 3) & ~3
    val size = 54 + stride
    val buf = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(1).putShort(1).putShort(24)
      .putInt(0).putInt(stride).putInt(2835).putInt(2835).putInt(0).putInt(0)
    data.foreach(v => buf.put(v).put(v).put(v))
    buf.array() // stride padding stays zero (allocate zero-fills)
  }

  /** One binary-PGM picture of `data` as a 1-pixel-tall row. */
  private def pgmFrame(data: Array[Byte]): Array[Byte] =
    s"P5 ${data.length} 1 255\n".getBytes("US-ASCII") ++ data

  /** Genuine playable-layout MP4 around complete picture samples: ftyp +
    * mdat (one chunk per frame) + moov/trak/mdia/minf/stbl with real
    * stsc/stsz/stco tables describing exactly that layout — what
    * [[Media.mp4SampleRanges]] demuxes and [[Media.decodeFrames]]
    * decodes. */
  private def mp4Video(frames: Seq[Array[Byte]]): Array[Byte] = {
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
      b.array()
    }
    val ftyp = box("ftyp", "isomiso2".getBytes("US-ASCII"))
    val mdat = box("mdat", frames.flatten.toArray)
    val starts = frames.indices.map(k =>
      ftyp.length + 8 + frames.take(k).map(_.length).sum)
    val stsz = {
      val b = java.nio.ByteBuffer.allocate(12 + 4 * frames.length)
      b.putInt(0).putInt(0).putInt(frames.length)
      frames.foreach(f => b.putInt(f.length))
      box("stsz", b.array())
    }
    val stco = {
      val b = java.nio.ByteBuffer.allocate(8 + 4 * starts.length)
      b.putInt(0).putInt(starts.length)
      starts.foreach(b.putInt)
      box("stco", b.array())
    }
    val stsc = { // one sample per chunk, single run
      val b = java.nio.ByteBuffer.allocate(8 + 12)
      b.putInt(0).putInt(1).putInt(1).putInt(1).putInt(1)
      box("stsc", b.array())
    }
    ftyp ++ mdat ++ box("moov", box("trak", box("mdia", box("minf",
      box("stbl", stsc ++ stsz ++ stco)))))
  }

  /** G.711 oracle SQL: the published expansion formulas transcribed
    * directly into DuckDB arithmetic — u = ~byte (µ-law) / a = byte⊕0x55
    * (A-law), then segment shift + mantissa + bias, summed as |amplitude|
    * per document. Independent of the Scala decoder by construction. */
  private def g711Oracle(ulaw: Boolean): String = {
    val (code, label) =
      if (ulaw)
        ("""CASE WHEN u >= 128
           |      THEN 132 - ((u % 16) * 8 + 132) * CAST(power(2, (u // 16) % 8) AS BIGINT)
           |      ELSE ((u % 16) * 8 + 132) * CAST(power(2, (u // 16) % 8) AS BIGINT) - 132
           |      END""".stripMargin, "wav_ulaw")
      else
        ("""CASE WHEN u >= 128 THEN t ELSE -t END""", "wav_alaw")
    val uExpr =
      if (ulaw) "255 - ascii(c) AS u"
      else "xor(ascii(c), 85) AS u"
    val tCte =
      if (ulaw) ""
      else
        """, (CASE WHEN (u // 16) % 8 = 0 THEN (u % 16) * 16 + 8
          |        ELSE ((u % 16) * 16 + 264) * CAST(power(2, (u // 16) % 8 - 1) AS BIGINT)
          |   END) AS t""".stripMargin
    s"""WITH b AS (SELECT doc_id, text FROM documents
       |  WHERE octet_length(encode(text)) > 0),
       |s AS (SELECT doc_id, $uExpr
       |  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '(?s).')) AS c
       |        FROM b)),
       |e AS (SELECT doc_id, u$tCte FROM s),
       |g AS (SELECT doc_id, CAST(sum(abs($code)) AS BIGINT) AS ss
       |  FROM e GROUP BY 1)
       |SELECT b.doc_id AS media_id, '$label' AS decoded,
       |  CAST(octet_length(encode(b.text)) AS BIGINT) AS n_samples,
       |  g.ss AS sample_sum
       |FROM b JOIN g USING (doc_id)""".stripMargin
  }

  /** Shared phash CTE chain: char-position explode → ragged byte cells →
    * integer cross-multiply bits → per-doc 16-bit hash (`p`). */
  private val PhashCte: String = {
    val nc = 16
    s"""ch AS (SELECT doc_id, CAST(g.i AS BIGINT) AS pos,
       |         CAST(ascii(substr(text, CAST(g.i AS INT), 1)) AS BIGINT) AS v,
       |         CAST(octet_length(encode(text)) AS BIGINT) AS len
       |       FROM documents,
       |            unnest(generate_series(1, length(text))) AS g(i)),
       |cell AS (SELECT doc_id, len, (pos-1)//((len + ${nc - 1})//$nc) AS c,
       |           sum(v) AS cs, count(*) AS cl
       |         FROM ch GROUP BY 1, 2, 3),
       |tot AS (SELECT doc_id, sum(cs) AS total FROM cell GROUP BY 1),
       |ph0 AS (SELECT cell.doc_id,
       |          CAST(sum(CASE WHEN cs*len > total*cl
       |                        THEN (CAST(1 AS BIGINT) << CAST(c AS INT))
       |                        ELSE 0 END) AS BIGINT) AS phash
       |        FROM cell JOIN tot ON cell.doc_id = tot.doc_id GROUP BY 1),
       |p AS (SELECT d.doc_id AS media_id, coalesce(ph0.phash, 0) AS phash
       |      FROM documents d LEFT JOIN ph0 ON d.doc_id = ph0.doc_id)""".stripMargin
  }

  override def oracles: Map[String, String] = Map(
    // md5(text) in DuckDB hashes the UTF-8 bytes — exactly the payload.
    "q_media_meta" ->
      """SELECT doc_id AS media_id,
        |  octet_length(encode(text)) AS n_bytes,
        |  md5(text) AS content_hash,
        |  greatest((octet_length(encode(text)) - 1) // 64, 0) + 1 AS n_chunks
        |FROM documents""".stripMargin,
    // Char-wise ascii() sum equals the byte sum because the fixture text is
    // pure ASCII (same invariant q_media_sample's oracle relies on).
    // (?s) so '.' also matches newlines (an ASCII byte!); the LEFT JOIN
    // keeps empty-text payloads as (0, 0) rows like the Spark side does.
    "q_media_features" ->
      """WITH s AS (SELECT doc_id, CAST(sum(ascii(c)) AS BIGINT) AS bs,
        |    count(*) AS nb
        |  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '(?s).')) AS c
        |        FROM documents) GROUP BY 1)
        |SELECT d.doc_id AS media_id, coalesce(s.bs, 0) AS byte_sum,
        |  coalesce(s.nb, 0) AS n_bytes
        |FROM documents d LEFT JOIN s USING (doc_id)""".stripMargin,
    // The decode query's oracle re-derives the DECODED pixel stats from
    // first principles: pixels are exactly the text bytes (the payload is
    // a constructed P5 with height 1), so sample_sum is the ascii() sum
    // of the text and byte_sum adds the header's own byte sum — same
    // ASCII-fixture invariant as the other media oracles.
    "q_media_decode_ulaw" -> g711Oracle(ulaw = true),
    "q_media_decode_alaw" -> g711Oracle(ulaw = false),
    // The one packet IS the text bytes, so the located frame must hash
    // to md5(text) — DuckDB's md5 over the UTF-8 bytes, independent of
    // the page walk by construction.
    "q_media_frames_ogg" ->
      """SELECT doc_id AS media_id, CAST(1 AS BIGINT) AS n_frames,
        |  md5(text) AS frame_hash
        |FROM documents
        |WHERE octet_length(encode(text)) BETWEEN 1 AND 65024""".stripMargin,
    // Verbatim FLAC samples ARE the text bytes (signed 8-bit; ASCII <
    // 0x80 so all positive), so the decoded loudness stats are pure
    // ascii() arithmetic — independent of the frame-layer decoder by
    // construction.
    "q_media_decode_flac" ->
      """WITH b AS (SELECT doc_id, text FROM documents
        |  WHERE octet_length(encode(text)) > 0),
        |ts AS (SELECT doc_id, CAST(sum(ascii(c)) AS BIGINT) AS tsum
        |  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '(?s).')) AS c
        |        FROM b) GROUP BY 1)
        |SELECT b.doc_id AS media_id, 'flac' AS decoded,
        |  CAST(octet_length(encode(b.text)) AS BIGINT) AS n_samples,
        |  ts.tsum AS sample_sum
        |FROM b JOIN ts USING (doc_id)""".stripMargin,
    // Decoded gray of a (v,v,v) 24bpp pixel is (v+v+v)/3 = v, so the
    // decoded stats are pure ascii() arithmetic (the ASCII-fixture
    // invariant of the other media oracles) — independent of the JDK
    // reader by construction.
    "q_media_decode_bmp" ->
      """WITH b AS (SELECT doc_id, text FROM documents
        |  WHERE octet_length(encode(text)) > 0),
        |ts AS (SELECT doc_id, CAST(sum(ascii(c)) AS BIGINT) AS tsum
        |  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '(?s).')) AS c
        |        FROM b) GROUP BY 1)
        |SELECT b.doc_id AS media_id, 'bmp' AS decoded,
        |  CAST(octet_length(encode(b.text)) AS BIGINT) AS n_samples,
        |  ts.tsum AS sample_sum
        |FROM b JOIN ts USING (doc_id)""".stripMargin,
    // The two frames are the text bytes forward and reversed: same pixel
    // count and byte sum each, so the decoded stats are pure ascii()
    // arithmetic (the PGM fixture invariant of q_media_decode).
    "q_media_video_frames" ->
      """WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS n
        |  FROM documents WHERE octet_length(encode(text)) > 0),
        |ts AS (SELECT doc_id, CAST(sum(ascii(c)) AS BIGINT) AS tsum
        |  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '(?s).')) AS c
        |        FROM b) GROUP BY 1)
        |SELECT b.doc_id AS media_id, CAST(2 AS BIGINT) AS n_frames,
        |  CAST(2 AS BIGINT) AS frames_decoded,
        |  CAST(2 * b.n AS BIGINT) AS frame_pixels,
        |  2 * ts.tsum AS frame_luma_sum
        |FROM b JOIN ts USING (doc_id)""".stripMargin,
    "q_media_decode" ->
      """WITH b AS (SELECT doc_id, text,
        |    octet_length(encode(text)) AS n,
        |    'P5 ' || CAST(octet_length(encode(text)) AS VARCHAR)
        |      || ' 1 255' || chr(10) AS hdr
        |  FROM documents WHERE octet_length(encode(text)) > 0),
        |ts AS (SELECT doc_id, CAST(sum(ascii(c)) AS BIGINT) AS tsum
        |  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '(?s).')) AS c
        |        FROM b) GROUP BY 1),
        |hs AS (SELECT doc_id, CAST(sum(ascii(c)) AS BIGINT) AS hsum
        |  FROM (SELECT doc_id, unnest(regexp_extract_all(hdr, '(?s).')) AS c
        |        FROM b) GROUP BY 1)
        |SELECT b.doc_id AS media_id, 'pgm' AS decoded,
        |  CAST(b.n AS BIGINT) AS n_samples,
        |  ts.tsum AS sample_sum,
        |  ts.tsum + hs.hsum AS byte_sum
        |FROM b JOIN ts USING (doc_id) JOIN hs USING (doc_id)""".stripMargin,
    // Byte-level phash replica over ascii() sums (ASCII fixture invariant
    // as above); empty payloads LEFT-JOIN back in as phash 0.
    "q_media_phash" ->
      s"WITH $PhashCte\nSELECT media_id, phash FROM p",
    // Brute-force n² hamming scan — independent of the Spark side's
    // pigeonhole banding, which is exact, so the results must coincide.
    "q_media_phash_pairs" ->
      s"""WITH $PhashCte
         |SELECT a.media_id AS a, b.media_id AS b,
         |       CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
         |FROM p a JOIN p b ON a.media_id < b.media_id
         |WHERE bit_count(xor(a.phash, b.phash)) <= 2""".stripMargin,
    // DuckDB has no BLOB substring/md5, so the oracle slices the VARCHAR and
    // md5-s it (DuckDB md5(varchar) hashes the UTF-8 bytes) — byte-identical
    // because the fixture text is pure ASCII (checked: octet_length ==
    // length for every row); the Spark side slices true bytes. Chunk i sits
    // at byte i*chunk*stride, length `chunk`.
    "q_media_sample" ->
      """SELECT doc_id AS media_id,
        |  greatest((octet_length(encode(text)) - 1) // 64, 0) + 1 AS n_chunks,
        |  md5(substring(text, 1, 16)) AS first_chunk_hash,
        |  md5(substring(text,
        |    greatest((octet_length(encode(text)) - 1) // 64, 0) * 64 + 1, 16))
        |    AS last_chunk_hash
        |FROM documents""".stripMargin,
    // Odd ids are BMPs of the text bytes (pixel sum = ascii sum, the
    // q_media_decode_bmp invariant); even ids are HTML wrapping the
    // escaped text (extracted length = whitespace-normalized length,
    // the q_html_extract invariant). Routing correctly is the only way
    // both halves come out right.
    "q_crawl_media" ->
      """WITH b AS (SELECT doc_id, text FROM documents
        |  WHERE octet_length(encode(text)) > 0),
        |ts AS (SELECT doc_id, CAST(sum(ascii(c)) AS BIGINT) AS tsum
        |  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '(?s).')) AS c
        |        FROM b) GROUP BY 1)
        |SELECT b.doc_id, 'image' AS route, ts.tsum AS n
        |FROM b JOIN ts USING (doc_id) WHERE b.doc_id % 2 = 1
        |UNION ALL
        |SELECT doc_id, 'html' AS route,
        |  CAST(length(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS BIGINT)
        |    AS n
        |FROM b WHERE doc_id % 2 = 0""".stripMargin
  )
}
