package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for training-data pipelines: image/audio/video
  * carried as opaque `binary` columns beside typed metadata, with
  * decode/feature steps running per partition.
  *
  * [[Media.parseHeader]] is a REAL container-header probe — JPEG (SOI +
  * marker walk to the SOF frame header), PNG (signature + IHDR), and
  * PCM WAV (RIFF/WAVE + `fmt ` chunk) — implemented as pure byte
  * arithmetic, no codec library. It reads dimensions/audio parameters
  * from genuine files; it does NOT decode pixels or samples.
  *
  * [[Media.decodeGray]] and [[Media.decodePcm]] are REAL decoders for the
  * byte-arithmetic formats — binary PGM/PPM pixel planes (P5/P6), PCM WAV
  * sample streams (8/16-bit), G.711 µ-law/A-law WAV (format tags 7/6,
  * expanded to 16-bit linear by the published ITU-T formulas), and IMA
  * ADPCM WAV (tag 0x11, the 4-bit block predictor codec, r10) — pure byte
  * arithmetic end to end, and
  * [[Media.decodeImage]] extends real pixel decode to JPEG/PNG — and
  * GIF, BMP, and TIFF (r10) — through the JDK's built-in `javax.imageio` readers
  * (Java SE, zero added dependencies), with the byte-level header probe
  * gating dimensions before any decoder runs. [[Media.extractFeaturesBatched]] therefore
  * computes genuine pixel/sample statistics for ALL the image formats it
  * probes plus PCM audio, and [[Media.perceptualHash]] hashes a genuine
  * decoded + [[Media.boxDownscale]]d luma thumbnail — the real aHash
  * pipeline.
  *
  * Video is handled at the CONTAINER level for real — [[Media.parseHeader]]
  * walks MP4/ISO-BMFF boxes to the video track's dimensions, and
  * [[Media.mp4SampleRanges]] / [[Media.extractFrameSamples]] reconstruct
  * every sample's exact byte range from the `stbl` demuxer tables
  * (stsc/stsz/stco) — and, for the MJPEG family (each sample a complete
  * self-contained picture), at the PIXEL level too:
  * [[Media.decodeFrames]] decodes located frames through the same JDK
  * readers, with a per-frame aHash that joins against still-image hashes
  * (r10).
  *
  * ⚠ STUB BOUNDARY (narrower again in r10 — all WAV-contained audio now
  * decodes for real, G.711 and IMA ADPCM included; FLAC decodes for
  * real through the whole mandatory frame layer ([[Media.decodeFlac]] —
  * Rice coding, fixed + LPC predictors, stereo decorrelation, CRC
  * validation, pure integer arithmetic); MJPEG-family video frames
  * decode end to end; and mp3/ADTS-AAC get real header METADATA and
  * exact frame LOCATION from the published sync/length arithmetic —
  * [[Media.mp3FrameRanges]]/[[Media.adtsFrameRanges]] — as do Ogg
  * streams: CRC-32-validated page walk to exact packet ranges and the
  * Vorbis/Opus identification metadata, [[Media.oggPacketRanges]]): only
  * PERCEPTUAL-CODEC PAYLOAD DECODE — mp3/aac frame contents (MDCT +
  * Huffman, no JDK codec) and INTER-frame video codecs (h264/h265/vp9:
  * samples are not self-contained pictures; no JDK codec) — still needs
  * an external codec; for those payloads the same batch contract runs
  * with the deterministic byte-level fallback in place of the codec
  * call.
  * Everything around that boundary is the real Spark-side contract:
  * binary-column schema, per-partition batching, metadata struct shape,
  * and the narrow-projection plan (no shuffle, no driver collect).
  */
object Media {

  /** Canonical media frame schema: id + kind + payload + typed metadata. */
  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType))))))

  /** Parsed container header. Image formats carry (width, height); WAV
    * carries (sampleRate, channels); unrecognized/truncated payloads parse
    * as `unknown` with zeros — never an exception (corpus blobs are
    * untrusted bytes). */
  final case class MediaHeader(format: String, width: Int, height: Int,
                               sampleRate: Int, channels: Int)
  val UnknownHeader: MediaHeader = MediaHeader("unknown", 0, 0, 0, 0)

  /** Real header probe over raw file bytes: JPEG / PNG / WAV / GIF / BMP /
    * TIFF / PNM / MP4 / FLAC / Ogg (Vorbis + Opus id headers) / mp3 /
    * ADTS-AAC, else unknown.
    *
    * - JPEG: `FF D8` (SOI), then the marker walk every JPEG tool performs —
    *   skip fill bytes, step over variable-length segments (big-endian
    *   2-byte length INCLUDING itself) until a frame header SOF0–SOF15
    *   (excluding DHT/JPG/DAC which share the C0–CF range), whose payload is
    *   precision(1) height(2) width(2), big-endian.
    * - PNG: the 8-byte signature, then the mandatory first chunk must be
    *   IHDR: length(4) type("IHDR") width(4) height(4), big-endian.
    * - WAV: "RIFF" size(4 LE) "WAVE", then a chunk walk (id(4) size(4 LE),
    *   chunks word-aligned) to "fmt ": audioFormat(2) channels(2)
    *   sampleRate(4), little-endian.
    */
  def parseHeader(bytes: Array[Byte]): MediaHeader = {
    if (bytes == null) return UnknownHeader
    val n = bytes.length
    @inline def u8(i: Int): Int = bytes(i) & 0xff
    @inline def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    @inline def be32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    @inline def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    @inline def le32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) |
        (u8(i + 3).toLong << 24)

    // --- JPEG: FF D8, marker walk to the first SOF frame header.
    if (n >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      while (i + 3 < n) {
        if (u8(i) != 0xff) return UnknownHeader // desynced marker stream
        var j = i
        while (j + 1 < n && u8(j + 1) == 0xff) j += 1 // fill bytes
        if (j + 3 >= n) return UnknownHeader
        val marker = u8(j + 1)
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          // len(2) precision(1) height(2) width(2)
          if (j + 8 >= n) return UnknownHeader
          return MediaHeader("jpeg", be16(j + 7), be16(j + 5), 0, 0)
        } else if (marker == 0xd9 || (marker >= 0xd0 && marker <= 0xd7)) {
          i = j + 2 // standalone marker (EOI / RSTn): no length field
        } else {
          val segLen = be16(j + 2)
          if (segLen < 2) return UnknownHeader
          i = j + 2 + segLen
        }
      }
      return UnknownHeader
    }

    // --- PNG: 8-byte signature, IHDR must be the first chunk.
    val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    if (n >= 24 && pngSig.indices.forall(i => u8(i) == pngSig(i)) &&
        u8(12) == 'I' && u8(13) == 'H' && u8(14) == 'D' && u8(15) == 'R') {
      val w = be32(16); val h = be32(20)
      if (w > 0 && w <= Int.MaxValue && h > 0 && h <= Int.MaxValue)
        return MediaHeader("png", w.toInt, h.toInt, 0, 0)
      return UnknownHeader
    }

    // --- WAV: RIFF/WAVE container, chunk walk to `fmt `.
    if (n >= 12 && u8(0) == 'R' && u8(1) == 'I' && u8(2) == 'F' &&
        u8(3) == 'F' && u8(8) == 'W' && u8(9) == 'A' && u8(10) == 'V' &&
        u8(11) == 'E') {
      var i = 12
      while (i + 8 <= n) {
        val isFmt = u8(i) == 'f' && u8(i + 1) == 'm' && u8(i + 2) == 't' &&
          u8(i + 3) == ' '
        val size = le32(i + 4)
        if (isFmt) {
          if (i + 16 + 8 > n || size < 16) return UnknownHeader
          val channels = le16(i + 10)
          val rate = le32(i + 12)
          if (rate <= 0 || rate > Int.MaxValue || channels <= 0)
            return UnknownHeader
          return MediaHeader("wav", 0, 0, rate.toInt, channels)
        }
        if (size < 0 || size > Int.MaxValue - 9) return UnknownHeader
        // Advance in Long: i + 8 + size can overflow Int for declared
        // sizes near the cap, wrapping the cursor negative (ADVICE r9).
        val next = i.toLong + 8L + size + (size & 1) // chunks are word-aligned
        if (next > n) return UnknownHeader
        i = next.toInt
      }
      return UnknownHeader
    }

    // --- GIF (r10): GIF87a/GIF89a signature, logical-screen LE16
    // dimensions. Pixel decode rides the same JDK readers as JPEG/PNG
    // ([[decodeImage]]); LZW needs no external codec either.
    if (n >= 13 && u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F' &&
        u8(3) == '8' && (u8(4) == '7' || u8(4) == '9') && u8(5) == 'a') {
      val w = le16(6); val h = le16(8)
      if (w > 0 && h > 0) return MediaHeader("gif", w, h, 0, 0)
      return UnknownHeader
    }

    // --- BMP (r10): "BM", then the DIB header — BITMAPINFOHEADER and
    // successors (LE32 SIGNED dims at 18/22; negative height = top-down
    // row order, dimensions are the absolute value) or the OS/2
    // BITMAPCOREHEADER (size 12, LE16 dims). JDK readers decode it.
    if (n >= 26 && u8(0) == 'B' && u8(1) == 'M') {
      val dib = le32(14)
      if (dib == 12L) {
        val w = le16(18); val h = le16(20)
        if (w > 0 && h > 0) return MediaHeader("bmp", w, h, 0, 0)
      } else if (dib >= 40L) {
        val w = le32(18).toInt; val h0 = le32(22).toInt
        if (w > 0 && h0 != 0 && h0 != Int.MinValue)
          return MediaHeader("bmp", w, math.abs(h0), 0, 0)
      }
      return UnknownHeader
    }

    // --- TIFF (r10): "II*\0" (LE) / "MM\0*" (BE) magic, then the first
    // IFD's tag walk to ImageWidth (256) / ImageLength (257) — SHORT or
    // LONG values, inline in the 4-byte value field for count 1. Entry
    // count is bounded by the 16-bit field itself; every read is
    // bounds-checked (untrusted bytes). JDK readers decode TIFF since
    // Java 9, so this rides [[decodeImage]] like GIF/BMP.
    if (n >= 8 && ((u8(0) == 'I' && u8(1) == 'I' && u8(2) == 0x2a && u8(3) == 0) ||
                   (u8(0) == 'M' && u8(1) == 'M' && u8(2) == 0 && u8(3) == 0x2a))) {
      val le = u8(0) == 'I'
      @inline def r16(i: Int): Int = if (le) le16(i) else be16(i)
      @inline def r32(i: Int): Long = if (le) le32(i) else be32(i)
      val ifd = r32(4)
      if (ifd >= 8 && ifd + 2 <= n) {
        val cnt = r16(ifd.toInt)
        var w = 0L; var h = 0L
        var k = 0
        while (k < cnt && ifd + 2 + 12L * (k + 1) <= n) {
          val e = (ifd + 2 + 12L * k).toInt
          val tag = r16(e); val typ = r16(e + 2); val c = r32(e + 4)
          if ((tag == 256 || tag == 257) && c == 1L && (typ == 3 || typ == 4)) {
            val v = if (typ == 3) r16(e + 8).toLong else r32(e + 8)
            if (tag == 256) w = v else h = v
          }
          k += 1
        }
        if (w > 0 && w <= Int.MaxValue && h > 0 && h <= Int.MaxValue)
          return MediaHeader("tiff", w.toInt, h.toInt, 0, 0)
      }
      return UnknownHeader
    }

    // --- PNM: P5 (binary PGM) / P6 (binary PPM) header (r9, with the
    // matching REAL pixel decode in [[decodeGray]]).
    pnmHeader(bytes) match {
      case Some((rgb, w, h, _)) =>
        return MediaHeader(if (rgb) "ppm" else "pgm", w, h, 0, 0)
      case None => ()
    }

    // --- MP4/ISO-BMFF (r9): the genuine box walk every mp4 tool performs
    // — size(4 BE) type(4) boxes, 64-bit size escape (size==1), nested
    // containers — down the moov → trak → tkhd path to the first VIDEO
    // track's 16.16-fixed-point presentation width/height (audio tracks
    // carry 0×0 and are skipped). Frame DECODE needs a codec (the ⚠
    // boundary); the container structure does not.
    if (n >= 12 && bytes(4) == 'f' && bytes(5) == 't' && bytes(6) == 'y' &&
      bytes(7) == 'p') {
      def boxes(lo: Long, hi: Long) = isoBoxes(bytes, lo, hi)
      for ((t1, p1, e1) <- boxes(0, n.toLong) if t1 == "moov";
           (t2, p2, e2) <- boxes(p1, e1) if t2 == "trak";
           (t3, p3, e3) <- boxes(p2, e2) if t3 == "tkhd" && p3 < e3) {
        // p3 < e3 guard: a tkhd of declared size 8 has an empty payload
        // ending exactly at the buffer end — u8(p3) would read bytes(n)
        // and throw on this untrusted path (ADVICE r9).
        val ver = u8(p3.toInt)
        val dimOff = p3 + (if (ver == 1) 88L else 76L)
        if (dimOff + 8 <= e3) {
          val w = (be32(dimOff.toInt) >> 16).toInt  // 16.16 fixed point
          val h = (be32(dimOff.toInt + 4) >> 16).toInt
          if (w > 0 && h > 0) return MediaHeader("mp4", w, h, 0, 0)
        }
      }
      return MediaHeader("mp4", 0, 0, 0, 0) // valid container, no video trak
    }

    // --- Ogg (r10): CRC-validated BOS page, then the codec
    // identification header that MUST be its first packet — Vorbis
    // (`\x01vorbis`: channels u8 at +11, rate LE32 at +12) or Opus
    // (`OpusHead`: channels u8 at +9, input rate LE32 at +12); any other
    // codec still classifies as a generic Ogg container.
    if (n >= 27 && bytes(0) == 'O' && bytes(1) == 'g' && bytes(2) == 'g' &&
      bytes(3) == 'S') {
      oggPageAt(bytes, 0) match {
        case Some((ht, p, lacing, _)) if (ht & 0x02) != 0 &&
            lacing.nonEmpty =>
          val first = lacing(0)
          if (first >= 30 && p + 16 <= n && u8(p) == 1 &&
            bytes(p + 1) == 'v' && bytes(p + 2) == 'o' &&
            bytes(p + 3) == 'r' && bytes(p + 4) == 'b' &&
            bytes(p + 5) == 'i' && bytes(p + 6) == 's') {
            val ch = u8(p + 11); val rate = le32(p + 12)
            if (ch > 0 && rate > 0 && rate <= Int.MaxValue)
              return MediaHeader("ogg_vorbis", 0, 0, rate.toInt, ch)
          } else if (first >= 19 && p + 16 <= n &&
            bytes(p) == 'O' && bytes(p + 1) == 'p' && bytes(p + 2) == 'u' &&
            bytes(p + 3) == 's' && bytes(p + 4) == 'H' && bytes(p + 5) == 'e' &&
            bytes(p + 6) == 'a' && bytes(p + 7) == 'd') {
            val ch = u8(p + 9); val rate = le32(p + 12)
            if (ch > 0 && rate > 0 && rate <= Int.MaxValue)
              return MediaHeader("ogg_opus", 0, 0, rate.toInt, ch)
          }
          return MediaHeader("ogg", 0, 0, 0, 0)
        case _ => return UnknownHeader
      }
    }

    // --- FLAC (r10): "fLaC" magic + the STREAMINFO metadata block's
    // 20-bit rate / 3-bit channels ([[flacStreaminfo]] — the walk shared
    // with the decoder). Sample decode is REAL too — [[decodeFlac]]
    // implements the whole mandatory frame layer in pure integer
    // arithmetic.
    if (n >= 4 && bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' &&
      bytes(3) == 'C') {
      flacStreaminfo(bytes) match {
        case Some((rate, channels, _, _, _)) if rate > 0 =>
          return MediaHeader("flac", 0, 0, rate, channels)
        case _ => return UnknownHeader
      }
    }

    // --- MP3 (r10): ID3v2 skip + MPEG-1/2/2.5 Layer III frame-sync
    // header parse. Acceptance needs TWO consecutive valid frames (the
    // standard false-sync discipline — an 0xFFEx pair occurs in random
    // bytes, two length-chained headers do not). Metadata only; frame
    // LOCATION is [[mp3FrameRanges]], decode stays behind the codec
    // boundary.
    mp3Probe(bytes) match {
      case Some((rate, ch)) => return MediaHeader("mp3", 0, 0, rate, ch)
      case None => ()
    }

    // --- AAC in ADTS (r10): 0xFFF syncword, sampling-frequency index +
    // channel configuration from the fixed header, same two-chained-frames
    // acceptance rule via the 13-bit frame-length field.
    adtsProbe(bytes) match {
      case Some((rate, ch)) => return MediaHeader("aac", 0, 0, rate, ch)
      case None => ()
    }

    UnknownHeader
  }

  // MPEG audio (Layer III) constants — the published header tables.
  // version field: 3 = MPEG-1, 2 = MPEG-2, 0 = MPEG-2.5 (1 reserved).
  private val Mp3BitrateV1 = Array(
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3BitrateV2 = Array(
    0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  private val Mp3RatesV1 = Array(44100, 48000, 32000)
  private val Mp3RatesV2 = Array(22050, 24000, 16000)
  private val Mp3RatesV25 = Array(11025, 12000, 8000)

  /** Parse one MPEG Layer III frame header at `i`: (frameLen, sampleRate,
    * channels), or None if the 4 bytes are not a valid L3 header. Pure
    * table arithmetic — frame length = `coef·bitrate/rate + padding`
    * (coef 144 for MPEG-1, 72 for MPEG-2/2.5). */
  private def mp3FrameAt(bytes: Array[Byte], i: Int): Option[(Int, Int, Int)] = {
    val n = bytes.length
    if (i + 4 > n) return None
    @inline def u8(k: Int): Int = bytes(k) & 0xff
    if (u8(i) != 0xff || (u8(i + 1) & 0xe0) != 0xe0) return None
    val version = (u8(i + 1) >> 3) & 0x3
    val layer = (u8(i + 1) >> 1) & 0x3
    if (version == 1 || layer != 1) return None // reserved version / not L3
    val brIdx = (u8(i + 2) >> 4) & 0xf
    val srIdx = (u8(i + 2) >> 2) & 0x3
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None // free/bad
    val v1 = version == 3
    val bitrate = (if (v1) Mp3BitrateV1 else Mp3BitrateV2)(brIdx) * 1000
    val rate = (version match {
      case 3 => Mp3RatesV1
      case 2 => Mp3RatesV2
      case _ => Mp3RatesV25
    })(srIdx)
    val padding = (u8(i + 2) >> 1) & 0x1
    val channels = if (((u8(i + 3) >> 6) & 0x3) == 3) 1 else 2
    val len = (if (v1) 144 else 72) * bitrate / rate + padding
    if (len < 4) None else Some((len, rate, channels))
  }

  /** Start of audio data: past an ID3v2 tag when present (syncsafe
    * 28-bit size), else 0. ID3v2 is container-agnostic — tagging tools
    * prepend it to ADTS AAC files as readily as to mp3 — so both probes
    * share this skip. The v2.4 footer flag (header flags bit 0x10)
    * appends a 10-byte footer the syncsafe size EXCLUDES — without the
    * extra skip the cursor lands on the '3DI' footer bytes and a valid
    * tagged stream fails both probes. */
  private def id3DataStart(bytes: Array[Byte]): Int = {
    val n = bytes.length
    if (n >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      @inline def s7(k: Int): Int = bytes(k) & 0x7f
      val size = (s7(6) << 21) | (s7(7) << 14) | (s7(8) << 7) | s7(9)
      val footer = if ((bytes(5) & 0x10) != 0) 10L else 0L
      val start = 10L + size + footer
      if (start < n) start.toInt else n
    } else 0
  }

  /** (sampleRate, channels) when the payload is an MPEG Layer III stream:
    * two length-chained valid frame headers from the post-ID3 start. */
  private def mp3Probe(bytes: Array[Byte]): Option[(Int, Int)] =
    if (bytes == null) None
    else {
      val start = id3DataStart(bytes)
      for {
        (len, rate, ch) <- mp3FrameAt(bytes, start)
        _ <- mp3FrameAt(bytes, start + len) // chained second frame
      } yield (rate, ch)
    }

  /** REAL frame byte ranges of an MPEG Layer III stream — the mp3 analog
    * of [[mp4SampleRanges]]: ID3v2 skipped, then each frame's extent from
    * its own header arithmetic, chained until the bytes run out (a
    * trailing 128-byte ID3v1 `TAG` block, or any junk after the last
    * whole frame, ends the walk cleanly). Frame PAYLOAD decode still
    * needs a codec; locating frames does not — sampling, splitting, and
    * re-muxing work on exact ranges. None unless two chained frames
    * validate (the [[mp3Probe]] discipline); capped at 1M frames like
    * the MP4 walk. Untrusted bytes never throw. */
  def mp3FrameRanges(bytes: Array[Byte]): Option[Vector[(Long, Int)]] = {
    if (mp3Probe(bytes).isEmpty) return None
    val out = Vector.newBuilder[(Long, Int)]
    var i = id3DataStart(bytes)
    var count = 0
    var ok = true
    // `<=` then `> 1000000`: a stream of EXACTLY 1M frames is in budget
    // (parity with [[mp4SampleRanges]]' `count > 1000000` rule); only a
    // 1M+1-th frame rejects.
    while (ok && count <= 1000000) {
      mp3FrameAt(bytes, i) match {
        case Some((len, _, _)) if i + len <= bytes.length =>
          out += ((i.toLong, len)); i += len; count += 1
        case _ => ok = false
      }
    }
    if (count > 1000000) None else Some(out.result())
  }

  // ADTS sampling-frequency table (index 0-11; 12+ reserved).
  private val AdtsRates = Array(96000, 88200, 64000, 48000, 44100, 32000,
    24000, 22050, 16000, 12000, 11025, 8000)

  /** Parse one ADTS frame header at `i`: (frameLen, sampleRate, channels). */
  private def adtsFrameAt(bytes: Array[Byte], i: Int): Option[(Int, Int, Int)] = {
    val n = bytes.length
    if (i + 7 > n) return None
    @inline def u8(k: Int): Int = bytes(k) & 0xff
    if (u8(i) != 0xff || (u8(i + 1) & 0xf6) != 0xf0) return None // sync + layer 00
    val srIdx = (u8(i + 2) >> 2) & 0xf
    if (srIdx >= AdtsRates.length) return None
    val ch = ((u8(i + 2) & 0x1) << 2) | ((u8(i + 3) >> 6) & 0x3)
    if (ch == 0) return None
    val len = ((u8(i + 3) & 0x3) << 11) | (u8(i + 4) << 3) | ((u8(i + 5) >> 5) & 0x7)
    if (len < 7) None else Some((len, AdtsRates(srIdx), ch))
  }

  /** (sampleRate, channels) for an ADTS AAC stream — two chained frames
    * from the post-ID3v2 start (same skip as [[mp3Probe]]). */
  private def adtsProbe(bytes: Array[Byte]): Option[(Int, Int)] =
    if (bytes == null) None
    else {
      val start = adtsDataStart(bytes)
      for {
        (len, rate, ch) <- adtsFrameAt(bytes, start)
        _ <- adtsFrameAt(bytes, start + len)
      } yield (rate, ch)
    }

  /** Post-ID3v2 start for ADTS (alias of [[id3DataStart]], named for the
    * call sites' symmetry with the mp3 walk). */
  @inline private def adtsDataStart(bytes: Array[Byte]): Int =
    id3DataStart(bytes)

  /** REAL frame byte ranges of an ADTS AAC stream — see
    * [[mp3FrameRanges]]; the 13-bit frame-length field chains frames. */
  def adtsFrameRanges(bytes: Array[Byte]): Option[Vector[(Long, Int)]] = {
    if (adtsProbe(bytes).isEmpty) return None
    val out = Vector.newBuilder[(Long, Int)]
    var i = adtsDataStart(bytes)
    var count = 0
    var ok = true
    while (ok && count <= 1000000) { // exactly-1M in budget, see mp3 walk
      adtsFrameAt(bytes, i) match {
        case Some((len, _, _)) if i + len <= bytes.length =>
          out += ((i.toLong, len)); i += len; count += 1
        case _ => ok = false
      }
    }
    if (count > 1000000) None else Some(out.result())
  }

  /** Ogg CRC-32: polynomial 0x04C11DB7, init 0, unreflected, NO final
    * xor — computed over the whole page with the 4 checksum bytes zeroed
    * (the `zeroFrom until zeroUntil` range reads as 0). Pinned by the
    * standard "123456789" vector: CRC-32/POSIX is this plus a final
    * complement, so Ogg's value is ~0x765E7680 = 0x89A1897F. */
  private[multimodal] def oggCrc(bytes: Array[Byte], from: Int, until: Int,
                                 zeroFrom: Int = 0, zeroUntil: Int = 0): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      val b = if (i >= zeroFrom && i < zeroUntil) 0 else bytes(i) & 0xff
      crc ^= b << 24
      var k = 0
      while (k < 8) {
        crc =
          if ((crc & 0x80000000) != 0) (crc << 1) ^ 0x04c11db7 else crc << 1
        k += 1
      }
      i += 1
    }
    crc
  }

  /** One Ogg page at `i`, CRC-VALIDATED: (headerType, payloadStart,
    * lacing values, pageEnd). None on a bad capture pattern, version,
    * truncation, or checksum mismatch — untrusted bytes never throw. */
  private def oggPageAt(bytes: Array[Byte], i: Int)
      : Option[(Int, Int, Array[Int], Int)] = {
    val n = bytes.length
    if (i + 27 > n) return None
    if (!(bytes(i) == 'O' && bytes(i + 1) == 'g' && bytes(i + 2) == 'g' &&
      bytes(i + 3) == 'S')) return None
    if (bytes(i + 4) != 0) return None // stream structure version
    val htype = bytes(i + 5) & 0xff
    val nseg = bytes(i + 26) & 0xff
    val segBase = i + 27
    if (segBase + nseg > n) return None
    val lacing = new Array[Int](nseg)
    var body = 0
    var k = 0
    while (k < nseg) {
      lacing(k) = bytes(segBase + k) & 0xff; body += lacing(k); k += 1
    }
    val payload = segBase + nseg
    val end = payload + body
    if (end > n) return None
    val stored = (bytes(i + 22) & 0xff) | ((bytes(i + 23) & 0xff) << 8) |
      ((bytes(i + 24) & 0xff) << 16) | ((bytes(i + 25) & 0xff) << 24)
    if (oggCrc(bytes, i, end, i + 22, i + 26) != stored) return None
    Some((htype, payload, lacing, end))
  }

  /** REAL packet-fragment byte ranges of an Ogg stream — the Ogg analog
    * of [[mp3FrameRanges]]: pages walked by the published capture-pattern
    * + lacing arithmetic, every page's CRC-32 validated before its bytes
    * count. Each range is one packet's data within one page (a lacing
    * run ending < 255); a packet CONTINUED across a page boundary
    * contributes one range per page fragment — ranges into the original
    * buffer cannot express the interleaved page headers, and sampling /
    * splitting want real codec bytes either way. None unless the payload
    * starts at a valid BOS page; capped at 1M ranges like the other
    * walks. Untrusted bytes never throw. */
  def oggPacketRanges(bytes: Array[Byte]): Option[Vector[(Long, Int)]] = {
    if (bytes == null || bytes.length < 27) return None
    val out = Vector.newBuilder[(Long, Int)]
    var i = 0
    var count = 0
    var ok = true
    var firstPage = true
    while (ok && count <= 1000000 && i < bytes.length) {
      oggPageAt(bytes, i) match {
        case Some((ht, _, _, _)) if firstPage && (ht & 0x02) == 0 =>
          return None // must open with a BOS page
        case Some((_, payload, lacing, end)) =>
          firstPage = false
          var off = payload
          var run = 0
          var k = 0
          while (k < lacing.length) {
            run += lacing(k)
            if (lacing(k) < 255) { // packet (or fragment) ends here
              if (run > 0) { out += ((off.toLong, run)); count += 1 }
              off += run; run = 0
            }
            k += 1
          }
          if (run > 0) { out += ((off.toLong, run)); count += 1 } // continued
          i = end
        case None =>
          // Junk after the last whole page ends the walk cleanly — the
          // [[mp3FrameRanges]] trailing-bytes rule; every page that DID
          // count was CRC-validated. No valid page AT ALL is not an Ogg
          // stream.
          if (firstPage) return None
          ok = false
      }
    }
    if (count > 1000000) None else Some(out.result())
  }

  /** ISO-BMFF box scan over `bytes[lo, hi)`: yields (type, payloadStart,
    * payloadEnd) per box — size(4 BE) type(4), the 64-bit size escape
    * (size == 1), size == 0 meaning to-end. Malformed sizes terminate the
    * scan with a sentinel ("" type) rather than throwing; nested
    * containers are walked by re-invoking over a payload range. Shared by
    * [[parseHeader]]'s tkhd probe and [[mp4SampleRanges]]' stbl walk. */
  private def isoBoxes(bytes: Array[Byte], lo: Long, hi: Long)
      : Iterator[(String, Long, Long)] =
    new Iterator[(String, Long, Long)] {
      @inline def u8(i: Int): Int = bytes(i) & 0xff
      @inline def be32(i: Int): Long =
        (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
      private var i = lo
      def hasNext: Boolean = i + 8 <= hi
      def next(): (String, Long, Long) = {
        val s0 = be32(i.toInt)
        val typ = new String(bytes, i.toInt + 4, 4, "ISO-8859-1")
        var payload = i + 8
        var end = if (s0 == 0) hi else i + s0
        if (s0 == 1) { // 64-bit size
          if (i + 16 > hi) { i = hi; return ("", hi, hi) }
          val sHi = be32(i.toInt + 8); val sLo = be32(i.toInt + 12)
          end = i + ((sHi << 32) | sLo); payload = i + 16
        }
        if (end <= i || end > hi) { i = hi; return ("", hi, hi) }
        val r = (typ, payload, end)
        i = end
        r
      }
    }

  /** REAL frame/sample extraction from an MP4 container — the byte range
    * of every media sample, reconstructed from the `stbl` tables the way
    * every demuxer does it: `stsc` (sample-to-chunk runs) distributes
    * samples over chunks, `stco`/`co64` gives each chunk's file offset,
    * `stsz` gives per-sample sizes (or one uniform size), and sample k's
    * offset is its chunk's offset plus the sizes of the samples before it
    * in that chunk. Pure byte arithmetic — what needs a codec is DECODING
    * a frame, not locating it.
    *
    * Takes the FIRST track with a complete stbl (the probe's video-first
    * ordering is the fixture contract); returns (offset, size) per sample
    * in sample order, or None for non-MP4/malformed/over-budget payloads
    * (> 1M samples — an executor-batch sanity cap like the decoders').
    * Ranges are validated against the payload length, so a slice over the
    * result can never go out of bounds on truncated files. */
  def mp4SampleRanges(bytes: Array[Byte]): Option[Vector[(Long, Int)]] = {
    if (bytes == null || bytes.length < 12 || bytes(4) != 'f' ||
      bytes(5) != 't' || bytes(6) != 'y' || bytes(7) != 'p') return None
    val n = bytes.length
    @inline def u8(i: Int): Int = bytes(i) & 0xff
    @inline def be32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def boxes(lo: Long, hi: Long) = isoBoxes(bytes, lo, hi)
    try {
      for ((t1, p1, e1) <- boxes(0, n.toLong) if t1 == "moov";
           (t2, p2, e2) <- boxes(p1, e1) if t2 == "trak";
           (t3, p3, e3) <- boxes(p2, e2) if t3 == "mdia";
           (t4, p4, e4) <- boxes(p3, e3) if t4 == "minf";
           (t5, p5, e5) <- boxes(p4, e4) if t5 == "stbl") {
        var stsc: Option[(Long, Long)] = None
        var stsz: Option[(Long, Long)] = None
        var stco: Option[(Long, Long, Boolean)] = None
        for ((t, p, e) <- boxes(p5, e5)) t match {
          case "stsc" => stsc = Some((p, e))
          case "stsz" => stsz = Some((p, e))
          case "stco" => stco = Some((p, e, false))
          case "co64" => stco = Some((p, e, true))
          case _ => ()
        }
        (stsc, stsz, stco) match {
          case (Some((scP, scE)), Some((szP, szE)), Some((coP, coE, co64))) =>
            // stsz: ver/flags(4) uniformSize(4) count(4) [sizes…]
            if (szP + 12 > szE) return None
            val uniform = be32(szP.toInt + 4)
            val count = be32(szP.toInt + 8)
            if (count < 0 || count > 1000000) return None
            val sizes = new Array[Long](count.toInt)
            if (uniform != 0) java.util.Arrays.fill(sizes, uniform)
            else {
              if (szP + 12 + 4L * count > szE) return None
              var k = 0
              while (k < count) { sizes(k) = be32((szP + 12 + 4L * k).toInt); k += 1 }
            }
            // stco/co64: ver/flags(4) count(4) [offsets…]
            if (coP + 8 > coE) return None
            val nChunks = be32(coP.toInt + 4)
            val width = if (co64) 8L else 4L
            if (nChunks < 0 || coP + 8 + width * nChunks > coE) return None
            def chunkOff(c: Int): Long = {
              val at = (coP + 8 + width * c).toInt
              if (co64) (be32(at) << 32) | be32(at + 4) else be32(at)
            }
            // stsc: ver/flags(4) count(4) [(firstChunk, samplesPerChunk,
            // descIdx)…]; each run applies to chunks firstChunk..next−1.
            if (scP + 8 > scE) return None
            val nRuns = be32(scP.toInt + 4)
            if (nRuns <= 0 || scP + 8 + 12L * nRuns > scE) return None
            def run(r: Int): (Long, Long) = {
              val at = (scP + 8 + 12L * r).toInt
              (be32(at), be32(at + 4)) // (firstChunk 1-based, samples/chunk)
            }
            val out = Vector.newBuilder[(Long, Int)]
            var sample = 0
            var r = 0
            var chunk = run(0)._1 // 1-based
            while (sample < count && chunk <= nChunks) {
              val perChunk = run(r)._2
              var off = chunkOff(chunk.toInt - 1)
              var k = 0L
              while (k < perChunk && sample < count) {
                val sz = sizes(sample)
                if (sz < 0 || sz > Int.MaxValue || off < 0 || off + sz > n)
                  return None // range escapes the payload — truncated file
                out += ((off, sz.toInt))
                off += sz
                sample += 1
                k += 1
              }
              chunk += 1
              if (r + 1 < nRuns && chunk >= run(r + 1)._1) r += 1
            }
            if (sample < count) return None // tables inconsistent
            return Some(out.result())
          case _ => () // this trak has no complete stbl; try the next
        }
      }
      None
      // NonFatal, NOT Throwable: the early `return`s above compile to
      // ControlThrowable from inside the for-comprehension closures — a
      // Throwable catch here would swallow every successful return.
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** [[frameRanges]] over a DataFrame: appends `n_frames` (long) and
    * `frame_samples` (array<binary>) — every `stride`-th media unit's raw
    * bytes, sliced at the REAL container boundaries (MP4 stbl tables,
    * MPEG-L3/ADTS header-chained frames — vs [[sampleChunks]]'
    * fixed-byte-stride fallback for opaque payloads). Narrow
    * per-partition pass; unrecognized/malformed payloads yield (−1,
    * null). ⚠ Decoding entropy-coded frames needs a codec — locating
    * them does not (MJPEG-family frames additionally DECODE via
    * [[decodeFrames]]). */
  def extractFrameSamples(df: DataFrame, stride: Int = 1,
                          bytesCol: String = "bytes"): DataFrame = {
    require(stride > 0, "stride must be positive")
    val schema = df.schema.add("n_frames", LongType)
      .add("frame_samples", ArrayType(BinaryType))
    val bi = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.map { row =>
        val b = row.getAs[Array[Byte]](bi)
        frameRanges(b) match {
          case Some(ranges) =>
            val picked = ranges.indices.by(stride).map { k =>
              val (off, sz) = ranges(k)
              java.util.Arrays.copyOfRange(b, off.toInt, off.toInt + sz)
            }
            Row.fromSeq(row.toSeq :+ ranges.length.toLong :+ picked)
          case None => Row.fromSeq(row.toSeq :+ -1L :+ null)
        }
      }
    }(Encoders.row(schema))
  }

  /** Frame/sample byte ranges for ANY supported container: MP4 (stbl
    * demux), MPEG Layer III (header-chained frames, r10), ADTS AAC
    * (length-field-chained frames, r10). This is what
    * [[extractFrameSamples]] slices with — locating media units is byte
    * arithmetic for all three; only the entropy-coded payload decode
    * stays behind the codec boundary (images/MJPEG excepted, see
    * [[decodeFrames]]). */
  def frameRanges(bytes: Array[Byte]): Option[Vector[(Long, Int)]] =
    mp4SampleRanges(bytes)
      .orElse(mp3FrameRanges(bytes))
      .orElse(adtsFrameRanges(bytes))
      .orElse(oggPacketRanges(bytes))

  /** REAL video-frame PIXEL decode for MJPEG-family MP4s (r10): every
    * `stride`-th frame is located by [[mp4SampleRanges]]' stbl byte
    * arithmetic and decoded by the SAME JDK readers as still images —
    * Motion-JPEG (and PNG/PNM-sample) video carries each frame as a
    * complete self-contained picture, so "video frame decode needs an
    * external codec" stopped being true for that family exactly the way
    * it did for still images in r9. Appends per payload:
    *
    *   - `n_frames` (long): total samples in the container (−1 = not MP4),
    *   - `frames_decoded` (long): sampled frames whose bytes decoded,
    *   - `frame_pixels`/`frame_luma_sum` (long): integer-exact decoded
    *     statistics over the sampled frames (the
    *     [[extractFeaturesBatched]] discipline, per frame),
    *   - `first_frame_phash` (long, nullable): the standard aHash of the
    *     first decoded frame (decode → 16×16 box-mean → 16-cell linear
    *     hash) — BIT-IDENTICAL to [[perceptualHash]] of the same picture
    *     as a standalone image (shared [[linearAhash]]), so video
    *     near-dup keys join directly against image near-dup keys.
    *
    * ⚠ Entropy-coded INTER-frame codecs (h264/h265/vp9 …) remain the stub
    * boundary: their samples are not self-contained pictures and need an
    * external codec; such frames simply count as undecoded here. Narrow
    * per-partition pass, no shuffle, untrusted bytes never throw. */
  def decodeFrames(df: DataFrame, stride: Int = 1,
                   bytesCol: String = "bytes"): DataFrame = {
    require(stride > 0, "stride must be positive")
    val schema = df.schema.add("n_frames", LongType)
      .add("frames_decoded", LongType).add("frame_pixels", LongType)
      .add("frame_luma_sum", LongType)
      .add("first_frame_phash", LongType)
    val bi = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.map { row =>
        val b = row.getAs[Array[Byte]](bi)
        mp4SampleRanges(b) match {
          case Some(ranges) =>
            var decoded = 0L; var px = 0L; var luma = 0L
            var ph: java.lang.Long = null
            ranges.indices.by(stride).foreach { k =>
              val (off, sz) = ranges(k)
              val frame =
                java.util.Arrays.copyOfRange(b, off.toInt, off.toInt + sz)
              decodeImage(frame).foreach { img =>
                decoded += 1L
                px += img.pixels.length.toLong
                var i = 0
                while (i < img.pixels.length) {
                  luma += img.pixels(i) & 0xff; i += 1
                }
                if (ph == null)
                  ph = linearAhash(boxDownscale(img, 16, 16).pixels, 16)
              }
            }
            Row.fromSeq(row.toSeq :+ ranges.length.toLong :+ decoded :+
              px :+ luma :+ ph)
          case None => Row.fromSeq(row.toSeq :+ -1L :+ 0L :+ 0L :+ 0L :+ null)
        }
      }
    }(Encoders.row(schema))
  }

  /** A decoded grayscale pixel plane (row-major, one byte per pixel). */
  final case class GrayImage(width: Int, height: Int, pixels: Array[Byte])

  /** REAL pixel decode for binary PGM (P5, grayscale) and PPM (P6, RGB →
    * gray by integer mean (r+g+b)/3, floor) with maxval ≤ 255 — the
    * uncompressed formats whose "codec" is pure byte arithmetic: a PNM
    * header is the magic, then whitespace-separated width/height/maxval
    * tokens (with `#` line comments), one whitespace byte, then the raw
    * plane. Returns None on anything malformed/truncated/oversized —
    * untrusted corpus bytes never throw. Payloads past ~64 MPix are
    * rejected (a decoded plane must stay executor-batch-sized; a real
    * pipeline downscales inside the codec). */
  /** Parsed PNM (P5/P6) header: (rgb?, width, height, plane offset). */
  private def pnmHeader(bytes: Array[Byte]): Option[(Boolean, Int, Int, Int)] = {
    if (bytes == null || bytes.length < 2) return None
    if (bytes(0) != 'P' || (bytes(1) != '5' && bytes(1) != '6')) return None
    val rgb = bytes(1) == '6'
    val n = bytes.length
    var i = 2
    // Three header integers, skipping whitespace and '#' comments.
    val vals = new Array[Int](3)
    var v = 0
    while (v < 3) {
      var moved = true
      while (moved) {
        moved = false
        while (i < n && (bytes(i) == ' ' || bytes(i) == '\t' ||
          bytes(i) == '\n' || bytes(i) == '\r')) { i += 1; moved = true }
        if (i < n && bytes(i) == '#') {
          while (i < n && bytes(i) != '\n') i += 1
          moved = true
        }
      }
      if (i >= n || bytes(i) < '0' || bytes(i) > '9') return None
      var x = 0L
      while (i < n && bytes(i) >= '0' && bytes(i) <= '9') {
        x = x * 10 + (bytes(i) - '0')
        if (x > Int.MaxValue) return None
        i += 1
      }
      vals(v) = x.toInt
      v += 1
    }
    val (w, h, maxv) = (vals(0), vals(1), vals(2))
    if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 255) return None
    if (w.toLong * h > 64L * 1024 * 1024) return None
    // Exactly ONE whitespace byte separates the header from the plane.
    if (i >= n || !(bytes(i) == ' ' || bytes(i) == '\t' ||
      bytes(i) == '\n' || bytes(i) == '\r')) return None
    Some((rgb, w, h, i + 1))
  }

  def decodeGray(bytes: Array[Byte]): Option[GrayImage] = {
    val (rgb, w, h, off) = pnmHeader(bytes) match {
      case Some(t) => t
      case None => return None
    }
    val n = bytes.length
    val i = off
    val pixels = w * h
    val need = if (rgb) 3L * pixels else pixels.toLong
    if (n - i < need) return None
    val out = new Array[Byte](pixels)
    if (rgb) {
      var p = 0
      while (p < pixels) {
        val b = i + 3 * p
        out(p) = (((bytes(b) & 0xff) + (bytes(b + 1) & 0xff) +
          (bytes(b + 2) & 0xff)) / 3).toByte
        p += 1
      }
    } else {
      System.arraycopy(bytes, i, out, 0, pixels)
    }
    Some(GrayImage(w, h, out))
  }

  /** REAL pixel decode for the entropy-coded image formats too (r9):
    * JPEG and PNG — plus GIF, BMP, and TIFF (r10) — through the JDK's built-in
    * `javax.imageio` readers — a Java SE API, not an added dependency, so
    * the "codec library this container doesn't ship" boundary turns out
    * not to apply to images at all. Decoded ARGB reduces to the same
    * integer-mean gray plane as [[decodeGray]]'s P6 path ((r+g+b)/3,
    * floor), so all downstream feature/phash arithmetic is shared.
    *
    * Untrusted-bytes discipline: the byte-level [[parseHeader]] probe runs
    * FIRST and gates dimensions (≤ 64 MPix) before any decoder sees the
    * payload — a crafted dimension bomb is rejected from the header, and
    * any decoder exception/null (truncated stream, wrong format) returns
    * None. GIF needs a SECOND gate: the probe reads the logical-screen
    * dimensions, but the JDK reader allocates from the IMAGE-DESCRIPTOR
    * dimensions — a different header field — so a 1×1 screen with a
    * 40000×40000 descriptor would bypass a screen-only gate
    * ([[gifDescriptorPixels]] walks to the first descriptor and gates on
    * it; every other format's probe reads the same field the decoder
    * allocates from). In-memory only (`ImageIO.setUseCache(false)` — the
    * default temp-FILE cache would do disk I/O per payload inside
    * executors). */
  def decodeImage(bytes: Array[Byte]): Option[GrayImage] = {
    decodeGray(bytes).orElse {
      val h = parseHeader(bytes)
      if (!ImageIoFormats.contains(h.format) ||
        h.width <= 0 || h.height <= 0 ||
        h.width.toLong * h.height > 64L * 1024 * 1024 ||
        (h.format == "gif" && !gifDescriptorPixels(bytes)
          .exists(p => p > 0 && p <= 64L * 1024 * 1024))) None
      else
        try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          if (img == null) None
          else {
            val (w, ht) = (img.getWidth, img.getHeight)
            val out = new Array[Byte](w * ht)
            var y = 0
            while (y < ht) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                out(y * w + x) = ((((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff)
                  + (rgb & 0xff)) / 3).toByte
                x += 1
              }
              y += 1
            }
            Some(GrayImage(w, ht, out))
          }
        } catch { case _: Throwable => None }
    }
  }

  /** Pixel count of a GIF's FIRST image descriptor — the field the JDK
    * reader actually allocates from (the logical-screen dimensions the
    * probe reports are a different field; see [[decodeImage]]'s gate).
    * Walks header → optional global color table → extension blocks
    * (sub-block chains) to the first 0x2C descriptor; None on trailer,
    * truncation, or malformed block structure. Untrusted bytes never
    * throw. */
  private def gifDescriptorPixels(bytes: Array[Byte]): Option[Long] = {
    val n = bytes.length
    @inline def u8(i: Int): Int = bytes(i) & 0xff
    @inline def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    if (n < 13) return None
    var i = 13L
    if ((u8(10) & 0x80) != 0) i += 3L * (1 << ((u8(10) & 0x7) + 1))
    while (i + 1 <= n) {
      u8(i.toInt) match {
        case 0x2c => // image descriptor: left(2) top(2) w(2) h(2) flags(1)
          if (i + 9 > n) return None
          return Some(le16(i.toInt + 5).toLong * le16(i.toInt + 7))
        case 0x21 => // extension: introducer + label + sub-block chain
          i += 2
          var sz = -1
          while (sz != 0 && i + 1 <= n) { sz = u8(i.toInt); i += 1L + sz }
          if (sz != 0) return None // ran off the end mid-chain
        case _ => return None // 0x3B trailer (no image) or malformed
      }
    }
    None
  }

  /** Formats [[decodeImage]] routes to the JDK readers — each with a
    * byte-level [[parseHeader]] probe that gates dimensions BEFORE any
    * decoder touches the untrusted payload. */
  private val ImageIoFormats = Set("jpeg", "png", "gif", "bmp", "tiff")

  javax.imageio.ImageIO.setUseCache(false)

  /** Integer box-mean downscale of a gray plane to `tw`×`th` — the REAL
    * "resize" step of the decode/feature/resize pipeline contract, in
    * exact integer arithmetic (each target cell is the floor-mean of its
    * source box; boxes partition the source, last row/col ragged). Images
    * already at or below the target pass through unchanged. */
  def boxDownscale(img: GrayImage, tw: Int, th: Int): GrayImage = {
    require(tw > 0 && th > 0)
    if (img.width <= tw && img.height <= th) return img
    val ow = math.min(tw, img.width)
    val oh = math.min(th, img.height)
    val out = new Array[Byte](ow * oh)
    // Box bounds in Long: cy*height (and cx*width) overflow Int for tall
    // sources near the 64 MPix cap with large public-API targets — the
    // internal 16×16 phash call was safe only by coincidence (ADVICE r9).
    var cy = 0
    while (cy < oh) {
      val y0 = (cy.toLong * img.height / oh).toInt
      val y1 = math.max(((cy + 1).toLong * img.height / oh).toInt, y0 + 1)
      var cx = 0
      while (cx < ow) {
        val x0 = (cx.toLong * img.width / ow).toInt
        val x1 = math.max(((cx + 1).toLong * img.width / ow).toInt, x0 + 1)
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += img.pixels(y * img.width + x) & 0xff; x += 1 }
          y += 1
        }
        out(cy * ow + cx) = (s / ((y1 - y0).toLong * (x1 - x0))).toByte
        cx += 1
      }
      cy += 1
    }
    GrayImage(ow, oh, out)
  }

  /** A decoded PCM sample stream (channels interleaved, one Int per
    * sample: signed 16-bit values, or 8-bit unsigned re-centered to
    * signed by −128 so silence is 0 in both widths). */
  final case class PcmAudio(sampleRate: Int, channels: Int,
                            bitsPerSample: Int, samples: Array[Int],
                            codec: String = "pcm")

  /** ITU-T G.711 µ-law expansion: one encoded byte → the 16-bit linear
    * sample it represents. Pure table-free integer arithmetic (the
    * published complement/segment/mantissa formula) — this is the REAL
    * decode for µ-law WAV (format tag 7), not a stub. */
  def ulawToLinear(b: Int): Int = {
    val u = ~b & 0xff
    val t = (((u & 0x0f) << 3) + 0x84) << ((u >> 4) & 0x07)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** ITU-T G.711 A-law expansion (format tag 6): XOR-0x55 unbias, then the
    * published segment expansion; sign bit SET means positive in A-law. */
  def alawToLinear(b: Int): Int = {
    val a = b ^ 0x55
    val seg = (a >> 4) & 0x07
    val t0 = (a & 0x0f) << 4
    val t =
      if (seg == 0) t0 + 8
      else (t0 + 0x108) << (seg - 1)
    if ((a & 0x80) != 0) t else -t
  }

  /** IMA/DVI ADPCM step-size table (89 entries) and index-adjust table —
    * the published constants from the IMA ADPCM specification. */
  private val ImaStep: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
  private val ImaIndexAdj: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** REAL sample decode for WAV — PCM (format tag 1, 8/16-bit), G.711
    * µ-law/A-law (tags 7/6, decoded to 16-bit linear via [[ulawToLinear]]/
    * [[alawToLinear]]), and IMA ADPCM (tag 0x11, the block-structured
    * 4-bit predictor codec decoded by the published step/index tables):
    * the RIFF chunk walk of [[parseHeader]] continued through `fmt ` into
    * the `data` chunk. PCM samples are read as 16-bit little-endian signed
    * or 8-bit unsigned−128; compressed tags decode to 16-bit linear (the
    * returned `bitsPerSample` is the DECODED width, 16). None on
    * malformed/truncated payloads and on tags with no pure-byte decode
    * (mp3/aac live behind a codec boundary, not here) — untrusted bytes
    * never throw; outputs past ~64 M samples are rejected for the same
    * executor-batch-size reason as [[decodeGray]]. */
  def decodePcm(bytes: Array[Byte]): Option[PcmAudio] = {
    if (bytes == null || bytes.length < 44) return None
    val n = bytes.length
    @inline def u8(i: Int): Int = bytes(i) & 0xff
    @inline def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    @inline def le32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) |
        (u8(i + 3).toLong << 24)
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' &&
      bytes(10) == 'V' && bytes(11) == 'E')) return None
    var i = 12
    var rate = 0; var channels = 0; var bits = 0; var tag = 0
    var blockAlign = 0; var samplesPerBlock = 0; var fmtSeen = false
    while (i + 8 <= n) {
      val size = le32(i + 4)
      if (size < 0 || size > Int.MaxValue - 9) return None
      val body = i + 8
      if (bytes(i) == 'f' && bytes(i + 1) == 'm' && bytes(i + 2) == 't' &&
        bytes(i + 3) == ' ') {
        if (size < 16 || body + 16 > n) return None
        tag = le16(body)
        channels = le16(body + 2)
        val r = le32(body + 4)
        blockAlign = le16(body + 12)
        bits = le16(body + 14)
        if (channels <= 0 || r <= 0 || r > Int.MaxValue) return None
        tag match {
          case 1 => if (bits != 8 && bits != 16) return None
          case 6 | 7 => if (bits != 8) return None
          case 0x11 => // IMA ADPCM: extended fmt carries samples/block
            if (bits != 4 || size < 20 || body + 20 > n) return None
            samplesPerBlock = le16(body + 18)
            if (blockAlign < 4 * channels || samplesPerBlock <= 0) return None
          case _ => return None
        }
        rate = r.toInt
        fmtSeen = true
      } else if (bytes(i) == 'd' && bytes(i + 1) == 'a' &&
        bytes(i + 2) == 't' && bytes(i + 3) == 'a') {
        if (!fmtSeen) return None // fmt must precede data
        if (body + size > n) return None // truncated data chunk
        val sz = size.toInt
        tag match {
          case 1 =>
            val count = if (bits == 16) sz / 2 else sz
            if (count > 64 * 1024 * 1024) return None
            val out = new Array[Int](count)
            var s = 0
            if (bits == 16) {
              while (s < count) {
                out(s) = le16(body + 2 * s).toShort.toInt
                s += 1
              }
            } else {
              while (s < count) { out(s) = u8(body + s) - 128; s += 1 }
            }
            return Some(PcmAudio(rate, channels, bits, out))
          case 6 | 7 =>
            if (sz > 64 * 1024 * 1024) return None
            val out = new Array[Int](sz)
            var s = 0
            if (tag == 7) {
              while (s < sz) { out(s) = ulawToLinear(u8(body + s)); s += 1 }
            } else {
              while (s < sz) { out(s) = alawToLinear(u8(body + s)); s += 1 }
            }
            return Some(PcmAudio(rate, channels, 16, out,
              if (tag == 7) "ulaw" else "alaw"))
          case _ => // 0x11, the only tag fmt lets through
            return decodeImaAdpcm(bytes, body, sz, rate, channels,
              blockAlign, samplesPerBlock)
        }
      }
      // Advance in Long: body + size can overflow Int for declared sizes
      // near the cap, wrapping the cursor negative and sending the next
      // iteration's reads out of bounds (ADVICE r9).
      val next = body.toLong + size + (size & 1) // word-aligned chunks
      if (next > n) return None
      i = next.toInt
    }
    None
  }

  /** IMA ADPCM block decode (WAV format tag 0x11). Block layout per the
    * IMA spec: per channel a 4-byte header (initial 16-bit predictor —
    * which IS the block's first output sample — plus the step index),
    * then interleaved 4-byte nibble words per channel, low nibble first,
    * each word carrying 8 consecutive samples of its channel. A trailing
    * partial block decodes its complete rows; `samplesPerBlock` caps each
    * block's output (trailing pad nibbles dropped), exactly as players
    * treat the extended-fmt field. Never throws on untrusted bytes. */
  private def decodeImaAdpcm(bytes: Array[Byte], body: Int, sz: Int,
      rate: Int, channels: Int, blockAlign: Int,
      samplesPerBlock: Int): Option[PcmAudio] = {
    @inline def u8(i: Int): Int = bytes(i) & 0xff
    @inline def le16s(i: Int): Int = (u8(i) | (u8(i + 1) << 8)).toShort.toInt
    val rowBytes = 4 * channels
    def framesIn(blockLen: Int): Int =
      if (blockLen < 4 * channels) 0
      else math.min(samplesPerBlock, 1 + 8 * ((blockLen - 4 * channels) / rowBytes))
    val nFull = sz / blockAlign
    val rem = sz % blockAlign
    val totalFrames = nFull.toLong * framesIn(blockAlign) + framesIn(rem)
    if (totalFrames * channels > 64L * 1024 * 1024) return None
    val out = new Array[Int]((totalFrames * channels).toInt)
    val pred = new Array[Int](channels)
    val idx = new Array[Int](channels)
    var globalFrame = 0
    var b = 0
    val nBlocks = nFull + (if (rem > 0) 1 else 0)
    while (b < nBlocks) {
      val blockStart = body + b * blockAlign
      val blockLen = math.min(blockAlign, sz - b * blockAlign)
      val frames = framesIn(blockLen)
      if (frames > 0) {
        var c = 0
        while (c < channels) {
          pred(c) = le16s(blockStart + 4 * c)
          idx(c) = math.max(0, math.min(88, u8(blockStart + 4 * c + 2)))
          out(globalFrame * channels + c) = pred(c)
          c += 1
        }
        var f = 1
        var rowBase = blockStart + 4 * channels
        while (f < frames) {
          val rowFrames = math.min(8, frames - f)
          var k = 0
          while (k < rowFrames) {
            var c = 0
            while (c < channels) {
              val byteIdx = rowBase + c * 4 + (k >> 1)
              val nib =
                if ((k & 1) == 0) u8(byteIdx) & 0x0f
                else (u8(byteIdx) >> 4) & 0x0f
              val step = ImaStep(idx(c))
              var diff = step >> 3
              if ((nib & 1) != 0) diff += step >> 2
              if ((nib & 2) != 0) diff += step >> 1
              if ((nib & 4) != 0) diff += step
              val p = if ((nib & 8) != 0) pred(c) - diff else pred(c) + diff
              pred(c) = math.max(-32768, math.min(32767, p))
              idx(c) = math.max(0, math.min(88, idx(c) + ImaIndexAdj(nib)))
              out((globalFrame + f + k) * channels + c) = pred(c)
              c += 1
            }
            k += 1
          }
          f += rowFrames
          rowBase += rowBytes
        }
        globalFrame += frames
      }
      b += 1
    }
    Some(PcmAudio(rate, channels, 16, out, "ima_adpcm"))
  }

  /** MSB-first bit cursor over a byte range — the FLAC frame layer is bit
    * packed (everything before it is byte aligned). Reads past the end
    * throw [[ArrayIndexOutOfBoundsException]]; [[decodeFlac]] catches and
    * returns None, keeping the untrusted-bytes contract. */
  private final class BitReader(bytes: Array[Byte], startByte: Int,
                                endByte: Int) {
    private var bitPos: Long = startByte.toLong * 8
    private val endBit: Long = endByte.toLong * 8
    def bytePos: Int = ((bitPos + 7) >> 3).toInt
    def remaining: Long = endBit - bitPos
    def bits(n: Int): Int = bitsLong(n).toInt
    def bitsLong(n: Int): Long = {
      var v = 0L; var k = n
      while (k > 0) {
        if (bitPos >= endBit) throw new ArrayIndexOutOfBoundsException("eof")
        val b = (bytes((bitPos >> 3).toInt) >> (7 - (bitPos & 7).toInt)) & 1
        v = (v << 1) | b
        bitPos += 1; k -= 1
      }
      v
    }
    /** Two's-complement signed read. */
    def sbits(n: Int): Int = { val v = bits(n); (v << (32 - n)) >> (32 - n) }
    /** Signed read past 32 bits (side subframes of a 32-bps stream are
      * 33-bit). */
    def sbitsLong(n: Int): Long =
      { val v = bitsLong(n); (v << (64 - n)) >> (64 - n) }
    /** Zero run length before the terminating 1 bit. */
    def unary(): Int = {
      var c = 0
      while (bits(1) == 0) {
        c += 1
        if (c > (1 << 24)) throw new ArrayIndexOutOfBoundsException("unary")
      }
      c
    }
    def alignByte(): Unit = bitPos = (bitPos + 7) & ~7L
  }

  /** CRC-8, polynomial 0x07, init 0 — the FLAC frame-header checksum. */
  private[multimodal] def flacCrc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= bytes(i) & 0xff
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, polynomial 0x8005, init 0 — the FLAC whole-frame checksum. */
  private[multimodal] def flacCrc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (bytes(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc =
          if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
          else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  /** Shared STREAMINFO walk: (rate, channels, bps, totalSamples,
    * firstFrameOffset) — the ONE transcription of the metadata-block bit
    * layout, serving both [[parseHeader]]'s probe and [[decodeFlac]] (a
    * second hand-maintained copy of the same arithmetic would drift).
    * None when the magic or STREAMINFO is absent. A chain TRUNCATED
    * after a parsed STREAMINFO (an interrupted download cut inside a
    * PADDING/PICTURE block) still returns the stream parameters — the
    * probe should classify such a file — with `firstFrameOffset = -1` so
    * the decoder, which needs the frames, still refuses. Never throws. */
  private def flacStreaminfo(bytes: Array[Byte])
      : Option[(Int, Int, Int, Long, Int)] = {
    if (bytes == null) return None
    val n = bytes.length
    if (n < 42 || !(bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' &&
      bytes(3) == 'C')) return None
    @inline def u8(i: Int): Int = bytes(i) & 0xff
    var i = 4
    var rate = 0; var channels = 0; var bps = 0; var total = 0L
    var seen = false; var last = false
    while (!last) {
      if (i + 4 > n || (i + 4 + ((u8(i + 1) << 16) | (u8(i + 2) << 8) |
        u8(i + 3))) > n)
        return if (seen) Some((rate, channels, bps, total, -1)) else None
      val hdr = u8(i)
      last = (hdr & 0x80) != 0
      val len = (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
      val body = i + 4
      if ((hdr & 0x7f) == 0 && len >= 34) {
        rate = (u8(body + 10) << 12) | (u8(body + 11) << 4) |
          (u8(body + 12) >> 4)
        channels = ((u8(body + 12) >> 1) & 0x7) + 1
        bps = (((u8(body + 12) & 0x1) << 4) | (u8(body + 13) >> 4)) + 1
        total = ((u8(body + 13) & 0xfL) << 32) | (u8(body + 14).toLong << 24) |
          (u8(body + 15).toLong << 16) | (u8(body + 16).toLong << 8) |
          u8(body + 17).toLong
        seen = true
      }
      i = body + len
    }
    if (seen) Some((rate, channels, bps, total, i)) else None
  }

  /** Any plausible FLAC frame header at a byte offset ≥ `from`? Sync
    * pattern + a validating CRC-8 — the disambiguator between "trailing
    * tag after the last frame" and "mid-stream corruption" for
    * unknown-length streams (an accidental 0xFFF8 in tag bytes won't
    * carry a matching header checksum). Failure-path only. */
  private def hasLaterFlacSync(bytes: Array[Byte], from: Int): Boolean = {
    var i = math.max(from, 0)
    val n = bytes.length
    while (i + 5 <= n) {
      if ((bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xfc) == 0xf8) {
        // Re-parse just the fixed header + coded number + optional
        // blocksize/rate bytes, then check CRC-8 — cheap and local.
        try {
          val br = new BitReader(bytes, i, n)
          br.bits(16)
          val bsCode = br.bits(4); val srCode = br.bits(4)
          br.bits(8) // chan + sample-size + reserved
          val b0 = br.bits(8)
          var okHdr = true
          if ((b0 & 0x80) != 0) {
            var cont = 0; var mask = 0x40
            while ((b0 & mask) != 0 && cont < 7) { cont += 1; mask >>= 1 }
            if (cont == 0 || cont > 6) okHdr = false
            var k = 0
            while (okHdr && k < cont) {
              if ((br.bits(8) & 0xc0) != 0x80) okHdr = false
              k += 1
            }
          }
          if (okHdr) {
            if (bsCode == 6) br.bits(8) else if (bsCode == 7) br.bits(16)
            if (srCode == 12) br.bits(8)
            else if (srCode == 13 || srCode == 14) br.bits(16)
            if (br.bits(8) == flacCrc8(bytes, i, br.bytePos - 1)) return true
          }
        } catch { case _: ArrayIndexOutOfBoundsException => () }
      }
      i += 1
    }
    false
  }

  /** REAL FLAC sample decode — the lossless-audio analog of the image
    * work: pure integer arithmetic end to end (RFC 9639), no codec
    * library. Implements the full mandatory frame layer: metadata-block
    * walk to STREAMINFO; frame headers (all blocksize/rate/sample-size
    * codes, UTF-8-style coded numbers, CRC-8 VALIDATED); subframes
    * CONSTANT / VERBATIM / FIXED orders 0–4 / LPC orders 1–32 (quantized
    * coefficients, arithmetic-shift prediction accumulated in Long);
    * wasted-bits unary; Rice residual partitions (4- and 5-bit
    * parameters, raw-bits escape, zigzag); left/side, right/side and
    * mid/side stereo decorrelation; whole-frame CRC-16 VALIDATED. A
    * checksum mismatch or any structural violation returns None — on
    * untrusted bytes a lying frame fails loud (as None), never decodes
    * to garbage samples. Output interleaved like [[decodePcm]], capped at
    * the same ~64 M samples; `bitsPerSample` is the stream's real bps.
    *
    * Narrow per-partition work; the bit cursor costs ~1 bit-op per coded
    * bit — fixture-scale corpora decode in well under a second, and a
    * real deployment would vectorize the same arithmetic, not change
    * it. */
  def decodeFlac(bytes: Array[Byte]): Option[PcmAudio] = {
    try {
      val (rate, channels, bps, total, frameOff) = flacStreaminfo(bytes) match {
        case Some(t) => t
        case None => return None
      }
      if (frameOff < 0) return None // STREAMINFO parsed, chain truncated
      val n = bytes.length
      if (rate <= 0 || channels < 1 || channels > 8 ||
        bps < 4 || bps > 32) return None
      if (total * channels > 64L * 1024 * 1024) return None
      // --- frames until the declared total (or stream end when total=0).
      val out = new java.util.ArrayList[Array[Int]]() // per-frame interleaved
      var collected = 0L
      var done = false
      val br = new BitReader(bytes, frameOff, n)
      while (!done && (total == 0L || collected < total) &&
        br.remaining >= 32) {
        val frameStart = br.bytePos
        if (br.bits(14) != 0x3ffe) {
          // Lost sync at a frame BOUNDARY. For an unknown-length stream
          // (total = 0) a trailing tag/padding block is legal — but so
          // is this exact state after MID-stream corruption of a later
          // frame's sync bytes, and returning the banked frames there
          // would silently truncate audio (review r10). Disambiguate by
          // scanning the remainder for another plausible frame header:
          // none → legitimate end of audio; one found → malformation,
          // fail loud. (With a declared total the loop exits at
          // `collected == total`, and a short stream fails the count
          // check below.)
          if (total == 0L && collected > 0L &&
            !hasLaterFlacSync(bytes, frameStart)) done = true
          else return None
        } else {
        if (br.bits(1) != 0) return None // reserved
        br.bits(1) // blocking strategy
        val bsCode = br.bits(4); val srCode = br.bits(4)
        val chanAsn = br.bits(4); val ssCode = br.bits(3)
        if (br.bits(1) != 0) return None // reserved
        // UTF-8-style coded frame/sample number (value unused here).
        val b0 = br.bits(8)
        if ((b0 & 0x80) != 0) {
          var cont = 0; var mask = 0x40
          while ((b0 & mask) != 0 && cont < 7) { cont += 1; mask >>= 1 }
          if (cont == 0 || cont > 6) return None // 10xxxxxx lead / overlong
          var k = 0
          while (k < cont) {
            if ((br.bits(8) & 0xc0) != 0x80) return None
            k += 1
          }
        }
        val blocksize = bsCode match {
          case 0 => return None // reserved
          case 1 => 192
          case c if c <= 5 => 576 << (c - 2)
          case 6 => br.bits(8) + 1
          case 7 => br.bits(16) + 1
          case c => 256 << (c - 8)
        }
        srCode match { // stream/frame rate consistency is not enforced
          case 12 => br.bits(8)
          case 13 | 14 => br.bits(16)
          case 15 => return None
          case _ => 0
        }
        val frameBps = ssCode match {
          case 0 => bps
          case 1 => 8
          case 2 => 12
          case 4 => 16
          case 5 => 20
          case 6 => 24
          case 7 => 32
          case _ => return None
        }
        val headerEnd = br.bytePos
        if (br.bits(8) != flacCrc8(bytes, frameStart, headerEnd)) return None
        val nch = if (chanAsn <= 7) chanAsn + 1 else 2
        if (chanAsn > 10) return None
        if (nch != channels) return None
        if (collected + blocksize > 64L * 1024 * 1024 / channels) return None
        // --- subframes, decoded in LONG: side channels carry one extra
        // bit, so a 32-bps stream's side subframe is 33 bits wide —
        // representable only past Int (review r10). Reconstructed
        // left/right always fit the stream's bps ≤ 32.
        val chans = new Array[Array[Long]](nch)
        var c = 0
        while (c < nch) {
          val extra = chanAsn match {
            case 8 if c == 1 => 1 // left/side
            case 9 if c == 0 => 1 // right/side
            case 10 if c == 1 => 1 // mid/side
            case _ => 0
          }
          chans(c) = decodeFlacSubframe(br, blocksize, frameBps + extra)
          c += 1
        }
        // --- stereo decorrelation.
        chanAsn match {
          case 8 => // left/side: right = left - side
            var k = 0
            while (k < blocksize) {
              chans(1)(k) = chans(0)(k) - chans(1)(k); k += 1
            }
          case 9 => // right/side: left = right + side
            var k = 0
            while (k < blocksize) {
              val r = chans(1)(k)
              chans(0)(k) = r + chans(0)(k)
              k += 1
            }
          case 10 => // mid/side
            var k = 0
            while (k < blocksize) {
              val s = chans(1)(k)
              val m = (chans(0)(k) << 1) | (s & 1L)
              chans(0)(k) = (m + s) >> 1
              chans(1)(k) = (m - s) >> 1
              k += 1
            }
          case _ => ()
        }
        br.alignByte()
        val footerStart = br.bytePos
        if (br.bits(16) != flacCrc16(bytes, frameStart, footerStart))
          return None
        val inter = new Array[Int](blocksize * nch)
        var k = 0
        while (k < blocksize) {
          var cc = 0
          while (cc < nch) {
            val v = chans(cc)(k)
            // A crafted CRC-valid frame can reconstruct values past the
            // stream's bps (e.g. 32-bps left minus a hostile 33-bit
            // side) — failing loud here keeps the no-garbage-samples
            // contract instead of wrapping at toInt (review r10).
            if (v < Int.MinValue || v > Int.MaxValue) return None
            inter(k * nch + cc) = v.toInt; cc += 1
          }
          k += 1
        }
        out.add(inter)
        collected += blocksize
        } // sync matched
      }
      if (total != 0L && collected < total) return None // truncated stream
      if (collected == 0L) return None
      var sz = 0
      val it = out.iterator()
      while (it.hasNext) sz += it.next().length
      val samples = new Array[Int](sz)
      var off = 0
      val it2 = out.iterator()
      while (it2.hasNext) {
        val a = it2.next()
        System.arraycopy(a, 0, samples, off, a.length)
        off += a.length
      }
      Some(PcmAudio(rate, channels, bps, samples, "flac"))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** One FLAC subframe → `blocksize` samples at `bps` effective bits. */
  private def decodeFlacSubframe(br: BitReader, blocksize: Int,
                                 bps: Int): Array[Long] = {
    def fail() = throw new ArrayIndexOutOfBoundsException("subframe")
    if (br.bits(1) != 0) fail() // pad bit
    val typ = br.bits(6)
    val wasted =
      if (br.bits(1) == 1) br.unary() + 1 else 0
    val ebps = bps - wasted
    if (ebps <= 0 || ebps > 33) fail() // 33 = 32-bps stream's side channel
    val out = new Array[Long](blocksize)
    typ match {
      case 0 => // CONSTANT
        val v = br.sbitsLong(ebps)
        java.util.Arrays.fill(out, v)
      case 1 => // VERBATIM
        var k = 0
        while (k < blocksize) { out(k) = br.sbitsLong(ebps); k += 1 }
      case t if t >= 8 && t <= 12 => // FIXED order 0-4
        val order = t - 8
        if (order > blocksize) fail()
        var k = 0
        while (k < order) { out(k) = br.sbitsLong(ebps); k += 1 }
        decodeFlacResiduals(br, blocksize, order, out)
        var j = order
        while (j < blocksize) {
          out(j) += (order match {
            case 0 => 0L
            case 1 => out(j - 1)
            case 2 => 2 * out(j - 1) - out(j - 2)
            case 3 => 3 * out(j - 1) - 3 * out(j - 2) + out(j - 3)
            case _ => 4 * out(j - 1) - 6 * out(j - 2) + 4 * out(j - 3) -
              out(j - 4)
          })
          j += 1
        }
      case t if t >= 32 => // LPC order 1-32
        val order = (t & 31) + 1
        if (order > blocksize) fail()
        var k = 0
        while (k < order) { out(k) = br.sbitsLong(ebps); k += 1 }
        val precM1 = br.bits(4)
        if (precM1 == 15) fail()
        val precision = precM1 + 1
        val shift = br.sbits(5)
        if (shift < 0) fail() // negative shift unused per spec
        val coefs = new Array[Int](order)
        var q = 0
        while (q < order) { coefs(q) = br.sbits(precision); q += 1 }
        decodeFlacResiduals(br, blocksize, order, out)
        var j = order
        while (j < blocksize) {
          var acc = 0L
          var p = 0
          while (p < order) { acc += coefs(p) * out(j - 1 - p); p += 1 }
          out(j) += acc >> shift
          j += 1
        }
      case _ => fail() // reserved types
    }
    if (wasted > 0) {
      var k = 0
      while (k < blocksize) { out(k) = out(k) << wasted; k += 1 }
    }
    out
  }

  /** FLAC Rice-partitioned residuals into `out(order until blocksize)`. */
  private def decodeFlacResiduals(br: BitReader, blocksize: Int, order: Int,
                                  out: Array[Long]): Unit = {
    def fail() = throw new ArrayIndexOutOfBoundsException("residual")
    val method = br.bits(2)
    if (method > 1) fail()
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val pOrder = br.bits(4)
    val partitions = 1 << pOrder
    if (blocksize % partitions != 0) fail()
    val perPart = blocksize / partitions
    var idx = order
    var part = 0
    while (part < partitions) {
      val count = if (part == 0) perPart - order else perPart
      if (count < 0) fail()
      val param = br.bits(pBits)
      if (param == escape) {
        val raw = br.bits(5)
        var k = 0
        while (k < count) {
          out(idx) = if (raw == 0) 0L else br.sbitsLong(raw)
          idx += 1; k += 1
        }
      } else {
        var k = 0
        while (k < count) {
          val q = br.unary()
          val u = (q.toLong << param) | br.bits(param).toLong
          out(idx) = (u >>> 1) ^ -(u & 1L)
          idx += 1; k += 1
        }
      }
      part += 1
    }
  }

  /** Decode step: fill `meta` from the payload's real container header, per
    * partition (per-partition iteration is where a stateful codec would be
    * amortized, exactly like [[graft.sources.AvroCodec]]). */
  def decodeHeader(df: DataFrame): DataFrame = {
    val schema = df.schema
    val bi = schema.fieldIndex("bytes")
    val mi = schema.fieldIndex("meta")
    df.mapPartitions { it =>
      it.map { row =>
        val h = parseHeader(row.getAs[Array[Byte]](bi))
        Row.fromSeq(row.toSeq.updated(mi,
          Row(h.format, h.width, h.height, h.sampleRate, h.channels)))
      }
    }(Encoders.row(schema))
  }

  /** Frame/chunk sampling: every `stride`-th `chunk`-byte slice of the
    * payload column (the frame-sample analog), as an array of binary chunks.
    * Pure built-in expressions — `substring` on binary is codegen'd. */
  def sampleChunks(payloadCol: String, chunk: Int, stride: Int): Column = {
    require(chunk > 0 && stride > 0)
    val step = chunk * stride
    expr(s"transform(sequence(0, greatest(cast((octet_length(`$payloadCol`) - 1) div $step as int), 0)), " +
      s"i -> substring(`$payloadCol`, i * $step + 1, $chunk))")
  }

  /** Cheap content features over the opaque payload: size + md5 — the
    * shuffle-free fingerprint used for exact media dedup. */
  def features(df: DataFrame, bytesCol: String = "bytes"): DataFrame =
    df.withColumn("n_bytes", octet_length(col(bytesCol)))
      .withColumn("content_hash", md5(col(bytesCol)))

  /** CUMULATIVE codec invocations of every [[extractFeaturesBatched]]
    * action on this JVM (never reset by the operator) — test/measurement
    * instrumentation for the batch contract; callers zero it themselves
    * around the action they want to count. Local-mode only: executors in
    * a real cluster would not share this JVM. */
  val batchCalls = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Batched feature extraction — the `mapInPandas`/`mapInArrow` batch
    * shape, in Scala: each partition's rows are drained into fixed-size
    * batches and the codec is invoked ONCE per batch with every payload in
    * it, emitting one feature row per input row in order. This is the
    * exact contract a vectorized decoder needs (GPU image decode, batched
    * resize: per-call setup amortized over `batchSize` payloads).
    *
    * Per payload it appends:
    *   - `byte_sum` (long): deterministic whole-payload byte sum — the
    *     integer-exact probe the DuckDB oracle pins, proving the batch
    *     path touched every byte of every row exactly once regardless of
    *     batch boundaries or partitioning;
    *   - `decoded` (string, nullable): which REAL decoder succeeded —
    *     `pgm`/`ppm` ([[decodeGray]]), `wav_pcm`/`wav_ulaw`/`wav_alaw`/
    *     `wav_ima_adpcm` ([[decodePcm]]'s fmt-tag dispatch), or `flac`
    *     ([[decodeFlac]]'s full frame layer), NULL when none applies;
    *   - `n_samples`/`sample_sum` (long, nullable): genuine decoded
    *     statistics — pixel count + gray-value sum for images, sample
    *     count + Σ|amplitude| (a loudness proxy) for audio.
    *
    * ⚠ STUB BOUNDARY: payloads that are neither decodable images nor
    * WAV/FLAC (i.e. perceptual codecs needing a codec library — mp3/aac,
    * inter-frame video) get NULL decode columns — a real pipeline would route them to
    * the vectorized codec in this same batch call. Narrow, no shuffle,
    * batches never buffered beyond `batchSize` rows. */
  def extractFeaturesBatched(df: DataFrame, batchSize: Int = 64,
                             bytesCol: String = "bytes"): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    val schema = df.schema.add("byte_sum", LongType)
      .add("decoded", StringType).add("n_samples", LongType)
      .add("sample_sum", LongType)
    val bi = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // One "codec" call per batch (counted); every payload decoded here.
        batchCalls.incrementAndGet()
        val payloads = batch.map(_.getAs[Array[Byte]](bi))
        val feats = payloads.map { b =>
          val byteSum =
            if (b == null) 0L else { var s = 0L; var i = 0
              while (i < b.length) { s += b(i) & 0xff; i += 1 }; s }
          decodeImage(b) match {
            case Some(img) =>
              var s = 0L; var i = 0
              while (i < img.pixels.length) { s += img.pixels(i) & 0xff; i += 1 }
              (byteSum, parseHeader(b).format, img.pixels.length.toLong, s)
            case None => decodePcm(b).map(a => ("wav_" + a.codec, a))
                .orElse(decodeFlac(b).map(a => (a.codec, a))) match {
              case Some((label, a)) =>
                var s = 0L; var i = 0
                while (i < a.samples.length) { s += math.abs(a.samples(i).toLong); i += 1 }
                (byteSum, label, a.samples.length.toLong, s)
              case None => (byteSum, null, -1L, -1L)
            }
          }
        }
        batch.lazyZip(feats).map { case (row, (bs, kind, ns, ss)) =>
          Row.fromSeq(row.toSeq :+ bs :+ kind :+
            (if (kind == null) null else ns) :+ (if (kind == null) null else ss))
        }
      }
    }(Encoders.row(schema))
  }

  /** The aHash bit construction over a raw plane: `nCells` equal cells
    * (last ragged), bit c set when cell c's byte mean exceeds the overall
    * mean, as an exact integer cross-multiply. Shared by
    * [[perceptualHash]] and [[decodeFrames]]' per-frame hash so a video
    * frame and the same picture as a standalone image hash identically. */
  private def linearAhash(b: Array[Byte], nCells: Int): Long = {
    var h = 0L
    if (b != null && b.length > 0) {
      val len = b.length
      val cellW = (len + nCells - 1) / nCells
      var total = 0L
      val sums = new Array[Long](nCells)
      val lens = new Array[Long](nCells)
      var i = 0
      while (i < len) {
        val v = (b(i) & 0xff).toLong
        total += v; sums(i / cellW) += v; lens(i / cellW) += 1L
        i += 1
      }
      var c = 0
      while (c < nCells) {
        if (sums(c) * len > total * lens(c)) h |= (1L << c)
        c += 1
      }
    }
    h
  }

  /** Per-payload `nCells`-bit PERCEPTUAL hash — the aHash construction:
    * the hashed plane is cut into `nCells` equal cells (last one ragged)
    * and bit i is set when cell i's byte MEAN exceeds the plane's overall
    * mean, as an integer cross-multiply (`cellSum·len > totalSum·cellLen`)
    * so hashes are bit-identical on any engine — no float division.
    *
    * The hashed plane is the REAL decoded, DOWNSCALED grayscale image
    * when the payload is a decodable image — PNM via [[decodeGray]],
    * JPEG/PNG via [[decodeImage]]'s JDK readers — box-mean-reduced to a
    * 16×16 luma thumbnail ([[boxDownscale]], the real aHash pipeline), so
    * two encodings of the same picture hash identically (PNM forms
    * bit-equal; PNG vs JPEG within the lossy-compression hamming budget,
    * spec-pinned). Non-image payloads fall back to the raw bytes (the
    * remaining stub boundary: compressed AUDIO and video frames).
    *
    * Narrow per-partition pass, no shuffle; null/empty payloads hash to 0.
    * `nCells ≤ 63` keeps the hash in one long; the cross-multiply stays
    * exact while `255·cellLen·len < 2⁶³` — payloads into the hundreds of
    * MB, far past any sane media blob (and a real deployment hashes the
    * decoded thumbnail, a few KB). */
  def perceptualHash(df: DataFrame, nCells: Int = 16,
                     bytesCol: String = "bytes"): DataFrame = {
    require(nCells >= 2 && nCells <= 63, "nCells must be in [2, 63]")
    val schema = df.schema.add("phash", LongType)
    val bi = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.map { row =>
        Row.fromSeq(row.toSeq :+ phashOf(row.getAs[Array[Byte]](bi), nCells))
      }
    }(Encoders.row(schema))
  }

  /** The per-payload hash behind [[perceptualHash]], exposed so
    * single-pass dispatchers (the crawl media route —
    * [[graft.streaming.CrawlMedia.mediaFrom]]) can hash inside their own
    * mapPartitions instead of forcing a second DataFrame pass. */
  def phashOf(raw: Array[Byte], nCells: Int = 16): Long =
    decodeImage(raw).map(phashOfImage(_, nCells))
      .getOrElse(linearAhash(raw, nCells))

  /** [[phashOf]] for an ALREADY-DECODED image — callers that needed the
    * decode result for routing ([[graft.streaming.CrawlMedia]]) hash
    * without paying the decode twice. */
  def phashOfImage(img: GrayImage, nCells: Int = 16): Long =
    linearAhash(boxDownscale(img, 16, 16).pixels, nCells)

  /** Near-duplicate media pairs by perceptual-hash hamming distance —
    * EXACT (every pair at distance ≤ `maxHamming`, no recall loss) via
    * pigeonhole banding: the `nBits` hash splits into `maxHamming + 1`
    * segments, and two hashes within the budget must agree on at least
    * one whole segment, so candidate generation is an equi-join on
    * (segment index, segment value) — the [[graft.operators.Dedup]] LSH
    * band shape, shuffle bounded by segment-bucket sizes, never the n²
    * cross join a naive hamming scan needs. Candidates are then filtered
    * on true `bit_count(xor)` and de-duplicated (a pair can agree on
    * several segments).
    *
    * Output: (a, b, hamming) with a < b by id. */
  def phashPairs(ph: DataFrame, nBits: Int, maxHamming: Int = 2,
                 idCol: String = "media_id",
                 maxBucket: Long = graft.operators.Dedup.MaxBucket): DataFrame = {
    val nSeg = maxHamming + 1
    require(nBits >= nSeg, s"need at least $nSeg bits for $maxHamming-bit budget")
    require(maxBucket >= 2, "maxBucket below 2 would drop every pair")
    // ≤ 63: at 64 a full-width segment's mask (1L << 64) − 1 wraps to 0
    // (Scala shift counts are mod 64), which would silently collapse the
    // banding into ONE bucket — a correct but quadratic self-join.
    require(nBits <= 63, "nBits must be <= 63 (single-long hashes)")
    val segW = (nBits + nSeg - 1) / nSeg
    val segs = (0 until nSeg).map { s =>
      val lo = s * segW
      val w = math.min(segW, nBits - lo)
      struct(lit(s).as("seg"),
        expr(s"shiftright(phash, $lo) & ${(1L << w) - 1}").as("sv"))
    }
    val e0 = ph.select(col(idCol), col("phash"), explode(array(segs: _*)).as("g"))
    // Per-segment hot-bucket cap (Dedup.MaxBucket discipline): an
    // identical-media family lands every segment in one bucket and emits
    // |family|² pairs REGARDLESS of join strategy — past the cap that
    // bucket is dropped before the self-join. A pair survives if ANY of
    // its maxHamming+1 segment buckets stays under the cap, so the
    // pigeonhole completeness guarantee degrades only for members of
    // oversized families (exact dedup's job first). Below the cap — all
    // fixtures; max segment bucket at sf0.01 is well under the 4096
    // default — the banding remains provably lossless, which is why the
    // brute-force oracle can stay cap-free (MediaSpec pins the cap
    // behavior adversarially instead). The gate is a WINDOW count on the
    // same `g` the pair join shuffles on — one exchange serves both,
    // where an aggregate+semi-join formulation re-scanned the exploded
    // table and measured ~4× slower end-to-end at sf0.1.
    val e = e0
      .withColumn("bn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("g"))))
      .filter(col("bn") <= maxBucket)
      .drop("bn")
    val l = e.select(col(idCol).as("a"), col("phash").as("pa"), col("g"))
    val r = e.select(col(idCol).as("b"), col("phash").as("pb"), col("g"))
    l.join(r, l("g") === r("g") && col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("pa").bitwiseXOR(col("pb"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** INCREMENTAL [[phashPairs]]: every ≤ `maxHamming` pair with at
    * least one side in `batch` — the steady-state shape of a durable
    * media store ingesting a crawl (the [[graft.store.PrefixIndexStore]]
    * discipline applied to perceptual hashes). The base corpus is NEVER
    * self-joined: candidates come from batch segments equi-joined
    * against (base ∪ batch) segments, so per-call cost is O(batch ×
    * bucket), not O(corpus²) — at 100 TB the base side is the store's
    * partition-pruned scan and the shuffle moves only the batch's band
    * keys plus their matching store buckets. Ids must be unique across
    * base ∪ batch (store identity — URL or digest — is the caller's
    * key). Output: (a, b, hamming) with a < b, exactly the full
    * recompute's new rows ([[phashPairs]] on base ∪ batch minus
    * base-only pairs — spec-pinned). */
  def phashPairsIncremental(base: DataFrame, batch: DataFrame, nBits: Int,
                            maxHamming: Int = 2, idCol: String = "media_id",
                            maxBucket: Long = graft.operators.Dedup.MaxBucket)
      : DataFrame = {
    val nSeg = maxHamming + 1
    require(nBits >= nSeg, s"need at least $nSeg bits for $maxHamming-bit budget")
    require(nBits <= 63, "nBits must be <= 63 (single-long hashes)")
    require(maxBucket >= 2, "maxBucket below 2 would drop every pair")
    val segW = (nBits + nSeg - 1) / nSeg
    val segs = (0 until nSeg).map { s =>
      val lo = s * segW
      val w = math.min(segW, nBits - lo)
      struct(lit(s).as("seg"),
        expr(s"shiftright(phash, $lo) & ${(1L << w) - 1}").as("sv"))
    }
    val all = base.select(col(idCol), col("phash"), lit(false).as("is_new"))
      .union(batch.select(col(idCol), col("phash"), lit(true).as("is_new")))
    // The hot-bucket cap is computed over the UNION (same g the join
    // shuffles on) so incremental and full runs degrade identically on
    // oversized families.
    val e = all
      .select(col(idCol), col("phash"), col("is_new"),
        explode(array(segs: _*)).as("g"))
      .withColumn("bn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("g"))))
      .filter(col("bn") <= maxBucket)
      .drop("bn")
    val l = e.filter(col("is_new"))
      .select(col(idCol).as("la"), col("phash").as("pa"), col("g"))
    val r = e.select(col(idCol).as("rb"), col("phash").as("pb"), col("g"),
      col("is_new").as("r_new"))
    // batch×batch pairs once via la < rb; batch×base once because the
    // base side never appears on the left.
    l.join(r, l("g") === r("g") &&
        (!col("r_new") || col("la") < col("rb")) && col("la") =!= col("rb"))
      .select(least(col("la"), col("rb")).as("a"),
        greatest(col("la"), col("rb")).as("b"),
        bit_count(col("pa").bitwiseXOR(col("pb"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Near-dup media CLUSTERS: connected components over the
    * [[phashPairs]] graph ([[graft.operators.Dedup.connectedComponents]]
    * — pointer doubling, per-round lineage truncation), every media row
    * labeled (isolated rows self-label). Same caveat as text near-dup
    * clustering: transitive closure chains distinct-looking payloads
    * through intermediates — use for dedup keep-lists, not similarity
    * assertions. */
  def phashClusters(ph: DataFrame, nBits: Int, maxHamming: Int = 2,
                    idCol: String = "media_id"): DataFrame =
    graft.operators.Dedup.connectedComponents(
      ph.select(col(idCol).as("node")),
      phashPairs(ph, nBits, maxHamming, idCol)
        .select(col("a").as("src"), col("b").as("dst")))
      .withColumnRenamed("node", idCol)
}
