package graft.multimodal

import org.apache.spark.sql.Row
import graft.SparkSpec

/** Genuine minimal media files, built byte-by-byte — no codec library.
  * The WAV is a fully valid 0-sample PCM file; the PNG has the real
  * signature and CRC-correct IHDR/IDAT/IEND chunks (zlib row data via
  * Deflater); the JPEG is a structurally genuine baseline file (SOI, JFIF
  * APP0, COM, DQT, SOF0, DHT, SOS, EOI with correct segment lengths). */
object MediaFixtures {

  def jpeg(width: Int, height: Int, progressive: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int, payload: Array[Byte]): Unit = {
      out.write(0xff); out.write(m)
      val len = payload.length + 2
      out.write(len >> 8); out.write(len & 0xff); out.write(payload, 0, payload.length)
    }
    out.write(0xff); out.write(0xd8) // SOI
    marker(0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0)) // APP0
    marker(0xfe, "made by MediaFixtures".getBytes("US-ASCII")) // COM — walk must skip
    marker(0xdb, (Array(0x00) ++ Array.fill(64)(1)).map(_.toByte)) // DQT
    val sof = Array[Int](8, height >> 8, height & 0xff, width >> 8, width & 0xff,
      1, 1, 0x11, 0).map(_.toByte)
    marker(if (progressive) 0xc2 else 0xc0, sof) // SOF0 / SOF2
    marker(0xc4, (Array(0x00, 1) ++ Array.fill(15)(0) ++ Array(0)).map(_.toByte)) // DHT
    marker(0xda, Array[Int](1, 1, 0x00, 0, 63, 0).map(_.toByte)) // SOS
    out.write(0x00) // entropy-coded byte
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  def png(width: Int, height: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte), 0, 8)
    def chunk(kind: String, data: Array[Byte]): Unit = {
      def be32(v: Long): Array[Byte] = Array(
        (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
      val typ = kind.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(typ); crc.update(data)
      out.write(be32(data.length), 0, 4); out.write(typ, 0, 4)
      out.write(data, 0, data.length); out.write(be32(crc.getValue), 0, 4)
    }
    chunk("IHDR", java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height).put(8.toByte).put(0.toByte) // 8-bit gray
      .put(0.toByte).put(0.toByte).put(0.toByte).array())
    // zlib-compressed scanlines: height rows of (filter 0 + width zeros).
    val raw = new Array[Byte](height * (1 + width))
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val m = deflater.deflate(buf); deflater.end()
    chunk("IDAT", buf.take(m))
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  def wav(sampleRate: Int, channels: Int, junkChunkFirst: Boolean = false): Array[Byte] = {
    val junk = if (junkChunkFirst) 8 + 3 + 1 else 0 // odd-size chunk + pad byte
    val buf = java.nio.ByteBuffer.allocate(44 + junk)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + junk) // riff size, 0 samples
      .put("WAVE".getBytes("US-ASCII"))
    if (junkChunkFirst) // word-aligned odd-size chunk the walk must step over
      buf.put("JUNK".getBytes("US-ASCII")).putInt(3)
        .put(Array[Byte](1, 2, 3)).put(0.toByte)
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort)
      .putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(0)
    buf.array()
  }

  /** PCM WAV with real 16-bit LE samples (interleaved). */
  def wav16(sampleRate: Int, channels: Int, samples: Seq[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort)
      .putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** PCM WAV with 8-bit unsigned samples. */
  def wav8(sampleRate: Int, channels: Int, samples: Seq[Int]): Array[Byte] = {
    val dataLen = samples.length
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels).putShort(channels.toShort)
      .putShort(8)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => buf.put((s & 0xff).toByte))
    buf.array()
  }

  /** WAV container around pre-coded bytes with an arbitrary format tag
    * (G.711 µ-law = 7 / A-law = 6), mono 8 kHz 8-bit. */
  def wavCoded(tag: Int, data: Array[Byte]): Array[Byte] = {
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

  /** IMA ADPCM WAV (format tag 0x11): extended fmt chunk (cbSize=2,
    * samplesPerBlock) + raw block `data`. */
  def wavAdpcm(channels: Int, blockAlign: Int, samplesPerBlock: Int,
               data: Array[Byte]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(48 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(40 + data.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(20)
      .putShort(0x11.toShort).putShort(channels.toShort).putInt(8000)
      .putInt(4000).putShort(blockAlign.toShort).putShort(4)
      .putShort(2).putShort(samplesPerBlock.toShort)
      .put("data".getBytes("US-ASCII")).putInt(data.length).put(data)
    buf.array()
  }

  /** IMA ADPCM block bytes for one MONO block: 4-byte header (pred, index)
    * + packed nibbles (low nibble first), zero-padded to `blockAlign`. */
  def adpcmMonoBlock(pred: Int, index: Int, nibbles: Seq[Int],
                     blockAlign: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(blockAlign)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putShort(pred.toShort).put(index.toByte).put(0.toByte)
    nibbles.grouped(2).foreach { g =>
      val lo = g.head & 0xf
      val hi = if (g.size > 1) g(1) & 0xf else 0
      b.put((lo | (hi << 4)).toByte)
    }
    b.array()
  }

  /** Minimal genuine MP4: ftyp + moov[ trak[tkhd 0×0 audio], trak[tkhd
    * w×h video] ] with correct box sizes and v0 tkhd layout (dims as
    * 16.16 fixed point at payload offset 76). */
  def mp4(width: Int, height: Int): Array[Byte] = {
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
      b.array()
    }
    def tkhd(w: Int, h: Int): Array[Byte] = {
      val p = java.nio.ByteBuffer.allocate(84)
      p.position(76)
      p.putInt(w << 16).putInt(h << 16)
      box("tkhd", p.array())
    }
    val moov = box("moov", box("trak", tkhd(0, 0)) ++ box("trak", tkhd(width, height)))
    box("ftyp", "isomiso2".getBytes("US-ASCII")) ++ moov
  }

  /** Genuine playable-layout MP4: ftyp, then mdat carrying `samples`
    * back-to-back in `chunkSizes`-grouped chunks, then moov with a full
    * stbl (stsc runs, per-sample stsz, stco file offsets) describing
    * exactly that layout — the demuxer tables [[Media.mp4SampleRanges]]
    * reconstructs ranges from. */
  def mp4WithSamples(samples: Seq[Array[Byte]], chunkSizes: Seq[Int]): Array[Byte] = {
    require(chunkSizes.sum == samples.length)
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
      b.array()
    }
    val ftyp = box("ftyp", "isomiso2".getBytes("US-ASCII"))
    val data = samples.flatten.toArray
    val mdat = box("mdat", data)
    // Chunk c starts at ftyp + mdat-header + bytes of earlier chunks.
    val chunkStarts = chunkSizes.indices.map { c =>
      val samplesBefore = chunkSizes.take(c).sum
      ftyp.length + 8 + samples.take(samplesBefore).map(_.length).sum
    }
    val stsz = {
      val b = java.nio.ByteBuffer.allocate(12 + 4 * samples.length)
      b.putInt(0).putInt(0).putInt(samples.length)
      samples.foreach(s => b.putInt(s.length))
      box("stsz", b.array())
    }
    val stco = {
      val b = java.nio.ByteBuffer.allocate(8 + 4 * chunkStarts.length)
      b.putInt(0).putInt(chunkStarts.length)
      chunkStarts.foreach(b.putInt)
      box("stco", b.array())
    }
    val stsc = {
      // One run per distinct samples-per-chunk change (1-based firstChunk).
      val runs = chunkSizes.zipWithIndex
        .filter { case (sz, i) => i == 0 || chunkSizes(i - 1) != sz }
        .map { case (sz, i) => (i + 1, sz) }
      val b = java.nio.ByteBuffer.allocate(8 + 12 * runs.length)
      b.putInt(0).putInt(runs.length)
      runs.foreach { case (fc, spc) => b.putInt(fc).putInt(spc).putInt(1) }
      box("stsc", b.array())
    }
    val moov = box("moov", box("trak", box("mdia", box("minf",
      box("stbl", stsc ++ stsz ++ stco)))))
    ftyp ++ mdat ++ moov
  }

  /** Binary PGM (P5), with a header comment the scanner must skip. */
  def pgm(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == width * height)
    val header = s"P5\n# test fixture\n$width $height\n255\n".getBytes("US-ASCII")
    header ++ pixels
  }

  /** Binary PPM (P6), interleaved RGB bytes. */
  def ppm(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == 3 * width * height)
    val header = s"P6 $width $height 255\n".getBytes("US-ASCII")
    header ++ rgb
  }
}

/** Multimodal plumbing: real container-header probing (JPEG/PNG/WAV), chunk
  * sampling, features — exercising the binary-column schema end to end. */
class MediaSpec extends SparkSpec {
  import Media.MediaHeader

  test("parseHeader reads genuine JPEG / PNG / WAV headers") {
    assert(Media.parseHeader(MediaFixtures.jpeg(640, 480)) ===
      MediaHeader("jpeg", 640, 480, 0, 0))
    // Progressive (SOF2) frame header, and dims that exercise both bytes.
    assert(Media.parseHeader(MediaFixtures.jpeg(1281, 723, progressive = true)) ===
      MediaHeader("jpeg", 1281, 723, 0, 0))
    assert(Media.parseHeader(MediaFixtures.png(1920, 1080)) ===
      MediaHeader("png", 1920, 1080, 0, 0))
    assert(Media.parseHeader(MediaFixtures.wav(44100, 2)) ===
      MediaHeader("wav", 0, 0, 44100, 2))
    // The chunk walk steps over a word-aligned odd-size chunk before fmt.
    assert(Media.parseHeader(MediaFixtures.wav(16000, 1, junkChunkFirst = true)) ===
      MediaHeader("wav", 0, 0, 16000, 1))
  }

  test("parseHeader never throws on hostile bytes, returns unknown") {
    val cases = Seq[Array[Byte]](
      null, Array.emptyByteArray, Array[Byte](1, 2),
      Array[Byte](0xff.toByte, 0xd8.toByte), // SOI and nothing else
      MediaFixtures.jpeg(640, 480).takeWhile(_ != 0xc0.toByte), // truncated pre-SOF
      MediaFixtures.png(8, 8).take(20),      // truncated IHDR
      MediaFixtures.wav(44100, 2).take(16),  // truncated before fmt
      "RIFFxxxxWAVE".getBytes("US-ASCII"),   // WAV with no chunks at all
      Array.tabulate[Byte](64)(i => (i * 37).toByte)) // noise
    cases.foreach { b =>
      assert(Media.parseHeader(b) === Media.UnknownHeader, s"case: ${
        Option(b).map(_.take(8).mkString(",")).getOrElse("null")}")
    }
  }

  test("decodeHeader fills meta from real headers through the DataFrame path") {
    val df = spark.createDataFrame(
      java.util.List.of(
        Row(1L, "image", MediaFixtures.jpeg(640, 480), null),
        Row(2L, "image", MediaFixtures.png(32, 16), null),
        Row(3L, "audio", MediaFixtures.wav(22050, 1), null),
        Row(4L, "blob", Array[Byte](1, 2), null)),
      Media.MediaSchema)
    val metas = Media.decodeHeader(df).select("media_id", "meta.*")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))))
      .toMap
    assert(metas(1L) === (("jpeg", 640, 480, 0, 0)))
    assert(metas(2L) === (("png", 32, 16, 0, 0)))
    assert(metas(3L) === (("wav", 0, 0, 22050, 1)))
    assert(metas(4L) === (("unknown", 0, 0, 0, 0)))
  }

  test("chunk sampling slices every stride-th chunk") {
    val sparkSession = spark
    import sparkSession.implicits._
    val df = Seq("abcdefghijklmnopqrstuvwxyz").toDF("s")
      .selectExpr("encode(s, 'UTF-8') AS bytes")
    val chunks = df.select(Media.sampleChunks("bytes", 4, 2).as("c"))
      .head().getSeq[Array[Byte]](0)
    // stride 2 × chunk 4 ⇒ slices at offsets 0, 8, 16, 24.
    assert(chunks.map(new String(_, "UTF-8")) === Seq("abcd", "ijkl", "qrst", "yz"))
  }

  test("features: byte length + content hash") {
    val sparkSession = spark
    import sparkSession.implicits._
    val df = Seq("hello").toDF("s").selectExpr("encode(s, 'UTF-8') AS bytes")
    val r = Media.features(df).select("n_bytes", "content_hash").head()
    assert(r.getInt(0) === 5)
    assert(r.getString(1) === "5d41402abc4b2a76b9719d911017c592")
  }

  test("perceptualHash: hand-computed bits, ragged tail cell, empty → 0") {
    val sparkSession = spark
    import sparkSession.implicits._
    // 4 cells over 8 bytes [0,0,0,0,255,255,255,0]: total=765, len=8,
    // cell sums (0,0,510,255) × len vs total × cellLen(2):
    // 0>1530 F, 0>1530 F, 4080>1530 T, 2040>1530 T → bits 2,3 → 0b1100.
    val df = Seq((1L, Array[Byte](0, 0, 0, 0, -1, -1, -1, 0)),
                 (2L, Array.emptyByteArray)).toDF("media_id", "bytes")
    val h = Media.perceptualHash(df, nCells = 4)
      .select("media_id", "phash").as[(Long, Long)].collect().toMap
    assert(h === Map(1L -> 12L, 2L -> 0L))
    // 9 bytes over 4 cells ⇒ cellW=3, tail cell holds 0 bytes — no crash,
    // and the empty cell's bit stays 0.
    val ragged = Seq((3L, Array.tabulate[Byte](9)(i => i.toByte)))
      .toDF("media_id", "bytes")
    val hr = Media.perceptualHash(ragged, nCells = 4)
      .select("phash").as[Long].head()
    assert((hr & (1L << 3)) === 0L)
  }

  test("phashPairs: banding finds exactly the brute-force hamming ball") {
    val sparkSession = spark
    import sparkSession.implicits._
    // Crafted 16-bit hashes: 0x0F0F vs 0x0F0C differ in 2 bits (pair),
    // vs 0x0F00 in 4 bits (no pair); 0xFFFF is far from all.
    val ph = Seq((1L, 0x0F0FL), (2L, 0x0F0CL), (3L, 0x0F00L), (4L, 0xFFFFL))
      .toDF("media_id", "phash")
    val pairs = Media.phashPairs(ph, nBits = 16, maxHamming = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L, 2L), (2L, 3L, 2L)))
  }

  test("phashPairs: oversized identical-hash family is capped, polite pairs kept") {
    val sparkSession = spark
    import sparkSession.implicits._
    // 50 byte-identical hashes (every segment lands in one bucket) next to
    // one polite near-pair. With maxBucket = 8 the family's buckets are
    // dropped wholesale — none of its 1225 pairs survive — while the
    // polite pair is untouched; raising the cap restores the family
    // (declared knob, not hidden truncation).
    val family = (1L to 50L).map(i => (i, 0x0F0FL))
    val polite = Seq((100L, 0x5050L), (101L, 0x5053L)) // hamming 2
    val ph = (family ++ polite).toDF("media_id", "phash")
    val capped = Media.phashPairs(ph, nBits = 16, maxHamming = 2, maxBucket = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(capped === Set((100L, 101L, 2L)))
    val uncapped = Media.phashPairs(ph, nBits = 16, maxHamming = 2)
    assert(uncapped.count() === 50L * 49L / 2L + 1L)
  }

  test("decodeGray: P5 pixels round-trip; P6 decodes to the integer-mean gray plane") {
    val px = Array.tabulate(12)(i => (i * 20).toByte) // 4×3 gradient
    val g5 = Media.decodeGray(MediaFixtures.pgm(4, 3, px)).get
    assert((g5.width, g5.height) === ((4, 3)))
    assert(g5.pixels.toSeq === px.toSeq)
    // P6: gray = floor((r+g+b)/3), per pixel.
    val rgb = Array[Byte](10, 20, 31,  0, 0, 0,  -1, -1, -1,  100, 50, 25)
    val g6 = Media.decodeGray(MediaFixtures.ppm(2, 2, rgb)).get
    assert(g6.pixels.map(_ & 0xff).toSeq === Seq((10 + 20 + 31) / 3, 0, 255,
      (100 + 50 + 25) / 3))
    // Hostile inputs decode to None, never throw.
    assert(Media.decodeGray(null).isEmpty)
    assert(Media.decodeGray("P5 2 2 255\n".getBytes ++ Array[Byte](1, 2, 3)).isEmpty) // truncated
    assert(Media.decodeGray("P5 0 2 255\n ".getBytes).isEmpty) // zero dim
    assert(Media.decodeGray("P5 2 2 70000\n".getBytes).isEmpty) // >8-bit maxval
    assert(Media.decodeGray("plain text".getBytes).isEmpty)
  }

  test("decodePcm: 16-bit signed and 8-bit recentered samples round-trip") {
    val s16 = Seq[Short](0, 1000, -1000, Short.MaxValue, Short.MinValue, 7)
    val a = Media.decodePcm(MediaFixtures.wav16(16000, 2, s16)).get
    assert((a.sampleRate, a.channels, a.bitsPerSample) === ((16000, 2, 16)))
    assert(a.samples.toSeq === s16.map(_.toInt))
    val a8 = Media.decodePcm(MediaFixtures.wav8(8000, 1, Seq(128, 0, 255))).get
    assert(a8.samples.toSeq === Seq(0, -128, 127)) // recentered: silence = 0
    // Hostile inputs: truncated data chunk, non-PCM format tag, junk.
    val tr = MediaFixtures.wav16(16000, 1, Seq[Short](1, 2, 3)).dropRight(2)
    assert(Media.decodePcm(tr).isEmpty)
    val nonPcm = MediaFixtures.wav16(16000, 1, Seq[Short](1))
      .updated(20, 3.toByte) // format tag 3 = IEEE float
    assert(Media.decodePcm(nonPcm).isEmpty)
    assert(Media.decodePcm("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(Media.decodePcm(null).isEmpty)
  }

  test("G.711 expansion pins the published anchors and round-trips all 256 codes") {
    // Known anchor values from the ITU-T G.711 tables.
    assert(Media.ulawToLinear(0x00) === -32124) // most negative µ-law code
    assert(Media.ulawToLinear(0x80) === 32124)  // most positive
    assert(Media.ulawToLinear(0xff) === 0)      // +0
    assert(Media.ulawToLinear(0x7f) === 0)      // −0 (µ-law's double zero)
    assert(Media.alawToLinear(0x55) === -8)     // A-law has no exact zero
    assert(Media.alawToLinear(0xd5) === 8)
    assert(Media.alawToLinear(0x2a) === -32256) // most negative A-law code
    assert(Media.alawToLinear(0xaa) === 32256)
    // Independent ENCODERS (sign/segment-search construction, written
    // from the G.711 definition — not the decoder inverted): compressing
    // each code's decoded value must give the code back. This pins the
    // decoder against the standard, not against itself.
    def ulawEncode(pcm0: Int): Int = {
      var pcm = pcm0
      val sign = if (pcm < 0) { pcm = -pcm; 0x80 } else 0
      if (pcm > 32635) pcm = 32635
      pcm += 0x84
      var exp = 7; var mask = 0x4000
      while (exp > 0 && (pcm & mask) == 0) { exp -= 1; mask >>= 1 }
      ~(sign | (exp << 4) | ((pcm >> (exp + 3)) & 0x0f)) & 0xff
    }
    def alawEncode(pcm0: Int): Int = {
      var pcm = pcm0
      val sign = if (pcm >= 0) 0x80 else { pcm = -pcm; 0 }
      if (pcm > 32767) pcm = 32767
      var exp = 7; var mask = 0x4000
      while (exp > 0 && (pcm & mask) == 0) { exp -= 1; mask >>= 1 }
      val mant = if (exp == 0) (pcm >> 4) & 0x0f else (pcm >> (exp + 3)) & 0x0f
      (sign | (exp << 4) | mant) ^ 0x55
    }
    for (code <- 0 until 256) {
      // µ-law's −0 code (0x7f) canonicalizes to +0 (0xff) on re-encode.
      val expectU = if (code == 0x7f) 0xff else code
      assert(ulawEncode(Media.ulawToLinear(code)) === expectU,
        s"ulaw code $code")
      assert(alawEncode(Media.alawToLinear(code)) === code,
        s"alaw code $code")
    }
  }

  test("decodePcm: G.711 WAV payloads decode through the fmt-tag dispatch") {
    val data = Array.tabulate(256)(_.toByte)
    val u = Media.decodePcm(MediaFixtures.wavCoded(7, data)).get
    assert((u.codec, u.bitsPerSample, u.sampleRate, u.channels) ===
      (("ulaw", 16, 8000, 1)))
    assert(u.samples.toSeq === (0 until 256).map(Media.ulawToLinear))
    val a = Media.decodePcm(MediaFixtures.wavCoded(6, data)).get
    assert(a.codec === "alaw")
    assert(a.samples.toSeq === (0 until 256).map(Media.alawToLinear))
    // Unsupported compressed tags still refuse (mp3-in-WAV is tag 0x55).
    assert(Media.decodePcm(MediaFixtures.wavCoded(0x55, data)).isEmpty)
  }

  test("decodePcm: IMA ADPCM blocks decode by the published step tables") {
    // Hand-stepped reference, from (pred=0, index=0, step=7):
    //   nib 4  → diff 7          → pred 7,  index 2 (step 9)
    //   nib 8  → diff 1, minus   → pred 6,  index 1 (step 8)
    //   nib 3  → diff 1+2+4 = 7  → pred 13, index 0 (step 7)
    //   nib 15 → diff 0+1+3+7,−  → pred 2,  index 8 (step 16)
    //   nib 0×4 → diffs 2,1,1,1  → pred 4, 5, 6, 7
    val nib = Seq(4, 8, 3, 15, 0, 0, 0, 0)
    val mono = Media.decodePcm(MediaFixtures.wavAdpcm(1, 8, 9,
      MediaFixtures.adpcmMonoBlock(0, 0, nib, 8))).get
    assert(mono.codec === "ima_adpcm")
    assert(mono.samples.toSeq === Seq(0, 7, 6, 13, 2, 4, 5, 6, 7))
    // samplesPerBlock CAPS a block's output (trailing pad nibbles dropped).
    val capped = Media.decodePcm(MediaFixtures.wavAdpcm(1, 8, 5,
      MediaFixtures.adpcmMonoBlock(0, 0, nib, 8))).get
    assert(capped.samples.toSeq === Seq(0, 7, 6, 13, 2))
    // Multi-block state RESET: two identical blocks decode identically.
    val two = Media.decodePcm(MediaFixtures.wavAdpcm(1, 8, 9,
      MediaFixtures.adpcmMonoBlock(0, 0, nib, 8) ++
        MediaFixtures.adpcmMonoBlock(0, 0, nib, 8))).get
    assert(two.samples.toSeq === mono.samples.toSeq ++ mono.samples.toSeq)
    // Trailing partial block: header only → just the predictor sample.
    val partial = Media.decodePcm(MediaFixtures.wavAdpcm(1, 8, 9,
      MediaFixtures.adpcmMonoBlock(0, 0, nib, 8) ++
        Array[Byte](100, 0, 3, 0))).get
    assert(partial.samples.toSeq === mono.samples.toSeq :+ 100)
    // STEREO layout: per-channel headers then alternating 4-byte nibble
    // words — decoding a stereo block must equal the two mono decodes,
    // interleaved (pins the word-interleave arithmetic).
    val nibL = nib
    val nibR = Seq(1, 2, 9, 10, 5, 0, 7, 8)
    def pack(ns: Seq[Int]): Array[Byte] = ns.grouped(2)
      .map(g => ((g.head & 0xf) | ((g(1) & 0xf) << 4)).toByte).toArray
    val stereoBlock = {
      val b = java.nio.ByteBuffer.allocate(16)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putShort(50).put(0.toByte).put(0.toByte)     // ch0 header
        .putShort(-70).put(30.toByte).put(0.toByte)  // ch1 header
        .put(pack(nibL)).put(pack(nibR))
      b.array()
    }
    val st = Media.decodePcm(MediaFixtures.wavAdpcm(2, 16, 9, stereoBlock)).get
    val l = Media.decodePcm(MediaFixtures.wavAdpcm(1, 8, 9,
      MediaFixtures.adpcmMonoBlock(50, 0, nibL, 8))).get.samples
    val r = Media.decodePcm(MediaFixtures.wavAdpcm(1, 8, 9,
      MediaFixtures.adpcmMonoBlock(-70, 30, nibR, 8))).get.samples
    assert(st.samples.toSeq === l.zip(r).flatMap(p => Seq(p._1, p._2)).toSeq)
    // Out-of-range stored step index clamps instead of throwing.
    val hostile = Media.decodePcm(MediaFixtures.wavAdpcm(1, 8, 9,
      MediaFixtures.adpcmMonoBlock(0, 200, nib, 8)))
    assert(hostile.nonEmpty)
  }

  test("poison-pill declared sizes and boundary boxes never throw (ADVICE r9)") {
    // A chunk size near Int.MaxValue made `body + size` wrap negative and
    // the next iteration read bytes(<0). Both walks must refuse cleanly.
    def hugeChunk(tag: String): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(12 + 8 + 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(0x7ffffff0)
        .put("WAVE".getBytes("US-ASCII"))
        .put(tag.getBytes("US-ASCII")).putInt(0x7ffffff0)
        .putInt(0)
      b.array()
    }
    assert(Media.parseHeader(hugeChunk("JUNK")) === Media.UnknownHeader)
    assert(Media.decodePcm(hugeChunk("LIST")).isEmpty)
    // fmt first, then the poison chunk (exercises decodePcm past fmtSeen).
    val fmtThenHuge = {
      val riffAndFmt = MediaFixtures.wav8(8000, 1, Seq(1, 2)).take(36)
      val b = java.nio.ByteBuffer.allocate(36 + 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(riffAndFmt).put("LIST".getBytes("US-ASCII")).putInt(0x7ffffff0)
      b.array()
    }
    Media.decodePcm(fmtThenHuge) // must not throw
    // tkhd of declared size 8: empty payload ending exactly at buffer end.
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
      b.array()
    }
    val emptyTkhd = box("ftyp", Array[Byte](0, 0, 0, 0)) ++
      box("moov", box("trak", box("tkhd", Array.emptyByteArray)))
    assert(Media.parseHeader(emptyTkhd) === Media.MediaHeader("mp4", 0, 0, 0, 0))
    // boxDownscale on a 1×64M column: cy*height overflows Int at cy=32
    // without Long box bounds. Rows of constant value y/2^20 → cell cy
    // must average to exactly cy.
    val tall = Media.GrayImage(1, 64 * 1024 * 1024,
      Array.tabulate(64 * 1024 * 1024)(y => (y >> 20).toByte))
    val d = Media.boxDownscale(tall, 1, 64)
    assert((d.width, d.height) === ((1, 64)))
    assert(d.pixels.map(_ & 0xff).toSeq === (0 until 64))
  }

  test("parseHeader reads PNM headers (and decode limits don't apply to the probe)") {
    val px = Array.fill(6)(9.toByte)
    assert(Media.parseHeader(MediaFixtures.pgm(3, 2, px)) ===
      MediaHeader("pgm", 3, 2, 0, 0))
    assert(Media.parseHeader(MediaFixtures.ppm(1, 2, Array.fill(6)(1.toByte))) ===
      MediaHeader("ppm", 1, 2, 0, 0))
  }

  test("batched extraction computes GENUINE pixel/sample statistics for PNM + WAV") {
    val sparkSession = spark
    import sparkSession.implicits._
    val px = Array.tabulate(6)(i => (i * 10).toByte) // sum 0+10+…+50 = 150
    val s16 = Seq[Short](100, -200, 300) // Σ|s| = 600
    val rows = Seq(
      (1L, MediaFixtures.pgm(3, 2, px)),
      (2L, MediaFixtures.ppm(1, 2, Array[Byte](30, 60, 90, 10, 20, 33))), // grays 60, 21
      (3L, MediaFixtures.wav16(16000, 1, s16)),
      (4L, "just some text".getBytes("UTF-8")))
    val df = rows.toDF("id", "bytes")
    val got = Media.extractFeaturesBatched(df, batchSize = 2)
      .select("id", "decoded", "n_samples", "sample_sum")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(got(1L) === (("pgm", 6L, 150L)))
    assert(got(2L) === (("ppm", 2L, 81L)))
    assert(got(3L) === (("wav_pcm", 3L, 600L)))
    assert(got(4L) === ((null, -1L, -1L))) // the entropy-coded stub boundary
  }

  test("perceptualHash hashes the DECODED gray plane for PNM: encoding-invariant") {
    val sparkSession = spark
    import sparkSession.implicits._
    // Same image, three byte-level encodings: P5, P5 with a different
    // comment, and P6 with each gray tripled into RGB.
    val px = Array.tabulate(32)(i => (i * 8).toByte)
    val p5a = MediaFixtures.pgm(8, 4, px)
    val p5b = ("P5\n# another comment entirely\n8 4\n255\n".getBytes("US-ASCII")) ++ px
    val p6 = MediaFixtures.ppm(8, 4, px.flatMap(b => Array(b, b, b)))
    val df = Seq((1L, p5a), (2L, p5b), (3L, p6)).toDF("id", "bytes")
    val h = Media.perceptualHash(df, nCells = 16)
      .select("id", "phash").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) === h(2L), "comment bytes must not affect the hash")
    assert(h(1L) === h(3L), "P6 of the same picture must hash identically")
    // And the plane actually drives bits: a different image differs.
    val other = MediaFixtures.pgm(8, 4, Array.tabulate(32)(i => (255 - i * 8).toByte))
    val h2 = Media.perceptualHash(Seq((9L, other)).toDF("id", "bytes"), nCells = 16)
      .select("phash").head().getLong(0)
    assert(h2 !== h(1L))
  }

  test("parseHeader walks MP4 boxes to the first VIDEO track's dimensions") {
    assert(Media.parseHeader(MediaFixtures.mp4(1920, 1080)) ===
      MediaHeader("mp4", 1920, 1080, 0, 0))
    // A container whose only tkhd is 0×0 (audio-only) reports mp4, no dims.
    def boxNoVideo: Array[Byte] = {
      def box(typ: String, payload: Array[Byte]): Array[Byte] = {
        val b = java.nio.ByteBuffer.allocate(8 + payload.length)
        b.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
        b.array()
      }
      val p = java.nio.ByteBuffer.allocate(84)
      box("ftyp", "isomiso2".getBytes("US-ASCII")) ++
        box("moov", box("trak", box("tkhd", p.array())))
    }
    assert(Media.parseHeader(boxNoVideo) === MediaHeader("mp4", 0, 0, 0, 0))
    // Truncated/hostile MP4 bytes never throw.
    assert(Media.parseHeader(MediaFixtures.mp4(1920, 1080).take(20)) ===
      MediaHeader("mp4", 0, 0, 0, 0))
  }

  test("mp4SampleRanges reconstructs exact frame byte ranges from the stbl tables") {
    // 5 samples of sizes 5,6,7,8,9 over chunks of 3+2 — two stsc runs.
    val samples = Seq(5, 6, 7, 8, 9).zipWithIndex.map { case (sz, i) =>
      Array.tabulate(sz)(j => (100 + 10 * i + j).toByte) }
    val mp4 = MediaFixtures.mp4WithSamples(samples, chunkSizes = Seq(3, 2))
    val ranges = Media.mp4SampleRanges(mp4).get
    assert(ranges.length === 5)
    assert(ranges.map(_._2) === Vector(5, 6, 7, 8, 9))
    // The ranges must slice back EXACTLY the planted frame bytes.
    ranges.zip(samples).foreach { case ((off, sz), planted) =>
      assert(mp4.slice(off.toInt, off.toInt + sz).toSeq === planted.toSeq)
    }
    // Chunk 2's first sample starts at its stco offset, not adjacent to
    // chunk 1's last byte (the chunk indirection is real).
    assert(ranges(3)._1 === ranges(0)._1 + 5 + 6 + 7)
    // A table claiming more data than the file carries (last stsz entry
    // inflated) must reject the WHOLE payload — no partial range list.
    val lastSize = Array[Byte](0, 0, 0, 9)
    val at = mp4.toSeq.lastIndexOfSlice(lastSize.toSeq)
    assert(at > 0)
    val lying = mp4.clone()
    lying(at) = 0x7f.toByte // size becomes 0x7F000009
    assert(Media.mp4SampleRanges(lying).isEmpty)
    // Hostile / non-mp4 payloads: None, never a throw.
    assert(Media.mp4SampleRanges("plain text".getBytes).isEmpty)
    assert(Media.mp4SampleRanges(null).isEmpty)
  }

  test("extractFrameSamples: container-true frame slices through the DataFrame path") {
    val sparkSession = spark
    import sparkSession.implicits._
    val samples = Seq(5, 6, 7, 8, 9).zipWithIndex.map { case (sz, i) =>
      Array.tabulate(sz)(j => (100 + 10 * i + j).toByte) }
    val mp4 = MediaFixtures.mp4WithSamples(samples, chunkSizes = Seq(3, 2))
    val df = Seq((1L, mp4), (2L, "not a container".getBytes("UTF-8")))
      .toDF("id", "bytes")
    val got = Media.extractFrameSamples(df, stride = 2)
      .select("id", "n_frames", "frame_samples")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.getSeq[Array[Byte]](2))))).toMap
    val (n, frames) = got(1L)
    assert(n === 5L)
    // stride 2 ⇒ samples 0, 2, 4.
    assert(frames.get.map(_.toSeq) === Seq(samples(0).toSeq, samples(2).toSeq,
      samples(4).toSeq))
    assert(got(2L) === ((-1L, None)))
  }

  test("decodeImage: real JPEG/PNG pixel decode through the JDK readers") {
    // A deterministic gradient, encoded by the SAME JDK encoders the
    // decoder uses — PNG is lossless so the gray plane must round-trip
    // exactly; JPEG is lossy so dims are exact and pixels close.
    val (w, h) = (40, 24)
    val src = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 255 / (w - 1) + y * 255 / (h - 1)) / 2
      src.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    def enc(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(src, fmt, bos))
      bos.toByteArray
    }
    val png = Media.decodeImage(enc("png")).get
    assert((png.width, png.height) === ((w, h)))
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 255 / (w - 1) + y * 255 / (h - 1)) / 2
      assert((png.pixels(y * w + x) & 0xff) === v, s"png pixel ($x,$y)")
    }
    val jpg = Media.decodeImage(enc("jpg")).get
    assert((jpg.width, jpg.height) === ((w, h)))
    val meanDiff = (0 until w * h).map(i =>
      math.abs((jpg.pixels(i) & 0xff) - (png.pixels(i) & 0xff))).sum.toDouble / (w * h)
    assert(meanDiff < 8.0, s"jpeg decode drifted $meanDiff from the source plane")
    // The batched extractor reports the codec formats as decoded now.
    val sparkSession = spark
    import sparkSession.implicits._
    val df = Seq((1L, enc("png")), (2L, enc("jpg"))).toDF("id", "bytes")
    val got = Media.extractFeaturesBatched(df)
      .select("id", "decoded", "n_samples")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(1L) === (("png", (w * h).toLong)))
    assert(got(2L) === (("jpeg", (w * h).toLong)))
  }

  test("decodeImage: real GIF/BMP pixel decode through the JDK readers (r10)") {
    // Both formats are LOSSLESS for an 8-bit gray plane (BMP stores raw
    // triples; GIF's LZW is lossless and a gray image fits one 256-color
    // palette), so the decoded plane must round-trip EXACTLY — encoded by
    // the same JDK writers the decoder's readers mirror.
    val (w, h) = (40, 24)
    val src = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 255 / (w - 1) + y * 255 / (h - 1)) / 2
      src.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    def enc(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(src, fmt, bos))
      bos.toByteArray
    }
    for (fmt <- Seq("gif", "bmp")) {
      val bytes = enc(fmt)
      // The byte-level probe reads the real dimensions first (the decode
      // gate) and labels the format.
      val hd = Media.parseHeader(bytes)
      assert((hd.format, hd.width, hd.height) === ((fmt, w, h)), fmt)
      val img = Media.decodeImage(bytes).get
      assert((img.width, img.height) === ((w, h)), fmt)
      for (y <- 0 until h; x <- 0 until w) {
        val v = (x * 255 / (w - 1) + y * 255 / (h - 1)) / 2
        assert((img.pixels(y * w + x) & 0xff) === v, s"$fmt pixel ($x,$y)")
      }
    }
    // Top-down BMP (negative height) probes to ABSOLUTE dimensions and
    // still decodes: hand-built 2×2, rows stored top-first.
    val td = {
      val stride = (2 * 3 + 3) & ~3
      val b = java.nio.ByteBuffer.allocate(54 + 2 * stride)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(54 + 2 * stride).putInt(0).putInt(54)
      b.putInt(40).putInt(2).putInt(-2).putShort(1).putShort(24)
        .putInt(0).putInt(2 * stride).putInt(0).putInt(0).putInt(0).putInt(0)
      for (v <- Seq(10, 20, 30, 40)) { // row-major top-down gray pixels
        b.put(v.toByte).put(v.toByte).put(v.toByte)
        if (v == 20 || v == 40) b.put(Array[Byte](0, 0)) // stride pad
      }
      b.array()
    }
    val tdh = Media.parseHeader(td)
    assert((tdh.format, tdh.width, tdh.height) === (("bmp", 2, 2)))
    val tdImg = Media.decodeImage(td).get
    assert(tdImg.pixels.map(_ & 0xff).toSeq === Seq(10, 20, 30, 40))
    // TIFF rides the same JDK readers (Java 9+): the probe must walk the
    // IFD to the real dimensions — BOTH byte orders — and gray pixels
    // round-trip exactly (TIFF is lossless).
    for (fmt <- Seq("tiff")) {
      val bytes = enc(fmt)
      val hd = Media.parseHeader(bytes)
      assert((hd.format, hd.width, hd.height) === (("tiff", w, h)))
      val img = Media.decodeImage(bytes).get
      assert((img.width, img.height) === ((w, h)))
      for (y <- 0 until h; x <- 0 until w) {
        val v = (x * 255 / (w - 1) + y * 255 / (h - 1)) / 2
        assert((img.pixels(y * w + x) & 0xff) === v, s"tiff pixel ($x,$y)")
      }
    }
    // GIF dimension-bomb gate: the JDK reader allocates from the IMAGE
    // DESCRIPTOR dims, not the logical screen, so a 1×1 screen with a
    // 40000×40000 descriptor must be refused BEFORE the reader runs (a
    // screen-only gate would admit a ~6.4 GB allocation).
    val bomb = {
      val b = java.nio.ByteBuffer.allocate(6 + 7 + 10 + 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("GIF89a".getBytes("US-ASCII"))
      b.putShort(1).putShort(1).put(0.toByte).put(0.toByte).put(0.toByte)
      b.put(0x2c.toByte).putShort(0).putShort(0)
        .putShort(40000.toShort).putShort(40000.toShort).put(0.toByte)
      b.put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      b.array()
    }
    assert(Media.parseHeader(bomb).format === "gif") // probe sees 1×1 screen
    assert(Media.decodeImage(bomb).isEmpty) // descriptor gate refuses
    // A legit GIF still passes the descriptor walk (incl. its extension
    // blocks — the JDK writer emits a graphic-control extension).
    assert(Media.decodeImage(enc("gif")).isDefined)

    // The probe reads BOTH byte orders; hand-build each (the JDK writer
    // only emits one), SHORT-typed dims inline in the value field.
    for (le <- Seq(true, false)) {
      val b = java.nio.ByteBuffer.allocate(8 + 2 + 2 * 12 + 4)
        .order(if (le) java.nio.ByteOrder.LITTLE_ENDIAN
               else java.nio.ByteOrder.BIG_ENDIAN)
      if (le) b.put('I'.toByte).put('I'.toByte).put(0x2a.toByte).put(0.toByte)
      else b.put('M'.toByte).put('M'.toByte).put(0.toByte).put(0x2a.toByte)
      b.putInt(8) // IFD at 8
      b.putShort(2)
      def entry(tag: Int, v: Int): Unit = {
        b.putShort(tag.toShort).putShort(3).putInt(1) // SHORT, count 1
        b.putShort(v.toShort).putShort(0) // inline value, endian-true
      }
      entry(256, 123); entry(257, 45)
      b.putInt(0) // next-IFD terminator
      val hd = Media.parseHeader(b.array())
      assert((hd.format, hd.width, hd.height) === (("tiff", 123, 45)),
        s"le=$le")
    }
    // Batched extraction labels the new formats.
    val sparkSession = spark
    import sparkSession.implicits._
    val got = Media.extractFeaturesBatched(
        Seq((1L, enc("gif")), (2L, enc("bmp"))).toDF("id", "bytes"))
      .select("id", "decoded", "n_samples")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(1L) === (("gif", (w * h).toLong)))
    assert(got(2L) === (("bmp", (w * h).toLong)))
  }

  test("boxDownscale: exact integer box means, ragged boxes, pass-through when small") {
    // 4×2 → 2×1: each target cell = floor mean of a 2×2 box.
    val img = Media.GrayImage(4, 2, Array[Byte](10, 20, 30, 40, 50, 60, 70, 81))
    val d = Media.boxDownscale(img, 2, 1)
    assert((d.width, d.height) === ((2, 1)))
    assert(d.pixels.map(_ & 0xff).toSeq === Seq((10 + 20 + 50 + 60) / 4,
      (30 + 40 + 70 + 81) / 4))
    // Already small → untouched (same instance contract not required, same
    // values required).
    val small = Media.boxDownscale(img, 16, 16)
    assert(small.pixels.toSeq === img.pixels.toSeq)
  }

  test("perceptualHash: PNG and JPEG of the same picture land within the lossy budget") {
    val sparkSession = spark
    import sparkSession.implicits._
    val (w, h) = (64, 64)
    val src = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      // Vertical gradient: 16-cell linear hashing cuts the 16×16 thumbnail
      // into ROWS, so row means must differ for bits to carry signal (a
      // row-symmetric pattern like a checkerboard hashes to 0 by design).
      val v = y * 255 / (h - 1)
      src.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    def enc(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(src, fmt, bos); bos.toByteArray
    }
    val hashes = Media.perceptualHash(
        Seq((1L, enc("png")), (2L, enc("jpg"))).toDF("id", "bytes"), nCells = 16)
      .select("id", "phash").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ham = java.lang.Long.bitCount(hashes(1L) ^ hashes(2L))
    assert(ham <= 2, s"png/jpeg phash hamming $ham — decode path not shared?")
    assert(hashes(1L) !== 0L, "structured image must set bits")
  }

  test("mp3/ADTS probes: header tables, ID3v2 skip, chained-frame acceptance, exact ranges") {
    // MPEG-1 Layer III, 44.1 kHz, 128 kbps, joint stereo, no padding:
    // frame length = 144·128000/44100 = 417 bytes (header arithmetic).
    def mp3Frame(): Array[Byte] = {
      val f = new Array[Byte](417)
      f(0) = 0xFF.toByte; f(1) = 0xFB.toByte
      f(2) = 0x90.toByte; f(3) = 0x40.toByte
      (4 until 417).foreach(i => f(i) = (i & 0x7f).toByte)
      f
    }
    val mp3 = mp3Frame() ++ mp3Frame() ++ mp3Frame()
    assert(Media.parseHeader(mp3) === Media.MediaHeader("mp3", 0, 0, 44100, 2))
    assert(Media.mp3FrameRanges(mp3).get ===
      Vector((0L, 417), (417L, 417), (834L, 417)))
    // ID3v2 prefix (syncsafe size 10 → 20-byte tag) shifts everything.
    val id3 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 10) ++
      Array.fill(10)(0x55.toByte) ++ mp3
    assert(Media.parseHeader(id3) === Media.MediaHeader("mp3", 0, 0, 44100, 2))
    assert(Media.mp3FrameRanges(id3).get.head === ((20L, 417)))
    // Trailing ID3v1 junk ends the walk cleanly, never truncates frames.
    val tagged = mp3 ++ ("TAG" + "x" * 125).getBytes("US-ASCII")
    assert(Media.mp3FrameRanges(tagged).get.length === 3)
    // ONE valid frame is not acceptance: a lone sync word in random bytes
    // must not classify (the false-sync discipline).
    assert(Media.parseHeader(mp3Frame().take(417)) === Media.UnknownHeader)
    assert(Media.mp3FrameRanges(mp3Frame()).isEmpty)
    // ADTS AAC-LC, 44.1 kHz (index 4), 2 channels, explicit frame-length
    // field; mixed lengths chain exactly.
    def adtsFrame(len: Int): Array[Byte] = {
      val f = new Array[Byte](len)
      f(0) = 0xFF.toByte; f(1) = 0xF1.toByte; f(2) = 0x50.toByte
      f(3) = (0x80 | ((len >> 11) & 0x3)).toByte
      f(4) = ((len >> 3) & 0xff).toByte
      f(5) = (((len & 0x7) << 5) | 0x1f).toByte
      f(6) = 0xFC.toByte
      (7 until len).foreach(i => f(i) = (i & 0x3f).toByte)
      f
    }
    val aac = adtsFrame(100) ++ adtsFrame(150) ++ adtsFrame(80)
    assert(Media.parseHeader(aac) === Media.MediaHeader("aac", 0, 0, 44100, 2))
    assert(Media.adtsFrameRanges(aac).get ===
      Vector((0L, 100), (100L, 150), (250L, 80)))
    assert(Media.parseHeader(adtsFrame(100)) === Media.UnknownHeader)
    // Tagging tools prepend ID3v2 to ADTS files too — the probe must skip
    // it exactly like the mp3 path (same tag, container-agnostic).
    val id3aac = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 10) ++
      Array.fill(10)(0x55.toByte) ++ aac
    assert(Media.parseHeader(id3aac) === Media.MediaHeader("aac", 0, 0, 44100, 2))
    assert(Media.adtsFrameRanges(id3aac).get ===
      Vector((20L, 100), (120L, 150), (270L, 80)))
    // ID3v2.4 FOOTER flag (0x10): the syncsafe size excludes the 10-byte
    // footer, so the skip must add it — both containers.
    val footer = Array[Byte]('3', 'D', 'I', 4, 0, 0, 0, 0, 0, 10)
    val id3f = Array[Byte]('I', 'D', '3', 4, 0, 0x10, 0, 0, 0, 10) ++
      Array.fill(10)(0x55.toByte) ++ footer
    assert(Media.parseHeader(id3f ++ mp3) ===
      Media.MediaHeader("mp3", 0, 0, 44100, 2))
    assert(Media.mp3FrameRanges(id3f ++ mp3).get.head === ((30L, 417)))
    assert(Media.parseHeader(id3f ++ aac) ===
      Media.MediaHeader("aac", 0, 0, 44100, 2))
    assert(Media.adtsFrameRanges(id3f ++ aac).get.head === ((30L, 100)))
    // extractFrameSamples now slices audio frames at REAL boundaries too.
    val sparkSession = spark
    import sparkSession.implicits._
    val sliced = Media.extractFrameSamples(
        Seq((1L, mp3), (2L, aac), (3L, "not media".getBytes)).toDF("id", "bytes"))
      .select("id", "n_frames", "frame_samples")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.getSeq[Array[Byte]](2))))).toMap
    assert(sliced(1L)._1 === 3L)
    assert(sliced(1L)._2.get.head.toSeq === mp3Frame().toSeq)
    assert(sliced(2L)._1 === 3L)
    assert(sliced(2L)._2.get(1).length === 150)
    assert(sliced(3L)._1 === -1L)
  }

  /** MSB-first bit packer — an INDEPENDENT transcription of the FLAC bit
    * layout (RFC 9639) for building conformance fixtures; shares no code
    * with the decoder under test. */
  private final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0; private var nb = 0
    def put(v: Long, n: Int): this.type = {
      var k = n - 1
      while (k >= 0) {
        cur = (cur << 1) | ((v >> k) & 1L).toInt
        nb += 1
        if (nb == 8) { buf += cur.toByte; cur = 0; nb = 0 }
        k -= 1
      }
      this
    }
    def putUnary(q: Int): this.type = { put(0, q); put(1, 1) }
    def align(): this.type = { while (nb != 0) put(0, 1); this }
    def bytes: Array[Byte] = { align(); buf.toArray }
  }

  /** STREAMINFO-bearing FLAC shell around pre-packed frame bytes. */
  private def flacShell(rate: Int, channels: Int, bps: Int, total: Long,
                        frames: Array[Byte]): Array[Byte] = {
    val si = new BitWriter()
    si.put(0x80L | 0, 8).put(34, 24) // last-block flag, type 0, length
    si.put(16, 16).put(16, 16).put(0, 24).put(0, 24) // block/frame sizes
    si.put(rate, 20).put(channels - 1, 3).put(bps - 1, 5).put(total, 36)
    si.put(0, 128) // md5 unset
    "fLaC".getBytes("US-ASCII") ++ si.bytes ++ frames
  }

  /** One frame: header (8-bit blocksize-1 form, rate code 4 = 8 kHz,
    * 8-bit samples unless `ssCode` overrides) + caller-packed subframe
    * payload bits + real CRC-8/CRC-16. */
  private def flacFrame(blocksize: Int, chanAsn: Int, ssCode: Int,
                        payload: BitWriter => Unit): Array[Byte] = {
    val w = new BitWriter()
    w.put(0x3ffe, 14).put(0, 1).put(0, 1)
    w.put(6, 4).put(4, 4) // blocksize code 6 (8-bit), rate code 4
    w.put(chanAsn, 4).put(ssCode, 3).put(0, 1)
    w.put(0, 8) // coded frame number 0
    w.put(blocksize - 1, 8)
    val header = w.bytes // aligned: 14+1+1+4+4+4+3+1+8+8 = 48 bits
    val crc8 = Media.flacCrc8(header, 0, header.length)
    val body = new BitWriter()
    payload(body)
    val pre = header ++ Array(crc8.toByte) ++ body.bytes
    val crc16 = Media.flacCrc16(pre, 0, pre.length)
    pre ++ Array((crc16 >> 8).toByte, (crc16 & 0xff).toByte)
  }

  test("decodeFlac: constant/verbatim/fixed/LPC subframes, hand-computed samples") {
    // CONSTANT: every sample is the one coded value.
    val cst = flacShell(8000, 1, 8, 4,
      flacFrame(4, 0, 1, w => w.put(0, 1).put(0, 6).put(0, 1).put(-7 & 0xff, 8)))
    val c = Media.decodeFlac(cst).get
    assert((c.sampleRate, c.channels, c.bitsPerSample) === ((8000, 1, 8)))
    assert(c.samples.toSeq === Seq(-7, -7, -7, -7))
    assert(c.codec === "flac")
    // VERBATIM round-trip of raw signed samples.
    val vb = flacShell(8000, 1, 8, 3,
      flacFrame(3, 0, 1, w => {
        w.put(0, 1).put(1, 6).put(0, 1)
        Seq(5, -3, 127).foreach(v => w.put(v & 0xff, 8))
      }))
    assert(Media.decodeFlac(vb).get.samples.toSeq === Seq(5, -3, 127))
    // FIXED order 1, Rice param 2 residuals r = [2, -1, 3] (zigzag
    // 4, 1, 6) over warmup 10 → samples 10, 12, 11, 14 by the published
    // s[i] = r[i] + s[i-1] predictor.
    val fx = flacShell(8000, 1, 8, 4,
      flacFrame(4, 0, 1, w => {
        w.put(0, 1).put(9, 6).put(0, 1) // type 8+order
        w.put(10 & 0xff, 8) // warmup
        w.put(0, 2).put(0, 4) // rice method 0, partition order 0
        w.put(2, 4) // rice parameter 2
        w.putUnary(1).put(0, 2) // u=4 → q=1, rem=00
        w.putUnary(0).put(1, 2) // u=1 → q=0, rem=01
        w.putUnary(1).put(2, 2) // u=6 → q=1, rem=10
      }))
    assert(Media.decodeFlac(fx).get.samples.toSeq === Seq(10, 12, 11, 14))
    // LPC order 1, precision 4, shift 1, coefficient 2: s[i] = r[i] +
    // (2·s[i-1] >> 1) = r[i] + s[i-1]; warmup 5, residuals 1, 2 (raw-bits
    // escape, 3 bits) → samples 5, 6, 8.
    val lpc = flacShell(8000, 1, 8, 3,
      flacFrame(3, 0, 1, w => {
        w.put(0, 1).put(32, 6).put(0, 1) // LPC order (t&31)+1 = 1
        w.put(5 & 0xff, 8) // warmup
        w.put(3, 4) // precision-1
        w.put(1, 5) // shift
        w.put(2, 4) // coefficient (4-bit signed)
        w.put(0, 2).put(0, 4) // rice method 0, porder 0
        w.put(15, 4).put(3, 5) // ESCAPE, raw 3-bit residuals
        w.put(1, 3).put(2, 3)
      }))
    assert(Media.decodeFlac(lpc).get.samples.toSeq === Seq(5, 6, 8))
    // Left/side stereo: left constant 10 (8 bits), side constant 3
    // (9 bits — side channels carry the extra bit) → right = 7,
    // interleaved L R L R.
    val ls = flacShell(8000, 2, 8, 2,
      flacFrame(2, 8, 1, w => {
        w.put(0, 1).put(0, 6).put(0, 1).put(10 & 0xff, 8)
        w.put(0, 1).put(0, 6).put(0, 1).put(3 & 0x1ff, 9)
      }))
    val lsd = Media.decodeFlac(ls).get
    assert(lsd.samples.toSeq === Seq(10, 7, 10, 7))
    // A flipped sample byte must fail the frame CRC-16 → None, never
    // silently-wrong samples (the untrusted-bytes contract).
    val corrupt = vb.clone()
    corrupt(corrupt.length - 4) = (corrupt(corrupt.length - 4) ^ 0x01).toByte
    assert(Media.decodeFlac(corrupt).isEmpty)
    // The CRC implementations pinned by the STANDARD check vectors
    // (independent of the builder, which shares them with the decoder):
    // CRC-8 poly 0x07 init 0 over "123456789" = 0xF4; CRC-16 poly 0x8005
    // init 0 unreflected (CRC-16/UMTS) = 0xFEE8.
    val check = "123456789".getBytes("US-ASCII")
    assert(Media.flacCrc8(check, 0, check.length) === 0xF4)
    assert(Media.flacCrc16(check, 0, check.length) === 0xFEE8)
    // 32-bps left/side: the side subframe is 33 BITS wide (only
    // representable past Int) — left constant Int.MaxValue, side
    // constant 1 → right = Int.MaxValue − 1.
    val wide = flacShell(8000, 2, 32, 2,
      flacFrame(2, 8, 7, w => {
        w.put(0, 1).put(0, 6).put(0, 1).put(Int.MaxValue.toLong, 32)
        w.put(0, 1).put(0, 6).put(0, 1).put(1L, 33)
      }))
    val wd = Media.decodeFlac(wide).get
    assert(wd.bitsPerSample === 32)
    assert(wd.samples.toSeq ===
      Seq(Int.MaxValue, Int.MaxValue - 1, Int.MaxValue, Int.MaxValue - 1))
    // Unknown-length stream (STREAMINFO total = 0): trailing tag bytes
    // after the last frame are tolerated — the CRC-verified samples are
    // returned, not discarded.
    val oneFrame = flacFrame(3, 0, 1, w => {
      w.put(0, 1).put(1, 6).put(0, 1)
      Seq(1, 2, 3).foreach(v => w.put(v & 0xff, 8))
    })
    val unknownLen = flacShell(8000, 1, 8, 0, oneFrame) ++
      ("TAG" + "x" * 125).getBytes("US-ASCII")
    assert(Media.decodeFlac(unknownLen).get.samples.toSeq === Seq(1, 2, 3))
    // ...but MID-stream corruption must NOT silently truncate: with an
    // intact frame still ahead of the damage, the scan finds its valid
    // header and fails loud instead of returning a third of the audio.
    // (Corrupting the LAST frame's sync is genuinely indistinguishable
    // from a trailing tag — any decoder returns the prefix there.)
    val threeFrames = flacShell(8000, 1, 8, 0,
      oneFrame ++ oneFrame ++ oneFrame)
    assert(Media.decodeFlac(threeFrames).get.samples.toSeq ===
      Seq(1, 2, 3, 1, 2, 3, 1, 2, 3))
    val midCorrupt = threeFrames.clone()
    midCorrupt(threeFrames.length - 2 * oneFrame.length) = 0x00 // frame 2 sync
    assert(Media.decodeFlac(midCorrupt).isEmpty)
    // A STREAMINFO-bearing file truncated inside a LATER metadata block
    // (interrupted download) still PROBES as flac — classification keeps
    // the stream parameters — while the decoder, which needs frames,
    // refuses.
    val truncated = {
      val full = flacShell(8000, 1, 8, 3, Array.emptyByteArray)
      // Rewrite STREAMINFO as NOT-last, append a padding block header
      // claiming more bytes than remain.
      full(4) = 0x00 // clear last-block flag on STREAMINFO
      full ++ Array[Byte](0x81.toByte, 0x00, 0x10, 0x00) // padding, len 4096
    }
    assert(Media.parseHeader(truncated) ===
      Media.MediaHeader("flac", 0, 0, 8000, 1))
    assert(Media.decodeFlac(truncated).isEmpty)
    // A hostile 33-bit side that reconstructs right past 32 bits fails
    // loud (no toInt wrap): left = Int.MaxValue, side = −2³¹ → right =
    // 2³²−1.
    val hostileWide = flacShell(8000, 2, 32, 2,
      flacFrame(2, 8, 7, w => {
        w.put(0, 1).put(0, 6).put(0, 1).put(Int.MaxValue.toLong, 32)
        w.put(0, 1).put(0, 6).put(0, 1)
          .put((1L << 33) - (1L << 31), 33) // −2³¹ in 33-bit two's compl.
      }))
    assert(Media.decodeFlac(hostileWide).isEmpty)
    // parseHeader probes the STREAMINFO rate/channels.
    assert(Media.parseHeader(cst) === Media.MediaHeader("flac", 0, 0, 8000, 1))
    // Batched extraction labels and sums the decoded samples:
    // Σ|s| = 7·4 = 28 for the constant fixture.
    val sparkSession = spark
    import sparkSession.implicits._
    val got = Media.extractFeaturesBatched(Seq((1L, cst)).toDF("id", "bytes"))
      .select("decoded", "n_samples", "sample_sum").collect().head
    assert((got.getString(0), got.getLong(1), got.getLong(2)) ===
      (("flac", 4L, 28L)))
  }

  /** One Ogg page with a REAL checksum (via the vector-pinned
    * [[Media.oggCrc]]); `htype` 0x02 = BOS, 0x01 = continued packet. */
  private def oggPage(htype: Int, serial: Int, seq: Int,
                      lacing: Seq[Int], payload: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer
      .allocate(27 + lacing.size + payload.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("OggS".getBytes("US-ASCII")).put(0.toByte).put(htype.toByte)
    b.putLong(0L).putInt(serial).putInt(seq).putInt(0) // crc placeholder
    b.put(lacing.size.toByte)
    lacing.foreach(l => b.put(l.toByte))
    b.put(payload)
    val page = b.array()
    val crc = Media.oggCrc(page, 0, page.length)
    page(22) = (crc & 0xff).toByte; page(23) = ((crc >> 8) & 0xff).toByte
    page(24) = ((crc >> 16) & 0xff).toByte; page(25) = ((crc >> 24) & 0xff).toByte
    page
  }

  test("Ogg: CRC-validated page walk, Vorbis/Opus id headers, packet-fragment ranges") {
    // The CRC implementation pinned by the standard vector: Ogg's CRC-32
    // is CRC-32/CKSUM (0x765E7680 over "123456789") without the final
    // complement → 0x89A1897F.
    val check = "123456789".getBytes("US-ASCII")
    assert(Media.oggCrc(check, 0, check.length) === 0x89A1897F)
    // Vorbis identification header → rate/channels from the real fields.
    val vorbisId = {
      val b = java.nio.ByteBuffer.allocate(30)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(1.toByte).put("vorbis".getBytes("US-ASCII"))
      b.putInt(0).put(2.toByte).putInt(44100)
      b.putInt(0).putInt(0).putInt(0).put(0xB8.toByte).put(1.toByte)
      b.array()
    }
    val vOgg = oggPage(0x02, 7, 0, Seq(30), vorbisId)
    assert(Media.parseHeader(vOgg) ===
      Media.MediaHeader("ogg_vorbis", 0, 0, 44100, 2))
    // Opus: "OpusHead", channels at +9, input rate at +12.
    val opusId = {
      val b = java.nio.ByteBuffer.allocate(19)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("OpusHead".getBytes("US-ASCII")).put(1.toByte).put(1.toByte)
      b.putShort(312).putInt(48000).putShort(0).put(0.toByte)
      b.array()
    }
    assert(Media.parseHeader(oggPage(0x02, 7, 0, Seq(19), opusId)) ===
      Media.MediaHeader("ogg_opus", 0, 0, 48000, 1))
    // Unknown codec id still classifies as a generic Ogg container.
    assert(Media.parseHeader(oggPage(0x02, 7, 0, Seq(4),
      "data".getBytes("US-ASCII"))).format === "ogg")
    // A flipped payload byte breaks the page CRC → not an Ogg stream.
    val bad = vOgg.clone(); bad(bad.length - 1) = 0x55
    assert(Media.parseHeader(bad) === Media.UnknownHeader)
    assert(Media.oggPacketRanges(bad).isEmpty)
    // Packet ranges: a 265-byte packet laced [255, 10] inside ONE page is
    // one contiguous range; a packet CONTINUED across pages yields one
    // fragment per page; trailing junk ends the walk cleanly.
    val big = Array.tabulate(265)(k => (k & 0x7f).toByte)
    val p1 = oggPage(0x02, 9, 0, Seq(255, 10), big)
    val frag1 = Array.fill(255)(3.toByte)
    val frag2 = Array.fill(5)(4.toByte)
    val spanning = oggPage(0x02, 9, 0, Seq(255), frag1) ++
      oggPage(0x01, 9, 1, Seq(5), frag2)
    val r1 = Media.oggPacketRanges(p1).get
    assert(r1.length === 1)
    assert(r1.head._2 === 265)
    val off = r1.head._1.toInt
    assert(p1.slice(off, off + 265).toSeq === big.toSeq)
    val r2 = Media.oggPacketRanges(spanning ++ "junk".getBytes).get
    assert(r2.map(_._2) === Vector(255, 5))
    // extractFrameSamples rides the same walk via the frameRanges chain.
    val sparkSession = spark
    import sparkSession.implicits._
    val sliced = Media.extractFrameSamples(
        Seq((1L, p1)).toDF("id", "bytes"))
      .select("n_frames", "frame_samples").collect().head
    assert(sliced.getLong(0) === 1L)
    assert(sliced.getSeq[Array[Byte]](1).head.toSeq === big.toSeq)
  }

  test("decodeFrames: REAL MJPEG pixel decode — frames located by stbl, decoded by the JDK readers") {
    val sparkSession = spark
    import sparkSession.implicits._
    // Three genuine JPEG frames (distinct gradients), packed as a real
    // Motion-JPEG-layout MP4: every sample is a complete JPEG picture.
    def jpegFrame(seed: Int): Array[Byte] = {
      val (w, h) = (32, 32)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = ((x + y * seed) * 255 / (w + h * seed)) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val frames = Seq(jpegFrame(1), jpegFrame(2), jpegFrame(3))
    val video = MediaFixtures.mp4WithSamples(frames, Seq(2, 1))
    val got = Media.decodeFrames(Seq((1L, video)).toDF("id", "bytes"))
      .select("n_frames", "frames_decoded", "frame_pixels",
        "frame_luma_sum", "first_frame_phash")
      .head()
    assert(got.getLong(0) === 3L)
    assert(got.getLong(1) === 3L, "every JPEG frame must decode")
    // Stats must equal the DIRECT still-image decodes of the same bytes.
    val direct = frames.map(f => Media.decodeImage(f).get)
    assert(got.getLong(2) === direct.map(_.pixels.length.toLong).sum)
    assert(got.getLong(3) ===
      direct.map(_.pixels.map(p => (p & 0xff).toLong).sum).sum)
    // The per-frame hash is BIT-IDENTICAL to perceptualHash of the same
    // picture as a standalone image — video keys join image keys.
    val stillHash = Media.perceptualHash(
        Seq((1L, frames.head)).toDF("id", "bytes"), nCells = 16)
      .select("phash").head().getLong(0)
    assert(got.getLong(4) === stillHash)
    assert(stillHash !== 0L, "structured frame must set bits")
    // Frame stride: every 2nd frame → 2 decoded, phash still frame 1's.
    val strided = Media.decodeFrames(
        Seq((1L, video)).toDF("id", "bytes"), stride = 2)
      .select("frames_decoded", "first_frame_phash").head()
    assert(strided.getLong(0) === 2L)
    assert(strided.getLong(1) === stillHash)
    // Non-MP4 payloads and entropy-coded (undecodable) samples degrade,
    // never throw: h264-like junk samples count as located-not-decoded.
    val junkVideo = MediaFixtures.mp4WithSamples(
      Seq(Array.fill(64)(0x5a.toByte)), Seq(1))
    val junk = Media.decodeFrames(Seq((1L, junkVideo)).toDF("id", "bytes"))
      .select("n_frames", "frames_decoded", "first_frame_phash").head()
    assert(junk.getLong(0) === 1L && junk.getLong(1) === 0L)
    assert(junk.isNullAt(2))
    val notMp4 = Media.decodeFrames(
        Seq((1L, "plain text".getBytes)).toDF("id", "bytes"))
      .select("n_frames").head()
    assert(notMp4.getLong(0) === -1L)
  }

  test("decoders never throw on random bytes (seeded fuzz), incl. near-miss headers") {
    val rnd = new scala.util.Random(1234)
    val prefixes = Seq(
      Array.emptyByteArray,
      "P5".getBytes("US-ASCII"), "P6 ".getBytes("US-ASCII"),
      "P5 #".getBytes("US-ASCII"),
      "RIFF".getBytes("US-ASCII"),
      "RIFF    WAVE".getBytes("US-ASCII"),
      "RIFF    WAVEfmt ".getBytes("US-ASCII"),
      Array[Byte](0, 0, 0, 16) ++ "ftypisom".getBytes("US-ASCII"),
      Array[Byte](0, 0, 0, 1) ++ "ftyp".getBytes("US-ASCII"), // 64-bit size
      "fLaC".getBytes("US-ASCII"),
      "GIF89a".getBytes("US-ASCII"), "BM".getBytes("US-ASCII"),
      Array[Byte]('I', 'I', 0x2a, 0), Array[Byte]('M', 'M', 0, 0x2a),
      "OggS".getBytes("US-ASCII"))
    for (_ <- 1 to 500) {
      val tail = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(tail)
      val b = prefixes(rnd.nextInt(prefixes.size)) ++ tail
      Media.decodeGray(b)      // must not throw
      Media.decodePcm(b)       // must not throw
      Media.decodeFlac(b)      // must not throw
      Media.frameRanges(b)     // must not throw (all four range walks)
      Media.parseHeader(b)     // must not throw
    }
  }

  test("batched extraction: results independent of batch size, codec called per batch") {
    val sparkSession = spark
    import sparkSession.implicits._
    val df = (0 until 100).map(i => (i.toLong, "x" * (i + 1))).toDF("id", "s")
      .selectExpr("id", "encode(s, 'UTF-8') AS bytes")
      .repartition(2)
    def run(bs: Int): Map[Long, Long] =
      Media.extractFeaturesBatched(df, batchSize = bs)
        .select("id", "byte_sum")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val whole = run(1000)
    // 'x' = 0x78 = 120; id i carries i+1 bytes.
    assert(whole(0L) === 120L && whole(99L) === 120L * 100)
    // Batch boundaries must be invisible in the output…
    assert(run(7) === whole)
    // …and the codec really is invoked once per batch: 100 rows over 2
    // partitions at batchSize 30 ⇒ 2×ceil(50/30) = 4 calls (local mode:
    // executors share the driver JVM, so the counter sees every call).
    Media.batchCalls.set(0L)
    run(30)
    assert(Media.batchCalls.get() === 4L)
  }
}
