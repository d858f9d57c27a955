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
  * ⚠ STUB BOUNDARY (narrower than it used to be): full pixel/sample
  * decode, resize, and frame extraction still need a codec library this
  * container doesn't ship — those steps run through the batch contract of
  * [[Media.extractFeaturesBatched]] with a deterministic fake in place of
  * the codec call. Everything around that boundary is the real Spark-side
  * contract: binary-column schema, per-partition batching, metadata struct
  * shape, and the narrow-projection plan (no shuffle, no driver collect).
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

  /** Real header probe over raw file bytes: JPEG / PNG / WAV, else unknown.
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
        i += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
      }
      return UnknownHeader
    }

    UnknownHeader
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
    * batches and the (stubbed) codec is invoked ONCE per batch with every
    * payload in it, emitting one feature row per input row in order. This
    * is the exact contract a vectorized decoder needs (GPU image decode,
    * batched resize: per-call setup amortized over `batchSize` payloads),
    * with the real codec swapped in at the ⚠ stub boundary below.
    *
    * The stub "codec" computes a deterministic per-payload byte sum —
    * integer-exact, so the DuckDB oracle can pin that the batch path
    * touched every byte of every row exactly once, independent of batch
    * boundaries or partitioning. Appends `byte_sum` (long); narrow, no
    * shuffle, batches never buffered beyond `batchSize` rows. */
  def extractFeaturesBatched(df: DataFrame, batchSize: Int = 64,
                             bytesCol: String = "bytes"): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    val schema = df.schema.add("byte_sum", LongType)
    val bi = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // ⚠ STUB BOUNDARY: a real pipeline hands `payloads` to the
        // vectorized codec in one call; the fake computes byte sums.
        batchCalls.incrementAndGet()
        val payloads = batch.map(_.getAs[Array[Byte]](bi))
        val sums = payloads.map { b =>
          if (b == null) 0L else { var s = 0L; var i = 0
            while (i < b.length) { s += b(i) & 0xff; i += 1 }; s }
        }
        batch.lazyZip(sums).map((row, s) => Row.fromSeq(row.toSeq :+ s))
      }
    }(Encoders.row(schema))
  }

  /** Per-payload `nCells`-bit PERCEPTUAL hash: the payload is cut into
    * `nCells` equal byte cells (last one ragged) and bit i is set when
    * cell i's byte MEAN exceeds the payload's overall byte mean — the
    * aHash construction, with the codec's luma plane stood in by raw
    * payload bytes (⚠ same stub boundary as [[extractFeaturesBatched]];
    * a real image pipeline hashes the decoded, downscaled luma instead —
    * identical bit/compare shape). The mean comparison is an integer
    * cross-multiply (`cellSum·len > totalSum·cellLen`), so hashes are
    * bit-identical on any engine — no float division anywhere.
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
        val b = row.getAs[Array[Byte]](bi)
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
        Row.fromSeq(row.toSeq :+ h)
      }
    }(Encoders.row(schema))
  }

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
