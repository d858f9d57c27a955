package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for training-data pipelines: image/audio/video
  * carried as opaque `binary` columns beside typed metadata, with
  * decode/feature steps running per partition.
  *
  * ⚠ STUB BOUNDARY: this container ships no image/audio codecs, so
  * [[Media.decodeHeader]] parses a deterministic FAKE 12-byte header
  * (3 big-endian ints: width, height, sampleRate) standing in for a real
  * JPEG/WAV probe — swap `parseHeader` for the codec call at deploy time.
  * Everything AROUND the stub is the real Spark-side contract: binary-column
  * schema, per-partition batching, metadata struct shape, and the
  * narrow-projection plan (no shuffle, no driver collect).
  */
object Media {

  /** Canonical media frame schema: id + kind + payload + typed metadata. */
  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType))))))

  /** Deterministic fake header codec — the stubbed decode step. */
  def parseHeader(bytes: Array[Byte]): (Int, Int, Int) = {
    def be(i: Int): Int =
      ((bytes(i) & 0xff) << 24) | ((bytes(i + 1) & 0xff) << 16) |
        ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
    if (bytes == null || bytes.length < 12) (0, 0, 0)
    else (be(0), be(4), be(8))
  }

  def packHeader(width: Int, height: Int, sampleRate: Int,
                 payload: Array[Byte]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(12 + payload.length)
    buf.putInt(width).putInt(height).putInt(sampleRate).put(payload)
    buf.array()
  }

  /** Decode step: fill `meta` from the payload header, per partition (codec
    * state would be amortized here exactly like [[graft.sources.AvroCodec]]). */
  def decodeHeader(df: DataFrame): DataFrame = {
    val schema = df.schema
    val bi = schema.fieldIndex("bytes")
    val mi = schema.fieldIndex("meta")
    df.mapPartitions { it =>
      it.map { row =>
        val (w, h, sr) = parseHeader(row.getAs[Array[Byte]](bi))
        Row.fromSeq(row.toSeq.updated(mi, Row(w, h, sr)))
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
