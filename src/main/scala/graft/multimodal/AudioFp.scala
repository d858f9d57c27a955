package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Audio fingerprinting over REAL decoded PCM — the dedup analog of the
  * image aHash for the audio modality (r10 verdict #7): r10 made
  * FLAC/PCM/G.711 decode real, this turns those samples into a compact,
  * deterministic signature that survives re-encoding.
  *
  * The transform is the Haitsma–Kalker shape reduced to pure integer
  * arithmetic: window the samples (256 samples, hop 128), take the
  * UNNORMALIZED Haar detail energies per level — level-l energy is the
  * sum of squared differences of adjacent size-2^(l-1) block sums, a
  * crude but deterministic spectral split from high (level 1) to low
  * (level 8) frequency — and emit one sign bit per adjacent band pair
  * per frame: bit k says whether the band-energy difference
  * E_k − E_{k+1} INCREASED versus the previous frame. 7 bits per frame,
  * no floats, no FFT, replicable in SQL as block-sum GROUP BYs (the
  * oracle does exactly that).
  *
  * Robustness trade documented: sign-of-delta features are stable under
  * the small quantization error lossy companding (G.711) introduces and
  * exactly invariant under lossless re-encoding (FLAC, container
  * changes); they are NOT pitch/tempo invariant — this is a
  * same-recording dedup key, not a song matcher.
  *
  * Scale: fingerprinting is a narrow per-partition pass over decoded
  * media; pair-finding is the standard banded LSH shape — ONE shuffle
  * on (band_ix, band_value) for candidates, then a hamming verify over
  * the 6-byte signatures. With bands of one frame-byte each, a pair
  * within T bits differs in at most T bands, so bands > T guarantees
  * recall (pigeonhole) — the same exactness argument as the PPJoin
  * prefix filter. */
object AudioFp {

  /** Unnormalized Haar detail energies of a power-of-two window:
    * out(l-1) = Σ_j (S_{l-1}(2j) − S_{l-1}(2j+1))² where S_0 are the
    * samples and S_l the size-2^l block sums. Long-exact: 16-bit
    * samples over a 256-window peak at ~2^45, far inside Long. */
  private[multimodal] def haarEnergies(win: Array[Long]): Array[Long] = {
    val levels = java.lang.Integer.numberOfTrailingZeros(win.length)
    val out = new Array[Long](levels)
    var cur = win
    var l = 0
    while (l < levels) {
      val half = cur.length / 2
      val next = new Array[Long](half)
      var e = 0L
      var j = 0
      while (j < half) {
        val a = cur(2 * j)
        val b = cur(2 * j + 1)
        val d = a - b
        e += d * d
        next(j) = a + b
        j += 1
      }
      out(l) = e
      cur = next
      l += 1
    }
    out
  }

  /** Interleaved → mono by integer channel average (the fingerprint
    * must not depend on channel count across re-encodings). */
  def mono(pcm: Media.PcmAudio): Array[Int] =
    if (pcm.channels <= 1) pcm.samples
    else {
      val n = pcm.samples.length / pcm.channels
      val out = new Array[Int](n)
      var i = 0
      while (i < n) {
        var s = 0L
        var c = 0
        while (c < pcm.channels) { s += pcm.samples(i * pcm.channels + c); c += 1 }
        out(i) = (s / pcm.channels).toInt
        i += 1
      }
      out
    }

  /** The fingerprint: one 7-bit value per frame f ≥ 1 — bit k−1 set
    * when (E_f(k) − E_f(k+1)) − (E_{f−1}(k) − E_{f−1}(k+1)) > 0 for
    * band pairs k = 1..7. Empty for streams shorter than two frames
    * (window + hop samples). */
  def fingerprint(samples: Array[Int], window: Int = 256,
                  hop: Int = 128): Array[Int] = {
    require(window > 0 && (window & (window - 1)) == 0,
      "window must be a power of two")
    require(hop > 0, "hop must be positive")
    if (samples == null || samples.length < window + hop) return Array.empty
    val frames = (samples.length - window) / hop + 1
    val levels = java.lang.Integer.numberOfTrailingZeros(window)
    val energies = new Array[Array[Long]](frames)
    var f = 0
    while (f < frames) {
      val win = new Array[Long](window)
      var i = 0
      while (i < window) { win(i) = samples(f * hop + i); i += 1 }
      energies(f) = haarEnergies(win)
      f += 1
    }
    val out = new Array[Int](frames - 1)
    f = 1
    while (f < frames) {
      var fp = 0
      var k = 1
      while (k < levels) {
        val d = energies(f)(k - 1) - energies(f)(k)
        val dp = energies(f - 1)(k - 1) - energies(f - 1)(k)
        if (d - dp > 0) fp |= 1 << (k - 1)
        k += 1
      }
      out(f - 1) = fp
      f += 1
    }
    out
  }

  /** Hamming distance between two equal-length fingerprints (bit count
    * over the per-frame XORs). */
  def hamming(a: Array[Int], b: Array[Int]): Int = {
    require(a.length == b.length, "fingerprint lengths differ")
    var s = 0
    var i = 0
    while (i < a.length) { s += java.lang.Integer.bitCount(a(i) ^ b(i)); i += 1 }
    s
  }

  /** Decode an audio payload's container to PCM: FLAC by magic
    * ([[Media.decodeFlac]]'s CRC-validated frame layer), anything else
    * through [[Media.decodePcm]]'s RIFF/WAV family (8/16-bit PCM,
    * G.711 µ/A-law, IMA ADPCM). None for undecodable bytes. */
  def decodeBytes(bytes: Array[Byte]): Option[Media.PcmAudio] =
    if (bytes != null && bytes.length >= 4 && bytes(0) == 'f' &&
      bytes(1) == 'L' && bytes(2) == 'a' && bytes(3) == 'C')
      Media.decodeFlac(bytes)
    else Media.decodePcm(bytes)

  /** Container bytes → fingerprint in one call (decode → mono →
    * [[fingerprint]]), for single-pass dispatchers
    * ([[graft.streaming.CrawlMedia.mediaFrom]]). None when the payload
    * doesn't decode; Some(empty) for streams shorter than two frames. */
  def fingerprintBytes(bytes: Array[Byte], window: Int = 256,
                       hop: Int = 128): Option[Array[Int]] =
    decodeBytes(bytes).map(p => fingerprint(mono(p), window, hop))

  /** Banded LSH band codes of a fingerprint table `(idCol, fp)`:
    * `(idCol, band_ix, band_val)` where each band packs `bandFrames`
    * consecutive 7-bit frame codes into one ≤ 63-bit Long and the band
    * count derives from the fingerprint length (leftover tail frames
    * carry no band — harmless for recall: a pair differing ONLY in the
    * tail still collides on every banded code). Narrow band keys are
    * the measured quadratic trap (7-bit keys → 128 buckets → ~105 s at
    * sf0.1; 35-bit keys → 5.4 s — SCALE.md r11), hence the packing. */
  def bandCodes(fps: DataFrame, bandFrames: Int = 5,
                idCol: String = "media_id"): DataFrame = {
    require(bandFrames >= 1 && bandFrames <= 9,
      "bandFrames must be in [1, 9] (7 bits per frame, one Long per band)")
    // Streams too short for one whole band emit no codes (and so no
    // candidates) — without the guard, sequence(0, -1) DESCENDS in
    // Spark and empty fingerprints would join each other on junk keys.
    fps.filter(size(col("fp")) >= bandFrames)
      .select(col(idCol),
        posexplode(expr(
          s"transform(sequence(0, cast(size(fp) / $bandFrames as int) - 1), " +
            s"b -> aggregate(slice(fp, b * $bandFrames + 1, $bandFrames), " +
            "0L, (acc, v) -> acc * 128 + v))"))
          .as(Seq("band_ix", "band_val")))
  }

  /** Every fingerprint pair within `maxHamming` bits: banded-LSH
    * candidates (ONE shuffle on the packed band key) + full-signature
    * hamming verify. Recall is exact by pigeonhole whenever the band
    * count exceeds `maxHamming` (a ≤ T-bit pair differs in ≤ T bands).
    * `fps` must be `(idCol, fp array<int>)`; unequal lengths verify
    * over the common prefix subject to the minimum-overlap rule (see
    * the verify below). localCheckpoint it when it is expensive to
    * derive — this plan fans it into four join branches. Output:
    * (media_a, media_b, ham) with media_a < media_b. */
  def pairs(fps: DataFrame, maxHamming: Int = 4, bandFrames: Int = 5,
            idCol: String = "media_id"): DataFrame = {
    val bands = bandCodes(fps, bandFrames, idCol)
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band_ix") === col("b.band_ix") &&
          col("a.band_val") === col("b.band_val") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("media_a"), col(s"b.$idCol").as("media_b"))
      .distinct()
    verifyPairs(cand, fps, maxHamming, idCol,
      math.max(2, maxHamming + 1) * bandFrames)
  }

  /** INCREMENTAL [[pairs]]: every ≤ `maxHamming` pair with at least one
    * side in `batch` — the durable-media-store steady state. The base
    * corpus is never self-joined: the left side of the candidate join
    * is the batch's band codes only, so per-call cost is O(batch ×
    * bucket) while the store side stays a partition-pruned scan. Ids
    * must be unique across base ∪ batch. Output matches the full
    * recompute's new rows (spec-pinned). */
  def pairsIncremental(base: DataFrame, batch: DataFrame,
                       maxHamming: Int = 4, bandFrames: Int = 5,
                       idCol: String = "media_id"): DataFrame = {
    val all = base.select(col(idCol), col("fp"))
      .union(batch.select(col(idCol), col("fp")))
    val bands = bandCodes(base, bandFrames, idCol)
      .withColumn("is_new", lit(false))
      .union(bandCodes(batch, bandFrames, idCol)
        .withColumn("is_new", lit(true)))
    val cand = bands.filter(col("is_new")).as("a")
      .join(bands.as("b"),
        col("a.band_ix") === col("b.band_ix") &&
          col("a.band_val") === col("b.band_val") &&
          (!col("b.is_new") || col(s"a.$idCol") < col(s"b.$idCol")) &&
          col(s"a.$idCol") =!= col(s"b.$idCol"))
      .select(least(col(s"a.$idCol"), col(s"b.$idCol")).as("media_a"),
        greatest(col(s"a.$idCol"), col(s"b.$idCol")).as("media_b"))
      .distinct()
    verifyPairs(cand, all, maxHamming, idCol,
      math.max(2, maxHamming + 1) * bandFrames)
  }

  /** Shared hamming verify: join candidates back to both signatures,
    * sum per-frame XOR bit counts over the COMMON PREFIX, keep
    * ≤ `maxHamming`. Crawl audio has duration-dependent fingerprint
    * lengths — a truncated or padded re-encode is one frame longer,
    * and zip_with over unequal arrays pads with null, null-poisoning
    * the sum so the filter silently dropped the pair the banding just
    * found. Prefix hamming is the same-recording-different-cut
    * semantics — BUT only above a minimum overlap of
    * max(2, maxHamming + 1) band widths, the PIGEONHOLE width (floored
    * at the r12 two-band trivial-match guard, which otherwise weakens
    * at maxHamming = 0): below it a
    * ≤-budget pair can spread its differing bits across EVERY shared
    * band and produce no collision, so the banding would find such
    * pairs only by luck — the gate admits exactly the overlap range
    * the banding guarantees to find, making exclusion deterministic
    * instead of collision-dependent (advice r12: 10–24-frame pairs
    * passed a 2-band gate but had ≤ 4 bands, silently dropping ≤ 4-bit
    * pairs BEFORE verify). It also keeps the trivial-match guard: a
    * barely-one-band clip never verifies as a "duplicate" of any track
    * sharing that single band. Sub-pigeonhole clips (< ~0.4 s at
    * defaults) are below the dedup's resolution by contract.
    * Equal-length inputs (the oracle fixtures, 30 frames) are
    * unaffected. */
  private def verifyPairs(cand: DataFrame, fps: DataFrame, maxHamming: Int,
                          idCol: String, minOverlap: Int): DataFrame =
    cand.join(fps.as("fa"), col("media_a") === col(s"fa.$idCol"))
      .join(fps.as("fb"), col("media_b") === col(s"fb.$idCol"))
      .filter(least(size(col("fa.fp")), size(col("fb.fp"))) >= minOverlap)
      .select(col("media_a"), col("media_b"),
        expr("aggregate(zip_with(" +
          "slice(fa.fp, 1, least(size(fa.fp), size(fb.fp))), " +
          "slice(fb.fp, 1, least(size(fa.fp), size(fb.fp))), " +
          "(x, y) -> bit_count(x ^ y)), 0, (acc, v) -> acc + v)")
          .cast("long").as("ham"))
      .filter(col("ham") <= maxHamming)
}
