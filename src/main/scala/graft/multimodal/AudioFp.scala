package graft.multimodal

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
}
