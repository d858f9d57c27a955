package graft.multimodal

import graft.SparkSpec

/** The audio fingerprint's contract: hand-checked Haar energies, the
  * sign-bit derivation, exact invariance across the three real decode
  * paths (PCM8 / µ-law / FLAC verbatim of the same samples), bounded
  * damage from a local perturbation, and the hamming helper. */
class AudioFpSpec extends SparkSpec {

  test("haarEnergies: hand-computed on a 4-sample window") {
    // win = [3, 1, 4, 1]: level 1 diffs (3-1, 4-1) → 4 + 9 = 13;
    // sums [4, 5]; level 2 diff (4-5) → 1.
    assert(AudioFp.haarEnergies(Array(3L, 1L, 4L, 1L)).toSeq === Seq(13L, 1L))
    // Constant signal: zero detail energy at every level.
    assert(AudioFp.haarEnergies(Array.fill(8)(7L)).toSeq ===
      Seq(0L, 0L, 0L))
  }

  test("fingerprint: frame count, bit width, short-input empty, sign rule") {
    val x = AudioFpPack.baseSamples(42L)
    val fp = AudioFp.fingerprint(x)
    assert(fp.length === 30) // 4096 samples → 31 frames → 30 codes
    assert(fp.forall(v => v >= 0 && v < 128)) // 7 bits
    assert(AudioFp.fingerprint(Array.fill(300)(5)).isEmpty) // < window+hop
    assert(AudioFp.fingerprint(null).isEmpty)
    // Deterministic: same input, same code.
    assert(AudioFp.fingerprint(x).toSeq === fp.toSeq)
    // Hand-check ONE bit: band pair k=1 of frame 1 against frame 0.
    def energies(off: Int) = {
      val w = new Array[Long](256)
      var i = 0
      while (i < 256) { w(i) = x(off + i); i += 1 }
      AudioFp.haarEnergies(w)
    }
    val e0 = energies(0)
    val e1 = energies(128)
    val expectBit0 = ((e1(0) - e1(1)) - (e0(0) - e0(1))) > 0
    assert(((fp(0) & 1) == 1) === expectBit0)
  }

  test("fingerprint is identical across PCM8 / ulaw / FLAC decodes of the same samples") {
    for (id <- Seq(1L, 7L, 123L)) {
      val fps = (0 to 2).map { k =>
        val bytes = AudioFpPack.encodeKind(id, k)
        val pcm = (if (k == 2) Media.decodeFlac(bytes)
        else Media.decodePcm(bytes)).get
        AudioFp.fingerprint(AudioFp.mono(pcm)).toSeq
      }
      assert(fps.distinct.size === 1,
        s"id=$id: encodings disagree: $fps")
      assert(fps.head.nonEmpty)
    }
  }

  test("perturbation damage is local and bounded; hamming helper counts bits") {
    val a = AudioFp.fingerprint(AudioFpPack.baseSamples(9L))
    val b = AudioFp.fingerprint(AudioFpPack.pertSamples(9L))
    // The first 64 samples touch only frame 0's window, so only
    // fingerprint code 0 (frame 1 vs 0) can differ.
    assert(a.drop(1).toSeq === b.drop(1).toSeq)
    assert(AudioFp.hamming(a, b) <= 7)
    assert(AudioFp.hamming(a, a) === 0)
    intercept[IllegalArgumentException] {
      AudioFp.hamming(a, a.drop(1))
    }
  }

  test("pairs: unequal-length fingerprints verify over the common prefix, never null-drop") {
    val sparkSession = spark
    import sparkSession.implicits._
    // Same recording, one cut a frame longer (crawl audio is duration-
    // dependent): the banding finds the candidate, and the verify must
    // score the COMMON PREFIX instead of null-poisoning the hamming sum
    // (zip_with pads unequal arrays with null — review r12).
    val base = Array.tabulate(30)(i => (i * 7) % 128)
    val longer = base :+ 99
    val fps = Seq((1L, base), (2L, longer)).toDF("media_id", "fp")
    val got = AudioFp.pairs(fps, maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 2L, 0L)))
    // Minimum overlap: a clip of barely one band (5-9 frames) would
    // verify trivially against ANY track sharing that single band — a
    // handful of near-silent opening frames must not mark two different
    // recordings as duplicates. Below the pigeonhole width: rejected.
    val shortClip = base.take(6)
    val fps2 = Seq((1L, base), (3L, shortClip)).toDF("media_id", "fp")
    assert(AudioFp.pairs(fps2, maxHamming = 4).isEmpty)
    // The gate sits exactly at the PIGEONHOLE width,
    // (maxHamming + 1) × bandFrames = 25 frames at defaults (advice
    // r12): a 10–24-frame overlap has ≤ 4 complete bands, so a ≤ 4-bit
    // pair can differ in EVERY shared band and the banding only finds
    // it by luck — such pairs must be excluded deterministically by the
    // gate, not dropped silently by a missed collision. 24 frames of
    // overlap (passes the old 2-band gate): rejected even though the
    // clips are IDENTICAL over the prefix…
    val fps3 = Seq((1L, base), (4L, base.take(24)))
      .toDF("media_id", "fp")
    assert(AudioFp.pairs(fps3, maxHamming = 4).isEmpty)
    // …while at exactly 25 frames a ≤ 4-bit pair is in-contract and
    // found (recall is pigeonhole-exact from here up).
    val at25 = base.take(25)
    val flipped = at25.clone(); flipped(24) = at25(24) ^ 3 // 2 bits
    val fps4 = Seq((1L, at25), (5L, flipped)).toDF("media_id", "fp")
    val got25 = AudioFp.pairs(fps4, maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got25.toSeq === Seq((1L, 5L, 2L)))
  }

  test("mono: channel average, odd remainders truncate toward zero") {
    val stereo = Media.PcmAudio(8000, 2, 16, Array(10, 20, -3, -4, 7, 8))
    assert(AudioFp.mono(stereo).toSeq === Seq(15, -3, 7))
    val monoIn = Media.PcmAudio(8000, 1, 16, Array(1, 2, 3))
    assert(AudioFp.mono(monoIn).toSeq === Seq(1, 2, 3))
  }
}
