package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryPack

/** Audio-fingerprint coverage. The underlying waveform per document is
  * a deterministic integer series of G.711-representable values
  * (multiples of 8 in [−120, 120] — exactly the segment-0 µ-law code
  * points), so THREE genuinely different encodings decode to the SAME
  * samples through three REAL decode paths: 8-bit PCM WAV
  * ([[Media.decodePcm]]), µ-law WAV (G.711 expansion), and a FLAC
  * verbatim stream ([[Media.decodeFlac]] — CRC-validated frame layer).
  * A fourth copy perturbs the first window's samples, exercising the
  * hamming tolerance.
  *
  * `q_audio_fingerprint` pins the integer Haar transform itself: DuckDB
  * recomputes the block sums, detail energies, band deltas, and sign
  * bits from the raw series — no audio anywhere. `q_audio_fp_pairs`
  * pins the banded-LSH pair search: DuckDB brute-forces ALL media-pair
  * hamming distances from its own fingerprints, so the banded join must
  * find exactly the ≤4-bit pairs (guaranteed by pigeonhole: 6 one-frame
  * bands, ≤4 differing bands leaves ≥2 equal). */
object AudioFpPack extends QueryPack {

  // Samples per fixture stream → 31 frames → 30 fp codes. Sized so the
  // banded join has REAL keys: 6 bands of 5 packed frame codes (35-bit
  // values) — single-frame 7-bit band keys have only 128 buckets, and
  // candidate volume is quadratic in bucket size (the first cut of this
  // fixture spent ~100 s at sf0.1 in exactly that blowup).
  private val N = 4096
  private val Frames = (N - 256) / 128 + 1 // 31 → fp codes 30
  private val BandFrames = 5
  private val Bands = (Frames - 1) / BandFrames // 6

  /** x_i = 8·(((id·i + b·i² + id) mod 31) − 15) with b = 1 + (⌊id/31⌋
    * mod 29) — deterministic and SQL-replicable. The waveform class is
    * keyed by (id mod 31, b): ids sharing BOTH yield identical
    * waveforms, so the pairs query finds cross-doc exact duplicates too
    * (both sides derive the same ~900 classes — the oracle brute-forces
    * every media pair, the Spark side must surface exactly those).
    * Two coefficients keep the duplicate classes SMALL at every SF —
    * a single mod-31 key made classes of ~160 docs at sf0.1, and the
    * banded join's candidate volume is quadratic in class size. */
  private[multimodal] def baseSamples(id: Long): Array[Int] = {
    val b = 1L + ((id / 31L) % 29L)
    Array.tabulate(N) { i =>
      (8L * (((id * i + b * i * i + id) % 31L) - 15L)).toInt
    }
  }

  /** The perturbed copy: first 64 samples shifted by −8 (stays inside
    * the 8-bit and µ-law-exact range). */
  private[multimodal] def pertSamples(id: Long): Array[Int] = {
    val x = baseSamples(id)
    var i = 0
    while (i < 64) { x(i) -= 8; i += 1 }
    x
  }

  /** 8-bit PCM WAV: unsigned bytes x+128 (decodePcm re-centers). */
  private def pcm8Wav(x: Array[Int]): Array[Byte] =
    MediaPack.wavContainer(1, x.map(v => (v + 128).toByte))

  /** µ-law WAV: segment-0 code for ±8m — positive m → ~m, negative →
    * ~(0x80|m) — the exact inverse of [[Media.ulawToLinear]] on these
    * values. */
  private def ulawWav(x: Array[Int]): Array[Byte] =
    MediaPack.wavContainer(7, x.map { v =>
      val m = math.abs(v) / 8
      val u = if (v >= 0) m else 0x80 | m
      (~u & 0xff).toByte
    })

  /** FLAC verbatim stream of the samples as signed 8-bit. */
  private def flacStream(x: Array[Int]): Array[Byte] =
    MediaPack.flacContainer(x.map(_.toByte))

  private def decodeAuto(bytes: Array[Byte]): Option[Media.PcmAudio] =
    if (bytes.length >= 4 && bytes(0) == 'f' && bytes(1) == 'L' &&
      bytes(2) == 'a' && bytes(3) == 'C') Media.decodeFlac(bytes)
    else Media.decodePcm(bytes)

  private[multimodal] def encodeKind(id: Long, kind: Int): Array[Byte] =
    kind match {
      case 0 => pcm8Wav(baseSamples(id))
      case 1 => ulawWav(baseSamples(id))
      case 2 => flacStream(baseSamples(id))
      case _ => pcm8Wav(pertSamples(id))
    }

  override def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map(
      "q_audio_fingerprint" -> { (s, dir) =>
        import s.implicits._
        spread(table(s, dir, "documents").select(col("doc_id"))).as[Long]
          .flatMap { id =>
            val pcm = Media.decodePcm(pcm8Wav(baseSamples(id))).get
            AudioFp.fingerprint(AudioFp.mono(pcm)).zipWithIndex.map {
              case (fp, ix) => (id, (ix + 1).toLong, fp.toLong)
            }
          }.toDF("media_id", "frame_ix", "fp")
      },
      "q_audio_fp_pairs" -> { (s, dir) =>
        import s.implicits._
        // localCheckpoint: the signature table feeds FOUR join branches
        // (bands a/b, ham fa/fb) — without it each branch re-runs the
        // encode+decode+fingerprint flatMap (same pattern as the LSH
        // signature table in Dedup.clusters).
        // spread: the encode×4 → decode → fingerprint flatMap below is
        // the query's dominant cost (3.9 s of its ~7 s at sf0.1) and ran
        // as ONE task — the fixture file is a single parquet row group,
        // which no split size can divide (r17, guide §1.2/§2).
        val fps = spread(table(s, dir, "documents").select(col("doc_id"))).as[Long]
          .flatMap { id =>
            (0 to 3).map { k =>
              val pcm = decodeAuto(encodeKind(id, k)).get
              (id * 4 + k, AudioFp.fingerprint(AudioFp.mono(pcm)))
            }
          }.toDF("media_id", "fp").localCheckpoint(true)
        // Banded LSH candidates + hamming verify, threshold 4 bits —
        // the r12-extracted [[AudioFp.pairs]] (one shuffle on the
        // packed (band_ix, band_val); 30 codes / 5 per band = 6 bands,
        // so a ≤4-bit pair still collides on ≥2 bands — pigeonhole).
        AudioFp.pairs(fps, maxHamming = 4, bandFrames = BandFrames)
      }
    )

  /** The shared Haar-fingerprint derivation in pure SQL: block sums per
    * (frame, level) → paired differences → energies → band deltas →
    * sign bits vs the previous frame → the 7-bit frame code. `kinds`
    * adds the perturbed variant for the pairs query. */
  private def fpCte(withKinds: Boolean): String = {
    val kindCols = if (withKinds) ", k.kind" else ""
    val kindKey = if (withKinds) ", kind" else ""
    val kindSrc =
      if (withKinds)
        ", (SELECT 0 AS kind UNION ALL SELECT 1) k"
      else ""
    val pert =
      if (withKinds)
        " - CASE WHEN k.kind = 1 AND ii.i < 64 THEN 8 ELSE 0 END"
      else ""
    s"""WITH ii AS (SELECT i FROM generate_series(0, ${N - 1}) t(i)),
       |samples AS (
       |  SELECT d.doc_id$kindCols, ii.i,
       |    CAST(8 * (((d.doc_id * ii.i
       |      + (1 + ((d.doc_id // 31) % 29)) * ii.i * ii.i + d.doc_id)
       |      % 31) - 15)$pert AS BIGINT) AS x
       |  FROM documents d, ii$kindSrc
       |),
       |fr AS (SELECT f FROM generate_series(0, ${Frames - 1}) t(f)),
       |lv AS (SELECT l FROM generate_series(1, 8) t(l)),
       |blocks AS (
       |  SELECT s.doc_id$kindKey, fr.f, lv.l,
       |    (s.i - fr.f * 128) // (1 << (lv.l - 1)) AS b, sum(s.x) AS sb
       |  FROM samples s, fr, lv
       |  WHERE s.i >= fr.f * 128 AND s.i < fr.f * 128 + 256
       |  GROUP BY ALL
       |),
       |pairsum AS (
       |  SELECT doc_id$kindKey, f, l, b // 2 AS p,
       |    max(CASE WHEN b % 2 = 0 THEN sb END) AS se,
       |    max(CASE WHEN b % 2 = 1 THEN sb END) AS so
       |  FROM blocks GROUP BY ALL
       |),
       |energies AS (
       |  SELECT doc_id$kindKey, f, l, sum((se - so) * (se - so)) AS e
       |  FROM pairsum GROUP BY ALL
       |),
       |bands AS (
       |  SELECT a.doc_id$kindKey, a.f, a.l AS kk, a.e - b.e AS d
       |  FROM energies a JOIN energies b USING (doc_id$kindKey, f)
       |  WHERE b.l = a.l + 1 AND a.l <= 7
       |),
       |bits AS (
       |  SELECT doc_id$kindKey, f, kk,
       |    CASE WHEN d - lag(d) OVER (PARTITION BY doc_id$kindKey, kk
       |      ORDER BY f) > 0 THEN 1 ELSE 0 END AS bit
       |  FROM bands
       |),
       |fp AS (
       |  SELECT doc_id$kindKey, f,
       |    CAST(sum(bit * (1 << (kk - 1))) AS BIGINT) AS fp
       |  FROM bits WHERE f >= 1 GROUP BY ALL
       |)""".stripMargin
  }

  override def oracles: Map[String, String] = Map(
    "q_audio_fingerprint" ->
      (fpCte(withKinds = false) +
        """
          |SELECT doc_id AS media_id, CAST(f AS BIGINT) AS frame_ix, fp
          |FROM fp""".stripMargin),
    "q_audio_fp_pairs" ->
      (fpCte(withKinds = true) +
        """,
          |media AS (
          |  SELECT d.doc_id, d.doc_id * 4 + j.j AS media_id,
          |    CASE WHEN j.j = 3 THEN 1 ELSE 0 END AS kind
          |  FROM documents d, generate_series(0, 3) j(j)
          |),
          |ham AS (
          |  SELECT a.media_id AS media_a, b.media_id AS media_b,
          |    sum(bit_count(xor(fa.fp, fb.fp))) AS h
          |  FROM media a JOIN media b ON a.media_id < b.media_id
          |  JOIN fp fa ON fa.doc_id = a.doc_id AND fa.kind = a.kind
          |  JOIN fp fb ON fb.doc_id = b.doc_id AND fb.kind = b.kind
          |    AND fb.f = fa.f
          |  GROUP BY 1, 2
          |)
          |SELECT media_a, media_b, CAST(h AS BIGINT) AS ham
          |FROM ham WHERE h <= 4""".stripMargin)
  )
}
