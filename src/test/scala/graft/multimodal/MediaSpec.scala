package graft.multimodal

import org.apache.spark.sql.Row
import graft.SparkSpec

/** Multimodal plumbing: fake-header decode (stub boundary), chunk sampling,
  * features — exercising the binary-column schema end to end. */
class MediaSpec extends SparkSpec {

  test("header pack/parse round-trips through the DataFrame decode step") {
    val payload = Array.tabulate[Byte](100)(_.toByte)
    val bytes = Media.packHeader(640, 480, 44100, payload)
    val df = spark.createDataFrame(
      java.util.List.of(Row(1L, "image", bytes, null)), Media.MediaSchema)
    val meta = Media.decodeHeader(df).select("meta.*").head()
    assert((meta.getInt(0), meta.getInt(1), meta.getInt(2)) === ((640, 480, 44100)))
  }

  test("short payloads decode to zero meta instead of failing") {
    val df = spark.createDataFrame(
      java.util.List.of(Row(1L, "image", Array[Byte](1, 2), null)), Media.MediaSchema)
    val meta = Media.decodeHeader(df).select("meta.*").head()
    assert((meta.getInt(0), meta.getInt(1), meta.getInt(2)) === ((0, 0, 0)))
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
