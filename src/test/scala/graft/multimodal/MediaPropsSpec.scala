package graft.multimodal

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** ScalaCheck cross-checks for the perceptual-hash path: random payloads
  * and hash sets where the brute-force answer is computable in-memory,
  * pinned against the distributed formulation. Deterministic seeds. */
class MediaPropsSpec extends SparkSpec {

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("scalacheck sampling failed"))

  /** In-memory reimplementation of the aHash construction. */
  private def refPhash(b: Array[Byte], nCells: Int): Long = {
    if (b.isEmpty) return 0L
    val len = b.length
    val cellW = (len + nCells - 1) / nCells
    val sums = new Array[Long](nCells); val lens = new Array[Long](nCells)
    var total = 0L
    for (i <- 0 until len) {
      val v = (b(i) & 0xff).toLong
      total += v; sums(i / cellW) += v; lens(i / cellW) += 1L
    }
    (0 until nCells).map(c =>
      if (sums(c) * len > total * lens(c)) 1L << c else 0L).sum
  }

  test("perceptualHash matches the in-memory reference on random payloads") {
    val sparkSession = spark
    import sparkSession.implicits._
    for (seed <- 1L to 3L) {
      val payloads = sample(Gen.listOfN(40,
        Gen.chooseNum(0, 200).flatMap(n =>
          Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)))), seed)
        .zipWithIndex.map { case (bs, i) => (i.toLong, bs.toArray) }
      val got = Media.perceptualHash(
          payloads.toDF("media_id", "bytes"), nCells = 16)
        .select("media_id", "phash").as[(Long, Long)].collect().toMap
      val want = payloads.map { case (i, b) => i -> refPhash(b, 16) }.toMap
      assert(got === want, s"seed $seed")
    }
  }

  test("phashClusters: components match a brute-force union-find") {
    val sparkSession = spark
    import sparkSession.implicits._
    val hashes = sample(
      Gen.listOfN(50, Gen.chooseNum(0L, (1L << 10) - 1)), seed = 11L)
      .zipWithIndex.map { case (h, i) => (i.toLong, h) }
    val got = Media.phashClusters(hashes.toDF("media_id", "phash"),
        nBits = 10, maxHamming = 2)
      .as[(Long, Long)].collect().toMap
    // Brute-force union-find over the same hamming ball.
    val parent = scala.collection.mutable.Map(hashes.map(_._1 -> -1L): _*)
    def find(x: Long): Long =
      if (parent(x) < 0) x else { val r = find(parent(x)); parent(x) = r; r }
    for ((a, ha) <- hashes; (b, hb) <- hashes
         if a < b && java.lang.Long.bitCount(ha ^ hb) <= 2) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra max rb) = ra min rb
    }
    val want = hashes.map { case (i, _) => i -> find(i) }.toMap
    assert(got.size === hashes.size)
    // Same partition: identical component MEMBERSHIP (ids may differ, but
    // both implementations label by min member, so compare directly).
    assert(got === want)
  }

  test("phashPairs banding equals brute force on random hash sets") {
    val sparkSession = spark
    import sparkSession.implicits._
    for (seed <- 1L to 3L) {
      // Dense 10-bit space over 60 ids → plenty of hamming-≤2 pairs.
      val hashes = sample(
        Gen.listOfN(60, Gen.chooseNum(0L, (1L << 10) - 1)), seed)
        .zipWithIndex.map { case (h, i) => (i.toLong, h) }
      val got = Media.phashPairs(hashes.toDF("media_id", "phash"),
          nBits = 10, maxHamming = 2)
        .as[(Long, Long, Long)].collect().toSet
      val want = (for {
        (a, ha) <- hashes; (b, hb) <- hashes if a < b
        d = java.lang.Long.bitCount(ha ^ hb) if d <= 2
      } yield (a, b, d.toLong)).toSet
      assert(got === want, s"seed $seed")
    }
  }
}
