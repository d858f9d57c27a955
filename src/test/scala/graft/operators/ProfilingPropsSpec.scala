package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** ScalaCheck cross-checks for the profiling/temporal additions: random
  * small inputs where the straightforward in-memory answer is computable,
  * pinned against the distributed formulation. Deterministic seeds. */
class ProfilingPropsSpec extends SparkSpec {

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("scalacheck sampling failed"))

  /** In-memory equi-depth reference: type-1 cuts at rank ⌈n·i/k⌉, bucket
    * = 1 + #{cuts strictly below}. */
  private def refEquiDepth(vs: Seq[Long], k: Int): Map[Long, (Long, Long, Long)] = {
    val sorted = vs.sorted
    val n = sorted.size.toLong
    val cuts = (1 until k).map(i => sorted(((n * i + k - 1) / k - 1).toInt))
    vs.groupBy(v => 1L + cuts.count(_ < v))
      .map { case (b, g) => b -> ((g.size.toLong, g.min, g.max)) }
  }

  test("equiDepthHistogram matches the sort-based reference on random data") {
    val s = spark; import s.implicits._
    for (seed <- 1L to 4L) {
      // Narrow value domain → heavy ties, the interesting regime.
      val vs = sample(Gen.listOfN(200, Gen.chooseNum(0L, 30L)), seed)
      val got = Profiling.equiDepthHistogram(vs.toDF("v").repartition(5), "v", 8)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      assert(got === refEquiDepth(vs, 8), s"seed $seed")
    }
  }

  /** In-memory sweep-line reference: brute-force per-day max over event
    * points (+ start-of-day carry). */
  private def refConcurrency(iv: Seq[(Long, Long)], dayUs: Long)
      : Map[Long, (Long, Long)] = {
    val pts = iv.flatMap { case (st, en) => Seq((st, 1L), (en, -1L)) }
      .sortBy { case (us, d) => (us, -d) } // starts before ends at a tie
    var run = 0L
    val runsByDay = scala.collection.mutable.Map.empty[Long, List[Long]]
    val carry = scala.collection.mutable.Map.empty[Long, Long]
    for ((us, d) <- pts) {
      val day = us / dayUs
      if (!carry.contains(day)) carry(day) = run
      run += d
      runsByDay(day) = run :: runsByDay.getOrElse(day, Nil)
    }
    runsByDay.map { case (day, runs) =>
      day -> ((math.max(carry(day), runs.max),
        iv.count(_._1 / dayUs == day).toLong))
    }.toMap
  }

  test("concurrencyProfile matches the brute-force sweep on random intervals") {
    val s = spark; import s.implicits._
    val DayUs = 86400000000L
    for (seed <- 1L to 4L) {
      // Endpoints on a coarse grid across ~4 days → plenty of exact ties
      // and day-boundary spans.
      val iv = sample(Gen.listOfN(80,
        Gen.zip(Gen.chooseNum(0L, 400L), Gen.chooseNum(1L, 200L))), seed)
        .map { case (a, len) => (a * DayUs / 100, (a + len) * DayUs / 100) }
      val got = Temporal.concurrencyProfile(
          iv.toDF("s_us", "e_us").repartition(7), "s_us", "e_us")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got === refConcurrency(iv, DayUs), s"seed $seed")
    }
  }
}
