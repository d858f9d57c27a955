package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions.col
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

  test("modes: brute-force agreement on random data; ties to min; null column absent") {
    val s = spark; import s.implicits._
    for (seed <- 1L to 3L) {
      val rows = sample(Gen.listOfN(120,
        Gen.zip(Gen.option(Gen.chooseNum(0L, 6L)),
          Gen.option(Gen.oneOf("x", "y", "z")))), seed)
      val df = rows.toDF("a", "b")
        .withColumn("allnull", org.apache.spark.sql.functions.lit(null).cast("string"))
      def brute(vs: Seq[String]): Option[(String, Long)] = {
        val g = vs.filter(_ != null).groupBy(identity).view.mapValues(_.size.toLong)
        if (g.isEmpty) None
        else {
          val m = g.values.max
          Some((g.filter(_._2 == m).keys.min, m))
        }
      }
      val expected = Seq(
        "a" -> brute(rows.map(_._1.map(_.toString).orNull)),
        "b" -> brute(rows.map(_._2.orNull)),
        "allnull" -> None
      ).collect { case (c, Some((v, n))) => (c, v, n) }.toSet
      val got = Profiling.modes(df, Seq("a", "b", "allnull")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(got === expected, s"seed $seed")
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

  test("skewAudit matches the brute-force frequency profile on random keys") {
    val s = spark; import s.implicits._
    for (seed <- 1L to 3L) {
      // Zipf-ish: a hot key plus a tail — the regime the audit exists for.
      val ks = sample(Gen.listOfN(300,
        Gen.frequency(5 -> Gen.const(7L), 1 -> Gen.chooseNum(0L, 40L))), seed)
      val df = ks.zipWithIndex.map { case (k, i) => (k, s"v${i % 11}") }
        .toDF("a", "b").repartition(7)
      val got = Profiling.skewAudit(df, Seq("a", "b")).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
      for ((name, vals) <- Seq("a" -> ks.map(_.toString),
                               "b" -> ks.indices.map(i => s"v${i % 11}"))) {
        val freq = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val ns = freq.values.toSeq.sorted
        val nk = ns.size.toLong
        def rank(nu: Long, de: Long) = ((nk * nu + de - 1) / de - 1).toInt
        val maxN = ns.max
        // (n, key) lexicographic max — ties on count resolve to max key.
        val topKey = freq.toSeq.map { case (k, n) => (n, k) }.max._2
        val expect = (vals.size.toLong, nk, maxN, topKey,
          ns(rank(1, 2)), ns(rank(99, 100)),
          1000L * maxN * nk / vals.size)
        assert(got(name) === expect, s"seed $seed col $name")
      }
    }
  }

  test("burstAnomalies: trailing-mean gate, minPrev warm-up, observed-day frame") {
    val s = spark; import s.implicits._
    // Counts per day: t stays flat at 4; day 10 bursts to 9 (> 5/4 × mean 4);
    // day 12 (gap at 11) compares against the last OBSERVED days. Category
    // u has only 2 prior days — below minPrev, can never alarm.
    val rows =
      (1L to 9L).flatMap(d => Seq.fill(4)(("t", d))) ++
        Seq.fill(9)(("t", 10L)) ++ Seq.fill(9)(("t", 12L)) ++
        (1L to 2L).flatMap(d => Seq.fill(2)(("u", d))) ++ Seq.fill(99)(("u", 3L))
    val df = rows.toDF("cat", "d").repartition(5)
    val got = Profiling.burstAnomalies(df, "cat", col("d"), num = 5L, den = 4L)
      .select("cat", "day", "n", "prev_n", "prev_days")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    // Day 10: prev = days 6-9 (4×4=16); 9·4·4 = 144 > 5·16 = 80 → alarm.
    // Day 12: prev = days 7,8,9,10 (4+4+4+9=21); 9·4·4 = 144 > 105 → alarm.
    // Day 3 of u: only 2 prior days < minPrev=3 → silent despite the 99.
    assert(got === Set(("t", 10L, 9L, 16L, 4L), ("t", 12L, 9L, 21L, 4L)))
  }
}
