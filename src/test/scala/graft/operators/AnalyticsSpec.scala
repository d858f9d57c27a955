package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Sketch-aggregate and reshaping semantics: HLL error behaves at real
  * cardinalities, the rel-bound check is integer-exact (incl. zero), pivot
  * reproduces manual conditional counts, and cube's grouping_id separates
  * subtotal rows from true nulls. */
class AnalyticsSpec extends SparkSpec {

  test("fkAudit: orphans counted, null keys legal, clean relations zero") {
    val s = spark; import s.implicits._
    val child = Seq(Some(1L), Some(2L), Some(9L), None).toDF("fk")
    val parent = Seq(1L, 1L, 2L, 3L).toDF("pk") // dup parent keys must not fan out
    val r = Checksum.fkAudit(Seq(
        Checksum.FkRelation("c_p", child, "fk", parent, "pk")))
      .head()
    // 4 child rows; 1 null key (not an orphan); 9 has no parent.
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      (("c_p", 4L, 1L, 1L)))
  }

  private lazy val ss: org.apache.spark.sql.SparkSession = spark

  test("approxDistinct lands within the documented rsd at 50k cardinality") {
    import ss.implicits._
    val df = (0 until 50000).map(i => (i % 2, i.toLong)).toDF("g", "v")
    val got = Sketches.approxDistinct(df, Seq("g"), "v", rsd = 0.02)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // 25k distinct per group; 10x the rsd as a hard cap keeps this stable.
    for ((_, a) <- got) assert(math.abs(a - 25000L) <= 5000L)
  }

  test("withinRelBound is integer-exact and safe at exact = 0") {
    import ss.implicits._
    val df = Seq((100L, 95L), (100L, 89L), (0L, 0L), (0L, 1L))
      .toDF("exact", "approx")
    val got = df.select(
        Sketches.withinRelBound(col("approx"), col("exact"), 10L).as("ok"))
      .collect().map(_.getBoolean(0)).toSeq
    // 5% in, 11% out; 0≈0 in, 0 vs 1 out.
    assert(got === Seq(true, false, true, false))
  }

  test("approxQuantiles tracks exact percentiles on a skewed column") {
    import ss.implicits._
    val rnd = new scala.util.Random(3)
    val df = (0 until 20000).map(_ => math.pow(rnd.nextDouble(), 4) * 1000)
      .map(Tuple1(_)).toDF("v")
    val Array(q50, q95) = Sketches
      .approxQuantiles(df, Nil, "v", Seq(0.5, 0.95), accuracy = 10000)
      .collect().head.getSeq[Double](0).toArray
    val Array(e50, e95) = df
      .select(percentile(col("v"), array(lit(0.5), lit(0.95))))
      .collect().head.getSeq[Double](0).toArray
    assert(math.abs(q50 - e50) <= 0.05 * e50)
    assert(math.abs(q95 - e95) <= 0.05 * e95)
  }

  test("pivot with pinned values equals manual conditional counts") {
    import ss.implicits._
    val df = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "b")).toDF("k", "t")
    val wide = df.groupBy("k").pivot("t", Seq("a", "b", "missing"))
      .agg(count(lit(1)))
      .select(col("k"), coalesce(col("a"), lit(0L)).as("a"),
        coalesce(col("b"), lit(0L)).as("b"),
        coalesce(col("missing"), lit(0L)).as("missing"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(wide === Set((1L, 2L, 1L, 0L), (2L, 0L, 1L, 0L)))
  }

  test("cube grouping_id distinguishes subtotal rows from data nulls") {
    import ss.implicits._
    val df = Seq(("x", null.asInstanceOf[String]), ("x", "d")).toDF("a", "b")
    val got = df.cube("a", "b")
      .agg(count(lit(1)).as("n"), grouping_id().cast("long").as("gid"))
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2), r.getLong(3))).toSet
    // The (x, null-data) row carries gid 0; the (x, subtotal-b) row gid 1.
    assert(got.contains((Some("x"), None, 1L, 0L)))
    assert(got.contains((Some("x"), None, 2L, 1L)))
    assert(got.contains((None, None, 2L, 3L))) // grand total
  }

  test("linearFit recovers an exact linear relation and a known noisy slope") {
    import ss.implicits._
    // y = 3x + 7 exactly → slope 3, intercept 7 to the last bit.
    val exact = (0L to 20L).map(x => ("a", x, 3 * x + 7))
    // Symmetric residuals around y = 2x: (0,-1) and (2,+1) offsets cancel
    // in the moments → slope exactly 2, intercept 0.
    val noisy = Seq(("b", 0L, -1L), ("b", 0L, 1L), ("b", 2L, 3L), ("b", 2L, 5L))
    val got = Regression.linearFit((exact ++ noisy).toDF("g", "x", "y"),
        Seq("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    assert(got("a") === ((21L, 3.0, 7.0)))
    assert(got("b") === ((4L, 2.0, 0.0)))
  }

  test("linearFit is invariant to partitioning (exact integer moments)") {
    import ss.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1L to 500L).map(x => ("g", x, x * 13 + rnd.nextInt(1000).toLong))
    val one = Regression.linearFit(rows.toDF("g", "x", "y").repartition(1),
      Seq("g"), col("x"), col("y")).head()
    val many = Regression.linearFit(rows.toDF("g", "x", "y").repartition(7),
      Seq("g"), col("x"), col("y")).head()
    // Bit-identical, not approximately equal — the operator's whole point.
    assert(one.getDouble(2) === many.getDouble(2))
    assert(one.getDouble(3) === many.getDouble(3))
  }

  test("tableChecksum is row-order-independent and detects single-row drift") {
    import ss.implicits._
    val rows = (1L to 100L).map(i => ("g", i, s"name$i"))
    def sum(df: org.apache.spark.sql.DataFrame) =
      Checksum.tableChecksum(df, Seq("g"), Seq(col("id"), col("nm"))).head()
    val base = sum(rows.toDF("g", "id", "nm"))
    val shuffled = sum(scala.util.Random.shuffle(rows).toDF("g", "id", "nm")
      .repartition(5))
    assert(base === shuffled)
    val drifted = sum(rows.updated(41, ("g", 42L, "nameX")).toDF("g", "id", "nm"))
    assert(base.getLong(2) !== drifted.getLong(2))
  }

  test("heavyHitters is exact on skewed long keys, even with a coarse sketch") {
    val sparkSession = spark
    import sparkSession.implicits._
    // 200 singleton keys + a handful of heavy ones at varying multiplicity.
    val rows: Seq[Long] = (1L to 200L) ++
      Seq.fill(25)(1000L) ++ Seq.fill(24)(2000L) ++ Seq.fill(80)(3000L)
    val want = rows.groupBy(identity).collect {
      case (k, v) if v.size >= 25 => (k, v.size.toLong)
    }.toSet
    for (eps <- Seq(1e-4, 0.1)) { // 0.1 → tiny sketch, rampant collisions
      val got = Sketches.heavyHitters(rows.toDF("k"), "k", 25L, eps = eps)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === want, s"eps=$eps")
    }
  }

  test("heavyHitters edges: unreachable threshold is empty, threshold 1 is every key") {
    val sparkSession = spark
    import sparkSession.implicits._
    val rows = Seq(1L, 1L, 2L).toDF("k")
    assert(Sketches.heavyHitters(rows, "k", 100L).isEmpty)
    val all = Sketches.heavyHitters(rows, "k", 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(all === Set((1L, 2L), (2L, 1L)))
    intercept[IllegalArgumentException] { Sketches.heavyHitters(rows, "k", 0L) }
  }

  test("heavyHitters probes string keys through the aggregate's byte path") {
    val sparkSession = spark
    import sparkSession.implicits._
    val rows = (1 to 300).map(i => s"tail$i") ++
      Seq.fill(40)("señor🦊") ++ Seq.fill(39)("the") // non-ASCII must round-trip
    val got = Sketches.heavyHitters(rows.toDF("term"), "term", 39L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === Set(("señor🦊", 40L), ("the", 39L)))
  }
}
