package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** As-of / range join semantics: boundary inclusivity, null fill on no
  * match, strict mode, and randomized checks against in-memory reference
  * implementations (including negative and >2^53 instants, where a
  * double-based floor-div would misround the bucket). */
class TemporalSpec extends SparkSpec {

  test("concurrencyProfile: overlap counting, closed intervals, cross-day carry") {
    val s = spark; import s.implicits._
    val D = 86400000000L // one day in micros
    // Same-day overlaps: [0,10], [5,20], [15,30] → peak 2.
    val sameDay = Seq((0L, 10L), (5L, 20L), (15L, 30L)).toDF("s_us", "e_us")
    val r1 = Temporal.concurrencyProfile(sameDay, "s_us", "e_us")
      .as[(Long, Long, Long)].collect()
      .map { case (d, m, n) => d -> ((m, n)) }.toMap
    assert(r1 === Map(0L -> ((2L, 3L))))
    // Closed intervals: end == next start still overlaps (peak 2).
    val touch = Seq((0L, 10L), (10L, 20L)).toDF("s_us", "e_us")
    assert(Temporal.concurrencyProfile(touch, "s_us", "e_us")
      .select("max_concurrent").head().getLong(0) === 2L)
    // A session spanning day0→day2 carries into day1/day2 as an offset;
    // day1 (no own endpoints for it) only appears via the short session,
    // whose peak rides the carry.
    val span = Seq((0L, 2 * D + 3600L), (D + 100L, D + 200L))
      .toDF("s_us", "e_us")
    val r3 = Temporal.concurrencyProfile(span, "s_us", "e_us")
      .as[(Long, Long, Long)].collect()
      .map { case (d, m, n) => d -> ((m, n)) }.toMap
    assert(r3 === Map(0L -> ((1L, 1L)), 1L -> ((2L, 1L)), 2L -> ((1L, 0L))))
  }


  private lazy val ss: org.apache.spark.sql.SparkSession = spark

  test("asofJoin picks latest at-or-before row, null when none") {
    import ss.implicits._
    val left = Seq((1L, 100L, "a"), (1L, 205L, "b"), (2L, 50L, "c"))
      .toDF("k", "us", "tag")
    val right = Seq((1L, 100L, 10.0), (1L, 200L, 20.0), (1L, 300L, 30.0))
      .toDF("k", "us", "v")
    val got = Temporal.asofJoin(left, right, Seq("k"), "us")
      .select("tag", "asof_ts", "v").collect()
      .map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(got === Set(
      ("a", Some(100L), Some(10.0)), // inclusive: equal instant matches
      ("b", Some(200L), Some(20.0)),
      ("c", None, None)))            // no prior purchase → left-outer null
  }

  test("asofJoin strict mode skips the equal-instant row") {
    import ss.implicits._
    val left = Seq((1L, 100L, "a")).toDF("k", "us", "tag")
    val right = Seq((1L, 100L, 10.0), (1L, 90L, 9.0)).toDF("k", "us", "v")
    val got = Temporal.asofJoin(left, right, Seq("k"), "us", inclusive = false)
      .select("v").collect().map(_.getDouble(0)).toSeq
    assert(got === Seq(9.0))
  }

  test("asofJoin matches an in-memory reference on random data") {
    import ss.implicits._
    val rnd = new scala.util.Random(7)
    val lefts = (0 until 400).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
    // Unique (k, us) on the right — the documented tie contract.
    val rights = rnd.shuffle((0 until 300).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))).distinct
      .map { case (k, us) => (k, us, rnd.nextDouble()) }
    val got = Temporal.asofJoin(
        lefts.toDF("k", "us", "lid"), rights.toDF("k", "us", "v"), Seq("k"), "us")
      .select("lid", "asof_ts").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    val expected = lefts.map { case (k, us, lid) =>
      val c = rights.filter(r => r._1 == k && r._2 <= us)
      lid -> (if (c.isEmpty) None else Some(c.map(_._2).max))
    }.toMap
    assert(got === expected)
  }

  test("rangeJoin is exactly the half-open interval predicate") {
    import ss.implicits._
    val rnd = new scala.util.Random(11)
    // Negative and positive instants; interval lengths 0 (empty) to ~3 buckets.
    val points = (0 until 500).map(i => (rnd.nextLong() % 2000L, i.toLong))
    val ivs = (0 until 120).map { i =>
      val s = rnd.nextLong() % 2000L
      (s, s + rnd.nextInt(300).toLong, i.toLong)
    }
    val got = Temporal.rangeJoin(points.toDF("p", "pid"), "p",
        ivs.toDF("s", "e", "iid"), "s", "e", bucketWidth = 100L)
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      (p, pid) <- points; (s, e, iid) <- ivs if p >= s && p < e
    } yield (pid, iid)).toSet
    assert(got === expected)
    assert(expected.nonEmpty)
  }

  test("keyed rangeJoin bounds candidates per key and matches the reference") {
    import ss.implicits._
    val rnd = new scala.util.Random(23)
    val points = (0 until 400).map(i =>
      (rnd.nextInt(6).toLong, rnd.nextInt(2000).toLong, i.toLong))
    val ivs = (0 until 100).map { i =>
      val s = rnd.nextInt(2000).toLong
      (rnd.nextInt(6).toLong, s, s + rnd.nextInt(250).toLong, i.toLong)
    }
    val got = Temporal.rangeJoin(points.toDF("k", "p", "pid"), "p",
        ivs.toDF("k", "s", "e", "iid"), "s", "e",
        bucketWidth = 100L, keys = Seq("k"))
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      (kp, p, pid) <- points; (ki, s, e, iid) <- ivs
      if kp == ki && p >= s && p < e
    } yield (pid, iid)).toSet
    assert(got === expected)
    assert(expected.nonEmpty)
  }

  test("rangeJoin buckets exactly above 2^53 (double floor-div would misround)") {
    import ss.implicits._
    val base = 9007199254740993L // 2^53 + 1
    val points = Seq((base, 1L), (base + 2L, 2L), (-base, 3L)).toDF("p", "pid")
    val ivs = Seq((base, base + 1L, 10L), (base + 1L, base + 3L, 11L),
      (-base - 1L, -base + 1L, 12L)).toDF("s", "e", "iid")
    val got = Temporal.rangeJoin(points, "p", ivs, "s", "e", bucketWidth = 3L)
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L), (2L, 11L), (3L, 12L)))
  }

  test("forward asofJoin picks earliest at-or-after row, null when none") {
    import ss.implicits._
    val left = Seq((1L, 100L, "a"), (1L, 205L, "b"), (2L, 500L, "c"))
      .toDF("k", "us", "tag")
    val right = Seq((1L, 100L, 10.0), (1L, 200L, 20.0), (1L, 300L, 30.0))
      .toDF("k", "us", "v")
    val got = Temporal.asofJoin(left, right, Seq("k"), "us", forward = true)
      .select("tag", "asof_ts", "v").collect()
      .map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(got === Set(
      ("a", Some(100L), Some(10.0)), // inclusive: equal instant matches
      ("b", Some(300L), Some(30.0)), // next click strictly later is fine too
      ("c", None, None)))            // nothing after → left-outer null
  }

  test("forward asofJoin strict mode skips the equal-instant row") {
    import ss.implicits._
    val left = Seq((1L, 100L, "a")).toDF("k", "us", "tag")
    val right = Seq((1L, 100L, 10.0), (1L, 110L, 11.0)).toDF("k", "us", "v")
    val got = Temporal.asofJoin(left, right, Seq("k"), "us",
        inclusive = false, forward = true)
      .select("v").collect().map(_.getDouble(0)).toSeq
    assert(got === Seq(11.0))
  }

  test("forward asofJoin matches an in-memory reference on random data") {
    import ss.implicits._
    val rnd = new scala.util.Random(13)
    val lefts = (0 until 400).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
    val rights = rnd.shuffle((0 until 300).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))).distinct
      .map { case (k, us) => (k, us, rnd.nextDouble()) }
    val got = Temporal.asofJoin(
        lefts.toDF("k", "us", "lid"), rights.toDF("k", "us", "v"),
        Seq("k"), "us", forward = true)
      .select("lid", "asof_ts").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    val expected = lefts.map { case (k, us, lid) =>
      val c = rights.filter(r => r._1 == k && r._2 >= us)
      lid -> (if (c.isEmpty) None else Some(c.map(_._2).min))
    }.toMap
    assert(got === expected)
  }

  test("resampleFill densifies per-key grids and carries values forward") {
    import ss.implicits._
    // key 1 observes at 0, 30, 40 (step 10 → gaps at 10, 20); key 2 at 100
    // only (single-point spine). Values fill from the last observed bucket.
    val obs = Seq((1L, 0L, 5L), (1L, 30L, 7L), (1L, 40L, 2L), (2L, 100L, 9L))
      .toDF("k", "b", "v")
    val got = Temporal.resampleFill(obs, Seq("k"), "b", 10L, Seq("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3)))
      .toSet
    assert(got === Set(
      (1L, 0L, true, 5L), (1L, 10L, false, 5L), (1L, 20L, false, 5L),
      (1L, 30L, true, 7L), (1L, 40L, true, 2L), (2L, 100L, true, 9L)))
  }

  test("resampleFill fills multiple value columns independently") {
    import ss.implicits._
    val obs = Seq((1L, 0L, 5L, 50L), (1L, 20L, 7L, 70L)).toDF("k", "b", "v1", "v2")
    val got = Temporal.resampleFill(obs, Seq("k"), "b", 10L, Seq("v1", "v2"))
      .filter(col("b") === 10L).collect()
    assert(got.length === 1)
    assert((got(0).getLong(3), got(0).getLong(4)) === ((5L, 50L)))
    assert(!got(0).getBoolean(2))
  }

  test("asofJoin plans one shuffle over the union, no join node") {
    import ss.implicits._
    val left = Seq((1L, 100L, "a")).toDF("k", "us", "tag")
    val right = Seq((1L, 90L, 9.0)).toDF("k", "us", "v")
    val plan = Temporal.asofJoin(left, right, Seq("k"), "us")
      .queryExecution.executedPlan
    val exchanges = plan.toString.linesIterator.count(_.contains("Exchange"))
    assert(!plan.toString.contains("Join"), "as-of must not plan a join")
    assert(exchanges <= 1, s"expected one shuffle, saw $exchanges")
  }

  test("snapshotDiff: added/changed classes, ties on tieCol, t2 cutoff honored") {
    import ss.implicits._
    val log = Seq(
      (1L, "a", 1L, 1L), (1L, "b", 5L, 2L),  // changed a→b
      (2L, "a", 1L, 3L), (2L, "a", 7L, 4L),  // unchanged → absent
      (3L, "b", 6L, 5L),                     // added after t1
      // tie at instant 2: tieCol picks "y" as the t1 state
      (4L, "x", 2L, 6L), (4L, "y", 2L, 7L), (4L, "z", 9L, 8L),
      (5L, "a", 1L, 9L), (5L, "b", 12L, 10L) // change lands AFTER t2 → absent
    ).toDF("k", "attr", "us", "tie")
    val got = Temporal.snapshotDiff(log, Seq("k"), "attr", "us",
        t1 = 3L, t2 = 10L, tieCols = Seq("tie"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)), r.getString(3)))
      .toSet
    assert(got === Set(
      (1L, "changed", Some("a"), "b"),
      (3L, "added", None, "b"),
      (4L, "changed", Some("y"), "z")))
  }

  test("snapshotDiff: a null-valued t1 state that changes is 'changed', not 'added'") {
    import ss.implicits._
    // Key 1 exists at t1 with a NULL attribute (a tombstone state), then
    // takes a value; key-presence must be derived separately from the
    // state value, or this misreports as 'added'. Key 2 really is added.
    val log = Seq(
      (1L, None, 1L, 1L), (1L, Some("b"), 5L, 2L),
      (2L, Some("c"), 6L, 3L),
      (3L, Some("d"), 2L, 4L), (3L, None, 7L, 5L) // value → null tombstone
    ).toDF("k", "attr", "us", "tie")
    val got = Temporal.snapshotDiff(log, Seq("k"), "attr", "us",
        t1 = 3L, t2 = 10L, tieCols = Seq("tie"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)),
        Option(r.getString(3))))
      .toSet
    assert(got === Set(
      (1L, "changed", None, Some("b")),
      (2L, "added", None, Some("c")),
      (3L, "changed", Some("d"), None)))
  }

  test("snapshotDiff edges: empty log, all-late log, invalid cutoffs") {
    import ss.implicits._
    val empty = Seq.empty[(Long, String, Long, Long)].toDF("k", "attr", "us", "tie")
    assert(Temporal.snapshotDiff(empty, Seq("k"), "attr", "us", 1L, 2L).isEmpty)
    // Every event after t2: nothing to diff.
    val late = Seq((1L, "a", 100L, 1L)).toDF("k", "attr", "us", "tie")
    assert(Temporal.snapshotDiff(late, Seq("k"), "attr", "us", 1L, 2L).isEmpty)
    intercept[IllegalArgumentException] {
      Temporal.snapshotDiff(late, Seq("k"), "attr", "us", t1 = 5L, t2 = 5L)
    }
  }

  test("snapshotDiff plans a single aggregate, no join") {
    import ss.implicits._
    val log = Seq((1L, "a", 1L, 1L)).toDF("k", "attr", "us", "tie")
    val plan = Temporal.snapshotDiff(log, Seq("k"), "attr", "us", 1L, 2L,
      Seq("tie")).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "snapshot diff must not plan a join")
    assert(plan.linesIterator.count(_.contains("Exchange")) <= 1)
  }
}
