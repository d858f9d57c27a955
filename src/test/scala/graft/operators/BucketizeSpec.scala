package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.config.BucketType

/** Ports of the reference's bucketing doctests + seeded property sweep
  * (SURVEY.md §5: `utils.py:226-233` epoch trio, `utils.py:196-203` datetime
  * buckets) over all three wire-format branches. */
class BucketizeSpec extends SparkSpec {

  private def epochBuckets(interval: Long, epochs: Seq[Double]): Seq[(Long, Long)] = {
    val sparkSession = spark
    import sparkSession.implicits._
    val df = epochs.toDF("e")
    Bucketize.bucketize(df, "e", interval, BucketType.Epoch)
      .select("bucket_start", "bucket_end")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
  }

  test("epoch bucket boundary trio (doctest utils.py:226-233)") {
    assert(epochBuckets(10L, Seq(1.0, 9.0, 11.0)) ===
      Seq((0L, 10L), (0L, 10L), (10L, 20L)))
  }

  test("fractional epochs truncate toward zero like Python long() (ADVICE)") {
    // long(-0.5) = 0 → bucket (0,10); long(-5) = -5 → floor-div → (-10,0).
    assert(epochBuckets(10L, Seq(-0.5, -5.0, 0.0, 10.0)) ===
      Seq((0L, 10L), (-10L, 0L), (0L, 10L), (10L, 20L)))
  }

  test("ISO datetime bucketing (doctest utils.py:196-203)") {
    val sparkSession = spark
    import sparkSession.implicits._
    // 1970-01-01T00:00:02 @10 → (0,10); 2015-08-19T18:40:02.177979 @10 →
    // (1440009600, 1440009610) — the reference's exact expected pair.
    val df = Seq("1970-01-01T00:00:02.000000Z", "2015-08-19T18:40:02.177979Z").toDF("iso")
    val got = Bucketize.bucketize(df, "iso", 10L, BucketType.Iso)
      .select("bucket_start", "bucket_end")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((0L, 10L), (1440009602L - 2L, 1440009610L)))
  }

  test("ISO parse is session-timezone independent (ADVICE: pinned to UTC)") {
    val sparkSession = spark
    import sparkSession.implicits._
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val df = Seq("2015-08-19T18:40:02.177979Z").toDF("iso")
      val got = Bucketize.bucketize(df, "iso", 10L, BucketType.Iso)
        .select("bucket_start").head().getLong(0)
      assert(got === 1440009600L) // same as under UTC — the Z offset governs
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("property sweep: start <= trunc(e) < end, width = interval, aligned") {
    val rnd = new scala.util.Random(42)
    val epochs = Seq.fill(300)((rnd.nextDouble() - 0.2) * 3.2e9)
    for (interval <- Seq(1L, 10L, 20L, 60L, 3600L, 86400L)) {
      val got = epochBuckets(interval, epochs)
      epochs.zip(got).foreach { case (e, (start, end)) =>
        val t = e.toLong // truncation-toward-zero contract
        assert(end - start === interval, s"width e=$e i=$interval")
        assert(Math.floorMod(start, interval) === 0L, s"align e=$e i=$interval")
        assert(start <= t && t < end, s"containment e=$e i=$interval got ($start,$end)")
      }
    }
  }

  test("nowBucket contains the current time (P9, utils.py:168-182)") {
    val sparkSession = spark
    import sparkSession.implicits._
    val (s, e) = Bucketize.nowBucket(20L)
    val row = Seq(1).toDF("x").select(s.as("s"), e.as("e")).head()
    val now = System.currentTimeMillis() / 1000
    assert(row.getLong(0) <= now && now <= row.getLong(1)) // <= : clock moved within the second
    assert(row.getLong(1) - row.getLong(0) === 20L)
  }

  test("bucketizeWindow agrees with bucketize on the timestamp branch") {
    val events = graft.Tables.load(spark, "/root/testdata/sf0.001", "events").limit(200)
    val a = Bucketize.bucketize(events, "ts", 3600L, BucketType.Timestamp)
      .select("event_id", "bucket_start", "bucket_end")
    val b = Bucketize.bucketizeWindow(events, "ts", 3600L)
      .select("event_id", "bucket_start", "bucket_end")
    assert(a.exceptAll(b).count() === 0L && b.exceptAll(a).count() === 0L)
  }
}
