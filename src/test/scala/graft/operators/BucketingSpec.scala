package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The point of bucketing is the PLAN, so that's what these tests pin:
  * exchange-free co-located join, shuffle-free aggregation on the bucket
  * key, bucket pruning on equality filters — plus value equality against
  * the unbucketed plan. */
class BucketingSpec extends SparkSpec {

  private def withNoBroadcast[A](body: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try body finally spark.conf.set(key, old)
  }

  private lazy val tables: Unit = {
    val ss = spark
    import ss.implicits._
    val rnd = new scala.util.Random(17)
    val facts = (0 until 5000).map(i =>
      (rnd.nextInt(200).toLong, i.toLong, rnd.nextInt(1000).toLong))
    val dims = (0 until 200).map(k => (k.toLong, s"dim_$k"))
    Bucketing.writeBucketed(facts.toDF("k", "fid", "v"),
      "bspec_facts", "/tmp/graft_bspec/facts", 8, Seq("k"), Seq("k"))
    Bucketing.writeBucketed(dims.toDF("k", "name"),
      "bspec_dims", "/tmp/graft_bspec/dims", 8, Seq("k"), Seq("k"))
  }

  test("co-bucketed join plans with NO exchange and matches the plain join") {
    tables
    withNoBroadcast {
      val joined = spark.table("bspec_facts")
        .join(spark.table("bspec_dims"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"expected exchange-free co-located join, got:\n$plan")
      val expected = spark.table("bspec_facts").collect().length
      assert(joined.count() === expected) // every fact key exists in dims
    }
  }

  test("groupBy on the bucket key aggregates without a shuffle") {
    tables
    val agg = spark.table("bspec_facts").groupBy("k")
      .agg(sum("v").as("sv"), count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"expected shuffle-free bucketed aggregation, got:\n$plan")
    assert(agg.count() === 200L)
  }

  test("range-sorted write yields files covering disjoint value ranges") {
    val ss = spark
    import ss.implicits._
    val rnd = new scala.util.Random(53)
    val df = (0 until 20000).map(_ => rnd.nextInt(1000000).toLong)
      .map(Tuple1(_)).toDF("ts")
    Bucketing.writeRangeSorted(df, "/tmp/graft_bspec/range", 8, "ts")

    val files = new java.io.File("/tmp/graft_bspec/range").listFiles()
      .filter(f => f.getName.startsWith("part-")).map(_.getPath).sorted
    assert(files.length === 8)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("ts")), max(col("ts"))).collect().head
      (r.getLong(0), r.getLong(1))
    }
    // Sorted by min, each file's max must stay below the next file's min.
    val byMin = ranges.sortBy(_._1)
    for (Array((_, hi), (lo, _)) <- byMin.sliding(2).map(_.toArray))
      assert(hi < lo, s"overlapping file ranges: ${byMin.mkString(", ")}")
    // And the predicate reaches the scan for pruning to act on.
    val plan = spark.read.parquet("/tmp/graft_bspec/range")
      .filter(col("ts") > 900000L).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThan(ts,900000)]"))
  }

  test("z-ordered write keeps BOTH dimensions' per-file spans narrow") {
    val ss = spark
    import ss.implicits._
    val rnd = new scala.util.Random(97)
    // Two independent uniform dims — the case plain range-sorting can only
    // cluster one of.
    val df = (0 until 40000).map(_ =>
      (rnd.nextInt(1000000).toLong, rnd.nextInt(1000000).toLong))
      .toDF("x", "y")
    Bucketing.writeZOrdered(df, "/tmp/graft_bspec/zorder", 16, "x", "y")

    val files = new java.io.File("/tmp/graft_bspec/zorder").listFiles()
      .filter(f => f.getName.startsWith("part-")).map(_.getPath).sorted
    assert(files.length === 16)
    val spans = files.map { f =>
      val r = spark.read.parquet(f).agg(
        min(col("x")), max(col("x")), min(col("y")), max(col("y"))).head()
      ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))
    }
    // 16 files ≈ a 4×4 Morton grid: most files cover ~1/4 of each dim.
    // Boundary-crossing z ranges can span 2 cells; assert every file stays
    // well under the full span on BOTH dims (range-sorting one dim would
    // leave the other at ~100%).
    for (((xlo, xhi), (ylo, yhi)) <- spans) {
      assert(xhi - xlo <= 600000L, s"x span too wide: ${(xlo, xhi)}")
      assert(yhi - ylo <= 600000L, s"y span too wide: ${(ylo, yhi)}")
    }
    // A 1/8-width slice on EITHER dim must intersect only a minority of
    // files' min/max ranges — that's the pruning parquet stats deliver.
    val xHit = spans.count { case ((lo, hi), _) => lo <= 125000L && hi >= 0L }
    val yHit = spans.count { case (_, (lo, hi)) => lo <= 125000L && hi >= 0L }
    assert(xHit <= 8, s"x slice should prune, hit $xHit/16 files")
    assert(yHit <= 8, s"y slice should prune, hit $yHit/16 files")
  }

  test("compact merges small files without changing content") {
    val ss = spark
    import ss.implicits._
    val df = (1L to 5000L).map(i => (i, s"row$i")).toDF("id", "nm")
    df.repartition(64).write.mode("overwrite")
      .parquet("/tmp/graft_bspec/compact")
    def nFiles = new java.io.File("/tmp/graft_bspec/compact").listFiles()
      .count(_.getName.startsWith("part-"))
    assert(nFiles === 64)
    val before = Checksum.tableChecksum(
      spark.read.parquet("/tmp/graft_bspec/compact"), Nil,
      Seq(col("id"), col("nm"))).head()
    val total = new java.io.File("/tmp/graft_bspec/compact").listFiles()
      .filter(_.getName.startsWith("part-")).map(_.length()).sum
    val n = Bucketing.compact(spark, "/tmp/graft_bspec/compact", total / 4 + 1)
    assert(n <= 4, s"target math: expected <=4, got $n")
    assert(nFiles <= n && nFiles >= 2,
      s"expected 2..$n compacted files, got $nFiles")
    val after = Checksum.tableChecksum(
      spark.read.parquet("/tmp/graft_bspec/compact"), Nil,
      Seq(col("id"), col("nm"))).head()
    assert(before === after) // order-independent checksum: content identical
    // Re-running with the same target is a no-op (already at/below it).
    assert(Bucketing.compact(spark, "/tmp/graft_bspec/compact",
      total / 4 + 1) === nFiles)
  }

  test("equality filter on the bucket key prunes to one bucket") {
    tables
    // A bare filter has no join/agg to pay for the bucketed scan, so the
    // planner's auto-bucketed-scan opt-out kicks in; disable it to pin the
    // pruning behavior itself.
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val plan = spark.table("bspec_facts").filter(col("k") === 7L)
        .queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
        s"expected bucket pruning, got:\n$plan")
    } finally spark.conf.set(key, old)
  }
}
