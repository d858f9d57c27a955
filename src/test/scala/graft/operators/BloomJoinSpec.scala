package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.plans.GraftExtensions

/** BloomJoin must be EXACTLY the plain semi/anti join (false positives
  * verified away, no false negatives by bloom contract), including NULL-key
  * rows, and the prefilter must actually reject bloom-negative rows before
  * the join. */
class BloomJoinSpec extends SparkSpec {

  private lazy val ss: org.apache.spark.sql.SparkSession = spark

  private def fixture = {
    import ss.implicits._
    val rnd = new scala.util.Random(13)
    // Keys 0..999 on the big side, with some NULLs; key set = 40 keys.
    val big = ((0 until 2000).map(i => (rnd.nextInt(1000).toString, i.toLong)) ++
      Seq((null: String, 9001L), (null: String, 9002L)))
      .toDF("k", "row_id")
    val keys = (0 until 40).map(i => (i * 25).toString).toDF("kk")
    (big, keys)
  }

  test("semiJoin equals the plain left-semi join, NULL keys dropped") {
    GraftExtensions.register(spark)
    val (big, keys) = fixture
    val got = BloomJoin.semiJoin(big, "k", keys, "kk", 1000L, 8192L)
      .select("row_id").collect().map(_.getLong(0)).toSet
    val expected = big.join(keys.withColumnRenamed("kk", "k"), Seq("k"), "left_semi")
      .select("row_id").collect().map(_.getLong(0)).toSet
    assert(got === expected)
    assert(expected.nonEmpty)
  }

  test("antiJoin equals the plain left-anti join, NULL keys kept") {
    GraftExtensions.register(spark)
    val (big, keys) = fixture
    val got = BloomJoin.antiJoin(big, "k", keys, "kk", 1000L, 8192L)
      .select("row_id").collect().map(_.getLong(0)).toSet
    val expected = big.join(keys.withColumnRenamed("kk", "k"), Seq("k"), "left_anti")
      .select("row_id").collect().map(_.getLong(0)).toSet
    assert(got === expected)
    assert(got.contains(9001L) && got.contains(9002L), "NULL keys must survive anti")
  }

  test("bloom probe has no false negatives and nontrivial selectivity") {
    GraftExtensions.register(spark)
    val (big, keys) = fixture
    val bf = BloomJoin.buildFilter(keys, "kk", 1000L, 8192L)
    // Every true member must probe positive…
    val misses = keys.filter(!BloomJoin.mightContain(bf, col("kk"))).count()
    assert(misses === 0L)
    // …and the prefilter must reject a meaningful share of the non-members
    // (40/1000 keys are members; even a sloppy filter keeps well under half).
    val kept = big.na.drop(Seq("k"))
      .filter(BloomJoin.mightContain(bf, col("k"))).count()
    val total = big.na.drop(Seq("k")).count()
    assert(kept.toDouble / total < 0.5,
      s"bloom prefilter rejected too little: kept $kept of $total")
  }
}
