package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntegritySpec extends SparkSpec {

  test("filterCascade telescopes: stage n_in chains from previous n_kept") {
    val sparkSession = spark
    import sparkSession.implicits._
    val df = Seq.tabulate(100)(i => (i.toLong, i % 10)).toDF("id", "m")
    val rows = Integrity.filterCascade(df, Seq(
        "keep_even" -> (col("id") % 2 === 0),     // 50 survive
        "small_mod" -> (col("m") < 4),            // m in {0,2} -> 20 survive
        "id_band" -> (col("id") < 40)))           // ids 0..38 even, m<4 -> 8
      .orderBy("stage")
      .as[(Long, String, Long, Long, Long)].collect()
    assert(rows.map(_._2).toSeq === Seq("keep_even", "small_mod", "id_band"))
    assert(rows(0) === ((1L, "keep_even", 100L, 50L, 50L)))
    assert(rows(1) === ((2L, "small_mod", 50L, 20L, 30L)))
    assert(rows(2) === ((3L, "id_band", 20L, 8L, 12L)))
    // invariants: n_in(i) == n_kept(i-1); n_dropped = n_in - n_kept
    rows.sliding(2).foreach { case Array(a, b) => assert(b._3 === a._4) }
    rows.foreach(r => assert(r._5 === r._3 - r._4))
  }

  test("filterCascade: a stage that kills everything zeroes the tail") {
    val sparkSession = spark
    import sparkSession.implicits._
    val df = Seq.tabulate(10)(i => i.toLong).toDF("id")
    val rows = Integrity.filterCascade(df, Seq(
        "none" -> lit(false), "after" -> (col("id") >= 0)))
      .orderBy("stage").as[(Long, String, Long, Long, Long)].collect()
    assert(rows(0)._4 === 0L)            // nothing survives stage 1
    assert(rows(1) === ((2L, "after", 0L, 0L, 0L)))
  }

  test("filterCascade on an empty frame reports zero rows at every stage") {
    val sparkSession = spark
    import sparkSession.implicits._
    val rows = Integrity.filterCascade(
        Seq.empty[Long].toDF("id"), Seq("a" -> (col("id") > 0), "b" -> lit(true)))
      .orderBy("stage").as[(Long, String, Long, Long, Long)].collect()
    assert(rows.toSeq === Seq((1L, "a", 0L, 0L, 0L), (2L, "b", 0L, 0L, 0L)))
  }

  test("splitLeakage reports exactly the straddling clusters, splits sorted") {
    val sparkSession = spark
    import sparkSession.implicits._
    // cluster 1: docs 1,2 -> train/test (leaky); cluster 2: docs 3,4 ->
    // both train (clean); doc 5: singleton (can't leak by construction).
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 2L), (5L, 5L))
      .toDF("doc_id", "cluster_id")
    val split = when(col("doc_id") === 2L, "test").otherwise("train")
    val out = Integrity.splitLeakage(clusters, split)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(out === Set((1L, 2L, 2L, "test,train")))
  }
}
