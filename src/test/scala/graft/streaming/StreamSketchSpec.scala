package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.plans.GraftExtensions

/** Sketch counters on a STREAM: `count_min_sketch` is a mergeable
  * TypedImperativeAggregate, so a stateful streaming aggregation carries
  * one bounded sketch per group across micro-batches — the streaming face
  * of the CMS counter family (probe with `cms_estimate`, never
  * undercounts). This pins that the per-batch partials actually merge into
  * state instead of resetting per trigger. */
class StreamSketchSpec extends SparkSpec {

  test("complete-mode CMS sketches accumulate across micro-batches") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    GraftExtensions.register(spark)

    val stream = MemoryStream[(String, Long)]
    val agg = stream.toDF().toDF("k", "v")
      .groupBy("k")
      .agg(expr("count_min_sketch(v, 0.001d, 0.99d, 42)").as("sk"),
        count(lit(1)).as("n"))
    val query = agg.writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    try {
      stream.addData(("a", 1L), ("a", 1L), ("a", 2L))
      query.processAllAvailable()
      stream.addData(("a", 1L), ("b", 9L)) // key 1 count crosses batches: 2+1
      query.processAllAvailable()
    } finally query.stop()

    val probed = spark.table("cms_stream")
      .select(col("k"), col("n"),
        expr("cms_estimate(sk, CAST(1 AS BIGINT))").as("est1"),
        expr("cms_estimate(sk, CAST(9 AS BIGINT))").as("est9"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val (na, estA1, _) = probed("a")
    val (nb, _, estB9) = probed("b")
    assert(na === 4L && nb === 1L)
    // CMS never undercounts; with 4-5 items the eps.N overcount is < 1.
    assert(estA1 === 3L, "key 1's count must merge across both batches")
    assert(estB9 === 1L)
  }
}
