package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** cms_estimate semantics: never undercounts, bounded overcount at the
  * sketch's eps, and partitioning-independent results (counter-wise merge
  * is commutative). */
class CmsEstimateSpec extends SparkSpec {

  private lazy val ss: org.apache.spark.sql.SparkSession = spark

  test("estimates never undercount and stay within eps·N of exact") {
    import ss.implicits._
    GraftExtensions.register(spark)
    val rnd = new scala.util.Random(83)
    val vals = (0 until 20000).map(_ => rnd.nextInt(100).toLong)
    val df = vals.map(Tuple1(_)).toDF("k")
    val sketch = df.agg(
      expr("count_min_sketch(k, 0.001d, 0.99d, 7)").as("sk"))
    val probed = sketch.select(
        (0L until 100L).map(k => expr(s"cms_estimate(sk, ${k}L)").as(s"e$k")): _*)
      .collect().head
    val exact = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (k <- 0 until 100) {
      val est = probed.getLong(k)
      val ex = exact.getOrElse(k.toLong, 0L)
      assert(est >= ex, s"undercount at $k")
      assert(est <= ex + 20L + 1L, s"overcount beyond eps*N at $k: $est vs $ex")
    }
  }

  test("sketch bytes are identical across partitionings (merge commutes)") {
    import ss.implicits._
    GraftExtensions.register(spark)
    val df = (0 until 5000).map(i => (i % 37).toLong).map(Tuple1(_)).toDF("k")
    def bytes(parts: Int): Seq[Byte] =
      df.repartition(parts)
        .agg(expr("count_min_sketch(k, 0.01d, 0.95d, 11)"))
        .collect().head.getAs[Array[Byte]](0).toSeq
    assert(bytes(1) === bytes(13))
  }
}
