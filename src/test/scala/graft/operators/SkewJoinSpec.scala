package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Salted-join invariants: output is exactly the plain inner join on skewed
  * data, the hot key genuinely spreads across salt lanes, and the salt stays
  * deterministic across re-evaluation. */
class SkewJoinSpec extends SparkSpec {

  private lazy val ss: org.apache.spark.sql.SparkSession = spark

  test("salted join equals the plain join on 90%-hot-key data") {
    import ss.implicits._
    val rnd = new scala.util.Random(41)
    // 90% of rows share key 0 — the shape that melts one task unsalted.
    val big = (0 until 3000).map(i =>
      (if (rnd.nextInt(10) < 9) 0L else rnd.nextInt(20).toLong, i.toLong))
      .toDF("k", "id")
    val small = (0 until 20).map(k => (k.toLong, s"d_$k")).toDF("k", "name")
    val salted = SkewJoin.saltedJoin(big, small, Seq("k"), 4, Seq("id"))
      .select("k", "id", "name").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val plain = big.join(small, "k")
      .select("k", "id", "name").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted === plain)
    assert(plain.size === 3000)
  }

  test("the hot key actually spreads over multiple salt lanes AND partitions") {
    import ss.implicits._
    val big = (0 until 1000).map(i => (0L, i.toLong)).toDF("k", "id")
    // The operator's own salt derivation fans a single key over all lanes…
    val lanes = big
      .withColumn("_salt", SkewJoin.saltColumn(Seq("id"), 4))
      .select("_salt").distinct().count()
    assert(lanes === 4L)
    // …and the joined output physically lands on >1 shuffle partition (the
    // unsalted join would put every hot-key row in ONE task).
    val small = Seq((0L, "d")).toDF("k", "name")
    val parts = SkewJoin.saltedJoin(big, small, Seq("k"), 4, Seq("id"))
      .withColumn("p", spark_partition_id())
      .select("p").distinct().count()
    assert(parts > 1L, "hot key stayed on one partition")
  }

  test("salt assignment is deterministic across evaluations") {
    import ss.implicits._
    val big = (0 until 500).map(i => (i.toLong % 7L, i.toLong)).toDF("k", "id")
    val salted = big.withColumn("_salt", SkewJoin.saltColumn(Seq("id"), 4))
    val a = salted.collect().map(r => (r.getLong(1), r.getInt(2))).toMap
    val b = salted.repartition(7).collect()
      .map(r => (r.getLong(1), r.getInt(2))).toMap
    assert(a === b)
  }
}
