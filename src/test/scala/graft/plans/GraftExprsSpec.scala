package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Dedup

/** The codegen'd expressions must be bit-identical to their built-ins-only
  * equivalents, and the duplicated constant families must stay in sync. */
class GraftExprsSpec extends SparkSpec {

  test("MinhashSig constants mirror Dedup's permutation family") {
    assert(MinhashSig.As.toSeq === Dedup.As)
    assert(MinhashSig.Bs.toSeq === Dedup.Bs)
    assert(MinhashSig.P === Dedup.P)
  }

  test("md5_hash32 equals conv(substr(md5(s),1,8),16,10)") {
    GraftExtensions.register(spark)
    val sparkSession = spark
    import sparkSession.implicits._
    val df = Seq("hello", "", "a b c", "ünïcödé 中文").toDF("s")
      .select(Dedup.md5Hash32(col("s")).as("fast"),
        Dedup.md5Hash32Fold(col("s")).as("ref"))
    assert(df.filter(col("fast") =!= col("ref")).count() === 0L)
  }

  test("shingle_hashes equals the declarative chain (as sets)") {
    GraftExtensions.register(spark)
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents").limit(100)
    val both = docs.select(
      array_sort(Dedup.shingleHashes(col("text"))).as("fast"),
      array_sort(Dedup.shingleHashesFold(col("text"))).as("ref"))
    assert(both.filter(col("fast") =!= col("ref")).count() === 0L)
  }

  test("minhash_sig equals the 16 scalar folds") {
    GraftExtensions.register(spark)
    val sparkSession = spark
    import sparkSession.implicits._
    val df = Seq(Seq(1L, 99L, 4000000000L), Seq(7L), Seq.empty[Long]).toDF("hs")
    val folds = (0 until Dedup.NumHashes).map { j =>
      aggregate(col("hs"), lit(Dedup.P), (acc, x) =>
        least(acc, (lit(Dedup.As(j)) * (x % Dedup.P) + Dedup.Bs(j)) % Dedup.P))
    }
    val got = df.select(call_function("minhash_sig", col("hs")).as("fast"),
      array(folds: _*).as("ref"))
    assert(got.filter(col("fast") =!= col("ref")).count() === 0L)
  }
}
