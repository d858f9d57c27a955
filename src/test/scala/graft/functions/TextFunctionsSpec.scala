package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Dedup

class TextFunctionsSpec extends SparkSpec {

  private def one(expr: org.apache.spark.sql.Column, input: String): Any = {
    val sparkSession = spark
    import sparkSession.implicits._
    Seq(input).toDF("text").select(expr.as("x")).head().get(0)
  }

  test("normalize: lowercase, collapse whitespace, trim") {
    assert(one(TextFunctions.normalize(col("text")), "  Foo\t\tBAR  baz\n") === "foo bar baz")
  }

  test("wordNgrams edge cases: shorter than n yields empty, exact n yields one") {
    val sparkSession = spark
    import sparkSession.implicits._
    val df = Seq("one", "a b", "a b c").toDF("text")
      .select(size(TextFunctions.wordNgrams(col("text"), 3)).as("n"))
    assert(df.collect().map(_.getInt(0)).toSeq === Seq(0, 0, 1))
  }

  test("markerHits counts word-boundary occurrences only") {
    assert(one(TextFunctions.markerHits(col("text"), " the "), "the cat the theater") === 2L)
    assert(one(TextFunctions.markerHits(col("text"), " the "), "nothing") === 0L)
  }

  test("langPredict: argmax with declaration-order tie-break, und when silent") {
    assert(one(TextFunctions.langPredict(col("text")), "the cat and the hat of x") === "en")
    assert(one(TextFunctions.langPredict(col("text")), "der hund und die katze") === "de")
    assert(one(TextFunctions.langPredict(col("text")), "xyzzy plugh") === "und")
    // One hit each for en and de → en wins (listed first).
    assert(one(TextFunctions.langPredict(col("text")), "the und") === "en")
  }

  test("shingleHashes: distinct 3-shingles, values in 32-bit range") {
    val sparkSession = spark
    import sparkSession.implicits._
    graft.plans.GraftExtensions.register(spark)
    val hs = Seq("a b c d a b c d").toDF("text")
      .select(Dedup.shingleHashes(col("text")).as("hs"))
      .head().getSeq[Long](0)
    // 6 shingle positions but only 4 distinct shingles (a b c, b c d, c d a, d a b).
    assert(hs.size === 4)
    assert(hs.forall(h => h >= 0 && h <= 0xffffffffL))
  }

  test("fingerprint is normalization-invariant") {
    val sparkSession = spark
    import sparkSession.implicits._
    val fps = Seq("Foo  Bar", "foo bar", " FOO BAR ").toDF("text")
      .select(TextFunctions.fingerprint(col("text")).as("fp"))
      .collect().map(_.getString(0)).toSet
    assert(fps.size === 1)
  }
}
