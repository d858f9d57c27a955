package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.SparkSpec

/** Semantics of the LM-scoring / importance-weighting family on small
  * hand-built corpora where the exact scores are checkable by hand —
  * the DuckDB oracle already pins the fixture values; these pin the MATH. */
class LmPackSpec extends SparkSpec {

  private def docs(rows: (Long, String, String, String)*) = {
    val sparkSession = spark
    import sparkSession.implicits._
    rows.toDF("doc_id", "text", "lang", "source")
  }

  test("conditionalCrossent: score is Σ(bitlen c12 − bitlen c1), always ≤ 0") {
    // Train docs (ids chosen so the hash split puts them there is NOT
    // assumed — pass an explicit membership column instead).
    val d = docs(
      (1L, "a b a b a c", "en", "s"), // train: bigrams ab, ba, ab, ba, ac
      (2L, "a b x y", "en", "s"))     // scored: ab known, bx/xy OOV
    val out = TextFunctions.conditionalCrossent(d, col("doc_id") === 1L)
      .collect()
    assert(out.length === 1)
    val Row(id: Long, nb: Long, oov: Long, score: Long) = out.head
    assert(id === 2L && nb === 3L && oov === 2L)
    // Model: c(ab)=2, c(ba)=2, c(ac)=1; contexts: c(a·)=3, c(b·)=2.
    // Doc 2's known bigram ab: bitlen(2) − bitlen(3) = 2 − 2 = 0.
    assert(score === 0L)
  }

  test("conditionalCrossent: rarer continuation scores lower than common one") {
    // c(a b)=3, c(a c)=1 under context c(a·)=4: 'a b' text scores
    // 3·(bitlen 3 − bitlen 4) = −3, 'a c' text 3·(bitlen 1 − bitlen 4) = −6.
    val d = docs(
      (1L, "a b a b a b a c", "en", "s"),
      (2L, "a b a b a b a b", "en", "s"),
      (3L, "a c a c a c a c", "en", "s"))
    val out = TextFunctions.conditionalCrossent(d, col("doc_id") === 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(2L) > out(3L), s"common continuation must outscore rare: $out")
    assert(out.values.forall(_ <= 0L), s"conditional score must be ≤ 0: $out")
  }

  test("importanceWeights: target-like docs weigh higher than corpus-typical") {
    // Target source speaks 'p q'; the rest of the corpus speaks 'x y'.
    // A non-target doc written in target language must outweigh a typical one.
    val d = docs(
      (1L, "p q p q p q", "en", "tgt"),
      (2L, "p q p q p q", "en", "tgt"),
      (3L, "p q p q p q", "en", "raw"), // target-like
      (4L, "x y x y x y", "en", "raw"),
      (5L, "x y x y x y", "en", "raw"),
      (6L, "x y x y x y", "en", "raw"))
    val out = TextFunctions.importanceWeights(d, col("source") === "tgt")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out.keySet === Set(3L, 4L, 5L, 6L))
    assert(out(3L) > out(4L),
      s"target-like doc must carry the higher importance weight: $out")
  }

  test("importanceWeights: weight bounded by ±(bitlen range) per bigram") {
    // Every per-bigram contribution is bitlen(tc+1) − bitlen(rc+1) with
    // 0 ≤ tc ≤ rc, so each term is ≤ 0 when the doc is its bigrams' only
    // evidence... in general |weight| ≤ n_bigrams · 63. Sanity-check the
    // aggregate bound on a mixed corpus.
    val d = docs(
      (1L, "p q r s", "en", "tgt"),
      (2L, "p q x y p q", "en", "raw"),
      (3L, "u v w z", "en", "raw"))
    val rows = TextFunctions.importanceWeights(d, col("source") === "tgt").collect()
    rows.foreach { r =>
      val (nb, wt) = (r.getLong(2), r.getLong(3))
      assert(math.abs(wt) <= nb * 63, s"per-bigram bitlen bound violated: $r")
    }
  }

  test("q_pmi_topk fixture query: exclusive pairs outrank promiscuous ones") {
    // On the real fixture the oracle pins values; here pin the ORDERING
    // property PMI must induce: a bigram whose words appear only together
    // outranks one whose words are spread across many contexts.
    val sparkSession = spark
    import sparkSession.implicits._
    val text = (Seq.fill(6)("alpha beta") ++ // exclusive pair
      Seq.fill(6)("the cat") ++ Seq.fill(6)("the dog") ++
      Seq.fill(6)("the fish")).mkString(" ")
    // One doc; q_pmi_topk is driven through LmPack.queries on a temp dir.
    val dir = java.nio.file.Files.createTempDirectory("lm_pmi").toString
    Seq((1L, text, "en", "s")).toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = LmPack.queries("q_pmi_topk")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(out.contains("alpha beta"))
    assert(out("alpha beta") < out.getOrElse("the cat", Long.MaxValue),
      s"exclusive collocation must outrank shared-context pair: $out")
  }
}
