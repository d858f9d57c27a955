package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.plans.{GraftExtensions, Md5Hash32}
import org.apache.spark.unsafe.types.UTF8String

/** ScalaCheck cross-checks for [[Retrieval]]: random corpora over a tiny
  * vocabulary (forcing tf/df ties, shared ranks, and margin collisions)
  * run distributed and pinned against in-memory single-threaded
  * references of the exact arithmetic. Catches distribution bugs — the
  * decimal-sum order independence, rank tie-breaks under partitioning,
  * histogram prefix sums. Deterministic seeds. */
class RetrievalPropsSpec extends SparkSpec {
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("scalacheck sampling failed"))

  private val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg")
  private val corpusGen: Gen[Seq[String]] = for {
    nDocs <- Gen.choose(3, 25)
    docs <- Gen.listOfN(nDocs, for {
      len <- Gen.choose(1, 30)
      ws <- Gen.listOfN(len, Gen.oneOf(vocab))
    } yield ws.mkString(" "))
  } yield docs

  /** The exact integer BM25 re-derived in memory (same as RetrievalSpec's
    * brute, kept independent of the production code). */
  private def refBm25(corpus: Seq[(Long, String)], terms: Seq[String])
      : Map[Long, BigDecimal] = {
    val toks = corpus.map { case (id, t) => id -> t.trim.split("\\s+").toSeq }
    val n = toks.size.toLong
    val s = toks.map(_._2.size.toLong).sum
    val df = terms.map(t => t -> toks.count(_._2.contains(t)).toLong).toMap
    def bl(x: Long) = java.lang.Long.toBinaryString(x).length.toLong
    toks.flatMap { case (id, ws) =>
      val dl = ws.size.toLong
      val scores = terms.flatMap { t =>
        val tf = ws.count(_ == t).toLong
        if (tf == 0) None else {
          val idf = bl(n) - bl(df(t)) + 1
          Some(BigDecimal((idf * 22L * s * tf).toDouble /
              (10L * s * tf + 3L * s + 9L * n * dl).toDouble)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP))
        }
      }
      if (scores.isEmpty) None else Some(id -> scores.sum)
    }.toMap
  }

  test("bm25TopK equals the in-memory reference on random corpora (incl. full ranking)") {
    for (seed <- 1L to 8L) {
      val texts = sample(corpusGen, seed)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val terms = Seq("aa", "dd", "gg")
      val want = refBm25(docs, terms)
      val got = Retrieval
        .bm25TopK(docs.toDF("doc_id", "text"), terms, topN = docs.size + 1)
        .collect().map(r => r.getLong(0) -> (r.getDouble(3), r.getLong(4))).toMap
      assert(got.keySet === want.keySet, s"seed $seed: matched-doc sets differ")
      got.foreach { case (id, (score, _)) =>
        assert(BigDecimal(score) === want(id), s"seed $seed doc $id") }
      // Ranks: dense 1..k under (score desc, doc_id asc).
      val expectOrder = want.toSeq.sortBy { case (id, sc) => (-sc, id) }.map(_._1)
      val gotOrder = got.toSeq.sortBy(_._2._2).map(_._1)
      assert(gotOrder === expectOrder, s"seed $seed: rank order differs")
    }
  }

  test("scorePercentiles: distribution-free invariants on random margins") {
    GraftExtensions.register(spark)
    for (seed <- 1L to 6L) {
      val texts = sample(corpusGen, 100 + seed)
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
        .select(col("doc_id"), Retrieval.marginOf(col("text")).as("margin"))
      // Output columns: (margin, doc_id, pct) — join key first.
      val got = Retrieval.scorePercentiles(df).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val n = got.length
      // Σ pct = Σ midrank / N = (N+1)/2 exactly (up to the 6-dp rounding).
      val sum = got.map(_._3).map(BigDecimal(_)).sum
      assert((sum - BigDecimal(n + 1) / 2).abs <= BigDecimal("0.000001") * n,
        s"seed $seed: midranks must sum to (N+1)/2, got $sum for n=$n")
      // pct ∈ (0, 1]; equal margins ⇒ equal pct; higher margin ⇒ higher pct.
      assert(got.forall(r => r._3 > 0.0 && r._3 <= 1.0))
      val byMargin = got.groupBy(_._1).view.mapValues(_.map(_._3).distinct).toMap
      assert(byMargin.values.forall(_.size == 1), s"seed $seed: tie pct differs")
      val ordered = byMargin.toSeq.sortBy(_._1).map(_._2.head)
      assert(ordered === ordered.sorted, s"seed $seed: pct not monotone in margin")
    }
  }

  test("classifierAuc is invariant under any monotone score transform") {
    // AUC depends only on the order statistics: margin -> 3*margin + 7
    // must give the identical AUC row (n_pos/n_neg/auc unchanged).
    GraftExtensions.register(spark)
    val texts = sample(corpusGen, 42L)
    val base = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select((length(col("text")) >= 60).as("label"),
        Retrieval.marginOf(col("text")).as("margin"))
    val a = Retrieval.classifierAuc(base).head()
    val b = Retrieval.classifierAuc(
      base.withColumn("margin", col("margin") * 3L + 7L)).head()
    assert(a.getLong(0) === b.getLong(0))
    assert(a.getLong(1) === b.getLong(1))
    assert((a.isNullAt(3) && b.isNullAt(3)) ||
      a.getDouble(3) === b.getDouble(3))
    // And flipping the score sign must reflect the AUC around 1/2.
    val c = Retrieval.classifierAuc(
      base.withColumn("margin", -col("margin"))).head()
    if (!a.isNullAt(3))
      assert(math.abs((a.getDouble(3) + c.getDouble(3)) - 1.0) < 2e-6,
        s"AUC(-score) must be 1 - AUC(score): ${a.getDouble(3)} vs ${c.getDouble(3)}")
  }

  test("hashedLinearMargin distributes over concatenation (fold linearity)") {
    GraftExtensions.register(spark)
    def weight(w: String): Long =
      ((Md5Hash32.hash(UTF8String.fromString(w)) % 1024L) % 21L) - 10L
    val texts = sample(corpusGen, 7L)
    val pairs = texts.grouped(2).collect { case Seq(x, y) => (x, y) }.toSeq
    if (pairs.nonEmpty) {
      val joined = pairs.zipWithIndex
        .map { case ((x, y), i) => (i.toLong, s"$x $y", "xx") }
        .toDF("doc_id", "text", "lang")
      val got = Retrieval.hashedLinearMargin(joined).collect()
        .map(r => r.getLong(0) -> r.getLong(3)).toMap
      pairs.zipWithIndex.foreach { case ((x, y), i) =>
        val expect = (x.trim.split("\\s+") ++ y.trim.split("\\s+"))
          .map(weight).sum
        assert(got(i.toLong) === expect, s"pair $i")
      }
    }
  }
}
