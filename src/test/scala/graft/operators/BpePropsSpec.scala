package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** ScalaCheck cross-check for BPE training: random corpora over a tiny
  * alphabet (forcing heavy pair-count ties and overlapping runs) trained
  * distributed, pinned against an in-memory single-threaded reference.
  * Catches distribution bugs — weight summing, argmax tie-breaks under
  * partitioning, fold application order. Deterministic seeds. */
class BpePropsSpec extends SparkSpec {

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("scalacheck sampling failed"))

  private def refTrain(words: Map[String, Long], k: Int)
      : (Seq[Bpe.Merge], Map[String, Long]) = {
    var seqs: Map[String, Vector[String]] =
      words.keysIterator.map(w => w -> w.map(_.toString).toVector).toMap
    val merges = Seq.newBuilder[Bpe.Merge]
    var rank = 1L
    var done = false
    while (rank <= k && !done) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, toks) <- seqs; i <- 0 until toks.size - 1)
        pc.updateWith((toks(i), toks(i + 1)))(c => Some(c.getOrElse(0L) + words(w)))
      if (pc.isEmpty) done = true
      else {
        val ((l, r), cnt) = pc.minBy { case ((l, r), c) => (-c, l, r) }
        merges += Bpe.Merge(rank, l, r, cnt)
        seqs = seqs.map { case (w, toks) =>
          w -> toks.foldLeft(Vector.empty[String]) { (acc, t) =>
            if (acc.nonEmpty && acc.last == l && t == r) acc.init :+ (l + r)
            else acc :+ t
          }
        }
        rank += 1
      }
    }
    val vocab = seqs.toSeq.flatMap { case (w, toks) => toks.map(_ -> words(w)) }
      .groupMapReduce(_._1)(_._2)(_ + _)
    (merges.result(), vocab)
  }

  test("train + vocab match the in-memory reference on random corpora") {
    val sparkSession = spark
    import sparkSession.implicits._
    for (seed <- 1L to 4L) {
      // Words over {a, b} of length 1-6: maximal tie pressure and lots of
      // overlapping-run cases ("ababa", "aaaa").
      val docs = sample(Gen.listOfN(30,
        Gen.listOfN(6, Gen.chooseNum(1, 6).flatMap(n =>
          Gen.listOfN(n, Gen.oneOf('a', 'b')).map(_.mkString)))
          .map(_.mkString(" "))), seed)
      val df = docs.toDF("text").repartition(3)
      val words = docs.flatMap(_.split("\\s+")).filter(_.nonEmpty)
        .groupMapReduce(identity)(_ => 1L)(_ + _)
      val (wantMerges, wantVocab) = refTrain(words, k = 3)
      val (gotMerges, toks) = Bpe.train(df, k = 3)
      assert(gotMerges === wantMerges, s"merges, seed $seed")
      val gotVocab = Bpe.vocab(toks)
        .as[(String, Long)].collect().toMap
      assert(gotVocab === wantVocab, s"vocab, seed $seed")
      // The in-memory vocabulary-scale path must be merge-for-merge and
      // vocab-for-vocab identical to the distributed loop.
      val (localMerges, localToks) = Bpe.trainLocal(df, k = 3)
      assert(localMerges === wantMerges, s"local merges, seed $seed")
      assert(Bpe.vocab(localToks).as[(String, Long)].collect().toMap
        === wantVocab, s"local vocab, seed $seed")
    }
  }

  test("trainLocal runs deep merge counts and minWeight prunes training") {
    val sparkSession = spark
    import sparkSession.implicits._
    // Deep induction (k far beyond the distributed loop's sweet spot):
    // every word collapses to a single token once k covers the vocabulary.
    val docs = (1 to 50).map(i => s"alpha beta gamma delta epsilon").toDF("text")
    val (merges, toks) = Bpe.trainLocal(docs, k = 1000)
    assert(merges.nonEmpty && merges.size < 1000) // exhausts, stops early
    val lens = toks.selectExpr("size(toks)").as[Int].collect()
    assert(lens.forall(_ == 1)) // fully merged vocabulary
    // minWeight excludes rare words from training entirely.
    val skewed = (Seq.fill(9)("aa bb") :+ "zz").toDF("text")
    val (_, tok2) = Bpe.trainLocal(skewed, k = 5, minWeight = 2L)
    val trainedWords = tok2.select("word").as[String].collect().toSet
    assert(trainedWords === Set("aa", "bb"))
  }
}
