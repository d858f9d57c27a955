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

  test("tfIdfTopK: rare repeated terms outrank ubiquitous ones; k/tie contract") {
    val sparkSession = spark
    import sparkSession.implicits._
    val docs = Seq(
      (0L, "spark spark spark common"),
      (1L, "duck duck common"),
      (2L, "common common plain")).toDF("doc_id", "text")
    val got = TextFunctions.tfIdfTopK(docs, numDocs = 3L, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(5)) -> r.getString(1)).toMap
    // 'common' (df=3) loses to the rare df=1 terms despite equal-or-higher tf:
    // doc 0: spark 3·4/2=6 > common 1·4/4=1; doc 1: duck 2·4/2=4 > common 1.
    assert(got((0L, 1L)) === "spark")
    assert(got((1L, 1L)) === "duck")
    // doc 2: common 2·4/4=2.0 TIES plain 1·4/2=2.0 → term asc → common first.
    assert(got((2L, 1L)) === "common")
    assert(got((2L, 2L)) === "plain")
  }

  test("bigramFamiliarityHeldOut: train-only model, OOV tally, no self-score") {
    val sparkSession = spark
    import sparkSession.implicits._
    val docs = Seq(
      (0L, "a b c"),      // train: bigrams "a b", "b c"
      (1L, "a b a b"),    // train: "a b"×2, "b a"
      (2L, "a b x y"),    // scored: "a b" seen(cnt=3→2 bits), others OOV
      (3L, "p q r")       // scored: all OOV → familiarity 0
    ).toDF("doc_id", "text")
    val got = TextFunctions.bigramFamiliarityHeldOut(docs, col("doc_id") <= 1L)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // model counts: "a b"→3, "b c"→1, "b a"→1 (train docs only; doc 2's
    // own "a b" did NOT inflate the model — cnt is 3, not 4).
    assert(got(2L) === ((2L, 3L, 2L, 2L)))  // bits(3)=2; "b x","x y" OOV
    assert(got(3L) === ((3L, 2L, 2L, 0L)))  // every bigram unseen
    assert(!got.contains(0L) && !got.contains(1L)) // train docs not scored
  }

  test("fingerprint is normalization-invariant") {
    val sparkSession = spark
    import sparkSession.implicits._
    val fps = Seq("Foo  Bar", "foo bar", " FOO BAR ").toDF("text")
      .select(TextFunctions.fingerprint(col("text")).as("fp"))
      .collect().map(_.getString(0)).toSet
    assert(fps.size === 1)
  }
test("scriptMix: per-script exact counts on a constructed multiscript doc") {
    val sparkSession = spark
    import sparkSession.implicits._
    val df = Seq(
      (1L, "abc XYZ Привет 中文 مرحب γ 한 ひカ 42!"),
      (2L, "") // empty → all zero
    ).toDF("doc_id", "text")
    val out = TextFunctions.scriptMix(df).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1).map(_.asInstanceOf[Long]))
      .toMap
    // n_chars, latin, cyrillic, han, arabic, greek, hangul, kana, digit
    assert(out(1L) === Seq(33L, 6L, 6L, 2L, 4L, 1L, 1L, 2L, 2L))
    assert(out(2L) === Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
  }

  test("langSegments/langSpans/langDominant: per-sentence ID, span merge, tie-break, gate math") {
    val sparkSession = spark
    import sparkSession.implicits._
    val docs = Seq(
      // en, en, de, en → spans en(2) de(1) en(1); dominant en 750‰.
      (1L, "The cat and the dog sat. The end of the day came. " +
        "Der hund und die katze. The rest of it all."),
      // Single language → one span, 1000‰.
      (2L, "Le chat et le chien. Le bon et les amis."),
      // No markers anywhere → every segment 'und', dominant 'und'.
      (3L, "Nothing here matches. Zilch again truly.")
    ).toDF("doc_id", "text")
    val segs = TextFunctions.langSegments(docs).cache()
    val preds = segs.select("doc_id", "sent_ix", "pred_lang").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(preds((1L, 0L)) === "en" && preds((1L, 2L)) === "de")
    assert(preds((2L, 0L)) === "fr" && preds((2L, 1L)) === "fr")
    assert(preds((3L, 0L)) === "und")
    val spans = TextFunctions.langSpans(segs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3)))).toMap
    assert(spans((1L, 0L)) === (("en", 2L)))
    assert(spans((1L, 1L)) === (("de", 1L)))
    assert(spans((1L, 2L)) === (("en", 1L)))
    assert(spans((2L, 0L)) === (("fr", 2L)))
    val dom = TextFunctions.langDominant(segs)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(dom(1L) === (("en", 4L, 3L, 750L)))
    assert(dom(2L) === (("fr", 2L, 2L, 1000L)))
    assert(dom(3L) === (("und", 2L, 2L, 1000L)))
    // Span extraction salvages the document: dominant-language
    // segments rejoin in DOCUMENT order, the rest drop with counts.
    val kept = TextFunctions.keepDominantSpans(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(kept(1L) === (("The cat and the dog sat. " +
      "The end of the day came. The rest of it all.", 3L, 1L)))
    assert(kept(2L) ===
      (("Le chat et le chien. Le bon et les amis.", 2L, 0L)))
    // Tie-break is deterministic and lexicographic: en(1) + de(1).
    val tie = TextFunctions.langDominant(TextFunctions.langSegments(
      Seq((9L, "The cat and the dog sat. Der hund und die katze."))
        .toDF("doc_id", "text")))
      .collect().map(r => (r.getString(1), r.getLong(4))).head
    assert(tie === (("de", 500L)))
    segs.unpersist()
    ()
  }

  test("sentences: abbreviations, initials, decimals, enders, ellipses") {
    assert(TextFunctions.sentences(
      "Dr. Smith met J. Doe. It cost 3.14 dollars! OK? Yes, etc. done.") ===
      Seq("Dr. Smith met J. Doe.", "It cost 3.14 dollars!", "OK?",
        "Yes, etc. done."))
    // Ellipsis followed by space ends; an !?-run collapses to one split.
    assert(TextFunctions.sentences("Wait... What?! Really.") ===
      Seq("Wait...", "What?!", "Really."))
    // e.g./i.e. (dotted abbrevs) hold; a digit word splits ('5.' is not
    // an initial).
    assert(TextFunctions.sentences("Use tools, e.g. a saw. Cut at No. 5. Done.") ===
      Seq("Use tools, e.g. a saw.", "Cut at No. 5.", "Done."))
    // No trailing punctuation: the tail still emits; blanks drop.
    assert(TextFunctions.sentences("One. And two") === Seq("One.", "And two"))
    assert(TextFunctions.sentences("   ") === Nil)
    assert(TextFunctions.sentences(null) === Nil)
  }
}
