package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.plans.GraftExtensions

/** Curation semantics: the hash gate must be a pure function of (salt, id) —
  * reproducible across partitionings, independent across salts — and the
  * pipeline's gates must compose as documented. */
class CurationSpec extends SparkSpec {

  private def docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")

  test("stratified sample is deterministic across partitionings and runs") {
    GraftExtensions.register(spark)
    val rates = Map("en" -> 0.5, "de" -> 0.25)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val base = ids(Curation.sampleStratified(docs, rates))
    assert(base === ids(Curation.sampleStratified(docs.repartition(7), rates)))
    assert(base === ids(Curation.sampleStratified(docs.coalesce(1), rates)))
    // Strata without a rate are dropped entirely.
    val langs = Curation.sampleStratified(docs, rates)
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "de")))
  }

  test("sample rate lands near the target and weights are 1/rate") {
    GraftExtensions.register(spark)
    val rates = Map("en" -> 0.5)
    val en = docs.filter(col("lang") === "en")
    val total = en.count().toDouble
    val sampled = Curation.sampleStratified(en, rates)
    val frac = sampled.count() / total
    assert(frac > 0.3 && frac < 0.7, s"0.5-gate kept $frac")
    assert(sampled.select("weight").distinct().collect()
      .map(_.getDouble(0)).toSeq === Seq(2.0))
  }

  test("different salts give independent (non-identical) samples") {
    GraftExtensions.register(spark)
    val rates = Map("en" -> 0.5)
    def ids(salt: String) =
      Curation.sampleStratified(docs.filter(col("lang") === "en"), rates, salt = salt)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val a = ids("mix")
    val b = ids("heldout")
    assert(a !== b)
    assert((a & b).nonEmpty) // overlap ≈ rate² > 0 at fixture size
  }

  test("temperature sampling: exact ⌊√n⌋-derived gates, α-upweighting, stable") {
    GraftExtensions.register(spark)
    val s = spark; import s.implicits._
    // Skewed strata: 400 "hi" docs vs 25 "lo" docs.
    val corpus = ((1L to 400L).map(i => (i, "hi")) ++
      (401L to 425L).map(i => (i, "lo"))).toDF("doc_id", "lang")
    val out = Curation.sampleTemperature(corpus, targetDocs = 100L)
    val gates = out.select("lang", "n_strat", "gate_num").distinct()
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // w_hi=⌊√400⌋=20, w_lo=⌊√25⌋=5, Σw=25:
    //   hi: (100·20·10⁶) div (25·400) = 200000 (20% keep)
    //   lo: (100·5·10⁶)  div (25·25)  = 800000 (80% keep — upweighted)
    assert(gates === Map("hi" -> ((400L, 200000L)), "lo" -> ((25L, 800000L))))
    // Pure function of the data: partitioning-invariant.
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(out) === ids(
      Curation.sampleTemperature(corpus.repartition(7), targetDocs = 100L)))
    // A stratum bigger than its target cap clamps at the denominator.
    val tiny = Seq((1L, "x")).toDF("doc_id", "lang")
    val g = Curation.sampleTemperature(tiny, targetDocs = 10L)
      .select("gate_num").head().getLong(0)
    assert(g === Curation.SampleDenom)
  }

  test("repetition: planted duplicate words move the fractions") {
    GraftExtensions.register(spark)
    val sparkSession = spark
    import sparkSession.implicits._
    val tiny = Seq(
      (0L, "a a a a"),              // 1 distinct of 4 → dup 0.75; bigrams all "a a"
      (1L, "one two three four"),   // all distinct → dup 0
      (2L, "solo")                  // 1 word → 0 bigrams, null bigram frac
    ).toDF("doc_id", "text")
    val r = Curation.repetition(tiny).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(0L).getDouble(2) === 0.75)
    assert(r(0L).getDouble(4) === (1d - 1d / 3d))
    assert(r(1L).getDouble(2) === 0.0)
    assert(r(1L).getDouble(4) === 0.0)
    assert(r(2L).getInt(3) === 0)
    assert(r(2L).isNullAt(4))
  }

  test("duplicateUnitStats: hand-computed line duplication by count and char mass") {
    GraftExtensions.register(spark)
    val sparkSession = spark
    import sparkSession.implicits._
    val tiny = Seq(
      // 4 lines: "ab" ×2 (2 chars each), "cde", "f" — 1 non-first
      // occurrence of 4 units, 2 of 8 chars.
      (0L, "ab\ncde\nab\nf"),
      // all distinct → zero dups
      (1L, "x\ny\nz"),
      // empty/whitespace lines dropped; the two "hi" survive
      (2L, "hi\n\n  \nhi"),
      // nothing but separators → doc drops out entirely
      (3L, "\n\n")
    ).toDF("doc_id", "text")
    val r = Curation.duplicateUnitStats(tiny).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(0L).getLong(1) === 4L) // n_units
    assert(r(0L).getLong(2) === 1L) // dup_units
    assert(r(0L).getDouble(3) === 0.25)
    assert(r(0L).getLong(4) === 8L) // unit_chars: 2+3+2+1
    assert(r(0L).getLong(5) === 2L) // dup chars: one extra "ab"
    assert(r(0L).getDouble(6) === 0.25)
    assert(r(1L).getLong(2) === 0L)
    assert(r(1L).getDouble(6) === 0.0)
    assert(r(2L).getLong(1) === 2L)
    assert(r(2L).getLong(2) === 1L)
    assert(!r.contains(3L))
    // Paragraph mode is the same operator at the published separator.
    val para = Curation.duplicateUnitStats(
      Seq((9L, "p one\n\np two\n\np one")).toDF("doc_id", "text"),
      sepRegex = "\n{2,}").collect().head
    assert(para.getLong(1) === 3L)
    assert(para.getLong(2) === 1L)
    assert(para.getLong(5) === 5L) // "p one" repeated: 5 chars
  }

  test("topNgramCharFrac: argmax, deterministic tie-break, short docs drop") {
    GraftExtensions.register(spark)
    val sparkSession = spark
    import sparkSession.implicits._
    val tiny = Seq(
      // "a b" ×2 is the top bigram (others ×1); norm len 9
      (0L, "a b c a b"),
      // every bigram ×1 → ties; the lexicographically largest wins
      (1L, "x y z"),
      (2L, "solo") // < 2 words → no rows
    ).toDF("doc_id", "text")
    val r = Curation.topNgramCharFrac(tiny, ns = Seq(2)).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(0L).getString(2) === "a b")
    assert(r(0L).getLong(3) === 2L)
    assert(r(0L).getLong(4) === 6L) // 2 × len("a b")
    assert(r(0L).getDouble(5) === 6.0 / 9) // norm "a b c a b" = 9 chars
    assert(r(1L).getString(2) === "y z") // tie-break: largest string
    assert(!r.contains(2L))
    // Overlapping occurrences can push the fraction past 1 — the signal
    // the filter exists for.
    val rep = Curation.topNgramCharFrac(
      Seq((7L, "w w w w w")).toDF("doc_id", "text"), ns = Seq(2))
      .collect().head
    assert(rep.getLong(3) === 4L) // "w w" ×4 in 9 chars
    assert(rep.getDouble(5) === 12.0 / 9)
  }

  test("curate keeps only dedup representatives that pass every gate") {
    GraftExtensions.register(spark)
    val sparkSession = spark
    import sparkSession.implicits._
    val body = (1 to 30).map(i => s"w$i").mkString(" ") // 30 distinct words
    val tiny = Seq(
      (0L, body, "en"),            // representative, passes
      (1L, body, "en"),            // exact dup of 0 → dropped by keep-list
      (2L, "too short", "en"),     // fails minWords
      (3L, body + " " + body, "en") // dup_word_frac ≈ 0.5 < 0.6 → passes
    ).toDF("doc_id", "text", "lang")
    val rules = Curation.CurationRules(
      minWords = 20, minChars = 10L, maxChars = 10000L,
      maxDupWordFrac = 0.6, langRates = Map("en" -> 1.0))
    val kept = Curation.curate(tiny, rules)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(0L, 3L))
    // Default rules (no langRates) = every gated doc kept at weight 1.0.
    val defaulted = Curation.curate(tiny, rules.copy(langRates = Map.empty))
    assert(defaulted.select("doc_id").collect().map(_.getLong(0)).toSet === Set(0L, 3L))
    assert(defaulted.select("weight").distinct().collect()
      .map(_.getDouble(0)).toSeq === Seq(1.0))
  }

  test("splitOf is exhaustive, disjoint, deterministic, near the fractions") {
    GraftExtensions.register(spark)
    val sparkSession = spark
    import sparkSession.implicits._
    val ids = (0 until 20000).map(i => Tuple1(i.toLong)).toDF("doc_id")
    val split = Curation.splitOf(col("doc_id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    // Exhaustive + disjoint by construction: one label per row, never null.
    val counts = ids.groupBy(split.as("s")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set("train", "val", "test"))
    assert(counts.values.sum === 20000L)
    assert(math.abs(counts("train") - 16000L) < 500L)
    assert(math.abs(counts("val") - 2000L) < 300L)
    // Deterministic under any partitioning.
    val a = ids.select(col("doc_id"), split.as("s")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = ids.repartition(17).select(col("doc_id"), split.as("s")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)
  }

  test("curriculumBuckets: total-order ntile — even fill, tie-stable") {
    val sparkSession = spark
    import sparkSession.implicits._
    // 10 docs, one stratum, scores with a 4-way tie at 5.
    val docs = Seq((1L, 3L), (2L, 5L), (3L, 5L), (4L, 5L), (5L, 5L),
      (6L, 1L), (7L, 9L), (8L, 2L), (9L, 7L), (10L, 4L))
      .toDF("doc_id", "n")
      .withColumn("lang", lit("en"))
    val out = Curation.curriculumBuckets(docs, n = 5, strataCol = "lang",
        score = col("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // ntile(5) over 10 rows = 2 per bucket; order (score, id) breaks the
    // tie deterministically: 6,8 | 1,10 | 2,3 | 4,5 | 9,7.
    assert(out === Map(6L -> 1L, 8L -> 1L, 1L -> 2L, 10L -> 2L,
      2L -> 3L, 3L -> 3L, 4L -> 4L, 5L -> 4L, 9L -> 5L, 7L -> 5L))
  }

  test("sampleExactK: exact quota, rerun- and partitioning-stable") {
    val sparkSession = spark
    import sparkSession.implicits._
    val docs = (1L to 500L).map(i => (i, if (i % 5 == 0) "de" else "en"))
      .toDF("doc_id", "lang")
    val out = Curation.sampleExactK(docs, k = 10, strataCol = "lang")
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("en" -> 10L, "de" -> 10L))
    // Small stratum: quota caps at the stratum size.
    val tiny = Curation.sampleExactK(docs.filter(col("doc_id") <= 7), k = 10,
      strataCol = "lang")
    assert(tiny.count() === 7L)
    // Stable under repartitioning (hash draw, not RNG).
    val a = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Curation.sampleExactK(docs.repartition(13), k = 10,
      strataCol = "lang").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b)
  }

  test("connected components / clusters over an empty corpus return empty, no NPE") {
    GraftExtensions.register(spark)
    val sparkSession = spark
    import sparkSession.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.clusters(empty, threshold = 0.5).count() === 0L)
  }

  test("lengthOutliers: integer cross-multiplied bounds, strata independent") {
    val sparkSession = spark
    import sparkSession.implicits._
    // en: mean 100 → long > 150, short < 50. fr: mean 10 → bounds 15 / 5.
    val docs = Seq(
      (1L, "en", 100L), (2L, "en", 151L), (3L, "en", 49L),
      (4L, "en", 150L),                  // exactly 1.5× mean: NOT an outlier
      (5L, "fr", 10L), (6L, "fr", 16L), (7L, "fr", 4L)
    ).toDF("doc_id", "lang", "len")
    // Means shift once outliers are in the data; recompute like the op does:
    // en n=4 sum=450 → long: len·4·2 > 3·450 ⇔ len > 168.75; short: len·8 < 450.
    // fr n=3 sum=30 → long: len·6 > 90 ⇔ len > 15; short: len·6 < 30 ⇔ len < 5.
    val got = Curation.lengthOutliers(docs, "len", "lang", 3L, 2L, 1L, 2L)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("outlier")))
      .toSet
    assert(got === Set((3L, "short"), (6L, "long"), (7L, "short")))
  }

  test("winsorize clamps to in-data order statistics per stratum") {
    val sparkSession = spark
    import sparkSession.implicits._
    // Stratum a: values 1..20 → p05 = rank ⌈20/20⌉ = 1 → 1, p95 = rank 19 → 19.
    // Stratum b: 100..104 → p05 = rank 1 → 100, p95 = rank ⌈5·19/20⌉=5 → 104.
    val rows = (1L to 20L).map(v => ("a", v)) ++ (100L to 104L).map(v => ("b", v))
    val got = Curation.winsorize(rows.toDF("g", "v"), Seq("g"), "v",
        lo = (1L, 20L), hi = (19L, 20L))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got(("a", 20L)) === 19L) // clamped down to p95
    assert(got(("a", 1L)) === 1L)   // at the lower bound, untouched
    assert(got(("a", 10L)) === 10L)
    assert(got(("b", 100L)) === 100L)
    assert(got(("b", 104L)) === 104L) // p95 IS the max here — no clamp
  }

  test("samplePps: deterministic, matches the integer inclusion rule exactly") {
    GraftExtensions.register(spark)
    val sparkSession = spark
    import sparkSession.implicits._
    // Weights 1..200: W = 20100; k = 30 → inclusion prob ≈ 30·w/20100.
    val rows = (1L to 200L).map(i => (i, i))
    val df = rows.toDF("doc_id", "w")
    val got = Curation.samplePps(df, "w", k = 30L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // Reference: replay the md5 gate in memory with the same BigInt math.
    val md = java.security.MessageDigest.getInstance("MD5")
    def draw(id: Long): Long = {
      val hex = md.digest(s"pps:$id".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % Curation.SampleDenom
    }
    val W = rows.map(_._2).sum
    val expect = rows.filter { case (id, w) =>
      BigInt(draw(id)) * W < BigInt(30L) * w * Curation.SampleDenom
    }.map { case (id, w) =>
      id -> math.min(1000L, 1000L * 30L * w / W)
    }.toMap
    assert(got === expect)
    // Partitioning-invariant (pure function of the data).
    val again = Curation.samplePps(df.repartition(13), "w", k = 30L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(again === got)
    // High weights are favored: the kept set's mean weight exceeds the
    // population's (PPS's defining property).
    val keptMean = got.keySet.map(id => rows(id.toInt - 1)._2).sum.toDouble / got.size
    assert(keptMean > 100.5, s"PPS kept mean $keptMean not above uniform mean")
    // Zero/negative weights are a loud error, not silent exclusion.
    intercept[IllegalArgumentException] {
      Curation.samplePps(Seq((1L, 0L)).toDF("doc_id", "w"), "w", k = 5L)
    }
  }

  test("budgetWaterfill: exact budget, caps respected, water level levels") {
    val sparkSession = spark
    import sparkSession.implicits._
    // Sources 10/20/300/400 chars, budget = 2/3 · 730 = 486: the small
    // sources fit whole, the big two level at λ with the remainder going
    // to the earlier unfilled source in (avail, source) order.
    val docs = Seq(("a", 10L), ("b", 20L), ("c", 300L), ("d", 400L))
      .flatMap { case (s, n) => Seq((s, n / 2), (s, n - n / 2)) } // 2 docs each
      .toDF("source", "n_chars")
    val got = Curation.budgetWaterfill(docs, "source", "n_chars")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("a") === ((10L, 10L)) && got("b") === ((20L, 20L)))
    // λ = (486 - 30) div 2 = 228, remainder 0.
    assert(got("c") === ((300L, 228L)) && got("d") === ((400L, 228L)))
    assert(got.values.map(_._2).sum === 730L * 2 / 3)
    assert(got.values.forall { case (avail, alloc) => alloc <= avail })
    // Budget at least the total → every source taken whole.
    val full = Curation.budgetWaterfill(docs, "source", "n_chars",
        budgetNum = 1L, budgetDen = 1L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(full === Map("a" -> 10L, "b" -> 20L, "c" -> 300L, "d" -> 400L))
    // Equal sources, budget 2/3 · 9 = 6 → clean level λ=2 for all; and a
    // non-divisible budget (3/4 · 9 = 6 rem 3 over... use 5/6: b=7, λ=2
    // rem 1) sends the single +1 to the FIRST source in (avail, source)
    // order — Σ stays exact in both.
    val eq = Seq(("x", 3L), ("y", 3L), ("z", 3L)).toDF("source", "n_chars")
    val rem0 = Curation.budgetWaterfill(eq, "source", "n_chars")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(rem0 === Map("x" -> 2L, "y" -> 2L, "z" -> 2L))
    val rem1 = Curation.budgetWaterfill(eq, "source", "n_chars",
        budgetNum = 5L, budgetDen = 6L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(rem1 === Map("x" -> 3L, "y" -> 2L, "z" -> 2L))
  }

  test("budgetCut keeps a per-source prefix that fits the allocation, rerun-stable") {
    val sparkSession = spark
    import sparkSession.implicits._
    graft.plans.GraftExtensions.register(spark)
    val docs = (1L to 40L).map(i => (i, s"s${i % 4}", 10L + i % 7))
      .toDF("doc_id", "source", "n_chars")
    val alloc = Curation.budgetWaterfill(docs, "source", "n_chars")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val cut = Curation.budgetCut(docs, "source", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // Per-source kept size never exceeds (and prefix-fills) the allocation.
    val bySrc = cut.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    bySrc.foreach { case (s, kept) => assert(kept <= alloc(s), s"source $s") }
    // cum is consistent: max cum per source equals the kept sum.
    cut.groupBy(_._2).foreach { case (s, rows) =>
      assert(rows.map(_._4).max === bySrc(s), s"cum of $s") }
    // Deterministic under repartitioning.
    val again = Curation.budgetCut(docs.repartition(7), "source", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(again.toSet === cut.toSet)
  }

  test("epochOrder: each epoch a full 1..N permutation, epochs independent, " +
      "stable under repartitioning") {
    val sparkSession = spark
    import sparkSession.implicits._
    graft.plans.GraftExtensions.register(spark)
    val docs = (1L to 97L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val out = Curation.epochOrder(docs, epochs = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length === 97 * 3)
    // Every epoch is a dense permutation of positions 1..N over ALL docs.
    out.groupBy(_._2).foreach { case (ep, rows) =>
      assert(rows.map(_._1).toSet === (1L to 97L).toSet, s"epoch $ep doc set")
      assert(rows.map(_._3).sorted.toSeq === (1L to 97L), s"epoch $ep positions")
    }
    // Different epochs draw DIFFERENT permutations (the salt includes the
    // epoch): identical orderings would defeat the reshuffle contract.
    val perm = (ep: Long) => out.filter(_._2 == ep).sortBy(_._3).map(_._1).toSeq
    assert(perm(0L) !== perm(1L))
    assert(perm(1L) !== perm(2L))
    // Deterministic under repartitioning (the two-pass numbering contract).
    val again = Curation.epochOrder(docs.repartition(11), epochs = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSet === out.toSet)
  }
test("lineMorphology: exact counts on a hand-built lined document") {
    val sparkSession = spark
    import sparkSession.implicits._
    val doc = "\u2022 alpha beta ...\nplain line here\n" +
      "ends with dots ...\n- dash bullet\n#tag one \u2026 two\n   \n"
    val out = Curation.lineMorphology(
        Seq((1L, doc)).toDF("doc_id", "text")).collect()(0)
    assert(out.getLong(1) === 5L) // n_lines (blank line dropped)
    assert(out.getLong(2) === 2L) // bullet: \u2022 and -
    assert(out.getLong(3) === 2L) // ellipsis-end lines
    assert(out.getLong(4) === 18L) // words
    assert(out.getLong(5) === 13L) // alpha words (not \u2022 - ... \u2026)
    assert(out.getLong(7) === 1L) // n_hash ('#' in #tag)
    assert(out.getLong(8) === 3L) // n_ellipsis_sym: two '...' + one \u2026
  }
}
