package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.plans.{GraftExtensions, Md5Hash32}
import org.apache.spark.unsafe.types.UTF8String

/** [[Retrieval]] semantics pinned against independent in-memory
  * re-implementations of the exact arithmetic (integer BM25, hashed linear
  * margin), plus the structural contracts: shuffle-free classifier plan,
  * no-match docs absent from BM25, determinism across runs. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana apple cherry", "en"),
    (2L, "banana banana banana banana banana banana", "en"),
    (3L, "cherry date elderberry fig grape", "en"),
    (4L, "apple apple apple apple date", "de"),
    (5L, "kiwi lemon mango", "de")
  ).toDF("doc_id", "text", "lang")

  /** The exact integer BM25 of [[Retrieval.bm25TopK]], re-derived by hand:
    * idf = bitlen(N) − bitlen(df) + 1; score = idf·22·S·tf /
    * (10·S·tf + 3·S + 9·N·dl) rounded to 6 dp; doc total = Σ rounded. */
  private def bruteBm25(corpus: Seq[(Long, String)], terms: Seq[String])
      : Map[Long, BigDecimal] = {
    val toks = corpus.map { case (id, t) =>
      id -> t.toLowerCase.trim.split("\\s+").toSeq }
    val n = toks.size.toLong
    val s = toks.map(_._2.size.toLong).sum
    val df = terms.map { t =>
      t -> toks.count(_._2.contains(t)).toLong }.toMap
    def bitlen(x: Long) = java.lang.Long.toBinaryString(x).length.toLong
    toks.flatMap { case (id, ws) =>
      val dl = ws.size.toLong
      val scores = terms.flatMap { t =>
        val tf = ws.count(_ == t).toLong
        if (tf == 0) None
        else {
          val idf = bitlen(n) - bitlen(df(t)) + 1
          val raw = (idf * 22L * s * tf).toDouble /
            (10L * s * tf + 3L * s + 9L * n * dl).toDouble
          Some(BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        }
      }
      if (scores.isEmpty) None else Some(id -> scores.sum)
    }.toMap
  }

  test("bm25TopK matches the hand-computed exact-arithmetic reference") {
    val got = Retrieval.bm25TopK(docs, Seq("apple", "banana", "fig"), topN = 10)
      .collect().map(r => (r.getLong(0), r.getLong(4), r.getDouble(3))).toSeq
    val want = bruteBm25(
      docs.select("doc_id", "text").as[(Long, String)].collect().toSeq,
      Seq("apple", "banana", "fig"))
    // Doc 5 matches nothing → absent; the other four all match something.
    assert(got.map(_._1).toSet === Set(1L, 2L, 3L, 4L))
    got.foreach { case (id, _, score) =>
      assert(BigDecimal(score) === want(id), s"doc $id") }
    // Ranks are dense 1..k by (score desc, id asc).
    val byRank = got.sortBy(_._2)
    assert(byRank.map(_._2) === (1L to got.size))
    assert(byRank.map(_._3).reverse.sorted.reverse === byRank.map(_._3),
      "scores must be non-increasing in rank")
  }

  test("bm25TopK: rarer terms carry strictly larger integer idf") {
    // 'fig' appears in 1 of 5 docs (bitlen 1), 'apple' in 2 (bitlen 2):
    // idf(fig)=3+1-1=3... derived: bitlen(5)=3 ⇒ idf = 3-bitlen(df)+1.
    val one = Retrieval.bm25TopK(docs, Seq("fig"), topN = 10).collect()
    val common = Retrieval.bm25TopK(docs, Seq("banana"), topN = 10).collect()
    assert(one.nonEmpty && common.nonEmpty)
    // Same doc-3 token count context: fig's single hit must outscore a
    // single banana hit in doc 1 (same tf=1; banana df=2 ⇒ lower idf)
    val figScore = one.head.getDouble(3)
    val bananaDoc1 = common.find(_.getLong(0) == 1L).get.getDouble(3)
    assert(figScore > bananaDoc1)
  }

  test("bm25TopK truncates to topN with deterministic tie order") {
    val top2 = Retrieval.bm25TopK(docs, Seq("apple", "banana", "fig"), topN = 2)
      .collect()
    assert(top2.length === 2)
    assert(top2.map(_.getLong(4)).sorted === Array(1L, 2L))
    val full = Retrieval.bm25TopK(docs, Seq("apple", "banana", "fig"), topN = 10)
      .orderBy("rank").collect()
    assert(top2.sortBy(_.getLong(4)).map(_.getLong(0)).toSeq ===
      full.take(2).map(_.getLong(0)).toSeq, "topN is a prefix of the full ranking")
  }

  test("hashedLinearMargin equals a driver-side Md5Hash32 fold; plan is shuffle-free") {
    GraftExtensions.register(spark)
    val out = Retrieval.hashedLinearMargin(docs, dim = 1024L)
    val got = out.collect().map(r =>
      (r.getLong(0), r.getLong(2), r.getLong(3), r.getBoolean(4))).toSeq
    def weight(w: String): Long =
      ((Md5Hash32.hash(UTF8String.fromString(w)) % 1024L) % 21L) - 10L
    docs.select("doc_id", "text").as[(Long, String)].collect().foreach {
      case (id, text) =>
        val ws = text.toLowerCase.trim.split("\\s+").toSeq
        val margin = ws.map(weight).sum
        val row = got.find(_._1 == id).get
        assert(row._2 === ws.size.toLong, s"n_tokens doc $id")
        assert(row._3 === margin, s"margin doc $id")
        assert(row._4 === (margin > 0), s"kept doc $id")
    }
    // Map-only contract: corpus-wide filter inference must plan zero
    // exchanges — that is the operator's whole 100 TB story.
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"classifier plan must not shuffle:\n$plan")
  }

  test("classifierAuc matches the O(n²) pair-counting definition, ties included") {
    // Scores with a tie straddling the classes: AUC must equal
    // (#(pos>neg) + ½·#(pos=neg)) / (n_pos·n_neg) — computed brute-force.
    val scored = Seq(
      (5L, true), (3L, true), (3L, false), (1L, false), (0L, false),
      (5L, false), (7L, true), (1L, true)
    ).toDF("margin", "label")
    val row = Retrieval.classifierAuc(scored).head()
    val data = Seq((5L, true), (3L, true), (3L, false), (1L, false),
      (0L, false), (5L, false), (7L, true), (1L, true))
    val pos = data.filter(_._2).map(_._1)
    val neg = data.filterNot(_._2).map(_._1)
    val wins = (for (p <- pos; q <- neg) yield
      if (p > q) 1.0 else if (p == q) 0.5 else 0.0).sum
    val want = BigDecimal(wins / (pos.size * neg.size))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    assert(row.getLong(0) === pos.size.toLong)
    assert(row.getLong(1) === neg.size.toLong)
    assert(BigDecimal(row.getDouble(3)) === want)
    // Exact numerator identity: auc = auc_num / (2·n_pos·n_neg).
    assert(row.getLong(2).toDouble / (2.0 * pos.size * neg.size) ===
      wins / (pos.size * neg.size))
  }

  test("classifierAuc: degenerate single-class input yields NULL auc, not a crash") {
    val onlyPos = Seq((1L, true), (2L, true)).toDF("margin", "label")
    val row = Retrieval.classifierAuc(onlyPos).head()
    assert(row.getLong(0) === 2L && row.getLong(1) === 0L)
    assert(row.isNullAt(3))
  }

  test("classifierCalibration buckets with floor (negative margins) and exact rates") {
    val scored = Seq(
      (-13L, false), (-5L, true), (0L, false), (9L, true), (10L, true), (23L, false)
    ).toDF("margin", "label")
    val got = Retrieval.classifierCalibration(scored, width = 10L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // floor(-13/10) = -2 (floor, NOT truncation toward zero).
    assert(got(-2L) === ((1L, 0L, 0.0)))
    assert(got(-1L) === ((1L, 1L, 1.0)))
    assert(got(0L) === ((2L, 1L, 0.5)))
    assert(got(1L) === ((1L, 1L, 1.0)))
    assert(got(2L) === ((1L, 0L, 0.0)))
  }

  test("bm25Score against a prebuilt index equals the one-shot per-doc scores") {
    val terms = Seq("apple", "banana", "fig")
    val idx = Retrieval.bm25Index(docs, terms)
    // Identity: batch ⊆ corpus scored against the corpus index must equal
    // the one-shot ranking's per-doc rows for those docs (scores are
    // pointwise given frozen N/S/df).
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val inc = Retrieval.bm25Score(batch, idx, terms).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val full = Retrieval.bm25TopK(docs, terms, topN = 100).collect()
      .filter(_.getLong(0) % 2 == 1)
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(inc === full)
    assert(inc.nonEmpty)
    // A batch term unseen by the index contributes nothing (frozen-index
    // contract: no df row to join).
    val alien = Seq((99L, "zzz zzz zzz", "en")).toDF("doc_id", "text", "lang")
    assert(Retrieval.bm25Score(alien, idx, terms).count() === 0L)
  }

  test("classifierAucBy equals the global AUC computed per group") {
    val scored = Seq(
      ("en", 5L, true), ("en", 3L, false), ("en", 3L, true), ("en", 1L, false),
      ("de", 9L, false), ("de", 2L, true), ("de", 2L, false),
      ("fr", 4L, true), ("fr", 6L, true) // single-class group → NULL auc
    ).toDF("lang", "margin", "label")
    val by = Retrieval.classifierAucBy(scored, "lang").collect()
      .map(r => r.getString(0) -> r).toMap
    for (lang <- Seq("en", "de", "fr")) {
      val global = Retrieval.classifierAuc(scored.filter(col("lang") === lang)).head()
      val g = by(lang)
      assert(g.getLong(1) === global.getLong(0), s"$lang n_pos")
      assert(g.getLong(2) === global.getLong(1), s"$lang n_neg")
      assert(g.getLong(3) === global.getLong(2), s"$lang auc_num")
      if (global.isNullAt(3)) assert(g.isNullAt(4), s"$lang null auc")
      else assert(g.getDouble(4) === global.getDouble(3), s"$lang auc")
    }
    assert(by("fr").isNullAt(4))
  }

  test("scorePercentiles equals brute midrank/N with ties; plan broadcasts the histogram") {
    val scored = Seq((1L, 5L), (2L, 3L), (3L, 3L), (4L, 1L), (5L, 7L), (6L, 3L))
      .toDF("doc_id", "margin")
    val out = Retrieval.scorePercentiles(scored)
    // Output columns are (margin, doc_id, pct) — join key first.
    val got = out.collect().map(r =>
      (r.getLong(1), r.getLong(0), r.getDouble(2))).toSeq // → (doc_id, margin, pct)
    val vals = Seq((1L, 5L), (2L, 3L), (3L, 3L), (4L, 1L), (5L, 7L), (6L, 3L))
    val all = vals.map(_._2).sorted
    def midrank(v: Long): Double = {
      val lt = all.count(_ < v); val eq = all.count(_ == v)
      (lt + (eq + 1) / 2.0) / all.size
    }
    vals.foreach { case (id, m) =>
      val row = got.find(_._1 == id).get
      assert(BigDecimal(row._3) ===
        BigDecimal(midrank(m)).setScale(6, BigDecimal.RoundingMode.HALF_UP),
        s"doc $id")
    }
    // Higher margin ⇒ strictly higher percentile across distinct values.
    val byMargin = vals.map(_._2).distinct.sorted.map(m =>
      got.find(_._2 == m).get._3)
    assert(byMargin === byMargin.sorted)
    // The histogram side must attach via a broadcast join (map-only op).
    assert(out.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("rrfFuse matches hand-computed reciprocal-rank sums and tie order") {
    val a = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("doc_id", "rank")
    val b = Seq((2L, 1L), (4L, 2L), (1L, 3L)).toDF("doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq(a, b), topN = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    def c(rank: Long): BigDecimal =
      BigDecimal(1.0 / (60.0 + rank)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val want = Map(
      1L -> (c(1) + c(3)), 2L -> (c(2) + c(1)), 3L -> c(3), 4L -> c(2))
    got.foreach { case (id, nLists, rrf, _) =>
      assert(BigDecimal(rrf) === want(id), s"doc $id")
      assert(nLists === (if (id <= 2) 2L else 1L))
    }
    // Both-list docs outrank single-list docs here; doc 2 (ranks 2+1)
    // beats doc 1 (ranks 1+3).
    assert(got.sortBy(_._4).map(_._1).toSeq === Seq(2L, 1L, 4L, 3L))
  }

  test("zipfSlope equals a brute-force integer OLS on bitlen(rank)/bitlen(freq)") {
    // Zipf-ish counts: a 8, b 4, c 2, d 1, e 1 (tie broken by term).
    val corpus = Seq(
      "a a a a a a a a", "b b b b", "c c", "d e"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val row = TextFunctions.zipfSlope(corpus).head()
    val freqs = Seq("a" -> 8L, "b" -> 4L, "c" -> 2L, "d" -> 1L, "e" -> 1L)
    def bl(x: Long) = java.lang.Long.toBinaryString(x).length.toLong
    val pts = freqs.sortBy { case (t, f) => (-f, t) }.zipWithIndex
      .map { case ((_, f), i) => (bl(i + 1L), bl(f)) }
    val n = pts.size.toLong
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val (sxy, sxx) = (pts.map(p => p._1 * p._2).sum, pts.map(p => p._1 * p._1).sum)
    val slope = BigDecimal((n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    assert(row.getLong(0) === n)
    assert(row.getLong(1) === sxy)
    assert(row.getLong(2) === sxx)
    assert(BigDecimal(row.getDouble(3)) === slope)
    // Sanity: a frequency-decaying vocabulary regresses with negative slope.
    assert(row.getDouble(3) < 0.0)
  }

  test("bm25TopK / bm25Index on an EMPTY corpus return empty, not NPE") {
    val empty = docs.filter(lit(false))
    assert(Retrieval.bm25TopK(empty, Seq("apple")).count() === 0L)
    val idx = Retrieval.bm25Index(empty, Seq("apple"))
    assert(idx.nDocs === 0L && idx.totalTokens === 0L)
    assert(Retrieval.bm25Score(docs, idx, Seq("nomatchterm")).count() === 0L)
  }

  test("zipfSlope: degenerate single-term vocabulary yields NULL slope, not NaN") {
    val one = Seq((1L, "solo")).toDF("doc_id", "text")
    val row = TextFunctions.zipfSlope(one).head()
    assert(row.getLong(0) === 1L)
    assert(row.isNullAt(3), s"slope should be NULL, got ${row.get(3)}")
  }

  test("hashedLinearMargin with langCol=None works on frames without a lang column") {
    GraftExtensions.register(spark)
    val noLang = docs.select("doc_id", "text")
    val got = Retrieval.hashedLinearMargin(noLang, langCol = None)
    assert(got.columns.toSeq === Seq("doc_id", "n_tokens", "margin", "kept"))
    // Same margins as the lang-carrying form on the same texts.
    val withLang = Retrieval.hashedLinearMargin(docs)
      .select("doc_id", "margin").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.select("doc_id", "margin").collect().foreach { r =>
      assert(r.getLong(1) === withLang(r.getLong(0))) }
  }

  test("hashedLinearMargin weights stay in [-10, 10] and margins are reproducible") {
    GraftExtensions.register(spark)
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val a = Retrieval.hashedLinearMargin(emb).orderBy("doc_id").collect()
    val b = Retrieval.hashedLinearMargin(emb).orderBy("doc_id").collect()
    assert(a.map(_.getLong(3)).toSeq === b.map(_.getLong(3)).toSeq)
    // |margin| ≤ 10 · n_tokens — the weight-range invariant.
    a.foreach { r =>
      assert(math.abs(r.getLong(3)) <= 10L * r.getLong(2), r.toString) }
  }
}
