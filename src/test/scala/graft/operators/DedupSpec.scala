package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.plans.GraftExtensions

/** Hand-built dedup cases: known duplicates must be found, clearly-distinct
  * documents must not pair. */
class DedupSpec extends SparkSpec {

  private def docs = {
    val sparkSession = spark
    import sparkSession.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again today"),
      (1L, "the quick brown fox jumps over the lazy dog again and again tonight"), // near-dup of 0
      (2L, "completely different content about spark catalyst optimizer internals"),
      (3L, "The  Quick Brown fox jumps over the lazy dog again and again today"), // exact dup of 0 after normalize
      (4L, "another unrelated document mentioning database join strategies")
    ).toDF("doc_id", "text")
  }

  test("exact dedup groups normalization-equal texts") {
    val got = Dedup.exact(docs).filter(col("dup_count") > 1).head()
    assert(got.getAs[Long]("keep_id") === 0L)
    assert(got.getAs[Long]("dup_count") === 2L) // docs 0 and 3
  }

  test("sortedNeighborhood: window-bounded candidates, prefix near-dups found") {
    val s = spark; import s.implicits._
    graft.plans.GraftExtensions.register(spark)
    // Sort order (normalized text): d1, d2 adjacent (shared prefix, one
    // word differs → Jaccard 3/5 on 3-shingles); d3/d4 far from both.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"),
      (3L, "mary had a little lamb whose fleece"),
      (4L, "zulu yankee xray whiskey victor uniform")).toDF("doc_id", "text")
    // Pair emitted in SORT order: "…epsilon eta" (doc 2) < "…epsilon
    // zeta" (doc 1).
    val pairs = Dedup.sortedNeighborhood(docs, window = 2, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((2L, 1L)))
    // Window 2 compares ONLY rank neighbors: with an intervening doc
    // between the near-dups in sort order ("…epsilon mike" falls between
    // eta and zeta), SNM misses the pair — the documented recall trade
    // vs LSH.
    val wedge = docs.union(
      Seq((5L, "alpha beta gamma delta epsilon mike")).toDF("doc_id", "text"))
    val missed = Dedup.sortedNeighborhood(wedge, window = 2, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(!missed.contains((2L, 1L)))
    // …and widening the window recovers it.
    val wide = Dedup.sortedNeighborhood(wedge, window = 3, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(wide.contains((2L, 1L)))
  }

  test("incremental dedup: in-batch collapse, corpus anti-join, novel docs kept") {
    val sparkSession = spark
    import sparkSession.implicits._
    val corpusFps = Dedup.exact(docs).select(col("fp"))
    val batch = Seq(
      (10L, "The  Quick Brown fox jumps over the lazy dog again and again today"), // corpus dup → dropped
      (11L, "fresh content one"),
      (12L, "Fresh   CONTENT one"), // in-batch dup of 11 → collapsed
      (13L, "fresh content two")
    ).toDF("doc_id", "text")
    val got = Dedup.incremental(batch, corpusFps)
      .collect().map(r => (r.getAs[Long]("keep_id"), r.getAs[Long]("batch_dups")))
      .toSet
    assert(got === Set((11L, 2L), (13L, 1L)))
  }

  test("ngramContamination: planted partial leak scores the exact overlap fraction") {
    GraftExtensions.register(spark)
    val sparkSession = spark
    import sparkSession.implicits._
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon"), // grams: ab g, b g d, g d e
      (1L, "zeta eta theta iota")
    ).toDF("doc_id", "text")
    val probe = Seq(
      // 4 distinct 3-grams; the first two ("alpha beta gamma",
      // "beta gamma delta") exist in corpus doc 0 → 2/4 = 500 permille.
      (10L, "alpha beta gamma delta kappa lambda"),
      (11L, "mu nu xi omicron"),     // 2 grams, 0 matched
      (12L, "pi rho")                // too short: 0 grams, null permille
    ).toDF("doc_id", "text")
    val got = Dedup.ngramContamination(corpus, probe).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]))))
      .toMap
    assert(got === Map(
      10L -> ((2L, 4L, Some(500L))),
      11L -> ((0L, 2L, Some(0L))),
      12L -> ((0L, 0L, None))))
  }

  test("minhash-LSH finds the planted near-dup pair and nothing spurious") {
    GraftExtensions.register(spark)
    val pairs = Dedup.nearDuplicates(docs, threshold = 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 0-3 identical, 0-1 and 1-3 near; 2 and 4 must pair with nothing.
    assert(pairs.contains((0L, 3L)) && pairs.contains((0L, 1L)))
    assert(pairs.forall { case (a, b) => !Set(a, b).contains(2L) && !Set(a, b).contains(4L) })
  }

  test("cross-corpus decontamination flags the planted train/eval overlap only") {
    GraftExtensions.register(spark)
    val sparkSession = spark
    import sparkSession.implicits._
    val train = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again today"),
      (1L, "completely different content about spark catalyst optimizer internals"),
      (2L, "another unrelated document mentioning database join strategies")
    ).toDF("doc_id", "text")
    val eval_ = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again tonight"), // ≈ train 0
      (101L, "entirely novel held out benchmark prose with no training twin at all")
    ).toDF("doc_id", "text")
    val hits = Dedup.crossNearDuplicates(train, eval_, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits === Set((100L, 0L))) // (probe_id, corpus_id)
    // Direction matters: ids come back labeled by side, not by magnitude.
    val none = Dedup.crossNearDuplicates(train, eval_.filter(col("doc_id") === 101L), 0.5)
    assert(none.count() === 0L)
  }

  test("hot-band cap bounds candidates on a pathological band") {
    GraftExtensions.register(spark)
    val sparkSession = spark
    import sparkSession.implicits._
    // 40 IDENTICAL docs = one band bucket of 40 in every band (40·39/2 =
    // 780 candidate pairs uncapped), plus one near-dup pair elsewhere.
    val boiler = (100L until 140L).map(i =>
      (i, "identical boilerplate header repeated across the corpus every time"))
    val pathological = (boiler ++ Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again today"),
      (1L, "the quick brown fox jumps over the lazy dog again and again tonight")
    )).toDF("doc_id", "text")
    // Cap below the hot bucket: the boilerplate band is dropped wholesale,
    // the genuine pair (bucket size 2) survives.
    val capped = Dedup.nearDuplicates(pathological, threshold = 0.5, maxBand = 10L)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === Set((0L, 1L)))
    // Uncapped (cap above bucket size): the quadratic blow-up is visible —
    // exactly what the cap exists to prevent at scale.
    val uncapped = Dedup.nearDuplicates(pathological, threshold = 0.5, maxBand = 1000L)
    assert(uncapped.count() === 780L + 1L)
  }

  test("simhashPairs: oversized signature bucket is capped, polite pair kept") {
    GraftExtensions.register(spark)
    val sparkSession = spark
    import sparkSession.implicits._
    // 30 identical docs share one simhash (one 16-bit-prefix bucket of 30);
    // two other identical docs form a polite bucket of 2. maxBucket = 8
    // drops the family wholesale and keeps the pair — same declared-cap
    // discipline as the LSH band cap above.
    val family = (100L until 130L).map(i =>
      (i, "identical boilerplate header repeated across the corpus every time"))
    val docs = (family ++ Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again today"),
      (1L, "the quick brown fox jumps over the lazy dog again and again today")
    )).toDF("doc_id", "text")
    val capped = Dedup.simhashPairs(docs, maxHamming = 8, maxBucket = 8L)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === Set((0L, 1L)))
    val uncapped = Dedup.simhashPairs(docs, maxHamming = 8)
    assert(uncapped.count() === 30L * 29L / 2L + 1L)
  }

  test("n-gram Jaccard inverted-index variant agrees with LSH on planted pairs") {
    GraftExtensions.register(spark)
    val viaIndex = Dedup.ngramJaccard(docs, threshold = 0.5, maxDf = 30L)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaIndex.contains((0L, 3L)) && viaIndex.contains((0L, 1L)))
    assert(viaIndex.forall { case (a, b) => !Set(a, b).contains(2L) && !Set(a, b).contains(4L) })
  }

  test("prefixJaccard equals brute force on random corpora (completeness)") {
    val s = spark; import s.implicits._
    GraftExtensions.register(spark)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 2) {
      val base = (0 until 30).map { i =>
        (i.toLong,
          Vector.fill(8 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
            .mkString(" "))
      }
      // Planted near-dups: copies with one word swapped — high-Jaccard
      // pairs the random base alone would rarely produce.
      val planted = (0 until 8).map { j =>
        val ws = base(rnd.nextInt(base.size))._2.split(" ")
        ws(rnd.nextInt(ws.length)) = vocab(rnd.nextInt(vocab.size))
        (100L + j, ws.mkString(" "))
      }
      val corpus = (base ++ planted).toDF("doc_id", "text")
      val hs = corpus
        .select(col("doc_id"), Dedup.shingleHashes(col("text")).as("hs"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
        .filter(_._2.nonEmpty)
      // 0.5/0.75 are binary-exact; 0.7/0.21 exercise the floored
      // micro-threshold pruning bounds (the float-rounding hazard class).
      for (t <- Seq(0.5, 0.75, 0.7, 0.21)) {
        val brute = (for {
          (a, ha) <- hs; (b, hb) <- hs if a < b
          inter = (ha intersect hb).size
          j = inter.toDouble / (ha.size + hb.size - inter) if j >= t
        } yield (a, b, j)).toSet
        val got = Dedup.prefixJaccard(corpus, t).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        assert(got === brute, s"trial $trial threshold $t")
        assert(brute.nonEmpty, s"trial $trial threshold $t must plant pairs")
      }
    }
  }

  test("prefixJaccard keeps pairs the df-capped index structurally drops") {
    val s = spark; import s.implicits._
    GraftExtensions.register(spark)
    // 40 identical docs: every shingle's df = 40 > maxDf = 30, so the
    // capped inverted index generates ZERO candidates — the documented
    // recall trade. Prefix filtering has no cap: all C(40,2) exact-dup
    // pairs at Jaccard 1.0 must come back.
    val herd = (0L until 40L)
      .map(i => (i, "spark shuffles partitions across the cluster stages"))
      .toDF("doc_id", "text")
    assert(Dedup.ngramJaccard(herd, threshold = 0.5, maxDf = 30L).count() === 0L)
    val got = Dedup.prefixJaccard(herd, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length === 40 * 39 / 2)
    assert(got.forall(_._3 === 1.0))
  }

  test("prefixJaccardIncremental equals brute cross force; novel batch is a no-op") {
    val s = spark; import s.implicits._
    GraftExtensions.register(spark)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val rnd = new scala.util.Random(23)
    val corpusDocs = (0 until 25).map { i =>
      (i.toLong,
        Vector.fill(8 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
    }
    // Batch: near-dup edits of corpus docs + one doc over a DISJOINT
    // vocabulary (every hash unseen in the corpus — the df=∞ path).
    val batchDocs = (0 until 6).map { j =>
      val ws = corpusDocs(rnd.nextInt(corpusDocs.size))._2.split(" ")
      ws(rnd.nextInt(ws.length)) = vocab(rnd.nextInt(vocab.size))
      (200L + j, ws.mkString(" "))
    } :+ (300L, "foo bar baz qux quux corge grault")
    val corpus = corpusDocs.toDF("doc_id", "text")
    val batch = batchDocs.toDF("doc_id", "text")
    def sets(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), Dedup.shingleHashes(col("text")).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
      .filter(_._2.nonEmpty)
    val (ch, bh) = (sets(corpus), sets(batch))
    for (t <- Seq(0.5, 0.75, 0.7, 0.21)) {
      val brute = (for {
        (b, hb) <- bh; (c, hc) <- ch
        inter = (hb intersect hc).size
        j = inter.toDouble / (hb.size + hc.size - inter) if j >= t
      } yield (b, c, j)).toSet
      val got = Dedup.prefixJaccardIncremental(corpus, batch, t).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === brute, s"threshold $t")
      assert(got.forall(_._1 != 300L), "novel-vocabulary doc must not pair")
    }
  }

  test("clustersExact: agrees with LSH clusters on the fixture; groups the herd") {
    val s = spark; import s.implicits._
    GraftExtensions.register(spark)
    // Where LSH recall is full (this fixture), exact and banded clusters
    // must coincide; the herd pins the no-candidate-loss guarantee.
    val viaLsh = Dedup.clusters(docs, 0.5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = Dedup.clustersExact(docs, 0.5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact === viaLsh)
    val herd = (0L until 40L)
      .map(i => (i, "spark shuffles partitions across the cluster stages"))
      .toDF("doc_id", "text")
    val herdClusters = Dedup.clustersExact(herd, 0.5).collect()
      .map(r => r.getLong(1)).toSet
    assert(herdClusters === Set(0L), "identical docs must form one cluster")
  }

  test("nearDupRecall: per-decile table equals brute truth x LSH found") {
    val s = spark; import s.implicits._
    GraftExtensions.register(spark)
    // Graded-similarity corpus: pairs engineered across Jaccard deciles by
    // sharing a variable-length common core — low deciles are where LSH
    // recall actually sags, so the audit must book them against a truth
    // it computes completely.
    val rnd = new scala.util.Random(41)
    def words(n: Int, tag: String) = Vector.tabulate(n)(i => s"${tag}_$i")
    val docs = (0 until 12).flatMap { p =>
      val core = words(4 + rnd.nextInt(20), s"core$p")
      val da = (core ++ words(rnd.nextInt(10), s"a$p")).mkString(" ")
      val db = (core ++ words(rnd.nextInt(10), s"b$p")).mkString(" ")
      Seq((2L * p, da), (2L * p + 1, db))
    }.toDF("doc_id", "text")
    val t = 0.2
    val truth = Dedup.prefixJaccard(docs, t).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val found = Dedup.nearDuplicates(docs, t).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.subsetOf(truth.keySet), "LSH found must verify within truth")
    val expected = truth.groupBy { case (_, j) => math.floor(j * 10).toLong }
      .map { case (d, m) =>
        val nTrue = m.size.toLong
        val nFound = m.keys.count(found).toLong
        (d, nTrue, nFound, nFound * 1000L / nTrue)
      }.toSet
    val got = Dedup.nearDupRecall(docs, t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expected)
    assert(expected.size >= 3, "fixture must span several deciles")
  }

  test("prefixJaccard positional filter prunes the shared-frequent-hash corpus") {
    val s = spark; import s.implicits._
    GraftExtensions.register(spark)
    // 200 docs of TWO shingles each: one unique, one shared by all — with
    // |d| = 2 and t = 0.5 the whole set is prefix, so plain AllPairs
    // emits ~n²/2 candidate rows on the shared hash with ZERO true pairs
    // (J = 1/3 < t). The positional filter bound at the shared hash's
    // last-rank match is 1 < α = ⌈t/(1+t)·4⌉ = 2, so PPJoin prunes every
    // one BEFORE the distinct. Correctness side: only the planted
    // identical pair may appear.
    val filler = (0L until 200L).map(i => (i, s"uniq$i alpha beta gamma"))
    val planted = Seq((900L, "shared alpha beta gamma"),
      (901L, "shared alpha beta gamma"))
    val got = Dedup.prefixJaccard((filler ++ planted).toDF("doc_id", "text"),
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((900L, 901L, 1.0)))
  }

  test("rolling_hash: code-point fold, normalization-sensitive, CJK-safe") {
    GraftExtensions.register(spark)
    val sparkSession = spark
    import sparkSession.implicits._
    import org.apache.spark.sql.functions._
    def manual(s: String): Long =
      s.codePoints().toArray.foldLeft(0L)((h, c) => (h * 1000003L + c) % 2147483647L)
    val inputs = Seq("hello world", "", "中文 text ünïcödé")
    val got = inputs.toDF("s")
      .select(call_function("rolling_hash", col("s")).as("h"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === inputs.map(manual))
  }

  test("docs shorter than the shingle width are dropped, not paired (ANSI-safe)") {
    GraftExtensions.register(spark)
    val sparkSession = spark
    import sparkSession.implicits._
    // Empty shingle sets (< 3 words) used to share identical all-P
    // signatures → one hot band → candidate pairs with a 0 Jaccard
    // denominator (DIVIDE_BY_ZERO under ANSI). Now they never band.
    val short = Seq((10L, "tiny doc"), (11L, "small"), (12L, ""),
      (13L, "the quick brown fox jumps over the lazy dog again and again today"))
      .toDF("doc_id", "text")
    val pairs = Dedup.nearDuplicates(docs.union(short), threshold = 0.0)
    // The short docs (10-12) never pair; the full-length 13 still does.
    assert(pairs.filter(col("doc_a").isin(10L, 11L, 12L) ||
      col("doc_b").isin(10L, 11L, 12L)).count() === 0L)
    assert(pairs.filter(col("doc_b") === 13L).count() > 0L)
  }

  test("clusters: connected components label by min doc id; singletons self-label") {
    GraftExtensions.register(spark)
    val got = Dedup.clusters(docs, threshold = 0.5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 0-1, 0-3 (and transitively 1-3) form one component; 2 and 4 stand alone.
    assert(got === Map(0L -> 0L, 1L -> 0L, 3L -> 0L, 2L -> 2L, 4L -> 4L))
    val clustered = Dedup.clusters(docs, threshold = 0.5)
    assert(Dedup.keepList(clustered).collect().map(_.getLong(0)).toSet ===
      Set(0L, 2L, 4L))
    assert(Dedup.dropList(clustered).collect().map(_.getLong(0)).toSet ===
      Set(1L, 3L))
  }

  test("clusterRepresentatives keeps the highest-score member, ties to min id") {
    GraftExtensions.register(spark)
    val sparkSession = spark
    import sparkSession.implicits._
    val clustered = Dedup.clusters(docs, threshold = 0.5)
    // Scores: doc 1 is the longest member of cluster {0,1,3}; singletons
    // represent themselves. Tie case: give 0 and 3 equal scores and check
    // below that the winner of cluster 0 would be min-id among ties.
    val scored = Seq((0L, 10L), (1L, 99L), (2L, 5L), (3L, 10L), (4L, 7L))
      .toDF("doc_id", "score")
    val got = Dedup.clusterRepresentatives(clustered, scored, "score")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === Map(0L -> ((1L, 3L, 99L)), 2L -> ((2L, 1L, 5L)),
      4L -> ((4L, 1L, 7L))))
    // Equal top scores: smaller id wins (total order, not arbitrary).
    val tied = Seq((0L, 50L), (1L, 50L), (2L, 5L), (3L, 50L), (4L, 7L))
      .toDF("doc_id", "score")
    val rep0 = Dedup.clusterRepresentatives(clustered, tied, "score")
      .filter(col("cluster_id") === 0L).collect()(0).getLong(1)
    assert(rep0 === 0L)
  }

  test("sourceOverlap: identical sources hit 1000 permille, disjoint ones are absent") {
    GraftExtensions.register(spark)
    val sparkSession = spark
    import sparkSession.implicits._
    val rows = Seq(
      (0L, "alpha beta gamma delta epsilon", "s1"),
      (1L, "alpha beta gamma delta epsilon", "s2"),     // identical vocab to s1
      (2L, "alpha beta gamma zeta eta theta", "s3"),    // shares grams with s1/s2
      (3L, "completely different words here now", "s4") // disjoint
    ).toDF("doc_id", "text", "source")
    val got = Dedup.sourceOverlap(rows, n = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // s1/s2: 3 grams each, all shared → Jaccard 1000.
    assert(got(("s1", "s2")) === ((3L, 3L, 3L, 1000L)))
    // s3 shares exactly "alpha beta gamma" with s1 and s2: 1 of 7 grams.
    assert(got(("s1", "s3")) === ((3L, 4L, 1L, 166L)))
    assert(got(("s2", "s3")) === ((3L, 4L, 1L, 166L)))
    // s4 shares nothing — absent from the matrix entirely.
    assert(!got.keySet.exists { case (a, b) => a == "s4" || b == "s4" })
  }

  test("connectedComponents converges past one hop (chain graph, diameter 3)") {
    val sparkSession = spark
    import sparkSession.implicits._
    val nodes = (0L to 4L).toDF("node")
    // chain 4-3-2-1; node 0 isolated: min label must travel 3 hops.
    val pairs = Seq((4L, 3L), (3L, 2L), (2L, 1L)).toDF("src", "dst")
    // driverLimit = 0 forces the DISTRIBUTED loop — the small-graph gate
    // would otherwise short-circuit every fixture-sized spec to union-find.
    val got = Dedup.connectedComponents(nodes, pairs, driverLimit = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
    // Hitting the round cap before convergence now falls back to
    // large-star/small-star (r9) — same correct labels, never a throw and
    // never silently-wrong output (the fallback self-verifies).
    val capped = Dedup.connectedComponents(nodes, pairs, maxIter = 1,
        driverLimit = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped === got)
    // And the DEFAULT path (small graph ⇒ driver union-find) agrees.
    val driver = Dedup.connectedComponents(nodes, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(driver === got)
  }

  test("connectedComponents: diameter-1000 chain converges under maxIter=20") {
    val sparkSession = spark
    import sparkSession.implicits._
    // 0-1-2-…-1000: one component, min id 0. Pointer doubling covers
    // diameter d in O(log d) rounds; the star fallback covers any excess.
    val nodes = (0L to 1000L).toDF("node")
    val pairs = (0L until 1000L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = Dedup.connectedComponents(nodes, pairs, maxIter = 20,
      driverLimit = 0L).collect()
    assert(got.length === 1001)
    assert(got.forall(_.getLong(1) == 0L))
  }

  test("star fallback under a tiny cap equals the unconstrained labels (multi-component)") {
    val sparkSession = spark
    import sparkSession.implicits._
    // Two chains + an isolated node; maxIter=1 guarantees the doubling
    // loop hits the cap and the large-star/small-star path resolves it.
    val nodes = (0L to 120L).toDF("node")
    val pairs = ((10L until 60L).map(i => (i, i + 1)) ++      // chain 10..60
      (70L until 120L).map(i => (i + 1, i))).toDF("src", "dst") // chain 70..120
    val free = Dedup.connectedComponents(nodes, pairs, maxIter = 50,
        driverLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val capped = Dedup.connectedComponents(nodes, pairs, maxIter = 1,
        driverLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped === free)
    assert(capped(35L) === 10L && capped(95L) === 70L && capped(3L) === 3L)
  }

  test("star fallback equals unconstrained CC on seeded random graphs") {
    val sparkSession = spark
    import sparkSession.implicits._
    // Mixed shapes per seed: random sparse edges + one long chain, so the
    // capped run both merges easy mass AND hits the cap with work left.
    for (seed <- Seq(7, 23, 99)) {
      val rnd = new scala.util.Random(seed)
      val n = 300L
      val rand = Seq.fill(250)((rnd.nextLong(n), rnd.nextLong(n)))
        .filter { case (a, b) => a != b }
      val chain = (400L until 480L).map(i => (i, i + 1))
      val pairs = (rand ++ chain).toDF("src", "dst")
      val nodes = (0L until n).toDF("node")
        .union((400L to 480L).toDF("node"))
      val free = Dedup.connectedComponents(nodes, pairs, maxIter = 50,
          driverLimit = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val capped = Dedup.connectedComponents(nodes, pairs, maxIter = 2,
          driverLimit = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(capped === free, s"seed $seed")
      // Driver union-find (the default at this size) matches both.
      val driver = Dedup.connectedComponents(nodes, pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(driver === free, s"seed $seed driver")
    }
  }

  test("normalization-equal texts share a simhash; unrelated texts differ") {
    GraftExtensions.register(spark)
    val sigs = Dedup.simhash(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(sigs(0L) === sigs(3L)) // hashing runs on normalized text
    assert(sigs(0L) !== sigs(2L))
  }

  test("minhashAccuracy: identical shingle sets estimate AND measure 1000‰") {
    val sparkSession = spark
    import sparkSession.implicits._
    GraftExtensions.register(spark)
    // docs 0 and 1 normalize to the same text → same shingle set → every
    // minhash component agrees and exact Jaccard is 1; doc 2 is unrelated.
    val d = Seq((0L, "alpha beta gamma delta epsilon"),
      (1L, "Alpha  beta GAMMA delta epsilon"),
      (2L, "one two three four five six")).toDF("doc_id", "text")
    val rows = Dedup.minhashAccuracy(d, threshold = 0.9)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.toSeq === Seq((1L, 0L, Dedup.NumHashes.toLong, 1000L, 1000L))
      || rows.toSeq === Seq((0L, 1L, Dedup.NumHashes.toLong, 1000L, 1000L)))
    // est_permille and exact_permille are both ≤ 1000 by construction.
    rows.foreach { r => assert(r._4 <= 1000L && r._5 <= 1000L) }
  }

  test("scrubPassages: canonical occurrence survives, every other copy goes") {
    val sparkSession = spark
    import sparkSession.implicits._
    // Passage "p q r s t" (w=3 windows of it) appears in docs 10, 20, and
    // TWICE in 30. With w=3/minDocs=2 every 3-gram inside it is shared, so:
    // doc 10 (smallest id) keeps its copy, doc 20 loses it, doc 30 loses
    // both copies — including its second one even though doc 30 also hosts
    // an occurrence chain. Unique surrounding words are untouched.
    val d = Seq(
      (10L, "a b p q r s t c d"),
      (20L, "e f p q r s t g h"),
      (30L, "p q r s t i j p q r s t"),
      (40L, "k l m n o")).toDF("doc_id", "text")
    val got = Dedup.scrubPassages(d, w = 3, minDocs = 2L)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(10L) === (("a b p q r s t c d", 9L, 0L)))
    assert(got(20L) === (("e f g h", 4L, 5L)))
    assert(got(30L) === (("i j", 2L, 10L)))
    assert(got(40L) === (("k l m n o", 5L, 0L)))
    // Raising minDocs above the sharing degree scrubs nothing.
    val none = Dedup.scrubPassages(d, w = 3, minDocs = 5L)
      .as[(Long, String, Long, Long)].collect()
    assert(none.forall(_._4 === 0L))
  }

  test("scrubPassagesIncremental: corpus windows go entirely, batch-internal dups stay") {
    val sparkSession = spark
    import sparkSession.implicits._
    val corpus = Seq(
      (1L, "x y p q r s t z"),
      (2L, "unrelated corpus words here")).toDF("doc_id", "text")
    val batch = Seq(
      // Hosts the corpus passage — EVERY occurrence goes (no canonical
      // survivor: the corpus already holds the text).
      (100L, "a b p q r s t c"),
      // Batch-internal duplicate pair sharing "u v w" — deliberately kept:
      // batch-internal dedup is scrubPassages' job, the two compose.
      (101L, "u v w d e"),
      (102L, "u v w f g")).toDF("doc_id", "text")
    val got = Dedup.scrubPassagesIncremental(
        batch, Dedup.passageIndex(corpus, w = 3), w = 3)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(100L) === (("a b c", 3L, 5L)))
    assert(got(101L) === (("u v w d e", 5L, 0L)))
    assert(got(102L) === (("u v w f g", 5L, 0L)))
  }

  test("ngramContainment flags subset duplication that Jaccard structurally misses") {
    val sparkSession = spark
    import sparkSession.implicits._
    graft.plans.GraftExtensions.register(spark)
    // Doc 1 is doc 2's opening passage verbatim; doc 2 continues with 24
    // more words. Every 3-shingle of doc 1 is in doc 2 ⇒ containment = 1.0,
    // while Jaccard ≈ |A|/|B| ≈ 0.15 stays under any useful threshold.
    val inner = "alpha beta gamma delta epsilon zeta"
    val filler = (1 to 24).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, inner),
      (2L, s"$inner $filler"),
      (3L, "totally different content words only here")
    ).toDF("doc_id", "text")
    val contained = Dedup.ngramContainment(docs, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(contained.map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
    val p = contained.head
    assert(p._3 === 4L)              // |A|: 6 words → 4 shingles
    assert(p._5 === 4L && p._6 === 1.0, "full containment")
    // The symmetric form misses it at the same threshold — and even at 0.5.
    assert(Dedup.ngramJaccard(docs, threshold = 0.5).count() === 0L)
    // Sanity on the relationship: containment >= jaccard for every pair.
    val j = Dedup.ngramJaccard(docs, threshold = 0.0).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    contained.foreach { c =>
      assert(c._6 >= j((c._1, c._2)) - 1e-12) }
  }
}
