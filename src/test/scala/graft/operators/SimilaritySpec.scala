package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.plans.GraftExtensions

/** Similarity numerics: the codegen'd VecDot must be bit-identical to the
  * built-ins-only fold, and the bucketed ANN must agree with brute force on
  * the pairs it surfaces. */
class SimilaritySpec extends SparkSpec {

  private def emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")

  test("vec_dot (codegen) is bit-identical to the declarative fold") {
    GraftExtensions.register(spark)
    val df = emb.limit(100).select(
      Similarity.dot("embedding", "embedding").as("fast"),
      Similarity.dotFold("embedding", "embedding").as("ref"))
    assert(df.filter(col("fast") =!= col("ref")).count() === 0L)
    // And on distinct vectors via a self-pair:
    val a = emb.filter(col("vec_id") === 0).select(col("embedding").as("va"))
    val b = emb.filter(col("vec_id") === 1).select(col("embedding").as("vb"))
    val pair = a.crossJoin(b).select(
      Similarity.dot("va", "vb").as("fast"),
      Similarity.dotFold("va", "vb").as("ref")).head()
    assert(pair.getDouble(0) === pair.getDouble(1))
  }

  test("vec_dot nulls on length mismatch like zip_with padding") {
    GraftExtensions.register(spark)
    val sparkSession = spark
    import sparkSession.implicits._
    val df = Seq((Seq(1f, 2f), Seq(1f, 2f, 3f))).toDF("a", "b")
      .select(Similarity.dot("a", "b").as("d"))
    assert(df.head().isNullAt(0))
  }

  test("zero-norm vectors yield NULL cosine, never NaN or a divide error") {
    GraftExtensions.register(spark)
    val sparkSession = spark
    import sparkSession.implicits._
    val df = Seq((Seq(0f, 0f, 0f), Seq(1f, 2f, 3f))).toDF("a", "b")
    assert(df.select(Similarity.cosine("a", "b")).head().isNullAt(0))
    assert(df.select(Similarity.cosine("a", "a")).head().isNullAt(0))
  }

  test("IVF ANN: every reported neighbor matches brute force sim exactly") {
    GraftExtensions.register(spark)
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val brute = Similarity.knn(emb, queries, k = 500)
      .select(col("q_id"), col("vec_id"), col("sim"))
    val ivf = Similarity.knnIvf(emb, queries, k = 10, numCentroids = 8, nprobe = 2)
    val joined = ivf.as("x").join(brute.as("y"),
      col("x.q_id") === col("y.q_id") && col("x.vec_id") === col("y.vec_id"))
    assert(joined.count() === ivf.count())
    assert(joined.filter(col("x.sim") =!= col("y.sim")).count() === 0L)
    // nprobe=2 of 8 cells must return results for every query.
    assert(ivf.select("q_id").distinct().count() === queries.count())
  }

  test("kmeans: k centroids, argmin assignment, trained IVF sims match brute force") {
    GraftExtensions.register(spark)
    val cents = Similarity.kmeans(emb, k = 4, iters = 3)
    assert(cents.size === 4)
    assert(cents.forall(_.size === cents.head.size)) // uniform dim
    // Trained IVF results must score identically to brute force.
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val brute = Similarity.knn(emb, queries, k = 500)
      .select(col("q_id"), col("vec_id"), col("sim"))
    val ivf = Similarity.knnIvfWith(emb, queries, k = 10,
      cents.zipWithIndex.map { case (cv, i) => (i.toLong, cv) }, nprobe = 2)
    val joined = ivf.as("x").join(brute.as("y"),
      col("x.q_id") === col("y.q_id") && col("x.vec_id") === col("y.vec_id"))
    assert(joined.count() === ivf.count())
    assert(joined.filter(col("x.sim") =!= col("y.sim")).count() === 0L)
  }

  test("kmeans is bit-identical across partitionings (sorted-fold means)") {
    GraftExtensions.register(spark)
    val base = Similarity.kmeans(emb, k = 4, iters = 3)
    // Different layouts: single partition and a shuffled 7-way repartition —
    // avg-based means would differ in the last ulps; the sorted sequential
    // fold must not.
    val one = Similarity.kmeans(emb.coalesce(1), k = 4, iters = 3)
    val seven = Similarity.kmeans(emb.repartition(7, col("vec_id")), k = 4, iters = 3)
    assert(one === base)
    assert(seven === base)
  }

  test("kmeans: an emptied cell keeps its previous centroid") {
    GraftExtensions.register(spark)
    val sparkSession = spark
    import sparkSession.implicits._
    // Seeds = 3 lowest-id vectors; ids 1 and 2 are IDENTICAL, so every
    // vector ties between centroids 1 and 2 at equal distance and the tie
    // breaks toward the lower index — cell 2 empties and must keep its seed
    // centroid verbatim while cells 0/1 move to their members' means.
    val tiny = Seq(
      (0L, Seq(0f, 0f)), (1L, Seq(10f, 0f)), (2L, Seq(10f, 0f)),
      (3L, Seq(0f, 1f)), (4L, Seq(9f, 1f)), (5L, Seq(11f, 0f))
    ).toDF("vec_id", "embedding")
    val cents = Similarity.kmeans(tiny, k = 3, iters = 1)
    assert(cents.size === 3)
    assert(cents(2) === Seq(10d, 0d))  // untouched seed (empty cell)
    assert(cents(0) === Seq(0d, 0.5d)) // mean of {v0, v3}
    assert(cents(1) === Seq(10d, 0.25d)) // mean of {v1, v2, v4, v5}
  }

  test("kmeans at sf0.1 with large k: stable under repartitioning, uniform dims") {
    GraftExtensions.register(spark)
    // Real-cluster fixture where cells CAN empty (large k over 16 labels);
    // the determinism contract must hold regardless.
    val big = graft.Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
    val a = Similarity.kmeans(big, k = 48, iters = 2)
    val b = Similarity.kmeans(big.repartition(11, col("vec_id")), k = 48, iters = 2)
    assert(a.size === 48)
    assert(a.forall(_.size === a.head.size))
    assert(a === b)
  }

  test("ANN recall levers behave as documented (nprobe, multiprobe, training)") {
    GraftExtensions.register(spark)
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val brute = Similarity.knn(emb, queries, 10).select("q_id", "vec_id")
    val total = brute.count().toDouble
    def recall(df: org.apache.spark.sql.DataFrame): Double =
      df.select("q_id", "vec_id").intersect(brute).count() / total

    val ivf2 = recall(Similarity.knnIvf(emb, queries, 10, numCentroids = 8, nprobe = 2))
    val ivf4 = recall(Similarity.knnIvf(emb, queries, 10, numCentroids = 8, nprobe = 4))
    val bucketed = recall(Similarity.knnBucketed(emb, queries, 10, bits = 4))
    val multi = recall(Similarity.knnMultiprobe(emb, queries, 10, bits = 4))
    val cents = Similarity.kmeans(emb, 8, 3).zipWithIndex.map { case (c, i) => (i.toLong, c) }
    val trained = recall(Similarity.knnIvfWith(emb, queries, 10, cents, nprobe = 2))

    // The documented levers, as inequalities on this deterministic fixture
    // (measured: ivf2 0.44, ivf4 0.62, bucketed 0.05, multi 0.46,
    // trained 0.48): more probes → more recall; hamming-1 probing rescues
    // the coarse sign quantizer; trained centroids beat seed centroids.
    assert(ivf4 > ivf2, s"nprobe lever broken: ivf4=$ivf4 ivf2=$ivf2")
    assert(multi > bucketed, s"multiprobe lever broken: multi=$multi bucketed=$bucketed")
    assert(trained >= ivf2, s"training hurt recall: trained=$trained ivf2=$ivf2")
    assert(ivf4 >= 0.5, s"ivf nprobe=4 recall degenerate: $ivf4")
  }

  test("hardNegatives: cross-label only, bucket-consistent, equals filtered re-rank") {
    GraftExtensions.register(spark)
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val hn = Similarity.hardNegatives(emb, queries, k = 10, bits = 4)
    val rows = hn.collect()
    assert(rows.nonEmpty)
    // The defining predicate: NO returned negative shares its query's label.
    assert(rows.forall(r => r.getInt(1) != r.getInt(3)),
      "hard negative with the query's own label")
    // Candidates come from the query's sign-bucket cell: every returned
    // pair must agree on the 4-bit bucket.
    val bkt = emb.select(col("vec_id"),
      Similarity.signBucket("embedding", 4).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.forall(r => bkt(r.getLong(0)) == bkt(r.getLong(2))),
      "negative drawn from a different bucket cell")
    // Independent reference: brute-force cosine top-k per query restricted
    // to (same bucket, different label) — must match exactly, ranks and all.
    val lbl = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val brute = Similarity.knn(emb, queries, k = emb.count().toInt)
      .collect()
      .filter(r => bkt(r.getLong(0)) == bkt(r.getLong(1)) &&
        lbl(r.getLong(0)) != lbl(r.getLong(1)))
      .groupBy(_.getLong(0))
      .toSeq.flatMap { case (q, rs) =>
        rs.sortBy(r => (-r.getDouble(3), r.getLong(1))).take(10).zipWithIndex
          .map { case (r, i) => (q, r.getLong(1), i + 1, r.getDouble(3)) }
      }.toSet
    val got = rows.map(r =>
      (r.getLong(0), r.getLong(2), r.getInt(4), r.getDouble(5))).toSet
    assert(got === brute, "hardNegatives disagrees with filtered brute force")
  }

  test("declared recall floors: production ANN configs cannot silently degrade") {
    GraftExtensions.register(spark)
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val brute = Similarity.knn(emb, queries, 10).select("q_id", "vec_id")
    val total = brute.count().toDouble
    def recall(df: org.apache.spark.sql.DataFrame): Double =
      df.select("q_id", "vec_id").intersect(brute).count() / total

    // Floors for the EXACT configurations SparkEntry ships (q_knn_multiprobe
    // bits=4; q_knn_ivf numCentroids=8, nprobe=2). The fixture is fully
    // deterministic (measured 0.46 / 0.44), so a floor at 0.40 trips on any
    // real recall regression — a tuning change that keeps hashes green but
    // guts recall now fails HERE instead of shipping.
    val multi = recall(Similarity.knnMultiprobe(emb, queries, 10, bits = 4))
    assert(multi >= 0.40, s"q_knn_multiprobe recall floor broken: $multi < 0.40")
    val ivf = recall(Similarity.knnIvf(emb, queries, 10, numCentroids = 8, nprobe = 2))
    assert(ivf >= 0.40, s"q_knn_ivf recall floor broken: $ivf < 0.40")

    // And the scale path must be able to BUY recall with probes: at
    // nprobe = 7 of 8 cells the IVF index must clear 0.9 (nprobe = 6
    // measures 0.88 on this fixture) — the declared high-recall operating
    // point for when precision matters more than probe cost.
    val ivfHigh = recall(Similarity.knnIvf(emb, queries, 10, numCentroids = 8, nprobe = 7))
    assert(ivfHigh >= 0.9, s"ivf high-recall point broken: $ivfHigh < 0.9")
  }

  test("kmeans distortion is non-increasing over iterations") {
    GraftExtensions.register(spark)
    def distortion(cents: Seq[Seq[Double]]): Double = {
      val dists = org.apache.spark.sql.functions.array(cents.map { cv =>
        val cn2 = cv.foldLeft(0d)((a, x) => a + x * x)
        org.apache.spark.sql.functions.call_function("vec_dot", col("embedding"), col("embedding")) +
          org.apache.spark.sql.functions.lit(cn2) -
          org.apache.spark.sql.functions.lit(2d) *
            org.apache.spark.sql.functions.call_function("vec_dot", col("embedding"),
              org.apache.spark.sql.functions.typedLit(cv))
      }: _*)
      emb.select(org.apache.spark.sql.functions.array_min(dists).as("d2"))
        .agg(org.apache.spark.sql.functions.sum("d2")).head().getDouble(0)
    }
    val d1 = distortion(Similarity.kmeans(emb, k = 4, iters = 1))
    val d3 = distortion(Similarity.kmeans(emb, k = 4, iters = 3))
    assert(d3 <= d1 + 1e-9)
  }

  test("bucketed ANN ranks candidates identically to brute force within cells") {
    GraftExtensions.register(spark)
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val brute = Similarity.knn(emb, queries, k = 500)
      .select(col("q_id"), col("vec_id"), col("sim"))
    val bucketed = Similarity.knnBucketed(emb, queries, k = 10, bits = 4)
    // Every bucketed (pair, sim) must appear in brute force with equal sim.
    val joined = bucketed.as("x").join(brute.as("y"),
      col("x.q_id") === col("y.q_id") && col("x.vec_id") === col("y.vec_id"))
    assert(joined.count() === bucketed.count())
    assert(joined.filter(col("x.sim") =!= col("y.sim")).count() === 0L)
  }

  test("int8 codes stay in [-127,127] and dequantize within scale/2 per element") {
    GraftExtensions.register(spark)
    val checked = emb.select(
      graft.functions.SqlLet.let2(
        Similarity.int8Codes("embedding"), Similarity.int8Scale("embedding"),
        (qc, s) => struct(
          array_max(transform(qc, c => abs(c))).as("maxcode"),
          // max |q_i*s - v_i| over the vector — the round-off bound.
          array_max(zip_with(qc, col("embedding"),
            (q, v) => abs(q.cast("double") * s - v.cast("double")))).as("maxerr"),
          (s / 2 + lit(1e-12)).as("bound"))).as("z"))
      .select(col("z.*"))
    assert(checked.filter(col("maxcode") > 127).count() === 0L)
    assert(checked.filter(col("maxerr") > col("bound")).count() === 0L)
  }

  test("int8 zero vector quantizes to scale 0 and all-zero codes") {
    GraftExtensions.register(spark)
    val sparkSession = spark
    import sparkSession.implicits._
    val z = Seq(Seq(0f, 0f, 0f)).toDF("embedding")
      .select(Similarity.int8Scale("embedding").as("s"),
        Similarity.int8Codes("embedding").as("qc")).head()
    assert(z.getDouble(0) === 0d)
    assert(z.getSeq[Int](1) === Seq(0, 0, 0))
  }

  test("knnQuantized with exhaustive candidates equals exact bucketed kNN") {
    GraftExtensions.register(spark)
    val queries = emb.filter(col("vec_id") % 50 === 0)
    // candMult large enough to keep every cellmate → the re-rank is over
    // the full cell and must reproduce knnBucketed exactly.
    val exhaustive = Similarity.knnQuantized(emb, queries, k = 10,
      bits = 4, candMult = 1000)
    val exact = Similarity.knnBucketed(emb, queries, k = 10, bits = 4)
    assert(exhaustive.collect().toSet === exact.collect().toSet)
  }

  test("knnQuantized returns deterministic candidates at tight candMult") {
    GraftExtensions.register(spark)
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val a = Similarity.knnQuantized(emb, queries, k = 10, bits = 4, candMult = 2)
      .collect().toSet
    val b = Similarity.knnQuantized(emb.repartition(7), queries, k = 10,
      bits = 4, candMult = 2).collect().toSet
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("crossBlockedNearDup flags planted probe dups, respects block boundaries") {
    GraftExtensions.register(spark)
    val sparkSession = spark
    import sparkSession.implicits._
    val corpus = Seq(
      (1L, "b0", Array(1f, 0f, 0f)),
      (2L, "b1", Array(0f, 1f, 0f))
    ).toDF("vec_id", "label", "embedding")
    val probe = Seq(
      (10L, "b0", Array(0.99f, 0.1f, 0f)), // near-dup of 1, same block → flagged
      (11L, "b1", Array(0.99f, 0.1f, 0f)), // near 1 but BLOCKED apart → not flagged
      (12L, "b0", Array(0f, 0f, 1f))       // orthogonal → not flagged
    ).toDF("vec_id", "label", "embedding")
    val got = Similarity.crossBlockedNearDup(corpus, probe, "label", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((10L, 1L)))
  }

  test("blockedNearDup: oversized block is capped, polite block kept") {
    GraftExtensions.register(spark)
    val sparkSession = spark
    import sparkSession.implicits._
    // 20 identical vectors in one block (190 pairs uncapped) beside a
    // 2-vector near-dup block. maxBlock = 8 drops the hot block wholesale,
    // keeps the polite pair — Dedup.MaxBucket discipline.
    val hot = (1L to 20L).map(i => (i, "big", Array(1f, 0f, 0f)))
    val polite = Seq((100L, "ok", Array(0f, 1f, 0f)),
      (101L, "ok", Array(0f, 0.99f, 0.1f)))
    val df = (hot ++ polite).toDF("vec_id", "label", "embedding")
    val capped = Similarity.blockedNearDup(df, "label", 0.9, maxBlock = 8L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === Set((100L, 101L)))
    assert(Similarity.blockedNearDup(df, "label", 0.9).count() === 190L + 1L)
  }
}
