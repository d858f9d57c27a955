package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryPack

/** Similarity-search queries over `embeddings` (dim-64 float vectors).
  * Query set = every 50th vector; k = 10. Oracle cosine uses the identical
  * formula (sequential double dot, separate sqrts, round 6) so values
  * compare exactly. */
object SimilarityPack extends QueryPack {

  private val K = 10
  private val NearDupThreshold = 0.3

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_knn_topk" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      val emb = table(s, dir, "embeddings")
      Similarity.knn(emb, emb.filter(col("vec_id") % 50 === 0), K)
    },
    "q_knn_bucketed" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      val emb = table(s, dir, "embeddings")
      Similarity.knnBucketed(emb, emb.filter(col("vec_id") % 50 === 0), K, bits = 4)
    },
    "q_knn_multiprobe" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      val emb = table(s, dir, "embeddings")
      Similarity.knnMultiprobe(emb, emb.filter(col("vec_id") % 50 === 0), K, bits = 4)
    },
    "q_embed_neardup" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      Similarity.blockedNearDup(table(s, dir, "embeddings"), "label", NearDupThreshold)
    },
    // Hard-negative mining for contrastive training: per query, top-k
    // nearest vectors of a DIFFERENT label from the query's sign-bucket
    // cell (label mismatch fused into the candidate equi-join).
    "q_hard_negatives" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      val emb = table(s, dir, "embeddings")
      Similarity.hardNegatives(emb, emb.filter(col("vec_id") % 50 === 0), K,
        bits = 4)
    },
    "q_knn_ivf" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      val emb = table(s, dir, "embeddings")
      Similarity.knnIvf(emb, emb.filter(col("vec_id") % 50 === 0), K,
        numCentroids = 8, nprobe = 2)
    },
    // Trained IVF: 3 Lloyd iterations for the centroids. The k-means mean is
    // a sorted sequential fold (see Similarity.kmeans), so the oracle
    // replicates the whole training run bit-for-bit and this query
    // hash-compares like the rest.
    "q_knn_ivf_trained" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      val emb = table(s, dir, "embeddings")
      val cents = Similarity.kmeans(emb, k = 8, iters = 3)
        .zipWithIndex.map { case (cv, i) => (i.toLong, cv) }
      Similarity.knnIvfWith(emb, emb.filter(col("vec_id") % 50 === 0), K,
        cents, nprobe = 2)
    },
    // Recall@k of the sign-bucketed ANN against the brute-force truth —
    // the number that justifies (or indicts) the scale path: both variants
    // are already individually oracle-pinned; this query pins their
    // OVERLAP per query point. n_hits is an exact integer; recall is one
    // IEEE division of exact ints.
    "q_knn_recall" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      val emb = table(s, dir, "embeddings")
      val qs = emb.filter(col("vec_id") % 50 === 0)
      val brute = Similarity.knn(emb, qs, K).select(col("q_id"), col("vec_id"))
        .localCheckpoint(eager = true) // truth set feeds both overlap joins
      def hitsOf(approx: DataFrame, as: String): DataFrame =
        brute.join(approx.select(col("q_id"), col("vec_id")),
            Seq("q_id", "vec_id"), "left_semi")
          .groupBy("q_id").agg(count(lit(1)).as(as))
      val hb = hitsOf(Similarity.knnBucketed(emb, qs, K, bits = 4), "h_bkt")
      val hm = hitsOf(Similarity.knnMultiprobe(emb, qs, K, bits = 4), "h_mp")
      // Left joins from the query list: a query whose buckets missed ALL
      // true neighbors must report recall 0, not vanish.
      qs.select(col("vec_id").as("q_id"))
        .join(hb, Seq("q_id"), "left").join(hm, Seq("q_id"), "left")
        .select(col("q_id"),
          coalesce(col("h_bkt"), lit(0L)).as("hits_bucketed"),
          (coalesce(col("h_bkt"), lit(0L)) / lit(K.toDouble)).as("recall_bucketed"),
          coalesce(col("h_mp"), lit(0L)).as("hits_multiprobe"),
          (coalesce(col("h_mp"), lit(0L)) / lit(K.toDouble)).as("recall_multiprobe"))
    },
    // Incremental EMBEDDING ingest — the semantic twin of
    // q_dedup_incremental: the last fifth of vec_ids plays the incoming
    // batch, kept only when no same-block corpus vector sits within the
    // near-dup cosine threshold. Blocked equi-join + LEFT ANTI, no
    // all-pairs work.
    "q_embed_incremental" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      val emb = table(s, dir, "embeddings")
      val isBatch = col("vec_id") % 10 >= 8
      val dups = Similarity.crossBlockedNearDup(
        emb.filter(!isBatch), emb.filter(isBatch), "label", NearDupThreshold)
      // No distinct on the pair side: LEFT ANTI is insensitive to
      // duplicate right keys, so deduping first would just add a shuffle.
      emb.filter(isBatch).select(col("vec_id"))
        .join(dups.select(col("probe_id").as("vec_id")), Seq("vec_id"), "left_anti")
    },
    // Recall@10 of the IVF path (8 seed centroids, nprobe 2) against the
    // same brute-force truth — completes the recall ladder next to the
    // sign-bucket and multiprobe rows of q_knn_recall.
    "q_knn_recall_ivf" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      val emb = table(s, dir, "embeddings")
      val qs = emb.filter(col("vec_id") % 50 === 0)
      // Truth set materialized eagerly (like q_knn_recall): the brute
      // baseline's documented cross join stays inside the checkpoint.
      val hits = Similarity.knn(emb, qs, K).select(col("q_id"), col("vec_id"))
        .localCheckpoint(eager = true)
        .join(Similarity.knnIvf(emb, qs, K, numCentroids = 8, nprobe = 2)
          .select(col("q_id"), col("vec_id")), Seq("q_id", "vec_id"), "left_semi")
        .groupBy("q_id").agg(count(lit(1)).as("h"))
      qs.select(col("vec_id").as("q_id"))
        .join(hits, Seq("q_id"), "left")
        .select(col("q_id"),
          coalesce(col("h"), lit(0L)).as("hits_ivf"),
          (coalesce(col("h"), lit(0L)) / lit(K.toDouble)).as("recall_ivf"))
    },
    // Int8 quantization audit: per-vector scale + exact integer code sums.
    // qsum/qnorm are order-independent integer aggregates — the cheap
    // engine-portable checksum of the whole code table.
    "q_embed_quantize" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      table(s, dir, "embeddings").select(col("vec_id"),
          graft.functions.SqlLet.let(Similarity.int8Codes("embedding"), qc =>
            struct(Similarity.int8Scale("embedding").as("scale"),
              aggregate(qc, lit(0L), (a, x) => a + x.cast("long")).as("qsum"),
              Similarity.qdot(qc, qc).as("qnorm"))).as("z"))
        .select(col("vec_id"), col("z.scale"), col("z.qsum"), col("z.qnorm"))
    },
    // Coarse cell → int8-code candidate ranking → exact float re-rank.
    "q_knn_quantized" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      val emb = table(s, dir, "embeddings")
      Similarity.knnQuantized(emb, emb.filter(col("vec_id") % 50 === 0), K,
        bits = 4, candMult = 3)
    },
    // Per-label centroid accumulators (class prototypes): component sums
    // in fixed point — ×2^20 is a pure exponent shift (exact on every
    // float), floor+long sums commute across any partitioning, so the
    // centroid is bit-identical on Spark and the oracle; the caller
    // divides sum_fp/n at read time. One shuffle on (label, dim) with
    // map-side partials; posexplode is narrow. At 100 TB the reduce side
    // is labels × dims — model-sized, not data-sized.
    "q_label_centroids" -> { (s, dir) =>
      table(s, dir, "embeddings")
        .select(col("label").cast("long").as("label"),
          posexplode(col("embedding")))
        .groupBy(col("label"), col("pos").cast("long").as("dim"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("col").cast("double") * 1048576L)).as("sum_fp"))
    },
    // Edit-distance similarity join on 32-char document prefixes — the
    // PassJoin segment-signature plan (FuzzyJoin.editJoin): exact ed<=2
    // semantics with equi-join candidate generation instead of a cross
    // join. The oracle is the brute-force levenshtein join, so a green row
    // proves the signature scheme loses no pairs.
    "q_fuzzy_join" -> { (s, dir) =>
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), substring(col("text"), 1, 32).as("prefix"))
      FuzzyJoin.editJoin(docs, k = 2, idCol = "doc_id", strCol = "prefix")
        .select(col("left_id"), col("right_id"), col("dist").cast("long").as("dist"))
    },
    // Embedding-space dedup clusters: connected components over the blocked
    // cosine near-dup pairs (the same CC core as q_dedup_clusters, fed by a
    // different similarity operator — the point of the refactor).
    "q_embed_clusters" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      val emb = table(s, dir, "embeddings")
      Dedup.connectedComponents(
        emb.select(col("vec_id").as("node")),
        Similarity.blockedNearDup(emb, "label", NearDupThreshold)
          .select(col("id_a").as("src"), col("id_b").as("dst")))
        .select(col("node").as("vec_id"), col("cluster_id"))
    }
  )

  /** The pinned cosine expression (sequential double dot, separate sqrts,
    * round 6) — ONE definition interpolated into every oracle, so the
    * formula these oracles exist to pin cannot drift between variants. */
  private def cosSql(a: String, b: String): String =
    s"round(list_dot_product($a, $b) / " +
      s"(sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))), 6)"

  /** 4-bit sign bucket of the first dims, exact float compare both sides. */
  private def bucketSql(v: String): String =
    (0 until 4).map(d => s"(CASE WHEN $v[${d + 1}] > 0 THEN ${1 << d} ELSE 0 END)")
      .mkString(" + ")

  /** The IVF assign + probe CTE pair over centroid CTE `$cent` — ONE
    * definition of the distance/tie-break convention ((v·v + c·c) − 2·v·c,
    * ties toward the lower centroid id, nprobe = 2, query set = every 50th
    * vector) shared by all three IVF oracles so they cannot drift.
    * Margins already stripped — compose with `Seq(...).mkString(",\n")`. */
  private def ivfAssignProbes(cent: String): String =
    s"""assign AS (SELECT vec_id, v, cell FROM (
       |  SELECT e.vec_id, e.v, c.c_id AS cell, row_number() OVER (PARTITION BY e.vec_id
       |    ORDER BY (list_dot_product(e.v, e.v) + list_dot_product(c.cv, c.cv))
       |      - 2 * list_dot_product(e.v, c.cv), c.c_id) AS rn
       |  FROM e, $cent c) WHERE rn = 1),
       |probes AS (SELECT q_id, qv, cell AS probe FROM (
       |  SELECT e.vec_id AS q_id, e.v AS qv, c.c_id AS cell, row_number() OVER (PARTITION BY e.vec_id
       |    ORDER BY (list_dot_product(e.v, e.v) + list_dot_product(c.cv, c.cv))
       |      - 2 * list_dot_product(e.v, c.cv), c.c_id) AS rn
       |  FROM e, $cent c WHERE e.vec_id % 50 = 0) WHERE rn <= 2)""".stripMargin

  /** The IVF exact-rerank tail: cosine-score the probed candidates, take
    * top-[[K]] under the (sim desc, id) total order. Margins stripped. */
  private def ivfScoredTail: String =
    s"""scored AS (SELECT p.q_id, a.vec_id,
       |  ${cosSql("p.qv", "a.v")} AS sim
       |  FROM probes p JOIN assign a ON a.cell = p.probe AND a.vec_id != p.q_id),
       |ranked AS (SELECT *, row_number() OVER
       |  (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rank FROM scored)
       |SELECT q_id, vec_id, rank, sim FROM ranked WHERE rank <= $K""".stripMargin

  /** One Lloyd iteration as raw CTE fragments (no margins — appended into
    * the final query verbatim): assign by argmin((v·v + c·c) − 2·v·c, c_id),
    * re-mean each (cell, dim) as a sequential double fold over values in
    * ascending vec_id order (list_reduce with an explicit 0.0 seed — the
    * exact association order of Similarity.kmeans), empty cells keep the
    * previous centroid. */
  private def lloydIter(prev: String, a: String, m: String, c: String): String =
    s"""$a AS (SELECT vec_id, v, cell FROM (
       |  SELECT e.vec_id, e.v, c.c_id AS cell, row_number() OVER (PARTITION BY e.vec_id
       |    ORDER BY (list_dot_product(e.v, e.v) + list_dot_product(c.cv, c.cv))
       |      - 2 * list_dot_product(e.v, c.cv), c.c_id) AS rn
       |  FROM e, $prev c) WHERE rn = 1),
       |$m AS (SELECT cell, pos,
       |    list_reduce([0.0::DOUBLE] || list(val ORDER BY vec_id), (x, y) -> x + y)
       |      / count(*) AS m
       |  FROM (SELECT vec_id, cell, generate_subscripts(v, 1) AS pos,
       |        unnest(v) AS val FROM $a)
       |  GROUP BY cell, pos),
       |$c AS (SELECT p.c_id, coalesce(n.cv, p.cv) AS cv FROM $prev p LEFT JOIN
       |  (SELECT cell AS c_id, list(m ORDER BY pos) AS cv FROM $m GROUP BY cell) n
       |  ON n.c_id = p.c_id)""".stripMargin

  /** Shared int8-quantization CTE: DOUBLE[] vectors + BIGINT codes. The
    * floor(x/scale + 0.5) form is the exact expression Spark runs; BIGINT
    * code lists keep list_dot_product integer-valued (exact in double).
    * Raw margins — interpolated into strings that stripMargin ONCE. */
  private val QuantCtes =
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] v,
       |    ${bucketSql("embedding")} AS bkt FROM embeddings),
       |sc AS (SELECT vec_id, v, bkt,
       |    list_max(list_transform(v, x -> abs(x))) / 127 AS scale FROM e),
       |c AS (SELECT vec_id, v, bkt, scale,
       |    CASE WHEN scale = 0 THEN [CAST(0 AS BIGINT) FOR x IN v]
       |         ELSE list_transform(v, x -> CAST(floor(x / scale + 0.5) AS BIGINT))
       |    END AS qc FROM sc)"""

  override def oracles: Map[String, String] = Map(
    // Brute-force edit-distance join (DuckDB's native levenshtein) with the
    // operator's orientation rule: left = shorter string, ties by id. The
    // length-band predicate is implied by ed<=2 — it only prunes the cross
    // join for the oracle's own runtime.
    "q_fuzzy_join" ->
      """WITH d AS (SELECT doc_id, substr(text, 1, 32) AS p FROM documents)
        |SELECT a.doc_id AS left_id, b.doc_id AS right_id,
        |  CAST(levenshtein(a.p, b.p) AS BIGINT) AS dist
        |FROM d a JOIN d b
        |  ON (length(a.p) < length(b.p)
        |      OR (length(a.p) = length(b.p) AND a.doc_id < b.doc_id))
        | AND abs(length(a.p) - length(b.p)) <= 2
        |WHERE levenshtein(a.p, b.p) <= 2""".stripMargin,
    "q_embed_quantize" ->
      s"""WITH $QuantCtes
         |SELECT vec_id, scale,
         |  list_reduce([CAST(0 AS BIGINT)] || qc, (a, b) -> a + b) AS qsum,
         |  list_reduce([CAST(0 AS BIGINT)] || list_transform(qc, x -> x * x),
         |    (a, b) -> a + b) AS qnorm
         |FROM c""".stripMargin,
    "q_label_centroids" ->
      """SELECT CAST(label AS BIGINT) AS label, CAST(u.s.dim AS BIGINT) AS dim,
        |  count(*) AS n,
        |  CAST(sum(CAST(floor(CAST(u.s.x AS DOUBLE) * 1048576) AS BIGINT))
        |    AS BIGINT) AS sum_fp
        |FROM embeddings,
        |  unnest([{'dim': i, 'x': embedding[i+1]}
        |          for i in range(0, len(embedding))]) u(s)
        |GROUP BY 1, 2""".stripMargin,
    "q_knn_quantized" ->
      s"""WITH $QuantCtes,
         |q AS (SELECT vec_id AS q_id, v AS qv, bkt AS q_bkt, qc AS q_qc
         |  FROM c WHERE vec_id % 50 = 0),
         |cand AS (SELECT q.q_id, c.vec_id, qv, v,
         |    list_dot_product(q_qc, qc) /
         |      nullif(sqrt(list_dot_product(qc, qc)) *
         |        sqrt(list_dot_product(q_qc, q_qc)), 0) AS qsim
         |  FROM q JOIN c ON c.bkt = q.q_bkt AND c.vec_id != q.q_id),
         |surv AS (SELECT q_id, vec_id, qv, v FROM (SELECT *, row_number() OVER
         |    (PARTITION BY q_id ORDER BY qsim DESC NULLS LAST, vec_id ASC) AS qrank
         |  FROM cand) WHERE qrank <= ${K * 3}),
         |ranked AS (SELECT q_id, vec_id,
         |    ${cosSql("qv", "v")} AS sim
         |  FROM surv)
         |SELECT q_id, vec_id, rank, sim FROM (SELECT *, row_number() OVER
         |    (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rank FROM ranked)
         |WHERE rank <= $K""".stripMargin,
    "q_knn_bucketed" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v,
         |    ${bucketSql("embedding")} AS bkt FROM embeddings),
         |q AS (SELECT vec_id AS q_id, v AS qv, bkt AS q_bkt FROM e WHERE vec_id % 50 = 0),
         |scored AS (
         |  SELECT q.q_id, e.vec_id,
         |    ${cosSql("qv", "v")} AS sim
         |  FROM q JOIN e ON e.bkt = q.q_bkt AND e.vec_id != q.q_id),
         |ranked AS (SELECT *, row_number() OVER
         |  (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rank FROM scored)
         |SELECT q_id, vec_id, rank, sim FROM ranked WHERE rank <= $K""".stripMargin,
    // knnBucketed's oracle with labels carried and the mismatch predicate
    // in the join — same cell candidates, same cosine, same rank window.
    "q_hard_negatives" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] v,
         |    ${bucketSql("embedding")} AS bkt FROM embeddings),
         |q AS (SELECT vec_id AS q_id, label AS q_label, v AS qv, bkt AS q_bkt
         |  FROM e WHERE vec_id % 50 = 0),
         |scored AS (
         |  SELECT q.q_id, q.q_label, e.vec_id, e.label,
         |    ${cosSql("qv", "v")} AS sim
         |  FROM q JOIN e ON e.bkt = q.q_bkt AND e.label != q.q_label),
         |ranked AS (SELECT *, row_number() OVER
         |  (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rank FROM scored)
         |SELECT q_id, q_label, vec_id, label, rank, sim
         |FROM ranked WHERE rank <= $K""".stripMargin,
    "q_knn_multiprobe" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v,
         |    ${bucketSql("embedding")} AS bkt FROM embeddings),
         |q AS (SELECT vec_id AS q_id, v AS qv, bkt AS q_bkt FROM e WHERE vec_id % 50 = 0),
         |probes AS (SELECT q_id, qv, unnest([q_bkt, xor(q_bkt, 1), xor(q_bkt, 2),
         |    xor(q_bkt, 4), xor(q_bkt, 8)]) AS probe FROM q),
         |scored AS (
         |  SELECT p.q_id, e.vec_id,
         |    ${cosSql("qv", "v")} AS sim
         |  FROM probes p JOIN e ON e.bkt = p.probe AND e.vec_id != p.q_id),
         |ranked AS (SELECT *, row_number() OVER
         |  (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rank FROM scored)
         |SELECT q_id, vec_id, rank, sim FROM ranked WHERE rank <= $K""".stripMargin,
    // Both CTE chains (brute truth × bucketed candidate) joined on the
    // survivor set; division only at the end, double-by-double.
    "q_knn_recall" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v,
         |    ${bucketSql("embedding")} AS bkt FROM embeddings),
         |q AS (SELECT vec_id AS q_id, v AS qv, bkt AS q_bkt FROM e WHERE vec_id % 50 = 0),
         |bscored AS (
         |  SELECT q.q_id, e.vec_id,
         |    ${cosSql("qv", "v")} AS sim
         |  FROM q, e WHERE e.vec_id != q.q_id),
         |brute AS (SELECT q_id, vec_id FROM (SELECT *, row_number() OVER
         |    (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rank FROM bscored)
         |  WHERE rank <= $K),
         |ascored AS (
         |  SELECT q.q_id, e.vec_id,
         |    ${cosSql("qv", "v")} AS sim
         |  FROM q JOIN e ON e.bkt = q.q_bkt AND e.vec_id != q.q_id),
         |approx AS (SELECT q_id, vec_id FROM (SELECT *, row_number() OVER
         |    (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rank FROM ascored)
         |  WHERE rank <= $K),
         |probes AS (SELECT q_id, qv, unnest([q_bkt, xor(q_bkt, 1), xor(q_bkt, 2),
         |    xor(q_bkt, 4), xor(q_bkt, 8)]) AS probe FROM q),
         |mscored AS (
         |  SELECT p.q_id, e.vec_id,
         |    ${cosSql("qv", "v")} AS sim
         |  FROM probes p JOIN e ON e.bkt = p.probe AND e.vec_id != p.q_id),
         |mapprox AS (SELECT q_id, vec_id FROM (SELECT *, row_number() OVER
         |    (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rank FROM mscored)
         |  WHERE rank <= $K),
         |bhits AS (SELECT q_id, count(*) AS n FROM brute
         |  JOIN approx USING (q_id, vec_id) GROUP BY 1),
         |mhits AS (SELECT q_id, count(*) AS n FROM brute
         |  JOIN mapprox USING (q_id, vec_id) GROUP BY 1)
         |SELECT q.q_id,
         |  CAST(coalesce(bhits.n, 0) AS BIGINT) AS hits_bucketed,
         |  CAST(coalesce(bhits.n, 0) AS DOUBLE) / CAST($K AS DOUBLE) AS recall_bucketed,
         |  CAST(coalesce(mhits.n, 0) AS BIGINT) AS hits_multiprobe,
         |  CAST(coalesce(mhits.n, 0) AS DOUBLE) / CAST($K AS DOUBLE) AS recall_multiprobe
         |FROM q LEFT JOIN bhits ON q.q_id = bhits.q_id
         |LEFT JOIN mhits ON q.q_id = mhits.q_id""".stripMargin,
    "q_embed_incremental" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] v FROM embeddings),
         |p AS (SELECT * FROM e WHERE vec_id % 10 >= 8),
         |c AS (SELECT * FROM e WHERE vec_id % 10 < 8),
         |m AS (SELECT DISTINCT p.vec_id FROM p JOIN c ON p.label = c.label
         |  WHERE ${cosSql("p.v", "c.v")} >= $NearDupThreshold)
         |SELECT vec_id FROM p
         |WHERE vec_id NOT IN (SELECT vec_id FROM m)""".stripMargin,
    "q_knn_recall_ivf" -> Seq(
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 50 = 0),
         |bscored AS (
         |  SELECT q.q_id, e.vec_id,
         |    ${cosSql("qv", "v")} AS sim
         |  FROM q, e WHERE e.vec_id != q.q_id),
         |brute AS (SELECT q_id, vec_id FROM (SELECT *, row_number() OVER
         |    (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rank FROM bscored)
         |  WHERE rank <= $K),
         |cent AS (SELECT vec_id AS c_id, v AS cv FROM e ORDER BY vec_id LIMIT 8)""".stripMargin,
      ivfAssignProbes("cent"),
      s"""scored AS (SELECT p.q_id, a.vec_id,
         |  ${cosSql("p.qv", "a.v")} AS sim
         |  FROM probes p JOIN assign a ON a.cell = p.probe AND a.vec_id != p.q_id),
         |ivf AS (SELECT q_id, vec_id FROM (SELECT *, row_number() OVER
         |    (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rank FROM scored)
         |  WHERE rank <= $K),
         |hits AS (SELECT q_id, count(*) AS n FROM brute
         |  JOIN ivf USING (q_id, vec_id) GROUP BY 1)
         |SELECT q.q_id,
         |  CAST(coalesce(hits.n, 0) AS BIGINT) AS hits_ivf,
         |  CAST(coalesce(hits.n, 0) AS DOUBLE) / CAST($K AS DOUBLE) AS recall_ivf
         |FROM q LEFT JOIN hits ON q.q_id = hits.q_id""".stripMargin
    ).mkString(",\n"),
    "q_knn_topk" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 50 = 0),
         |scored AS (
         |  SELECT q.q_id, e.vec_id,
         |    ${cosSql("qv", "v")} AS sim
         |  FROM q, e WHERE e.vec_id != q.q_id),
         |ranked AS (SELECT *, row_number() OVER
         |  (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rank FROM scored)
         |SELECT q_id, vec_id, rank, sim FROM ranked WHERE rank <= $K""".stripMargin,
    // IVF: centroids = 8 lowest-id vectors; assignment/probing by squared L2
    // from dots ((v·v + c·c) − 2·v·c — the same association order as the
    // Spark side), ties toward the lower centroid id; nprobe = 2.
    "q_knn_ivf" -> Seq(
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        |cent AS (SELECT vec_id AS c_id, v AS cv FROM e ORDER BY vec_id LIMIT 8)""".stripMargin,
      ivfAssignProbes("cent"),
      ivfScoredTail
    ).mkString(",\n"),
    // Trained IVF: replicate the full 3-iteration Lloyd run (init = 8
    // lowest-id vectors, c_id = 0..7 rank order exactly like kmeans'
    // zipWithIndex), then assign/probe/score with the trained centroids —
    // same machinery as q_knn_ivf but over c3 instead of the raw seeds.
    // Assembled by concatenation so each fragment strips its margin once.
    "q_knn_ivf_trained" -> (Seq(
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
         |c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c_id, v AS cv
         |  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8))""".stripMargin,
      lloydIter("c0", "a1", "m1", "c1"),
      lloydIter("c1", "a2", "m2", "c2"),
      lloydIter("c2", "a3", "m3", "c3"),
      ivfAssignProbes("c3"),
      ivfScoredTail
    ).mkString(",\n")),
    "q_embed_neardup" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] v FROM embeddings
         |  QUALIFY count(*) OVER (PARTITION BY label)
         |    <= ${graft.operators.Dedup.MaxBucket})
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  ${cosSql("a.v", "b.v")} AS sim
         |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE ${cosSql("a.v", "b.v")}
         |  >= $NearDupThreshold""".stripMargin,
    // CC over the near-dup pairs: transitive closure by recursive CTE
    // (components are bounded by the label blocks), cluster = min reachable
    // id, singletons self-label — mirrors the q_dedup_clusters oracle.
    "q_embed_clusters" ->
      s"""WITH RECURSIVE e AS (SELECT vec_id, label, embedding::DOUBLE[] v FROM embeddings
         |  QUALIFY count(*) OVER (PARTITION BY label)
         |    <= ${graft.operators.Dedup.MaxBucket}),
         |p AS (SELECT a.vec_id AS src, b.vec_id AS dst
         |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
         |  WHERE ${cosSql("a.v", "b.v")}
         |    >= $NearDupThreshold),
         |edges AS (SELECT src AS a, dst AS b FROM p UNION SELECT dst, src FROM p),
         |reach(a, b) AS (SELECT a, b FROM edges
         |  UNION SELECT r.a, g.b FROM reach r JOIN edges g ON r.b = g.a)
         |SELECT v.vec_id,
         |  CAST(coalesce(least(min(r.b), v.vec_id), v.vec_id) AS BIGINT) AS cluster_id
         |FROM embeddings v LEFT JOIN reach r ON r.a = v.vec_id
         |GROUP BY v.vec_id""".stripMargin
  )
}
