package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, expr, lit}
import graft.QueryPack

/** Dedup queries over `documents`, DuckDB-oracle-verified end to end —
  * including the LSH banding itself (see [[Dedup]]'s determinism contract). */
object DedupPack extends QueryPack {

  /** DuckDB CTE chain ending in `sg(doc_id, simhash)` — the 32-bit simhash
    * of each document's distinct-word set, value-identical to
    * [[Dedup.simhashPairs]]'s Spark-side hash — and `sgc`, the same rows
    * with [[Dedup.MaxBucket]]-oversized 16-bit-prefix buckets dropped
    * (the pair-join input). Shared by the `q_simhash_pairs` oracle here
    * and the similarity-graph oracles (`q_kcore` in PipelinePack) that
    * build edges from the same pairs. */
  private[operators] val SimhashSgCte: String =
    raw"""w AS (SELECT doc_id, list_distinct(string_split_regex(
      |    trim(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))), '\s+')) ws
      |  FROM documents),
      |h AS (SELECT doc_id, list_distinct(
      |  [('0x' || substr(md5(s), 1, 8))::BIGINT for s in ws]) hs FROM w),
      |sg AS (SELECT doc_id,
      |  list_sum([CASE WHEN list_sum([2 * ((x >> k) & 1) - 1 for x in hs]) > 0
      |    THEN (1::BIGINT << k) ELSE 0 END for k in range(0, 32)]) AS simhash
      |  FROM h),
      |sgc AS (SELECT * FROM sg
      |  QUALIFY count(*) OVER (PARTITION BY simhash >> 16) <= ${Dedup.MaxBucket})""".stripMargin

  private val Threshold = 0.2

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> ((s, dir) => Dedup.exact(table(s, dir, "documents"))),
    "q_dedup_near" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      Dedup.nearDuplicates(graft.Tables.spread(table(s, dir, "documents")), Threshold)
    },
    "q_simhash" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      Dedup.simhash(graft.Tables.spread(table(s, dir, "documents")))
    },
    "q_simhash_pairs" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      Dedup.simhashPairs(graft.Tables.spread(table(s, dir, "documents")), maxHamming = 8)
    },
    "q_dedup_jaccard" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      Dedup.ngramJaccard(table(s, dir, "documents"), threshold = 0.5, maxDf = 30L)
    },
    // Asymmetric containment over the same df-capped index: subset
    // duplication (small doc inside big doc) that Jaccard's union
    // denominator structurally caps below threshold.
    "q_dedup_containment" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      Dedup.ngramContainment(table(s, dir, "documents"), threshold = 0.5,
        maxDf = 30L)
    },
    // Prefix-filtered EXACT set-similarity join (AllPairs/PPJoin): the
    // complete Jaccard>=t pair set, no cap/banding recall trade — the
    // oracle is an independent brute-force all-pairs join, never this
    // algorithm's candidate chain.
    "q_dedup_prefix" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      Dedup.prefixJaccard(table(s, dir, "documents"), threshold = 0.5)
    },
    // LSH recall audit: per Jaccard decile, the fraction of TRUE
    // >=threshold pairs (complete PPJoin truth) the banded LSH path
    // surfaces — the dedup-family analogue of q_knn_recall.
    "q_dedup_recall" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      Dedup.nearDupRecall(table(s, dir, "documents"), Threshold)
    },
    // Incremental PPJoin: the src18/19 "new batch" scored against the
    // frozen corpus prefix index — complete like q_dedup_prefix, O(batch)
    // per call; oracle is the independent brute-force cross join.
    "q_dedup_prefix_inc" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      val docs = table(s, dir, "documents")
      val isBatch = col("source").isin("src18", "src19")
      Dedup.prefixJaccardIncremental(docs.filter(!isBatch),
        docs.filter(isBatch), threshold = 0.5)
    },
    // The DURABLE incremental PPJoin: index persisted as a ParquetStore
    // generation (the production steady-state — one corpus pass per
    // snapshot), batch scored against the STORED tables. Same complete
    // semantics as q_dedup_prefix_inc, so the same brute-force oracle; the
    // result checkpoints eagerly so the temp index dir can be removed
    // before the caller materializes.
    "q_dedup_prefix_indexed" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      val docs = table(s, dir, "documents")
      val isBatch = col("source").isin("src18", "src19")
      val tmp = java.nio.file.Files.createTempDirectory("graft_prefix_idx")
      try {
        val store = new graft.store.PrefixIndexStore(s, tmp.toString,
          threshold = 0.5, name = s"prefix_idx_${System.nanoTime()}")
        store.snapshot(docs.filter(!isBatch))
        store.scoreBatch(docs.filter(isBatch)).localCheckpoint(eager = true)
      } finally {
        graft.Fs.deleteRecursively(tmp)
      }
    },
    // Sorted-neighborhood method: candidates from sort adjacency (window
    // 6 over the normalized-text order), exact shingle-Jaccard verify —
    // the linear-candidate classic beside the LSH/simhash/inverted-index
    // paths.
    "q_dedup_snm" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      Dedup.sortedNeighborhood(graft.Tables.spread(table(s, dir, "documents")), window = 6,
        threshold = 0.5)
    },
    "q_dedup_clusters" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      Dedup.clusters(graft.Tables.spread(table(s, dir, "documents")), Threshold)
    },
    // EXACT clusters: CC over the COMPLETE PPJoin pair graph — a pure
    // function of (corpus, threshold); oracle closes over brute-force
    // truth pairs, independent of every engine candidate chain.
    "q_dedup_clusters_exact" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      Dedup.clustersExact(table(s, dir, "documents"), Threshold)
    },
    // Sketch-error audit: per verified near-dup pair, minhash-estimated
    // vs exact Jaccard (integer permille) — the LSH layer's operating
    // error, next to q_knn_recall's ANN recall ladder.
    "q_minhash_accuracy" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      Dedup.minhashAccuracy(graft.Tables.spread(table(s, dir, "documents")), Threshold)
    },
    // Eval-decontamination audit: near-dup clusters straddling the
    // per-document hash split — each row is a cluster whose members sit
    // in BOTH train and an eval split, i.e. a leaked benchmark answer.
    // (q_split_by_group is the structural fix — split on the group key;
    // this is the audit you run when the split key was the document.)
    "q_split_leakage" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      Integrity.splitLeakage(
        Dedup.clusters(graft.Tables.spread(table(s, dir, "documents")), Threshold),
        Curation.splitOf(col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
    },
    // Corpus-level crawl-overlap matrix: pairwise shingle-vocabulary
    // Jaccard between sources, integer permille — decides which source
    // PAIRS deserve a document-level dedup pass.
    "q_source_overlap" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      Dedup.sourceOverlap(graft.Tables.spread(table(s, dir, "documents")))
    },
    // Quality-aware keep decision: per near-dup cluster, the LONGEST
    // member (ties → smaller id) — "which copy do we train on", vs
    // q_dedup_keep's min-id pure-dedup answer.
    "q_cluster_representatives" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      val docs = graft.Tables.spread(table(s, dir, "documents"))
      Dedup.clusterRepresentatives(Dedup.clusters(docs, Threshold),
        docs.select("doc_id", "n_chars"), "n_chars")
    },
    // The pipeline's final artifacts: representative ids to KEEP (one per
    // cluster) and the complementary DROP list.
    "q_dedup_keep" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      Dedup.keepList(Dedup.clusters(graft.Tables.spread(table(s, dir, "documents")), Threshold))
    },
    "q_dedup_drop" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      Dedup.dropList(Dedup.clusters(graft.Tables.spread(table(s, dir, "documents")), Threshold))
    },
    // Dedup-aware sampling weights: weight each document by the inverse of
    // its near-dup cluster size (ppm, integer), so a cluster contributes
    // ONE document's worth of probability mass however many copies crawled
    // in — the soft alternative to hard-dropping duplicates.
    "q_cluster_weights" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      val w = org.apache.spark.sql.expressions.Window.partitionBy("cluster_id")
      Dedup.clusters(graft.Tables.spread(table(s, dir, "documents")), Threshold)
        .withColumn("cluster_size", count(lit(1)).over(w))
        .withColumn("weight_ppm", expr("1000000 div cluster_size"))
    },
    // Incremental ingest: the last fifth of doc ids plays the "new crawl
    // batch", everything before it the already-ingested corpus whose
    // fingerprint index the batch anti-joins.
    "q_dedup_incremental" -> { (s, dir) =>
      val docs = graft.Tables.spread(table(s, dir, "documents"))
      val isBatch = col("doc_id") % 10 >= 8
      Dedup.incremental(
        docs.filter(isBatch),
        docs.filter(!isBatch).select(
          graft.functions.TextFunctions.fingerprint(col("text")).as("fp")))
    },
    // n-gram overlap contamination: per held-out doc, what fraction of its
    // distinct 3-gram hashes occurs anywhere in the training corpus —
    // integer (matched, total, permille), the report-card companion of
    // the pairwise q_dedup_contamination below.
    "q_contamination_score" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      val docs = graft.Tables.spread(table(s, dir, "documents"))
      val isEval = col("source").isin("src18", "src19")
      Dedup.ngramContamination(docs.filter(!isEval), docs.filter(isEval))
    },
    // Decontamination: which held-out docs (src18/src19 = the "eval set")
    // near-duplicate a training doc (every other source)? Both sides slice
    // ONE table, so band once (single hashing pass) and split by side.
    "q_dedup_contamination" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      // Same derived geometry as the nearDuplicates default at this
      // threshold, so the shared PairCtes oracle replicates both.
      val bands = Dedup.lshBands(graft.Tables.spread(table(s, dir, "documents")),
        carryCols = Seq("source"),
        bands = Geo.bands, rowsPerBand = Geo.rowsPerBand)
        .localCheckpoint(eager = true)
      val isEval = col("source").isin("src18", "src19")
      Dedup.crossNearDuplicatesBands(
        bands.filter(!isEval).drop("source"),
        bands.filter(isEval).drop("source"), Threshold)
    }
  )

  /** DuckDB replicas. Shared hash: `('0x'||substr(md5(s),1,8))::BIGINT` ==
    * Spark `conv(substr(md5(s),1,8),16,10)`. */
  private val AsList = Dedup.As.mkString("[", ",", "]")
  private val BsList = Dedup.Bs.mkString("[", ",", "]")
  private val P = Dedup.P

  /** The DERIVED default band geometry at [[Threshold]] (r10): the Spark
    * side's `nearDuplicates(docs, Threshold)` resolves to exactly this via
    * `Dedup.defaultBands`, and the oracle's band keys are generated from
    * the same (bands, rowsPerBand) below — lockstep by construction. */
  private val Geo = Dedup.defaultBands(Threshold)

  /** `'j:' || sig[r(j-1)+1] || '_' || … || sig[rj]` for the derived r. */
  private val BandKeySql = (1 to Geo.rowsPerBand)
    .map(k => s"sig[${Geo.rowsPerBand}*j-${Geo.rowsPerBand - k}]")
    .mkString(" || '_' || ")

  /** Shared CTE prefix: normalized words → 3-shingles → 32-bit md5 hash sets
    * → 16-perm minhash signature → the DERIVED [[Geo]] band keys (empty
    * hash sets dropped) → banded candidates → Jaccard-verified pairs at
    * [[Threshold]]. Both q_dedup_near and q_dedup_clusters build on
    * `pairs`. */
  // NOTE: raw margins, no stripMargin here — this fragment is interpolated
  // into oracle strings that call .stripMargin ONCE at the end. (Stripping
  // twice would eat the leading `|` of `||` concat continuation lines.)
  private val PairCtes =
    s"""w AS (SELECT doc_id, source, string_split_regex(
       |    trim(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))), '\\s+') ws
       |  FROM documents),
       |sh AS (SELECT doc_id, source, list_distinct(
       |  [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] for i in range(1, len(ws) - 1)]) sh FROM w),
       |h AS (SELECT doc_id, source, list_distinct(
       |  [('0x' || substr(md5(s), 1, 8))::BIGINT for s in sh]) hs FROM sh),
       |sig AS (SELECT doc_id, source, hs,
       |  [list_min([($AsList[j] * (x % $P) + $BsList[j]) % $P for x in hs])
       |   for j in range(1, ${Dedup.NumHashes + 1})] AS sig FROM h),
       |bands0 AS (SELECT doc_id, source, hs, unnest(
       |  [CAST(j AS VARCHAR) || ':' || $BandKeySql
       |   for j in range(1, ${Geo.bands + 1})]) AS band
       |  FROM sig WHERE len(hs) > 0),
       |bands AS (SELECT doc_id, source, hs, band FROM bands0
       |  QUALIFY count(*) OVER (PARTITION BY band) <= ${Dedup.MaxBand}),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id),
       |pairs AS (SELECT c.doc_a, c.doc_b,
       |  CAST(len(list_intersect(ha.hs, hb.hs)) AS DOUBLE) /
       |    (len(ha.hs) + len(hb.hs) - len(list_intersect(ha.hs, hb.hs))) AS jaccard
       |FROM cand c
       |JOIN h ha ON ha.doc_id = c.doc_a
       |JOIN h hb ON hb.doc_id = c.doc_b
       |WHERE CAST(len(list_intersect(ha.hs, hb.hs)) AS DOUBLE) /
       |    (len(ha.hs) + len(hb.hs) - len(list_intersect(ha.hs, hb.hs))) >= $Threshold)"""

  override def oracles: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
        |  min(doc_id) AS keep_id, count(*) AS dup_count
        |FROM documents GROUP BY 1""".stripMargin,
    "q_contamination_score" ->
      """WITH w AS (SELECT doc_id, source, string_split_regex(
        |    trim(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))), '\s+') ws
        |  FROM documents),
        |h AS (SELECT doc_id, source, list_distinct(
        |  [('0x' || substr(md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]), 1, 8))::BIGINT
        |   for i in range(1, len(ws) - 1)]) hs FROM w),
        |c AS (SELECT DISTINCT unnest(hs) AS g FROM h
        |  WHERE source NOT IN ('src18', 'src19')),
        |p AS (SELECT doc_id, unnest(hs) AS g FROM h
        |  WHERE source IN ('src18', 'src19')),
        |m AS (SELECT doc_id, count(*) AS matched FROM p
        |  WHERE g IN (SELECT g FROM c) GROUP BY 1),
        |t AS (SELECT doc_id, CAST(len(hs) AS BIGINT) AS total_grams FROM h
        |  WHERE source IN ('src18', 'src19'))
        |SELECT t.doc_id, coalesce(m.matched, 0) AS matched_grams, t.total_grams,
        |  CASE WHEN total_grams > 0
        |    THEN (coalesce(m.matched, 0) * 1000) // total_grams END AS permille
        |FROM t LEFT JOIN m USING (doc_id)""".stripMargin,
    "q_dedup_incremental" ->
      """WITH fp AS (SELECT doc_id,
        |    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        |    FROM documents),
        |b AS (SELECT fp, min(doc_id) AS keep_id, count(*) AS batch_dups
        |      FROM fp WHERE doc_id % 10 >= 8 GROUP BY 1)
        |SELECT b.* FROM b
        |WHERE NOT EXISTS (SELECT 1 FROM fp c
        |  WHERE c.doc_id % 10 < 8 AND c.fp = b.fp)""".stripMargin,
    "q_dedup_near" ->
      s"""WITH $PairCtes
         |SELECT doc_a, doc_b, jaccard FROM pairs""".stripMargin,
    // Connected components of the pair graph: transitive closure by
    // recursive CTE (components are tiny cliques, so the closure is small),
    // cluster id = min reachable doc id, singletons label themselves.
    "q_dedup_clusters" ->
      s"""WITH RECURSIVE $PairCtes,
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs),
         |reach(a, b) AS (SELECT a, b FROM edges
         |  UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
         |SELECT d.doc_id,
         |  CAST(coalesce(least(min(r.b), d.doc_id), d.doc_id) AS BIGINT) AS cluster_id
         |FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
         |GROUP BY d.doc_id""".stripMargin,
    // Signature agreement count vs exact set Jaccard over the SAME
    // thresholded pairs; sig positions are 1-based lists in DuckDB.
    "q_minhash_accuracy" ->
      s"""WITH $PairCtes,
         |acc AS (SELECT p.doc_a, p.doc_b,
         |    len(list_filter(range(1, ${Dedup.NumHashes + 1}),
         |      j -> sa.sig[j] = sb.sig[j])) AS est_matches,
         |    len(list_intersect(sa.hs, sb.hs)) AS inter,
         |    len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs)) AS uni
         |  FROM pairs p
         |  JOIN sig sa ON sa.doc_id = p.doc_a
         |  JOIN sig sb ON sb.doc_id = p.doc_b)
         |SELECT doc_a, doc_b, CAST(est_matches AS BIGINT) AS est_matches,
         |  CAST(est_matches * 1000 // ${Dedup.NumHashes} AS BIGINT) AS est_permille,
         |  CAST(inter * 1000 // uni AS BIGINT) AS exact_permille
         |FROM acc""".stripMargin,
    // Same transitive closure, joined to the md5 split gate; only
    // clusters touching > 1 split survive.
    "q_split_leakage" ->
      s"""WITH RECURSIVE $PairCtes,
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs),
         |reach(a, b) AS (SELECT a, b FROM edges
         |  UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         |cl AS (SELECT d.doc_id,
         |    CAST(coalesce(least(min(r.b), d.doc_id), d.doc_id) AS BIGINT)
         |      AS cluster_id
         |  FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
         |  GROUP BY d.doc_id),
         |sp AS (SELECT doc_id,
         |    CASE WHEN h < 800000 THEN 'train'
         |         WHEN h < 900000 THEN 'val' ELSE 'test' END AS split
         |  FROM (SELECT doc_id,
         |      ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
         |        % 1000000 AS h FROM documents)),
         |j AS (SELECT cluster_id, split FROM cl JOIN sp USING (doc_id))
         |SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(DISTINCT split) AS BIGINT) AS n_splits,
         |  array_to_string(list_sort(list_distinct(list(split))), ',') AS splits
         |FROM j GROUP BY 1
         |HAVING count(DISTINCT split) > 1""".stripMargin,
    "q_source_overlap" ->
      """WITH w AS (SELECT source, string_split_regex(
        |    trim(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))), '\s+') ws
        |  FROM documents),
        |h AS (SELECT source, list_distinct(
        |  [('0x' || substr(md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]), 1, 8))::BIGINT
        |   for i in range(1, len(ws) - 1)]) hs FROM w),
        |m AS (SELECT DISTINCT source, unnest(hs) AS gram FROM h),
        |s AS (SELECT source, count(*) AS n FROM m GROUP BY 1),
        |i AS (SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
        |  FROM m a JOIN m b ON a.gram = b.gram AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT src_a, src_b, sa.n AS n_a, sb.n AS n_b, n_common,
        |  1000 * n_common // (sa.n + sb.n - n_common) AS jaccard_permille
        |FROM i JOIN s sa ON sa.source = src_a JOIN s sb ON sb.source = src_b"""
        .stripMargin,
    "q_cluster_representatives" ->
      s"""WITH RECURSIVE $PairCtes,
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs),
         |reach(a, b) AS (SELECT a, b FROM edges
         |  UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         |cl AS (SELECT d.doc_id,
         |    CAST(coalesce(least(min(r.b), d.doc_id), d.doc_id) AS BIGINT) AS cluster_id
         |  FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
         |  GROUP BY d.doc_id),
         |j AS (SELECT cl.cluster_id, cl.doc_id, d.n_chars,
         |    row_number() OVER (PARTITION BY cl.cluster_id
         |      ORDER BY d.n_chars DESC, cl.doc_id) AS rn,
         |    count(*) OVER (PARTITION BY cl.cluster_id) AS n_docs
         |  FROM cl JOIN documents d USING (doc_id))
         |SELECT cluster_id, doc_id AS rep_id, n_docs, n_chars AS rep_score
         |FROM j WHERE rn = 1""".stripMargin,
    "q_cluster_weights" ->
      s"""WITH RECURSIVE $PairCtes,
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs),
         |reach(a, b) AS (SELECT a, b FROM edges
         |  UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         |cl AS (SELECT d.doc_id,
         |    CAST(coalesce(least(min(r.b), d.doc_id), d.doc_id) AS BIGINT) AS cluster_id
         |  FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
         |  GROUP BY d.doc_id)
         |SELECT doc_id, cluster_id,
         |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
         |  1000000 // count(*) OVER (PARTITION BY cluster_id) AS weight_ppm
         |FROM cl""".stripMargin,
    // Keep = doc_id == its cluster label (the component minimum);
    // drop = the complement. Same recursive closure as q_dedup_clusters.
    "q_dedup_keep" ->
      s"""WITH RECURSIVE $PairCtes,
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs),
         |reach(a, b) AS (SELECT a, b FROM edges
         |  UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         |cl AS (SELECT d.doc_id,
         |  CAST(coalesce(least(min(r.b), d.doc_id), d.doc_id) AS BIGINT) AS cluster_id
         |FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
         |GROUP BY d.doc_id)
         |SELECT doc_id FROM cl WHERE doc_id = cluster_id""".stripMargin,
    "q_dedup_drop" ->
      s"""WITH RECURSIVE $PairCtes,
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs),
         |reach(a, b) AS (SELECT a, b FROM edges
         |  UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         |cl AS (SELECT d.doc_id,
         |  CAST(coalesce(least(min(r.b), d.doc_id), d.doc_id) AS BIGINT) AS cluster_id
         |FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
         |GROUP BY d.doc_id)
         |SELECT doc_id FROM cl WHERE doc_id != cluster_id""".stripMargin,
    // Cross-corpus: probe bands (src18/19) against corpus bands; the cap in
    // the shared `bands` CTE is over the COMBINED band table, exactly like
    // crossNearDuplicates' union-side hot list.
    "q_dedup_contamination" ->
      s"""WITH $PairCtes,
         |xcand AS (SELECT DISTINCT p.doc_id AS probe_id, c.doc_id AS corpus_id
         |  FROM bands p JOIN bands c ON p.band = c.band
         |  WHERE p.source IN ('src18', 'src19')
         |    AND c.source NOT IN ('src18', 'src19'))
         |SELECT x.probe_id, x.corpus_id,
         |  CAST(len(list_intersect(hp.hs, hc.hs)) AS DOUBLE) /
         |    (len(hp.hs) + len(hc.hs) - len(list_intersect(hp.hs, hc.hs))) AS jaccard
         |FROM xcand x
         |JOIN h hp ON hp.doc_id = x.probe_id
         |JOIN h hc ON hc.doc_id = x.corpus_id
         |WHERE CAST(len(list_intersect(hp.hs, hc.hs)) AS DOUBLE) /
         |    (len(hp.hs) + len(hc.hs) - len(list_intersect(hp.hs, hc.hs))) >= $Threshold""".stripMargin,
    "q_dedup_jaccard" ->
      """WITH w AS (SELECT doc_id, string_split_regex(
        |    trim(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))), '\s+') ws
        |  FROM documents),
        |sh AS (SELECT doc_id, list_distinct(
        |  [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] for i in range(1, len(ws) - 1)]) sh FROM w),
        |h AS (SELECT doc_id, list_distinct(
        |  [('0x' || substr(md5(s), 1, 8))::BIGINT for s in sh]) hs FROM sh),
        |post AS (SELECT doc_id, unnest(hs) AS ph FROM h),
        |rare AS (SELECT ph FROM post GROUP BY ph HAVING count(*) <= 30),
        |pruned AS (SELECT p.doc_id, p.ph FROM post p JOIN rare r ON p.ph = r.ph),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM pruned a JOIN pruned b ON a.ph = b.ph AND a.doc_id < b.doc_id)
        |SELECT c.doc_a, c.doc_b,
        |  CAST(len(list_intersect(ha.hs, hb.hs)) AS DOUBLE) /
        |    (len(ha.hs) + len(hb.hs) - len(list_intersect(ha.hs, hb.hs))) AS jaccard
        |FROM cand c
        |JOIN h ha ON ha.doc_id = c.doc_a
        |JOIN h hb ON hb.doc_id = c.doc_b
        |WHERE CAST(len(list_intersect(ha.hs, hb.hs)) AS DOUBLE) /
        |    (len(ha.hs) + len(hb.hs) - len(list_intersect(ha.hs, hb.hs))) >= 0.5""".stripMargin,
    // Containment: identical candidate chain, min-size denominator.
    "q_dedup_containment" ->
      """WITH w AS (SELECT doc_id, string_split_regex(
        |    trim(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))), '\s+') ws
        |  FROM documents),
        |sh AS (SELECT doc_id, list_distinct(
        |  [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] for i in range(1, len(ws) - 1)]) sh FROM w),
        |h AS (SELECT doc_id, list_distinct(
        |  [('0x' || substr(md5(s), 1, 8))::BIGINT for s in sh]) hs FROM sh),
        |post AS (SELECT doc_id, unnest(hs) AS ph FROM h),
        |rare AS (SELECT ph FROM post GROUP BY ph HAVING count(*) <= 30),
        |pruned AS (SELECT p.doc_id, p.ph FROM post p JOIN rare r ON p.ph = r.ph),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM pruned a JOIN pruned b ON a.ph = b.ph AND a.doc_id < b.doc_id),
        |v AS (SELECT c.doc_a, c.doc_b,
        |    CAST(len(ha.hs) AS BIGINT) AS n_a, CAST(len(hb.hs) AS BIGINT) AS n_b,
        |    CAST(len(list_intersect(ha.hs, hb.hs)) AS BIGINT) AS n_common
        |  FROM cand c
        |  JOIN h ha ON ha.doc_id = c.doc_a
        |  JOIN h hb ON hb.doc_id = c.doc_b)
        |SELECT doc_a, doc_b, n_a, n_b, n_common,
        |  n_common::DOUBLE / least(n_a, n_b) AS containment
        |FROM v WHERE n_common::DOUBLE / least(n_a, n_b) >= 0.5""".stripMargin,
    // Prefix filtering is COMPLETE, so the oracle is the independent
    // brute-force all-pairs join over the same shingle-hash sets — it
    // shares no candidate machinery with the engine's algorithm.
    "q_dedup_prefix" ->
      """WITH w AS (SELECT doc_id, string_split_regex(
        |    trim(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))), '\s+') ws
        |  FROM documents),
        |sh AS (SELECT doc_id, list_distinct(
        |  [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] for i in range(1, len(ws) - 1)]) sh FROM w),
        |h AS (SELECT doc_id, list_distinct(
        |  [('0x' || substr(md5(s), 1, 8))::BIGINT for s in sh]) hs FROM sh
        |  WHERE len(sh) > 0)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE) /
        |    (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs))) AS jaccard
        |FROM h a JOIN h b ON a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE) /
        |    (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs))) >= 0.5""".stripMargin,
    // Exact clusters: recursive closure over BRUTE-FORCE truth pairs
    // (never the engine's candidate chain); same closure shape as
    // q_dedup_clusters' oracle. SCALE NOTE like q_dedup_clusters: the
    // closure is O(|component|²) — fine at the sf0.01 driver gate.
    "q_dedup_clusters_exact" ->
      s"""WITH RECURSIVE w AS (SELECT doc_id, string_split_regex(
         |    trim(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))), '\\s+') ws
         |  FROM documents),
         |sh AS (SELECT doc_id, list_distinct(
         |  [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] for i in range(1, len(ws) - 1)]) sh FROM w),
         |h AS (SELECT doc_id, list_distinct(
         |  [('0x' || substr(md5(s), 1, 8))::BIGINT for s in sh]) hs FROM sh
         |  WHERE len(sh) > 0),
         |tpairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM h a JOIN h b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE) /
         |    (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs))) >= $Threshold),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM tpairs
         |  UNION SELECT doc_b, doc_a FROM tpairs),
         |reach(a, b) AS (SELECT a, b FROM edges
         |  UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
         |SELECT d.doc_id,
         |  CAST(coalesce(least(min(r.b), d.doc_id), d.doc_id) AS BIGINT) AS cluster_id
         |FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
         |GROUP BY d.doc_id""".stripMargin,
    // Recall audit: truth = brute all-pairs (PPJoin is complete, so the
    // oracle never runs the engine's algorithm), found = the LSH chain.
    "q_dedup_recall" ->
      s"""WITH $PairCtes,
         |truth AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE) /
         |      (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs))) AS jaccard
         |  FROM h a JOIN h b ON a.doc_id < b.doc_id
         |  WHERE len(a.hs) > 0 AND len(b.hs) > 0
         |    AND CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE) /
         |      (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs))) >= $Threshold)
         |SELECT CAST(floor(t.jaccard * 10) AS BIGINT) AS jaccard_decile,
         |  count(*) AS n_true, count(p.doc_a) AS n_found,
         |  CAST(count(p.doc_a) * 1000 // count(*) AS BIGINT) AS recall_permille
         |FROM truth t LEFT JOIN pairs p
         |  ON t.doc_a = p.doc_a AND t.doc_b = p.doc_b
         |GROUP BY 1""".stripMargin,
    // Incremental PPJoin is complete like the self-join form, so the
    // oracle is the brute-force batch×corpus cross join.
    "q_dedup_prefix_inc" ->
      """WITH w AS (SELECT doc_id, source, string_split_regex(
        |    trim(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))), '\s+') ws
        |  FROM documents),
        |sh AS (SELECT doc_id, source, list_distinct(
        |  [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] for i in range(1, len(ws) - 1)]) sh FROM w),
        |h AS (SELECT doc_id, source, list_distinct(
        |  [('0x' || substr(md5(s), 1, 8))::BIGINT for s in sh]) hs FROM sh
        |  WHERE len(sh) > 0)
        |SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id,
        |  CAST(len(list_intersect(b.hs, c.hs)) AS DOUBLE) /
        |    (len(b.hs) + len(c.hs) - len(list_intersect(b.hs, c.hs))) AS jaccard
        |FROM h b JOIN h c
        |  ON b.source IN ('src18', 'src19') AND c.source NOT IN ('src18', 'src19')
        |WHERE CAST(len(list_intersect(b.hs, c.hs)) AS DOUBLE) /
        |    (len(b.hs) + len(c.hs) - len(list_intersect(b.hs, c.hs))) >= 0.5""".stripMargin,
    // Stored-index scoring is the same complete batch×corpus contract, so
    // the oracle is the same independent brute-force cross join (never the
    // engine's candidate chain, never the store).
    "q_dedup_prefix_indexed" ->
      """WITH w AS (SELECT doc_id, source, string_split_regex(
        |    trim(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))), '\s+') ws
        |  FROM documents),
        |sh AS (SELECT doc_id, source, list_distinct(
        |  [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] for i in range(1, len(ws) - 1)]) sh FROM w),
        |h AS (SELECT doc_id, source, list_distinct(
        |  [('0x' || substr(md5(s), 1, 8))::BIGINT for s in sh]) hs FROM sh
        |  WHERE len(sh) > 0)
        |SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id,
        |  CAST(len(list_intersect(b.hs, c.hs)) AS DOUBLE) /
        |    (len(b.hs) + len(c.hs) - len(list_intersect(b.hs, c.hs))) AS jaccard
        |FROM h b JOIN h c
        |  ON b.source IN ('src18', 'src19') AND c.source NOT IN ('src18', 'src19')
        |WHERE CAST(len(list_intersect(b.hs, c.hs)) AS DOUBLE) /
        |    (len(b.hs) + len(c.hs) - len(list_intersect(b.hs, c.hs))) >= 0.5""".stripMargin,
    // SNM: row_number over the normalized-text total order; candidate =
    // rank distance 1..5; verify = the exact Jaccard twin of
    // q_dedup_jaccard (empty-shingle docs excluded on both engines).
    "q_dedup_snm" ->
      """WITH n AS (SELECT doc_id,
        |    trim(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS key
        |  FROM documents),
        |r AS (SELECT doc_id, row_number() OVER (ORDER BY key, doc_id) AS rk
        |  FROM n),
        |w AS (SELECT doc_id, string_split_regex(
        |    trim(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))), '\s+') ws
        |  FROM documents),
        |sh AS (SELECT doc_id, list_distinct(
        |  [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] for i in range(1, len(ws) - 1)]) sh FROM w),
        |h AS (SELECT doc_id, list_distinct(
        |  [('0x' || substr(md5(s), 1, 8))::BIGINT for s in sh]) hs FROM sh),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM r a JOIN r b ON b.rk - a.rk BETWEEN 1 AND 5)
        |SELECT c.doc_a, c.doc_b,
        |  CAST(len(list_intersect(ha.hs, hb.hs)) AS DOUBLE) /
        |    (len(ha.hs) + len(hb.hs) - len(list_intersect(ha.hs, hb.hs))) AS jaccard
        |FROM cand c
        |JOIN h ha ON ha.doc_id = c.doc_a
        |JOIN h hb ON hb.doc_id = c.doc_b
        |WHERE len(ha.hs) > 0 AND len(hb.hs) > 0
        |  AND CAST(len(list_intersect(ha.hs, hb.hs)) AS DOUBLE) /
        |    (len(ha.hs) + len(hb.hs) - len(list_intersect(ha.hs, hb.hs))) >= 0.5""".stripMargin,
    "q_simhash_pairs" ->
      s"""WITH $SimhashSgCte
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        |FROM sgc a JOIN sgc b
        |  ON (a.simhash >> 16) = (b.simhash >> 16) AND a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 8""".stripMargin,
    // list_sum returns HUGEINT; the driver materializes HUGEINT as
    // float64/decimal128 through pandas/arrow, so exposed sums MUST be cast
    // back to BIGINT or the value hash diverges (r02's only red).
    "q_simhash" ->
      """WITH w AS (SELECT doc_id, list_distinct(string_split_regex(
        |    trim(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))), '\s+')) ws
        |  FROM documents),
        |h AS (SELECT doc_id, list_distinct(
        |  [('0x' || substr(md5(s), 1, 8))::BIGINT for s in ws]) hs FROM w),
        |sg AS (SELECT doc_id, CAST(
        |  list_sum([CASE WHEN list_sum([2 * ((x >> k) & 1) - 1 for x in hs]) > 0
        |    THEN (1::BIGINT << k) ELSE 0 END for k in range(0, 32)]) AS BIGINT) AS simhash
        |  FROM h)
        |SELECT doc_id, simhash, simhash >> 16 AS bucket FROM sg""".stripMargin
  )
}
