package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryPack
import graft.functions.{Pii, SqlLet, TextFunctions}

/** Round-5 pipeline utilities: dataset profiling, PII scrubbing,
  * passage-level dedup, co-occurrence graph analytics, SCD-2 history
  * build, and an inverted index — the remaining table-stakes passes of a
  * production training-data pipeline, each pinned to a DuckDB oracle.
  *
  * Oracle notes: Spark `size()` returns INT (cast to long where DuckDB's
  * `len()` returns BIGINT); every regex pattern is RE2-safe so Java regex
  * and DuckDB's RE2 produce identical matches; the PII queries INJECT
  * deterministic synthetic PII derived from `doc_id` (the fixture corpus
  * is clean word-salad — without injection the scrubber would be
  * vacuously green).
  */
object PipelinePack extends QueryPack {

  private val ProfileCols = Seq("doc_id", "text", "lang", "source", "n_chars")

  /** doc_id-derived synthetic PII appended to each document (Spark side). */
  private def injected = concat(col("text"),
    lit(" contact user"), col("doc_id").cast("string"),
    lit("@example.com or 10.0."), (col("doc_id") % 250).cast("string"),
    lit(".7 ref 9"), lpad(col("doc_id").cast("string"), 9, "0"))

  /** The same injection in DuckDB SQL. */
  private val InjectedSql =
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or 10.0.' || " +
      "CAST(doc_id % 250 AS VARCHAR) || '.7 ref 9' || lpad(CAST(doc_id AS VARCHAR), 9, '0')"

  /** The co-purchase edge list (parts sharing an order), MATERIALIZED once
    * per fixture dir and reused by every graph query — deriving a graph
    * from a fact table is a build step, not something each analytics query
    * re-runs (the q_zorder/q_bucketed layout discipline). Deterministic
    * content; readers see identical (u, v) longs.
    *
    * The cache key is a CONTENT fingerprint of the lineitem fixture (path
    * plus every file's name/size/mtime), so regenerating a fixture in
    * place keys a fresh cache entry instead of silently feeding stale
    * edges. Builds land in a per-attempt temp dir and publish via atomic
    * rename — two concurrent sessions race only on who renames first, and
    * the loser adopts the winner's (identical, deterministic) output. */
  private def copurchaseEdges(s: SparkSession, dir: String): DataFrame = {
    val src = new java.io.File(dir, "lineitem.parquet")
    val files = if (src.isDirectory)
      Option(src.listFiles()).toSeq.flatten.sortBy(_.getName) else Seq(src)
    val sig = files.map(f => s"${f.getName}:${f.length}:${f.lastModified}")
      .mkString(s"$dir!", "|", "")
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(sig.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val path = new java.io.File(s"/tmp/graft_copurchase_$tag")
    if (!new java.io.File(path, "_SUCCESS").exists()) {
      val tmp = new java.io.File(
        path.getPath + ".build-" + java.util.UUID.randomUUID().toString.take(8))
      Graphs.coOccurrenceEdges(
          table(s, dir, "lineitem"), "l_orderkey", "l_partkey")
        .write.mode("overwrite").parquet(tmp.getPath)
      // Atomic publish; losing a rename race means another session already
      // published the same deterministic content — discard ours.
      if (!tmp.renameTo(path)) {
        import scala.reflect.io.Directory
        new Directory(tmp).deleteRecursively()
      }
    }
    s.read.parquet(path.getPath)
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-column profile of the documents table — one scan, one aggregate
    // (exact distincts via a single Expand), reshaped long on the driver.
    "q_profile_docs" -> { (s, dir) =>
      Profiling.profile(graft.Tables.spread(table(s, dir, "documents")), ProfileCols)
    },
    // The data-card mode field: each profiled column's most frequent
    // value via the max-join argmax (never a per-column window).
    "q_profile_modes" -> { (s, dir) =>
      Profiling.modes(graft.Tables.spread(table(s, dir, "documents")), ProfileCols)
    },
    // Fixed-width value histogram per event type: mergeable bins, one
    // map-side-combined aggregate.
    "q_histogram" -> { (s, dir) =>
      Profiling.histogram(table(s, dir, "events"), "value", 25.0d,
        Seq("event_type"))
    },
    // Equi-depth histogram: 8 buckets cut at exact octile boundaries of
    // the doc-length distribution, derived wholly from the distinct-value
    // frequency table (see Profiling.equiDepthHistogram for the scale
    // contract).
    "q_histogram_equidepth" -> { (s, dir) =>
      Profiling.equiDepthHistogram(graft.Tables.spread(table(s, dir, "documents")), "n_chars", 8)
    },
    // Distribution drift: event-type mix of the month's first half vs
    // second half, as per-category chi-square contributions (the ingest
    // monitoring pass — "which categories moved").
    "q_dist_drift" -> { (s, dir) =>
      Profiling.distributionDrift(table(s, dir, "events"), "event_type",
        dayofmonth(col("ts")) <= 15)
    },
    // EXACT length quantiles per language — type-1 order statistics at
    // integer ranks, no sketch and no interpolation, so the values
    // hash-match any engine that sorts the same longs.
    "q_exact_quantiles" -> { (s, dir) =>
      Profiling.exactQuantiles(graft.Tables.spread(table(s, dir, "documents")), Seq("lang"),
        "n_chars", Seq(("p25", 1L, 4L), ("p50", 1L, 2L),
          ("p75", 3L, 4L), ("p95", 19L, 20L)))
    },
    // Detect + redact synthetic PII: per-doc match counts by class and the
    // md5 of the redacted text (pins the exact replacement output, not
    // just the counts). The injected text is let-bound through a Generate
    // barrier so the concat runs once, not once per regex.
    "q_pii_redact" -> { (s, dir) =>
      SqlLet.explodeOnce(
          graft.Tables.spread(table(s, dir, "documents")).select(col("doc_id"), col("text")),
          array(injected), "t")
        .select(col("doc_id"),
          Pii.countMatches(col("t"), Pii.EmailRe).cast("long").as("n_emails"),
          Pii.countMatches(col("t"), Pii.Ipv4Re).cast("long").as("n_ips"),
          Pii.countMatches(col("t"), Pii.LongNumRe).cast("long").as("n_nums"),
          md5(Pii.redact(col("t"))).as("redacted_md5"))
    },
    // Boilerplate passages: every 5-word window shared by >= 2 documents.
    "q_dup_passages" -> { (s, dir) =>
      Dedup.duplicatePassages(graft.Tables.spread(table(s, dir, "documents")), w = 5, minDocs = 2L)
    },
    // Passage SCRUBBING — the rewrite companion: duplicated 5-word windows
    // removed everywhere but their canonical first occurrence, documents
    // reassembled; md5 pins the exact surviving word sequence.
    "q_passage_scrub" -> { (s, dir) =>
      Dedup.scrubPassages(graft.Tables.spread(table(s, dir, "documents")), w = 5, minDocs = 2L)
        .select(col("doc_id"), md5(col("scrubbed")).as("scrubbed_md5"),
          col("n_kept"), col("n_removed"))
    },
    // Batch-vs-corpus passage scrub: arriving docs (doc_id % 10 >= 8, the
    // incremental-family split) lose every window the corpus index already
    // holds — no canonical survivor, the corpus has the text.
    "q_passage_scrub_incremental" -> { (s, dir) =>
      val docs = graft.Tables.spread(table(s, dir, "documents"))
      val isBatch = col("doc_id") % 10 >= 8
      Dedup.scrubPassagesIncremental(
        docs.filter(isBatch),
        Dedup.passageIndex(docs.filter(!isBatch), w = 5), w = 5)
        .select(col("doc_id"), md5(col("scrubbed")).as("scrubbed_md5"),
          col("n_kept"), col("n_removed"))
    },
    // Frequent co-purchase pairs at support >= 3, with the exact integer
    // supports lift/confidence derive from.
    "q_pair_support" -> { (s, dir) =>
      Graphs.frequentPairs(table(s, dir, "lineitem"),
        "l_orderkey", "l_partkey", minSup = 3L)
    },
    // Triangle census of the co-purchase graph (parts sharing an order) —
    // degree-ordered orientation on the Spark side, id-ordered 3-way join
    // on the oracle side: two independent formulations, one count.
    "q_triangles" -> { (s, dir) =>
      Graphs.triangleStats(copurchaseEdges(s, dir))
    },
    // Fixed-point PageRank (3 rounds) over the same co-purchase graph —
    // top-20 parts under the total order (rank desc, node), so the LIMIT
    // is deterministic even through rank ties.
    "q_pagerank" -> { (s, dir) =>
      Graphs.pageRankFixedPoint(copurchaseEdges(s, dir), iters = 3)
        .orderBy(col("rank_fp").desc, col("node"))
        .limit(20)
    },
    // Seeded label propagation (3 rounds) over the co-purchase graph:
    // every ~97th part seeds its own id; a node's label is the smallest
    // seed id within 3 hops. Min-combining keeps the fixed point
    // deterministic, so the oracle unrolls the identical rounds.
    "q_label_prop" -> { (s, dir) =>
      val seeds = table(s, dir, "lineitem")
        .select(col("l_partkey").as("node")).distinct()
        .filter(col("node") % 97 === 0)
        .withColumn("label", col("node"))
      Graphs.labelPropagation(copurchaseEdges(s, dir), seeds, iters = 3)
    },
    // Personalized PageRank from the same seed set: teleport restricted
    // to seeds (the data-selection walk), 3 rounds, integer fixed point;
    // zero-mass contributions dropped pre-join (frontier-sparse rounds).
    "q_ppr" -> { (s, dir) =>
      val seeds = table(s, dir, "lineitem")
        .select(col("l_partkey").as("node")).distinct()
        .filter(col("node") % 97 === 0)
      Graphs.personalizedPageRank(copurchaseEdges(s, dir), seeds, iters = 3)
    },
    // Multi-source BFS: hop distance from the same seed set, 3 bounded
    // rounds (nodes beyond 3 hops stay null) — the neighborhood-radius
    // audit; frontier-only joins, oracle unrolls propagate-from-all
    // (equivalent under min-combine).
    "q_hop_distance" -> { (s, dir) =>
      val seeds = table(s, dir, "lineitem")
        .select(col("l_partkey").as("node")).distinct()
        .filter(col("node") % 97 === 0)
      Graphs.hopDistance(copurchaseEdges(s, dir), seeds, maxHops = 3)
    },
    // Weighted bounded shortest path: min-plus Bellman-Ford, 3 rounds,
    // deterministic integer weights derived from the endpoints; the
    // engine relaxes only the improved frontier (≡ relax-from-all under
    // min-combine, which is what the oracle unrolls).
    "q_weighted_hops" -> { (s, dir) =>
      val seeds = table(s, dir, "lineitem")
        .select(col("l_partkey").as("node")).distinct()
        .filter(col("node") % 97 === 0)
      val we = copurchaseEdges(s, dir)
        .withColumn("w", lit(1L) + pmod(col("u") + col("v"), lit(3L)))
      Graphs.weightedHopDistance(we, seeds, maxHops = 3)
    },
    // The CONVERGED label assignment: fixpoint = per-component minimum
    // seed, computed via pointer-doubling CC instead of per-hop rounds;
    // the oracle derives the same thing from a recursive transitive
    // closure — two independent formulations of the limit.
    "q_label_prop_converged" -> { (s, dir) =>
      val seeds = table(s, dir, "lineitem")
        .select(col("l_partkey").as("node")).distinct()
        .filter(col("node") % 97 === 0)
        .withColumn("label", col("node"))
      Graphs.labelPropagationFixpoint(copurchaseEdges(s, dir), seeds)
    },
    // k-core of the simhash near-dup similarity graph: documents that sit
    // in DENSELY-duplicated neighborhoods (every member similar to ≥ 4
    // in-core others) — chains and stars of borderline matches peel away,
    // template/boilerplate families survive. Iterative peeling to the
    // (unique, order-independent) fixpoint; the oracle unrolls the same
    // peel rounds over the same pair graph.
    "q_kcore" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      Graphs.kCore(
        Dedup.simhashPairs(graft.Tables.spread(table(s, dir, "documents")), maxHamming = 8)
          .select(col("doc_a").as("u"), col("doc_b").as("v")),
        k = 4)
    },
    // Per-document core numbers of the same similarity graph: 4 fixed
    // h-index rounds (fixpoint = coreness; fixture converges in ≤ 2, so
    // the tail rounds are the identity and the oracle can unroll the
    // identical chain). Internal consistency: coreness ≥ 4 is exactly
    // q_kcore's node set — pinned in GraphPropsSpec.
    "q_coreness" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      Graphs.corenessHIndex(
        Dedup.simhashPairs(graft.Tables.spread(table(s, dir, "documents")), maxHamming = 8)
          .select(col("doc_a").as("u"), col("doc_b").as("v")),
        rounds = 4)
    },
    // SCD-2 validity intervals of each user's event-type state machine.
    "q_scd2" -> { (s, dir) =>
      Temporal.scd2(
        table(s, dir, "events").select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"), col("event_id")),
        keys = Seq("user_id"), attrCol = "event_type",
        instantCol = "us", tieCols = Seq("event_id"))
    },
    // Global contiguous ids under the (lang, doc_id) total order — the
    // distributed two-pass prefix sum, pinned against the single-partition
    // row_number() the oracle writes.
    "q_global_ids" -> { (s, dir) =>
      Numbering.assignGlobalIds(
        graft.Tables.spread(table(s, dir, "documents")).select(col("doc_id"), col("lang")),
        order = Seq(col("lang"), col("doc_id")))
    },
    // Inverted index: term -> document frequency + sorted posting list.
    "q_inverted_index" -> { (s, dir) =>
      graft.Tables.spread(table(s, dir, "documents"))
        .select(col("doc_id"),
          explode(TextFunctions.words(col("text"))).as("term"))
        .distinct()
        .groupBy("term")
        .agg(count(lit(1)).as("df"),
          // Postings serialize to a ','-joined string, not ARRAY<BIGINT>:
          // the repo convention (and the driver's hasher contract) is that
          // no query emits raw array columns. Sort NUMERICALLY first, then
          // stringify — string sort would put "10" before "2".
          array_join(
            transform(sort_array(collect_list(col("doc_id"))),
              _.cast("string")), ",").as("postings"))
    }
  )

  /** Deduped co-purchase membership with the [[Graphs.MaxGroup]] hot-group
    * cap replicated oracle-side: every graph oracle below derives its edge
    * list from THIS `pl`, so the cap is pinned semantics, not a silent
    * Spark-only divergence. (TPC-H orders hold ≤ 7 parts, so at fixture
    * scale the filter drops nothing — the hashes prove exactly that.) */
  private val CappedPl =
    s"""pl0 AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS p
       |    FROM lineitem),
       |pl AS (SELECT g, p FROM pl0
       |       QUALIFY count(*) OVER (PARTITION BY g) <= ${Graphs.MaxGroup})""".stripMargin

  override def oracles: Map[String, String] = Map(
    "q_profile_docs" -> ProfileCols.map(c =>
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |  count(*) - count($c) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct,
         |  min(CAST($c AS VARCHAR)) AS min_str,
         |  max(CAST($c AS VARCHAR)) AS max_str FROM documents""".stripMargin)
      .mkString("\nUNION ALL\n"),
    "q_profile_modes" -> ProfileCols.map(c =>
      s"""SELECT '$c' AS col_name, min(value) AS top_value, max(cnt) AS top_count
         |FROM (SELECT CAST($c AS VARCHAR) AS value, count(*) AS cnt
         |      FROM documents WHERE $c IS NOT NULL GROUP BY 1)
         |WHERE cnt = (SELECT max(cnt) FROM
         |  (SELECT count(*) AS cnt FROM documents WHERE $c IS NOT NULL
         |   GROUP BY CAST($c AS VARCHAR)))""".stripMargin)
      .mkString("\nUNION ALL\n"),
    "q_histogram" ->
      """SELECT event_type, CAST(floor(value / 25.0) AS BIGINT) AS bin,
        |  count(*) AS n,
        |  CAST(CAST(floor(value / 25.0) AS BIGINT) * 25.0 AS DOUBLE) AS bin_lo
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_pii_redact" ->
      s"""WITH t AS (SELECT doc_id, $InjectedSql AS t FROM documents)
         |SELECT doc_id,
         |  len(regexp_extract_all(t, '${Pii.EmailRe}')) AS n_emails,
         |  len(regexp_extract_all(t, '${Pii.Ipv4Re}')) AS n_ips,
         |  len(regexp_extract_all(t, '${Pii.LongNumRe}')) AS n_nums,
         |  md5(regexp_replace(regexp_replace(regexp_replace(t,
         |    '${Pii.EmailRe}', '<EMAIL>', 'g'),
         |    '${Pii.Ipv4Re}', '<IP>', 'g'),
         |    '${Pii.LongNumRe}', '<NUM>', 'g')) AS redacted_md5
         |FROM t""".stripMargin,
    "q_dup_passages" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        |    FROM documents),
        |g AS (SELECT doc_id, array_to_string(ws[i:i+4], ' ') AS passage
        |      FROM w, unnest(generate_series(1, len(ws) - 4)) AS t(i)
        |      WHERE len(ws) >= 5)
        |SELECT passage, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ,
        |  min(doc_id) AS first_doc
        |FROM g GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2""".stripMargin,
    // Positions are 1-based here, 0-based on the Spark side — a pure
    // internal basis, never exposed: only (md5, counts) cross engines.
    "q_passage_scrub" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        |    FROM documents),
        |wp AS (SELECT doc_id, CAST(t.i AS BIGINT) AS pos,
        |         ws[CAST(t.i AS INT)] AS word
        |       FROM w, unnest(generate_series(1, len(ws))) AS t(i)),
        |g AS (SELECT doc_id, CAST(t.i AS BIGINT) AS gpos,
        |        array_to_string(ws[i:i+4], ' ') AS passage
        |      FROM w, unnest(generate_series(1, len(ws) - 4)) AS t(i)
        |      WHERE len(ws) >= 5),
        |dup AS (SELECT passage FROM g GROUP BY 1
        |        HAVING count(DISTINCT doc_id) >= 2),
        |c1 AS (SELECT passage, min(doc_id) AS cdoc
        |       FROM g JOIN dup USING (passage) GROUP BY 1),
        |c2 AS (SELECT g.passage, c1.cdoc, min(g.gpos) AS cgpos
        |       FROM g JOIN c1 ON g.passage = c1.passage AND g.doc_id = c1.cdoc
        |       GROUP BY 1, 2),
        |cov0 AS (SELECT g.doc_id, g.gpos
        |         FROM g JOIN c2 ON g.passage = c2.passage
        |         WHERE NOT (g.doc_id = c2.cdoc AND g.gpos = c2.cgpos)),
        |cov AS (SELECT DISTINCT doc_id, gpos + CAST(u.j AS BIGINT) AS pos
        |        FROM cov0, unnest(generate_series(0, 4)) AS u(j)),
        |kept AS (SELECT wp.doc_id, wp.pos, wp.word
        |         FROM wp LEFT JOIN cov
        |           ON wp.doc_id = cov.doc_id AND wp.pos = cov.pos
        |         WHERE cov.doc_id IS NULL),
        |agg AS (SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS scrubbed,
        |          count(*) AS n_kept
        |        FROM kept GROUP BY 1)
        |SELECT w.doc_id, md5(coalesce(a.scrubbed, '')) AS scrubbed_md5,
        |  CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
        |  CAST(len(ws) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed
        |FROM w LEFT JOIN agg a USING (doc_id)""".stripMargin,
    "q_passage_scrub_incremental" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        |    FROM documents),
        |bw AS (SELECT * FROM w WHERE doc_id % 10 >= 8),
        |wp AS (SELECT doc_id, CAST(t.i AS BIGINT) AS pos,
        |         ws[CAST(t.i AS INT)] AS word
        |       FROM bw, unnest(generate_series(1, len(ws))) AS t(i)),
        |g AS (SELECT doc_id, CAST(t.i AS BIGINT) AS gpos,
        |        array_to_string(ws[i:i+4], ' ') AS passage
        |      FROM bw, unnest(generate_series(1, len(ws) - 4)) AS t(i)
        |      WHERE len(ws) >= 5),
        |idx AS (SELECT DISTINCT array_to_string(ws[i:i+4], ' ') AS passage
        |        FROM w, unnest(generate_series(1, len(ws) - 4)) AS t(i)
        |        WHERE doc_id % 10 < 8 AND len(ws) >= 5),
        |cov0 AS (SELECT g.doc_id, g.gpos FROM g JOIN idx USING (passage)),
        |cov AS (SELECT DISTINCT doc_id, gpos + CAST(u.j AS BIGINT) AS pos
        |        FROM cov0, unnest(generate_series(0, 4)) AS u(j)),
        |kept AS (SELECT wp.doc_id, wp.pos, wp.word
        |         FROM wp LEFT JOIN cov
        |           ON wp.doc_id = cov.doc_id AND wp.pos = cov.pos
        |         WHERE cov.doc_id IS NULL),
        |agg AS (SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS scrubbed,
        |          count(*) AS n_kept
        |        FROM kept GROUP BY 1)
        |SELECT bw.doc_id, md5(coalesce(a.scrubbed, '')) AS scrubbed_md5,
        |  CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
        |  CAST(len(ws) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed
        |FROM bw LEFT JOIN agg a USING (doc_id)""".stripMargin,
    "q_pair_support" ->
      s"""WITH $CappedPl,
        |pair AS (SELECT a.p AS u, b.p AS v, count(*) AS pair_n
        |  FROM pl a JOIN pl b ON a.g = b.g AND a.p < b.p GROUP BY 1, 2),
        |sup AS (SELECT p, count(*) AS n FROM pl GROUP BY 1)
        |SELECT u, v, pair_n, su.n AS u_n, sv.n AS v_n
        |FROM pair JOIN sup su ON su.p = u JOIN sup sv ON sv.p = v
        |WHERE pair_n >= 3""".stripMargin,
    "q_triangles" ->
      s"""WITH $CappedPl,
        |e AS (SELECT DISTINCT a.p AS u, b.p AS v
        |      FROM pl a JOIN pl b ON a.g = b.g AND a.p < b.p),
        |d AS (SELECT n, count(*) AS dg FROM
        |      (SELECT u AS n FROM e UNION ALL SELECT v FROM e) GROUP BY 1)
        |SELECT (SELECT count(*) FROM d) AS n_nodes,
        |  (SELECT count(*) FROM e) AS n_edges,
        |  (SELECT count(*) FROM e e1
        |     JOIN e e2 ON e1.v = e2.u
        |     JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v) AS n_triangles,
        |  (SELECT max(dg) FROM d) AS max_degree""".stripMargin,
    "q_pagerank" -> {
      // The same 3 damped rounds, unrolled as chained CTEs. All-integer
      // fixed-point arithmetic (units of 1e-12): `//` (DuckDB) and `div`
      // (Spark) agree on non-negative operands; the damping multiply runs
      // in HUGEINT here and DECIMAL(38,0) on the Spark side — both exact,
      // both cast to BIGINT only for the final in-range rank.
      def round(i: Int): String =
        s"""r$i AS (SELECT e.dst AS node,
           |  CAST(150000000000 + (sum(r${i - 1}.rank_fp // deg.d) * 85)
           |    // 100 AS BIGINT) AS rank_fp
           |  FROM e JOIN r${i - 1} ON e.src = r${i - 1}.node
           |  JOIN deg ON e.src = deg.src GROUP BY 1)""".stripMargin
      s"""WITH $CappedPl,
         |e0 AS (SELECT DISTINCT a.p AS u, b.p AS v
         |       FROM pl a JOIN pl b ON a.g = b.g AND a.p < b.p),
         |e AS (SELECT u AS src, v AS dst FROM e0
         |      UNION ALL SELECT v, u FROM e0),
         |deg AS (SELECT src, count(*) AS d FROM e GROUP BY 1),
         |r0 AS (SELECT src AS node, CAST(1000000000000 AS BIGINT) AS rank_fp
         |       FROM deg),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT node, rank_fp FROM r3
         |ORDER BY rank_fp DESC, node LIMIT 20""".stripMargin
    },
    "q_dist_drift" ->
      """WITH c AS (SELECT event_type,
        |    CAST(sum(CASE WHEN day(ts) <= 15 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN day(ts) <= 15 THEN 0 ELSE 1 END) AS BIGINT) AS n_b
        |  FROM events GROUP BY 1),
        |t AS (SELECT *, sum(n_a) OVER () AS ta, sum(n_b) OVER () AS tb FROM c)
        |SELECT event_type, n_a, n_b,
        |  CASE WHEN ta > 0 AND tb > 0 THEN
        |    (CAST(n_a AS DOUBLE) * CAST(tb AS DOUBLE) -
        |     CAST(n_b AS DOUBLE) * CAST(ta AS DOUBLE)) *
        |    (CAST(n_a AS DOUBLE) * CAST(tb AS DOUBLE) -
        |     CAST(n_b AS DOUBLE) * CAST(ta AS DOUBLE)) /
        |    (CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE) *
        |     CAST(n_a + n_b AS DOUBLE))
        |  END AS drift_contrib
        |FROM t""".stripMargin,
    "q_histogram_equidepth" -> {
      val k = 8
      val cutCols = (1 until k).map(i =>
        s"min(CASE WHEN cum >= (n*$i + ${k - 1})//$k THEN v END) AS c$i")
        .mkString(",\n  ")
      val bucket = "1 + " +
        (1 until k).map(i => s"CAST(v > c$i AS INT)").mkString(" + ")
      s"""WITH f AS (SELECT n_chars AS v, count(*) AS fc FROM documents
         |  GROUP BY 1),
         |c AS (SELECT v, sum(fc) OVER (ORDER BY v) AS cum,
         |             sum(fc) OVER () AS n FROM f),
         |cuts AS (SELECT $cutCols FROM c)
         |SELECT CAST($bucket AS BIGINT) AS bucket, CAST(sum(fc) AS BIGINT) AS n,
         |       min(v) AS lo, max(v) AS hi
         |FROM f CROSS JOIN cuts GROUP BY 1""".stripMargin
    },
    "q_exact_quantiles" ->
      """WITH r AS (SELECT lang, n_chars,
        |    row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents)
        |SELECT lang, max(n) AS n,
        |  max(CASE WHEN rn = (n * 1 + 3) // 4 THEN n_chars END) AS p25,
        |  max(CASE WHEN rn = (n * 1 + 1) // 2 THEN n_chars END) AS p50,
        |  max(CASE WHEN rn = (n * 3 + 3) // 4 THEN n_chars END) AS p75,
        |  max(CASE WHEN rn = (n * 19 + 19) // 20 THEN n_chars END) AS p95
        |FROM r GROUP BY 1""".stripMargin,
    "q_label_prop" -> {
      def round(i: Int): String =
        s"""r$i AS (SELECT node, min(label) AS label FROM (
           |  SELECT node, label FROM r${i - 1}
           |  UNION ALL
           |  SELECT e.dst, r.label FROM e JOIN r${i - 1} r ON e.src = r.node
           |  WHERE r.label IS NOT NULL) GROUP BY 1)""".stripMargin
      s"""WITH $CappedPl,
         |e0 AS (SELECT DISTINCT a.p AS u, b.p AS v
         |       FROM pl a JOIN pl b ON a.g = b.g AND a.p < b.p),
         |e AS (SELECT u AS src, v AS dst FROM e0
         |      UNION ALL SELECT v, u FROM e0),
         |r0 AS (SELECT DISTINCT src AS node,
         |       CASE WHEN src % 97 = 0 THEN src END AS label FROM e),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT node, label FROM r3""".stripMargin
    },
    // PPR: seed-gated teleport per node, LEFT-joined damped mass so
    // zero-support nodes keep teleport; same integer fixed point as
    // q_pagerank (HUGEINT sums // = Spark's DECIMAL div).
    "q_ppr" -> {
      def round(i: Int): String =
        s"""r$i AS (SELECT n.node, n.d,
           |  CAST((CASE WHEN n.node % 97 = 0 THEN 150000000000 ELSE 0 END)
           |    + coalesce((m.s * 85) // 100, 0) AS BIGINT) AS rank_fp
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.dst, sum(r${i - 1}.rank_fp // r${i - 1}.d) AS s
           |    FROM e JOIN r${i - 1} ON e.src = r${i - 1}.node
           |    GROUP BY 1) m ON n.node = m.dst)""".stripMargin
      s"""WITH $CappedPl,
         |e0 AS (SELECT DISTINCT a.p AS u, b.p AS v
         |       FROM pl a JOIN pl b ON a.g = b.g AND a.p < b.p),
         |e AS (SELECT u AS src, v AS dst FROM e0
         |      UNION ALL SELECT v, u FROM e0),
         |nodes AS (SELECT src AS node, count(*) AS d FROM e GROUP BY 1),
         |r0 AS (SELECT node, d, CASE WHEN node % 97 = 0
         |       THEN CAST(1000000000000 AS BIGINT) ELSE CAST(0 AS BIGINT)
         |       END AS rank_fp FROM nodes),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT node, rank_fp FROM r3""".stripMargin
    },
    // BFS distances: r0 seeds dist 0, each unrolled round min-combines
    // dist+1 pushed from every reached node (≡ the engine's frontier-only
    // form under min).
    "q_hop_distance" -> {
      def round(i: Int): String =
        s"""r$i AS (SELECT node, min(dist) AS dist FROM (
           |  SELECT node, dist FROM r${i - 1}
           |  UNION ALL
           |  SELECT e.dst, r.dist + 1 FROM e JOIN r${i - 1} r ON e.src = r.node
           |  WHERE r.dist IS NOT NULL) GROUP BY 1)""".stripMargin
      s"""WITH $CappedPl,
         |e0 AS (SELECT DISTINCT a.p AS u, b.p AS v
         |       FROM pl a JOIN pl b ON a.g = b.g AND a.p < b.p),
         |e AS (SELECT u AS src, v AS dst FROM e0
         |      UNION ALL SELECT v, u FROM e0),
         |r0 AS (SELECT DISTINCT src AS node,
         |       CASE WHEN src % 97 = 0 THEN CAST(0 AS BIGINT) END AS dist FROM e),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT node, dist FROM r3""".stripMargin
    },
    // Min-plus unroll: each round relaxes from EVERY reached node
    // (≡ the engine's improved-frontier form under min-combine).
    "q_weighted_hops" -> {
      def round(i: Int): String =
        s"""r$i AS (SELECT node, min(dist) AS dist FROM (
           |  SELECT node, dist FROM r${i - 1}
           |  UNION ALL
           |  SELECT e.dst, r.dist + e.w FROM e JOIN r${i - 1} r ON e.src = r.node
           |  WHERE r.dist IS NOT NULL) GROUP BY 1)""".stripMargin
      s"""WITH $CappedPl,
         |e0 AS (SELECT DISTINCT a.p AS u, b.p AS v
         |       FROM pl a JOIN pl b ON a.g = b.g AND a.p < b.p),
         |ew AS (SELECT u, v, 1 + (u + v) % 3 AS w FROM e0),
         |e AS (SELECT u AS src, v AS dst, w FROM ew
         |      UNION ALL SELECT v, u, w FROM ew),
         |r0 AS (SELECT DISTINCT src AS node,
         |       CASE WHEN src % 97 = 0 THEN CAST(0 AS BIGINT) END AS dist FROM e),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT node, dist FROM r3""".stripMargin
    },
    // SCALE NOTE: this oracle's `reach` closure is O(|component|²) — fine
    // at the sf0.01 driver gate (seconds), >20 min at sf0.1 where the
    // co-purchase graph is one giant component. Recursive-closure oracles
    // are viable only where components stay small (cf. q_dedup_clusters);
    // exclude this query from any self-sweep above sf0.01. The OPERATOR is
    // pointer-doubling — the quadratic lives in the oracle only.
    "q_label_prop_converged" ->
      s"""WITH RECURSIVE $CappedPl,
        |e0 AS (SELECT DISTINCT a.p AS u, b.p AS v
        |       FROM pl a JOIN pl b ON a.g = b.g AND a.p < b.p),
        |e AS (SELECT u AS src, v AS dst FROM e0
        |      UNION ALL SELECT v, u FROM e0),
        |n AS (SELECT DISTINCT src AS node FROM e),
        |reach(a, b) AS (SELECT src, dst FROM e
        |  UNION SELECT r.a, e.dst FROM reach r JOIN e ON r.b = e.src),
        |comp AS (SELECT n.node,
        |    least(coalesce(min(r.b), n.node), n.node) AS cid
        |  FROM n LEFT JOIN reach r ON r.a = n.node GROUP BY n.node),
        |cs AS (SELECT cid, min(node) AS label FROM comp
        |  WHERE node % 97 = 0 GROUP BY cid)
        |SELECT comp.node, cs.label FROM comp LEFT JOIN cs USING (cid)""".stripMargin,
    // Peel rounds UNROLLED (not WITH RECURSIVE — SQL recursion accumulates
    // rows; peeling shrinks a set). The sf0.01 graph reaches its fixpoint
    // after 1 drop round; 6 unrolled rounds leave generous slack, and once
    // s_i = s_{i-1} every further round is the identity, so any N past
    // convergence yields the same core the Spark side's
    // converge-or-fail loop produces.
    "q_kcore" -> {
      def peel(i: Int): String =
        s"""s$i AS (SELECT e.src AS node FROM e
           |  JOIN s${i - 1} a ON e.src = a.node
           |  JOIN s${i - 1} b ON e.dst = b.node
           |  GROUP BY 1 HAVING count(*) >= 4)""".stripMargin
      s"""WITH ${DedupPack.SimhashSgCte},
         |e0 AS (SELECT a.doc_id AS u, b.doc_id AS v
         |  FROM sgc a JOIN sgc b
         |    ON (a.simhash >> 16) = (b.simhash >> 16) AND a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 8),
         |e AS (SELECT u AS src, v AS dst FROM e0
         |      UNION ALL SELECT v, u FROM e0),
         |s0 AS (SELECT DISTINCT src AS node FROM e),
         |${(1 to 6).map(peel).mkString(",\n")}
         |SELECT e.src AS node, CAST(count(*) AS BIGINT) AS core_deg
         |FROM e JOIN s6 a ON e.src = a.node JOIN s6 b ON e.dst = b.node
         |GROUP BY 1""".stripMargin
    },
    // The identical 4 h-index rounds, unrolled. `list(...)` aggregation
    // order is nondeterministic in DuckDB, but the DESC list_sort makes
    // the H-index fold order-independent — same trick as the Spark side's
    // sort_array(collect_list(…)).
    "q_coreness" -> {
      def round(t: Int): String =
        s"""r$t AS (SELECT dst AS node,
           |  CAST(list_sum([CASE WHEN l[i] >= i THEN 1 ELSE 0 END
           |    for i in range(1, len(l) + 1)]) AS BIGINT) AS c
           |  FROM (SELECT e.dst, list_reverse(list_sort(list(r${t - 1}.c))) AS l
           |        FROM e JOIN r${t - 1} ON e.src = r${t - 1}.node
           |        GROUP BY e.dst))""".stripMargin
      s"""WITH ${DedupPack.SimhashSgCte},
         |e0 AS (SELECT a.doc_id AS u, b.doc_id AS v
         |  FROM sgc a JOIN sgc b
         |    ON (a.simhash >> 16) = (b.simhash >> 16) AND a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 8),
         |e AS (SELECT u AS src, v AS dst FROM e0
         |      UNION ALL SELECT v, u FROM e0),
         |r0 AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS c
         |       FROM e GROUP BY 1),
         |${(1 to 4).map(round).mkString(",\n")}
         |SELECT node, c AS coreness FROM r4""".stripMargin
    },
    "q_scd2" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id
        |    FROM events),
        |c AS (SELECT *,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |      AS prev,
        |    row_number() OVER (PARTITION BY user_id ORDER BY us, event_id)
        |      AS rn FROM e),
        |ch AS (SELECT user_id, event_type, us, event_id FROM c
        |       WHERE rn = 1 OR prev IS DISTINCT FROM event_type)
        |SELECT user_id, event_type AS state, us AS valid_from,
        |  lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |    AS valid_to
        |FROM ch""".stripMargin,
    "q_global_ids" ->
      """SELECT doc_id, lang,
        |  row_number() OVER (ORDER BY lang, doc_id) AS global_id
        |FROM documents""".stripMargin,
    "q_inverted_index" ->
      """WITH p AS (SELECT DISTINCT doc_id, term FROM (
        |    SELECT doc_id, unnest(string_split_regex(trim(text), '\s+'))
        |      AS term FROM documents))
        |SELECT term, count(*) AS df,
        |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
        |FROM p GROUP BY 1""".stripMargin
  )
}
