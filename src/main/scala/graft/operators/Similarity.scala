package graft.operators

import scala.collection.mutable
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.SqlLet

/** Similarity search over embedding columns (`Array[Float]`): brute-force
  * cosine top-k with a per-partition partial-top-k stage, and blocked
  * pairwise near-duplicate detection.
  *
  * Numeric determinism: every element is cast to double BEFORE any
  * arithmetic, dot products are sequential left-to-right folds, and emitted
  * similarities are rounded to 6 dp — so the DuckDB oracle (same formula,
  * same rounding) compares clean, and ranking ties are broken by vector id.
  *
  * Scale shape (the 100 TB story):
  *   - top-k: the query set is BROADCAST (small side), so scoring is a
  *     narrow map over the big side — no shuffle of the corpus. The naive
  *     plan then shuffles |corpus| × |queries| scored rows into a window;
  *     [[Similarity.partialTopK]] cuts that to (partitions × queries × k)
  *     rows before the shuffle — the same partial/final shape Catalyst
  *     plans for aggregates, hand-built because top-k-per-group has no
  *     partial-aggregate form in the DataFrame API. This is the one
  *     deliberate mapPartitions in the engine (SURVEY.md §7.3: justified
  *     when built-ins can't express the partial step).
  *   - near-dup: equi-join on a blocking key (here `label`; in production a
  *     coarse quantization bucket), pairwise verify only inside blocks —
  *     the same no-cross-join discipline as [[Dedup]].
  */
object Similarity {

  /** Sequential double-precision dot product — the codegen'd
    * [[graft.plans.VecDot]] expression (install via
    * [[graft.plans.GraftExtensions.register]]); bit-identical to [[dotFold]]
    * and to the oracle's formula, ~4× faster than the interpreted fold. */
  def dot(a: String, b: String): Column =
    call_function("vec_dot", col(a), col(b))

  /** Built-ins-only fold with the same semantics (kept as the reference
    * implementation and for sessions without the extension installed). */
  def dotFold(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double)), " +
      "cast(0 as double), (acc, v) -> acc + v)")

  /** Cosine formula shared by every operator here: dot/(‖a‖·‖b‖), each norm
    * its own sqrt, rounded to 6 dp — mirrored exactly in the oracle. A
    * zero-norm vector (all-zero embedding) makes the denominator 0; cosine
    * is undefined there, so the denominator is `nullif`-guarded and the NULL
    * similarity then fails every `>= threshold` filter instead of surfacing
    * as NaN (or a divide error under strict modes). */
  def cosineOf(dotAB: Column, n2a: Column, n2b: Column): Column =
    round(dotAB / nullif(sqrt(n2a) * sqrt(n2b), lit(0d)), 6)

  /** Cosine similarity of two vector columns. */
  def cosine(a: String, b: String): Column =
    cosineOf(dot(a, b), dot(a, a), dot(b, b))

  /** Sign-signature bucket over the first `bits` dimensions — a
    * deterministic coarse quantization (IVF-style cell id) replicable in
    * plain SQL on any engine: bit d set ⇔ v[d] > 0. */
  def signBucket(vecCol: String, bits: Int = 8): Column =
    (0 until bits).map { d =>
      when(element_at(col(vecCol), d + 1) > 0f, lit(1 << d)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Bucketed ANN top-k — the 100 TB scale path: candidates share the
    * query's quantization cell, so the search is an equi-JOIN on the bucket
    * id (co-partitioned shuffle hash join, no broadcast, no all-pairs),
    * then exact cosine re-rank inside cells. Recall is a quantization
    * property (finer cells → fewer candidates), part of the operator's
    * declared semantics — the oracle replicates the bucketing. Queries with
    * under k cellmates return fewer rows, like any IVF with nprobe=1. */
  def knnBucketed(corpus: DataFrame, queries: DataFrame, k: Int,
                  bits: Int = 8, idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol), col(vecCol),
      signBucket(vecCol, bits).as("bkt"), dot(vecCol, vecCol).as("n2_c"))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      signBucket(vecCol, bits).as("q_bkt"), dot(vecCol, vecCol).as("n2_q"))
    val scored = c.join(q, col("bkt") === col("q_bkt") && col(idCol) =!= col("q_id"))
      .select(col("q_id"), col(idCol),
        cosineOf(dot("q_vec", vecCol), col("n2_q"), col("n2_c")).as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", idCol, "rank", "sim")
  }

  /** Hard-negative mining — the contrastive-training variant of
    * [[knnBucketed]]: for each query, the top-k most-similar corpus vectors
    * with a DIFFERENT label (nearest vectors the model must learn to push
    * away). Candidates come from the query's sign-bucket cell, so the plan
    * is the same co-partitioned equi-join as knnBucketed with the
    * label-mismatch predicate fused into the join condition — it prunes
    * same-label pairs BEFORE cosine scoring, and self-pairs vacuously
    * (a query shares its own label). Queries whose cell holds only
    * same-label vectors yield no rows, like any nprobe=1 IVF miss.
    *
    * Output: (q_id, q_label, vec_id, label, rank, sim). */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
                    bits: Int = 8, idCol: String = "vec_id",
                    vecCol: String = "embedding",
                    labelCol: String = "label"): DataFrame = {
    val c = corpus.select(col(idCol), col(vecCol), col(labelCol),
      signBucket(vecCol, bits).as("bkt"), dot(vecCol, vecCol).as("n2_c"))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      col(labelCol).as("q_label"), signBucket(vecCol, bits).as("q_bkt"),
      dot(vecCol, vecCol).as("n2_q"))
    val scored = c.join(q,
        col("bkt") === col("q_bkt") && col(labelCol) =!= col("q_label"))
      .select(col("q_id"), col("q_label"), col(idCol), col(labelCol),
        cosineOf(dot("q_vec", vecCol), col("n2_q"), col("n2_c")).as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("q_label"), col(idCol), col(labelCol),
        col("rank"), col("sim"))
  }

  /** Per-partition partial top-k: keep at most k rows per query id inside
    * each partition, ordered by (score DESC, tie ASC). Output rows are a
    * superset of the global top-k — feed them to the final window. */
  def partialTopK(scored: DataFrame, qCol: String, tieCol: String,
                  scoreCol: String, k: Int): DataFrame = {
    val schema = scored.schema
    val qi = schema.fieldIndex(qCol)
    val ti = schema.fieldIndex(tieCol)
    val si = schema.fieldIndex(scoreCol)
    // (score desc, tie asc): `better` = ordering by which we keep rows.
    def better(x: Row, y: Row): Boolean = {
      val sx = x.getDouble(si); val sy = y.getDouble(si)
      if (sx != sy) sx > sy else x.getLong(ti) < y.getLong(ti)
    }
    scored.mapPartitions { it =>
      // Worst-kept row at the head of each heap → O(log k) eviction.
      val heaps = mutable.Map.empty[Any, mutable.PriorityQueue[Row]]
      val worstFirst = new Ordering[Row] {
        def compare(x: Row, y: Row): Int = if (better(x, y)) 1 else if (better(y, x)) -1 else 0
      }
      it.foreach { row =>
        val h = heaps.getOrElseUpdate(row.get(qi),
          mutable.PriorityQueue.empty[Row](worstFirst.reverse))
        if (h.size < k) h.enqueue(row)
        else if (better(row, h.head)) { h.dequeue(); h.enqueue(row) }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }(Encoders.row(schema))
  }

  /** Top-k cosine neighbors for each query vector. `queries` must be small
    * enough to broadcast (it is hash-hinted); self-pairs are excluded.
    * Output: (q_id, vec_id, rank, sim).
    *
    * Norms are precomputed BELOW the join on each side — the join is an
    * evaluation barrier, so each ‖v‖² is one fold per row instead of one per
    * pair (3× fewer flops; same float semantics as the oracle, which also
    * sqrt-s a full-precision dot). */
  def knn(corpus: DataFrame, queries: DataFrame, k: Int,
          idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      dot(vecCol, vecCol).as("n2_q")))
    val scored = corpus
      .select(col(idCol), col(vecCol), dot(vecCol, vecCol).as("n2_c"))
      .crossJoin(q)
      .filter(col(idCol) =!= col("q_id"))
      .select(col("q_id"), col(idCol),
        cosineOf(dot("q_vec", vecCol), col("n2_q"), col("n2_c")).as("sim"))
    val partial = partialTopK(scored, "q_id", idCol, "sim", k)
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col(idCol).asc)
    partial.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", idCol, "rank", "sim")
  }

  /** Multi-probe variant of [[knnBucketed]]: each query also probes every
    * cell at hamming distance 1 from its own (nprobe = bits+1), recovering
    * neighbors that fell just across a quantization boundary — the standard
    * IVF recall lever, still equi-join-only. Probe cells are distinct, so no
    * candidate dedup is needed. */
  def knnMultiprobe(corpus: DataFrame, queries: DataFrame, k: Int,
                    bits: Int = 4, idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol), col(vecCol),
      signBucket(vecCol, bits).as("bkt"), dot(vecCol, vecCol).as("n2_c"))
    val probes = (0 until bits).map(b => expr(s"q_bkt ^ ${1 << b}"))
    val q = queries
      .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
        signBucket(vecCol, bits).as("q_bkt"), dot(vecCol, vecCol).as("n2_q"))
      .select(col("q_id"), col("q_vec"), col("n2_q"),
        explode(array(col("q_bkt") +: probes: _*)).as("probe"))
    val scored = c.join(q, col("bkt") === col("probe") && col(idCol) =!= col("q_id"))
      .select(col("q_id"), col(idCol),
        cosineOf(dot("q_vec", vecCol), col("n2_q"), col("n2_c")).as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", idCol, "rank", "sim")
  }

  /** IVF (inverted-file) ANN — the centroid-partitioned scale path:
    *
    *   1. "Train": the `numCentroids` lowest-id corpus vectors stand in for
    *      k-means centroids (deterministic, so the oracle replicates them;
    *      swap in trained centroids at deploy time — the plan shape below is
    *      identical). Collecting C×dim floats to the driver is the broadcast
    *      BUILD side of the index, not a data collect.
    *   2. Assign: every corpus vector goes to its nearest centroid by
    *      squared L2, computed from dots (‖v‖² + ‖c‖² − 2·v·c) as a literal
    *      fold over the C centroids — a NARROW per-row projection, no join,
    *      no shuffle of the corpus (ties break toward the lower centroid id
    *      via lexicographic struct min).
    *   3. Probe: each query explodes to its `nprobe` nearest cells; the
    *      candidate search is an equi-JOIN on the cell id (each corpus
    *      vector lives in exactly one cell, so no candidate dedup), then
    *      exact cosine re-rank. Recall is the nprobe/centroid-count trade —
    *      declared operator semantics, replicated by the oracle. */
  def knnIvf(corpus: DataFrame, queries: DataFrame, k: Int,
             numCentroids: Int = 8, nprobe: Int = 2,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents: Seq[(Long, Seq[Double])] =
      corpus.orderBy(col(idCol)).limit(numCentroids)
        .select(col(idCol), col(vecCol)).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble))).toSeq
    knnIvfWith(corpus, queries, k, cents, nprobe, idCol, vecCol)
  }

  /** [[knnIvf]] with EXPLICIT centroids — e.g. the output of [[kmeans]].
    * Centroid ids become the cell ids. */
  def knnIvfWith(corpus: DataFrame, queries: DataFrame, k: Int,
                 cents: Seq[(Long, Seq[Double])], nprobe: Int,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // struct(d2, c_id) per centroid; lexicographic struct ordering gives the
    // (distance, id) tie-break in both array_min and array_sort.
    def centDists(vec: Column, n2: Column): Column = array(cents.map { case (cid, cv) =>
      val cn2 = cv.foldLeft(0d)((a, x) => a + x * x)
      struct(((n2 + lit(cn2)) - lit(2d) * call_function("vec_dot", vec,
        typedLit(cv))).as("d2"), lit(cid).as("c_id"))
    }: _*)
    val c = corpus.select(col(idCol), col(vecCol), dot(vecCol, vecCol).as("n2_c"))
      .withColumn("cell", array_min(centDists(col(vecCol), col("n2_c"))).getField("c_id"))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
        dot(vecCol, vecCol).as("n2_q"))
      .withColumn("probe", explode(transform(
        slice(array_sort(centDists(col("q_vec"), col("n2_q"))), 1, nprobe),
        _.getField("c_id"))))
    val scored = c.join(q, col("cell") === col("probe") && col(idCol) =!= col("q_id"))
      .select(col("q_id"), col(idCol),
        cosineOf(dot("q_vec", vecCol), col("n2_q"), col("n2_c")).as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", idCol, "rank", "sim")
  }

  /** Deterministic Lloyd k-means over the embedding column — the IVF
    * training step ([[knnIvfWith]] consumes the result). Init = the k
    * lowest-id vectors; each iteration broadcasts the current centroids
    * (k×dim doubles held on the driver — the index build side, like any
    * broadcast join build), assigns every vector with the same narrow argmin
    * fold as [[knnIvfWith]] (no join, no shuffle of the corpus), and
    * recomputes centroids as per-dimension means via posexplode →
    * (cell, dim) hash aggregate — per iteration ONE bounded shuffle whose
    * output is k×dim rows, never corpus-sized. Ties break toward the lower
    * centroid index; an emptied cell keeps its previous centroid.
    *
    * Determinism: the per-dimension mean is a SEQUENTIAL double fold over
    * the cell's values in ascending `idCol` order
    * (`aggregate(array_sort(collect_list(struct(id, v))), 0d, +)`), not
    * `avg` — partial-sum order therefore cannot leak into the result, so
    * trained centroids are bit-identical across runs AND partitionings, and
    * the DuckDB oracle replicates the whole 3-iteration run value-for-value
    * (`list_reduce` over `list(val ORDER BY vec_id)`). Cost: the per-group
    * collect_list holds one cell's values for one dimension (cell size
    * doubles, k×dim groups) — fine while cells fit a task; at extreme cell
    * sizes trade determinism back for `avg` or pre-bucket the fold. */
  def kmeans(corpus: DataFrame, k: Int, iters: Int,
             idCol: String = "vec_id", vecCol: String = "embedding"): Seq[Seq[Double]] = {
    var cents: Seq[Seq[Double]] = corpus.orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
    for (_ <- 0 until iters) {
      // The corpus n2 feeds every centroid distance — let-bind it once.
      val distArr = graft.functions.SqlLet.let(dot(vecCol, vecCol), n2 =>
        array(cents.zipWithIndex.map { case (cv, i) =>
          val cn2 = cv.foldLeft(0d)((a, x) => a + x * x)
          struct(((n2 + lit(cn2)) - lit(2d) * call_function("vec_dot",
            col(vecCol), typedLit(cv))).as("d2"), lit(i).as("c_id"))
        }: _*))
      val assigned = corpus.select(col(idCol), col(vecCol),
        array_min(distArr).getField("c_id").as("cell"))
      val sortedVals = transform(
        array_sort(collect_list(struct(col(idCol).as("id"),
          col("col").cast("double").as("v")))),
        _.getField("v"))
      val means = assigned
        .select(col("cell"), col(idCol), posexplode(col(vecCol)))
        .groupBy("cell", "pos")
        .agg((aggregate(sortedVals, lit(0d), (acc, x) => acc + x)
          / count(lit(1)).cast("double")).as("m"))
        .collect()
      val byCell = means.groupBy(_.getInt(0))
      cents = cents.indices.map { i =>
        byCell.get(i)
          .map(_.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq)
          .getOrElse(cents(i))
      }
    }
    cents
  }

  /** Symmetric int8 quantization of an embedding column — the storage/
    * bandwidth lever at corpus scale: a 64-dim float vector (256 B) becomes
    * 64 int8 codes + one float scale (~68 B), and candidate scoring runs on
    * integer codes (exact, order-independent sums) instead of floats.
    *
    * scale = max|v| / 127; code_i = floor(v_i/scale + 0.5) — explicit
    * half-up-toward-+∞ rounding, chosen over `round()` because its floor
    * formulation is bit-reproducible on any engine (the oracle uses the
    * same expression). A zero vector gets scale 0 and all-zero codes.
    * Output codes stay INT (values in [-127, 127]): parquet/arrow TINYINT
    * round-trips vary by engine, int8 range does not. */
  def int8Codes(vecCol: String): Column =
    SqlLet.let(int8Scale(vecCol), s =>
      transform(col(vecCol), x =>
        when(s === 0d, lit(0))
          .otherwise(floor(x.cast("double") / s + lit(0.5)).cast("int"))))

  /** Per-vector quantization scale: max|v| / 127 as double. */
  def int8Scale(vecCol: String): Column =
    array_max(transform(col(vecCol), x => abs(x.cast("double")))) / lit(127d)

  /** Exact integer dot product of two int-code arrays (LONG — 127²·dim
    * stays far inside the range). Order-independent, so no sequential-fold
    * discipline is needed: integer addition associates. */
  def qdot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (acc, v) => acc + v)

  /** Quantized-candidate kNN — the IVF-PQ-shaped pipeline: coarse sign-
    * bucket cell (equi-join, as [[knnBucketed]]), candidate ranking by
    * INT8-code cosine (integer dot products — exact, cheap, and the only
    * thing a scaled scan would keep in memory), then exact float re-rank of
    * the surviving `candMult`×k per query. All joins stay equi-joins; the
    * float vectors are only touched for the final candidate set, so at
    * 100 TB the hot path reads codes (¼ the bytes) and the re-rank reads
    * the full vectors for candMult·k·|queries| rows.
    *
    * Quantized cosine = qd/(√qaa·√qbb) over exact integer dots — ties (and
    * the approx→exact rank boundary) break by vec_id, so the candidate set
    * is deterministic and the oracle replicates both stages. */
  def knnQuantized(corpus: DataFrame, queries: DataFrame, k: Int,
                   bits: Int = 8, candMult: Int = 3,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol), col(vecCol),
      signBucket(vecCol, bits).as("bkt"), int8Codes(vecCol).as("qc"),
      dot(vecCol, vecCol).as("n2_c"))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      signBucket(vecCol, bits).as("q_bkt"), int8Codes(vecCol).as("q_qc"),
      dot(vecCol, vecCol).as("n2_q"))
    val cand = c.join(q, col("bkt") === col("q_bkt") && col(idCol) =!= col("q_id"))
      .select(col("q_id"), col(idCol), col(vecCol), col("q_vec"),
        col("n2_c"), col("n2_q"),
        (qdot(col("q_qc"), col("qc")).cast("double") /
          nullif(sqrt(qdot(col("qc"), col("qc")).cast("double")) *
            sqrt(qdot(col("q_qc"), col("q_qc")).cast("double")), lit(0d))).as("qsim"))
    val wq = Window.partitionBy("q_id")
      .orderBy(col("qsim").desc_nulls_last, col(idCol).asc)
    val survivors = cand.withColumn("qrank", row_number().over(wq))
      .filter(col("qrank") <= k * candMult)
    val we = Window.partitionBy("q_id").orderBy(col("sim").desc, col(idCol).asc)
    survivors
      .select(col("q_id"), col(idCol),
        cosineOf(dot("q_vec", vecCol), col("n2_q"), col("n2_c")).as("sim"))
      .withColumn("rank", row_number().over(we))
      .filter(col("rank") <= k)
      .select("q_id", idCol, "rank", "sim")
  }

  /** Blocked pairwise near-duplicates: intra-block pairs (blockCol equality,
    * id_a < id_b) with cosine >= threshold. Output (id_a, id_b, sim).
    * Norms precomputed below the join, as in [[knn]].
    *
    * Blocks past `maxBlock` are dropped before the self-join
    * ([[graft.operators.Dedup.MaxBucket]] discipline): a B-vector block
    * emits B² candidate pairs whatever the join strategy, so one
    * degenerate block (a dominant label, a default embedding) must not be
    * allowed to go quadratic — the cap is declared semantics the oracles
    * replicate, and the size gate keys on the SAME column the pair join
    * shuffles on. */
  def blockedNearDup(corpus: DataFrame, blockCol: String, threshold: Double,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     maxBlock: Long = graft.operators.Dedup.MaxBucket): DataFrame = {
    require(maxBlock >= 2, "maxBlock below 2 would drop every pair")
    // Window count, not aggregate+semi-join: one exchange on the block key
    // serves both the gate and the pair join, and the norm projection runs
    // once (see the phashPairs measurement).
    val slim = corpus.select(col(idCol), col(blockCol), col(vecCol),
        dot(vecCol, vecCol).as("n2"))
      .withColumn("bn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(blockCol))))
      .filter(col("bn") <= maxBlock)
      .drop("bn")
    val a = slim.as("a")
    val b = slim.as("b")
    a.join(b, col(s"a.$blockCol") === col(s"b.$blockCol") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        cosineOf(dot(s"a.$vecCol", s"b.$vecCol"),
          col("a.n2"), col("b.n2")).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** CROSS-corpus blocked near-duplicates — the embedding face of
    * incremental ingest ([[graft.operators.Dedup.incremental]] is the
    * fingerprint face): every (probe, corpus) pair sharing a block with
    * cosine ≥ threshold. Output (probe_id, corpus_id, sim) — callers drop
    * probe vectors that surface here (LEFT ANTI on probe_id) and ingest
    * the rest. Same blocked equi-join shape as [[blockedNearDup]] (norms
    * below the join, no id ordering — the two sides are distinct tables);
    * cost is Σ_block |probe_b|·|corpus_b|, and the probe batch is the
    * small side at steady state. */
  def crossBlockedNearDup(corpus: DataFrame, probe: DataFrame,
                          blockCol: String, threshold: Double,
                          idCol: String = "vec_id",
                          vecCol: String = "embedding"): DataFrame = {
    def slim(df: DataFrame) = df.select(col(idCol), col(blockCol), col(vecCol),
      dot(vecCol, vecCol).as("n2"))
    val c = slim(corpus).as("c")
    val p = slim(probe).as("p")
    p.join(c, col(s"p.$blockCol") === col(s"c.$blockCol"))
      .select(col(s"p.$idCol").as("probe_id"), col(s"c.$idCol").as("corpus_id"),
        cosineOf(dot(s"p.$vecCol", s"c.$vecCol"),
          col("p.n2"), col("c.n2")).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
