package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The DURABLE form of the PPJoin corpus index — the steady-state
  * production shape for continuous exact near-dup ingestion at 100 TB:
  * ONE corpus-scale pass per corpus snapshot ([[snapshot]] builds and
  * persists the frozen df order, prefix postings, and shingle-hash sets),
  * then every arriving batch scores against the stored generation at
  * O(batch) cost ([[scoreBatch]]) — no per-call corpus rebuild, which is
  * exactly what [[graft.operators.Dedup.prefixJaccardIncremental]]'s
  * scaladoc prescribes and r8 left as the rebuild-per-call form.
  *
  * Realized as three [[ParquetStore]]s advancing generations in lockstep
  * (the K7 durable-generations machinery): one snapshot = one `rst_id`
  * across all three, so reads partition-prune to exactly the generation
  * they score against, retention drops whole superseded snapshots, and a
  * restart recovers the latest snapshot from the directory listing alone.
  * Scoring reads the LATEST generation present in ALL THREE stores, so a
  * crash mid-snapshot can never serve a partial index: a crash inside one
  * append leaves only a staging dir (invisible to reads), and a crash
  * BETWEEN appends leaves an orphaned newer generation in a prefix of the
  * stores — reads keep serving the last complete snapshot, and the next
  * [[snapshot]] call fails loud with a rebuild instruction rather than
  * interleaving generations (the crash window a table format's atomic
  * multi-table commit would close — the documented upgrade path, same as
  * [[ParquetStore.merge]]).
  *
  * The index is a pure function of (corpus, `threshold`, shingling): the
  * threshold fixes the prefix lengths baked into the stored postings, so
  * it is a CONSTRUCTOR property — scoring at a different threshold needs
  * its own store path (document-frequency order is threshold-free, but
  * prefixes are not).
  *
  * The scoring core is [[graft.operators.Dedup.prefixScoreBatch]] — shared
  * verbatim with the rebuild-per-call form, so stored-index and rebuilt
  * results cannot drift (pinned by `PrefixIndexStoreSpec`). */
final class PrefixIndexStore(
    val spark: SparkSession,
    val path: String,
    val threshold: Double,
    val textCol: String = "text",
    val idCol: String = "doc_id",
    /** Type of the document-id column in the indexed corpus. */
    val idType: DataType = LongType,
    /** Temp-view name prefix (three views: `<name>_{hashed,dfs,prefix}`). */
    val name: String = "prefix_index",
    /** Superseded snapshots kept before retention deletes them. */
    val keepSnapshots: Long = 2L
) {
  require(threshold > 0.0 && threshold <= 1.0, "threshold in (0, 1]")

  private val hashedStore = new ParquetStore(spark,
    StructType(Seq(StructField("cid", idType),
      StructField("hs", ArrayType(LongType)))),
    s"$path/hashed", s"${name}_hashed", cleanInterval = keepSnapshots)
  private val dfsStore = new ParquetStore(spark,
    StructType(Seq(StructField("h", LongType), StructField("df", LongType))),
    s"$path/dfs", s"${name}_dfs", cleanInterval = keepSnapshots)
  private val prefixStore = new ParquetStore(spark,
    StructType(Seq(StructField("id", idType), StructField("h", LongType),
      StructField("s", LongType), StructField("rn", LongType))),
    s"$path/prefix", s"${name}_prefix", cleanInterval = keepSnapshots)

  /** Every dfs generation carries ONE sentinel row (h = [[SentinelHash]],
    * df = the generation's BASE snapshot id): shingle hashes are 32-bit
    * values widened to long, so −1 can never collide with a real hash,
    * and the sentinel makes base resolution an O(1) partition-pruned read
    * with no side metadata file. A full [[snapshot]]'s sentinel points at
    * itself; an [[appendDocs]] delta's sentinel points back at the frozen
    * base whose df ORDER it was ranked under. */
  private val SentinelHash = -1L

  private def withSentinel(dfs: DataFrame, base: Long): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    dfs.unionByName(Seq((SentinelHash, base)).toDF("h", "df"))
  }

  /** Build the index from `corpus` and persist it as the next generation
    * of all three stores — the one corpus-scale pass per snapshot. The
    * three tables derive from a single checkpointed tokenizing scan
    * ([[graft.operators.Dedup.prefixIndexTables]]). Returns the snapshot's
    * rst_id. */
  def snapshot(corpus: DataFrame): Long = this.synchronized {
    val (hashed, dfs, prefix) = graft.operators.Dedup.prefixIndexTables(
      corpus, threshold, textCol, idCol)
    val g = hashedStore.currentRstId
    hashedStore.append(hashed)
    dfsStore.append(withSentinel(dfs, g))
    prefixStore.append(prefix)
    require(dfsStore.currentRstId == g + 1 && prefixStore.currentRstId == g + 1,
      s"prefix-index stores out of lockstep at $path — rebuild the index dir")
    g
  }

  /** APPEND-ONLY index growth — the ingestion steady state between
    * re-snapshots: the new docs' hashed sets and prefix postings are
    * ranked under the CURRENT BASE's frozen df order
    * ([[graft.operators.Dedup.prefixIndexDelta]] — completeness needs only
    * a shared total order, so results stay exact) and land as one new
    * generation; no corpus-scale work anywhere. What drifts as deltas
    * accumulate is PRUNING quality (the frozen order diverges from true
    * frequencies), which is the signal to re-[[snapshot]] — never a
    * correctness event. Returns the delta's generation id. */
  def appendDocs(docs: DataFrame): Long = this.synchronized {
    val g = latestSnapshot.getOrElse(throw new IllegalStateException(
      s"appendDocs needs a base snapshot at $path — call snapshot() first"))
    val base = baseOf(g)
    if (!dfsStore.hasGeneration(base)) throw new IllegalStateException(
      s"append chain's base snapshot $base expired from $path — re-snapshot " +
        "(and raise keepSnapshots for append-heavy use)")
    val frozen = dfsStore.directFetch(base).drop("rst_id")
      .filter(col("h") =!= SentinelHash)
    val (hashedDelta, prefixDelta) = graft.operators.Dedup.prefixIndexDelta(
      docs, frozen, threshold, textCol, idCol)
    val gd = hashedStore.currentRstId
    hashedStore.append(hashedDelta)
    dfsStore.append(withSentinel(frozen.limit(0), base)) // sentinel-only
    prefixStore.append(prefixDelta)
    require(dfsStore.currentRstId == gd + 1 && prefixStore.currentRstId == gd + 1,
      s"prefix-index stores out of lockstep at $path — rebuild the index dir")
    gd
  }

  /** Latest COMPLETE generation id (full snapshot OR delta): the highest
    * generation present in all three stores (a crash between appends
    * leaves a newer partial generation in a prefix of them; scoring must
    * never mix generations). */
  def latestSnapshot: Option[Long] =
    for {
      h <- hashedStore.maxRstId
      d <- dfsStore.maxRstId
      p <- prefixStore.maxRstId
    } yield math.min(h, math.min(d, p))

  /** The BASE snapshot whose frozen df order governs generation `g` —
    * read from the dfs sentinel row (partition-pruned single-generation
    * scan). */
  def baseOf(g: Long): Long = {
    val rows = dfsStore.directFetch(g)
      .filter(col("h") === SentinelHash).select("df").collect()
    require(rows.length == 1,
      s"generation $g at $path carries ${rows.length} base sentinels — " +
        "index written by an incompatible version; rebuild the index dir")
    rows(0).getLong(0)
  }

  /** Score one batch against the stored index as of generation `g`
    * (latest complete by default) — O(batch) work: the frozen df order is
    * read from `g`'s base, and the corpus side is the UNION of the base
    * snapshot plus every delta up to `g`, all partition-pruned generation
    * reads. Output (batch_id, corpus_id, jaccard), the exact
    * [[graft.operators.Dedup.prefixJaccardIncremental]] contract. */
  def scoreBatch(batch: DataFrame, snapshotId: Option[Long] = None): DataFrame = {
    val g = snapshotId.orElse(latestSnapshot).getOrElse(
      throw new IllegalStateException(
        s"no complete prefix-index snapshot at $path — call snapshot() first"))
    // Retention/crash holes must fail LOUD: a partition-pruned read over a
    // missing generation silently yields zero rows for it, which would
    // score the batch against a PARTIAL corpus — deduped docs would pass.
    def contiguous(s: ParquetStore, what: String): Unit = {
      if (!s.hasGeneration(g)) throw new IllegalStateException(
        s"prefix-index generation $g ($what) is not present at $path " +
          s"(expired by retention or never completed) — score against " +
          s"latestSnapshot=$latestSnapshot or re-snapshot")
    }
    contiguous(dfsStore, "dfs")
    val base = baseOf(g)
    val have = Seq(hashedStore, prefixStore).map(_.generations.toSet)
    val need = (base to g).toSet
    for ((h, s) <- have.zip(Seq("hashed", "prefix")); if !need.subsetOf(h))
      throw new IllegalStateException(
        s"prefix-index generations ${(need -- h).toSeq.sorted.mkString(",")} " +
          s"($s) missing at $path — the base..$g append chain has retention " +
          "holes; re-snapshot (and raise keepSnapshots for append-heavy use)")
    def range(s: ParquetStore) = s.selectAll
      .filter(col("rst_id").between(base, g)).drop("rst_id")
    graft.operators.Dedup.prefixScoreBatch(
      range(hashedStore),
      dfsStore.directFetch(base).drop("rst_id")
        .filter(col("h") =!= SentinelHash),
      range(prefixStore),
      batch, threshold, textCol, idCol)
  }
}
