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
    dfsStore.append(dfs)
    prefixStore.append(prefix)
    require(dfsStore.currentRstId == g + 1 && prefixStore.currentRstId == g + 1,
      s"prefix-index stores out of lockstep at $path — rebuild the index dir")
    g
  }

  /** Latest COMPLETE snapshot id: the highest generation present in all
    * three stores (a crash between appends leaves a newer partial
    * generation in a prefix of them; scoring must never mix snapshots). */
  def latestSnapshot: Option[Long] =
    for {
      h <- hashedStore.maxRstId
      d <- dfsStore.maxRstId
      p <- prefixStore.maxRstId
    } yield math.min(h, math.min(d, p))

  /** Score one batch against the stored snapshot (latest complete by
    * default) — O(batch) work; the corpus contributes only its frozen
    * partition-pruned generation reads. Output (batch_id, corpus_id,
    * jaccard), the exact [[graft.operators.Dedup.prefixJaccardIncremental]]
    * contract. */
  def scoreBatch(batch: DataFrame, snapshotId: Option[Long] = None): DataFrame = {
    val g = snapshotId.orElse(latestSnapshot).getOrElse(
      throw new IllegalStateException(
        s"no complete prefix-index snapshot at $path — call snapshot() first"))
    // A retention-expired (or never-written) generation must fail LOUD: a
    // partition-pruned read of a missing generation is zero rows, which
    // would silently score the batch against an EMPTY corpus — every
    // batch doc would pass dedup.
    if (!(hashedStore.hasGeneration(g) && dfsStore.hasGeneration(g) &&
      prefixStore.hasGeneration(g)))
      throw new IllegalStateException(
        s"prefix-index snapshot $g is not present in all three stores at " +
          s"$path (expired by retention or never completed) — score against " +
          s"latestSnapshot=$latestSnapshot or re-snapshot")
    graft.operators.Dedup.prefixScoreBatch(
      hashedStore.directFetch(g).drop("rst_id"),
      dfsStore.directFetch(g).drop("rst_id"),
      prefixStore.directFetch(g).drop("rst_id"),
      batch, threshold, textCol, idCol)
  }
}
