package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Compliance takedown for durable stores — the removal story a corpus
  * operator actually needs (DMCA notices, robots revocations,
  * right-to-be-forgotten requests) expressed against the repo's store
  * layer. The reference has no removal surface at all beyond
  * whole-generation retention (`models.py` ring cleanup), which cannot
  * target a key; this is the missing half of the corpus lifecycle.
  *
  * Two halves, deliberately separate because they run at different
  * cadences at 100 TB:
  *
  *   - LOGICAL, immediate: [[scrub]] anti-joins any frame — reads AND
  *     ingest batches — against the victim list. A takedown is
  *     effective the moment its request lands, without touching a
  *     byte of stored data. The victim list is broadcast-sized by
  *     nature (requests arrive by the thousand, not the billion).
  *   - PHYSICAL, amortized: [[erase]] rewrites only the generations
  *     that actually contain a victim row
  *     ([[ParquetStore.eraseKeys]] — the same touched-generation
  *     copy-on-write as `merge`), making the removal durable on disk.
  *     Run it on the collapse cadence, not per-request: the probe is
  *     one semi-join, and untouched generations are never rewritten.
  *
  * The ingest side MUST scrub too: [[graft.streaming.CrawlIngest
  * .dedupAppendByKey]]'s anti-join no longer sees an erased key, so a
  * re-crawl of a taken-down URL would re-admit it — the victim store,
  * not the data store, is the durable memory that the key is banned.
  * Spec-pinned ([[TakedownSpec]]): erase → re-crawl → gate keeps the
  * store clean, where the ungated pipe resurrects the row.
  *
  * DERIVED data (the PPJoin postings of [[PrefixIndexStore]], IVF
  * centroids, BM25 statistics, banded pair outputs) is a pure function
  * of its source store: takedown ERASES SOURCES, derived stores purge
  * naturally at their next snapshot/rebuild cadence, and in the interim
  * any output that names documents is scrubbed at read —
  * [[scrubPairs]] for two-endpoint frames. Erasing inside every index's
  * internal layout would buy nothing the next snapshot doesn't.
  */
object Takedown {

  /** One row per banned key. `reason` is free-text provenance (notice
    * id, statute, operator). Keys are stored as strings — the
    * join/erase helpers cast the target column, so numeric-keyed
    * stores work unchanged. */
  val Schema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("reason", StringType)))

  /** Open (or resume) a durable victim-list store. Collapse-managed
    * like every delta-keyed store (r12 verdict #1): requests append as
    * deltas, latest-per-key re-snapshots bound the read side. */
  def takedownStore(spark: org.apache.spark.sql.SparkSession,
                    storePath: String,
                    tableName: String = "takedowns",
                    collapseEvery: Long = 16L): ParquetStore =
    new ParquetStore(spark, Schema, storePath, tableName,
      collapseKeys = Seq("key"), collapseEvery = collapseEvery)

  /** Record takedown requests, idempotent per key (first reason wins,
    * deterministically — re-delivered notices and crash-replayed
    * batches append nothing). Same window + store-anti-join shape as
    * [[graft.streaming.CrawlIngest.dedupAppendByKey]]; returns how
    * many NEW keys were recorded. */
  def request(store: ParquetStore, victims: DataFrame,
              keyCol: String = "key", reasonCol: String = "reason"): Long = {
    val batch = victims.select(
      col(keyCol).cast("string").as("key"),
      col(reasonCol).cast("string").as("reason"))
    val inBatch = batch
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("key")).orderBy(col("reason"))))
      .filter(col("_rn") === 1).drop("_rn")
    val fresh = inBatch.join(
        store.selectAll.select(col("key")).distinct(),
        Seq("key"), "left_anti")
      .persist()
    try {
      val n = fresh.count()
      if (n > 0) store.appendStreaming(fresh)
      n
    } finally { fresh.unpersist(); () }
  }

  /** The current banned-key set (one string column, `key`). */
  def victimKeys(store: ParquetStore): DataFrame =
    store.selectAll.select(col("key")).distinct()

  /** LOGICAL takedown on any frame: drop rows whose `keyCol` matches a
    * recorded victim. Apply on the READ path (serving a scrubbed view
    * while physical erasure is still pending — the HTTP veneer applies
    * it automatically when constructed with a takedown pair,
    * [[graft.serve.StoreHttpServer]]) and on the INGEST path (a
    * re-crawl of a banned key must never re-enter — see object doc).
    * One broadcast anti-join; the victim side is list-sized. */
  def scrub(df: DataFrame, store: ParquetStore, keyCol: String): DataFrame = {
    val victims = broadcast(victimKeys(store).withColumnRenamed("key", "_victim"))
    df.join(victims, df(keyCol).cast("string") === victims("_victim"),
      "left_anti")
  }

  /** [[scrub]] for PAIR outputs (dedup candidates, mirror pairs,
    * similarity matches): a row dies if EITHER endpoint is a victim —
    * a banned document must neither appear nor be implicated. */
  def scrubPairs(df: DataFrame, store: ParquetStore,
                 aCol: String, bCol: String): DataFrame =
    scrub(scrub(df, store, aCol), store, bCol)

  /** PHYSICAL erasure: remove every victim-keyed row from `target`'s
    * on-disk generations ([[ParquetStore.eraseKeys]] — copy-on-write,
    * touched generations only). Returns generations rewritten. Run on
    * the maintenance cadence; [[scrub]] covers the window in between. */
  def erase(target: ParquetStore, store: ParquetStore,
            keyCol: String): Long =
    target.eraseKeys(victimKeys(store).withColumnRenamed("key", keyCol),
      Seq(keyCol))
}
