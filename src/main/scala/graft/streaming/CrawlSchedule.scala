package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.store.ParquetStore

/** Per-host politeness FOR THE STREAMED CRAWL (r11 verdict #7):
  * [[graft.operators.Url.politenessSchedule]] paces one batch's fetches
  * at each host's robots crawl-delay, but a real frontier arrives
  * continuously — batch 2's first fetch of a host must continue where
  * batch 1 stopped, not restart at offset 0 and hammer the host. The
  * state is one row per host (fetches scheduled so far, the next free
  * offset) kept in a durable [[ParquetStore]] as per-batch DELTAS —
  * latest generation per host wins — so restarts resume exactly and
  * the scheduler needs no streaming state backend.
  *
  * Scale: one window shuffle on the domain key per batch (batch-sized,
  * the [[graft.operators.Url.capPerDomain]] skew caveat applies), one
  * broadcast-sized join against the host-state delta; the state store
  * grows by touched-hosts rows per trigger and compacts like any other
  * generation store. */
object CrawlSchedule {

  /** One row per host: fetches scheduled so far and the earliest
    * second the NEXT fetch may start (relative to the host's first).
    * `scope` + `batch_id` stamp which stream lineage and micro-batch
    * advanced the host (empty scope / −1 for ad-hoc batch calls) — the
    * replay guard below. Batch ids RESTART at 0 per checkpoint, so the
    * guard must be scoped to the checkpoint lineage or a fresh-
    * checkpoint run would alias a previous run's ids (freezing the
    * store and reading the wrong pre-state — review r12, second
    * pass). */
  val StateSchema: StructType = StructType(Seq(
    StructField("domain", StringType),
    StructField("n_scheduled", LongType),
    StructField("next_offset_s", DoubleType),
    StructField("batch_id", LongType),
    StructField("scope", StringType)))

  /** Open (or resume) the host-state store. */
  def stateStore(spark: SparkSession, storePath: String,
                 tableName: String = "crawl_schedule"): ParquetStore =
    new ParquetStore(spark, StateSchema, storePath, tableName)

  /** Latest state per host across the store's delta generations —
    * excluding deltas THIS lineage stamped with batch ids ≥
    * `beforeBatch` (a REPLAYED micro-batch must see exactly the
    * pre-batch state, even when its own crashed attempt already
    * advanced the store). Null-safe: legacy rows without the
    * scope/batch_id columns (pre-r12 stores read them as null) count
    * as applied history, never vanish. */
  private def latestState(store: ParquetStore, beforeBatch: Long = -1L,
                          scope: String = ""): DataFrame = {
    val base =
      if (beforeBatch < 0) store.selectAll
      else store.selectAll.filter(!(col("scope") <=> lit(scope) &&
        coalesce(col("batch_id"), lit(-1L)) >= lit(beforeBatch)))
    base
      .withColumn("_rk", row_number().over(
        Window.partitionBy(col("domain")).orderBy(col("rst_id").desc)))
      .filter(col("_rk") === 1)
      .select(col("domain"), col("n_scheduled"), col("next_offset_s"))
  }

  /** Schedule one batch of frontier URLs against the accumulated host
    * state: appends `fetch_seq` (the host's GLOBAL fetch counter, not
    * the batch-local one) and `start_offset_s` (continuing from the
    * host's next free slot at `delayCol` spacing), then records the
    * advanced state as a new store generation. With a constant
    * per-host delay, scheduling N batches incrementally equals one
    * [[graft.operators.Url.politenessSchedule]] pass over their
    * arrival-ordered union (spec-pinned). The returned frame is
    * eagerly checkpointed — callers may drop the state store's temp
    * dir afterwards. */
  def scheduleBatch(store: ParquetStore, urls: DataFrame,
                    domainCol: String = "url_domain",
                    delayCol: String = "crawl_delay",
                    order: Column, batchId: Long = -1L,
                    scope: String = ""): DataFrame = {
    val seqd = urls.withColumn("_seq",
      (row_number().over(Window.partitionBy(col(domainCol)).orderBy(order))
        - 1).cast("long"))
    val prior = latestState(store, batchId, scope)
      .withColumnRenamed("domain", domainCol)
    val out = seqd.join(prior, Seq(domainCol), "left")
      .withColumn("fetch_seq",
        coalesce(col("n_scheduled"), lit(0L)) + col("_seq"))
      .withColumn("start_offset_s",
        coalesce(col("next_offset_s"), lit(0.0d)) +
          col("_seq").cast("double") * col(delayCol))
      .drop("_seq", "n_scheduled", "next_offset_s")
      .localCheckpoint(true)
    // Replay guard (foreachBatch is at-least-once): a (scope, batch id)
    // already in the store advanced the hosts on a crashed attempt —
    // recompute the SAME output from the pre-batch view above, but
    // never double-advance. The probe reads only the NEWEST generation
    // (partition-pruned recent(1)): within one lineage the crashed
    // delta is necessarily the last append, and a full-store scan per
    // trigger would cost O(generations²) cumulatively. Ad-hoc calls
    // (−1) always advance.
    val applied = batchId >= 0 &&
      !store.recent(1).filter(col("scope") <=> lit(scope) &&
        col("batch_id") === batchId).isEmpty
    if (!applied) {
      val delta = out.groupBy(col(domainCol).as("domain"))
        .agg((max(col("fetch_seq")) + 1L).as("n_scheduled"),
          max(col("start_offset_s") + col(delayCol)).as("next_offset_s"))
        .withColumn("batch_id", lit(batchId))
        .withColumn("scope", lit(scope))
      store.appendStreaming(delta)
      ()
    }
    out
  }

  /** Attach a frontier drop folder: text files of URLs (one per line —
    * the universal frontier exchange format), each trigger scheduled
    * against the durable host state and appended to `outStore`
    * (schedule rows: url, domain, fetch_seq, start_offset_s). `delays`
    * maps domain → crawl-delay seconds (feed it from
    * [[graft.sources.Robots]]; hosts absent from it pace at
    * `defaultDelay`). Checkpointed file tracking — a restart neither
    * re-schedules a file nor forgets the host offsets (they live in
    * the state store, not the checkpoint). */
  def attach(spark: SparkSession, dropDir: String, state: ParquetStore,
             outStore: ParquetStore, delays: DataFrame,
             checkpoint: String, defaultDelay: Double = 1.0d,
             trigger: Trigger = Trigger.ProcessingTime(10000L),
             maxFilesPerTrigger: Int = 64): StreamingQuery = {
    val d = delays.select(col("domain"), col("crawl_delay"))
    spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(dropDir)
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val urls = graft.operators.Url.withUrlParts(
              batch.select(trim(col("value")).as("url"))
                .filter(col("url") =!= ""))
            .join(d.withColumnRenamed("domain", "url_domain"),
              Seq("url_domain"), "left")
            .withColumn("crawl_delay",
              coalesce(col("crawl_delay"), lit(defaultDelay)))
          val sched = scheduleBatch(state, urls, order = col("url"),
              batchId = batchId, scope = checkpoint)
            .select(col("url"), col("url_domain"), col("fetch_seq"),
              col("start_offset_s"))
            .withColumn("sched_key",
              concat_ws("#", col("url"), col("fetch_seq")))
          // Keyed append: a replayed batch recomputes the SAME rows
          // (pre-batch state view), so (url, fetch_seq) dedups the
          // crash window between the state advance and this write.
          CrawlIngest.dedupAppendByKey(outStore, sched, "sched_key",
            col("url"))
          ()
        }
        ()
      }
      .start()
  }

  /** The schedule-output store schema for [[attach]]. */
  val OutSchema: StructType = StructType(Seq(
    StructField("url", StringType), StructField("url_domain", StringType),
    StructField("fetch_seq", LongType),
    StructField("start_offset_s", DoubleType),
    StructField("sched_key", StringType)))
}
