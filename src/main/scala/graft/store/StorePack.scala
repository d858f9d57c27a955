package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.QueryPack
import graft.operators.BucketCounts
import graft.serve.Comparators

/** The serving store + query surface as driver-checkable queries
  * (A3–A5, K2–K4, K7, Q1–Q2, Q5–Q12 of SURVEY.md §2).
  *
  * Each query rebuilds a deterministic store from the `events` fixture:
  * events are split into SIX 5-day generation batches (the micro-batch
  * analog), each batch is bucket-counted (1 h buckets) and appended — so
  * `rst_id = day_index div 5 + 1` (1-based, counter-after semantics of
  * `sudobulk_insert`, `audit_utils/audit_utils/models.py:584-629`), and the
  * post-append counter is 7. Because a 1 h bucket never straddles a day
  * boundary, the DuckDB oracle can derive the same rst_id directly from
  * `bucket_start`.
  */
object StorePack extends QueryPack {

  /** Epoch day of 2024-01-01, the fixture's first event day (TESTDATA.md). */
  private val Day0 = 19723L
  private val BatchDays = 5L
  private val Interval = 3600L

  private val storeSchema = StructType(Seq(
    StructField("event_type", StringType),
    StructField("bucket_start", LongType),
    StructField("bucket_end", LongType),
    StructField("count", LongType)))

  /** Build the 6-generation store. Counter ends at 7.
    *
    * Single-scan build: the per-batch counts are one grouped aggregate over
    * events WITH the batch id as a grouping key, cached once (output
    * cardinality = keys × buckets, tiny), and each generation append is a
    * filter over that cached aggregate — 1 parquet scan instead of 6. The
    * append-per-generation store semantics are unchanged. */
  /** Append the 6 deterministic generations into ANY deployment — the one
    * copy of the batching pipeline, so the in-memory and durable stores are
    * guaranteed to be built from the same scenario. The per-batch counts
    * are materialized once (eager localCheckpoint — released when
    * unreferenced, unlike cache entries) and each generation is a filter
    * over them: 1 parquet scan instead of 6. */
  def buildInto[S <: GenerationStore](spark: SparkSession, dir: String,
                                      store: S, interval: Long = Interval): S = {
    val events = table(spark, dir, "events")
      .withColumn("_batch",
        expr(s"(CAST(floor(unix_timestamp(ts) / 86400) AS BIGINT) - $Day0) div $BatchDays"))
    val counts = BucketCounts.bucketCounts(
      events, "ts", interval, Seq("event_type", "_batch"))
      .localCheckpoint(eager = true)
    (0L until 6L).foreach { b =>
      store.append(counts.filter(col("_batch") === b).drop("_batch"))
    }
    store
  }

  def buildStore(spark: SparkSession, dir: String,
                 tableName: String = "recent_counts",
                 interval: Long = Interval): RecentStore =
    buildInto(spark, dir, new RecentStore(spark, storeSchema,
      tableName = tableName, cleanInterval = 100, cleanFreq = 1000), interval)

  /** The ONE definition of the merge scenario's update batch (a purchase
    * recount with +1000 counts), shared by the in-memory and durable merge
    * queries — both claim "same contract, same oracle", so the batch they
    * merge must be the same expression. */
  private def mergeUpdate(s: SparkSession, dir: String): DataFrame =
    BucketCounts.bucketCounts(
        table(s, dir, "events").filter(col("event_type") === "purchase"),
        "ts", Interval, Seq("event_type"))
      .withColumn("count", col("count") + 1000L)

  /** Store-contents select with derived rst_id, for any bucket interval
    * that never straddles a day boundary. */
  private def storeSelect(interval: Long): String =
    s"""SELECT event_type,
       |    CAST(floor(epoch(ts)/$interval)*$interval AS BIGINT) AS bucket_start,
       |    CAST(floor(epoch(ts)/$interval)*$interval AS BIGINT) + $interval AS bucket_end,
       |    count(*) AS count,
       |    ((CAST(floor(epoch(ts)/86400) AS BIGINT) - $Day0) // $BatchDays) + 1 AS rst_id
       |  FROM events GROUP BY 1, 2, 3, 5""".stripMargin

  /** Shared oracle CTE: the store contents with derived rst_id. */
  private val StoreCte = s"WITH store AS (\n  ${storeSelect(Interval)}\n)"

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q1 select-all over the stamped store (also A5 rst_id stamping, K2/K3).
    "q_store_select_all" -> ((s, dir) => buildStore(s, dir).selectAll),
    // K4 retention: clean(2) keeps rst_id >= counter(7) - 2 = 5.
    "q_store_retention" -> ((s, dir) => buildStore(s, dir).clean(2L).selectAll),
    // Q11 recent-N: last 3 generations → rst_id >= 4.
    "q_store_recent_n" -> ((s, dir) => buildStore(s, dir).recent(3L)),
    // Q12 direct generation fetch.
    "q_store_direct" -> ((s, dir) => buildStore(s, dir).directFetch(3L)),
    // A4 MAX(rst_id).
    "q_store_max_rstid" -> ((s, dir) => buildStore(s, dir).selectMax("rst_id")),
    // Q2 arbitrary-SQL passthrough over the registered view.
    "q_store_sql" -> { (s, dir) =>
      buildStore(s, dir).sql(
        """SELECT event_type, CAST(sum(count) AS BIGINT) AS total_count,
          |  count(*) AS n_rows
          |FROM recent_counts GROUP BY event_type""".stripMargin)
    },
    // Q9 range select, inclusive bounds.
    "q_store_range" -> { (s, dir) =>
      Comparators.selectRange(buildStore(s, dir).selectAll, "bucket_start",
        Some(1704412800L), Some(1704672000L))
    },
    // Q7/Q8 per-column comparator DSL — note the reference's REVERSED
    // argument order: gt(4) → 4 > count, gte(X) → X >= bucket_start.
    "q_store_comparators" -> { (s, dir) =>
      Comparators.cGeneralSelect(buildStore(s, dir).selectAll, Map(
        "event_type" -> ("eq", "click"),
        "count" -> ("gt", 4),
        "bucket_start" -> ("gte", 1704672000L)))
    },
    // Q10 typed sugar: select_gte (reversed: 5 >= count).
    "q_store_select_gte" -> { (s, dir) =>
      Comparators.selectGte(buildStore(s, dir).selectAll, Map("count" -> 5))
    },
    // Ring get_onwards (`models.py:768-772`): generations 4..6.
    "q_store_onwards" -> ((s, dir) => buildStore(s, dir).getOnwards(4L)),
    // The DURABLE deployment: the SAME buildInto pipeline through
    // ParquetStore must produce the identical store — verified against the
    // very same oracle as the in-memory select-all. One canonical path per
    // (tmpdir, sf), wiped before each build: repeated invocations (bench
    // min-of-2, plan guard) rebuild in place instead of stranding a fresh
    // temp directory per call.
    "q_store_durable" -> { (s, dir) =>
      val base = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        f"graft_durable_${dir.hashCode}%08x")
      val store = new ParquetStore(s, storeSchema, base.toString,
        tableName = "durable_counts", cleanInterval = 100, cleanFreq = 1000)
      store.reset()
      buildInto(s, dir, store).selectAll
    },
    // TIME TRAVEL (r14): latest-per-key AS OF a past generation.
    // Generation 1 loads every document, 2 updates the even ids
    // (+1000), 3 updates the multiples of five (+7); the as-of-2 view
    // must show the even-id update, NOT the later one — each key's
    // newest row among generations ≤ 2, with its true rst_id.
    "q_store_asof" -> { (s, dir) =>
      val base = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        f"graft_asof_${dir.hashCode}%08x")
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("n_chars", LongType)))
      val store = new ParquetStore(s, schema, base.toString,
        tableName = "asof_docs", cleanFreq = 1000)
      store.reset()
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), col("n_chars")).localCheckpoint(true)
      store.append(docs)
      store.append(docs.filter(col("doc_id") % 2 === 0)
        .withColumn("n_chars", col("n_chars") + 1000L))
      store.append(docs.filter(col("doc_id") % 5 === 0)
        .withColumn("n_chars", col("n_chars") + 7L))
      store.asOfLatestPerKey(Seq("doc_id"), 2L)
    },
    // MERGE upsert: a corrected recount of every purchase bucket (counts
    // +1000) replaces the matched rows across ALL generations and stamps
    // them with the merge generation (7); other event types keep their
    // original rows and rst_ids. One left-anti join + union — the
    // Delta-style MERGE plan.
    "q_store_merge" -> { (s, dir) =>
      buildStore(s, dir)
        .merge(mergeUpdate(s, dir), Seq("event_type", "bucket_start"))
        .selectAll
    },
    // The same MERGE through the DURABLE deployment: copy-on-write
    // generation rewrites + the batch as a new partition — identical
    // contents, identical oracle (the shared mergeUpdate guarantees the
    // two merge queries cannot drift apart).
    "q_store_merge_durable" -> { (s, dir) =>
      val base = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        f"graft_durable_mg_${dir.hashCode}%08x")
      val store = new ParquetStore(s, storeSchema, base.toString,
        tableName = "durable_merge", cleanInterval = 100, cleanFreq = 1000)
      store.reset()
      buildInto(s, dir, store)
        .merge(mergeUpdate(s, dir), Seq("event_type", "bucket_start"))
        .selectAll
    },
    // Q13 attach analog (`attach_new_db`, `models.py:189-224`): a SECOND
    // named store registers its own view in the shared catalog, and one SQL
    // statement cross-queries both namespaces — Spark's catalog plays the
    // role of sqlite_master, no ATTACH verb needed. The attached store
    // carries DAILY buckets; the join reconciles hourly vs daily totals per
    // event type (broadcastable both sides: keys × generations rows).
    "q_store_attach_join" -> { (s, dir) =>
      val primary = buildStore(s, dir)
      buildStore(s, dir, tableName = "attached_counts", interval = 86400L)
      primary.sql(
        """SELECT h.event_type,
          |  CAST(h.total AS BIGINT) AS hourly_total,
          |  CAST(d.total AS BIGINT) AS daily_total,
          |  h.n_buckets AS hourly_buckets, d.n_buckets AS daily_buckets
          |FROM (SELECT event_type, sum(count) AS total, count(*) AS n_buckets
          |      FROM recent_counts GROUP BY event_type) h
          |JOIN (SELECT event_type, sum(count) AS total, count(*) AS n_buckets
          |      FROM attached_counts GROUP BY event_type) d
          |  ON h.event_type = d.event_type""".stripMargin)
    }
  )

  override def oracles: Map[String, String] = Map(
    "q_store_select_all" -> s"$StoreCte SELECT * FROM store",
    "q_store_retention" -> s"$StoreCte SELECT * FROM store WHERE rst_id >= 5",
    "q_store_recent_n" -> s"$StoreCte SELECT * FROM store WHERE rst_id >= 4",
    "q_store_direct" -> s"$StoreCte SELECT * FROM store WHERE rst_id = 3",
    "q_store_max_rstid" ->
      s"$StoreCte SELECT max(rst_id) AS max_rst_id FROM store",
    "q_store_sql" ->
      s"""$StoreCte SELECT event_type, CAST(sum(count) AS BIGINT) AS total_count,
         |  count(*) AS n_rows
         |FROM store GROUP BY event_type""".stripMargin,
    "q_store_range" ->
      s"""$StoreCte SELECT * FROM store
         |WHERE 1704412800 <= bucket_start AND 1704672000 >= bucket_start""".stripMargin,
    "q_store_comparators" ->
      s"""$StoreCte SELECT * FROM store
         |WHERE event_type = 'click' AND 4 > count AND 1704672000 >= bucket_start""".stripMargin,
    "q_store_select_gte" ->
      s"$StoreCte SELECT * FROM store WHERE 5 >= count",
    "q_store_onwards" -> s"$StoreCte SELECT * FROM store WHERE rst_id >= 4",
    "q_store_durable" -> s"$StoreCte SELECT * FROM store",
    // The as-of-2 view: even ids carry generation 2's +1000 update,
    // everything else generation 1's original — generation 3 (the +7
    // update) is after the stamp and must be invisible.
    "q_store_asof" ->
      """SELECT doc_id,
        |  n_chars + CASE WHEN doc_id % 2 = 0 THEN 1000 ELSE 0 END
        |    AS n_chars,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END AS BIGINT)
        |    AS rst_id
        |FROM documents""".stripMargin,
    // Buckets never straddle generations (1 h buckets, 5-day batches), so
    // a purchase recount matches every original purchase row exactly:
    // merged = originals with +1000 counts at the merge generation.
    "q_store_merge" ->
      s"""$StoreCte
         |SELECT * FROM store WHERE event_type <> 'purchase'
         |UNION ALL
         |SELECT event_type, bucket_start, bucket_end,
         |  count + 1000 AS count, 7 AS rst_id
         |FROM store WHERE event_type = 'purchase'""".stripMargin,
    "q_store_merge_durable" ->
      s"""$StoreCte
         |SELECT * FROM store WHERE event_type <> 'purchase'
         |UNION ALL
         |SELECT event_type, bucket_start, bucket_end,
         |  count + 1000 AS count, 7 AS rst_id
         |FROM store WHERE event_type = 'purchase'""".stripMargin,
    "q_store_attach_join" ->
      s"""WITH store AS (
         |  ${storeSelect(Interval)}
         |), store_daily AS (
         |  ${storeSelect(86400L)}
         |)
         |SELECT h.event_type,
         |  CAST(h.total AS BIGINT) AS hourly_total,
         |  CAST(d.total AS BIGINT) AS daily_total,
         |  h.n_buckets AS hourly_buckets, d.n_buckets AS daily_buckets
         |FROM (SELECT event_type, sum(count) AS total, count(*) AS n_buckets
         |      FROM store GROUP BY event_type) h
         |JOIN (SELECT event_type, sum(count) AS total, count(*) AS n_buckets
         |      FROM store_daily GROUP BY event_type) d
         |  ON h.event_type = d.event_type""".stripMargin
  )
}
