package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.QueryPack
import graft.config.BucketType

/** The reference's ingest-path semantics as batch-checkable queries over the
  * `events` fixture (the Kafka-message analog, FIXTURES.md §B):
  *
  *   - q_bucket_counts — P3-P7 + A1: tumbling event-time buckets + count-by-key
  *     (`spark-streaming-kafka-bucket-counter.py:125-126`,
  *     `audit_utils/audit_utils/utils.py:62-97,216-238`)
  *   - q_count_by_key — bare A1 without bucketing
  *   - q_rename_project — P2 `json_dict_parse` rename-projection over the
  *     `props` JSON column (`audit_utils/audit_utils/utils.py:23-60`)
  *   - q_bucket_counts_fine — the reference's default 20 s bucket
  *     (`bucket_interval = 20`, `README.md:75`) — high-cardinality group-by
  *   - q_append_count_json — P10 `combine_count_json` restated structurally
  *     (`spark-streaming-kafka-bucket-counter.py:175-187`)
  */
object CorePack extends QueryPack {

  /** `props` is flat JSON like `{"k": 87}` — parsed opaquely to string per the
    * reference's value handling (SURVEY.md §1.2). */
  private val propsSchema = StructType(Seq(StructField("k", StringType)))

  def bucketCountsQuery(spark: SparkSession, dir: String, intervalSec: Long): DataFrame = {
    val events = table(spark, dir, "events")
    BucketCounts.bucketCounts(events, "ts", intervalSec, Seq("event_type"),
      BucketType.Timestamp)
  }

  private def bucketCountsOracle(intervalSec: Long): String =
    s"""SELECT event_type,
       |  CAST(floor(epoch(ts)/$intervalSec)*$intervalSec AS BIGINT) AS bucket_start,
       |  CAST(floor(epoch(ts)/$intervalSec)*$intervalSec AS BIGINT) + $intervalSec AS bucket_end,
       |  count(*) AS count
       |FROM events GROUP BY 1, 2, 3""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bucket_counts" -> ((s, dir) => bucketCountsQuery(s, dir, 3600L)),
    "q_bucket_counts_fine" -> ((s, dir) => bucketCountsQuery(s, dir, 20L)),
    "q_count_by_key" -> ((s, dir) =>
      BucketCounts.countByKey(table(s, dir, "events"), Seq("event_type"))),
    "q_rename_project" -> { (s, dir) =>
      // msg_map_schema analog {"etype": "event_type", "k_val": <json props.k>}
      // — code-contract direction {new -> source} (SURVEY.md §1.3).
      val parsed = Decode.parseJson(table(s, dir, "events"), "props", propsSchema)
      parsed.select(
        col("event_id"),
        col("event_type").as("etype"),
        col("_parsed").getField("k").as("k_val"))
    },
    "q_append_count_json" -> { (s, dir) =>
      // P10: emit the (key, count) rows as JSON strings — structural to_json
      // instead of the reference's string splicing.
      val counts = BucketCounts.countByKey(table(s, dir, "events"), Seq("event_type"))
      counts.select(col("event_type"),
        concat(lit("{\"event_type\": \""), col("event_type"),
               lit("\", \"count\": "), col("count"), lit("}")).as("json_msg"))
    }
  )

  override def oracles: Map[String, String] = Map(
    "q_bucket_counts" -> bucketCountsOracle(3600L),
    "q_bucket_counts_fine" -> bucketCountsOracle(20L),
    "q_count_by_key" ->
      "SELECT event_type, count(*) AS count FROM events GROUP BY 1",
    "q_rename_project" ->
      """SELECT event_id, event_type AS etype,
        |  json_extract_string(props, '$.k') AS k_val
        |FROM events""".stripMargin,
    "q_append_count_json" ->
      """SELECT event_type,
        |  '{"event_type": "' || event_type || '", "count": ' || count(*) || '}' AS json_msg
        |FROM events GROUP BY event_type""".stripMargin
  )
}
