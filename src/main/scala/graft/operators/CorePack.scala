package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.QueryPack
import graft.config.{BucketType, MsgSettings}

/** The reference's ingest-path semantics as batch-checkable queries over the
  * `events` fixture (the Kafka-message analog, FIXTURES.md §B):
  *
  *   - q_bucket_counts — P3-P7 + A1: tumbling event-time buckets + count-by-key
  *     (`spark-streaming-kafka-bucket-counter.py:125-126`,
  *     `audit_utils/audit_utils/utils.py:62-97,216-238`)
  *   - q_bucket_counts_epoch / q_bucket_counts_iso — the same counts driven
  *     through the `epoch` / `iso` wire-format branches of `TS_LEGEND`
  *     (`audit_utils/audit_utils/utils.py:14-21,240-250`), so P4's Epoch path
  *     and P6's ISO parse are driver-verified, not just compiled
  *   - q_count_by_key — bare A1 without bucketing
  *   - q_rename_project — P2 `json_dict_parse` rename-projection over the
  *     `props` JSON column (`audit_utils/audit_utils/utils.py:23-60`)
  *   - q_decode_bucket — the FULL decode pipeline P1+P2+P3 ([[Decode.decode]]):
  *     raw JSON value → strict projection → epoch bucketing, end to end
  *   - q_bucket_counts_fine — the reference's default 20 s bucket
  *     (`bucket_interval = 20`, `README.md:75`) — high-cardinality group-by
  *   - q_append_count_json — P10 `combine_count_json`
  *     (`spark-streaming-kafka-bucket-counter.py:175-187`) restated as a
  *     structural `to_json(struct(...))` — proper JSON escaping instead of the
  *     reference's string splicing
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

  /** Wire-format view of `events` for the decode-path queries: the whole
    * message as one JSON string, as it would arrive in a Kafka value. */
  private def asWireJson(events: DataFrame): DataFrame =
    events.select(to_json(struct(
      col("event_type"), col("user_id"),
      // epoch seconds as a JSON number — the A1 fixture shape
      // (`README.md:110-117`: {"origin_server":…, "timestamp": 1440179085})
      unix_timestamp(col("ts")).as("timestamp"))).as("value"))

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bucket_counts" -> ((s, dir) => bucketCountsQuery(s, dir, 3600L)),
    "q_bucket_counts_fine" -> ((s, dir) => bucketCountsQuery(s, dir, 20L)),
    "q_bucket_counts_epoch" -> { (s, dir) =>
      // P4 Epoch branch: the bucket field arrives as a numeric epoch.
      val ev = table(s, dir, "events")
        .withColumn("epoch_s", col("ts").cast("double"))
      BucketCounts.bucketCounts(ev, "epoch_s", 3600L, Seq("event_type"),
        BucketType.Epoch)
    },
    "q_bucket_counts_iso" -> { (s, dir) =>
      // P6 Iso branch: the bucket field arrives as a strict ISO-8601 string.
      // date_format in a UTC session emits the reference's `%Y-%m-%dT%H:%M:%S.%fZ`.
      val ev = table(s, dir, "events")
        .withColumn("iso", date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"))
      BucketCounts.bucketCounts(ev, "iso", 3600L, Seq("event_type"),
        BucketType.Iso)
    },
    "q_count_by_key" -> ((s, dir) =>
      BucketCounts.countByKey(table(s, dir, "events"), Seq("event_type"))),
    // The salted skew variant MUST produce identical results (count is
    // decomposable) — verified against the same oracle as q_count_by_key.
    "q_count_by_key_salted" -> ((s, dir) =>
      BucketCounts.countByKeySalted(table(s, dir, "events"), Seq("event_type"),
        spreadCol = "event_id")),
    "q_rename_project" -> { (s, dir) =>
      // msg_map_schema analog {"etype": "event_type", "k_val": <json props.k>}
      // — code-contract direction {new -> source} (SURVEY.md §1.3).
      val parsed = Decode.parseJson(table(s, dir, "events"), "props", propsSchema)
      parsed.select(
        col("event_id"),
        col("event_type").as("etype"),
        col("_parsed").getField("k").as("k_val"))
    },
    "q_decode_bucket" -> { (s, dir) =>
      // Full P1→P2→P3 pipeline over a reconstructed wire value.
      val msg = MsgSettings(
        bucketInterval = 3600, bucketField = "timestamp",
        bucketType = BucketType.Epoch,
        msgMapSchema = Seq("etype" -> "event_type", "uid" -> "user_id"))
      Decode.decode(asWireJson(table(s, dir, "events")), "value", msg)
    },
    "q_append_count_json" -> { (s, dir) =>
      // P10 combine_count_json, structural: to_json escapes correctly where
      // the reference's splice would emit invalid JSON for quote/backslash.
      val counts = BucketCounts.countByKey(table(s, dir, "events"), Seq("event_type"))
      counts.select(col("event_type"),
        to_json(struct(col("event_type"), col("count"))).as("json_msg"))
    },
    // P8 ISO-string bucket bounds (intended semantics: zero-padded, UTC).
    "q_bucket_iso_str" -> { (s, dir) =>
      Bucketize.bucketizeIsoString(table(s, dir, "events"), "ts", 3600L)
        .groupBy("event_type", "bucket_start_iso", "bucket_end_iso")
        .agg(count(lit(1)).as("count"))
    },
    // Gap-based sessionization (6 h gap): the windowed-analytics extension
    // over the same event stream — one user-key shuffle end to end.
    "q_sessionize" -> { (s, dir) =>
      Sessionize.sessionize(table(s, dir, "events"), gapSeconds = 21600L)
    },
    // Path analysis: the 20 most common opening event-type paths (first 5
    // events per user, total-ordered). The per-user top-5 is a
    // row_number filter — WindowGroupLimit prunes below the rank bound
    // BEFORE the shuffle, so a whale user costs 5 rows downstream, never
    // a full collect_list buffer.
    "q_user_paths" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      table(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") <= 5)
        .groupBy("user_id")
        .agg(array_join(expr(
          "transform(array_sort(collect_list(struct(us, event_id, event_type)))," +
            " x -> x.event_type)"), ">").as("path"))
        .groupBy("path").agg(count(lit(1)).as("n_users"))
        .orderBy(col("n_users").desc, col("path")).limit(20)
    },
    // Sweep-line concurrency over those sessions: max sessions open at
    // once per day (day-partitioned running sum + days-sized offset pass —
    // see Temporal.concurrencyProfile).
    "q_concurrency" -> { (s, dir) =>
      Temporal.concurrencyProfile(
        Sessionize.sessionize(table(s, dir, "events"), gapSeconds = 21600L),
        "session_start_us", "session_end_us")
    },
    // Spark's NATIVE session_window beside our Sessionize — built-in where
    // one exists. NB the native boundary is strict-< merge (a gap EQUAL to
    // the threshold starts a new session), unlike Sessionize's <= — the
    // oracle replicates the >= split rule.
    "q_session_window" -> { (s, dir) =>
      table(s, dir, "events")
        .groupBy(session_window(col("ts"), "21600 seconds").as("sw"),
          col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("sw.start")).as("w_start_us"),
          unix_micros(col("sw.end")).as("w_end_us"), col("n_events"))
    },
    // CDC-style compaction: the LATEST event per (user, type) under a total
    // order (ts, event_id) — the deterministic upsert-view pattern (max_by
    // would tie-break arbitrarily).
    "q_latest_per_key" -> { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id", "event_type")
        .orderBy(col("us").desc, col("event_id").desc)
      table(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("us"))
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1)
        .select(col("user_id"), col("event_type"),
          col("event_id").as("last_event_id"), col("us").as("last_us"))
    },
    // Multi-level rollup (event_type × day hierarchy + grand total in ONE
    // aggregate — Spark expands grouping sets inside a single shuffle
    // instead of unioning three scans).
    "q_event_rollup" -> { (s, dir) =>
      table(s, dir, "events")
        .withColumn("day", expr("CAST(floor(unix_timestamp(ts) / 86400) AS BIGINT)"))
        .rollup("event_type", "day")
        .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
    },
    // SLIDING windows (1 h window / 15 min slide) — the tumbling-bucket
    // P4 generalized via Spark's native window() slicing: each event lands
    // in exactly window/slide = 4 windows (an Expand, narrow per row),
    // then the usual partial+final count. Window starts emitted as epoch
    // seconds (second-aligned boundaries make the LONG cast exact).
    "q_bucket_sliding" -> { (s, dir) =>
      table(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("count"))
        .select(col("window.start").cast("long").as("ws"), col("event_type"),
          col("count"))
    }
  )

  override def oracles: Map[String, String] = Map(
    "q_bucket_counts" -> bucketCountsOracle(3600L),
    "q_bucket_counts_fine" -> bucketCountsOracle(20L),
    // Positive epochs: truncate-toward-zero == floor, and 3600 | 86400 keeps
    // second-truncation inside the same bucket.
    "q_bucket_counts_epoch" -> bucketCountsOracle(3600L),
    "q_bucket_counts_iso" -> bucketCountsOracle(3600L),
    "q_count_by_key" ->
      "SELECT event_type, count(*) AS count FROM events GROUP BY 1",
    "q_count_by_key_salted" ->
      "SELECT event_type, CAST(count(*) AS BIGINT) AS count FROM events GROUP BY 1",
    "q_rename_project" ->
      """SELECT event_id, event_type AS etype,
        |  json_extract_string(props, '$.k') AS k_val
        |FROM events""".stripMargin,
    "q_decode_bucket" ->
      """SELECT event_type AS etype, CAST(user_id AS VARCHAR) AS uid,
        |  CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS bucket_start,
        |  CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) + 3600 AS bucket_end
        |FROM events""".stripMargin,
    // make_timestamp (naive TIMESTAMP, µs) keeps the oracle timezone-free —
    // to_timestamp returns TIMESTAMPTZ and strftime would render it in the
    // DuckDB session TimeZone, shifting the output on any non-UTC host.
    "q_bucket_iso_str" ->
      """SELECT event_type,
        |  strftime(make_timestamp(CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) * 1000000),
        |    '%Y-%m-%dT%H:%M:%S') AS bucket_start_iso,
        |  strftime(make_timestamp((CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) + 3600) * 1000000),
        |    '%Y-%m-%dT%H:%M:%S') AS bucket_end_iso,
        |  count(*) AS count
        |FROM events GROUP BY 1, 2, 3""".stripMargin,
    // ROLLUP: same hierarchy; gid recomposed from per-column GROUPING bits
    // in Spark's bit order (grouping_id = grouping(event_type)·2 + grouping(day)).
    "q_event_rollup" ->
      """SELECT event_type, CAST(floor(epoch(ts)/86400) AS BIGINT) AS day,
        |  count(*) AS n,
        |  CAST(grouping(event_type) AS BIGINT) * 2
        |    + CAST(grouping(CAST(floor(epoch(ts)/86400) AS BIGINT)) AS BIGINT) AS gid
        |FROM events
        |GROUP BY ROLLUP(event_type, CAST(floor(epoch(ts)/86400) AS BIGINT))""".stripMargin,
    // Sliding windows: every event belongs to exactly 4 windows (ws =
    // floor(t/900)*900 − k·900, k ∈ 0..3; t − ws = t%900 + 900k < 3600
    // always holds, so no extra range predicate is needed). `//` is floor
    // division — positive epochs here, same as CAST(floor()).
    "q_bucket_sliding" ->
      """SELECT ((epoch_us(ts) // 1000000) // 900) * 900 - 900 * r.k AS ws,
        |  event_type, count(*) AS count
        |FROM events, range(0, 4) r(k)
        |GROUP BY 1, 2""".stripMargin,
    // Sessionization: same micros-exact gap predicate, tie-break, and
    // per-user running counter; sums cast to BIGINT (DuckDB sums BIGINT into
    // HUGEINT, which the driver's arrow path can't hash-compare).
    "q_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |g AS (SELECT user_id, event_id, us,
        |  CASE WHEN lag(us) OVER w IS NULL
        |         OR us - lag(us) OVER w > 21600000000 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (SELECT user_id, us,
        |  CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM g)
        |SELECT user_id, session_id, min(us) AS session_start_us,
        |  max(us) AS session_end_us, count(*) AS n_events
        |FROM s GROUP BY 1, 2""".stripMargin,
    "q_user_paths" ->
      """WITH o AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
        |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts),
        |      event_id) AS rn
        |  FROM events),
        |p AS (SELECT user_id,
        |    array_to_string(list(event_type ORDER BY us, event_id), '>')
        |      AS path
        |  FROM o WHERE rn <= 5 GROUP BY 1)
        |SELECT path, count(*) AS n_users FROM p GROUP BY 1
        |ORDER BY n_users DESC, path LIMIT 20""".stripMargin,
    // Concurrency: the sessionize CTE feeding the identical two-pass sweep
    // line (day-partitioned running sum, strictly-prior-days offset).
    "q_concurrency" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |g AS (SELECT user_id, event_id, us,
        |  CASE WHEN lag(us) OVER w IS NULL
        |         OR us - lag(us) OVER w > 21600000000 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (SELECT user_id, us,
        |  CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM g),
        |sess AS (SELECT min(us) AS s_us, max(us) AS e_us
        |  FROM s GROUP BY user_id, session_id),
        |d AS (SELECT s_us AS us, 1 AS delta FROM sess
        |      UNION ALL SELECT e_us, -1 FROM sess),
        |r AS (SELECT us // 86400000000 AS day, us, delta,
        |  CAST(sum(delta) OVER (PARTITION BY us // 86400000000
        |    ORDER BY us, delta DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run
        |  FROM d),
        |pd AS (SELECT day, max(run) AS mxrun,
        |  CAST(sum(delta) AS BIGINT) AS net,
        |  CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_started
        |  FROM r GROUP BY 1)
        |SELECT day,
        |  CAST(coalesce(sum(net) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    + greatest(mxrun, 0) AS BIGINT) AS max_concurrent,
        |  n_started
        |FROM pd""".stripMargin,
    // Native session_window: strict-< merge ⇒ split on gap >= threshold;
    // window end = last event + gap.
    "q_session_window" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        |g AS (SELECT user_id, us,
        |  CASE WHEN lag(us) OVER w IS NULL
        |         OR us - lag(us) OVER w >= 21600000000 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        |s AS (SELECT user_id, us,
        |  CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY us
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid FROM g)
        |SELECT user_id, min(us) AS w_start_us,
        |  max(us) + 21600000000 AS w_end_us, count(*) AS n_events
        |FROM s GROUP BY user_id, sid""".stripMargin,
    "q_latest_per_key" ->
      """SELECT user_id, event_type, event_id AS last_event_id,
        |  epoch_us(ts) AS last_us
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id, event_type
        |  ORDER BY epoch_us(ts) DESC, event_id DESC) = 1""".stripMargin,
    // to_json emits compact {"event_type":"x","count":N} — replicated by
    // concatenation (fixture values contain no JSON-special characters).
    "q_append_count_json" ->
      """SELECT event_type,
        |  '{"event_type":"' || event_type || '","count":' || count(*) || '}' AS json_msg
        |FROM events GROUP BY event_type""".stripMargin
  )
}
