package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryPack

/** Temporal-join queries over the fixture tables. The as-of oracle uses
  * DuckDB's NATIVE `ASOF LEFT JOIN` — an independent implementation of the
  * same operator semantics, not a transliteration of our union+window plan —
  * so a green row pins [[Temporal.asofJoin]] against the de-facto standard.
  * The range-join oracle is the plain inequality join DuckDB executes as an
  * IEJoin; our bucketed equi-join must reproduce it row-for-row. */
object TemporalPack extends QueryPack {

  private val WindowUs = 7200L * 1000000L // 2 h in µs, inline-precomputed (INT32-safe)
  private val HourUs = 3600L * 1000000L
  private val T1Us = 1704153600000000L // 2024-01-02T00:00:00Z in µs
  private val T2Us = 1706745600000000L // 2024-02-01T00:00:00Z in µs (whole fixture)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // For each click, the user's most recent prior-or-equal purchase value
    // and how far back it happened. Right side pre-aggregated to unique
    // (user, instant) so tie resolution cannot differ between engines.
    "q_asof_join" -> { (s, dir) =>
      val ev = table(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
        .groupBy("user_id", "us").agg(max("value").as("purchase_value"))
      Temporal.asofJoin(clicks, purchases, Seq("user_id"), "us")
        .select(col("event_id"), col("user_id"), col("purchase_value"),
          (col("us") - col("asof_ts")).as("lag_us"))
    },
    // Forward as-of: for each error, the user's NEXT click at-or-after it
    // and how long it took — time-to-recovery. Right side pre-aggregated to
    // unique (user, instant) for engine-independent tie resolution.
    "q_asof_forward" -> { (s, dir) =>
      val ev = table(s, dir, "events")
      val errs = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_id").as("cid"))
        .groupBy("user_id", "us").agg(max("cid").as("click_id"))
      Temporal.asofJoin(errs, clicks, Seq("user_id"), "us", forward = true)
        .select(col("event_id"), col("user_id"), col("click_id"),
          (col("asof_ts") - col("us")).as("wait_us"))
    },
    // Click-after-error attribution: each user's clicks joined into the
    // 2-hour window after each of their error events — a KEYED interval
    // join (user equi key + time range), so candidates are bounded per
    // (user, bucket) and the true output scales linearly with the corpus.
    // (A keyless interval join over concurrency-dense intervals has
    // quadratically growing output — see Temporal.rangeJoin's scaladoc.)
    "q_range_join" -> { (s, dir) =>
      val ev = table(s, dir, "events")
      val err = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id").as("err_id"),
          unix_micros(col("ts")).as("w_start"),
          (unix_micros(col("ts")) + WindowUs).as("w_end"))
      val clk = ev.filter(col("event_type") === "click")
        .select(col("user_id"), unix_micros(col("ts")).as("click_us"))
      Temporal.rangeJoin(clk, "click_us", err, "w_start", "w_end", WindowUs,
          keys = Seq("user_id"))
        .groupBy("err_id").agg(count(lit(1)).as("n_clicks"))
    },
    // Resample + forward fill: each sampled user's hourly event count,
    // densified onto the full hourly grid between their first and last
    // active hour, gaps carrying the last observed count forward. Counts
    // are integer-exact, so the fill is hash-comparable.
    "q_gap_fill" -> { (s, dir) =>
      val obs = table(s, dir, "events")
        .filter(col("user_id") % 7 === 0)
        .groupBy(col("user_id"),
          expr(s"(unix_micros(ts) div $HourUs) * $HourUs").as("bucket_us"))
        .agg(count(lit(1)).as("n_events"))
      Temporal.resampleFill(obs, Seq("user_id"), "bucket_us", HourUs,
        Seq("n_events"))
    },
    // CDC audit: which users' latest event-type state differs between the
    // day-1 snapshot and the end of the fixture — one grouped aggregate,
    // against the oracle's classic two-window-plus-join formulation.
    "q_snapshot_diff" -> { (s, dir) =>
      Temporal.snapshotDiff(
        table(s, dir, "events").select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"), col("event_id")),
        keys = Seq("user_id"), attrCol = "event_type",
        instantCol = "us", t1 = T1Us, t2 = T2Us, tieCols = Seq("event_id"))
    }
  )

  override def oracles: Map[String, String] = Map(
    "q_asof_join" ->
      """WITH l AS (SELECT event_id, user_id, ts FROM events
        |    WHERE event_type = 'click'),
        |r AS (SELECT user_id, ts, max(value) AS purchase_value FROM events
        |    WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT l.event_id, l.user_id, r.purchase_value,
        |  CAST(epoch_us(l.ts) - epoch_us(r.ts) AS BIGINT) AS lag_us
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin,
    "q_asof_forward" ->
      """WITH l AS (SELECT event_id, user_id, ts FROM events
        |    WHERE event_type = 'error'),
        |r AS (SELECT user_id, ts, max(event_id) AS click_id FROM events
        |    WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT l.event_id, l.user_id, r.click_id,
        |  CAST(epoch_us(r.ts) - epoch_us(l.ts) AS BIGINT) AS wait_us
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts <= r.ts""".stripMargin,
    "q_range_join" ->
      s"""WITH err AS (SELECT user_id, event_id AS err_id, epoch_us(ts) AS s
         |    FROM events WHERE event_type = 'error'),
         |clk AS (SELECT user_id, epoch_us(ts) AS p FROM events
         |    WHERE event_type = 'click')
         |SELECT err_id, count(*) AS n_clicks
         |FROM err JOIN clk USING (user_id)
         |WHERE p >= s AND p < s + $WindowUs
         |GROUP BY 1""".stripMargin,
    // generate_series spine + IGNORE NULLS running last — DuckDB's native
    // way of writing the same densify-and-fill. Positive epochs make `//`
    // (floor) and Spark's `div` (truncation) identical here.
    "q_gap_fill" ->
      s"""WITH obs AS (SELECT user_id,
         |    (epoch_us(ts) // $HourUs) * $HourUs AS bucket_us,
         |    count(*) AS n_events
         |  FROM events WHERE user_id % 7 = 0 GROUP BY 1, 2),
         |b AS (SELECT user_id, min(bucket_us) AS lo, max(bucket_us) AS hi
         |  FROM obs GROUP BY 1),
         |spine AS (SELECT user_id,
         |    unnest(generate_series(lo, hi, $HourUs)) AS bucket_us FROM b)
         |SELECT s.user_id, s.bucket_us,
         |  o.n_events IS NOT NULL AS observed,
         |  last_value(o.n_events IGNORE NULLS)
         |    OVER (PARTITION BY s.user_id ORDER BY s.bucket_us) AS n_events
         |FROM spine s LEFT JOIN obs o USING (user_id, bucket_us)""".stripMargin,
    // The textbook two-snapshot formulation: a window scan per snapshot,
    // full outer join on the key — an independent derivation of the same
    // diff the Spark side computes in one grouped aggregate.
    "q_snapshot_diff" ->
      s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id
         |    FROM events),
         |s1 AS (SELECT user_id, event_type AS st FROM (
         |    SELECT *, row_number() OVER (PARTITION BY user_id
         |      ORDER BY us DESC, event_id DESC) AS rn
         |    FROM e WHERE us <= $T1Us) WHERE rn = 1),
         |s2 AS (SELECT user_id, event_type AS st FROM (
         |    SELECT *, row_number() OVER (PARTITION BY user_id
         |      ORDER BY us DESC, event_id DESC) AS rn
         |    FROM e WHERE us <= $T2Us) WHERE rn = 1)
         |SELECT s2.user_id,
         |  CASE WHEN s1.st IS NULL THEN 'added' ELSE 'changed' END AS change,
         |  s1.st AS old_state, s2.st AS new_state
         |FROM s2 LEFT JOIN s1 USING (user_id)
         |WHERE s1.st IS DISTINCT FROM s2.st""".stripMargin
  )
}
