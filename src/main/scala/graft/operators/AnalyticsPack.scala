package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryPack

/** OLAP-analytics extensions over the event stream: pivot (long→wide
  * reshaping), cube (all-subtotal aggregation), and sketch-backed
  * approximate aggregates pinned against exact oracles.
  *
  * Oracle notes: DuckDB `count(*) FILTER` stays BIGINT (a bare `sum(CASE…)`
  * would widen to HUGEINT and break the driver's arrow materialization);
  * `GROUPING(a, b)` bit-packs identically to Spark's `grouping_id()`;
  * DuckDB `dayofweek` is 0-based Sunday where Spark's is 1-based, hence the
  * `+1`. The approx queries output integer/boolean columns only — the
  * sketch value itself is engine-specific, so what's pinned is the exact
  * count plus an integer-exact error-bound check ([[Sketches.withinRelBound]]).
  */
object AnalyticsPack extends QueryPack {

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")
  private val WeekUs = 7L * 86400L * 1000000L
  private val FunnelCutoffUs = 1704240000000000L // 2024-01-03T00:00:00Z in µs
  private val Jan8Us = 1704672000000000L // 2024-01-08T00:00:00Z in µs

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Long→wide: one row per user, one column per event type, as
    // conditional aggregation. `.pivot(values)` plans TWO aggregates (pair
    // counts, then the reshape — two exchanges, seen in PLANS.md); the
    // count-when formulation is the same result in ONE shuffle with
    // map-side partials. An UNPINNED pivot would additionally scan the
    // corpus first just to learn the column list — always pin values.
    "q_pivot_events" -> { (s, dir) =>
      val cells = EventTypes.map(t =>
        count(when(col("event_type") === t, 1)).as(t))
      table(s, dir, "events").groupBy("user_id")
        .agg(cells.head, cells.tail: _*)
    },
    // All-subtotals cube over (event_type, day-of-week) with the grouping_id
    // disambiguating true nulls from subtotal rows.
    "q_event_cube" -> { (s, dir) =>
      table(s, dir, "events")
        .select(col("event_type"), dayofweek(col("ts")).cast("long").as("dow"))
        .cube("event_type", "dow")
        .agg(count(lit(1)).as("n"), grouping_id().cast("long").as("gid"))
    },
    // HLL++ distinct ids per event type, pinned to within 10% of exact
    // (rsd 0.02 ⇒ expected error ~2%, so the margin is wide but honest).
    "q_approx_distinct" -> { (s, dir) =>
      val ev = table(s, dir, "events")
      // HLL is duplicate-insensitive, so the sketch over the pre-distincted
      // pairs equals the sketch over the raw rows — one shuffle on
      // (type, id) with map-side partial distinct, instead of the Expand
      // plan (2× rows through the exchange) that countDistinct+HLL in a
      // single aggregate would produce.
      ev.select("event_type", "event_id").distinct()
        .groupBy("event_type")
        .agg(approx_count_distinct(col("event_id"), 0.02).as("approx"),
          count(lit(1)).as("n_ids"))
        .select(col("event_type"), col("n_ids"),
          Sketches.withinRelBound(col("approx"), col("n_ids"), 10L).as("approx_ok"))
    },
    // view→click→purchase funnel: one sorted fold per user (single
    // shuffle) vs the oracle's cascaded per-stage min aggregations — same
    // strict-ordering semantics, two independent plans.
    "q_funnel" -> { (s, dir) =>
      // First 48 h of the corpus (us < 2024-01-03T00Z): sparse enough that
      // users genuinely spread across stages 0..3.
      val ev = table(s, dir, "events").select(col("user_id"),
          unix_micros(col("ts")).as("us"), col("event_type"))
        .filter(col("us") < FunnelCutoffUs)
      Funnel.funnel(ev, Seq("view", "click", "purchase"))
        .groupBy("stages_done")
        .agg(count(lit(1)).as("n_users"),
          max(element_at(col("stage_ts"), 3)).as("max_complete_us"))
    },
    // Weekly retention triangle: cohort = week of first event.
    "q_cohort" -> { (s, dir) =>
      val ev = table(s, dir, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("us"))
      Funnel.cohortRetention(ev, WeekUs)
    },
    // Star-schema join: one shuffle join between the two fact tables,
    // every dimension explicitly broadcast — the plan where a 100 TB
    // lineitem never moves for a kilobyte-scale nation table. Revenue is
    // floor-quantized to cents per row (deterministic IEEE product of
    // identical doubles) then summed exactly.
    "q_star_join" -> { (s, dir) =>
      val li = table(s, dir, "lineitem")
      val o = table(s, dir, "orders").select("o_orderkey", "o_custkey")
      val c = table(s, dir, "customer").select("c_custkey", "c_nationkey")
      val n = table(s, dir, "nation").select("n_nationkey", "n_name")
      li.select(col("l_orderkey"),
          floor(col("l_extendedprice") * (lit(1d) - col("l_discount")) * 100)
            .cast("long").as("rev_cents"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_items"), sum(col("rev_cents")).as("revenue_cents"))
    },
    // Z-order layout roundtrip: events rewritten Morton-clustered on
    // (time, user), then a two-dimensional slice aggregated off the copy.
    // Values pin content preservation against the original table; the
    // per-file dual-dimension span bound (the pruning property) is pinned
    // by BucketingSpec's tile assertions.
    "q_zorder_scan" -> { (s, dir) =>
      val tag = (dir.hashCode & Int.MaxValue).toString
      val path = s"/tmp/graft_zorder_$tag"
      if (!new java.io.File(path, "_SUCCESS").exists())
        Bucketing.writeZOrdered(
          table(s, dir, "events").select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("us"), col("value")),
          path, 16, "us", "user_id")
      s.read.parquet(path)
        .filter(col("user_id") <= 50 && col("us") < Jan8Us)
        .agg(count(lit(1)).as("n"),
          sum(floor(col("value") * 100).cast("long")).as("value_cents"),
          min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"))
    },
    // Per-type value trend over the event month: OLS slope/intercept from
    // exact integer moments (Regression.linearFit) — x = day index from
    // 2024-01-01, y = value quantized to thousandths. The derived doubles
    // are bit-identical across engines because every input to the float
    // math is an exact BIGINT.
    "q_trend" -> { (s, dir) =>
      val ev = table(s, dir, "events")
      Regression.linearFit(ev, Seq("event_type"),
        expr("unix_micros(ts) div 86400000000 - 19723"),
        expr("CAST(floor(value * 1000) AS BIGINT)"))
    },
    // Lag-1 autocorrelation of daily event counts per type — the AR(1)
    // "is today predicted by yesterday" diagnostic, as an OLS fit of
    // count_t against count_{t-1} over OBSERVED days (gaps skip to the
    // previous observed day). Counts are exact longs, so the moments —
    // and the derived doubles — are engine bit-identical.
    "q_autocorr" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val daily = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("event_type").orderBy("day")
      val pairs = daily.withColumn("prev", lag("cnt", 1).over(w))
        .filter(col("prev").isNotNull)
      Regression.linearFit(pairs, Seq("event_type"), col("prev"), col("cnt"))
    },
    // Trailing-7-day distinct users per (type, day) via DAILY HLL sketches
    // unioned over a calendar RANGE frame — the mergeable-artifact pattern
    // that answers any window without re-scanning raw events. The exact
    // side (pinned beside it) is the honest ×7 Expand + distinct the
    // sketch path replaces at scale.
    "q_sliding_distinct" -> { (s, dir) =>
      val du = table(s, dir, "events")
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"), col("user_id"))
        .distinct()
        .localCheckpoint(true) // feeds both the sketch and the exact side
      val approx = Sketches.slidingDistinct(du, Seq("event_type"), "day",
        "user_id", window = 7)
      val exact = du
        .withColumn("cover", explode(sequence(col("day"), col("day") + 6)))
        .groupBy(col("event_type"), col("cover").as("day"))
        .agg(countDistinct(col("user_id")).as("exact_users"))
        // Only OBSERVED days are emitted (a cover day past the data's end
        // is not a reporting day).
        .join(du.select("event_type", "day").distinct(), Seq("event_type", "day"))
      exact.join(approx, Seq("event_type", "day"))
        .select(col("event_type"), col("day"), col("exact_users"),
          Sketches.withinRelBound(col("approx_users"), col("exact_users"), 10L)
            .as("approx_ok"))
    },
    // Ingest-volume burst monitor: (event_type, day) cells whose count
    // exceeds 5/4 of the trailing-4-observed-days mean — integer
    // cross-multiplied, no float mean (Profiling.burstAnomalies).
    "q_count_anomalies" -> { (s, dir) =>
      Profiling.burstAnomalies(table(s, dir, "events"), "event_type",
        expr("unix_micros(ts) div 86400000000"), num = 5L, den = 4L)
    },
    // Key-skew audit over lineitem's join keys plus a deliberately hot
    // low-cardinality column — the "salt this or not" report that feeds
    // SkewJoin/countByKeySalted decisions.
    "q_skew_audit" -> { (s, dir) =>
      Profiling.skewAudit(table(s, dir, "lineitem"),
        Seq("l_partkey", "l_suppkey", "l_returnflag"))
    },
    // Referential-integrity audit across the star schema's FK relations —
    // the "keys still line up" half of the migration check beside
    // q_table_checksum.
    "q_fk_orphans" -> { (s, dir) =>
      Checksum.fkAudit(Seq(
        Checksum.FkRelation("lineitem_orders", table(s, dir, "lineitem"),
          "l_orderkey", table(s, dir, "orders"), "o_orderkey"),
        Checksum.FkRelation("orders_customer", table(s, dir, "orders"),
          "o_custkey", table(s, dir, "customer"), "c_custkey"),
        Checksum.FkRelation("lineitem_part", table(s, dir, "lineitem"),
          "l_partkey", table(s, dir, "part"), "p_partkey"),
        Checksum.FkRelation("customer_nation", table(s, dir, "customer"),
          "c_nationkey", table(s, dir, "nation"), "n_nationkey")))
    },
    // Order-independent table checksum over lineitem, broken down by
    // returnflag: the "did the copy preserve the data" audit. Quantity is
    // quantized to integer cents before canonicalization (float→string
    // rendering is not engine-portable; exact integers are).
    "q_table_checksum" -> { (s, dir) =>
      val li = table(s, dir, "lineitem")
      Checksum.tableChecksum(li, Seq("l_returnflag"), Seq(
        col("l_orderkey"), col("l_linenumber"), col("l_linestatus"),
        floor(col("l_quantity") * 100).cast("long")))
    },
    // Co-located join over tables bucketed on the join key at write time —
    // the pay-the-shuffle-once layout. Values are pinned by the oracle's
    // plain join; the exchange-free PLAN is pinned by BucketingSpec.
    "q_bucketed_join" -> { (s, dir) =>
      val tag = (dir.hashCode & Int.MaxValue).toString
      Bucketing.ensureBucketed(
        table(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        s"orders_b_$tag", s"/tmp/graft_bucketed_$tag/orders",
        8, Seq("o_custkey"), Seq("o_custkey"))
      Bucketing.ensureBucketed(
        table(s, dir, "customer").select("c_custkey", "c_nationkey"),
        s"customer_b_$tag", s"/tmp/graft_bucketed_$tag/customer",
        8, Seq("c_custkey"), Seq("c_custkey"))
      s.table(s"orders_b_$tag")
        .join(s.table(s"customer_b_$tag"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_orders"),
          sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
            .as("price_cents"))
    },
    // Count-min-sketch frequency probes: per-type sketches (fixed seed ⇒
    // deterministic; counters merge order-independently) broadcast-joined
    // against a bounded probe list. CMS never undercounts; the overcount
    // ceiling here is eps·N ≈ 0.001·2k = 2 ⇒ slack 64 is generous and
    // integer-exact.
    "q_cms_probe" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      val ev = table(s, dir, "events")
      val sketches = ev.groupBy("event_type")
        .agg(expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)").as("sk"))
      // The exact-count aggregate IS the probe list (distinct keys ≤ 20).
      ev.filter(col("user_id") <= 20)
        .groupBy("event_type", "user_id").agg(count(lit(1)).as("n_exact"))
        .join(broadcast(sketches), "event_type")
        .withColumn("_est", expr("cms_estimate(sk, user_id)"))
        .select(col("event_type"), col("user_id"), col("n_exact"),
          (col("_est") >= col("n_exact") &&
            col("_est") <= col("n_exact") + 64L).as("cms_ok"))
    },
    // Salted skew join: events (hot user keys) ⋈ customer dimension with
    // the hot side spread over 4 salt lanes. The oracle is the PLAIN join —
    // salting must be invisible in the output.
    "q_salted_join" -> { (s, dir) =>
      val ev = table(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"))
      val cust = table(s, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_nationkey"))
      SkewJoin.saltedJoin(ev, cust, Seq("user_id"),
          salts = 4, saltFrom = Seq("event_id"))
        .groupBy("c_nationkey", "event_type")
        .agg(count(lit(1)).as("n_events"))
    },
    // GK-sketch quantiles of purchase value per event type, each pinned
    // within 5% relative error of the exact percentile (row counts are the
    // integer-exact payload; the booleans pin the sketch).
    "q_approx_quantiles" -> { (s, dir) =>
      val ev = table(s, dir, "events")
      val near = (a: org.apache.spark.sql.Column, e: org.apache.spark.sql.Column) =>
        abs(a - e) <= abs(e) * lit(0.05)
      ev.groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          percentile_approx(col("value"), array(lit(0.5), lit(0.95)), lit(10000)).as("ap"),
          percentile(col("value"), array(lit(0.5), lit(0.95))).as("ex"))
        .select(col("event_type"), col("n"),
          near(col("ap")(0), col("ex")(0)).as("ok_p50"),
          near(col("ap")(1), col("ex")(1)).as("ok_p95"))
    },
    // Rolling 7-day window per event type over daily counts: a RANGE frame
    // on the epoch-day number, so calendar gaps shorten the window instead
    // of silently widening it (a ROWS frame would span "last 7 observed
    // days"). Two shuffles total — the daily pre-aggregate collapses the
    // events first, so the window pass sorts keys × days rows, never raw
    // events; integer sums + the contributing-day count, avg left to the
    // reader (no float in the pinned output).
    "q_moving_window" -> { (s, dir) =>
      val daily = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("CAST(floor(unix_timestamp(ts) / 86400) AS BIGINT)").as("day"))
        .agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("day").rangeBetween(-6L, 0L)
      daily.select(col("event_type"), col("day"), col("n"),
        sum(col("n")).over(w).as("n_7d"),
        count(lit(1)).over(w).as("days_in_window"))
    },
    // EXACT heavy hitters (vocabulary mining): every term occurring ≥ 500
    // times across the corpus, found through the CMS prefilter + exact
    // recount two-pass — the oracle is the plain GROUP BY … HAVING, so a
    // green row proves the prefilter lost nothing and the recount killed
    // every false positive.
    "q_heavy_hitters" -> { (s, dir) =>
      val terms = table(s, dir, "documents")
        .select(explode(graft.functions.TextFunctions.words(col("text"))).as("term"))
      Sketches.heavyHitters(terms, "term", threshold = 500L)
    }
  )

  override def oracles: Map[String, String] = Map(
    "q_pivot_events" -> {
      val cols = EventTypes.map(t =>
        s"count(*) FILTER (WHERE event_type = '$t') AS $t").mkString(",\n  ")
      s"SELECT user_id,\n  $cols\nFROM events GROUP BY 1"
    },
    "q_event_cube" ->
      """WITH e AS (SELECT event_type,
        |    CAST(dayofweek(ts) + 1 AS BIGINT) AS dow FROM events)
        |SELECT event_type, dow, count(*) AS n,
        |  CAST(grouping(event_type, dow) AS BIGINT) AS gid
        |FROM e GROUP BY CUBE (event_type, dow)""".stripMargin,
    "q_approx_distinct" ->
      """SELECT event_type, count(DISTINCT event_id) AS n_ids,
        |  true AS approx_ok
        |FROM events GROUP BY 1""".stripMargin,
    "q_approx_quantiles" ->
      """SELECT event_type, count(*) AS n,
        |  true AS ok_p50, true AS ok_p95
        |FROM events GROUP BY 1""".stripMargin,
    "q_cms_probe" ->
      """SELECT event_type, user_id, count(*) AS n_exact, true AS cms_ok
        |FROM events WHERE user_id <= 20 GROUP BY 1, 2""".stripMargin,
    "q_moving_window" ->
      """WITH d AS (SELECT event_type,
        |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, day, n,
        |  CAST(sum(n) OVER w AS BIGINT) AS n_7d,
        |  count(*) OVER w AS days_in_window
        |FROM d
        |WINDOW w AS (PARTITION BY event_type ORDER BY day
        |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q_heavy_hitters" ->
      """WITH t AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS term
        |    FROM documents)
        |SELECT term, count(*) AS n FROM t
        |GROUP BY 1 HAVING count(*) >= 500""".stripMargin,
    "q_salted_join" ->
      """SELECT c_nationkey, event_type, count(*) AS n_events
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1, 2""".stripMargin,
    // Cascaded-minimum funnel — an INDEPENDENT formulation of the same
    // strict-after semantics (stage i = earliest matching event strictly
    // after stage i-1), so a green row pins the one-pass fold against the
    // per-stage aggregation every analytics SQL writes.
    "q_funnel" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type FROM events
         |  WHERE epoch_us(ts) < $FunnelCutoffUs),
        |s1 AS (SELECT user_id, min(us) AS t1 FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(us) AS t2 FROM e JOIN s1 USING (user_id)
        |  WHERE event_type = 'click' AND us > t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(us) AS t3 FROM e JOIN s2 USING (user_id)
        |  WHERE event_type = 'purchase' AND us > t2 GROUP BY 1),
        |st AS (SELECT u.user_id,
        |    CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
        |         WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS sd,
        |    coalesce(t3, -1) AS t3c
        |  FROM (SELECT DISTINCT user_id FROM e) u
        |  LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        |  LEFT JOIN s3 USING (user_id))
        |SELECT CAST(sd AS BIGINT) AS stages_done, count(*) AS n_users,
        |  CAST(max(t3c) AS BIGINT) AS max_complete_us
        |FROM st GROUP BY 1""".stripMargin,
    "q_cohort" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) // $WeekUs AS p FROM events),
         |f AS (SELECT user_id, min(p) AS cohort FROM e GROUP BY 1),
         |a AS (SELECT DISTINCT user_id, p FROM e)
         |SELECT cohort, p - cohort AS period_offset, count(*) AS n_users
         |FROM a JOIN f USING (user_id) GROUP BY 1, 2""".stripMargin,
    "q_star_join" ->
      """SELECT n_name, count(*) AS n_items,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
        |    AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1""".stripMargin,
    // Oracle reads the ORIGINAL events table — a layout rewrite must be
    // value-invisible.
    "q_zorder_scan" ->
      s"""SELECT count(*) AS n,
         |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
         |    AS value_cents,
         |  min(event_id) AS min_id, max(event_id) AS max_id
         |FROM events
         |WHERE user_id <= 50 AND epoch_us(ts) < $Jan8Us""".stripMargin,
    // Same exact-moment OLS: HUGEINT intermediate sums are cast to BIGINT
    // before the double math so the final expression sees the same exact
    // integers Spark's long sums hold; the float expression tree is
    // written in the same shape/order as Regression.linearFit.
    "q_trend" ->
      """WITH t AS (SELECT event_type,
        |    epoch_us(ts) // 86400000000 - 19723 AS x,
        |    CAST(floor(value * 1000) AS BIGINT) AS y FROM events),
        |s AS (SELECT event_type, count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(x*y) AS BIGINT) AS sxy
        |  FROM t GROUP BY 1)
        |, sl AS (SELECT event_type, n, sx, sy,
        |    CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0
        |      -- constant x: Spark's 0/0 is NaN, DuckDB's is NULL — pin NaN
        |      THEN 'NaN'::DOUBLE
        |      ELSE (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END AS slope
        |  FROM s)
        |SELECT event_type, n, slope,
        |  (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
        |   / CAST(n AS DOUBLE) AS intercept
        |FROM sl""".stripMargin,
    "q_autocorr" ->
      """WITH d AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    count(*) AS cnt FROM events GROUP BY 1, 2),
        |p AS (SELECT event_type, cnt AS y,
        |    lag(cnt) OVER (PARTITION BY event_type ORDER BY day) AS x FROM d),
        |t AS (SELECT event_type, x, y FROM p WHERE x IS NOT NULL),
        |s AS (SELECT event_type, count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(x*y) AS BIGINT) AS sxy
        |  FROM t GROUP BY 1)
        |, sl AS (SELECT event_type, n, sx, sy,
        |    CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0
        |      -- constant x: Spark's 0/0 is NaN, DuckDB's is NULL — pin NaN
        |      THEN 'NaN'::DOUBLE
        |      ELSE (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END AS slope
        |  FROM s)
        |SELECT event_type, n, slope,
        |  (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
        |   / CAST(n AS DOUBLE) AS intercept
        |FROM sl""".stripMargin,
    "q_sliding_distinct" ->
      """WITH du AS (SELECT DISTINCT event_type,
        |    epoch_us(ts) // 86400000000 AS day, user_id FROM events),
        |obs AS (SELECT DISTINCT event_type, day FROM du),
        |cov AS (SELECT du.event_type, du.day + g.x AS day, du.user_id
        |  FROM du CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS x) g)
        |SELECT c.event_type, c.day, count(DISTINCT c.user_id) AS exact_users,
        |  true AS approx_ok
        |FROM cov c JOIN obs o ON o.event_type = c.event_type AND o.day = c.day
        |GROUP BY 1, 2""".stripMargin,
    // Trailing frame is OBSERVED rows (4 PRECEDING..1 PRECEDING), the
    // cross-multiplied 5/4-of-mean gate, >=3 prior days required.
    "q_count_anomalies" ->
      """WITH d AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    count(*) AS n FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, day, n,
        |    CAST(sum(n) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING) AS BIGINT) AS prev_n,
        |    count(*) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING) AS prev_days
        |  FROM d)
        |SELECT event_type, day, n, prev_n, prev_days FROM w
        |WHERE prev_days >= 3
        |  AND n::HUGEINT * 4 * prev_days > 5::HUGEINT * prev_n""".stripMargin,
    // Hot-key tie-break is the (n, key-string) total order on both
    // engines; quantile ranks are the type-1 ceil formula over the
    // frequency table; skew products run in HUGEINT like Spark's
    // DECIMAL(38,0).
    "q_skew_audit" -> {
      val freqs = Seq("l_partkey", "l_suppkey", "l_returnflag").map(c =>
        s"""SELECT '$c' AS col_name, CAST($c AS VARCHAR) AS k, count(*) AS n
           |  FROM lineitem WHERE $c IS NOT NULL GROUP BY 2""".stripMargin)
        .mkString("\n  UNION ALL\n")
      s"""WITH f AS (
         |$freqs),
         |r AS (SELECT *,
         |    row_number() OVER (PARTITION BY col_name ORDER BY n, k) AS rn,
         |    count(*) OVER (PARTITION BY col_name) AS nk FROM f),
         |top AS (SELECT col_name, k AS top_key FROM r
         |  QUALIFY row_number() OVER (PARTITION BY col_name
         |    ORDER BY n DESC, k DESC) = 1)
         |SELECT r.col_name, CAST(sum(n) AS BIGINT) AS n_rows, max(nk) AS n_keys,
         |  max(n) AS max_n, max(top_key) AS top_key,
         |  max(CASE WHEN rn = ((nk * 1) + 2 - 1) // 2 THEN n END) AS p50_n,
         |  max(CASE WHEN rn = ((nk * 99) + 100 - 1) // 100 THEN n END) AS p99_n,
         |  CAST((1000::HUGEINT * max(n) * max(nk)) // sum(n) AS BIGINT)
         |    AS skew_permille
         |FROM r JOIN top ON top.col_name = r.col_name
         |GROUP BY 1""".stripMargin
    },
    "q_fk_orphans" -> Seq(
      ("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
      ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
      ("customer_nation", "customer", "c_nationkey", "nation", "n_nationkey"))
      .map { case (name, child, ck, parent, pk) =>
        s"""SELECT '$name' AS relation, count(*) AS n_child,
           |  CAST(coalesce(sum(CASE WHEN c.k IS NULL THEN 1 ELSE 0 END), 0)
           |    AS BIGINT) AS n_null_keys,
           |  CAST(coalesce(sum(CASE WHEN c.k IS NOT NULL AND p.k IS NULL
           |           THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_orphans
           |FROM (SELECT $ck AS k FROM $child) c
           |LEFT JOIN (SELECT DISTINCT $pk AS k FROM $parent) p ON c.k = p.k"""
          .stripMargin
      }.mkString("\nUNION ALL\n"),
    // MD5 digests agree byte-for-byte across engines on identical UTF-8
    // canonical strings; the 7-hex-char prefix parses to the same BIGINT
    // via conv() (Spark) and the 0x-cast (DuckDB).
    "q_table_checksum" ->
      """WITH h AS (SELECT l_returnflag,
        |    md5(concat_ws('|', l_orderkey, l_linenumber, l_linestatus,
        |      CAST(floor(l_quantity * 100) AS BIGINT))) AS d
        |  FROM lineitem)
        |SELECT l_returnflag, count(*) AS n_rows,
        |  CAST(sum(('0x' || substr(d, 1, 7))::BIGINT) AS BIGINT) AS checksum,
        |  min(d) AS h_min, max(d) AS h_max
        |FROM h GROUP BY 1""".stripMargin,
    "q_bucketed_join" ->
      """SELECT c_nationkey, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS price_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1""".stripMargin
  )
}
