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
      ev.groupBy("event_type")
        .agg(approx_count_distinct(col("event_id"), 0.02).as("approx"),
          countDistinct(col("event_id")).as("n_ids"))
        .select(col("event_type"), col("n_ids"),
          Sketches.withinRelBound(col("approx"), col("n_ids"), 10L).as("approx_ok"))
    },
    // Co-located join over tables bucketed on the join key at write time —
    // the pay-the-shuffle-once layout. Values are pinned by the oracle's
    // plain join; the exchange-free PLAN is pinned by BucketingSpec.
    "q_bucketed_join" -> { (s, dir) =>
      val tag = (dir.hashCode & Int.MaxValue).toString
      Bucketing.writeBucketed(
        table(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        s"orders_b_$tag", s"/tmp/graft_bucketed_$tag/orders",
        8, Seq("o_custkey"), Seq("o_custkey"))
      Bucketing.writeBucketed(
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
    "q_salted_join" ->
      """SELECT c_nationkey, event_type, count(*) AS n_events
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1, 2""".stripMargin,
    "q_bucketed_join" ->
      """SELECT c_nationkey, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS price_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1""".stripMargin
  )
}
