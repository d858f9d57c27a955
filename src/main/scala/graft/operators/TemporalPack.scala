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

  private val WeekUs = 7L * 86400L * 1000000L // inline-precomputed (INT32-safe)

  /** Epoch micros for the NTZ order/ship dates. The cast reads the wall
    * time in the session zone — every graft runner pins UTC — so this
    * equals DuckDB's `epoch_us` on the same naive TIMESTAMP. */
  private def ntzMicros(c: org.apache.spark.sql.Column) =
    unix_micros(c.cast("timestamp"))

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
    // How many lineitems shipped inside each order's first fulfilment week
    // [orderdate, orderdate+7d) — a pure interval predicate, no equi key.
    "q_range_join" -> { (s, dir) =>
      val o = table(s, dir, "orders").select(col("o_orderkey"),
        ntzMicros(col("o_orderdate")).as("w_start"),
        (ntzMicros(col("o_orderdate")) + WeekUs).as("w_end"))
      val li = table(s, dir, "lineitem")
        .select(ntzMicros(col("l_shipdate")).as("ship_us"))
      Temporal.rangeJoin(li, "ship_us", o, "w_start", "w_end", WeekUs)
        .groupBy("o_orderkey").agg(count(lit(1)).as("n_shipped"))
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
    "q_range_join" ->
      s"""SELECT o.o_orderkey, count(*) AS n_shipped
         |FROM orders o JOIN lineitem l
         |  ON epoch_us(l.l_shipdate) >= epoch_us(o.o_orderdate)
         | AND epoch_us(l.l_shipdate) < epoch_us(o.o_orderdate) + $WeekUs
         |GROUP BY 1""".stripMargin
  )
}
