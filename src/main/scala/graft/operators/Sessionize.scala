package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the classic event-stream operator: a new
  * session starts when a user's inter-event gap exceeds `gapSeconds`.
  *
  * Plan shape (the 100 TB story): ONE shuffle on the user key; `lag`, the
  * running session counter, and the final per-session aggregate all ride the
  * same (user) partitioning and (ts, id) sort — Catalyst plans a single
  * Window over one Exchange+Sort, and the groupBy reuses the partitioning
  * (no second user-key shuffle of raw events). Per-user state is the window
  * frame, never driver-side.
  *
  * Determinism: timestamps compare as exact MICROSECOND longs
  * (`unix_micros` — no double rounding), ties break on the event id, and
  * the boundary predicate is a strict `>` — all replicated by the oracle.
  */
object Sessionize {

  /** One row per (user, session): start/end in epoch micros, event count.
    * Session ids restart at 1 per user (the cross-engine-stable labeling —
    * a global id would depend on user ordering). */
  def sessionize(events: DataFrame, gapSeconds: Long,
                 userCol: String = "user_id", tsCol: String = "ts",
                 idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col("us"), col(idCol))
    events
      .select(col(userCol), col(idCol), unix_micros(col(tsCol)).as("us"))
      .withColumn("_new",
        when(lag(col("us"), 1).over(w).isNull ||
          col("us") - lag(col("us"), 1).over(w) > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("session_id"))
      .agg(
        min(col("us")).as("session_start_us"),
        max(col("us")).as("session_end_us"),
        count(lit(1)).as("n_events"))
  }
}
