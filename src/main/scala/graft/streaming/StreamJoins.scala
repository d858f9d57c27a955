package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream correlation joins — "purchase within an hour of the click"
  * across two live streams. Structured Streaming keeps BOTH sides' recent
  * rows in the state store and matches them as either side arrives; what
  * makes that viable at scale is the pair of constraints Spark requires and
  * this operator always supplies:
  *
  *   - a watermark on each side, and
  *   - an event-time RANGE bound tying the two sides' timestamps together.
  *
  * Together they give the state store an eviction rule (a left row can be
  * dropped once the right watermark passes `l.ts + window`; symmetric for
  * the right), so state holds only the window horizon of each stream — not
  * the streams' history — no matter how long the job runs. Without the
  * range bound Spark would have to retain every row forever (and the
  * unsupported-operation checker rejects the plan in append mode).
  *
  * Left-outer works the same, with the null-padded row for an unmatched
  * left event emitted once the watermark proves no match can still arrive.
  */
object StreamJoins {

  /** Join two streams on equal `keys` where `right.tsR ∈ [left.tsL,
    * left.tsL + windowSeconds]`. Column names must not collide across
    * sides apart from `keys` (which are coalesced into one column set).
    * `joinType`: "inner" or "left_outer". */
  def windowJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 tsL: String, tsR: String, windowSeconds: Long,
                 lateness: String = "10 seconds",
                 joinType: String = "inner"): DataFrame = {
    require(keys.nonEmpty, "stream-stream windowJoin needs equi keys")
    require(windowSeconds > 0, "windowSeconds must be positive")
    require(Set("inner", "left_outer")(joinType),
      s"joinType must be inner or left_outer, got $joinType")
    val clash = (left.columns.toSet intersect right.columns.toSet) -- keys
    require(clash.isEmpty, s"column collision outside keys: $clash")

    val l = left.withWatermark(tsL, lateness)
    // Rename right keys so the join condition is unambiguous, then drop.
    val rk = keys.map(k => k -> s"_r_$k").toMap
    val r = rk.foldLeft(right.withWatermark(tsR, lateness)) {
      case (df, (k, a)) => df.withColumnRenamed(k, a)
    }
    val cond = keys.map(k => col(k) === col(rk(k)))
      .reduce(_ && _) &&
      col(tsR) >= col(tsL) &&
      col(tsR) <= col(tsL) + expr(s"INTERVAL $windowSeconds SECONDS")
    l.join(r, cond, joinType).drop(rk.values.toSeq: _*)
  }
}
