package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product-analytics funnels and cohorts over an event stream.
  *
  * Funnel semantics (the cascaded-minimum definition every analytics SQL
  * writes): stage 1 completes at the key's earliest stage-1 event; stage
  * i completes at the earliest stage-i event STRICTLY after stage i-1's
  * completion. Strict ordering makes the result independent of how
  * equal-timestamp events tie-break, so it is engine-portable.
  *
  * The naive plan is one aggregation + join PER STAGE (each stage's min
  * depends on the previous stage's). [[funnel]] instead folds each key's
  * time-sorted events once: a single groupBy shuffle, one pass, state =
  * one timestamp per stage — the shape that survives a 100 TB event log
  * with a long funnel. The fold visits events in ascending-time order, so
  * "earliest event after stage i-1" is simply "first matching event seen
  * while stage i is open"; one event can advance at most one stage per
  * step because every stage check reads the PRE-event state.
  */
object Funnel {

  /** Per-key funnel state: `stages_done` (0..stages.length) and the µs
    * timestamp of each completed stage (`stage_ts`, -1 for unreached).
    * `events` needs `keyCol`, long-µs `tsCol`, and string `typeCol`.
    * Stage types need not be distinct: repeated types mean "another such
    * event strictly later". */
  def funnel(events: DataFrame, stages: Seq[String], keyCol: String = "user_id",
             tsCol: String = "us", typeCol: String = "event_type"): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val n = stages.length
    val stagesArr = stages.map(s => s"'${s.replace("'", "''")}'")
      .mkString("array(", ", ", ")")
    // Fold state: array<bigint> of per-stage completion times, -1 = open.
    // Each stage advances iff it is open, its predecessor closed before
    // this event (strictly), and the event type matches. CASE arms are
    // ordered so element_at(acc, i) is only reached when i >= 1 — ANSI
    // mode throws on out-of-range array indices, so the guard must be a
    // lazily-evaluated branch, not an AND conjunct.
    val fold =
      s"""aggregate(
         |  array_sort(collect_list(struct($tsCol AS us, $typeCol AS et))),
         |  array_repeat(-1L, $n),
         |  (acc, e) -> transform(acc, (t, i) ->
         |    CASE WHEN t <> -1 THEN t
         |         WHEN e.et <> element_at($stagesArr, i + 1) THEN t
         |         WHEN i = 0 THEN e.us
         |         WHEN element_at(acc, i) <> -1 AND e.us > element_at(acc, i)
         |           THEN e.us
         |         ELSE t END))""".stripMargin
    events.groupBy(col(keyCol))
      .agg(expr(fold).as("stage_ts"))
      .withColumn("stages_done",
        size(filter(col("stage_ts"), _ =!= -1L)).cast("long"))
  }

  /** Classic retention triangle: each key's cohort is the period of its
    * first event; one output row per (cohort, period offset) counts the
    * cohort keys active in that period.
    *
    * ONE key-shuffle, no join: a single `collect_set(period)` aggregate
    * per key carries both facts — the cohort (its array_min) and the
    * active periods (its elements). The per-key set is bounded by the
    * number of periods in the observation window (weeks in a retention
    * report — dozens, never row-scale), so the ObjectHashAggregate state
    * and the explode fan-out are small by construction at any corpus
    * size. Partial aggregation still applies (set unions merge map-side),
    * so shuffle volume is ≤ distinct (key, period) pairs — the same bytes
    * the old distinct-then-join plan shuffled, minus two extra exchanges
    * and the join. */
  def cohortRetention(events: DataFrame, periodUs: Long,
                      keyCol: String = "user_id",
                      tsCol: String = "us"): DataFrame = {
    require(periodUs > 0, "periodUs must be positive")
    // Integer div, not `/`: double division can land an exact multiple a
    // hair below the integer and truncate into the previous period.
    val period = expr(s"`$tsCol` div ${periodUs}L")
    events.groupBy(col(keyCol))
      .agg(collect_set(period).as("_periods"))
      .select(array_min(col("_periods")).as("cohort"),
        explode(col("_periods")).as("period"))
      .groupBy(col("cohort"), (col("period") - col("cohort")).as("period_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
