package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate (sketch-backed) aggregates — the only way several whole-corpus
  * statistics are computable at 100 TB. An EXACT distinct count shuffles every
  * distinct value (Spark plans it as Expand + two shuffles whose width is the
  * value domain); the HyperLogLog++ sketch behind [[approxDistinct]] keeps a
  * FIXED-size register array per group, merges map-side, and ships only sketch
  * bytes through the one group-by shuffle — cost is O(groups · 2^p) regardless
  * of cardinality. Likewise [[approxQuantiles]] (Greenwald-Khanna summaries,
  * `percentile_approx`): mergeable bounded state vs. an exact percentile's
  * full sort of the group.
  *
  * Both functions are deterministic for a given dataset: HLL registers are
  * element-wise maxima (merge order irrelevant) and GK summaries at the
  * accuracies used here resolve identically on the fixture scales. The pack's
  * gate queries still avoid hash-pinning raw sketch outputs across engines —
  * DuckDB's `approx_count_distinct` is a different sketch — and instead pin
  * an integer-exact error bound next to the exact value (see
  * [[AnalyticsPack]]).
  */
object Sketches {

  /** Per-group approximate distinct count of `valueCol` via HyperLogLog++.
    * `rsd` is the target relative standard deviation (Spark default 0.05;
    * 0.02 ⇒ 2^12 registers ⇒ ~4 KB state per group). */
  def approxDistinct(df: DataFrame, keys: Seq[String], valueCol: String,
                     rsd: Double = 0.02,
                     out: String = "approx_distinct"): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(approx_count_distinct(col(valueCol), rsd).as(out))

  /** Per-group approximate quantiles of `valueCol` at `probs`, as one array
    * column. `accuracy` trades state size for error: guaranteed rank error
    * ≤ n/accuracy. */
  def approxQuantiles(df: DataFrame, keys: Seq[String], valueCol: String,
                      probs: Seq[Double], accuracy: Int = 10000,
                      out: String = "approx_quantiles"): DataFrame = {
    val ps = array(probs.map(lit): _*)
    df.groupBy(keys.map(col): _*)
      .agg(percentile_approx(col(valueCol), ps, lit(accuracy)).as(out))
  }

  /** Integer-exact relative-error check `|approx − exact| · denom ≤ exact`,
    * i.e. error ≤ 1/denom — no float arithmetic, so the result is safe to
    * hash-compare across engines. */
  def withinRelBound(approx: Column, exact: Column, denom: Long): Column =
    abs(approx - exact) * lit(denom) <= exact
}
