package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouped ordinary-least-squares trend fit, engineered for cross-engine
  * determinism: the only order-dependent step in OLS is the summation, so
  * the moments (n, Σx, Σy, Σx², Σxy) are accumulated as EXACT BIGINT sums
  * over integral inputs — commutative, partition-order-independent,
  * identical on any engine — and slope/intercept are derived from them by
  * a fixed IEEE double expression. Two engines computing this from the
  * same rows produce bit-identical doubles, unlike `regr_slope` over raw
  * doubles whose partial-sum order is a partitioning artifact.
  *
  * 100 TB shape: one partial+final aggregation on the group keys (five
  * long counters per group — a map-side combine reduces each partition to
  * |groups| rows before the shuffle); the closed-form solve is per-group
  * scalar math. Callers quantize float measures to integers first (e.g.
  * `floor(value * 1000)`), choosing the scale so Σxy stays well inside
  * 2^53 (exact in double) — the caller knows the data's magnitude; this
  * function checks nothing it cannot know.
  */
object Regression {

  /** Per-group OLS fit of integral `y` against integral `x`. Output:
    * groupCols ++ (n, slope, intercept); groups where x is constant (zero
    * variance) yield NaN slope/intercept (0/0 — NB DuckDB returns NULL for
    * 0/0, so oracles must pin NaN explicitly on the zero-variance branch,
    * as the q_trend/q_autocorr oracles do). */
  def linearFit(df: DataFrame, groupCols: Seq[String],
                x: Column, y: Column): DataFrame = {
    require(groupCols.nonEmpty, "linearFit needs at least one group column")
    val xl = x.cast("long"); val yl = y.cast("long")
    val moments = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(xl).as("sx"), sum(yl).as("sy"),
        sum(xl * xl).as("sxx"), sum(xl * yl).as("sxy"))
    val nD = col("n").cast("double"); val sxD = col("sx").cast("double")
    val syD = col("sy").cast("double"); val sxxD = col("sxx").cast("double")
    val sxyD = col("sxy").cast("double")
    val slope = (nD * sxyD - sxD * syD) / (nD * sxxD - sxD * sxD)
    moments.select(groupCols.map(col) ++ Seq(col("n"),
      slope.as("slope"),
      ((syD - slope * sxD) / nD).as("intercept")): _*)
  }
}
