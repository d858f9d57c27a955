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

  /** SLIDING-window distinct counting by sketch merge — "distinct users
    * over the trailing week, per day" at 100 TB. The raw-data formulation
    * re-scans `window` days of events for EVERY output day (the oracle
    * does exactly that: a ×window Expand + exact distinct — honest, and
    * w× the data motion); this one aggregates each (group, day) to a
    * DataSketches HLL once — ONE corpus-scale shuffle with mergeable
    * fixed-size partials — then unions sketches over the trailing RANGE
    * frame of the bounded groups×days table. Sketch union = register-wise
    * max: associative and duplicate-insensitive, which is exactly why
    * pre-aggregated daily sketches answer any window AFTER the fact —
    * the pattern that turns a streaming distinct-count into cheap daily
    * artifacts plus query-time merges.
    *
    * The frame is calendar days (`rangeBetween` on the integral day), so
    * gaps shorten the window — consistent with "users in the last 7
    * days". Output: (group…, day, approx_users). Estimates are
    * deterministic for a given input set (register maxima), but
    * engine-specific — gate queries pin an error bound beside the exact
    * value instead of the estimate itself ([[withinRelBound]]). */
  def slidingDistinct(df: DataFrame, keys: Seq[String], dayCol: String,
                      valueCol: String, window: Int, lgK: Int = 12,
                      out: String = "approx_users"): DataFrame = {
    require(window >= 1, "window must be at least one day")
    val daily = df.groupBy((keys.map(col) :+ col(dayCol)): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("_sk"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col(dayCol))
      .rangeBetween(-(window - 1L), 0L)
    daily
      .withColumn(out, hll_sketch_estimate(hll_union_agg(col("_sk")).over(w)))
      .drop("_sk")
  }

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

  /** EXACT heavy hitters — every key of `keyCol` occurring at least
    * `threshold` times, with its exact count — via a Count-Min prefilter:
    *
    *   1. Build ONE CountMinSketch over the key column (mergeable
    *      fixed-size aggregate: partials combine counter-wise, a few KB
    *      cross the wire however many distinct keys exist).
    *   2. Probe every row against the broadcast sketch and keep rows whose
    *      key's ESTIMATE reaches the threshold. CMS never undercounts, so
    *      no true heavy hitter is lost; the probe is a narrow map-stage
    *      filter (the deserialized sketch is memoized per partition —
    *      [[graft.plans.CmsEstimateExpr]]).
    *   3. Exact-count the surviving rows and re-check the threshold,
    *      eliminating the sketch's false positives. All rows of a key pass
    *      or fail the prefilter together (same key ⇒ same estimate), so
    *      surviving counts are TRUE counts and the output is exact.
    *
    * Why not a plain groupBy+HAVING: that shuffles one row per distinct
    * key per partition — at 100 TB with a long-tailed key domain (URLs,
    * n-grams, user ids) the shuffle is dominated by keys that can never
    * reach the threshold. The prefilter keeps the shuffle proportional to
    * rows of CANDIDATE keys (≥ threshold − eps·N by the CMS bound), at the
    * cost of one extra narrow pass. `seed` pins the hash functions so runs
    * are reproducible.
    *
    * Sizing `eps` is the whole trade: the sketch is ~`(2/eps)·7·8` bytes
    * (≈ 1.1 MB at the 1e-4 default — an index artifact shipped inside
    * every task binary, like a broadcast build side), and the prefilter
    * only bites when `threshold ≫ eps·N` — at 10⁹ rows, eps = 1e-4 means
    * overcounts up to 10⁵, so thresholds below that pass everything (still
    * EXACT, just unfiltered). Pick eps ≈ threshold / (10 · N) and accept
    * the proportional sketch size.
    *
    * Output: (`keyCol`, `n`), exact. String/binary keys probe through the
    * same byte-level hash the aggregate ingests, long keys through the
    * integral path. NULL keys are excluded (the CMS aggregate skips them),
    * unlike a literal GROUP BY, which would emit a (null, n) row. */
  def heavyHitters(df: DataFrame, keyCol: String, threshold: Long,
                   eps: Double = 1e-4, confidence: Double = 0.99,
                   seed: Int = 42): DataFrame = {
    require(threshold >= 1, "threshold must be at least 1")
    val k = df.schema(keyCol).dataType match {
      case org.apache.spark.sql.types.StringType => col(keyCol).cast("binary")
      case _                                     => col(keyCol)
    }
    graft.plans.GraftExtensions.register(df.sparkSession)
    // The sketch is the INDEX BUILD side: one bounded row (size set by eps
    // — see scaladoc) collected to the driver and re-shipped as a literal —
    // the same pattern as IVF centroids, and it keeps the probe pass a pure
    // narrow filter (a single-row broadcast join would plan the nested-loop
    // product the repo-wide plan guard forbids; a literal also makes the
    // expression memo hit, a joined binary column would defeat it).
    // Column API (not an interpolated SQL string), so a key column whose
    // name needs backticks — spaces, dots, hyphens — resolves as an
    // identifier instead of parsing as an arbitrary expression, matching
    // the probe side below.
    val skBytes: Array[Byte] = df
      .agg(call_function("count_min_sketch",
        col(keyCol), lit(eps), lit(confidence), lit(seed)))
      .head().getAs[Array[Byte]](0)
    df.filter(col(keyCol).isNotNull && // explicit: null keys are out of scope
        call_function("cms_estimate", lit(skBytes), k) >= lit(threshold))
      .groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .filter(col("n") >= lit(threshold))
  }
}
