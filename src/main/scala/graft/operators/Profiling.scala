package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling: the "what is in this table" pass every ingestion
  * pipeline runs before touching 100 TB — per-column null/distinct/extrema
  * stats and fixed-width histograms.
  *
  * Reference anchor: the reference exposes only row-level audit counts
  * (`audit_utils/audit_utils/models.py` count tables); column-level
  * profiling is part of the training-data-pipeline extension surface.
  */
object Profiling {

  /** One-pass column profile in LONG form: one output row per profiled
    * column with (col_name, n_rows, n_nulls, n_distinct, min_str, max_str).
    *
    * Extrema are computed over the STRING rendering (`cast` before `min`)
    * so one schema covers every input type; lexicographic order is the
    * documented contract (callers wanting numeric extrema profile a cast
    * column). Multiple exact `count_distinct`s in one aggregate plan as a
    * single Expand (rows × n_cols through one shuffle) — the standard
    * exact-distinct trade; swap in `approx_count_distinct` when profiling
    * wide tables at full scale. The long-form reshape is a driver-side
    * literal explode of the single aggregate row — no second pass. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs: Seq[Column] = cols.flatMap { c =>
      val s = col(c).cast("string")
      Seq(count(col(c)).as(s"_nn_$c"), countDistinct(col(c)).as(s"_nd_$c"),
        min(s).as(s"_mn_$c"), max(s).as(s"_mx_$c"))
    }
    val one = df.agg(count(lit(1)).as("_rows"), aggs: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("col_name"), col("_rows").as("n_rows"),
        (col("_rows") - col(s"_nn_$c")).as("n_nulls"),
        col(s"_nd_$c").as("n_distinct"),
        col(s"_mn_$c").as("min_str"), col(s"_mx_$c").as("max_str"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  /** Per-column MODE — the data-card field [[profile]] lacks: each
    * profiled column's most frequent non-null value (string-rendered, like
    * profile's extrema) with its count; ties break to the smallest value.
    *
    * Scale shape: the value-level counts are one map-side-combined
    * aggregate on (column, value); the argmax is a columns-sized max join
    * + a min aggregate over the tied values — NEVER a window partitioned
    * by column, whose per-partition sort would put an id-like column's
    * every distinct value on one reducer. Columns with only null values
    * emit no row (count(NULL-only) has no non-null mode). */
  def modes(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "modes needs at least one column")
    val stacked = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("value"))): _*))
      .as("cv"))
      .select(col("cv.col_name").as("col_name"), col("cv.value").as("value"))
      .filter(col("value").isNotNull)
    val perValue = stacked.groupBy("col_name", "value")
      .agg(count(lit(1)).as("cnt"))
    // Renamed join key: `top` shares perValue's lineage, so a same-name
    // column reference would be ambiguous.
    val top = perValue.groupBy("col_name").agg(max(col("cnt")).as("top_count"))
      .withColumnRenamed("col_name", "_mode_col")
    perValue.join(top,
        col("col_name") === col("_mode_col") && col("cnt") === col("top_count"))
      .groupBy(col("col_name"))
      .agg(min(col("value")).as("top_value"), max(col("top_count")).as("top_count"))
  }

  /** EXACT per-group quantiles of an integral column — the audited-pipeline
    * counterpart of [[Sketches.approxQuantiles]]: no sketch error bar, no
    * float interpolation, bit-identical on any engine. Each requested
    * quantile is the type-1 order statistic `value at rank ⌈p·n⌉`, with the
    * probability given as the RATIONAL `num/den` so the rank is pure
    * integer arithmetic: `rank = (n·num + den − 1) div den`.
    *
    * Plan: ONE keyed shuffle; both window passes (row_number and the
    * per-group count) share the same partitioning, so Catalyst plans a
    * single exchange + sort, and the final conditional aggregate rides the
    * same layout. Cost is the in-partition sort — the price of EXACT
    * quantiles at any scale (the mergeable-sketch trade documented on
    * [[Sketches.approxQuantiles]]); a skewed group lands on one reducer, so
    * at 100 TB this runs after the groups are known to be bounded (per
    * language, per source — never per corpus).
    *
    * Output: keys…, n, then one column per `(name, num, den)` prob. */
  def exactQuantiles(df: DataFrame, keys: Seq[String], valueCol: String,
                     probs: Seq[(String, Long, Long)]): DataFrame = {
    require(probs.nonEmpty, "need at least one quantile")
    probs.foreach { case (_, nu, de) =>
      require(nu >= 1 && de >= nu, s"probability $nu/$de outside (0, 1]") }
    val w = org.apache.spark.sql.expressions.Window
    val ranked = df.select((keys :+ valueCol).map(col): _*)
      .withColumn("_rn",
        row_number().over(w.partitionBy(keys.map(col): _*).orderBy(col(valueCol))))
      .withColumn("_n", count(lit(1)).over(w.partitionBy(keys.map(col): _*)))
    val qCols = probs.map { case (name, nu, de) =>
      // _n is group-constant, so the rank expression is too: exactly one
      // row per group satisfies the `when`.
      max(when(col("_rn") === expr(s"((_n * $nu) + $de - 1) div $de"),
        col(valueCol))).as(name)
    }
    ranked.groupBy(keys.map(col): _*)
      .agg(max(col("_n")).as("n"), qCols: _*)
  }

  /** Fixed-width histogram of `valueCol` per group key: bin index
    * (`floor(v / width)` — toward -inf, so negatives bin correctly), its
    * inclusive lower edge, and the count. One hash aggregate with map-side
    * partials; output cardinality = keys × occupied bins, never row-scale.
    * Fixed edges (vs quantile bins) keep the pass single-scan and make
    * results mergeable across shards — the property that matters when each
    * of 1000 executors histograms its slice. */
  def histogram(df: DataFrame, valueCol: String, binWidth: Double,
                keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0d, "binWidth must be positive")
    val bin = floor(col(valueCol) / binWidth).cast("long")
    df.groupBy((keys.map(col) :+ bin.as("bin")): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("bin_lo", col("bin") * binWidth)
  }

  /** EQUI-DEPTH histogram: k buckets cut at the EXACT type-1 quantiles
    * (rank `⌈n·i/k⌉`), each reported with its count and value extrema —
    * the selectivity-estimation profile (equi-width above answers "where
    * is the mass", equi-depth answers "where are the boundaries").
    *
    * Scale path: everything derives from the DISTINCT-VALUE frequency
    * table (one corpus-scale hash aggregate), never from row-scale sorts.
    * The running-count window orders the frequency table in ONE partition
    * — bounded by value cardinality, not row count (an integral feature
    * column has thousands of distinct values at any corpus size; for
    * unbounded-cardinality doubles use [[Sketches.approxQuantiles]]).
    * Cut values are collected to the driver (k−1 longs, a centroid-style
    * scalar fetch) and re-enter the plan as literals, so bucket assignment
    * is a narrow projection over the checkpointed frequency table.
    *
    * Ties sit ENTIRELY in the bucket of their cut: bucket = 1 + #{cuts
    * strictly below the value}. With heavy ties buckets are uneven (and
    * duplicate cuts leave buckets empty/absent) — inherent to exact
    * equi-depth, and deterministic on any engine, unlike rank-split
    * `ntile` whose boundary ties depend on sort order.
    *
    * Output: (bucket 1..k, n, lo, hi), absent buckets omitted. */
  def equiDepthHistogram(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 2, "need at least two buckets")
    val freq = df.groupBy(col(valueCol).as("v")).agg(count(lit(1)).as("f"))
      .localCheckpoint(eager = true) // reused by the cuts job AND the histogram
    val w = org.apache.spark.sql.expressions.Window
    val cum = freq
      .withColumn("cum", sum("f").over(w.orderBy("v")
        .rowsBetween(w.unboundedPreceding, w.currentRow)))
      .withColumn("n", sum("f").over(w.orderBy("v")
        .rowsBetween(w.unboundedPreceding, w.unboundedFollowing)))
    val cutAggs = (1 until k).map { i =>
      min(when(col("cum") >= expr(s"((n * $i) + ${k - 1}) div $k"), col("v")))
        .as(s"c$i")
    }
    val cuts = cum.agg(cutAggs.head, cutAggs.tail: _*).collect()(0)
    val bucket = (1 until k).map(i =>
        when(col("v") > lit(cuts.get(i - 1)), 1L).otherwise(0L))
      .reduce(_ + _) + lit(1L)
    freq.groupBy(bucket.as("bucket"))
      .agg(sum("f").as("n"), min("v").as("lo"), max("v").as("hi"))
  }

  /** Key-skew audit — the "should this join be salted / will one reducer
    * drown" report a pipeline runs BEFORE committing to a shuffle key. Per
    * audited column: row/key counts, the hottest key and its count, exact
    * p50/p99 of the per-key frequency, and `skew_permille` =
    * 1000·max_n·n_keys / n_rows — 1000 means perfectly uniform; 10⁶ means
    * the hot key holds 1000× its uniform share (the [[SkewJoin]] /
    * [[BucketCounts.countByKeySalted]] trigger).
    *
    * Plan: all columns ride ONE Expand + one (col, key) hash aggregate
    * (the [[profile]] discipline — never a scan per column); the quantile
    * windows run over the per-key FREQUENCY table, bounded by key
    * cardinality, not rows. Every output is an exact long (products in
    * DECIMAL(38,0) — corpus-scale max_n·n_keys overflows BIGINT silently
    * otherwise); the hot-key tie-break is the (n, key) total order. */
  def skewAudit(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "skewAudit needs at least one column")
    val pairs = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("k"))): _*)).as("p"))
      .select(col("p.*")).filter(col("k").isNotNull)
    val freq = pairs.groupBy("col_name", "k").agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("col_name")
    freq
      .withColumn("_rn", row_number().over(w.orderBy(col("n"), col("k"))))
      .withColumn("_nk", count(lit(1)).over(w))
      .groupBy("col_name")
      .agg(
        sum("n").as("n_rows"),
        max("_nk").as("n_keys"),
        max("n").as("max_n"),
        // Lexicographic struct max = (n, k) total order: ties on the count
        // resolve to the largest key string on BOTH engines.
        max(struct(col("n"), col("k"))).getField("k").as("top_key"),
        max(when(col("_rn") === expr("((_nk * 1) + 2 - 1) div 2"), col("n")))
          .as("p50_n"),
        max(when(col("_rn") === expr("((_nk * 99) + 100 - 1) div 100"), col("n")))
          .as("p99_n"))
      .withColumn("skew_permille", expr(
        "CAST((CAST(1000 AS DECIMAL(38,0)) * max_n * n_keys) div n_rows AS BIGINT)"))
  }

  /** Burst anomalies in per-category daily counts — the ingest-volume
    * monitor ("did `error` events triple against their trailing window").
    * A (category, day) cell is anomalous when its count exceeds
    * `num/den ×` the mean of the trailing `window` OBSERVED days (rows, not
    * calendar days — a silent category re-appearing after a gap compares
    * against its last active days; the right default for volume
    * monitoring), with at least `minPrev` prior days required before any
    * alarm (cold categories can't trip on their first rows).
    *
    * The mean comparison is cross-multiplied — `n·den·prev_days >
    * num·prev_n` in DECIMAL(38,0) — so the whole decision is integer
    * arithmetic, engine-portable, no float mean. Plan: one corpus-scale
    * hash aggregate to (category × day) cells, then windows over that
    * bounded table partitioned by category — the post-aggregate sorts
    * never see row-scale data. */
  def burstAnomalies(df: DataFrame, catCol: String, dayCol: Column,
                     num: Long, den: Long, window: Int = 4,
                     minPrev: Int = 3): DataFrame =
    burstAnomaliesFromDaily(
      df.groupBy(col(catCol), dayCol.as("day")).agg(count(lit(1)).as("n")),
      catCol, num, den, window, minPrev)

  /** [[burstAnomalies]] over an ALREADY-aggregated (category, day, n)
    * table — the streaming-monitor entry point: a stream job keeps the
    * bounded daily-count table as its state (merging each micro-batch's
    * partial counts in), and re-derives alarms from it per trigger;
    * `DocPipelineSpec` pins that this converges to the batch result. */
  def burstAnomaliesFromDaily(daily: DataFrame, catCol: String,
                              num: Long, den: Long, window: Int = 4,
                              minPrev: Int = 3): DataFrame = {
    require(num > 0 && den > 0, "threshold ratio must be positive")
    require(window >= minPrev && minPrev >= 1, "need 1 <= minPrev <= window")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(catCol).orderBy("day").rowsBetween(-window, -1)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    daily
      .withColumn("prev_n", sum("n").over(w))
      .withColumn("prev_days", count(lit(1)).over(w))
      .filter(col("prev_days") >= minPrev &&
        dec(col("n")) * lit(den) * dec(col("prev_days")) >
          lit(num) * dec(col("prev_n")))
  }

  /** Distribution DRIFT between two slices of one table (old/new ingest
    * window, train/serve, A/B): the per-category decomposition of the
    * two-sample chi-square homogeneity statistic. Emits, per category,
    * both slice counts and the category's chi-square contribution
    * `(n_a·T_b − n_b·T_a)² / (T_a·T_b·(n_a+n_b))` (T = slice totals) —
    * sum the column for the full statistic; the per-category rows are the
    * monitoring payload ("which categories moved").
    *
    * One bounded hash aggregate over the scan (category cardinality,
    * never rows) + an empty-frame window for the totals. Determinism: the
    * counts are exact longs; every double product is computed in a FIXED
    * association order and stays exact until one square and one division
    * (long→double conversion and IEEE ops are correctly rounded; products
    * are exact while count·total < 2⁵³ — counts up to ~9·10⁷ per side
    * against totals of the same order). Slices a category saw zero of
    * still contribute (drift TO or FROM nothing is still drift); if a
    * whole SLICE is empty the contribution is null. */
  def distributionDrift(df: DataFrame, catCol: String, slice: Column)
      : DataFrame = {
    val win = org.apache.spark.sql.expressions.Window.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val d = (c: Column) => c.cast("double")
    val diff = d(col("n_a")) * d(col("_tb")) - d(col("n_b")) * d(col("_ta"))
    df.groupBy(col(catCol))
      .agg(sum(when(slice, 1L).otherwise(0L)).as("n_a"),
        sum(when(slice, 0L).otherwise(1L)).as("n_b"))
      .withColumn("_ta", sum("n_a").over(win))
      .withColumn("_tb", sum("n_b").over(win))
      .withColumn("drift_contrib",
        when(col("_ta") > 0 && col("_tb") > 0,
          diff * diff /
            (d(col("_ta")) * d(col("_tb")) * d(col("n_a") + col("n_b")))))
      .drop("_ta", "_tb")
  }
}
