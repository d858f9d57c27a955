package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stable GLOBAL row numbering — `row_number() OVER (ORDER BY …)` without
  * the single-partition sort that formulation plans (Spark funnels the
  * whole dataset through ONE task when a window has no PARTITION BY; at
  * 100 TB that is not slow, it is impossible).
  *
  * The scalable plan is the classic two-pass prefix sum:
  *
  *   1. range-repartition + sort within partitions on the (total) order —
  *      the same machinery as any distributed sort, every task sorts its
  *      slice;
  *   2. count rows per sorted partition (tiny aggregate, one row per
  *      partition), prefix-sum the counts on the driver — bounded by the
  *      partition count, an index artifact like IVF centroids — and add
  *      each partition's offset to its local row_number.
  *
  * Output ids are contiguous 1..N in the total order. Determinism: the
  * caller's order must be TOTAL (pass tie columns); the result is then
  * invariant to WHERE the range boundaries land, because offsets are
  * computed from actual sorted-partition sizes — boundary placement moves
  * rows between partitions, never their global position.
  *
  * This is how a 100 TB pipeline assigns training-example ids, shard-local
  * offsets, or resumable cursor positions; the `row_number()` oracle pins
  * that the distributed formulation equals the textbook one. */
object Numbering {

  /** The shared two-pass skeleton: range-sort, pin the layout, ship ONE
    * bounded per-partition statistic to the driver, prefix-sum it there,
    * and re-attach each partition's offset through a broadcast join.
    * `partStat` is the per-partition total (count / sum); `localCol`
    * builds the within-partition running value given the window. */
  private def twoPass(df: DataFrame, order: Seq[Column],
                      partStat: Column,
                      localCol: org.apache.spark.sql.expressions.WindowSpec => Column,
                      out: String, numPartitions: Option[Int]): DataFrame = {
    require(order.nonEmpty, "need at least one order column")
    Seq(out, "_pid", "_off").foreach(c => require(!df.columns.contains(c),
      s"input already has a '$c' column"))
    val parts = numPartitions.getOrElse(df.sparkSession.sessionState.conf.numShufflePartitions)
    val sorted = df.repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("_pid", spark_partition_id())
    // One bounded pass for the offsets: |partitions| rows to the driver —
    // the prefix-sum index, not data. localCheckpoint pins the partition
    // layout so the statistic pass and the output pass cannot see
    // different boundary draws (range sampling is not re-run).
    val pinned = sorted.localCheckpoint(eager = true)
    val totals = pinned.groupBy("_pid").agg(partStat.as("_t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = totals.map(_._1).zip(totals.scanLeft(0L)(_ + _._2).init)
    // Offsets attach through a BROADCAST join on the partition id — O(1)
    // per row at any partition count (a when/otherwise literal chain would
    // nest one CaseWhen per partition: O(P) per-row evaluation and a
    // Catalyst tree thousands deep at real cluster widths).
    val offsetsDf = df.sparkSession
      .createDataFrame(offsets.toSeq).toDF("_pid", "_off")
    val w = Window.partitionBy(col("_pid")).orderBy(order: _*)
    pinned.join(broadcast(offsetsDf), "_pid")
      .withColumn(out, localCol(w) + col("_off"))
      .drop("_pid", "_off")
  }

  def assignGlobalIds(df: DataFrame, order: Seq[Column],
                      out: String = "global_id",
                      numPartitions: Option[Int] = None): DataFrame =
    twoPass(df, order, count(lit(1)),
      w => row_number().over(w).cast("long"), out, numPartitions)

  /** Distributed inclusive prefix sum of `valueCol` under the caller's
    * total order — `sum(v) OVER (ORDER BY …)` without the single-partition
    * window, same two-pass discipline as [[assignGlobalIds]] (per-partition
    * totals prefix-summed on the driver, within-partition running sums in
    * parallel). `valueCol` must be non-null (coalesce upstream) and the
    * order total, or the running values are ill-defined. */
  def prefixSum(df: DataFrame, order: Seq[Column], valueCol: Column,
                out: String = "prefix_sum",
                numPartitions: Option[Int] = None): DataFrame =
    twoPass(df, order, sum(valueCol).cast("long"),
      w => sum(valueCol).over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)).cast("long"),
      out, numPartitions)
}
