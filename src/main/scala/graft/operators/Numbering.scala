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

  def assignGlobalIds(df: DataFrame, order: Seq[Column],
                      out: String = "global_id",
                      numPartitions: Option[Int] = None): DataFrame = {
    require(order.nonEmpty, "assignGlobalIds needs at least one order column")
    Seq(out, "_pid", "_off").foreach(c => require(!df.columns.contains(c),
      s"input already has a '$c' column"))
    val parts = numPartitions.getOrElse(df.sparkSession.sessionState.conf.numShufflePartitions)
    val sorted = df.repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("_pid", spark_partition_id())
    // One bounded pass for the offsets: |partitions| rows to the driver —
    // the prefix-sum index, not data. localCheckpoint pins the partition
    // layout so the counting pass and the numbering pass cannot see
    // different boundary draws (range sampling is not re-run).
    val pinned = sorted.localCheckpoint(eager = true)
    val counts = pinned.groupBy("_pid").count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.map(_._1).zip(counts.scanLeft(0L)(_ + _._2).init)
    // Offsets attach through a BROADCAST join on the partition id — O(1)
    // per row at any partition count (a when/otherwise literal chain would
    // nest one CaseWhen per partition: O(P) per-row evaluation and a
    // Catalyst tree thousands deep at real cluster widths).
    val offsetsDf = df.sparkSession
      .createDataFrame(offsets.toSeq).toDF("_pid", "_off")
    val w = Window.partitionBy(col("_pid")).orderBy(order: _*)
    pinned.join(broadcast(offsetsDf), "_pid")
      .withColumn(out, row_number().over(w).cast("long") + col("_off"))
      .drop("_pid", "_off")
  }
}
