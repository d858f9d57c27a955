package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Profiling harness for the stream-stream join path (VERDICT r8 #4: 8.9k
  * rows/s vs 30k sessions / 21k dedup on the same replay — why?).
  * Variants measured, numbers recorded in SCALE.md:
  *
  *   - `bench`     — the exact Bench shape: round-robin staged files (every
  *                   micro-batch spans the whole month ⇒ 40-day lateness ⇒
  *                   ZERO state eviction for the whole replay), HDFS-backed
  *                   state store, 2 files/trigger.
  *   - `rocksdb`   — same, RocksDB state store provider.
  *   - `onebatch`  — same, all files in one trigger (planning/commit
  *                   overhead isolated).
  *   - `timeorder` — files staged in EVENT-TIME order (each file = one time
  *                   slice, the production replay shape) with 2-hour
  *                   lateness: the watermark advances between batches and
  *                   join state is EVICTED as it expires — steady-state
  *                   bounded-state throughput, the number a production
  *                   deployment would see.
  *
  * Not part of the driver contract. */
object StreamJoinProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]").appName("graft-streamjoin-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def stage(timeOrdered: Boolean): (String, org.apache.spark.sql.types.StructType, Long) = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_sj_probe").toString
      val ev = graft.Tables.load(spark, dir, "events")
        .withColumn("ts_us", unix_micros(col("ts"))).drop("ts")
      val out =
        if (timeOrdered)
          // Range-partition by event time so file k holds time-slice k:
          // each micro-batch advances the watermark past the previous one.
          ev.repartitionByRange(8, col("ts_us")).sortWithinPartitions("ts_us")
        else ev.repartition(8)
      out.write.mode("overwrite").parquet(tmp)
      val schema = spark.read.parquet(tmp).schema
      (tmp, schema, spark.read.parquet(tmp).count())
    }

    def run(tag: String, path: String,
            schema: org.apache.spark.sql.types.StructType, rows: Long,
            lateness: String, filesPerTrigger: Int,
            rocksdb: Boolean, statePartitions: Int = 32): Unit = {
      // State-store count per micro-batch = shuffle partitions at query
      // start (× 4 internal stores for a symmetric join); sizing them to
      // the stream volume is the standard production lever probed here.
      spark.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
      if (rocksdb)
        spark.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      else
        spark.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
      def side(et: String) = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", filesPerTrigger.toString).parquet(path)
        .filter(col("event_type") === et)
      val views = side("view").select(col("user_id"),
        timestamp_micros(col("ts_us")).as("vts"), col("event_id").as("view_id"))
      val clicks = side("click").select(col("user_id"),
        timestamp_micros(col("ts_us")).as("cts"), col("event_id").as("click_id"))
      val joined = graft.streaming.StreamJoins.windowJoin(
        views, clicks, keys = Seq("user_id"), tsL = "vts", tsR = "cts",
        windowSeconds = 3600L, lateness = lateness)
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val q = joined.writeStream.format("noop")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        (System.nanoTime() - t0) / 1e9
      }
      val best = secs.min
      println(f"PROBE $tag%-10s rows=$rows sec=$best%.1f rate=${rows / best}%.0f rows/s " +
        f"(runs: ${secs.map(s => f"$s%.1f").mkString(", ")})")
    }

    val (rr, rrSchema, rrRows) = stage(timeOrdered = false)
    run("bench", rr, rrSchema, rrRows, "40 days", 2, rocksdb = false)
    run("rocksdb", rr, rrSchema, rrRows, "40 days", 2, rocksdb = true)
    run("onebatch", rr, rrSchema, rrRows, "40 days", 8, rocksdb = false)
    run("p8", rr, rrSchema, rrRows, "40 days", 2, rocksdb = false,
      statePartitions = 8)
    run("p8rocks", rr, rrSchema, rrRows, "40 days", 2, rocksdb = true,
      statePartitions = 8)
    // r16 grid extension (r15 verdict #7 — the metric sat ~24k for three
    // rounds): the r12 grid never crossed trigger granularity WITH the
    // 8-partition win, nor probed below 8 — the missing cells that tell
    // "per-batch commit overhead" apart from "state-store write path".
    run("onebatch8", rr, rrSchema, rrRows, "40 days", 8, rocksdb = false,
      statePartitions = 8)
    run("fpt4p8", rr, rrSchema, rrRows, "40 days", 4, rocksdb = false,
      statePartitions = 8)
    run("p4", rr, rrSchema, rrRows, "40 days", 2, rocksdb = false,
      statePartitions = 4)
    run("onebatch4", rr, rrSchema, rrRows, "40 days", 8, rocksdb = false,
      statePartitions = 4)
    val (to, toSchema, toRows) = stage(timeOrdered = true)
    run("timeorder", to, toSchema, toRows, "2 hours", 2, rocksdb = false)
    spark.stop()
  }
}
