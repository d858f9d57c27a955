package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Central fixture loader for the driver parquet tables (TESTDATA.md).
  *
  * Timestamp normalization — the fixtures have shipped two representations
  * across driver regenerations, and every engine query must see ONE type:
  *
  *  - TIMESTAMP(NANOS) (early fixtures): Spark rejects it by default
  *    (PARQUET_TYPE_ILLEGAL). We flip the documented escape hatch
  *    `spark.sql.legacy.parquet.nanosAsLong` (dynamic SQLConf) and convert
  *    the resulting nanosecond longs back to TimestampType with exact
  *    integer math (`div 1000` → microseconds — no double rounding; nanos
  *    since epoch exceed 2^53 so a double roundtrip would corrupt them).
  *  - tz-naive TIMESTAMP(MICROS) (current fixtures): Spark ≥3.4 infers
  *    TIMESTAMP_NTZ, which event-time functions (`unix_micros`, watermarks,
  *    `window`) reject — this silently killed 18 event-time queries and all
  *    streaming benches in round 6. We cast NTZ → TimestampType here; every
  *    engine session pins `spark.sql.session.timeZone=UTC`, so the cast
  *    preserves the wall clock and epoch math matches DuckDB's
  *    naive-as-UTC interpretation of the same files.
  */
object Tables {

  /** Restore SCAN parallelism for a per-row-HEAVY stage (guide §1.2/§8:
    * fix the distributed algorithm before the per-task work). The driver
    * fixtures are single-row-group parquet files, and a parquet row
    * group is indivisible — no `maxPartitionBytes` setting can split it,
    * so a decode/encode flatMap chained straight onto the scan runs as
    * ONE task regardless of core count (measured: q_audio_fp_pairs'
    * fingerprint job = 3.9 s single-task at sf0.1/local[32]). This
    * round-robins the NARROW pre-decode rows (ids — never payloads)
    * across `defaultParallelism` so the heavy stage uses every core.
    * At production scale tables are many row-groups/files and scans
    * parallelize on their own; the repartition then still costs only a
    * shuffle of key-width rows — noise next to the decode it feeds —
    * and `defaultParallelism` tracks the cluster, not a local constant.
    *
    * NO-OP when the scan already parallelizes (advice r17): at
    * production scale tables are many row-groups/files, the scan
    * arrives with >= defaultParallelism partitions, and the
    * repartition — which at several call sites carries the text/bytes
    * column the heavy stage decodes — would be a full-corpus shuffle
    * of pure overhead. The partition count comes from the physical
    * scan, so apply spread to SCAN-STAGE frames only (all current call
    * sites): a frame already containing an exchange would pay AQE
    * stage materialization just to answer `getNumPartitions`. */
  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df else df.repartition(p)
  }

  /** Columns that arrive as nanosecond longs under the legacy flag, per
    * table (only `events.ts` in the driver fixtures — TESTDATA.md; callers
    * with other nanos tables pass their own map to [[load]]). */
  val DefaultNanosCols: Map[String, Set[String]] = Map("events" -> Set("ts"))

  def load(spark: SparkSession, dir: String, name: String,
           nanosCols: Map[String, Set[String]] = DefaultNanosCols): DataFrame = {
    val tableNanos = nanosCols.getOrElse(name, Set.empty)
    // Scope the legacy flag to this read: it changes how EVERY parquet scan
    // in the session decodes TIMESTAMP(NANOS), so restore the caller's value.
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema.fields.foldLeft(df) {
        case (acc, f) if tableNanos.contains(f.name) && f.dataType == LongType =>
          acc.withColumn(f.name, timestamp_micros(expr(s"`${f.name}` div 1000")))
        case (acc, f) if f.dataType == TimestampNTZType =>
          acc.withColumn(f.name, col(f.name).cast(TimestampType))
        case (acc, _) => acc
      }
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
}
