package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Central fixture loader for the driver parquet tables (TESTDATA.md).
  *
  * `events.ts` is written as parquet TIMESTAMP(NANOS) which Spark rejects by
  * default (PARQUET_TYPE_ILLEGAL). We flip the documented escape hatch
  * `spark.sql.legacy.parquet.nanosAsLong` (dynamic SQLConf) and convert the
  * resulting nanosecond longs back to a proper TimestampType with exact
  * integer math (`div 1000` → microseconds — no double rounding; nanos since
  * epoch exceed 2^53 so a double roundtrip would corrupt timestamps).
  */
object Tables {

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
        case (acc, _) => acc
      }
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
}
