package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.config.BucketType

/** Event-time tumbling bucketing — the engine's core derived columns
  * `bucket_start` / `bucket_end` (epoch seconds, longs), matching the
  * reference's semantics exactly:
  *
  *   - epoch input:  `floor(epoch / interval) * interval` and `+ interval`
  *     (reference `bucket_epoch_epoch`, `audit_utils/audit_utils/utils.py:216-238`;
  *     golden cases: `(10,1)->(0,10)`, `(10,9)->(0,10)`, `(10,11)->(10,20)`).
  *   - iso input: strict `%Y-%m-%dT%H:%M:%S.%fZ` parse then the same bucketing
  *     (reference `cast_iso_to_dtime` + `bucket_datetime_epoch`,
  *     `audit_utils/audit_utils/utils.py:184-250`). The reference buckets by
  *     seconds-since-midnight and re-anchors to epoch — identical to
  *     epoch-aligned bucketing because the config contract requires
  *     `86400 % interval == 0` (`README.md:44`; validated in [[graft.config.MsgSettings]]).
  *
  * All expressions here are built-in Catalyst functions → whole-stage codegen,
  * and `floor`-on-a-column keeps parquet predicate pushdown available on the
  * underlying field. Scale note: this is a pure narrow projection — no shuffle,
  * no state — so it costs the same per-row at 100 TB as at 1 MB.
  */
object Bucketize {

  /** The reference's strict ISO format (`audit_utils/audit_utils/utils.py:247`):
    * `%Y-%m-%dT%H:%M:%S.%fZ` — microsecond fraction, trailing Z. The reference
    * parses the string as a NAIVE datetime and subtracts the epoch origin,
    * i.e. it treats the wall clock as UTC; `XXX` parses the literal `Z` as the
    * +00:00 offset, pinning the same interpretation regardless of
    * `spark.sql.session.timeZone`. */
  val IsoFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  /** Epoch-seconds column for a bucket field of the given wire type. */
  def toEpochSeconds(field: Column, bucketType: BucketType): Column =
    bucketType match {
      // JSON numbers may arrive as strings post-projection; cast is exact for
      // integral epochs. Fractional epochs truncate TOWARD ZERO, mirroring the
      // reference's Python long(epoch) (`TS_LEGEND`, utils.py:16) — floor()
      // would diverge for negative pre-1970 fractions (-0.5 → bucket
      // (-interval,0) under floor vs (0,interval) under long()).
      case BucketType.Epoch     => field.cast("double").cast("long")
      case BucketType.Iso       => unix_timestamp(to_timestamp(field, IsoFormat))
      case BucketType.Timestamp => unix_timestamp(field)
    }

  /** `bucket_start` expression: `floor(epoch / interval) * interval`. */
  def bucketStart(epochSeconds: Column, intervalSec: Long): Column =
    floor(epochSeconds / intervalSec).cast("long") * intervalSec

  /** Append `bucket_start`/`bucket_end` (epoch-second longs) derived from
    * `field` — operator P3/P4/P5 (`audit_utils/audit_utils/utils.py:62-97`). */
  def bucketize(df: DataFrame, field: String, intervalSec: Long,
                bucketType: BucketType = BucketType.Timestamp): DataFrame = {
    val epoch = toEpochSeconds(col(field), bucketType)
    val start = bucketStart(epoch, intervalSec)
    df.withColumn("bucket_start", start)
      .withColumn("bucket_end", start + intervalSec)
  }

  /** P8 ISO-string bucket (`bucket_datetime`, `audit_utils/audit_utils/utils.py:132-166`):
    * the bucket bounds as ISO strings rather than epoch longs. The reference
    * emits UNPADDED, un-normalized date parts (its own zero-padding bug —
    * `'2015-8-21T1:2:3'`); this implements the INTENDED semantics
    * (`yyyy-MM-dd'T'HH:mm:ss`, zero-padded, UTC), per SURVEY.md §7.4 #4
    * ("implement the intended semantics, not the bugs"). Narrow projection,
    * built-in `date_format`. */
  def bucketizeIsoString(df: DataFrame, field: String, intervalSec: Long,
                         bucketType: BucketType = BucketType.Timestamp): DataFrame = {
    val epoch = toEpochSeconds(col(field), bucketType)
    val start = bucketStart(epoch, intervalSec)
    df.withColumn("bucket_start_iso", isoUtc(start))
      .withColumn("bucket_end_iso", isoUtc(start + intervalSec))
  }

  /** Epoch seconds → `yyyy-MM-dd'T'HH:mm:ss` in UTC, via pure civil-date
    * math (DateType + integer time-of-day): `date_format`/`from_unixtime`
    * would render in `spark.sql.session.timeZone`, silently breaking the
    * UTC contract in any non-UTC session. DateType arithmetic and its
    * string cast are timezone-free. Domain: nonneg epochs (the engine's
    * epoch wire domain — `div`/`%` truncation would misalign pre-1970). */
  private def isoUtc(epochSeconds: Column): Column = {
    // floor-div via double is exact for epoch seconds ≪ 2^53 (same idiom as
    // bucketStart above).
    def fdiv(c: Column, d: Long): Column = floor(c / d).cast("long")
    val days = fdiv(epochSeconds, 86400L)
    val secs = epochSeconds - days * 86400L
    def two(c: Column): Column = lpad(c.cast("string"), 2, "0")
    concat(
      date_add(lit(java.sql.Date.valueOf("1970-01-01")), days.cast("int")).cast("string"),
      lit("T"), two(fdiv(secs, 3600L)),
      lit(":"), two(fdiv(secs % 3600L, 60L)),
      lit(":"), two(secs % 60L))
  }

  /** P9 now-bucket (`bucket_now_epoch`, `audit_utils/audit_utils/utils.py:168-182`):
    * the bucket containing the current UTC time. `current_timestamp()` is a
    * per-query constant, so this is a pair of literal-foldable expressions. */
  def nowBucket(intervalSec: Long = 20L): (Column, Column) = {
    val start = bucketStart(unix_timestamp(current_timestamp()), intervalSec)
    (start, start + intervalSec)
  }

  /** Streaming-native variant: Spark's `window()` produces the identical
    * tumbling buckets (1970-epoch-aligned) as TimestampType bounds; used on
    * the structured-streaming path where a time column is needed for
    * watermarks. `window().start == to_timestamp(bucket_start)` whenever the
    * reference's own day-divisibility precondition holds. */
  def bucketizeWindow(df: DataFrame, tsCol: String, intervalSec: Long): DataFrame =
    df.withColumn("bucket", window(col(tsCol), s"$intervalSec seconds"))
      .withColumn("bucket_start", unix_timestamp(col("bucket.start")))
      .withColumn("bucket_end", unix_timestamp(col("bucket.end")))
      .drop("bucket")
}
