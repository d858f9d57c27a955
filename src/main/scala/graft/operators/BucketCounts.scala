package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.config.BucketType

/** Count-by-key over (projected columns ⨯ time bucket) — operator A1, the
  * engine's raison d'être (reference `(message_parse(line), 1)` →
  * `reduceByKey(+)`, `spark-streaming-kafka-bucket-counter.py:125-126`).
  *
  * The reference keys on the full projected-JSON string, which is semantically
  * `GROUP BY all-projected-cols, bucket_start, bucket_end` → `COUNT(*)`.
  * Stated relationally, Catalyst plans a partial (map-side) + final hash
  * aggregate automatically — the same two-phase shape the reference hand-built
  * with `reduceByKey` + a driver-merged accumulator dict, but distributed and
  * codegen'd.
  *
  * Scale: one shuffle on the group keys; partial aggregation bounds shuffle
  * volume by (distinct keys × partitions), not input rows. At 100 TB the key
  * cardinality (projected cols × buckets) is what matters; AQE coalesces the
  * post-shuffle partitions when cardinality is small.
  */
object BucketCounts {

  /** Bucketize on `tsField` then count per (keyCols, bucket_start, bucket_end). */
  def bucketCounts(df: DataFrame, tsField: String, intervalSec: Long,
                   keyCols: Seq[String],
                   bucketType: BucketType = BucketType.Timestamp): DataFrame = {
    val bucketized = Bucketize.bucketize(df, tsField, intervalSec, bucketType)
    countByKey(bucketized, keyCols :+ "bucket_start" :+ "bucket_end")
  }

  /** Plain count-by-key — `GROUP BY keys → COUNT(*) AS count`. */
  def countByKey(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("count"))

  /** Salted two-stage count-by-key for SKEWED keys: stage 1 groups by
    * (keys, salt) where salt = a deterministic spread over `saltBuckets`
    * derived from a high-cardinality spread column, so one hot key's rows
    * land on `saltBuckets` reducers instead of one; stage 2 sums the partial
    * counts per key (tiny — at most saltBuckets rows per key). Results are
    * IDENTICAL to [[countByKey]] (count is decomposable), so the same oracle
    * verifies both. Prefer AQE's runtime skew handling by default; this is
    * the explicit plan-level tool for when the skew is known ahead of time
    * (e.g. a null-heavy or celebrity key at 100 TB). */
  def countByKeySalted(df: DataFrame, keys: Seq[String], spreadCol: String,
                       saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt", pmod(hash(col(spreadCol)), lit(saltBuckets)))
    val partial = salted.groupBy((keys :+ "_salt").map(col): _*)
      .agg(count(lit(1)).as("_partial"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum("_partial").as("count"))
  }
}
