package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec
import graft.config.BucketType

/** ScalaCheck-generated bucketing properties (the SURVEY.md §5 plan): for
  * every epoch second ts >= 0 and every interval dividing 86400 —
  *
  *   start <= ts < end,  end − start = interval,  start % interval = 0
  *
  * across ALL wire branches (integral epoch string, fractional epoch string,
  * strict-ISO string, native timestamp), which must also agree with each
  * other and with the streaming `window()` variant.
  *
  * Domain note: negative epochs are deliberately excluded — the reference's
  * `long()` truncation (mirrored in [[Bucketize.toEpochSeconds]]) only
  * satisfies containment for ts >= 0, the domain of its epoch wire format.
  * Fractional micros stay <= 999999: at ts ~ 2^32 a double's ulp is ~1e-6 s,
  * so .999999 parses strictly below the next second and truncation is exact.
  */
class BucketizePropsSpec extends SparkSpec {

  /** Every divisor-of-86400 interval the config contract allows, from 1 s to
    * a full day (README.md:44 day-divisibility rule). */
  private val Intervals =
    Seq(1L, 2L, 5L, 10L, 20L, 60L, 300L, 900L, 3600L, 14400L, 43200L, 86400L)

  /** Deterministic ScalaCheck samples: (epoch second in [0, 2100), micros). */
  private def samples(n: Int, seed: Long): List[(Long, Int)] =
    Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 4102444800L), Gen.chooseNum(0, 999999)))
      .apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("scalacheck sampling failed"))

  private lazy val df = {
    val sparkSession = spark
    import sparkSession.implicits._
    val iso = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
      .withZone(java.time.ZoneOffset.UTC)
    samples(400, seed = 42L).map { case (ts, us) =>
      (ts, s"$ts", f"$ts.$us%06d",
        iso.format(java.time.Instant.ofEpochSecond(ts, us * 1000L)))
    }.toDF("ts", "epoch_str", "epoch_frac_str", "iso_str")
      .withColumn("t", timestamp_seconds(col("ts")))
  }

  test("∀ ts ≥ 0, interval | 86400: containment, width, alignment; branches agree") {
    Intervals.foreach { iv =>
      def startOf(c: org.apache.spark.sql.Column, bt: BucketType) =
        Bucketize.bucketStart(Bucketize.toEpochSeconds(c, bt), iv)
      val checked = df.select(
        col("ts"),
        startOf(col("epoch_str"), BucketType.Epoch).as("s_epoch"),
        startOf(col("epoch_frac_str"), BucketType.Epoch).as("s_frac"),
        startOf(col("iso_str"), BucketType.Iso).as("s_iso"),
        startOf(col("t"), BucketType.Timestamp).as("s_ts"))
      val bad = checked.filter(
        col("s_epoch") =!= col("s_frac") || col("s_epoch") =!= col("s_iso") ||
          col("s_epoch") =!= col("s_ts") ||
          col("s_epoch") % iv =!= 0 ||
          col("s_epoch") > col("ts") || col("ts") >= col("s_epoch") + iv)
      assert(bad.count() === 0L, s"violations at interval=$iv")
    }
  }

  test("window() streaming variant produces identical buckets") {
    Seq(20L, 3600L, 86400L).foreach { iv =>
      val viaExpr = Bucketize.bucketize(df, "t", iv, BucketType.Timestamp)
        .select("ts", "bucket_start", "bucket_end")
      val viaWindow = Bucketize.bucketizeWindow(df, "t", iv)
        .select(col("ts"), col("bucket_start").as("w_start"), col("bucket_end").as("w_end"))
      val bad = viaExpr.join(viaWindow, "ts")
        .filter(col("bucket_start") =!= col("w_start") ||
          col("bucket_end") =!= col("w_end"))
      assert(bad.count() === 0L, s"window mismatch at interval=$iv")
    }
  }
}
