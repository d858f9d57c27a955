package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Planted-session cases: gap strictly-greater boundary, per-user counter
  * restart, and single-event sessions — plus a randomized check against an
  * in-memory reference implementation. */
class SessionizeSpec extends SparkSpec {

  test("random event sets match an in-memory reference sessionizer") {
    val sparkSession = spark
    import sparkSession.implicits._
    val rnd = new scala.util.Random(42)
    val gap = 100L
    // 300 events, 7 users, timestamps clustered so both splits and
    // continuations occur (steps are mostly < gap with occasional jumps).
    val events = (0 until 300).map { i =>
      val user = rnd.nextInt(7).toLong
      val us = (i * 40L + rnd.nextInt(8000)) * 1000000L
      (user, i.toLong, us)
    }
    val df = events.toDF("user_id", "event_id", "us")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val got = Sessionize.sessionize(df, gapSeconds = gap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // Reference: per user, sort by (us, id), split on gap > 100 s.
    val expected = events.groupBy(_._1).flatMap { case (user, evs) =>
      val sorted = evs.map(e => (e._3, e._2)).sortBy(identity)
      val sessions = sorted.foldLeft(List.empty[List[(Long, Long)]]) {
        case (acc, e @ (us, _)) => acc match {
          case (cur @ ((prevUs, _) :: _)) :: rest if us - prevUs <= gap * 1000000L =>
            (e :: cur) :: rest
          case _ => List(e) :: acc
        }
      }.reverse
      sessions.zipWithIndex.map { case (ses, i) =>
        val uss = ses.map(_._1)
        (user, (i + 1).toLong) -> ((uss.min, uss.max, ses.size.toLong))
      }
    }
    assert(got === expected)
  }

  test("gap threshold splits sessions; boundary gap does NOT (strict >)") {
    val sparkSession = spark
    import sparkSession.implicits._
    // User 1: events at 0 s, 30 s (same session), 90 s (gap EXACTLY 60 s —
    // still same session, predicate is strict >), then +60 s +1 µs (new).
    // User 2: one lone event → one 1-event session.
    val gap = 60L
    val sessEndUs = 90L * 1000000
    val newStartUs = sessEndUs + gap * 1000000 + 1
    // µs precision matters: build the frame via timestamp_micros (not
    // java.sql.Timestamp, which is millis) so the +1 µs case survives.
    val df = Seq(
      (1L, 10L, 0L),
      (1L, 11L, 30L * 1000000),
      (1L, 12L, sessEndUs),
      (1L, 13L, newStartUs),
      (2L, 20L, 5L * 1000000)
    ).toDF("user_id", "event_id", "us")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")

    val got = Sessionize.sessionize(df, gapSeconds = gap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got === Set(
      (1L, 1L, 0L, sessEndUs, 3L),                 // events 10-12
      (1L, 2L, newStartUs, newStartUs, 1L),        // event 13
      (2L, 1L, 5L * 1000000, 5L * 1000000, 1L)))   // lone event
  }
}
