package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Stream-stream window join: in-window matches emit, out-of-window rows
  * don't, and the left-outer variant null-pads an unmatched left row once
  * the watermark proves no match can arrive. */
class StreamJoinsSpec extends SparkSpec {

  private val Base = 100000L
  private def ts(sec: Long) = new Timestamp((Base + sec) * 1000L)

  private def run(joinType: String, sink: String,
                  clicks: Seq[Seq[(Long, Long, Timestamp)]],
                  buys: Seq[Seq[(Long, Long, Timestamp)]]): Seq[(Long, Long, Any)] = {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val cs = MemoryStream[(Long, Long, Timestamp)]
    val bs = MemoryStream[(Long, Long, Timestamp)]
    val joined = StreamJoins.windowJoin(
      cs.toDF().toDF("user_id", "click_id", "cts"),
      bs.toDF().toDF("user_id", "buy_id", "bts"),
      Seq("user_id"), "cts", "bts", windowSeconds = 3600L,
      lateness = "5 seconds", joinType = joinType)
    val query = joined.selectExpr("user_id", "click_id", "buy_id")
      .writeStream.format("memory").queryName(sink).outputMode("append").start()
    try {
      for ((cb, bb) <- clicks.zipAll(buys, Nil, Nil)) {
        if (cb.nonEmpty) cs.addData(cb)
        if (bb.nonEmpty) bs.addData(bb)
        query.processAllAvailable()
      }
    } finally query.stop()
    spark.table(sink).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.get(2))).toSeq
  }

  test("inner join matches only purchases inside [click, click+window]") {
    val got = run("inner", "sj_inner",
      clicks = Seq(Seq((1L, 10L, ts(0)), (2L, 11L, ts(0)))),
      buys = Seq(Seq(
        (1L, 20L, ts(600)),   // in window → match
        (1L, 21L, ts(4000)),  // past click+3600 → no match
        (3L, 22L, ts(600))))) // no such click
    assert(got.toSet === Set((1L, 10L, 20L)))
  }

  test("left-outer pads an unmatched click after the watermark passes") {
    // The query watermark is the MIN across both streams, so BOTH sides
    // need far-future events before the unmatched click can be declared
    // match-less and padded.
    val got = run("left_outer", "sj_outer",
      clicks = Seq(
        Seq((1L, 10L, ts(0)), (2L, 11L, ts(10))),
        Seq((9L, 97L, ts(20000))),
        Seq((9L, 96L, ts(40000)))),
      buys = Seq(
        Seq((1L, 20L, ts(30))),
        Seq((8L, 98L, ts(20000))),
        Seq((8L, 99L, ts(40000)))))
    val early = got.filter(_._1 <= 2L)
    val matched = early.filter(_._3 != null).toSet
    val padded = early.filter(_._3 == null).map(r => (r._1, r._2)).toSet
    assert(matched === Set((1L, 10L, 20L)))
    assert(padded === Set((2L, 11L)))
  }

  test("join state survives a checkpointed restart; crash == clean run") {
    // The symmetric-state recovery claim: a left row buffered in the join
    // state store at the moment the process dies must still match a right
    // row that arrives only AFTER the restart — and the interrupted run
    // must produce exactly the rows an uninterrupted run does.
    val sparkSession = spark
    import sparkSession.implicits._
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._

    def tmp(tag: String) =
      java.nio.file.Files.createTempDirectory(s"graft_sjr_$tag").toString
    val (clickSrc, buySrc) = (tmp("c"), tmp("b"))
    def write(dir: String, cols: (String, String, String),
              rows: Seq[(Long, Long, Timestamp)]): Unit =
      rows.toDF(cols._1, cols._2, cols._3)
        .coalesce(1).write.mode("append").parquet(dir)
    def schema(id: String, t: String) = StructType(Seq(
      StructField("user_id", LongType), StructField(id, LongType),
      StructField(t, TimestampType)))
    def runOnce(ck: String, out: String): Unit = {
      val clicks = spark.readStream.schema(schema("click_id", "cts")).parquet(clickSrc)
      val buys = spark.readStream.schema(schema("buy_id", "bts")).parquet(buySrc)
      val q = StreamJoins.windowJoin(clicks, buys, Seq("user_id"),
          "cts", "bts", windowSeconds = 3600L, lateness = "5 seconds")
        .selectExpr("user_id", "click_id", "buy_id")
        // File sink: the memory sink refuses checkpoint recovery.
        .writeStream.format("parquet").option("path", out)
        .outputMode("append").option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    val (ck1, out1) = (tmp("ck1"), tmp("out1"))
    write(clickSrc, ("user_id", "click_id", "cts"),
      Seq((1L, 10L, ts(0)), (2L, 11L, ts(5))))
    runOnce(ck1, out1)                       // clicks buffered, no matches yet
    assert(spark.read.schema(schema("click_id", "buy_id")) // out empty so far
      .parquet(out1).count() === 0L)
    write(buySrc, ("user_id", "buy_id", "bts"),
      Seq((1L, 20L, ts(600)),                // in u1's window → must match
        (2L, 21L, ts(4000))))                // past u2's window → must not
    runOnce(ck1, out1)                       // restart from checkpoint

    val interrupted = spark.read.parquet(out1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(interrupted === Set((1L, 10L, 20L)),
      "pre-restart click did not match a post-restart buy")

    // Clean run over the SAME source dirs (both waves already on disk).
    val (ck2, out2) = (tmp("ck2"), tmp("out2"))
    runOnce(ck2, out2)
    val clean = spark.read.parquet(out2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(clean === interrupted, "interrupted run diverged from clean run")
  }
}
