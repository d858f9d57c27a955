package graft.streaming

import java.nio.file.{Files, Paths}
import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The streamed politeness scheduler: per-host offsets continue across
  * batches at each host's own crawl delay (durable state, no restart at
  * zero), incremental scheduling equals one batch pass over the
  * arrival-ordered union, and restarts resume from the stored state. */
class CrawlScheduleSpec extends SparkSpec {

  test("two hosts at different delays pace independently ACROSS batches; restart resumes") {
    val sparkSession = spark
    import sparkSession.implicits._
    val dropDir = Files.createTempDirectory("graft_front_in").toString
    val stateDir = Files.createTempDirectory("graft_front_st").toString
    val outDir = Files.createTempDirectory("graft_front_out").toString
    val ckpt = Files.createTempDirectory("graft_front_ck").toString
    val delays = Seq(("slow.org", 3.0d), ("fast.org", 1.0d))
      .toDF("domain", "crawl_delay")
    def run(): Unit = {
      val q = CrawlSchedule.attach(spark, dropDir,
        CrawlSchedule.stateStore(spark, stateDir),
        new graft.store.ParquetStore(spark, CrawlSchedule.OutSchema,
          outDir, "sched_out"),
        delays, ckpt, trigger = Trigger.AvailableNow())
      q.awaitTermination()
    }
    Files.write(Paths.get(dropDir, "f1.txt"),
      ("https://slow.org/a\nhttps://slow.org/b\n" +
        "https://fast.org/a\n").getBytes("UTF-8"))
    run()
    // Batch 2 arrives later: each host must CONTINUE, not restart.
    Files.write(Paths.get(dropDir, "f2.txt"),
      ("https://slow.org/c\nhttps://fast.org/b\n" +
        "https://new.org/x\n").getBytes("UTF-8"))
    run()
    val out = new graft.store.ParquetStore(spark, CrawlSchedule.OutSchema,
      outDir, "sched_out_read")
    val rows = out.selectAll.collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(rows("https://slow.org/a") === ((0L, 0.0)))
    assert(rows("https://slow.org/b") === ((1L, 3.0)))
    assert(rows("https://slow.org/c") === ((2L, 6.0))) // continued, 3 s pace
    assert(rows("https://fast.org/a") === ((0L, 0.0)))
    assert(rows("https://fast.org/b") === ((1L, 1.0))) // continued, 1 s pace
    // A host with no robots delay paces at the default (1 s) from 0.
    assert(rows("https://new.org/x") === ((0L, 0.0)))

    // Restart on the same checkpoint: old files are consumed; a third
    // batch keeps continuing from the DURABLE state.
    Files.write(Paths.get(dropDir, "f3.txt"),
      "https://slow.org/d\n".getBytes("UTF-8"))
    run()
    val after = out.selectAll.filter(col("url") === "https://slow.org/d")
      .select("fetch_seq", "start_offset_s").head()
    assert((after.getLong(0), after.getDouble(1)) === ((3L, 9.0)))
  }

  test("a replayed batch id recomputes the SAME schedule and never double-advances") {
    val sparkSession = spark
    import sparkSession.implicits._
    val tmp = Files.createTempDirectory("graft_sched_rp").toString
    val store = CrawlSchedule.stateStore(spark, tmp,
      s"sched_rp_${System.nanoTime()}")
    val b0 = Seq((0L, "h.org", 2.0d), (1L, "h.org", 2.0d))
      .toDF("id", "url_domain", "crawl_delay")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "fetch_seq", "start_offset_s").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val first = rows(CrawlSchedule.scheduleBatch(store, b0,
      order = col("id"), batchId = 0L))
    // The crashed-attempt replay: the state store ALREADY holds batch
    // 0's delta, yet the same batch id must see the pre-batch view —
    // identical output, no second advance (review r12: foreachBatch is
    // at-least-once; without the guard the replay scheduled at offsets
    // continuing past its own phantom attempt).
    val replay = rows(CrawlSchedule.scheduleBatch(store, b0,
      order = col("id"), batchId = 0L))
    assert(replay === first)
    assert(first === Set((0L, 0L, 0.0), (1L, 1L, 2.0)))
    // The NEXT batch continues from the single advance.
    val next = rows(CrawlSchedule.scheduleBatch(store,
      Seq((2L, "h.org", 2.0d)).toDF("id", "url_domain", "crawl_delay"),
      order = col("id"), batchId = 1L))
    assert(next === Set((2L, 2L, 4.0)))
  }

  test("incremental scheduling == one batch politenessSchedule over the arrival-ordered union") {
    val sparkSession = spark
    import sparkSession.implicits._
    val b1 = Seq((0L, "a.org", 2.0d), (1L, "b.org", 5.0d), (2L, "a.org", 2.0d))
      .toDF("id", "url_domain", "crawl_delay")
    val b2 = Seq((3L, "a.org", 2.0d), (4L, "b.org", 5.0d))
      .toDF("id", "url_domain", "crawl_delay")
    val tmp = Files.createTempDirectory("graft_sched_eq").toString
    val store = CrawlSchedule.stateStore(spark, tmp,
      s"sched_eq_${System.nanoTime()}")
    val inc = CrawlSchedule.scheduleBatch(store, b1, order = col("id"))
      .union(CrawlSchedule.scheduleBatch(store, b2, order = col("id")))
      .select("id", "fetch_seq", "start_offset_s")
    val batch = graft.operators.Url.politenessSchedule(b1.union(b2),
        "url_domain", "crawl_delay", col("id"))
      .select("id", "fetch_seq", "start_offset_s")
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(asSet(inc) === asSet(batch))
    assert(asSet(inc).nonEmpty)
  }
}
