package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Sessionize

/** flatMapGroupsWithState sessionization: gap-break emission inside a batch,
  * watermark-timeout emission across batches, out-of-order merge within the
  * lateness tolerance, and agreement with the batch operator on in-order
  * feeds. */
class StatefulSessionsSpec extends SparkSpec {

  // Off the epoch origin: an event AT the initial watermark (0) is dropped
  // as late by the stateful operator's boundary predicate.
  private val Base = 100000L
  private def ts(sec: Long) = new Timestamp((Base + sec) * 1000L)
  private def us(sec: Long) = (Base + sec) * 1000000L

  /** Run the sessionizer over a MemoryStream, feeding each batch and
    * processing it, then return the memory-sink rows. `tws = true` drives
    * the transformWithState variant (RocksDB state store). */
  private def run(batches: Seq[Seq[(Long, Long, Timestamp)]], gap: Long,
                  lateness: String, sink: String,
                  tws: Boolean = false): Set[(Long, Long, Long, Long)] = {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val oldProvider = spark.conf.getOption(providerKey)
    if (tws) spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[(Long, Long, Timestamp)]
      val src = stream.toDF().toDF("user_id", "event_id", "ts")
      val sessions =
        if (tws) StatefulSessions.sessionsTws(src, gap, lateness)
        else StatefulSessions.sessions(src, gap, lateness)
      val query = sessions.writeStream.format("memory")
        .queryName(sink).outputMode("append").start()
      try {
        for (b <- batches) { stream.addData(b); query.processAllAvailable() }
      } finally query.stop()
    } finally {
      oldProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => spark.conf.unset(providerKey)
      }
    }
    spark.table(sink)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
  }

  test("a gap-exceeding event closes the open session in that micro-batch") {
    val got = run(Seq(
      Seq((1L, 1L, ts(0)), (1L, 2L, ts(10))),
      Seq((1L, 3L, ts(100))) // 90 s gap > 30 s → closes [0,10]
    ), gap = 30L, lateness = "5 seconds", sink = "ss_gap")
    assert(got === Set((1L, us(0), us(10), 2L)))
  }

  test("the watermark passing last+gap closes an idle session (timeout path)") {
    val got = run(Seq(
      Seq((1L, 1L, ts(0)), (1L, 2L, ts(10))),
      // Another user's far-future event advances the watermark (batch max
      // event time − lateness) beyond 10 s + 30 s gap → user 1 times out.
      Seq((2L, 3L, ts(1000))),
      Seq((2L, 4L, ts(2000)))
    ), gap = 30L, lateness = "5 seconds", sink = "ss_timeout")
    assert(got.contains((1L, us(0), us(10), 2L)))
  }

  test("an out-of-order event within lateness merges into the open session") {
    val got = run(Seq(
      Seq((1L, 1L, ts(20)), (1L, 2L, ts(30))),
      Seq((1L, 3L, ts(25))), // arrives late but within tolerance → merges
      Seq((2L, 4L, ts(1000))),
      Seq((2L, 5L, ts(2000)))
    ), gap = 30L, lateness = "60 seconds", sink = "ss_ooo")
    assert(got.contains((1L, us(20), us(30), 3L)))
  }

  test("transformWithState variant: gap close and timer close both emit") {
    val gapClosed = run(Seq(
      Seq((1L, 1L, ts(0)), (1L, 2L, ts(10))),
      Seq((1L, 3L, ts(100)))
    ), gap = 30L, lateness = "5 seconds", sink = "tws_gap", tws = true)
    assert(gapClosed === Set((1L, us(0), us(10), 2L)))

    val timedOut = run(Seq(
      Seq((1L, 1L, ts(0)), (1L, 2L, ts(10))),
      Seq((2L, 3L, ts(1000))),
      Seq((2L, 4L, ts(2000)))
    ), gap = 30L, lateness = "5 seconds", sink = "tws_timeout", tws = true)
    assert(timedOut.contains((1L, us(0), us(10), 2L)))
  }

  test("session state survives a checkpointed restart") {
    val sparkSession = spark
    import sparkSession.implicits._
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._

    val src = java.nio.file.Files.createTempDirectory("graft_ss_src").toString
    val ck = java.nio.file.Files.createTempDirectory("graft_ss_ck").toString
    val out = java.nio.file.Files.createTempDirectory("graft_ss_out").toString
    def writeWave(rows: Seq[(Long, Long, Timestamp)]): Unit =
      rows.toDF("user_id", "event_id", "ts")
        .coalesce(1).write.mode("append").parquet(src)
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(StructType(Seq(
          StructField("user_id", LongType), StructField("event_id", LongType),
          StructField("ts", TimestampType)))).parquet(src)
      // File sink, not memory: the memory sink refuses checkpoint recovery.
      val q = StatefulSessions.sessions(stream, gapSeconds = 30L,
          lateness = "5 seconds")
        .writeStream.format("parquet").option("path", out)
        .outputMode("append").option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    writeWave(Seq((1L, 1L, ts(0)), (1L, 2L, ts(10)))) // open session
    runOnce()                                         // state checkpointed
    writeWave(Seq((1L, 3L, ts(100))))                 // gap > 30 s
    runOnce()                                         // restart, same ck

    // The session opened BEFORE the restart closes AFTER it — the state
    // store carried (start, last, n) across process boundaries.
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got.contains((1L, us(0), us(10), 2L)))
  }

  test("closed sessions append to the serving store, one generation per closing batch") {
    val sparkSession = spark
    import sparkSession.implicits._
    import org.apache.spark.sql.types._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val store = new graft.store.RecentStore(spark, StructType(Seq(
      StructField("user_id", LongType), StructField("session_start_us", LongType),
      StructField("session_end_us", LongType), StructField("n_events", LongType))),
      tableName = "sess_store", cleanFreq = 1000L)
    val stream = MemoryStream[(Long, Long, Timestamp)]
    val query = StatefulSessions.attachToStore(
      stream.toDF().toDF("user_id", "event_id", "ts"),
      gapSeconds = 30L, store, lateness = "5 seconds",
      trigger = Some(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L)))
    try {
      stream.addData(Seq((1L, 1L, ts(0)), (1L, 2L, ts(10))))
      query.processAllAvailable() // nothing closed yet → NO generation burned
      assert(store.selectAll.count() === 0L)
      stream.addData(Seq((1L, 3L, ts(100)))) // closes [0,10]
      query.processAllAvailable()
      stream.addData(Seq((2L, 4L, ts(10000))))
      stream.addData(Seq((2L, 5L, ts(20000)))) // times out user 1's [100,100]
      query.processAllAvailable()
    } finally query.stop()

    val rows = store.selectAll
      .select("user_id", "session_start_us", "session_end_us", "n_events", "rst_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(rows.contains((1L, us(0), us(10), 2L, 1L)))   // gap close → gen 1
    assert(rows.exists(r => r._1 == 1L && r._2 == us(100) && r._5 > 1L))
  }

  test("state-store recovery: an open session survives a restart and closes correctly") {
    // The sharpest §2.7 recovery claim: sessions OPEN at the moment of a
    // crash live only in the state store, so a restart from checkpoint must
    // resume them — user 1's session closes via the gap-break DATA path
    // after restart, user 2's via the watermark TIMEOUT path — and the
    // total emission set must equal an uninterrupted run's, each session
    // exactly once.
    val sparkSession = spark
    import sparkSession.implicits._
    import java.nio.file.Files

    val srcDir = Files.createTempDirectory("graft_sess_src")
    val srcSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType)))
    var fileSeq = 0
    def stage(rows: (Long, Long, Timestamp)*): Unit = {
      val tmp = Files.createTempDirectory("graft_sess_stage")
      rows.toSeq.toDF("user_id", "event_id", "ts").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = {
        val s = Files.list(tmp)
        try s.toArray.map(_.asInstanceOf[java.nio.file.Path])
          .find(_.getFileName.toString.endsWith(".parquet")).get
        finally s.close()
      }
      val dest = srcDir.resolve(f"f$fileSeq%03d.parquet")
      Files.move(part, dest)
      Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + fileSeq * 60000L))
      fileSeq += 1
    }
    def runAvailable(checkpoint: String,
                     buf: collection.mutable.Buffer[(Long, Long, Long, Long)]): Unit = {
      val stream = spark.readStream.schema(srcSchema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
      val q = StatefulSessions.sessions(stream, gapSeconds = 3600L,
          lateness = "10 seconds")
        .toDF().writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          buf.synchronized { buf ++= b.collect().map(r =>
            (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))) }
          ()
        }.start()
      q.awaitTermination()
    }

    val cp = Files.createTempDirectory("graft_sess_ckpt").toString
    val emitted = collection.mutable.Buffer.empty[(Long, Long, Long, Long)]
    // Phase 1: sessions OPEN at crash time — u1 [1000..5000] n=3,
    // u2 [1500] n=1; nothing can have closed yet.
    stage((1L, 1L, ts(1000)), (1L, 2L, ts(2000)), (2L, 3L, ts(1500)))
    stage((1L, 4L, ts(5000)))
    runAvailable(cp, emitted)
    assert(emitted.isEmpty, "no session may close before the crash point")

    // Phase 2: restart from checkpoint; new data far past both sessions'
    // horizons. u1's event gap-breaks its RESUMED session; u2 times out.
    stage((1L, 5L, ts(20000)), (3L, 6L, ts(20001)))
    stage((3L, 7L, ts(20500)))
    runAvailable(cp, emitted)
    val got = emitted.toSet
    assert(got === Set(
      (1L, us(1000), us(5000), 3L),
      (2L, us(1500), us(1500), 1L)), s"recovered emissions: $got")
    assert(emitted.size === 2, "each closed session must emit exactly once")

    // Uninterrupted control over the same four files: identical emissions.
    val cp2 = Files.createTempDirectory("graft_sess_ckpt2").toString
    val control = collection.mutable.Buffer.empty[(Long, Long, Long, Long)]
    runAvailable(cp2, control)
    assert(control.toSet === got)
    assert(control.size === 2)
  }

  test("in-order multi-batch feed equals the batch sessionize result") {
    val sparkSession = spark
    import sparkSession.implicits._
    val rnd = new scala.util.Random(31)
    // 4 users, event times strictly increasing across the whole feed so no
    // event is late; random inter-event gaps straddle the 30 s threshold.
    var t = 0L
    val all = (1 to 120).map { i =>
      t += rnd.nextInt(50).toLong + 1L
      ((i % 4).toLong + 1L, i.toLong, ts(t))
    }
    val got = run(
      all.grouped(40).toSeq :+ Seq((99L, 999L, ts(t + 100000L))),
      gap = 30L, lateness = "1 second", sink = "ss_agree")

    val batch = Sessionize.sessionize(
        all.toDF("user_id", "event_id", "ts"), gapSeconds = 30L)
      .select(col("user_id"), col("session_start_us"),
        col("session_end_us"), col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // Every real user's session is closed by the sentinel's watermark push.
    assert(got.filter(_._1 <= 4L) === batch)
  }
}
