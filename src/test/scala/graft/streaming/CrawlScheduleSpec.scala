package graft.streaming

import java.nio.file.{Files, Paths}
import graft.SparkSpec
import graft.store.ParquetStore
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

  test("collapse-managed state == full-history state across many batches; generations stay bounded") {
    val sparkSession = spark
    import sparkSession.implicits._
    def batch(b: Long) = Seq(
      (b * 10, "a.org", 2.0d), (b * 10 + 1, "b.org", 5.0d),
      (b * 10 + 2, "a.org", 2.0d))
      .toDF("id", "url_domain", "crawl_delay")
    def runAll(collapseEvery: Long) = {
      val tmp = Files.createTempDirectory("graft_sched_cl").toString
      val store = CrawlSchedule.stateStore(spark, tmp,
        s"sched_cl_${System.nanoTime()}", collapseEvery = collapseEvery)
      val outs = (0L until 8L).map { b =>
        // appendStreaming path (the collapse hook) is what attach uses;
        // scheduleBatch itself calls it — batchId stamps each delta.
        CrawlSchedule.scheduleBatch(store, batch(b), order = col("id"),
          batchId = b).select("id", "fetch_seq", "start_offset_s")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      }
      (outs.flatten.toSet, store.generations.length)
    }
    val (collapsed, gensCollapsed) = runAll(collapseEvery = 2L)
    val (full, gensFull) = runAll(collapseEvery = 0L)
    // The re-snapshot is read-equivalent: every batch's schedule is
    // identical to the full-history run's (r12 verdict #1 Done
    // criterion) …
    assert(collapsed === full)
    // … and equal to ONE politenessSchedule pass over the union.
    val union = (0L until 8L).map(batch).reduce(_ union _)
    val oracle = graft.operators.Url.politenessSchedule(union,
        "url_domain", "crawl_delay", col("id"))
      .select("id", "fetch_seq", "start_offset_s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(collapsed === oracle)
    // Bounded vs unbounded on-disk history: the collapse-managed store
    // holds base + ≤ collapseEvery deltas; the full-history one holds
    // one generation per batch.
    assert(gensCollapsed <= 3, s"collapse left $gensCollapsed generations")
    assert(gensFull === 8)
  }

  test("replay guard survives a collapse AND a foreign append after the crashed delta") {
    val sparkSession = spark
    import sparkSession.implicits._
    val tmp = Files.createTempDirectory("graft_sched_rc").toString
    val store = CrawlSchedule.stateStore(spark, tmp,
      s"sched_rc_${System.nanoTime()}", collapseEvery = 0L)
    def b(ids: Seq[Long]) =
      ids.map(i => (i, "h.org", 2.0d)).toDF("id", "url_domain", "crawl_delay")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "fetch_seq", "start_offset_s").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val r0 = rows(CrawlSchedule.scheduleBatch(store, b(Seq(0L, 1L)),
      order = col("id"), batchId = 0L))
    val r1 = rows(CrawlSchedule.scheduleBatch(store, b(Seq(2L)),
      order = col("id"), batchId = 1L))
    // Batch 2 "crashes" after its state advance …
    val r2 = rows(CrawlSchedule.scheduleBatch(store, b(Seq(3L)),
      order = col("id"), batchId = 2L))
    // … then a FOREIGN append lands after the crashed delta (an ad-hoc
    // call touching another host — advice r12: a newest-generation-only
    // probe misses the crashed delta from here on) …
    CrawlSchedule.scheduleBatch(store,
      Seq((9L, "other.org", 1.0d)).toDF("id", "url_domain", "crawl_delay"),
      order = col("id"))
    // … and a re-snapshot folds the older deltas (keepRecent keeps the
    // newest; scope/batch_id survive on every collapsed row).
    store.collapseToLatest(Seq("domain"))
    // The replay of batch 2 must still (a) detect it was applied — no
    // double-advance — and (b) reconstruct the PRE-batch-2 view.
    val replay = rows(CrawlSchedule.scheduleBatch(store, b(Seq(3L)),
      order = col("id"), batchId = 2L))
    assert(replay === r2)
    assert(r0 === Set((0L, 0L, 0.0), (1L, 1L, 2.0)))
    assert(r1 === Set((2L, 2L, 4.0)))
    assert(r2 === Set((3L, 3L, 6.0)))
    // The NEXT batch continues from the single advance.
    val next = rows(CrawlSchedule.scheduleBatch(store, b(Seq(4L)),
      order = col("id"), batchId = 3L))
    assert(next === Set((4L, 4L, 8.0)))
  }

  test("attachRobots: a robots re-fetch changes the host's pacing on the NEXT batch") {
    val sparkSession = spark
    import sparkSession.implicits._
    val dropDir = Files.createTempDirectory("graft_rb_in").toString
    val stateDir = Files.createTempDirectory("graft_rb_st").toString
    val robotsDir = Files.createTempDirectory("graft_rb_rb").toString
    val outDir = Files.createTempDirectory("graft_rb_out").toString
    val ckpt = Files.createTempDirectory("graft_rb_ck").toString
    val robots = CrawlSchedule.robotsStore(spark, robotsDir,
      s"rb_${System.nanoTime()}")
    // The policy comes from a FETCHED robots.txt, parsed — not a
    // caller table.
    robots.append(CrawlSchedule.robotsPolicies(
      Seq(("https://paced.org/robots.txt",
        "User-agent: *\nDisallow: /private/\nCrawl-delay: 2\n"))
        .toDF("url", "text"),
      "graftbot"))
    def run(): Unit =
      CrawlSchedule.attachRobots(spark, dropDir,
        CrawlSchedule.stateStore(spark, stateDir),
        new graft.store.ParquetStore(spark, CrawlSchedule.OutSchema,
          outDir, "rb_out"),
        robots, ckpt, agent = "graftbot",
        trigger = Trigger.AvailableNow())
        .awaitTermination()
    // The /private/ URL is DISALLOWED by the stored policy: gated out
    // before scheduling, it must neither land in the out store nor
    // consume a politeness slot (b follows a at offset 2, not 4).
    Files.write(Paths.get(dropDir, "f1.txt"),
      ("https://paced.org/a\nhttps://paced.org/private/x\n" +
        "https://paced.org/b\n").getBytes("UTF-8"))
    run()
    // Mid-crawl policy update: a robots re-fetch lands a NEW
    // generation (2 s → 10 s) …
    robots.append(CrawlSchedule.robotsPolicies(
      Seq(("https://paced.org/robots.txt",
        "User-agent: *\nDisallow: /private/\nCrawl-delay: 10\n"))
        .toDF("url", "text"),
      "graftbot"))
    Files.write(Paths.get(dropDir, "f2.txt"),
      "https://paced.org/c\nhttps://paced.org/d\n".getBytes("UTF-8"))
    run()
    val rows = new graft.store.ParquetStore(spark, CrawlSchedule.OutSchema,
      outDir, "rb_out_read").selectAll.collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(!rows.contains("https://paced.org/private/x"),
      "disallowed URL must be gated out of the schedule")
    // Batch 1 paced at 2 s; batch 2 CONTINUES from the stored offset
    // (2 + 2 = 4) but spaces at the UPDATED 10 s.
    assert(rows("https://paced.org/a") === ((0L, 0.0)))
    assert(rows("https://paced.org/b") === ((1L, 2.0)))
    assert(rows("https://paced.org/c") === ((2L, 4.0)))
    assert(rows("https://paced.org/d") === ((3L, 14.0)))
    assert(rows.size === 4)
  }

  test("replay restores the RECORDED pre-state even when the robots delay changed in between") {
    val sparkSession = spark
    import sparkSession.implicits._
    val tmp = Files.createTempDirectory("graft_sched_rd").toString
    val store = CrawlSchedule.stateStore(spark, tmp,
      s"sched_rd_${System.nanoTime()}")
    def b(delay: Double) = Seq((0L, "h.org", delay), (1L, "h.org", delay))
      .toDF("id", "url_domain", "crawl_delay")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "fetch_seq", "start_offset_s").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val first = rows(CrawlSchedule.scheduleBatch(store, b(2.0d),
      order = col("id"), batchId = 0L))
    assert(first === Set((0L, 0L, 0.0), (1L, 1L, 2.0)))
    // The crashed batch advanced the state (next_offset 4 at delay 2);
    // before the replay, a robots re-fetch changes the host's delay to
    // 10 — attachRobots re-joins the delay table every trigger, so the
    // REPLAYED input carries the NEW delay. The pre-state must come
    // from the delta's RECORDED prev columns (0, 0.0): an arithmetic
    // subtraction using the replay-time delay would restore
    // 4 − 2·10 = −16 and emit negative offsets (review r13).
    val replay = rows(CrawlSchedule.scheduleBatch(store, b(10.0d),
      order = col("id"), batchId = 0L))
    assert(replay === Set((0L, 0L, 0.0), (1L, 1L, 10.0)))
    // No double-advance; the next batch continues from the single
    // recorded advance.
    val next = rows(CrawlSchedule.scheduleBatch(store,
      Seq((2L, "h.org", 10.0d)).toDF("id", "url_domain", "crawl_delay"),
      order = col("id"), batchId = 1L))
    assert(next === Set((2L, 2L, 4.0)))
  }

  test("gateFrontier: per-HOST robots scope; the match target carries the query string") {
    val sparkSession = spark
    import sparkSession.implicits._
    val tmp = Files.createTempDirectory("graft_gate_h").toString
    val robots = CrawlSchedule.robotsStore(spark, tmp,
      s"gate_h_${System.nanoTime()}")
    robots.append(CrawlSchedule.robotsPolicies(Seq(
      ("https://example.com/robots.txt", "User-agent: *\nDisallow: /\n"),
      ("https://q.org/robots.txt",
        "User-agent: *\nDisallow: /*?sessionid=\nDisallow: /*.pdf$\n"))
      .toDF("url", "text"), "anybot"))
    val urls = Seq(
      // RFC 9309 scope is the AUTHORITY: example.com's deny-all must
      // not gate blog.example.com (its own robots was never fetched →
      // allowed) — review r13: a registrable-domain key folded them.
      ("https://example.com/a", "example.com"),
      ("https://blog.example.com/a", "blog.example.com"),
      // Query strings are part of the match target: the sessionid
      // pattern must FIRE on /p?sessionid=1 …
      ("https://q.org/p?sessionid=1", "q.org"),
      // … and the end-anchored pdf pattern must NOT fire when a query
      // follows the extension (review r13: a path-only target both
      // under- and over-blocked).
      ("https://q.org/a.pdf?x=1", "q.org"),
      ("https://q.org/b.pdf", "q.org"))
      .toDF("url", "url_host")
    val kept = CrawlSchedule.gateFrontier(urls, robots, "anybot")
      .select("url").collect().map(_.getString(0)).toSet
    assert(kept === Set("https://blog.example.com/a",
      "https://q.org/a.pdf?x=1"))
  }

  test("revokedFrontier is the exact complement of gateFrontier under one policy view") {
    val sparkSession = spark
    import sparkSession.implicits._
    val tmp = Files.createTempDirectory("graft_revoke_c").toString
    val robots = CrawlSchedule.robotsStore(spark, tmp,
      s"revoke_c_${System.nanoTime()}")
    robots.append(CrawlSchedule.robotsPolicies(Seq(
      ("https://example.com/robots.txt", "User-agent: *\nDisallow: /\n"),
      ("https://q.org/robots.txt",
        "User-agent: *\nDisallow: /*?sessionid=\nDisallow: /*.pdf$\n"))
      .toDF("url", "text"), "anybot"))
    val urls = Seq(
      ("https://example.com/a", "example.com"),
      ("https://blog.example.com/a", "blog.example.com"), // no robots
      ("https://q.org/p?sessionid=1", "q.org"),
      ("https://q.org/a.pdf?x=1", "q.org"),
      ("https://q.org/b.pdf", "q.org"))
      .toDF("url", "url_host")
    def urlsOf(df: org.apache.spark.sql.DataFrame) =
      df.select("url").collect().map(_.getString(0)).toSet
    val kept = urlsOf(CrawlSchedule.gateFrontier(urls, robots, "anybot"))
    val revoked = urlsOf(CrawlSchedule.revokedFrontier(urls, robots,
      "anybot"))
    assert(kept.intersect(revoked).isEmpty)
    assert(kept.union(revoked) === urlsOf(urls))
    // The revocation set is exactly what the gate drops — including the
    // no-robots host revoking nothing.
    assert(revoked === Set("https://example.com/a",
      "https://q.org/p?sessionid=1", "https://q.org/b.pdf"))
  }

  test("lineageScope: checkpoint query id keys the lineage; recreation = new scope") {
    val ck = Files.createTempDirectory("graft_sched_ls").toString
    // No metadata yet (pre-start / ad-hoc): bare path.
    assert(CrawlSchedule.lineageScope(spark, ck) === ck)
    Files.write(Paths.get(ck, "metadata"),
      """{"id":"11111111-2222-3333-4444-555555555555"}""".getBytes("UTF-8"))
    val s1 = CrawlSchedule.lineageScope(spark, ck)
    assert(s1 === s"$ck@11111111-2222-3333-4444-555555555555")
    // Deleting and recreating the checkpoint mints a NEW query id →
    // a NEW scope, so the fresh run's batch 0 never aliases the old
    // run's batch ids (advice r12: the politeness-violation path).
    Files.write(Paths.get(ck, "metadata"),
      """{"id":"aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee"}""".getBytes("UTF-8"))
    val s2 = CrawlSchedule.lineageScope(spark, ck)
    assert(s2 !== s1)
  }

  test("applied sentinel: replay never double-advances even when an ad-hoc append to the SAME hosts is collapsed over it") {
    val sparkSession = spark
    import sparkSession.implicits._
    val tmp = Files.createTempDirectory("graft_sched_sn").toString
    val store = CrawlSchedule.stateStore(spark, tmp,
      s"sched_sn_${System.nanoTime()}", collapseEvery = 0L)
    def b(ids: Seq[Long]) =
      ids.map(i => (i, "h.org", 2.0d)).toDF("id", "url_domain", "crawl_delay")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "fetch_seq", "start_offset_s").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // Batch 0 applies (h.org → n=2, next=4) and "crashes" before its
    // output write.
    assert(rows(CrawlSchedule.scheduleBatch(store, b(Seq(0L, 1L)),
      order = col("id"), batchId = 0L)) ===
      Set((0L, 0L, 0.0), (1L, 1L, 2.0)))
    // An AD-HOC append advances the SAME host (n=3, next=6) …
    assert(rows(CrawlSchedule.scheduleBatch(store, b(Seq(9L)),
      order = col("id"))) === Set((9L, 2L, 4.0)))
    // … and a collapse folds: h.org's latest row now carries the
    // ad-hoc (scope "", batch −1) stamps — the crashed delta's host-row
    // evidence is GONE (advice r13's exact scenario).
    store.collapseToLatest(Seq("domain"))
    // The replay must still detect batch 0 as applied — the lineage
    // sentinel is latest-per-ITS-OWN-key and survives any fold.
    CrawlSchedule.scheduleBatch(store, b(Seq(0L, 1L)),
      order = col("id"), batchId = 0L).collect()
    // No double-advance: the next batch continues from the SINGLE
    // ad-hoc-advanced state (seq 3 at offset 6), not from a phantom
    // second application of batch 0.
    assert(rows(CrawlSchedule.scheduleBatch(store, b(Seq(5L)),
      order = col("id"), batchId = 1L))
      === Set((5L, 3L, 6.0)))
  }

  test("as-of gate: a robots append between crash and replay leaves the replayed frontier IDENTICAL") {
    val sparkSession = spark
    import sparkSession.implicits._
    val stateDir = Files.createTempDirectory("graft_ao_st").toString
    val robotsDir = Files.createTempDirectory("graft_ao_rb").toString
    val state = CrawlSchedule.stateStore(spark, stateDir,
      s"ao_st_${System.nanoTime()}")
    val robots = CrawlSchedule.robotsStore(spark, robotsDir,
      s"ao_rb_${System.nanoTime()}")
    robots.append(CrawlSchedule.robotsPolicies(
      Seq(("https://h.org/robots.txt",
        "User-agent: *\nDisallow: /private/\nCrawl-delay: 2\n"))
        .toDF("url", "text"), "bot"))
    val urls = graft.operators.Url.withUrlParts(
      Seq("https://h.org/a", "https://h.org/private/x", "https://h.org/b")
        .toDF("url"))
    def sched(batchId: Long): Set[(String, Long, Double)] = {
      val (gated, rst) = CrawlSchedule.gateAndPace(state, robots, urls,
        "bot", 1.0d, batchId = batchId, scope = "s")
      CrawlSchedule.scheduleBatch(state, gated, order = col("url"),
          batchId = batchId, scope = "s", policyRst = rst)
        .select("url", "fetch_seq", "start_offset_s").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    }
    val first = sched(0L)
    assert(first === Set(("https://h.org/a", 0L, 0.0),
      ("https://h.org/b", 1L, 2.0)))
    // Crash before the output write; a robots UPDATE lands in the
    // window (disallow /b, delay 2 → 10) …
    robots.append(CrawlSchedule.robotsPolicies(
      Seq(("https://h.org/robots.txt",
        "User-agent: *\nDisallow: /private/\nDisallow: /b\n" +
          "Crawl-delay: 10\n"))
        .toDF("url", "text"), "bot"))
    // … and the REPLAY re-gates AS OF the recorded stamp: membership
    // AND delays identical, so the out-store keyed dedup absorbs every
    // row (r13 verdict #3 Done criterion).
    assert(sched(0L) === first)
    // A FRESH batch sees the new policy: /b gated out, 10 s pacing
    // continuing from the single recorded advance (next free = 4).
    val next = sched(1L)
    assert(next === Set(("https://h.org/a", 2L, 4.0)))
  }

  test("applied floor: robots appends + collapses INSIDE the crash window leave the replayed frontier identical (r14 #5)") {
    val sparkSession = spark
    import sparkSession.implicits._
    val state = CrawlSchedule.stateStore(spark,
      Files.createTempDirectory("graft_fl_st").toString,
      s"fl_st_${System.nanoTime()}")
    // Adversarial store: collapseEvery = 1 / keepRecent = 1 — every
    // append beyond one generation trips a fold, and WITHOUT the floor
    // the fold target passes the stamp after two appends (the exact
    // residual the r14 verdict documented).
    val robots = new ParquetStore(spark, CrawlSchedule.RobotsSchema,
      Files.createTempDirectory("graft_fl_rb").toString,
      s"fl_rb_${System.nanoTime()}", collapseKeys = Seq("domain"),
      collapseEvery = 1L, collapseKeepRecent = 1)
    def policy(delay: Int, extra: String = "") =
      CrawlSchedule.robotsPolicies(Seq(("https://h.org/robots.txt",
        s"User-agent: *\nDisallow: /private/\nCrawl-delay: $delay\n" +
          extra)).toDF("url", "text"), "bot")
    robots.appendStreaming(policy(2))
    val urls = graft.operators.Url.withUrlParts(
      Seq("https://h.org/a", "https://h.org/private/x", "https://h.org/b")
        .toDF("url"))
    def sched(batchId: Long): Set[(String, Long, Double)] = {
      val (gated, rst) = CrawlSchedule.gateAndPace(state, robots, urls,
        "bot", 1.0d, batchId = batchId, scope = "fl")
      CrawlSchedule.scheduleBatch(state, gated, order = col("url"),
          batchId = batchId, scope = "fl", policyRst = rst)
        .select("url", "fetch_seq", "start_offset_s").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    }
    val first = sched(0L)
    assert(first === Set(("https://h.org/a", 0L, 0.0),
      ("https://h.org/b", 1L, 2.0)))
    assert(robots.appliedFloor === Some(1L))
    // Crash window: FIVE policy updates land, each tripping a collapse
    // — far past the old keepRecent=4 defense. The floor pins the
    // stamped generation: it must survive every fold.
    (3 to 7).foreach(d => robots.appendStreaming(
      policy(d, "Disallow: /b\n")))
    assert(robots.generations.contains(1L),
      "the floored generation must survive every collapse")
    // The replay re-gates as of the stamp: membership AND delays
    // identical — the residual is closed, not just narrowed.
    assert(sched(0L) === first)
    // A FRESH batch advances the floor to the new stamp; the held-back
    // history can then fold (release path: no live stamp below it).
    val next = sched(1L)
    assert(next === Set(("https://h.org/a", 2L, 4.0))) // /b now gated
    assert(robots.appliedFloor === Some(robots.maxRstId.get))
    robots.appendStreaming(policy(9, "Disallow: /b\n"))
    assert(!robots.generations.contains(1L),
      "an advanced floor releases the old generations to the collapse")
  }

  test("robotsPolicies: pace takes the max twin delay; the GATING body prefers https (advice r13)") {
    val sparkSession = spark
    import sparkSession.implicits._
    // http twin: permissive body (no rules) declaring a LARGE delay;
    // https twin: deny-all body declaring NONE. The old single-row fold
    // carried the permissive body because its delay won — permission
    // must not ride on pacing.
    val pol = CrawlSchedule.robotsPolicies(Seq(
      ("http://h.org/robots.txt", "User-agent: *\nCrawl-delay: 9\n"),
      ("https://h.org/robots.txt", "User-agent: *\nDisallow: /\n"))
      .toDF("url", "text"), "bot")
    val row = pol.collect() match { case Array(r) => r }
    assert(row.getString(0) === "h.org")
    assert(row.getDouble(1) === 9.0) // most-conservative pace
    assert(row.getString(2).contains("Disallow: /")) // https authority
    // End to end: the gate under this fold DENIES h.org URLs.
    val kept = CrawlSchedule.gateWithPolicies(
        Seq(("https://h.org/x", "h.org")).toDF("url", "url_host"),
        pol, "bot")
      .select("url").collect()
    assert(kept.isEmpty)
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
