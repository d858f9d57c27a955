package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Change-rate estimation and error backoff: the estimator columns are
  * exact integer arithmetic pinned against hand-computed values; the
  * Cho–Garcia-Molina MLE is checked against the closed form; backoff
  * composes onto the politeness delay table the scheduler reads. */
class RecrawlSpec extends SparkSpec {

  private val DayUs = 86400000000L

  private def hist(rows: (String, Long, String)*) = {
    val sparkSession = spark
    import sparkSession.implicits._
    rows.zipWithIndex
      .map { case ((u, t, d), i) => (u, t, d, i.toLong) }
      .toDF("url", "fetch_us", "digest", "event_id")
  }

  private def rates(df: org.apache.spark.sql.DataFrame) =
    Recrawl.changeRates(df, tieBreak = Seq("event_id"))

  private def one(df: org.apache.spark.sql.DataFrame, url: String) =
    df.filter(col("url") === url).collect().head

  test("estimator: changed pages get span/changes, never-changed back off, single fetches get the default") {
    val df = rates(hist(
      // a: 3 fetches over 20 days, 1 change → interval 20d
      ("a", 0L, "x"), ("a", 10L * DayUs, "y"), ("a", 20L * DayUs, "y"),
      // b: never changed over 10 days → 2*span = 20d
      ("b", 0L, "x"), ("b", 10L * DayUs, "x"),
      // c: single fetch → default 1d
      ("c", 5L * DayUs, "x"),
      // d: changes every day over 40 days → 40d/40 = 1d... use 4 fetches
      ("d", 0L, "p"), ("d", 1L * DayUs, "q"), ("d", 2L * DayUs, "r"),
      ("d", 3L * DayUs, "s")))
    val a = one(df, "a")
    assert(a.getAs[Long]("n_fetches") === 3L)
    assert(a.getAs[Long]("n_changes") === 1L)
    assert(a.getAs[Long]("span_us") === 20L * DayUs)
    assert(a.getAs[Long]("next_interval_us") === 20L * DayUs)
    assert(a.getAs[Long]("next_fetch_us") === 40L * DayUs)
    assert(one(df, "b").getAs[Long]("next_interval_us") === 20L * DayUs)
    assert(one(df, "c").getAs[Long]("next_interval_us") === DayUs)
    // d: span 3d, 3 changes → 1d
    assert(one(df, "d").getAs[Long]("next_interval_us") === DayUs)
  }

  test("clamp ladder: hyperactive pages floor at min, glacial pages cap at max") {
    val df = rates(hist(
      // changes every second → min clamp (1 h)
      ("fast", 0L, "x"), ("fast", 1000000L, "y"), ("fast", 2000000L, "z"),
      // never changed over 100 days → 2*span capped at 30 d
      ("slow", 0L, "x"), ("slow", 100L * DayUs, "x")))
    assert(one(df, "fast").getAs[Long]("next_interval_us")
      === 3600L * 1000000L)
    assert(one(df, "slow").getAs[Long]("next_interval_us")
      === 30L * DayUs)
  }

  test("same-instant fetches are ordered by the tie-break, so the change count is deterministic") {
    // Two fetches at the SAME microsecond with different digests: with
    // the event_id tie-break the sequence is x(id0) → y(id1) → y(id2):
    // exactly one change, every run.
    val df = rates(hist(
      ("t", 0L, "x"), ("t", 0L, "y"), ("t", 1L * DayUs, "y")))
    assert(one(df, "t").getAs[Long]("n_changes") === 1L)
  }

  test("lambda_cd matches the closed-form Cho–Garcia-Molina MLE") {
    val df = rates(hist(
      ("a", 0L, "x"), ("a", 10L * DayUs, "y"), ("a", 20L * DayUs, "y")))
    // n=3, X=1, meanInterval=10d: λ = -ln((3-1+0.5)/(3+0.5)) / 10
    val expected = -math.log(2.5 / 3.5) / 10.0
    assert(math.abs(one(df, "a").getAs[Double]("lambda_cd") - expected)
      < 1e-12)
    // below 2 fetches: no estimate
    val single = rates(hist(("s", 0L, "x")))
    assert(single.filter(col("lambda_cd").isNotNull).isEmpty)
  }

  test("dueFrontier slices by next_fetch_us and ranks by overdue") {
    val df = rates(hist(
      ("a", 0L, "x"), ("a", 10L * DayUs, "y"), ("a", 20L * DayUs, "y"),
      ("b", 0L, "x"), ("b", 39L * DayUs, "x")))
    // a due at 40d; b (never changed, 2*39d capped at 30d) due at 69d.
    val due = Recrawl.dueFrontier(df, 50L * DayUs)
    assert(due.select("url").collect().map(_.getString(0)).toSeq
      === Seq("a"))
    assert(due.collect().head.getAs[Long]("overdue_us") === 10L * DayUs)
  }

  test("backoff: exponential in the error count, capped, and composed onto the delay table") {
    val sparkSession = spark
    import sparkSession.implicits._
    val log = (Seq.fill(3)(("h1", 503L)) ++ Seq.fill(2)(("h1", 200L)) ++
      Seq(("h2", 200L)) ++ Seq.fill(10)(("h3", 429L)))
      .toDF("url_host", "http_status")
    val mult = Recrawl.backoffMultipliers(log)
    val m = mult.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m("h1") === ((3L, 8L)))
    assert(!m.contains("h2")) // healthy host: no row (review r14)
    assert(m("h3") === ((10L, 64L))) // capped at 2^6
    val delays = Seq(("h1", 0.5d), ("h2", 2.0d), ("h4", 1.0d))
      .toDF("domain", "crawl_delay")
    val composed = Recrawl.delaysWithBackoff(delays, mult)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(composed("h1") === 4.0d)   // 0.5 * 2^3
    assert(composed("h2") === 2.0d)   // no errors
    assert(composed("h4") === 1.0d)   // host without a log row: unchanged
  }

  private def rateRows(df: org.apache.spark.sql.DataFrame) =
    df.select("url", "n_fetches", "n_changes", "span_us",
        "next_interval_us", "next_fetch_us")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet

  test("incremental stats equal the full-history recompute — boundary changes, gap batches, collapse") {
    val h = hist(
      // a: change lands EXACTLY on the batch-1/2 boundary — invisible
      // to both batches' lag windows, caught only by the digest merge.
      ("a", 0L, "x"), ("a", 10L * DayUs, "x"),          // batch 0
      ("a", 20L * DayUs, "y"), ("a", 25L * DayUs, "y"), // batch 1
      // b: skips batch 1 entirely (gap), changes within batch 2.
      ("b", 5L * DayUs, "p"),                            // batch 0
      ("b", 40L * DayUs, "q"), ("b", 45L * DayUs, "q"), // batch 2
      // c: appears only in the last batch.
      ("c", 41L * DayUs, "z"))                           // batch 2
    val byBatch = h.withColumn("_b",
      expr("least(fetch_us div 1382400000000, 2L)")) // 16-day batches
    val store = Recrawl.statsStore(spark,
      java.nio.file.Files.createTempDirectory("graft_rstats").toString,
      "rstats_equiv", collapseEvery = 2L) // collapse trips mid-run
    (0L to 2L).foreach { b =>
      Recrawl.updateStats(store,
        Recrawl.batchStats(byBatch.filter(col("_b") === b),
          tieBreak = Seq("event_id")),
        batchId = b, scope = "equiv")
    }
    assert(rateRows(Recrawl.ratesFromStats(store)) === rateRows(rates(h)))
  }

  test("a replayed stats batch appends nothing (at-least-once fold stays exact)") {
    val h = hist(("a", 0L, "x"), ("a", 10L * DayUs, "y"))
    val store = Recrawl.statsStore(spark,
      java.nio.file.Files.createTempDirectory("graft_rstats").toString,
      "rstats_replay")
    val stats = Recrawl.batchStats(h, tieBreak = Seq("event_id"))
    Recrawl.updateStats(store, stats, batchId = 0L, scope = "re")
    val once = rateRows(Recrawl.ratesFromStats(store))
    // The crash-replay: same (scope, batch_id) delivered again — the
    // sentinel probe must refuse the double-count.
    Recrawl.updateStats(store, stats, batchId = 0L, scope = "re")
    assert(rateRows(Recrawl.ratesFromStats(store)) === once)
    assert(once.head._2 === 2L) // n_fetches stayed 2, not 4
  }

  test("updateStats rejects a late backfill — and a same-instant tie — without touching the store") {
    val store = Recrawl.statsStore(spark,
      java.nio.file.Files.createTempDirectory("graft_rstats").toString,
      "rstats_reject")
    Recrawl.updateStats(store,
      Recrawl.batchStats(hist(("a", 10L * DayUs, "x"),
        ("a", 20L * DayUs, "y")), tieBreak = Seq("event_id")),
      batchId = 0L, scope = "rej")
    val before = rateRows(Recrawl.ratesFromStats(store))
    // Strictly earlier: rejected.
    intercept[Exception] {
      Recrawl.updateStats(store,
        Recrawl.batchStats(hist(("a", 0L, "x")),
          tieBreak = Seq("event_id")), batchId = 1L, scope = "rej")
    }
    // Same-instant tie (advice r14): the stored tail's tie-break is
    // gone, so equality is unorderable — rejected too, not silently
    // ordered store-then-batch.
    intercept[Exception] {
      Recrawl.updateStats(store,
        Recrawl.batchStats(hist(("a", 20L * DayUs, "z")),
          tieBreak = Seq("event_id")), batchId = 2L, scope = "rej")
    }
    // A failed fold appends nothing: the guard rides the append action.
    assert(rateRows(Recrawl.ratesFromStats(store)) === before)
  }

  test("backfillStats: a batch strictly before the stored span merges exactly with no history") {
    val full = hist(
      ("a", 0L, "x"), ("a", 10L * DayUs, "y"), // the late batch
      ("a", 20L * DayUs, "y"), ("a", 30L * DayUs, "z"), // folded first
      ("b", 25L * DayUs, "p")) // untouched by the backfill
    val store = Recrawl.statsStore(spark,
      java.nio.file.Files.createTempDirectory("graft_rstats").toString,
      "rstats_prepend")
    Recrawl.updateStats(store,
      Recrawl.batchStats(full.filter(col("fetch_us") >= 20L * DayUs),
        tieBreak = Seq("event_id")), batchId = 0L, scope = "pre")
    // No history argument: the disjoint-before class folds exactly from
    // the boundary digests alone (y→y boundary = no change for a; the
    // a-internal x→y change is the batch's own).
    Recrawl.backfillStats(store,
      full.filter(col("fetch_us") < 20L * DayUs),
      tieBreak = Seq("event_id"), batchId = 1L, scope = "pre")
    assert(rateRows(Recrawl.ratesFromStats(store)) === rateRows(rates(full)))
  }

  test("backfillStats: an inside-span batch rebuilds touched URLs from history; without history it fails fast") {
    val full = hist(
      ("a", 0L, "x"), ("a", 30L * DayUs, "x"),  // folded first
      ("a", 10L * DayUs, "y"), ("a", 20L * DayUs, "x"), // late interior
      ("c", 5L * DayUs, "q")) // new URL riding the same late batch
    val late = full.filter(col("fetch_us") === 10L * DayUs ||
      col("fetch_us") === 20L * DayUs || col("url") === "c")
    val prior = full.filter(col("url") === "a" &&
      (col("fetch_us") === 0L || col("fetch_us") === 30L * DayUs))
    def freshStore(name: String) = {
      val s = Recrawl.statsStore(spark,
        java.nio.file.Files.createTempDirectory("graft_rstats").toString,
        name)
      Recrawl.updateStats(s, Recrawl.batchStats(prior,
        tieBreak = Seq("event_id")), batchId = 0L, scope = name)
      s
    }
    // Without history: the interior rebuild is impossible from the
    // sufficient statistics — fail fast, never approximate.
    intercept[IllegalArgumentException] {
      Recrawl.backfillStats(freshStore("bf_nohist"), late,
        tieBreak = Seq("event_id"), batchId = 1L, scope = "bf_nohist")
    }
    // With history: the interleaving x→y→x→x (2 changes — the naive
    // stats merge would have seen none) comes out exact, and the new
    // URL c folds through the same call.
    val store = freshStore("bf_hist")
    Recrawl.backfillStats(store, late, history = prior,
      tieBreak = Seq("event_id"), batchId = 1L, scope = "bf_hist")
    assert(rateRows(Recrawl.ratesFromStats(store)) === rateRows(rates(full)))
  }

  test("backfillStats: a boundary tie classifies as interior (unorderable) and rebuilds exactly") {
    // The late batch's first fetch shares the stored LAST fetch's
    // instant; the full history orders them by event_id (stored id 1 <
    // late id 2), so the exact answer needs the interleaving.
    val full = hist(
      ("a", 0L, "x"), ("a", 10L * DayUs, "y"),  // folded first (ids 0,1)
      ("a", 10L * DayUs, "z"), ("a", 20L * DayUs, "z")) // late (ids 2,3)
    val prior = full.filter(col("event_id") <= 1L)
    val late = full.filter(col("event_id") >= 2L)
    val store = Recrawl.statsStore(spark,
      java.nio.file.Files.createTempDirectory("graft_rstats").toString,
      "rstats_tie")
    Recrawl.updateStats(store, Recrawl.batchStats(prior,
      tieBreak = Seq("event_id")), batchId = 0L, scope = "tie")
    Recrawl.backfillStats(store, late, history = prior,
      tieBreak = Seq("event_id"), batchId = 1L, scope = "tie")
    assert(rateRows(Recrawl.ratesFromStats(store)) === rateRows(rates(full)))
  }

  private def ringStore(name: String) =
    Recrawl.historyStore(spark,
      java.nio.file.Files.createTempDirectory("graft_ring").toString,
      name, tieBreak = Seq(org.apache.spark.sql.types.StructField(
        "event_id", org.apache.spark.sql.types.LongType)))

  test("recordHistory: the ring keeps exactly the newest K fetches per URL, replay-guarded") {
    val ring = ringStore("ring_trim")
    val b1 = hist(("a", 0L, "x"), ("a", 10L * DayUs, "y"),
      ("b", 5L * DayUs, "p"))
    val b2 = hist(("a", 20L * DayUs, "y"), ("a", 30L * DayUs, "z"),
      ("a", 40L * DayUs, "z"))
    Recrawl.recordHistory(ring, b1, keep = 3, batchId = 0L, scope = "rt")
    Recrawl.recordHistory(ring, b2, keep = 3, batchId = 1L, scope = "rt")
    val a = Recrawl.retainedHistory(ring).filter(col("url") === "a")
      .select("fetch_us").collect().map(_.getLong(0)).sorted.toSeq
    assert(a === Seq(20L * DayUs, 30L * DayUs, 40L * DayUs),
      "oldest fetches trimmed, newest 3 kept")
    assert(Recrawl.retainedHistory(ring).filter(col("url") === "b")
      .count() === 1L)
    // Replay appends nothing (own sentinel).
    Recrawl.recordHistory(ring, b2, keep = 3, batchId = 1L, scope = "rt")
    assert(Recrawl.retainedHistory(ring).count() === 4L)
  }

  test("recordHistory replay RE-RUNS the trim: a crash between append and trim converges (advice r16)") {
    // The crash state — batch rows + sentinel landed, trim never ran —
    // is built by recording with an effectively-unbounded keep (the
    // append half executes, the trim is a no-op), then replaying the
    // SAME (scope, batchId) with the real keep: the sentinel makes the
    // append skip, and the fix re-runs the idempotent batch-bounded
    // trim instead of returning early and leaving the URL above keep
    // forever.
    val ring = ringStore("ring_trim_replay")
    val b = hist(("a", 0L, "x"), ("a", 10L * DayUs, "y"),
      ("a", 20L * DayUs, "y"), ("a", 30L * DayUs, "z"),
      ("a", 40L * DayUs, "z"))
    Recrawl.recordHistory(ring, b, keep = 100, batchId = 7L, scope = "tr")
    assert(Recrawl.retainedHistory(ring).count() === 5L)
    Recrawl.recordHistory(ring, b, keep = 2, batchId = 7L, scope = "tr")
    val a = Recrawl.retainedHistory(ring)
      .select("fetch_us").collect().map(_.getLong(0)).sorted.toSeq
    assert(a === Seq(30L * DayUs, 40L * DayUs),
      "the replay must converge the ring to the newest `keep` fetches")
  }

  test("backfillStats with a retained ring: interior batches rebuild self-containedly, exactly") {
    // a: 5 folded fetches, ring keeps 3 — the late interior row (day
    // 25, inside the retained window) folds via the prefix algebra.
    // b: 2 folded fetches (≤ K: the window IS the complete history) —
    // its interior late row rebuilds by plain recount.
    val full = hist(
      ("a", 0L, "x"), ("a", 10L * DayUs, "y"),           // batch 0
      ("a", 20L * DayUs, "y"), ("a", 30L * DayUs, "z"),  // batch 1
      ("a", 40L * DayUs, "z"),                           // batch 1
      ("b", 20L * DayUs, "p"), ("b", 30L * DayUs, "p"),  // batch 1
      ("a", 25L * DayUs, "w"), ("b", 25L * DayUs, "q"))  // late interior
    val late = full.filter(col("fetch_us") === 25L * DayUs)
    val store = Recrawl.statsStore(spark,
      java.nio.file.Files.createTempDirectory("graft_rstats").toString,
      "rstats_ring")
    val ring = ringStore("ring_bf")
    Seq(0L, 1L).foreach { b =>
      val batch = full.filter(col("fetch_us") =!= 25L * DayUs)
        .filter(if (b == 0L) col("fetch_us") < 20L * DayUs
          else col("fetch_us") >= 20L * DayUs)
      Recrawl.updateStats(store, Recrawl.batchStats(batch,
        tieBreak = Seq("event_id")), batchId = b, scope = "ringbf")
      Recrawl.recordHistory(ring, batch, keep = 3, batchId = b,
        scope = "ringbf")
    }
    // No `history` argument: the ring carries the rebuild.
    Recrawl.backfillStats(store, late, tieBreak = Seq("event_id"),
      batchId = 2L, scope = "ringbf", historyStore = ring,
      keepHistory = 3)
    assert(rateRows(Recrawl.ratesFromStats(store)) === rateRows(rates(full)))
    // The late rows entered the ring too (the window stays complete
    // for the NEXT backfill): a's newest 3 = {30, 40} ∪ {25}? No —
    // 25 < 30 < 40, so the ring holds {25 is trimmed? 25,30,40 vs
    // 20,25,30,40 → newest 3 = 25,30,40}.
    assert(Recrawl.retainedHistory(ring).filter(col("url") === "a")
      .select("fetch_us").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(25L * DayUs, 30L * DayUs, 40L * DayUs))
    // Replay of the backfill: nothing double-folds, ring unchanged.
    val once = rateRows(Recrawl.ratesFromStats(store))
    Recrawl.backfillStats(store, late, tieBreak = Seq("event_id"),
      batchId = 2L, scope = "ringbf", historyStore = ring,
      keepHistory = 3)
    assert(rateRows(Recrawl.ratesFromStats(store)) === once)
  }

  test("foldBatch ordinals: an unrecorded MIDDLE fold is detected as an interior gap; a fully-recorded ring rebuilds and restamps") {
    val a = hist(("a", 0L, "x"), ("a", 10L * DayUs, "y"))
    val bMid = hist(("a", 20L * DayUs, "y"))
    val c = hist(("a", 30L * DayUs, "z"), ("a", 40L * DayUs, "z"))
    val late = hist(("a", 35L * DayUs, "w"))
    val full = a.unionByName(bMid).unionByName(c).unionByName(late)
    def build(recordMid: Boolean, tag: String) = {
      val store = Recrawl.statsStore(spark,
        java.nio.file.Files.createTempDirectory("graft_rstats").toString,
        s"rstats_$tag")
      val ring = ringStore(s"ring_$tag")
      Recrawl.foldBatch(store, a, tieBreak = Seq("event_id"),
        batchId = 0L, scope = tag, historyStore = ring, keepHistory = 10)
      if (recordMid)
        Recrawl.foldBatch(store, bMid, tieBreak = Seq("event_id"),
          batchId = 1L, scope = tag, historyStore = ring,
          keepHistory = 10)
      else // the forgotten record: stats folded, ring never told
        Recrawl.updateStats(store, Recrawl.batchStats(bMid,
          tieBreak = Seq("event_id")), batchId = 1L, scope = tag)
      Recrawl.foldBatch(store, c, tieBreak = Seq("event_id"),
        batchId = 2L, scope = tag, historyStore = ring, keepHistory = 10)
      (store, ring)
    }
    // GAP case: the window's TAIL matches the stats (the pre-r16 check
    // passes) and the late row lands after the window's first fetch
    // (the coverage check passes) — only the ordinal contiguity proof
    // catches that batch 1's rows are missing from the window, which
    // would otherwise recount to a silently wrong change total.
    val (s1, r1) = build(recordMid = false, "gap16")
    val before = rateRows(Recrawl.ratesFromStats(s1))
    val ex = intercept[Exception] {
      Recrawl.backfillStats(s1, late, tieBreak = Seq("event_id"),
        batchId = 3L, scope = "gap16", historyStore = r1,
        keepHistory = 10)
    }
    assert(ex.getMessage.contains("INTERIOR GAP") ||
      Option(ex.getCause).exists(_.getMessage.contains("INTERIOR GAP")))
    assert(rateRows(Recrawl.ratesFromStats(s1)) === before,
      "the detected gap aborts before anything lands")
    // Fully-recorded ring: the same backfill folds exactly and the
    // touched URL's ring rows come back with CONTIGUOUS re-stamped
    // ordinals 1..n (the interior insert renumbered its successors).
    val (s2, r2) = build(recordMid = true, "nogap16")
    Recrawl.backfillStats(s2, late, tieBreak = Seq("event_id"),
      batchId = 3L, scope = "nogap16", historyStore = r2,
      keepHistory = 10)
    assert(rateRows(Recrawl.ratesFromStats(s2)) === rateRows(rates(full)))
    val ords = Recrawl.retainedHistory(r2).filter(col("url") === "a")
      .select("ord").collect().map(_.getLong(0)).sorted.toSeq
    assert(ords === (1L to 6L))
  }

  test("backfillStats with a ring: a batch predating the retained window fails fast; an unfed ring fails fast") {
    val folded = hist(
      ("a", 0L, "x"), ("a", 10L * DayUs, "y"), ("a", 20L * DayUs, "y"),
      ("a", 30L * DayUs, "z"), ("a", 40L * DayUs, "z"))
    val store = Recrawl.statsStore(spark,
      java.nio.file.Files.createTempDirectory("graft_rstats").toString,
      "rstats_ring_pre")
    val ring = ringStore("ring_pre")
    Recrawl.updateStats(store, Recrawl.batchStats(folded,
      tieBreak = Seq("event_id")), batchId = 0L, scope = "rpre")
    Recrawl.recordHistory(ring, folded, keep = 3, batchId = 0L,
      scope = "rpre")
    val before = rateRows(Recrawl.ratesFromStats(store))
    // Day 15 is interior to the stored span but BEFORE the retained
    // window's first fetch (day 20): its order against the unretained
    // prefix is unknowable — fail fast, never approximate.
    intercept[Exception] {
      Recrawl.backfillStats(store, hist(("a", 15L * DayUs, "w")),
        tieBreak = Seq("event_id"), batchId = 1L, scope = "rpre",
        historyStore = ring, keepHistory = 3)
    }
    assert(rateRows(Recrawl.ratesFromStats(store)) === before,
      "a failed fold appends nothing")
    // A ring that never saw the folds (out of sync with the stats
    // tail) is detected, not trusted.
    val emptyRing = ringStore("ring_unfed")
    intercept[Exception] {
      Recrawl.backfillStats(store, hist(("a", 25L * DayUs, "w")),
        tieBreak = Seq("event_id"), batchId = 2L, scope = "rpre",
        historyStore = emptyRing, keepHistory = 3)
    }
    assert(rateRows(Recrawl.ratesFromStats(store)) === before)
  }

  test("a replayed backfill batch appends nothing") {
    val store = Recrawl.statsStore(spark,
      java.nio.file.Files.createTempDirectory("graft_rstats").toString,
      "rstats_bfreplay")
    val late = hist(("a", 0L, "x"), ("a", 10L * DayUs, "y"))
    Recrawl.backfillStats(store, late, tieBreak = Seq("event_id"),
      batchId = 0L, scope = "bfr")
    val once = rateRows(Recrawl.ratesFromStats(store))
    Recrawl.backfillStats(store, late, tieBreak = Seq("event_id"),
      batchId = 0L, scope = "bfr")
    assert(rateRows(Recrawl.ratesFromStats(store)) === once)
    assert(once.head._2 === 2L)
  }

  test("backoffMultipliers rejects an overflowing maxExp") {
    val sparkSession = spark
    import sparkSession.implicits._
    val log = Seq(("h1", 503L)).toDF("url_host", "http_status")
    intercept[IllegalArgumentException] {
      Recrawl.backoffMultipliers(log, maxExp = 63)
    }
    intercept[IllegalArgumentException] {
      Recrawl.backoffMultipliers(log, maxExp = -1)
    }
  }

  test("backoff-scaled delays pace a scheduled batch exactly like a native delay table") {
    val sparkSession = spark
    import sparkSession.implicits._
    val log = Seq.fill(2)(("h1", 503L)).toDF("url_host", "http_status")
    val delays = Seq(("h1", 1.0d)).toDF("domain", "crawl_delay")
    val scaled = Recrawl.delaysWithBackoff(delays,
      Recrawl.backoffMultipliers(log)) // h1 → 4.0 s
    val frontier = Seq(("u1", "h1"), ("u2", "h1"), ("u3", "h1"))
      .toDF("url", "url_domain")
      .join(scaled.withColumnRenamed("domain", "url_domain"),
        Seq("url_domain"))
    val store = graft.streaming.CrawlSchedule.stateStore(spark,
      java.nio.file.Files.createTempDirectory("graft_backoff").toString,
      "backoff_sched")
    val out = graft.streaming.CrawlSchedule.scheduleBatch(store, frontier,
        order = col("url"))
      .select("url", "start_offset_s").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out === Map("u1" -> 0.0d, "u2" -> 4.0d, "u3" -> 8.0d))
  }
}
