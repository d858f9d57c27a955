package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.Pii

/** Round-5 pipeline utilities: profiling, PII scrubbing, passage dedup,
  * triangle counting, SCD-2 history. */
class PipelineSpec extends SparkSpec {

  test("profile counts nulls/distincts and uses lexicographic string extrema") {
    val s = spark; import s.implicits._
    val df = Seq(
      (Some(1L), Some("b")), (Some(10L), None), (None, Some("a")),
      (Some(10L), Some("a"))).toDF("id", "tag")
    val p = Profiling.profile(df, Seq("id", "tag"))
      .collect().map(r => r.getString(0) -> r).toMap
    val id = p("id")
    assert(id.getLong(1) == 4 && id.getLong(2) == 1) // n_rows, n_nulls
    assert(id.getLong(3) == 2)                       // distinct {1, 10}
    // Lexicographic, not numeric: "1" < "10" as strings.
    assert(id.getString(4) == "1" && id.getString(5) == "10")
    val tag = p("tag")
    assert(tag.getLong(2) == 1 && tag.getLong(3) == 2)
    assert(tag.getString(4) == "a" && tag.getString(5) == "b")
  }

  test("histogram bins toward -inf so negatives land in their own bins") {
    val s = spark; import s.implicits._
    val df = Seq(-0.5, -25.0, 0.0, 24.9, 25.0).toDF("v")
    val bins = Profiling.histogram(df, "v", 25.0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(bins(-1L) == ((2L, -25.0))) // -0.5 and -25.0
    assert(bins(0L) == ((2L, 0.0)))    // 0.0 and 24.9
    assert(bins(1L) == ((1L, 25.0)))   // 25.0 opens the next bin
  }

  test("equiDepthHistogram cuts at exact quartiles with tie-absorbing buckets") {
    val s = spark; import s.implicits._
    // 1..8 → quartile cuts at ranks 2,4,6 → values 2,4,6; buckets of 2.
    val even = (1L to 8L).toDF("v")
    val h = Profiling.equiDepthHistogram(even, "v", 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(h == Map(1L -> ((2L, 1L, 2L)), 2L -> ((2L, 3L, 4L)),
      3L -> ((2L, 5L, 6L)), 4L -> ((2L, 7L, 8L))))
    // Heavy ties: value 5 spans several quartile ranks → its bucket absorbs
    // every 5 and the duplicate cuts leave later buckets absent.
    val ties = (Seq.fill(6)(5L) ++ Seq(1L, 9L)).toDF("v")
    val t = Profiling.equiDepthHistogram(ties, "v", 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // cuts at ranks 2,4,6 are all 5 → buckets: (<=5)=7 rows in bucket 1,
    // (>5)=1 row in bucket 4.
    assert(t == Map(1L -> ((7L, 1L, 5L)), 4L -> ((1L, 9L, 9L))))
  }

  test("distributionDrift: hand-computed chi-square contributions, zero-slice null") {
    val s = spark; import s.implicits._
    // Slice A: 3×x, 1×y; slice B: 1×x, 3×y. T_a = T_b = 4.
    val df = (Seq.fill(3)(("x", true)) ++ Seq(("y", true)) ++
      Seq(("x", false)) ++ Seq.fill(3)(("y", false))).toDF("cat", "in_a")
    val drift = Profiling.distributionDrift(df, "cat", col("in_a"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // x: (3·4 − 1·4)² / (4·4·4) = 64/64 = 1.0; y symmetric.
    assert(drift === Map("x" -> ((3L, 1L, 1.0)), "y" -> ((1L, 3L, 1.0))))
    // A category absent from one slice still contributes…
    val oneSided = Seq(("x", true), ("y", true), ("y", false)).toDF("cat", "in_a")
    val d2 = Profiling.distributionDrift(oneSided, "cat", col("in_a"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    // x: n_a=1, n_b=0, T_a=2, T_b=1 → (1·1 − 0·2)² / (2·1·1) = 0.5
    assert(d2("x") === 0.5)
    // …but an entirely empty SLICE yields null contributions.
    val empty = Seq(("x", true), ("y", true)).toDF("cat", "in_a")
    assert(Profiling.distributionDrift(empty, "cat", col("in_a"))
      .collect().forall(_.isNullAt(3)))
  }

  test("Pii redacts email, ipv4 and long digit runs with class tokens") {
    val s = spark; import s.implicits._
    val df = Seq(
      "mail a.user+x@sub.example.org from 192.168.0.1 acct 123456789 end")
      .toDF("t")
    val out = df.select(
      Pii.redact(col("t")).as("r"),
      Pii.countMatches(col("t"), Pii.EmailRe).as("e"),
      Pii.countMatches(col("t"), Pii.Ipv4Re).as("i"),
      Pii.countMatches(col("t"), Pii.LongNumRe).as("n")).head()
    assert(out.getString(0) == "mail <EMAIL> from <IP> acct <NUM> end")
    assert(out.getInt(1) == 1 && out.getInt(2) == 1 && out.getInt(3) == 1)
    // Short digit runs and bare words survive.
    val clean = df.select(Pii.redact(lit("call 555 1234 ok"))).head().getString(0)
    assert(clean == "call 555 1234 ok")
  }

  test("duplicatePassages finds cross-doc windows, drops short docs") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a very quick brown fox jumps high today"),
      (3L, "too short"),
      (4L, "quick brown fox jumps high today again and again")
    ).toDF("doc_id", "text")
    val out = Dedup.duplicatePassages(docs, w = 5, minDocs = 2L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // Shared by docs 1 & 2 (and 4 partially): the exact 5-gram set.
    assert(out.contains("quick brown fox jumps high")) // docs 2, 4
    assert(out("quick brown fox jumps high") == ((2L, 2L, 2L)))
    // doc 3 has < 5 words: contributes nothing (and crashes nothing).
    assert(!out.keys.exists(_.contains("too short")))
    // No passage private to one doc leaks through the minDocs filter.
    assert(!out.contains("the quick brown fox jumps"))
  }

  test("triangleStats: K4 has 4 triangles; a path has none") {
    val s = spark; import s.implicits._
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("u", "v")
    val r = Graphs.triangleStats(k4).head()
    assert(r.getLong(0) == 4 && r.getLong(1) == 6) // nodes, edges
    assert(r.getLong(2) == 4 && r.getLong(3) == 3) // triangles, max degree
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    assert(Graphs.triangleStats(path).head().getLong(2) == 0)
  }

  test("pageRankFixedPoint matches the hand-computed fixed-point round") {
    val s = spark; import s.implicits._
    // Path 1–2–3: deg(1)=deg(3)=1, deg(2)=2. After ONE damped round:
    //   contrib to 1: 1e12 div 2 = 5e11  → 15e10 + 85·5e11 div 100 = 575e9
    //   contrib to 2: 1e12 + 1e12 = 2e12 → 15e10 + 85·2e12 div 100 = 1850e9
    val path = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val r1 = Graphs.pageRankFixedPoint(path, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(1L -> 575000000000L, 2L -> 1850000000000L,
      3L -> 575000000000L))
    // Rank mass is conserved up to truncation (here exactly).
    assert(r1.values.sum == 3000000000000L)
    // More rounds stay integer-exact and keep the hub on top.
    val r3 = Graphs.pageRankFixedPoint(path, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r3(2L) > r3(1L) && r3(1L) == r3(3L))
  }

  test("coOccurrenceEdges emits each shared-group pair once, u < v") {
    val s = spark; import s.implicits._
    val m = Seq((10L, 1L), (10L, 2L), (10L, 2L), (11L, 2L), (11L, 1L), (12L, 5L))
      .toDF("g", "i")
    val e = Graphs.coOccurrenceEdges(m, "g", "i")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(e == Set((1L, 2L))) // dup rows and dup groups collapse; singleton drops
  }

  test("scd2 collapses runs, keeps zero-length intervals on instant ties") {
    val s = spark; import s.implicits._
    val log = Seq(
      (1L, "a", 10L, 100L), (1L, "a", 20L, 101L), (1L, "b", 30L, 102L),
      (1L, "b", 30L, 103L), (1L, "a", 40L, 104L),
      (2L, "x", 5L, 200L)
    ).toDF("k", "attr", "ts", "id")
    val out = Temporal.scd2(log, Seq("k"), "attr", "ts", Seq("id"))
      .orderBy("k", "valid_from")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    // Run a,a collapses; b at 30 (id 102) opens, the tied b (id 103) is the
    // same state so NOT a change; a at 40 closes it.
    assert(out.toSeq == Seq(
      (1L, "a", 10L, 30L), (1L, "b", 30L, 40L), (1L, "a", 40L, -1L),
      (2L, "x", 5L, -1L)))
  }

  test("scd2 treats null state transitions null-safely") {
    val s = spark; import s.implicits._
    val log = Seq(
      (1L, Option("a"), 10L), (1L, Option.empty[String], 20L),
      (1L, Option.empty[String], 30L), (1L, Option("a"), 40L)
    ).toDF("k", "attr", "ts")
    val out = Temporal.scd2(log, Seq("k"), "attr", "ts")
      .orderBy("valid_from")
      .collect().map(r => (Option(r.getString(1)), r.getLong(2)))
    assert(out.toSeq == Seq((Some("a"), 10L), (None, 20L), (Some("a"), 40L)))
  }

  test("exactQuantiles: type-1 order statistics vs in-memory sort, single exchange") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(7)
    val rows = for (g <- Seq("a", "b", "c"); _ <- 1 to (17 + g.hashCode.abs % 5))
      yield (g, rnd.nextInt(1000).toLong)
    val probs = Seq(("p25", 1L, 4L), ("p50", 1L, 2L), ("p95", 19L, 20L))
    val df = Profiling.exactQuantiles(rows.toDF("g", "v"), Seq("g"), "v", probs)
    val got = df.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val want = rows.groupBy(_._1).map { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      val n = sorted.size.toLong
      def q(nu: Long, de: Long) = sorted(((n * nu + de - 1) / de - 1).toInt)
      g -> ((n, q(1, 4), q(1, 2), q(19, 20)))
    }
    assert(got === want)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("Exchange")) <= 2, // partial+final agg may add one
      "quantile windows must share one partitioning")
  }

  test("assignGlobalIds edges: empty input, single row, reserved-column guard") {
    val s = spark; import s.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("k", "tie")
    assert(Numbering.assignGlobalIds(empty, Seq(col("k"), col("tie"))).isEmpty)
    val one = Numbering.assignGlobalIds(Seq((5L, 1L)).toDF("k", "tie"),
      Seq(col("k"))).head()
    assert(one.getAs[Long]("global_id") === 1L)
    intercept[IllegalArgumentException] {
      Numbering.assignGlobalIds(Seq((1L, 2L)).toDF("k", "global_id"), Seq(col("k")))
    }
  }

  test("assignGlobalIds: contiguous 1..N in total order, input-partitioning invariant") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(13)
    val rows = (1 to 300).map(i => (rnd.nextInt(40).toLong, i.toLong))
    val want = rows.sortBy(identity).zipWithIndex
      .map { case (r, i) => r -> (i + 1).toLong }.toMap
    for (inputParts <- Seq(1, 7)) {
      val got = Numbering.assignGlobalIds(
          rows.toDF("k", "tie").repartition(inputParts),
          order = Seq(col("k"), col("tie")), numPartitions = Some(5))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got === want, s"inputParts=$inputParts")
    }
  }

  test("prefixSum equals the single-window cumulative sum at any partitioning") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(29)
    val rows = (1 to 257).map(i => (i.toLong, rnd.nextInt(1000).toLong))
    val want = rows.sortBy(_._1)
      .scanLeft((0L, 0L, 0L)) { case ((_, _, acc), (k, v)) => (k, v, acc + v) }
      .tail.map { case (k, _, c) => k -> c }.toMap
    for (parts <- Seq(1, 6)) {
      val got = Numbering.prefixSum(rows.toDF("k", "v").repartition(3),
          order = Seq(col("k")), col("v"), numPartitions = Some(parts))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got === want, s"numPartitions=$parts")
    }
  }

  test("compactionPlan: shards fill to target, overrun bounded by one row") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(31)
    val rows = (1 to 400).map(i => (i.toLong, (rnd.nextInt(900) + 100).toLong))
    val target = 4096L
    val plan = Curation.compactionPlan(rows.toDF("id", "sz"),
        Seq(col("id")), col("sz"), target)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    // shard ids are nondecreasing in the pack order and start at 0
    val inOrder = plan.sortBy(_._1)
    assert(inOrder.head._3 === 0L)
    inOrder.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 === a._3 || b._3 === a._3 + 1,
        "shards must be contiguous in pack order")
    }
    // every full shard lands in [target − max row + 1, target + max row −1]
    val byShard = inOrder.groupBy(_._3).toSeq.sortBy(_._1)
    val maxSz = rows.map(_._2).max
    byShard.init.foreach { case (sid, members) =>
      val tot = members.map(_._2).sum
      assert(tot > target - maxSz && tot < target + maxSz, s"shard $sid: $tot")
    }
  }
}
