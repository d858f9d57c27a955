package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.{Chunking, Curation, Dedup}

/** The curation gate and the chunker are NARROW transforms, so the exact
  * batch operators run unchanged over a stream — no watermark, no state,
  * append mode. This pins that composability: stream (doc_id, text) →
  * hash-gate sample → length gate → chunk, and the streamed output equals
  * the batch output on the accepted documents. */
class DocPipelineSpec extends SparkSpec {

  test("streamed curate→chunk equals the batch result, with no state store") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    graft.plans.GraftExtensions.register(spark)

    val rnd = new scala.util.Random(71)
    val docs = (0 until 200).map { i =>
      (i.toLong, (0 until rnd.nextInt(30)).map(j => s"t${i}_$j").mkString(" "))
    }
    def pipeline(df: org.apache.spark.sql.DataFrame) =
      Chunking.chunk(
        df.filter(Curation.hashGate(col("doc_id"), "stream", lit(300000L)))
          .filter(length(col("text")) >= 20),
        chunkTokens = 6, overlapTokens = 2)

    val stream = MemoryStream[(Long, String)]
    val query = pipeline(stream.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("dp_out")
      .outputMode("append").start()
    try {
      for (b <- docs.grouped(70)) { stream.addData(b); query.processAllAvailable() }
    } finally query.stop()

    val streamed = spark.table("dp_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val batch = pipeline(docs.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("streamed quality-filter inference equals batch; observe() meters the kept rate") {
    // The hashed-linear classifier is a per-row fold — no state, no
    // watermark — so filter-at-ingest runs the EXACT batch operator over
    // the stream, and `observe` surfaces kept/total counters per batch
    // without a second pass (the production ingest-health metric).
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    graft.plans.GraftExtensions.register(spark)

    val words = Vector("alpha", "beta", "gamma", "delta", "eps")
    val rnd = new scala.util.Random(53)
    val docs = (0 until 150).map { i =>
      (i.toLong, (0 to rnd.nextInt(20)).map(_ => words(rnd.nextInt(words.size)))
        .mkString(" "), "xx")
    }
    def score(df: org.apache.spark.sql.DataFrame) =
      graft.functions.Retrieval.hashedLinearMargin(df)

    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val kept = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val m = e.progress.observedMetrics
        if (m.containsKey("quality_gate")) {
          val row = m.get("quality_gate")
          seen.addAndGet(row.getLong(0)); kept.addAndGet(row.getLong(1))
        }
      }
    }
    spark.streams.addListener(listener)

    val stream = MemoryStream[(Long, String, String)]
    val query = score(stream.toDF().toDF("doc_id", "text", "lang"))
      .observe("quality_gate", count(lit(1)).as("n_seen"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
      .filter(col("kept"))
      .writeStream.format("memory").queryName("qg_out")
      .outputMode("append").start()
    try {
      for (b <- docs.grouped(50)) { stream.addData(b); query.processAllAvailable() }
      // Listener events are async — drain them before reading counters.
      spark.streams.active.foreach(_.processAllAvailable())
      var waited = 0
      while (seen.get() < docs.size && waited < 100) { Thread.sleep(50); waited += 1 }
    } finally {
      query.stop()
      // Shared session across suites — never leak the listener.
      spark.streams.removeListener(listener)
    }

    val streamed = spark.table("qg_out").collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSet
    val batch = score(docs.toDF("doc_id", "text", "lang"))
      .filter(col("kept")).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(streamed === batch)
    assert(batch.nonEmpty && batch.size < docs.size,
      "fixture must exercise both sides of the gate")
    // The observed metrics audit the gate without a second scan.
    assert(seen.get() === docs.size.toLong)
    assert(kept.get() === batch.size.toLong)
  }

  test("foreachBatch incremental PPJoin vs a frozen corpus equals one-shot") {
    // Dedup-at-ingest: each micro-batch is scored against the FROZEN
    // corpus prefix index with the exact batch operator inside
    // foreachBatch (the join is not a narrow transform, so this is its
    // streaming form). Scoring is strictly batch×corpus — no
    // batch-internal pairs — so the union over micro-batches must equal
    // the one-shot run on all streamed docs REGARDLESS of how the stream
    // was batched; that independence is the property pinned here.
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    graft.plans.GraftExtensions.register(spark)

    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val rnd = new scala.util.Random(37)
    val corpusDocs = (0 until 25).map { i =>
      (i.toLong,
        Vector.fill(8 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
    }
    val arriving = (0 until 12).map { j =>
      val ws = corpusDocs(rnd.nextInt(corpusDocs.size))._2.split(" ")
      if (j % 2 == 0) ws(rnd.nextInt(ws.length)) = vocab(rnd.nextInt(vocab.size))
      (500L + j, ws.mkString(" "))
    }
    val corpus = corpusDocs.toDF("doc_id", "text").localCheckpoint(true)

    val got = collection.mutable.Set.empty[(Long, Long, Double)]
    val stream = MemoryStream[(Long, String)]
    val query = stream.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = Dedup.prefixJaccardIncremental(corpus, b, 0.5).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        got.synchronized { got ++= rows; () }
      }
      .start()
    try {
      for (b <- arriving.grouped(5)) { stream.addData(b); query.processAllAvailable() }
    } finally query.stop()

    val oneShot = Dedup.prefixJaccardIncremental(corpus,
        arriving.toDF("doc_id", "text"), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.toSet === oneShot)
    assert(oneShot.nonEmpty, "fixture must plant cross matches")
  }

  test("foreachBatch scoring against the DURABLE prefix-index store equals one-shot") {
    // The production steady state (r9): the corpus index is persisted ONCE
    // as a PrefixIndexStore snapshot; each micro-batch scores against the
    // STORED generation — no corpus rebuild anywhere in the streaming
    // loop. Union over micro-batches must equal the one-shot run, same
    // batching-independence as the rebuild-per-call sibling above.
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    graft.plans.GraftExtensions.register(spark)

    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val rnd = new scala.util.Random(41)
    val corpusDocs = (0 until 25).map { i =>
      (i.toLong,
        Vector.fill(8 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
    }
    val arriving = (0 until 12).map { j =>
      val ws = corpusDocs(rnd.nextInt(corpusDocs.size))._2.split(" ")
      if (j % 2 == 0) ws(rnd.nextInt(ws.length)) = vocab(rnd.nextInt(vocab.size))
      (500L + j, ws.mkString(" "))
    }
    val corpus = corpusDocs.toDF("doc_id", "text").localCheckpoint(true)
    val store = new graft.store.PrefixIndexStore(spark,
      java.nio.file.Files.createTempDirectory("graft_pidx_stream").toString,
      threshold = 0.5, name = "pidx_stream")
    store.snapshot(corpus)

    val got = collection.mutable.Set.empty[(Long, Long, Double)]
    val stream = MemoryStream[(Long, String)]
    val query = stream.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = store.scoreBatch(b).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        got.synchronized { got ++= rows; () }
      }
      .start()
    try {
      for (b <- arriving.grouped(5)) { stream.addData(b); query.processAllAvailable() }
    } finally query.stop()

    val oneShot = Dedup.prefixJaccardIncremental(corpus,
        arriving.toDF("doc_id", "text"), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.toSet === oneShot)
    assert(oneShot.nonEmpty, "fixture must plant cross matches")
  }

  test("streamed OOV monitoring through a broadcast tokenizer equals batch") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.Bpe

    // Tokenizer trained on a fixed reference corpus; the stream carries a
    // drifting mix of known and novel words.
    val trainCorpus = Seq((0L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val vocab = Bpe.wordTable(trainCorpus, "text").localCheckpoint(true)
    val streamDocs = (1 to 90).map(i =>
      (i.toLong, if (i % 3 == 0) s"alpha nova$i" else "beta gamma"))

    val stream = MemoryStream[(Long, String)]
    var seen = Seq.empty[(Long, Long, Long)].toDF("doc_id", "n_words", "n_oov")
    val query = stream.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        seen = seen.unionByName(
          Bpe.oovStats(b, vocab).localCheckpoint(eager = true))
        ()
      }.start()
    try {
      for (b <- streamDocs.grouped(40)) { stream.addData(b); query.processAllAvailable() }
    } finally query.stop()

    val streamed = seen.as[(Long, Long, Long)].collect().toSet
    val batch = Bpe.oovStats(streamDocs.toDF("doc_id", "text"), vocab)
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed === batch)
    // Every third doc carries exactly one novel word.
    assert(streamed.count(_._3 == 1L) === 30)
    assert(streamed.count(_._3 == 0L) === 60)
  }

  test("streamed volume monitor over merged daily counts equals batch alarms") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.Profiling

    // Flat 4/day for days 1..9, a 9-burst on day 10 — sliced across
    // micro-batches so single days arrive SPLIT (the merge-by-sum path).
    val rows = ((1L to 9L).flatMap(d => Seq.fill(4)(("t", d))) ++
      Seq.fill(9)(("t", 10L))).sortBy(_._2)

    val stream = MemoryStream[(String, Long)]
    // The monitor's state: the bounded (cat, day, n) table, merged per
    // trigger; alarms re-derived from it (windows over days can shift as
    // late data lands — recompute-over-daily is the correct formulation).
    var daily = Seq.empty[(String, Long, Long)].toDF("cat", "day", "n")
    var alarms: org.apache.spark.sql.DataFrame = null
    val query = stream.toDF().toDF("cat", "day").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        daily = daily.unionByName(
            b.groupBy("cat", "day").agg(count(lit(1)).as("n")))
          .groupBy("cat", "day").agg(sum("n").as("n"))
          .localCheckpoint(eager = true)
        alarms = Profiling.burstAnomaliesFromDaily(daily, "cat",
          num = 5L, den = 4L).localCheckpoint(eager = true)
        ()
      }.start()
    try {
      for (b <- rows.grouped(17)) { stream.addData(b); query.processAllAvailable() }
    } finally query.stop()

    val streamed = alarms.select("cat", "day", "n", "prev_n", "prev_days")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    val batch = Profiling.burstAnomalies(rows.toDF("cat", "day"), "cat",
        col("day"), num = 5L, den = 4L)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(streamed === batch)
    assert(streamed === Set(("t", 10L, 9L, 16L, 4L)))
  }

  test("streamed incremental exact dedup converges to the batch keep set") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // 120 docs over 40 distinct texts — every text appears 3× (ids i,
    // i+40, i+80), so duplicates ALWAYS straddle micro-batches.
    val docs = (0 until 120).map(i => (i.toLong, s"text body ${i % 40}"))

    val stream = MemoryStream[(Long, String)]
    // The production ingest loop: each batch dedups within itself, then
    // anti-joins the GROWING corpus fingerprint index; survivors' fps
    // append to the index. State = the fp index (one 16-byte row per
    // distinct text ever seen), not the documents.
    var index = Seq.empty[String].toDF("fp")
    var kept = Seq.empty[Long].toDF("keep_id")
    val query = stream.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val survivors = Dedup.incremental(b, index)
          .localCheckpoint(eager = true)
        kept = kept.unionByName(survivors.select("keep_id"))
          .localCheckpoint(eager = true)
        index = index.unionByName(survivors.select("fp"))
          .localCheckpoint(eager = true)
        ()
      }.start()
    try {
      // Batches arrive in id order, so first-arrival == min-id and the
      // streamed keep set must equal the global batch dedup exactly.
      for (b <- docs.grouped(50)) { stream.addData(b); query.processAllAvailable() }
    } finally query.stop()

    val streamedKeep = kept.as[Long].collect().toSet
    val batchKeep = Dedup.exact(docs.toDF("doc_id", "text"))
      .select("keep_id").as[Long].collect().toSet
    assert(streamedKeep === batchKeep)
    assert(streamedKeep === (0L until 40L).toSet)
    assert(index.count() === 40L)
  }

  test("streamed edge ingest + per-batch CC converges to batch components") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // A long path graph arriving shuffled across micro-batches: components
    // only fully merge once ALL edges are in — the worst case for
    // incremental clustering.
    val rnd = new scala.util.Random(19)
    val edges = rnd.shuffle((0L until 60L).map(i => (i, i + 1)) ++
      (100L until 130L).map(i => (i, i + 2)))

    val stream = MemoryStream[(Long, Long)]
    // The accumulating edge table a real ingest keeps; CC re-derives
    // cluster labels per trigger over the union (labels are NOT
    // incremental state — min-labels can change when batches bridge
    // previously separate components, so recompute-over-accumulated is
    // the correct streaming formulation).
    var acc = Seq.empty[(Long, Long)].toDF("src", "dst")
    var lastLabels: org.apache.spark.sql.DataFrame = null
    val query = stream.toDF().toDF("src", "dst").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        acc = acc.unionByName(b).localCheckpoint(eager = true)
        lastLabels = graft.operators.Dedup.connectedComponentsOfEdges(acc)
          .localCheckpoint(eager = true)
        ()
      }.start()
    try {
      for (b <- edges.grouped(25)) { stream.addData(b); query.processAllAvailable() }
    } finally query.stop()

    val streamed = lastLabels.as[(Long, Long)].collect().toMap
    val batch = graft.operators.Dedup
      .connectedComponentsOfEdges(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(streamed === batch)
    // Three true components: the 0..60 path + the even and odd 100..131 chains.
    assert(streamed.values.toSet.size === 3)
  }

  test("streamed incremental dedup converges to the one-shot exact dedup") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // 120 docs over a 40-text vocabulary → plenty of dups within AND across
    // micro-batches. Ids ascend with arrival order, so "first batch wins"
    // and "global min id wins" pick the same representatives.
    val docs = (0 until 120).map(i => (i.toLong, s"text number ${i % 40} body"))

    val stream = MemoryStream[(Long, String)]
    // The accumulating corpus state a real ingest keeps as a table: each
    // trigger dedups its batch against the index and appends the survivors.
    var corpus = Seq.empty[(String, Long)].toDF("fp", "keep_id")
    val query = stream.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val survivors = Dedup.incremental(b, corpus.select(col("fp")))
          .select(col("fp"), col("keep_id"))
          .localCheckpoint(eager = true) // materialize within the trigger
        corpus = corpus.unionByName(survivors)
        ()
      }.start()
    try {
      for (b <- docs.grouped(50)) { stream.addData(b); query.processAllAvailable() }
    } finally query.stop()

    val streamedKeeps = corpus.select("keep_id").collect().map(_.getLong(0)).toSet
    val batchKeeps = Dedup.exact(docs.toDF("doc_id", "text"))
      .select("keep_id").collect().map(_.getLong(0)).toSet
    assert(streamedKeeps === batchKeeps)
    assert(streamedKeeps.size === 40)
  }
}
