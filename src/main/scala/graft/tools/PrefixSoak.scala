package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adversarial-density + steady-state soak for the exact PPJoin family
  * (VERDICT r8 #7/#2). Two experiments, results recorded in SCALE.md:
  *
  *  1. TEMPLATE CLIQUE: the sf0.1 documents corpus plus a `clique`-doc
  *     family of near-identical templated documents (each mutates one
  *     word position of a shared ~40-word template with a doc-unique
  *     token). The true ≥-threshold pair set of the clique is itself
  *     quadratic (C(clique, 2) pairs), which is the stress case for the
  *     completeness claim: measure the candidate DISTINCT rows vs the
  *     true output rows (`Dedup.scala`'s "candidates approach the true
  *     pair count" claim), and the end-to-end wall for `prefixJaccard`
  *     and `clustersExact`-equivalent CC over the pairs.
  *
  *  2. FROZEN-INDEX STEADY STATE: snapshot [[graft.store.PrefixIndexStore]]
  *     at 1×/2×/4× replicated corpora and score the SAME batch against
  *     each — per-batch wall must stay ~flat as the corpus grows (the
  *     whole point of the durable index: O(batch) scoring, one corpus
  *     pass per snapshot).
  *
  * Not part of the driver contract. */
object PrefixSoak {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val clique = if (args.length > 1) args(1).toInt else 5000
    val spark = SparkSession.builder()
      .master("local[32]").appName("graft-prefix-soak")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.register(spark)
    import graft.operators.Dedup

    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SOAK $tag sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      r
    }

    val docs = graft.Tables.load(spark, dir, "documents")
      .select("doc_id", "text")

    // --- 1. Template clique (skipped when clique == 0) ----------------
    // 40-word template; doc k swaps word (k mod 40) for a k-unique token.
    // Pairwise Jaccard of two mutated docs ≈ (shared shingles)/(union) —
    // far above 0.5 when a single word of 40 differs.
    if (clique > 0) {
      val cliqueDocs = spark.range(clique.toLong)
        .select((col("id") + 100000000L).as("doc_id"),
          concat_ws(" ",
            (1 to 40).map(i =>
              when(pmod(col("id"), lit(40)) === (i - 1),
                concat(lit("uniq"), col("id").cast("string")))
                .otherwise(lit(s"templateword$i"))): _*).as("text"))
      val corpus = docs.unionByName(cliqueDocs).localCheckpoint(true)
      println(s"SOAK corpus n=${corpus.count()} (clique $clique)")

      val (_, _, prefix) = Dedup.prefixIndexTables(corpus, 0.5)
      val prefixChk = prefix.localCheckpoint(true)
      println(s"SOAK prefix_postings n=${prefixChk.count()}")
      val nCand = timed("candidates") {
        Dedup.prefixCandidates(prefixChk, 500000L).count()
      }
      val nPairs = timed("prefix_jaccard_full") {
        Dedup.prefixJaccard(corpus, 0.5).count()
      }
      val truePairs = clique.toLong * (clique - 1) / 2
      println(f"SOAK clique_true=$truePairs candidates=$nCand output=$nPairs " +
        f"cand_over_output=${nCand.toDouble / math.max(nPairs, 1)}%.2f")
    }

    // --- 2. Frozen-index steady state ---------------------------------
    // Matching batch: output pairs grow with corpus replicas (each batch
    // doc re-matches per shard), so its score time is OUTPUT-sized. The
    // no-match batch (doc-unique tokens, zero candidates) isolates the
    // pure index-probe cost — the number that must stay flat.
    val batch = docs.limit(2000).localCheckpoint(true)
    val noMatch = spark.range(2000)
      .select((col("id") + 900000000L).as("doc_id"),
        concat_ws(" ", (1 to 10).map(i =>
          concat(lit(s"nomatch${i}_"), col("id").cast("string"))): _*).as("text"))
      .localCheckpoint(true)
    println(s"SOAK batch n=${batch.count()}")
    for (reps <- Seq(1, 2, 4)) {
      val big =
        if (reps == 1) docs
        else docs.withColumn("r", explode(sequence(lit(0L), lit(reps - 1L))))
          .select((col("doc_id") + col("r") * 10000000L).as("doc_id"), col("text"))
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_pidx_soak$reps")
      val store = new graft.store.PrefixIndexStore(spark, tmp.toString,
        threshold = 0.5, name = s"pidx_soak$reps")
      timed(s"snapshot_${reps}x") { store.snapshot(big) }
      val n = timed(s"score_batch_vs_${reps}x") { store.scoreBatch(batch).count() }
      println(s"SOAK score_batch_vs_${reps}x pairs=$n")
      val n0 = timed(s"score_nomatch_vs_${reps}x") { store.scoreBatch(noMatch).count() }
      println(s"SOAK score_nomatch_vs_${reps}x pairs=$n0")
      graft.Fs.deleteRecursively(tmp)
    }

    // --- 3. Append-log steady state (r9): between re-snapshots, corpus
    // growth costs O(delta) — each append ranks ONLY the new docs under
    // the frozen base order. Deltas reuse the corpus docs with offset ids
    // (same text mass as a real ingest batch).
    val tmpA = java.nio.file.Files.createTempDirectory("graft_pidx_append")
    val aStore = new graft.store.PrefixIndexStore(spark, tmpA.toString,
      threshold = 0.5, name = "pidx_soak_append", keepSnapshots = 100L)
    timed("append_base_snapshot") { aStore.snapshot(docs) }
    for (i <- 1 to 3) {
      val delta = docs.limit(2000)
        .select((col("doc_id") + i * 50000000L).as("doc_id"), col("text"))
      timed(s"append_delta_$i") { aStore.appendDocs(delta) }
    }
    val nA = timed("append_score") { aStore.scoreBatch(batch).count() }
    println(s"SOAK append_score pairs=$nA")
    locally {
      graft.Fs.deleteRecursively(tmpA)
    }

    // --- 4. Pruning-decay curve (r10, VERDICT r9 #2): candidate volume
    // per corpus doc, deltas vs base, as append-only DRIFTED deltas
    // accumulate to 1×/2×/4× of a controlled tail-family. Drift model:
    // topical boilerplate — a trending phrase that exists RARELY in the
    // base (df=2: it started organically) then floods every delta doc,
    // whose body text comes from a family the base holds 3 copies of
    // (df=3 > the phrase's 2, so under the FROZEN order the phrase wins
    // the prefix slots of every delta doc — the hot-posting mechanism;
    // a fresh order ranks the phrase common and evicts it). The probe
    // batch carries the same phrase over doc-unique junk, so every
    // candidate is pruning WASTE (zero true matches). After the curve, a
    // re-snapshot + one more drifted delta at the same volume shows the
    // trigger going quiet.
    val tmpD = java.nio.file.Files.createTempDirectory("graft_pidx_decay")
    val dStore = new graft.store.PrefixIndexStore(spark, tmpD.toString,
      threshold = 0.5, name = "pidx_soak_decay", keepSnapshots = 100L)
    val phrase = "breaking viral trend update exclusive "
    def tailText(tid: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      concat_ws(" ", (1 to 45).map(i =>
        concat(lit(s"tail${i}x"), tid.cast("string"))): _*)
    val dupFamily = spark.range(500)
      .withColumn("r", explode(sequence(lit(0), lit(2))))
      .select((lit(700000000L) + col("id") * 10 + col("r")).as("doc_id"),
        tailText(col("id")).as("text"))
    val phraseSeed = spark.range(2)
      .select((col("id") + 800000000L).as("doc_id"),
        concat(lit(phrase), concat_ws(" ", (1 to 45).map(i =>
          concat(lit(s"seed${i}_"), col("id").cast("string"))): _*)).as("text"))
    def driftedDelta(n: Int, off: Long): DataFrame = spark.range(n)
      .select((col("id") + off).as("doc_id"),
        concat(lit(phrase), tailText(pmod(col("id"), lit(500)))).as("text"))
    val dProbe = spark.range(200)
      .select((col("id") + 950000000L).as("doc_id"),
        concat(lit(phrase), concat_ws(" ", (1 to 45).map(i =>
          concat(lit(s"probe${i}_"), col("id").cast("string"))): _*)).as("text"))
      .localCheckpoint(true)
    timed("decay_base_snapshot") {
      dStore.snapshot(docs.unionByName(dupFamily).unionByName(phraseSeed))
    }
    def decayPoint(tag: String): Unit = {
      val t0 = System.nanoTime()
      val d = dStore.pruningDecay(dProbe)
      val probeSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val n = dStore.scoreBatch(dProbe).count()
      val scoreSec = (System.nanoTime() - t1) / 1e9
      println(f"SOAK decay_$tag ratio=${d.ratio}%.2f baseRate=${d.baseRate}%.4f " +
        f"deltaRate=${d.deltaRate}%.4f candBase=${d.baseCandidates} " +
        f"candDelta=${d.deltaCandidates} deltaDocs=${d.deltaDocs} " +
        f"trigger=${dStore.shouldResnapshot(dProbe)} " +
        f"probe_sec=$probeSec%.1f score_sec=$scoreSec%.1f matches=$n")
    }
    decayPoint("0x")
    timed("decay_append_1x") { dStore.appendDocs(driftedDelta(2000, 200000000L)) }
    decayPoint("1x")
    timed("decay_append_2x") { dStore.appendDocs(driftedDelta(2000, 300000000L)) }
    decayPoint("2x")
    timed("decay_append_4x") { dStore.appendDocs(driftedDelta(4000, 400000000L)) }
    decayPoint("4x")
    // Re-snapshot folds the drifted mass into the order; the SAME delta
    // volume then appends without disproportionate candidates.
    timed("decay_resnapshot") {
      dStore.snapshot(docs.unionByName(dupFamily).unionByName(phraseSeed)
        .unionByName(driftedDelta(2000, 200000000L))
        .unionByName(driftedDelta(2000, 300000000L))
        .unionByName(driftedDelta(4000, 400000000L)))
    }
    timed("decay_append_fresh") { dStore.appendDocs(driftedDelta(2000, 600000000L)) }
    decayPoint("post_resnapshot_1x")
    locally {
      graft.Fs.deleteRecursively(tmpD)
    }
    spark.stop()
  }
}
