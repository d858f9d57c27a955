package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale soak for the ITERATIVE operators (the ones whose failure mode is
  * planner/driver blow-up, not a wrong row): replicate the sf0.1 fixtures
  * R× with disjoint key offsets — R=10 approximates sf1 — and run the
  * dedup-clusters, PageRank, and label-propagation paths end-to-end,
  * recording wall time and iteration counts. Results land in SCALE.md.
  *
  * Replication is a NARROW explode (no shuffle): each replica r offsets
  * every key by r·stride, so the graph becomes R disjoint copies — R× the
  * nodes and R× the edges, the honest "would this survive 10×?" shape.
  * The PageRank/label-prop paths run TWICE: once with the default
  * size-conditional broadcast (still under [[graft.operators.Graphs
  * .BroadcastNodeLimit]] at R=10) and once with the hints force-disabled
  * (`broadcastNodeLimit = 0`) — soaking the exact keyed-shuffle fallback
  * a 100×-node cluster run would take. Not part of the driver contract. */
object Soak {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]").appName("graft-soak")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.register(spark)
    import graft.operators.{Dedup, Graphs}

    def timed(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"SOAK $tag rows=$n%d sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    /** r ∈ [0, reps) replica index, exploded narrowly (no shuffle). */
    def replicate(df: DataFrame): DataFrame =
      df.withColumn("r", explode(sequence(lit(0L), lit(reps - 1L))))

    // ~sf1 documents: doc_id offset per replica, text unchanged — the
    // near-dup pair structure repeats per shard, clusters stay bounded.
    val docs = replicate(graft.Tables.load(spark, dir, "documents"))
      .withColumn("doc_id", col("doc_id") + col("r") * 10000000L)
      .drop("r").localCheckpoint(true)
    println(s"SOAK docs n=${docs.count()}")
    timed("dedup_clusters") {
      val out = Dedup.clusters(docs, 0.2)
      val n = out.count()
      println(s"SOAK dedup_clusters cc_rounds=${Dedup.lastRounds}")
      n
    }

    // ~sf1 co-purchase graph: both keys offset → `reps` disjoint copies.
    val li = replicate(graft.Tables.load(spark, dir, "lineitem")
        .select("l_orderkey", "l_partkey"))
      .select((col("l_orderkey") + col("r") * 1000000000L).as("l_orderkey"),
        (col("l_partkey") + col("r") * 100000000L).as("l_partkey"))
    var edges: DataFrame = null
    timed("edge_build") {
      edges = Graphs.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
        .localCheckpoint(true)
      edges.count()
    }
    val seeds = edges.select(col("u").as("node"))
      .unionAll(edges.select(col("v").as("node"))).distinct()
      .filter(col("node") % 97 === 0).withColumn("label", col("node"))
      .localCheckpoint(true)

    for ((tag, limit) <- Seq(("broadcast", Graphs.BroadcastNodeLimit),
                             ("shuffle", 0L))) {
      timed(s"pagerank_$tag") {
        Graphs.pageRankFixedPoint(edges, iters = 3,
          broadcastNodeLimit = limit).count()
      }
      timed(s"label_prop_$tag") {
        Graphs.labelPropagation(edges, seeds, iters = 3,
          broadcastNodeLimit = limit).count()
      }
      timed(s"hop_distance_$tag") {
        Graphs.hopDistance(edges, seeds.select("node"), maxHops = 3,
          broadcastNodeLimit = limit).count()
      }
      timed(s"ppr_$tag") {
        Graphs.personalizedPageRank(edges, seeds.select("node"), iters = 3,
          broadcastNodeLimit = limit).count()
      }
      timed(s"weighted_hops_$tag") {
        Graphs.weightedHopDistance(
          edges.withColumn("w", lit(1L) + pmod(col("u") + col("v"), lit(3L))),
          seeds.select("node"), maxHops = 3,
          broadcastNodeLimit = limit).count()
      }
    }

    // k-core peel over the ~sf1 simhash similarity graph (the q_kcore
    // path): pair generation is the banded self-join, then the
    // convergence-looped peel — checks round count and that the shrinking
    // checkpoint cadence holds at 10×.
    timed("kcore") {
      Graphs.kCore(
        Dedup.simhashPairs(docs, maxHamming = 8)
          .select(col("doc_a").as("u"), col("doc_b").as("v")),
        k = 4).count()
    }

    // Passage scrubbing over the ~sf1 corpus (the q_passage_scrub path):
    // word/gram explodes scale linearly; the replicated text means every
    // passage's sharing degree ALSO multiplies by reps — the occurrence
    // fan-out (linear, no self-join) is exactly what the no-cap claim in
    // SCALE.md rests on, so soak it.
    timed("passage_scrub") {
      // Force with a noop WRITE (Bench's discipline), not count(): the
      // op's tail is a left join from docs against a grouped (key-unique)
      // right side, and distinct-key propagation lets a bare count()
      // eliminate the join — and with it the whole scrub.
      Dedup.scrubPassages(docs, w = 5, minDocs = 2L)
        .write.format("noop").mode("overwrite").save()
      docs.count() // output is docs-sized by construction
    }

    // PPJoin over the replicated corpus — deliberately ADVERSARIAL for a
    // COMPLETE similarity join: every document's text recurs `reps`×, so
    // the true answer alone holds C(reps,2) pairs per base doc (plus each
    // shard's internal near-dups ×reps) — the output-sized-candidates
    // regime the operator's scaladoc claims is its worst case.
    timed("prefix_jaccard") {
      Dedup.prefixJaccard(docs, 0.5).count()
    }

    // Non-iterative hot paths whose state is an in-memory artifact (CMS
    // sketch, per-key period set, bigram model) — the soak checks the
    // artifact stays bounded as rows scale 10×. Replicated events keep
    // their timestamps (periods per user unchanged — the claimed bound),
    // users disjoint per replica.
    val ev = replicate(graft.Tables.load(spark, dir, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("us")))
      .select((col("user_id") + col("r") * 100000000L).as("user_id"), col("us"))
    timed("cohort") {
      graft.operators.Funnel.cohortRetention(ev, 604800000000L).count()
    }
    val terms = docs.select(
      explode(graft.functions.TextFunctions.words(col("text"))).as("term"))
    timed("heavy_hitters") {
      // threshold scales with reps: the same per-shard vocabulary repeats.
      graft.operators.Sketches.heavyHitters(terms, "term",
        threshold = 500L * reps).count()
    }
    timed("heldout_familiarity") {
      graft.functions.TextFunctions.bigramFamiliarityHeldOut(docs,
        graft.operators.Curation.splitOf(col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)) === "train").count()
    }
    // LM-family scoring joins (q_lm_crossent / q_importance_weights):
    // same explode+model-join shape as heldout_familiarity but with the
    // extra vocabulary-sized normalizer join (crossent) resp. the second
    // count model (importance). Replication multiplies corpus size 10×
    // while the bigram vocabulary stays per-shard-identical — the model
    // tables stay bounded, which is exactly the claim to soak.
    timed("lm_crossent") {
      graft.functions.TextFunctions.conditionalCrossent(docs,
        graft.operators.Curation.splitOf(col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)) === "train").count()
    }
    timed("importance_weights") {
      graft.functions.TextFunctions.importanceWeights(docs,
        col("source") === "src0").count()
    }
    spark.stop()
  }
}
