package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc probe: time the near-dup pair build and the CC label loop
  * separately at a given SF dir (default sf0.1). Not part of the driver
  * contract — a measurement harness for tuning connectedComponents. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]").appName("cc-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import graft.operators.Dedup
    graft.plans.GraftExtensions.register(spark)
    val docs = graft.Tables.load(spark, dir, "documents")
    def timed[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val pairs = timed("pairs") {
      Dedup.nearDuplicates(docs, 0.2).select(
        col("doc_a").as("src"), col("doc_b").as("dst")).localCheckpoint(true)
    }
    println(s"PROBE n_pairs ${pairs.count()}")
    for (round <- 1 to 2) {
      timed(s"cc_run$round") {
        val r = Dedup.connectedComponents(
          docs.select(col("doc_id").as("node")), pairs)
        println(s"PROBE n_clusters ${r.select("cluster_id").distinct().count()}")
      }
      println(s"PROBE rounds ${Dedup.lastRounds}")
    }

    // Star-fallback stress (r9): a CHAIN is the adversarial shape — the
    // worst case the fallback exists for, and the one where contraction
    // through partial labels barely shrinks the graph (labels shift, they
    // don't collapse). Compare pointer doubling run free (O(log d) rounds)
    // against a deliberately-capped run that forces large-star/small-star
    // to finish the same component.
    val chainN = if (args.length > 1) args(1).toLong else 200000L
    val chain = spark.range(chainN - 1)
      .select(col("id").as("src"), (col("id") + 1L).as("dst"))
      .localCheckpoint(true)
    val nodes = spark.range(chainN).select(col("id").as("node"))
    // driverLimit = 0: these two runs measure the DISTRIBUTED paths (the
    // small-graph union-find gate would otherwise absorb a 200k chain).
    timed(s"chain${chainN}_doubling") {
      val r = Dedup.connectedComponents(nodes, chain, maxIter = 50,
        driverLimit = 0L)
      require(r.filter(col("cluster_id") =!= 0L).count() == 0L)
    }
    println(s"PROBE chain_doubling_rounds ${Dedup.lastRounds}")
    timed(s"chain${chainN}_star_fallback") {
      // maxIter 8 ⇒ doubling covers only 255 hops; the star rounds must
      // resolve the remaining ~chainN-long contracted chain.
      val r = Dedup.connectedComponents(nodes, chain, maxIter = 8,
        driverLimit = 0L)
      require(r.filter(col("cluster_id") =!= 0L).count() == 0L)
    }

    // Driver union-find vs distributed loop crossover (the r9 small-graph
    // gate): random graphs at three edge scales, both paths, same labels.
    for (m <- Seq(100000L, 500000L, 1000000L)) {
      val rpairs = spark.range(m).select(
          pmod(xxhash64(col("id")), lit(m)).as("src"),
          pmod(xxhash64(col("id") + 7L), lit(m)).as("dst"))
        .filter(col("src") =!= col("dst"))
        .localCheckpoint(true)
      val rnodes = spark.range(m).select(col("id").as("node"))
      timed(s"rand${m}_driver_uf") {
        require(Dedup.connectedComponents(rnodes, rpairs,
          driverLimit = Long.MaxValue).count() == m)
      }
      timed(s"rand${m}_dist_loop") {
        require(Dedup.connectedComponents(rnodes, rpairs,
          driverLimit = 0L).count() == m)
      }
    }
    spark.stop()
  }
}
