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
    spark.stop()
  }
}
