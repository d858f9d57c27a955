package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale soak for the round-8 retrieval/eval family ([[graft.functions
  * .Retrieval]], [[graft.operators.Similarity.hardNegatives]]): replicate
  * the sf0.1 fixtures R× with disjoint id offsets (R=10 ≈ sf1, the same
  * narrow-explode shape as [[Soak]]) and run BM25, the hashed-linear
  * classifier, AUC/calibration, and hard-negative mining end-to-end.
  * These are LINEAR ops (no convergence loops) — the soak checks that wall
  * time scales ~linearly and that nothing driver-side grows with the
  * corpus (BM25's stats fetch is one row; AUC's histogram is value-sized
  * regardless of R). Not part of the driver contract. */
object RetrievalSoak {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]").appName("graft-retrieval-soak")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.register(spark)
    import graft.functions.{Retrieval, RetrievalPack}

    def timed(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"SOAK $tag rows=$n%d sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    def replicate(df: DataFrame): DataFrame =
      df.withColumn("r", explode(sequence(lit(0L), lit(reps - 1L))))

    val docs = replicate(graft.Tables.load(spark, dir, "documents"))
      .withColumn("doc_id", col("doc_id") + col("r") * 10000000L)
      .drop("r").localCheckpoint(true)
    println(s"SOAK docs n=${docs.count()}")

    timed("bm25_topk")(
      Retrieval.bm25TopK(docs, RetrievalPack.Bm25Terms, 20).count())
    timed("quality_classifier")(
      Retrieval.hashedLinearMargin(docs).count())
    val labeled = docs.select((col("n_chars") >= RetrievalPack.LabelChars).as("label"),
      Retrieval.marginOf(col("text")).as("margin"))
    timed("classifier_auc")(Retrieval.classifierAuc(labeled).count())
    timed("classifier_calibration")(
      Retrieval.classifierCalibration(labeled).count())

    // ~sf1 embeddings: R disjoint id ranges, labels unchanged — every
    // sign-bucket cell grows R×, the honest densification for the
    // cross-label candidate join.
    val emb = replicate(graft.Tables.load(spark, dir, "embeddings"))
      .withColumn("vec_id", col("vec_id") + col("r") * 10000000L)
      .drop("r").localCheckpoint(true)
    println(s"SOAK emb n=${emb.count()}")
    timed("hard_negatives")(
      graft.operators.Similarity.hardNegatives(
        emb, emb.filter(col("vec_id") % 50 === 0), k = 10, bits = 4).count())
    spark.stop()
  }
}
