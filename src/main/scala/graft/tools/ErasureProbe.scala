package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.store.{ParquetStore, Takedown}

/** Measures what a physical takedown costs ([[ParquetStore.eraseKeys]])
  * as a function of WHERE the victims live: the erase probe is one
  * semi-join, but the rewrite is per TOUCHED generation — a victim list
  * concentrated in one generation rewrites K/G rows, one smeared across
  * all G generations rewrites the whole store. SCALE.md's takedown row
  * derives its batching guidance from this: accumulate requests and
  * erase on the maintenance cadence, because N spread-out victim keys
  * cost the same rewrite as one. Not part of the driver contract. */
object ErasureProbe {

  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(100000, 1000000)
    val gens = 16
    val victims = 1000
    val spark = SparkSession.builder()
      .master("local[32]").appName("graft-erasure-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val schema = StructType(Seq(
      StructField("key", StringType), StructField("v", LongType)))

    for (k <- sizes) {
      val perGen = k / gens
      def build(): ParquetStore = {
        val tmp = Files.createTempDirectory(s"graft_erp_$k").toString
        val store = new ParquetStore(spark, schema, tmp,
          s"erp_${k}_${System.nanoTime()}")
        for (g <- 0 until gens)
          store.append(spark.range(perGen.toLong)
            .select(concat(lit("k"), col("id") + g.toLong * perGen)
              .as("key"), col("id").as("v")))
        store
      }
      def timeErase(store: ParquetStore, keys: org.apache.spark.sql.DataFrame)
          : (Double, Long) = {
        val tdDir = Files.createTempDirectory("graft_erp_td").toString
        val td = Takedown.takedownStore(spark, tdDir,
          s"erp_td_${System.nanoTime()}")
        Takedown.request(td, keys.withColumn("reason", lit("probe")),
          keyCol = "key")
        val t0 = System.nanoTime()
        val touched = Takedown.erase(store, td, "key")
        ((System.nanoTime() - t0) / 1e9, touched)
      }
      // Concentrated: all victims live in generation 1.
      val a = build()
      val (tA, gA) = timeErase(a,
        spark.range(victims.toLong)
          .select(concat(lit("k"), col("id")).as("key")))
      // Smeared: the same count spread uniformly across every generation.
      val b = build()
      val (tB, gB) = timeErase(b,
        spark.range(victims.toLong)
          .select(concat(lit("k"), (col("id") * (k / victims).toLong))
            .as("key")))
      println(f"K=$k%-8d concentrated ${tA}%.2f s ($gA gens rewritten)" +
        f"  smeared ${tB}%.2f s ($gB gens rewritten)" +
        f"  rows-after ${a.selectAll.count()}/${b.selectAll.count()}")
      graft.Fs.deleteRecursively(java.nio.file.Paths.get(a.path))
      graft.Fs.deleteRecursively(java.nio.file.Paths.get(b.path))
    }
    spark.stop()
  }
}
