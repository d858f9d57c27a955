package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.store.Takedown

/** Measures what archive erasure costs ([[Takedown.eraseExports]]) as a
  * function of HOW MANY archives the victims touch: the probe reads
  * only each archive's sibling CDX (tiny), the rewrite inflates and
  * re-writes only TOUCHED archives — so N victims concentrated in one
  * archive should cost one archive's rewrite plus N-1 index reads,
  * while victims smeared across every archive rewrite the whole
  * export. SCALE.md's export-erasure row derives its batching guidance
  * from this (accumulate notices, erase on the maintenance cadence),
  * and the clean-rerun row pins the idempotence cost (manifest reads
  * only). Not part of the driver contract. */
object ExportEraseProbe {

  def main(args: Array[String]): Unit = {
    val archiveCounts =
      if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(16, 64)
    val recordsPerArchive = 256
    val spark = SparkSession.builder()
      .master("local[32]").appName("graft-export-erase-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    for (n <- archiveCounts) {
      def build(): String = {
        val dir = Files.createTempDirectory(s"graft_xep_$n").toString
        val rows = spark.range(n.toLong * recordsPerArchive)
          .select(
            concat(lit("g"), col("id") % n).as("file_group"),
            concat(lit("https://probe.org/d/"), col("id")).as("url"),
            lit("2024-01-01T00:00:00Z").as("warc_date"),
            lit("text/plain").as("content_type"),
            // ~8 KiB bodies x 256 records: ~2 MB inflated per archive,
            // so the rewrite cost is archive IO, not job overhead.
            encode(concat(lit("body "), col("id"), lit(" "),
              repeat(lit("x"), 8192)), "UTF-8").as("body"))
        graft.sources.Warc.writeFiles(
          graft.sources.Warc.encodeResponses(rows, withCdx = true), dir)
        dir
      }
      def tdOf(urls: Seq[String]) = {
        val td = Takedown.takedownStore(spark,
          Files.createTempDirectory("graft_xep_td").toString,
          s"xep_td_${System.nanoTime()}")
        Takedown.request(td,
          urls.map((_, "probe")).toDF("key", "reason"))
        td
      }
      def time(f: => Long): (Double, Long) = {
        val t0 = System.nanoTime()
        val r = f
        ((System.nanoTime() - t0) / 1e9, r)
      }
      // Concentrated: victims all in archive g0 (ids ≡ 0 mod n).
      val a = build()
      val tdA = tdOf((0 until recordsPerArchive)
        .map(i => s"https://probe.org/d/${i.toLong * n}"))
      val (tA, kA) = time(Takedown.eraseExports(spark, a, tdA))
      // Smeared: one victim per archive (ids 0..n-1).
      val b = build()
      val tdB = tdOf((0 until n).map(i => s"https://probe.org/d/$i"))
      val (tB, kB) = time(Takedown.eraseExports(spark, b, tdB))
      // Clean rerun on the smeared export: probe-only (manifest reads).
      val (tC, kC) = time(Takedown.eraseExports(spark, b, tdB))
      println(f"archives=$n%4d recs/archive=$recordsPerArchive " +
        f"concentrated=${tA}%6.2fs (touched $kA) " +
        f"smeared=${tB}%6.2fs (touched $kB) " +
        f"rerun=${tC}%6.2fs (touched $kC)")
      graft.Fs.deleteRecursively(Paths.get(a))
      graft.Fs.deleteRecursively(Paths.get(b))
    }
    spark.stop()
  }
}
