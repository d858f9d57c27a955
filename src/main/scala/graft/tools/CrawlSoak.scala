package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.{HttpPack, WarcPack}
import graft.streaming.CrawlIngest

/** Scale soak for the crawl→text chain (r10 verdict #6): build
  * Common-Crawl-shaped `.warc.gz` files (per-record gzip members,
  * HTTP-wrapped HTML payloads) from the documents corpus, replicated
  * 1×/2×/4× with disjoint ids, and run the COMPLETE
  * [[CrawlIngest.documentsFrom]] chain — gzip member walk, WARC
  * framing, HTTP split, charset decode, tag strip — end-to-end,
  * recording wall time and MB/s. Linearity across the three points is
  * the "would this survive 10×?" evidence for SCALE.md; the chain has
  * no shuffle, so the only way it can bend is per-record constant-factor
  * regressions. Not part of the driver contract. */
object CrawlSoak {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docsPerFile = if (args.length > 1) args(1).toInt else 50
    val repsList =
      if (args.length > 2) args(2).split(",").toSeq.map(_.toInt)
      else Seq(1, 2, 4)
    val spark = SparkSession.builder()
      .master("local[32]").appName("graft-crawl-soak")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs0 = graft.Tables.load(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))

    for (reps <- repsList) {
      val docs = docs0
        .withColumn("r", explode(sequence(lit(0L), lit(reps - 1L))))
        .withColumn("doc_id", col("doc_id") + col("r") * 10000000L)
        .drop("r")
      val files = docs.as[(Long, String)]
        .mapPartitions { it =>
          it.grouped(docsPerFile).zipWithIndex.map { case (group, gi) =>
            val members = group.map { case (id, text) =>
              val esc = text.replace("&", "&amp;").replace("<", "&lt;")
                .replace(">", "&gt;")
              val page = s"<html><head><title>t$id</title></head>" +
                "<body><p>" + esc + "</p></body></html>"
              val http = HttpPack.httpMessage(
                Seq("Content-Type" -> "text/html; charset=utf-8"),
                page.getBytes("UTF-8"))
              // One gzip member per record — the .warc.gz convention.
              WarcPack.gzipBytes(WarcPack.warcFile(id, http))
            }
            (s"soak_${reps}_${group.head._1}_$gi", Array.concat(members: _*))
          }
        }.toDF("path", "content").localCheckpoint(true)
      val nFiles = files.count()
      val mb = files.agg(sum(octet_length(col("content")))).head.getLong(0) / 1e6
      def pass(): (Long, Double) = {
        val t0 = System.nanoTime()
        val n = CrawlIngest.documentsFrom(files).count()
        (n, (System.nanoTime() - t0) / 1e9)
      }
      pass() // warm-up
      val runs = (1 to 3).map(_ => pass())
      val n = runs.head._1
      val best = runs.map(_._2).min
      println(f"SOAK crawl reps=$reps%d files=$nFiles%d compressedMB=$mb%.1f " +
        f"docs=$n%d sec=$best%.2f mbps=${mb / best}%.1f " +
        s"samples=${runs.map(r => f"${r._2}%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
