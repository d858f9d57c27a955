package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.{CrawlIngest, CrawlMedia}

/** Scale soak for the SHARED-DECODE crawl pass (r12 verdict #2): mixed
  * `.warc.gz` files — an HTML page, a picture, an audio clip per id —
  * run at 1×/2×/4× through (a) the two INDEPENDENT passes
  * ([[CrawlIngest.fetchesFrom]] + [[CrawlMedia.mediaFrom]], each paying
  * its own gunzip → WARC → HTTP → sniff chain) and (b) the COMBINED
  * pass ([[CrawlMedia.combinedFrom]], one chain forking per record).
  * The reported delta is the decode share the shared pass saves — the
  * second-largest 100 TB cost the r12 verdict named. Not part of the
  * driver contract. */
object SharedSoak {

  @inline private def mix(a: Long, b: Long): Long = {
    var h = a * 0x9e3779b97f4a7c15L + b
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
    h
  }

  private def htmlOf(id: Long): Array[Byte] = {
    val words = (0 until 220).map(i => s"w${mix(id, i) % 5000}")
    (s"<html><head><title>Doc $id</title></head><body><nav>menu one " +
      s"two</nav><p>${words.mkString(" ")}</p></body></html>")
      .getBytes("UTF-8")
  }

  private def pixelsOf(id: Long): Array[Byte] =
    Array.tabulate(256)(i => (mix(id, i.toLong) & 0xffL).toByte)

  private def samplesOf(id: Long): Array[Byte] =
    Array.tabulate(4096)(i => ((mix(id, 1000L + i) % 121L) + 128).toByte)

  private def mixedWarc(id: Long): Array[Byte] = {
    import graft.multimodal.{CrawlMediaPack, MediaPack}
    CrawlMediaPack.warcResponse(s"https://s.soak/page/$id", id, 0,
      CrawlMediaPack.http200("text/html", htmlOf(id))) ++
      CrawlMediaPack.warcResponse(s"https://s.soak/img/$id", id, 1,
        CrawlMediaPack.http200("application/octet-stream",
          CrawlMediaPack.bmp16(pixelsOf(id)))) ++
      CrawlMediaPack.warcResponse(s"https://s.soak/aud/$id", id, 2,
        CrawlMediaPack.http200("application/octet-stream",
          MediaPack.wavContainer(1, samplesOf(id))))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val repsList =
      if (args.length > 1) args(1).split(",").toSeq.map(_.toInt)
      else Seq(1, 2, 4)
    val spark = SparkSession.builder()
      .master("local[32]").appName("graft-shared-soak")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val ids0 = graft.Tables.load(spark, dir, "documents").select(col("doc_id"))

    def filesFor(ids: org.apache.spark.sql.DataFrame) = ids.as[Long]
      .mapPartitions(_.grouped(25).zipWithIndex.map { case (g, gi) =>
        (s"shsoak_${g.head}_$gi.warc.gz", graft.sources.WarcPack.gzipBytes(
          Array.concat(g.map(mixedWarc): _*)))
      }).toDF("path", "content")

    for (reps <- repsList) {
      val ids = ids0
        .withColumn("r", explode(sequence(lit(0L), lit(reps - 1L))))
        .select((col("doc_id") + col("r") * 10000000L).as("doc_id"))
      val files = filesFor(ids).localCheckpoint(true)
      val mb = files.agg(sum(octet_length(col("content")))).head.getLong(0) / 1e6
      def independent(): (Long, Double) = {
        val t0 = System.nanoTime()
        val n = CrawlIngest.fetchesFrom(files).count() +
          CrawlMedia.mediaFrom(files).count()
        (n, (System.nanoTime() - t0) / 1e9)
      }
      def shared(): (Long, Double) = {
        val t0 = System.nanoTime()
        val n = CrawlMedia.combinedFrom(files).count()
        (n, (System.nanoTime() - t0) / 1e9)
      }
      independent(); shared() // warm-up
      val ind = (1 to 3).map(_ => independent())
      val sh = (1 to 3).map(_ => shared())
      val bi = ind.map(_._2).min
      val bs = sh.map(_._2).min
      println(f"SOAK shared-decode reps=$reps%d compressedMB=$mb%.1f " +
        f"rows=${sh.head._1}%d independent=$bi%.2f shared=$bs%.2f " +
        f"saving=${100.0 * (bi - bs) / bi}%.0f%% " +
        s"ind_samples=${ind.map(r => f"${r._2}%.2f").mkString(",")} " +
        s"sh_samples=${sh.map(r => f"${r._2}%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
