package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.CrawlMedia

/** Scale soak for the crawl→media pipe (r11 verdict #1): two claims,
  * two phases.
  *
  * PIPE phase — `.warc.gz` files of BMP pictures + PCM WAV audio
  * (unique-ish content from a 64-bit mix; every 10th record a
  * re-encoding of its predecessor, so the dup rate is constant) run
  * through the complete [[CrawlMedia.mediaFrom]] chain (gzip → WARC →
  * HTTP → sniff → pixel/PCM decode → phash + Haar fingerprint) at
  * 1×/2×/4×: the chain has no shuffle, so wall time must be linear.
  *
  * INCREMENTAL phase — a FIXED batch scored with
  * [[CrawlMedia.pairsIncremental]] against stores of 1×/2×/4× media:
  * the banded candidate join touches only the batch's band buckets, so
  * per-batch cost must stay ~flat as the store grows — the steady-state
  * claim that makes a durable media store viable at corpus scale. The
  * pipe hashes at nCells = 48 here (the production setting): 16-bit
  * hashes leave ~6-bit band keys whose buckets grow with the corpus —
  * the r11 band-entropy trap — while 48 bits keep candidates
  * batch-proportional. Not part of the driver contract. */
object MediaSoak {

  @inline private def mix(a: Long, b: Long): Long = {
    var h = a * 0x9e3779b97f4a7c15L + b
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
    h
  }

  /** 16×16 gray pixels from the id (row-major mix bytes). */
  private def pixelsOf(id: Long): Array[Byte] =
    Array.tabulate(256)(i => (mix(id, i.toLong) & 0xffL).toByte)

  /** 4096 8-bit-exact samples from the id. */
  private def samplesOf(id: Long): Array[Int] =
    Array.tabulate(4096)(i => ((mix(id, 1000L + i) % 121L).toInt))

  /** One media WARC for `id`: a picture + an audio clip (the pack's
    * shared BMP/WAV/HTTP/WARC encoders — review r12: the soak must
    * frame bytes exactly as the oracle-checked fixtures do); every
    * 10th id reuses id−1's content (constant dup rate for the pair
    * stages). */
  private def mediaWarc(id: Long): Array[Byte] = {
    import graft.multimodal.{CrawlMediaPack, MediaPack}
    val src = if (id % 10 == 9) id - 1 else id
    val wav = MediaPack.wavContainer(1,
      samplesOf(src).map(v => (v + 128).toByte))
    CrawlMediaPack.warcResponse(s"https://m.soak/img/$id", id, 0,
      CrawlMediaPack.http200("application/octet-stream",
        CrawlMediaPack.bmp16(pixelsOf(src)))) ++
      CrawlMediaPack.warcResponse(s"https://m.soak/aud/$id", id, 1,
        CrawlMediaPack.http200("application/octet-stream", wav))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val repsList =
      if (args.length > 1) args(1).split(",").toSeq.map(_.toInt)
      else Seq(1, 2, 4)
    val batchDocs = if (args.length > 2) args(2).toInt else 250
    val spark = SparkSession.builder()
      .master("local[32]").appName("graft-media-soak")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val ids0 = graft.Tables.load(spark, dir, "documents").select(col("doc_id"))

    def filesFor(ids: org.apache.spark.sql.DataFrame) = ids.as[Long]
      .mapPartitions(_.grouped(25).zipWithIndex.map { case (g, gi) =>
        (s"soak_${g.head}_$gi.warc.gz", graft.sources.WarcPack.gzipBytes(
          Array.concat(g.map(mediaWarc): _*)))
      }).toDF("path", "content")

    for (reps <- repsList) {
      val ids = ids0
        .withColumn("r", explode(sequence(lit(0L), lit(reps - 1L))))
        .select((col("doc_id") + col("r") * 10000000L).as("doc_id"))
      val files = filesFor(ids).localCheckpoint(true)
      val mb = files.agg(sum(octet_length(col("content")))).head.getLong(0) / 1e6
      // PIPE phase: decode + fingerprint, production hash width.
      def pipe(): (Long, Double) = {
        val t0 = System.nanoTime()
        val n = CrawlMedia.mediaFrom(files, nCells = 48).count()
        (n, (System.nanoTime() - t0) / 1e9)
      }
      pipe() // warm-up
      val runs = (1 to 3).map(_ => pipe())
      val n = runs.head._1
      println(f"SOAK media-pipe reps=$reps%d compressedMB=$mb%.1f media=$n%d " +
        f"sec=${runs.map(_._2).min}%.2f mbps=${mb / runs.map(_._2).min}%.1f " +
        s"samples=${runs.map(r => f"${r._2}%.2f").mkString(",")}")

      // INCREMENTAL phase: fixed batch vs the reps-sized store.
      val store = CrawlMedia.mediaFrom(files, nCells = 48)
        .localCheckpoint(true)
      val batchIds = ids0.limit(batchDocs)
        .select((col("doc_id") + lit(90000000L)).as("doc_id"))
      val batch = CrawlMedia.mediaFrom(filesFor(batchIds).localCheckpoint(true),
        nCells = 48).localCheckpoint(true)
      def inc(): (Long, Double) = {
        val t0 = System.nanoTime()
        val n = CrawlMedia.pairsIncremental(store, batch, nBits = 48).count()
        (n, (System.nanoTime() - t0) / 1e9)
      }
      inc() // warm-up
      val incs = (1 to 3).map(_ => inc())
      println(f"SOAK media-inc reps=$reps%d store=${store.count()}%d " +
        f"batch=${batch.count()}%d pairs=${incs.head._1}%d " +
        f"sec=${incs.map(_._2).min}%.2f " +
        s"samples=${incs.map(r => f"${r._2}%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
