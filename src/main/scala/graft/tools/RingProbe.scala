package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured cost of the retained-history ring (r16 — r15 verdict #4):
  * what does `recordHistory` (append + latest-per-fetch window + ring
  * trim via copy-on-write erase) add to an in-order stats fold, and
  * what does the self-contained interior backfill cost vs the
  * external-history rebuild? Numbers land in SCALE.md. Not part of the
  * driver contract. */
object RingProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]").appName("graft-ring-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Recrawl

    val hist = graft.Tables.load(spark, dir, "events").select(
      concat(lit("https://h"), (col("user_id") % 17L).cast("string"),
        lit(".example/p"), col("user_id").cast("string")).as("url"),
      unix_micros(col("ts")).as("fetch_us"),
      (abs(floor(col("value")).cast("long")) % 5L).cast("string")
        .as("digest"),
      col("event_id"))
      .withColumn("_b", expr(
        "least(greatest((fetch_us div 86400000000 - 19723) div 10, 0L), 2L)"))
      .localCheckpoint(true)
    val rows = hist.count()
    val urls = hist.select("url").distinct().count()
    def tmp(tag: String) =
      java.nio.file.Files.createTempDirectory(s"graft_ringprobe_$tag")
        .toString
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val tie = Seq("event_id")
    val tieF = Seq(org.apache.spark.sql.types.StructField("event_id",
      org.apache.spark.sql.types.LongType))

    // A: in-order folds WITHOUT the ring (the r15 baseline).
    val sA = Recrawl.statsStore(spark, tmp("a"), "ringprobe_a",
      collapseEvery = 4L)
    val (_, tA) = timed {
      Seq(0L, 2L).foreach { b =>
        Recrawl.updateStats(sA, Recrawl.batchStats(
          hist.filter(col("_b") === b), tieBreak = tie),
          batchId = b, scope = "rpA")
      }
    }
    // B: the same folds WITH recordHistory (keep = 8 — a production-ish
    // window; the fixture averages ~rows/urls fetches per URL).
    val sB = Recrawl.statsStore(spark, tmp("b"), "ringprobe_b",
      collapseEvery = 4L)
    val ring = Recrawl.historyStore(spark, tmp("bring"),
      "ringprobe_ring", tieBreak = tieF, collapseEvery = 4L)
    val (_, tB) = timed {
      Seq(0L, 2L).foreach { b =>
        Recrawl.foldBatch(sB, hist.filter(col("_b") === b),
          tieBreak = tie, batchId = b, scope = "rpB",
          historyStore = ring, keepHistory = 8)
      }
    }
    val ringRows = Recrawl.retainedHistory(ring).count()
    // C: the interior backfill via EXTERNAL history (r15 path).
    val (_, tC) = timed {
      Recrawl.backfillStats(sA, hist.filter(col("_b") === 1L),
        history = hist.filter(col("_b") =!= 1L), tieBreak = tie,
        batchId = 10L, scope = "rpA")
    }
    // D: the interior backfill via the RING (r16 path). keep = 8 does
    // NOT cover the whole span for most URLs, so the prefix algebra
    // carries most of them; URLs whose late rows predate their window
    // would fail — this fixture's middle batch lands inside every
    // URL's retained window only when the window reaches back past
    // batch 2 into batch 0... measure with keep large enough (64).
    val sD = Recrawl.statsStore(spark, tmp("d"), "ringprobe_d",
      collapseEvery = 4L)
    val ringD = Recrawl.historyStore(spark, tmp("dring"),
      "ringprobe_ringd", tieBreak = tieF, collapseEvery = 4L)
    Seq(0L, 2L).foreach { b =>
      Recrawl.foldBatch(sD, hist.filter(col("_b") === b),
        tieBreak = tie, batchId = b, scope = "rpD",
        historyStore = ringD, keepHistory = 64)
    }
    val (_, tD) = timed {
      Recrawl.backfillStats(sD, hist.filter(col("_b") === 1L),
        tieBreak = tie, batchId = 10L, scope = "rpD",
        historyStore = ringD, keepHistory = 64)
    }
    println(f"RINGPROBE rows=$rows urls=$urls ringRows(k8)=$ringRows " +
      f"folds_plain=$tA%.2fs folds_ring=$tB%.2fs " +
      f"backfill_ext=$tC%.2fs backfill_ring_k64=$tD%.2fs")
    spark.stop()
  }
}
