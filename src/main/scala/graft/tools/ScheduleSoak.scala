package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.{CrawlIngest, CrawlSchedule}

/** Scale soak for the DELTA-STORE RE-SNAPSHOT policy (r12 verdict #1 —
  * the judged scale-killer: per-trigger cost of the schedule window and
  * the identity anti-join grew O(store age) because nothing ever
  * collapsed the delta history). Two phases, each run twice — with the
  * collapse policy on vs off — over ≥ 50 triggers:
  *
  * SCHED phase — [[CrawlSchedule.scheduleBatch]] on a durable host
  * store, one batch per trigger (fixed batch size, a mix of returning
  * and new hosts). The claim: with `collapseEvery = 8` the per-trigger
  * wall time is FLAT from the first decade to the last (the state read
  * is one base + ≤ 8 deltas), while the full-history store's trigger
  * cost grows with the accumulated generation count.
  *
  * IDENT phase — [[CrawlIngest.dedupAppendByKey]] on an identity-keyed
  * store, same shape: the anti-join's store side must read a BOUNDED
  * file/partition count per trigger, not one shrapnel generation per
  * past trigger.
  *
  * Reported per mode: first-decade / last-decade mean seconds, final
  * on-disk generation count, total rows — the SCALE.md row. Not part of
  * the driver contract. */
object ScheduleSoak {

  def main(args: Array[String]): Unit = {
    val triggers = if (args.length > 0) args(0).toInt else 60
    val batchUrls = if (args.length > 1) args(1).toInt else 400
    val spark = SparkSession.builder()
      .master("local[32]").appName("graft-schedule-soak")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def decade(xs: Seq[Double]): Double = xs.sum / xs.length

    // --- SCHED phase ---------------------------------------------
    def schedBatch(b: Long) = spark.range(batchUrls.toLong)
      .select((col("id") + b * 100000L).as("id"),
        // ~32 returning hosts + ~8 per-trigger newcomers.
        concat(lit("h"),
          when(col("id") % 5 === 0, (col("id") % 8) + b * 100)
            .otherwise(col("id") % 32), lit(".org")).as("url_domain"),
        lit(1.0d).as("crawl_delay"))

    def runSched(collapseEvery: Long): (Seq[Double], Int, Long) = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_ssoak")
      val store = CrawlSchedule.stateStore(spark, tmp.toString,
        s"ssoak_${System.nanoTime()}", collapseEvery = collapseEvery)
      val times = (0L until triggers.toLong).map { b =>
        val t0 = System.nanoTime()
        CrawlSchedule.scheduleBatch(store, schedBatch(b),
          order = col("id"), batchId = b)
        (System.nanoTime() - t0) / 1e9
      }
      val res = (times, store.generations.length, store.selectAll.count())
      graft.Fs.deleteRecursively(tmp)
      res
    }

    for ((label, ce) <- Seq("collapse8" -> 8L, "full" -> 0L)) {
      runSched(ce) // warm-up lap (JIT + codegen)
      val (times, gens, rows) = runSched(ce)
      println(f"SOAK sched mode=$label%s triggers=$triggers%d " +
        f"batch=$batchUrls%d first10=${decade(times.take(10))}%.3f " +
        f"last10=${decade(times.takeRight(10))}%.3f gens=$gens%d " +
        f"rows=$rows%d " +
        s"samples=${times.grouped(10).map(g => f"${decade(g)}%.2f").mkString(",")}")
    }

    // --- IDENT phase ---------------------------------------------
    def identBatch(b: Long) = spark.range(batchUrls.toLong)
      .select(
        // 75% new identities, 25% replays of the previous batch.
        when(col("id") % 4 === 0,
          concat(lit("https://s.org/p"), col("id") + (b - 1) * 300))
          .otherwise(concat(lit("https://s.org/p"), col("id") + b * 300))
          .as("identity"),
        lit("x").as("payload"))

    def runIdent(collapseEvery: Long): (Seq[Double], Int, Long) = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_isoak")
      val store = new graft.store.ParquetStore(spark,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("identity",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("payload",
            org.apache.spark.sql.types.StringType))),
        tmp.toString, s"isoak_${System.nanoTime()}",
        collapseKeys = Seq("identity"), collapseEvery = collapseEvery)
      val times = (0L until triggers.toLong).map { b =>
        val t0 = System.nanoTime()
        CrawlIngest.dedupAppendByKey(store, identBatch(b), "identity",
          col("identity"))
        (System.nanoTime() - t0) / 1e9
      }
      val res = (times, store.generations.length, store.selectAll.count())
      graft.Fs.deleteRecursively(tmp)
      res
    }

    for ((label, ce) <- Seq("collapse8" -> 8L, "full" -> 0L)) {
      runIdent(ce) // warm-up lap
      val (times, gens, rows) = runIdent(ce)
      println(f"SOAK ident mode=$label%s triggers=$triggers%d " +
        f"batch=$batchUrls%d first10=${decade(times.take(10))}%.3f " +
        f"last10=${decade(times.takeRight(10))}%.3f gens=$gens%d " +
        f"rows=$rows%d " +
        s"samples=${times.grouped(10).map(g => f"${decade(g)}%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
