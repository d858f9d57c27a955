package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Steady-state cost/benefit probe for the streaming auto-compaction
  * guard (r10, VERDICT r9 #6): replay the sf events fixture through the
  * full `StreamShell.attach` path into a durable [[graft.store
  * .ParquetStore]] twice — guard OFF vs ON — and report wall seconds,
  * per-generation file counts, and the post-run full-scan time (the
  * footer-open cost the guard exists to bound). Results go to SCALE.md.
  * Not part of the driver contract. */
object CompactProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val perTrigger = if (args.length > 1) args(1).toInt else 1
    val spark = SparkSession.builder()
      .master("local[32]").appName("graft-compact-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.config.{BucketType, MsgSettings}

    // At fixture scale AQE coalesces every micro-batch's aggregate into
    // ONE shuffle partition (= one file per generation), hiding the decay
    // this probe measures: a production micro-batch whose output exceeds
    // the 64 MB advisory keeps its shuffle-partition fanout. Pin that
    // regime explicitly, like the StreamShellSpec fixture does.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    graft.Bench.withStagedEvents(spark, sfDir) { (path, schema, rows) =>
      def run(tag: String, autoCompact: Long): Unit = {
        val storeDir = java.nio.file.Files
          .createTempDirectory(s"graft_cp_$tag").toString
        val stream = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", perTrigger.toString).parquet(path)
          .select(to_json(struct(col("event_type"), col("user_id"),
            expr("ts_us div 1000000").as("timestamp"))).as("value"))
        val msg = MsgSettings(
          bucketInterval = 3600, bucketField = "timestamp",
          bucketType = BucketType.Epoch,
          msgMapSchema = Seq("etype" -> "event_type", "uid" -> "user_id"))
        val store = new graft.store.ParquetStore(spark, StructType(Seq(
          StructField("etype", StringType), StructField("uid", StringType),
          StructField("bucket_start", LongType),
          StructField("bucket_end", LongType),
          StructField("count", LongType))), storeDir,
          tableName = s"cp_$tag", cleanFreq = 100000L,
          autoCompactFiles = autoCompact)
        val t0 = System.nanoTime()
        val q = graft.streaming.StreamShell.attach(stream, msg, store,
          trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
        q.awaitTermination()
        val wall = (System.nanoTime() - t0) / 1e9
        val gens = store.maxRstId.getOrElse(0L)
        val files = (1L to gens).map(store.generationFileCount).sum
        val t1 = System.nanoTime()
        val n = store.selectAll.agg(sum("count")).head().getLong(0)
        val scanSec = (System.nanoTime() - t1) / 1e9
        println(f"PROBE $tag rows=$rows wall=$wall%.1f gens=$gens " +
          f"files=$files scan_sec=$scanSec%.2f sum=$n " +
          f"rps=${rows / wall}%.0f")
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(storeDir))
        try walk.iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
        finally walk.close()
      }
      // Twice each, alternating, so JIT warm-up doesn't bias one arm.
      run("off", 0L); run("on", 8L); run("off", 0L); run("on", 8L)
    }
    spark.stop()
  }
}
