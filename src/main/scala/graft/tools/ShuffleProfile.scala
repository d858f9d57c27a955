package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Total shuffle bytes/records and input bytes of one SparkEntry query —
  * the drift-immune companion to [[JobProfile]] (guide §2.3: "shuffle
  * fewer bytes" is the claim; wall clock on a host with ambient I/O
  * turbulence cannot evidence it, task metrics can). Usage:
  *
  *   sbt "runMain graft.tools.ShuffleProfile <sfDir> <query> [warmRuns]"
  */
object ShuffleProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args(1)
    val warm = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    def once(): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    try fn(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    (1 to warm).foreach(_ => once())

    val shufWrite = new LongAdder
    val shufRecords = new LongAdder
    val input = new LongAdder
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          shufWrite.add(m.shuffleWriteMetrics.bytesWritten)
          shufRecords.add(m.shuffleWriteMetrics.recordsWritten)
          input.add(m.inputMetrics.bytesRead)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    once()
    Thread.sleep(500) // listener bus is async
    spark.sparkContext.removeSparkListener(listener)
    println(f"=== $name: shuffle ${shufWrite.sum()}%d bytes / " +
      f"${shufRecords.sum()}%d records written, input ${input.sum()}%d bytes ===")
    spark.stop()
  }
}
