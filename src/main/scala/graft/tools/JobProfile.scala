package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB wall-clock breakdown of one SparkEntry query — the guide-§1
  * "decide whether the time is going to shuffle read, compute, or
  * scheduling" loop for a query that runs MANY small jobs (the
  * store-fold family), where the SQL tab's per-operator metrics of any
  * single job say nothing about the query's wall time. Usage:
  *
  *   sbt "runMain graft.tools.JobProfile <sfDir> <query> [warmRuns]"
  *
  * Prints one line per Spark job (wall ms, #stages, #tasks, first 80
  * chars of the job group description / callsite) plus the gaps BETWEEN
  * jobs (driver-side work: planning, file listing, fs calls) — the two
  * buckets that explain a fold-heavy query's seconds. */
object JobProfile {
  private final case class Job(id: Int, desc: String,
                               var start: Long = 0L, var end: Long = 0L,
                               var tasks: Int = 0, var stages: Int = 0)

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
      // Shuffled-hash join allowed where its size conditions hold (r17,
      // guide §3.1/§9): the planner's guards still apply — this only
      // stops Spark PREFERRING the sort in sort-merge when a hash build
      // fits; measured −20..−35% on the join-heavy bench families with
      // no regressions (OPTIMIZATION_r17.md).
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    def once(): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // Warm-up: JIT + codegen + footer caches, like Bench.
    try fn(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    (1 to warm).foreach(_ => once())

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val order = new java.util.concurrent.CopyOnWriteArrayList[Int]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        val j = Job(e.jobId, desc, start = e.time)
        j.stages = e.stageInfos.size
        jobs.put(e.jobId, j)
        order.add(e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId); if (j != null) j.end = e.time
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    once()
    val wall = (System.nanoTime() - t0) / 1e9
    // Listener bus is async — drain before reading.
    Thread.sleep(500)
    spark.sparkContext.removeSparkListener(listener)

    import scala.jdk.CollectionConverters._
    val js = order.asScala.toSeq.flatMap(id => Option(jobs.get(id)))
    println(f"\n=== $name: wall ${wall}%.3f s, ${js.size} jobs ===")
    var prevEnd = 0L
    var jobMs = 0L
    var gapMs = 0L
    js.foreach { j =>
      val ms = j.end - j.start
      jobMs += ms
      val gap = if (prevEnd == 0L) 0L else math.max(0L, j.start - prevEnd)
      gapMs += gap
      prevEnd = math.max(prevEnd, j.end)
      println(f"job ${j.id}%4d ${ms}%6d ms  gap ${gap}%5d ms  stages ${j.stages}%2d  ${j.desc.take(110)}")
    }
    println(f"=== sum(job) ${jobMs}%d ms, sum(gap-between-jobs) ${gapMs}%d ms, wall ${(wall * 1000).toLong}%d ms ===")
    spark.stop()
  }
}
