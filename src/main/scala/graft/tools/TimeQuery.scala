package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer: `runMain graft.tools.TimeQuery <sfDir> q_a q_b…`
  * runs each named [[graft.SparkEntry]] query with the Bench warm-up +
  * min-of-2 discipline and prints per-query seconds — the iteration loop
  * for optimizing ONE query without paying a full Bench sweep. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
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
    // A/B experiment hook: SPARK_GRAFT_EXTRA_CONF="k=v;k=v" — lets the
    // optimization loop test a conf without recompiling.
    // Entries without '=' (or a trailing ';') fail with a clear message
    // naming the malformed entry instead of a bare MatchError (advice r17).
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").foreach { kv =>
      if (kv.trim.nonEmpty) kv.split("=", 2) match {
        case Array(k, v) => builder.config(k, v)
        case _ => sys.error(
          s"SPARK_GRAFT_EXTRA_CONF entry '$kv' is not of the form k=v")
      }
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      try fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIME $name%-28s ${secs.min}%8.3f s  (runs: ${secs.map(s => f"$s%.3f").mkString(", ")})")
    }
    spark.stop()
  }
}
