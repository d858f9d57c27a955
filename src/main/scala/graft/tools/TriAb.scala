package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B timer for triangle-count formulations over the cached co-purchase
  * edge graph: (a) the shipped adjacency-intersection path
  * ([[graft.operators.Graphs.triangleStats]]), (b) a wedge self-join +
  * edge semi-join on the same degree-ordered orientation. Decides which
  * formulation ships — numbers, not vibes. */
object TriAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val edges = graft.operators.Graphs.coOccurrenceEdges(
        graft.Tables.load(spark, sfDir, "lineitem"), "l_orderkey", "l_partkey")
      .localCheckpoint(eager = true)
    println(s"edges: ${edges.count()}")

    def orient(e: DataFrame): DataFrame = {
      val deg = e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("d"))
      val du = deg.select(col("n").as("u"), col("d").as("du"))
      val dv = deg.select(col("n").as("v"), col("d").as("dv"))
      e.join(broadcast(du), "u").join(broadcast(dv), "v")
        .select(
          when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")), col("u"))
            .otherwise(col("v")).as("src"),
          when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")), col("v"))
            .otherwise(col("u")).as("dst"))
    }

    def adjPath(): Long =
      graft.operators.Graphs.triangleStats(edges)
        .head().getLong(2)

    def wedgePath(): Long = {
      val o = orient(edges).localCheckpoint(eager = true)
      // Enumerate each wedge once via b < c BY VALUE; the closing edge is
      // then exactly the UNDIRECTED (u=b, v=c) row — semi-joining against
      // the oriented list instead silently drops triangles whose closing
      // edge is degree-oriented c→b.
      val w = o.select(col("src").as("a"), col("dst").as("b"))
        .join(o.select(col("src").as("a"), col("dst").as("c")), "a")
        .filter(col("b") < col("c"))
      val tri = w.join(edges.select(col("u").as("b"), col("v").as("c")),
        Seq("b", "c"), "left_semi")
      tri.count()
    }

    def time(label: String, f: () => Long): Unit = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = f()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$label: tri=${runs.head._2} best=${runs.map(_._1).min}%.2fs " +
        s"(runs: ${runs.map(r => f"${r._1}%.2f").mkString(", ")})")
    }
    time("adjacency", adjPath _)
    time("wedge+semijoin", wedgePath _)
    spark.stop()
  }
}
