package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.store.ParquetStore

/** The OTHER half of the re-snapshot trade (r13 verdict #7): the
  * ScheduleSoak proved per-trigger reads stay FLAT under the collapse
  * policy; this probe measures what the collapse REWRITE itself costs
  * as a function of the key universe K, so operators can size
  * `collapseEvery` from data instead of the default 8/16.
  *
  * Method: per K — build a K-key base, then repeat 3 cycles of
  * (`collapseEvery` small deltas → one timed [[ParquetStore
  * .collapseToLatest]]). The collapse rewrites ONE latest-per-key base
  * of K rows (window over base + deltas, one staged parquet write,
  * directory swap), so its cost is O(K) regardless of how many deltas
  * fold — the amortized per-trigger overhead is collapse(K) /
  * collapseEvery, which is the number SCALE.md's sizing sentence
  * derives. Not part of the driver contract. */
object CollapseProbe {

  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(10000, 100000, 1000000)
    val deltasPerCycle = 8
    val spark = SparkSession.builder()
      .master("local[32]").appName("graft-collapse-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val schema = StructType(Seq(
      StructField("key", StringType), StructField("v", LongType)))

    for (k <- sizes) {
      val tmp = Files.createTempDirectory(s"graft_clp_$k").toString
      // collapseEvery = 0: the probe times the collapse CALL itself,
      // not the auto-hook.
      val store = new ParquetStore(spark, schema, tmp,
        s"clp_${k}_${System.nanoTime()}")
      def keyed(n: Long, salt: Long) = spark.range(n)
        .select(concat(lit("k"), (col("id") * 7919L + salt) % k)
          .as("key"), (col("id") + salt).as("v"))
      store.append(keyed(k.toLong, 0L)) // K-key base (≈K distinct)
      val times = (1 to 3).map { cycle =>
        for (d <- 1 to deltasPerCycle)
          store.append(keyed(math.max(k / 50, 100).toLong,
            cycle * 1000L + d))
        val t0 = System.nanoTime()
        store.collapseToLatest(Seq("key"))
        (System.nanoTime() - t0) / 1e9
      }
      val mean = times.sum / times.length
      println(f"K=$k%-8d collapse ${times.map(t => f"$t%.2f").mkString("/")} s" +
        f"  mean $mean%.2f s  amortized ${mean / deltasPerCycle}%.3f s/trigger" +
        f"  gens=${store.generations.length}  rows=${store.selectAll.count()}")
      graft.Fs.deleteRecursively(java.nio.file.Paths.get(tmp))
    }
    spark.stop()
  }
}
