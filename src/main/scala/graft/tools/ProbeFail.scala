package graft.tools
import org.apache.spark.sql.SparkSession
object ProbeFail {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("q_asof_join", "q_session_window", "q_bucket_counts", "q_sliding_distinct")) {
      try {
        val df = graft.SparkEntry.queries(q)(spark, dir)
        println(s"OK $q rows=" + df.count())
      } catch { case e: Throwable =>
        println(s"FAIL $q: ${e.getClass.getName}: ${String.valueOf(e.getMessage).take(500)}")
      }
    }
    spark.stop()
  }
}
