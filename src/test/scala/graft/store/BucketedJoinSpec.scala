package graft.store

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.SparkSpec

/** Scale pattern evidence: persisting hot join inputs as BUCKETED tables
  * removes the per-query shuffle entirely — the co-located join strategy
  * SCALE.md prescribes for repeated large joins (bucket pruning + no
  * Exchange on either side). */
class BucketedJoinSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans with NO shuffle exchange") {
    val events = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "event_type", "user_id")
    val broadcastPrev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // Disable broadcast so the plan must choose a key-distribution join.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      events.write.bucketBy(8, "user_id").sortBy("user_id")
        .mode("overwrite").saveAsTable("bj_left")
      events.groupBy("user_id").count()
        .write.bucketBy(8, "user_id").sortBy("user_id")
        .mode("overwrite").saveAsTable("bj_right")

      val joined = spark.table("bj_left").join(spark.table("bj_right"), "user_id")
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"expected a shuffle-free co-located join, got:\n${joined.queryExecution.executedPlan}")
      // And it still computes the right thing.
      assert(joined.count() === events.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastPrev)
      spark.sql("DROP TABLE IF EXISTS bj_left")
      spark.sql("DROP TABLE IF EXISTS bj_right")
    }
  }
}
