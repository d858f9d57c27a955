package graft

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Plan-quality regression guard over EVERY driver query: nobody gets to
  * introduce an accidental all-pairs join. The only allowed cross join is
  * q_knn_topk's documented brute-force baseline (broadcast query side +
  * partial-top-k combiner — SCALE.md "Similarity search"). */
class PlanGuardSpec extends SparkSpec {

  private val AllowedCross = Set("q_knn_topk")

  test("no query plans a cartesian / nested-loop product (except brute-force kNN)") {
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, _) if AllowedCross(name) => None
      case (name, fn) =>
        val plan = fn(spark, dir).queryExecution.executedPlan
        val bad = plan.collect {
          case p: CartesianProductExec        => p.nodeName
          case p: BroadcastNestedLoopJoinExec => p.nodeName
          case a: AdaptiveSparkPlanExec =>
            a.executedPlan.collect {
              case p: CartesianProductExec        => p.nodeName
              case p: BroadcastNestedLoopJoinExec => p.nodeName
            }.mkString(",")
        }.filter(_.nonEmpty)
        if (bad.isEmpty) None else Some(s"$name: ${bad.mkString(";")}")
    }
    assert(offenders.isEmpty,
      s"queries planning all-pairs joins:\n${offenders.mkString("\n")}")
  }
}
