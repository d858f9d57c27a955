package graft.plans

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** `cms_estimate(sketch_bytes, key)` — probe a serialized Spark
  * `CountMinSketch` (built by the built-in `count_min_sketch` aggregate)
  * for a key's estimated multiplicity. Never undercounts; overcounts by at
  * most eps·N with the sketch's confidence. Together with the aggregate
  * this is the mergeable approximate COUNTER: per-partition sketches add
  * counter-wise (order-independent, so results are deterministic), ship as
  * a few KB regardless of key cardinality, and answer per-key frequency
  * without a per-key shuffle — the 100 TB "how often did X occur" path.
  *
  * Evaluation deserializes the sketch per call, so probe AGGREGATED rows
  * (a handful of sketches × a bounded probe list, usually behind a
  * broadcast join) — never a raw fact table. Keys must be integral (the
  * aggregate hashes integral types via addLong; matching dispatch here).
  */
case class CmsEstimateExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == BinaryType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cms_estimate expects (binary, bigint), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override protected def nullSafeEval(sketch: Any, key: Any): Any = {
    val cms = CountMinSketch.readFrom(
      new ByteArrayInputStream(sketch.asInstanceOf[Array[Byte]]))
    cms.estimateCount(Long.box(key.asInstanceOf[Long]))
  }

  override def prettyName: String = "cms_estimate"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
