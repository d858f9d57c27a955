package graft.plans

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
  * Keys may be BIGINT or BINARY (probe strings as `cast(s AS BINARY)` —
  * the aggregate hashes StringType and BinaryType through the same
  * byte-level path, so the estimates agree).
  *
  * The deserialized sketch is memoized per expression instance keyed on
  * the byte array's REFERENCE. That hits when the sketch is a plan
  * LITERAL (one array object per task — how
  * [[graft.operators.Sketches.heavyHitters]] ships it), making per-ROW
  * probing of a fact table affordable: after the first row, a probe is
  * just the sketch's few hash-and-min operations. When the sketch arrives
  * as a JOINED COLUMN instead, each row's binary accessor yields a fresh
  * copy and the memo never hits — on that path keep probing AGGREGATED
  * rows only (a bounded probe list behind a broadcast join, as q_cms_probe
  * does). The memo is a volatile pair; a race between threads merely
  * deserializes twice (CountMinSketch reads are thread-safe).
  */
case class CmsEstimateExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == BinaryType &&
        (right.dataType == LongType || right.dataType == BinaryType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cms_estimate expects (binary, bigint|binary), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  // (bytes reference, deserialized sketch) — see scaladoc. @transient: the
  // memo never travels with the serialized task closure; @volatile: plan
  // fragments are shared across local-mode task threads, and the sketch's
  // fields are non-final — unsynchronized publication could expose a
  // half-initialized table to a second thread.
  @transient @volatile private var memo: (AnyRef, CountMinSketch) = _

  private def sketchOf(bytes: Array[Byte]): CountMinSketch = {
    val m = memo
    if (m != null && (m._1 eq bytes)) m._2
    else {
      val cms = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
      memo = (bytes, cms)
      cms
    }
  }

  override protected def nullSafeEval(sketch: Any, key: Any): Any = {
    val cms = sketchOf(sketch.asInstanceOf[Array[Byte]])
    // estimateCount dispatches Long → the addLong path and byte[] → the
    // addBinary path — the same ingest hashing the aggregate used for
    // integral and STRING/BINARY (utf-8 bytes) inputs respectively.
    cms.estimateCount(key match {
      case l: java.lang.Long => l
      case b: Array[Byte]    => b
    })
  }

  /** Codegen entry points — the generated call sites for the two key
    * types. Probing per fact-table row only pays off if the probe stays
    * inside whole-stage codegen (a CodegenFallback here would collapse
    * the surrounding stage to interpreted rows), so the generated code
    * calls back into this instance, which holds the sketch memo. */
  def probeLong(sketch: Array[Byte], key: Long): Long =
    sketchOf(sketch).estimateCount(key)
  def probeBinary(sketch: Array[Byte], key: Array[Byte]): Long =
    sketchOf(sketch).estimateCount(key)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self =
      ctx.addReferenceObj("cmsProbe", this, classOf[CmsEstimateExpr].getName)
    val call = if (right.dataType == LongType) "probeLong" else "probeBinary"
    nullSafeCodeGen(ctx, ev,
      (sk, k) => s"${ev.value} = $self.$call($sk, $k);")
  }

  override def prettyName: String = "cms_estimate"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
