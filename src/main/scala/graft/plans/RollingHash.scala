package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash of a string's code points —
  * h_i = (h_{i-1} · M + cp_i) mod P, h_0 = 0 — the classic
  * Rabin–Karp document fingerprint, as a codegen'd primitive.
  *
  * Constants chosen so the arithmetic never leaves signed-64 range
  * (M · P + max_cp < 2^52) and the DuckDB oracle can replicate it with a
  * plain list_reduce over unicode code points — exact integer math, no
  * overflow on either engine.
  */
object RollingHash {
  val M = 1000003L          // multiplier (prime)
  val P = 2147483647L       // modulus (2^31 − 1)

  def hash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * M + cp) % P
      i += Character.charCount(cp)
    }
    h
  }
}

/** `rolling_hash(string) -> bigint`. */
case class RollingHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash expects a string, got ${child.dataType.sql}")
  override def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.RollingHash.hash($c)")
  override protected def withNewChildInternal(newChild: Expression): RollingHashExpr =
    copy(child = newChild)
}
