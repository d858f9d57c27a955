package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `shingle_hashes(array<string>, n) -> array<bigint>`: distinct
  * [[Md5Hash32]] values of the space-joined word n-shingles, in one pass —
  * semantically `array_distinct(transform(<n-shingles>, md5_hash32))`
  * (first-occurrence order), without the per-shingle interpreted lambda and
  * string-builder churn of the declarative chain. Parity with the built-ins
  * form is pinned in GraftExprsSpec. */
object ShingleHashes {
  def hashes(words: ArrayData, n: Int): ArrayData = {
    val count = words.numElements() - (n - 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < count) {
      val sb = new java.lang.StringBuilder()
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(words.getUTF8String(i + k).toString)
        k += 1
      }
      seen.add(Md5Hash32.hash(UTF8String.fromString(sb.toString)))
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}

case class ShingleHashesExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right) match {
    case (ArrayType(StringType, _), Literal(n: Int, IntegerType)) if n >= 2 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "shingle_hashes expects (array<string>, literal int n >= 2)")
  }
  private lazy val n: Int = right.eval().asInstanceOf[Int]
  override def nullSafeEval(l: Any, r: Any): Any =
    ShingleHashes.hashes(l.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.plans.ShingleHashes.hashes($l, (int)$r)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleHashesExpr =
    copy(left = newLeft, right = newRight)
}
