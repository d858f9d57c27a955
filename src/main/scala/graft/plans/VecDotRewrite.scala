package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the declarative dot-product fold
  *
  *   aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0d,
  *             (acc, v) -> acc + v)
  *
  * to the codegen'd [[VecDot]] primitive. Catalyst-idiomatic escape hatch:
  * user code (or the SQL surface) can keep writing the built-ins-only form —
  * plans authored either way execute the fast path. Bit-exact: [[VecDot]]
  * multiplies in double and accumulates sequentially left-to-right, exactly
  * like the interpreted fold it replaces (parity pinned in GraftExprsSpec /
  * SimilaritySpec).
  *
  * Matching is deliberately conservative: any shape deviation (different
  * cast, reordered multiply, non-zero seed, a finish lambda that is not the
  * identity) is left untouched.
  */
object VecDotRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case agg @ ArrayAggregate(zip: ZipWith, Literal(0.0, DoubleType),
                                mergeFn: LambdaFunction, finishFn: LambdaFunction)
          if isProductLambda(zip.function) && isSumLambda(mergeFn) &&
            isIdentity(finishFn) && isNumericArray(zip.left) && isNumericArray(zip.right) =>
        VecDot(zip.left, zip.right)
      case other => other
    }

  private def isNumericArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** (x, y) -> cast(x as double) * cast(y as double) — casts optional when
    * the element type is already double. */
  private def isProductLambda(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(lx, ly, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      stripCastToDouble(lx).exists(_.exprId == x.exprId) &&
        stripCastToDouble(ly).exists(_.exprId == y.exprId)
    case _ => false
  }

  /** (acc, v) -> acc + v (either operand order). */
  private def isSumLambda(f: Expression): Boolean = f match {
    case LambdaFunction(Add(a: NamedLambdaVariable, b: NamedLambdaVariable, _),
                        Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
      Set(a.exprId, b.exprId) == Set(acc.exprId, v.exprId)
    case _ => false
  }

  /** acc -> acc. */
  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(body: NamedLambdaVariable, Seq(acc: NamedLambdaVariable), _) =>
      body.exprId == acc.exprId
    case _ => false
  }

  private def stripCastToDouble(e: Expression): Option[NamedLambdaVariable] = e match {
    case Cast(v: NamedLambdaVariable, DoubleType, _, _) => Some(v)
    case v: NamedLambdaVariable if v.dataType == DoubleType => Some(v)
    case _ => None
  }
}
