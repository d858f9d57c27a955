package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension installer. Preferred wiring:
  *
  *   SparkSession.builder().config("spark.sql.extensions", "graft.plans.GraftExtensions")
  *
  * [[GraftExtensions.register]] installs the same functions on an already-
  * built session (idempotent) — used by the query packs so the driver's
  * session works regardless of how it was constructed.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.vecDot)
  }
}

object GraftExtensions {

  private val vecDot: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "vec_dot(a, b) takes two array arguments")
      VecDot(children.head, children(1))
    })

  /** Idempotent post-hoc registration on a live session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      vecDot._1.funcName, vecDot._3, "internal")
}
