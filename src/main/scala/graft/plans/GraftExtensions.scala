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
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => VecDotRewrite)
  }
}

object GraftExtensions {

  private type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def fn(name: String, clazz: Class[_], arity: Int,
                 builder: Seq[Expression] => Expression): FunctionDescription = (
    FunctionIdentifier(name),
    new ExpressionInfo(clazz.getName, name),
    (children: Seq[Expression]) => {
      require(children.size == arity, s"$name takes $arity argument(s)")
      builder(children)
    })

  private val functions: Seq[FunctionDescription] = Seq(
    fn("vec_dot", classOf[VecDot], 2, c => VecDot(c.head, c(1))),
    fn("md5_hash32", classOf[Md5Hash32Expr], 1, c => Md5Hash32Expr(c.head)),
    fn("minhash_sig", classOf[MinhashSigExpr], 1, c => MinhashSigExpr(c.head)),
    fn("rolling_hash", classOf[RollingHashExpr], 1, c => RollingHashExpr(c.head)),
    fn("shingle_hashes", classOf[ShingleHashesExpr], 2,
      c => ShingleHashesExpr(c.head, c(1))),
    // Spark's own runtime-filter machinery, exposed as callable functions
    // for explicit key-set prefilters (operators.BloomJoin): build with
    // bloom_agg(xxhash64(k), est_items, num_bits), probe with
    // bloom_contains(filter_bytes, xxhash64(k)).
    fn("bloom_agg",
      classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate], 3,
      c => new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        c.head, c(1), c(2))),
    fn("cms_estimate", classOf[CmsEstimateExpr], 2,
      c => CmsEstimateExpr(c.head, c(1))),
    fn("bloom_contains",
      classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain], 2,
      c => org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(c.head, c(1))))

  /** Idempotent post-hoc registration on a live session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, _, builder) =>
      if (!spark.sessionState.functionRegistry.functionExists(ident))
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          ident.funcName, builder, "internal")
    }
}
