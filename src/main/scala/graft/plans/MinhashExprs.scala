package graft.plans

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd hot-loop expressions for MinHash dedup (see [[VecDot]] for the
  * built-ins-vs-custom rationale; these replace interpreted per-element
  * lambda evaluation inside `transform`/`aggregate`).
  *
  * Determinism contract unchanged: [[Md5Hash32]] equals
  * `conv(substr(md5(s),1,8),16,10)` (the first 4 md5 bytes as an unsigned
  * 32-bit big-endian integer), and [[MinhashSig]] equals the 16 scalar folds
  * `min_x (a_j·(x mod P) + b_j) mod P` over [[graft.operators.Dedup.As]]/
  * [[graft.operators.Dedup.Bs]] — both still replicated verbatim by the
  * DuckDB oracle.
  */
object Md5Hash32 {
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 4 bytes of md5(utf8 bytes) as an unsigned big-endian int. */
  def hash(s: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
}

/** `md5_hash32(string) -> bigint` — skips the hex-string round-trip of the
  * conv(substr(md5)) composition and reuses a thread-local digest. */
case class Md5Hash32Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_hash32 expects a string, got ${child.dataType.sql}")
  override def nullSafeEval(input: Any): Any =
    Md5Hash32.hash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Md5Hash32.hash($c)")
  override protected def withNewChildInternal(newChild: Expression): Md5Hash32Expr =
    copy(child = newChild)
}

object MinhashSig {
  // Mirrors Dedup.As/Bs/P — duplicated as primitive arrays for the codegen
  // path; DedupSpec pins the two definitions together.
  val P = 2147483647L
  val As: Array[Long] = Array(7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59, 61, 67)
  val Bs: Array[Long] = Array(3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59)

  /** One pass over the hash set updating all 16 minima. */
  def sig(hashes: ArrayData): ArrayData = {
    val k = As.length
    val acc = Array.fill(k)(P)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val x = hashes.getLong(i) % P
      var j = 0
      while (j < k) {
        val v = (As(j) * x + Bs(j)) % P
        if (v < acc(j)) acc(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(acc)
  }
}

/** `minhash_sig(array<bigint>) -> array<bigint>` — all 16 minhashes in one
  * tight loop (empty input → all-P signature, matching the fold's init). */
case class MinhashSigExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint>, got ${t.sql}")
  }
  override def nullSafeEval(input: Any): Any =
    MinhashSig.sig(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.MinhashSig.sig($c)")
  override protected def withNewChildInternal(newChild: Expression): MinhashSigExpr =
    copy(child = newChild)
}
