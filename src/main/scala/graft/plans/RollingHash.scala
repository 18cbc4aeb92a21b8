package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd 64-bit polynomial rolling hash (Karp-Rabin family) over a
  * string's UTF-8 bytes: h = sum(b_i * 31^(n-1-i)) wrapping in int64.
  *
  * Why a custom Expression instead of built-ins: the composable route
  * (split -> transform -> aggregate over characters) materializes an
  * array per row and breaks whole-stage codegen; xxhash64/md5 give a
  * fingerprint but not the *rolling* family (the same recurrence
  * extends to windowed substring hashes for shingle fingerprinting
  * without re-scanning bytes). This walks the UnsafeRow bytes in a
  * tight loop inside generated code — no allocation, stays inside
  * WholeStageCodegen.
  *
  * Registered for SQL as `rolling_hash` via [[GraftExtensions]].
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires STRING input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.RollingHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** Shared by interpreted eval and generated code. */
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 31L + (bytes(i) & 0xffL); i += 1 }
    h
  }
}
