package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Codegen'd distinct w-token-window hashing over a token array — the
  * production key path for exact-substring dedup (q162 family).
  *
  * Why a custom Expression: the composable route
  * `array_distinct(transform(sequence(1, n-w+1), i ->
  * xxhash64(array_join(slice(toks, i, w), " "))))` materializes every
  * window as a STRING (w tokens re-copied per position: O(tokens * w)
  * bytes) and runs the lambda interpreted per element (higher-order
  * functions don't participate in whole-stage codegen — the measured
  * WordShingles problem). This computes a 64-bit polynomial hash over
  * per-token hashes with a ROLLING update — O(tokens) total work, one
  * multiply-add per window step, no window string ever exists — inside
  * generated code.
  *
  * The key is a hash of the token SEQUENCE (splitmix64-finalized token
  * hashes combined with an odd-base polynomial), so two windows collide
  * iff their token sequences match, up to 64-bit collision odds —
  * exactly the grouping contract of the md5-of-joined-window gate lane.
  * Keys deduplicate per document in first-occurrence order (the
  * LinkedHashSet discipline WordShingles uses).
  *
  * Registered for SQL as `token_window_hash(tokens, w)` via
  * [[GraftExtensions]].
  */
case class TokenWindowHash(child: Expression, w: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if w >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"token_window_hash requires ARRAY<STRING> and w >= 1, got ${child.dataType.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_window_hash"

  override protected def nullSafeEval(input: Any): Any =
    TokenWindowHash.compute(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TokenWindowHash.compute($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): TokenWindowHash =
    copy(child = newChild)
}

object TokenWindowHash {
  /** Odd polynomial base; any odd 64-bit constant works (multiplication
    * mod 2^64 by an odd number is a bijection, so the rolling
    * subtract-multiply-add update is exactly invertible). */
  private val B = 0x100000001B3L // FNV-64 prime

  /** splitmix64 finalizer: avalanche the weak base-31 token hash so
    * near-identical tokens ("a1"/"a2") don't produce correlated window
    * polynomials. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Test-only visibility for the law spec (the rolling-vs-direct
    * equality needs the exact finalizer). */
  private[graft] def mixForTest(z: Long): Long = mix(z)

  /** Shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData, w: Int): ArrayData = {
    val len = tokens.numElements()
    if (len < w) return new GenericArrayData(Array.empty[Any])
    val th = new Array[Long](len)
    var i = 0
    while (i < len) {
      th(i) = mix(RollingHash.hash(tokens.getUTF8String(i)))
      i += 1
    }
    var bw = 1L // B^(w-1) mod 2^64, for the rolling eviction term
    var k = 0
    while (k < w - 1) { bw *= B; k += 1 }
    val seen = new java.util.LinkedHashSet[java.lang.Long](
      math.max(16, (len - w + 1) * 2))
    var h = 0L
    var j = 0
    while (j < w) { h = h * B + th(j); j += 1 }
    seen.add(h)
    var s = 0
    while (s + w < len) {
      h = (h - th(s) * bw) * B + th(s + w)
      seen.add(h)
      s += 1
    }
    new GenericArrayData(seen.toArray[AnyRef](new Array[AnyRef](seen.size)))
  }
}
