package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd ASCII word tokenizer: extracts the maximal `[a-z0-9]+` byte
  * runs of an (already-lowercased) string as an array.
  *
  * Why a custom Expression: the composable form
  * `filter(split(lower(c), "[^a-z0-9]+"), x => x =!= "")` evaluates the
  * filter lambda INTERPRETED per element — higher-order functions sit
  * outside whole-stage codegen — and that interpretation dominated the
  * shingle/simhash pipelines (task profiles showed >70 CPU-seconds to
  * tokenize a 1.5 MB corpus, with run-to-run 5-30x swings depending on
  * whether the JIT rescued the interpreter loop). This is one generated
  * byte scan instead.
  *
  * Byte-equal to the lambda form on any input: multi-byte UTF-8 units
  * are >= 0x80 so they can never join an ASCII run, exactly like the
  * regex split on non-[a-z0-9] code points; callers pass `lower(c)` so
  * unicode lowercasings that produce ASCII (e.g. Kelvin K -> k) are
  * handled by the built-in before the scan, matching the oracle's
  * `regexp_extract_all(lower(text), '[a-z0-9]+')`.
  */
case class AsciiTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_tokens requires STRING, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokens"

  override protected def nullSafeEval(input: Any): Any =
    AsciiTokens.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.AsciiTokens.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): AsciiTokens =
    copy(child = newChild)
}

object AsciiTokens {
  private def isTokenByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  /** Shared by interpreted eval and generated code. */
  def compute(s: UTF8String, out: java.util.ArrayList[UTF8String]): Unit = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      while (i < n && !isTokenByte(s.getByte(i))) i += 1
      val start = i
      while (i < n && isTokenByte(s.getByte(i))) i += 1
      if (i > start) {
        val buf = new Array[Byte](i - start)
        var j = 0
        while (j < buf.length) { buf(j) = s.getByte(start + j); j += 1 }
        out.add(UTF8String.fromBytes(buf))
      }
    }
  }

  def compute(s: UTF8String): ArrayData = {
    val out = new java.util.ArrayList[UTF8String](16)
    compute(s, out)
    new GenericArrayData(out.toArray[AnyRef](new Array[AnyRef](out.size)))
  }
}
