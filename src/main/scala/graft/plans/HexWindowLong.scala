package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd rotated-hex-window parser for the MinHash rotation family:
  * reads `len` hex chars of a hex string starting at 0-based `start`,
  * wrapping modulo the string length, and returns them as a BIGINT
  * (len <= 15 so the value fits a signed long).
  *
  * `hex_window(h, 2*i, 15)` is value-identical to
  * `conv(substr(h || h, 2*i + 1, 15), 16, 10)::BIGINT` — the form the
  * DuckDB oracle uses — but skips the doubled-string concat, the
  * substring copy, and conv's generic radix machinery, all of which sat
  * inside the minhash partial-aggregation loop (12 windows per shingle).
  */
case class HexWindowLong(child: Expression, start: Int, len: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if len >= 1 && len <= 15 && start >= 0 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_hex_window requires STRING, 0 <= start, 1 <= len <= 15; " +
        s"got ${t.simpleString}, start=$start, len=$len")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hex_window"

  override protected def nullSafeEval(input: Any): Any =
    HexWindowLong.compute(input.asInstanceOf[UTF8String], start, len)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HexWindowLong.compute($c, $start, $len)")

  override protected def withNewChildInternal(newChild: Expression): HexWindowLong =
    copy(child = newChild)
}

object HexWindowLong {
  /** Shared by interpreted eval and generated code. Empty input (legal
    * from user SQL — graft_hex_window is a registered session function)
    * returns 0L rather than dividing by zero in the wraparound. */
  def compute(s: UTF8String, start: Int, len: Int): Long = {
    val n = s.numBytes()
    if (n == 0) return 0L
    var v = 0L
    var j = 0
    while (j < len) {
      val b = s.getByte((start + j) % n)
      val nibble =
        if (b >= '0' && b <= '9') b - '0'
        else if (b >= 'a' && b <= 'f') b - 'a' + 10
        else if (b >= 'A' && b <= 'F') b - 'A' + 10
        else 0
      v = (v << 4) | nibble
      j += 1
    }
    v
  }
}
