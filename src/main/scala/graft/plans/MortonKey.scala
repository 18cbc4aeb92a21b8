package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd 2-D Morton (Z-order) key: interleaves the low 32 bits of
  * two non-negative longs (a in even positions, b in odd) into one
  * 64-bit key.
  *
  * Sorting a table by this key clusters rows that are close in BOTH
  * dimensions into the same parquet row groups, so min/max pruning cuts
  * 2-D range scans (date x store, user x time) the way a 1-D sort only
  * cuts one dimension — the layout trick behind Delta/Iceberg
  * OPTIMIZE ZORDER, usable here via
  * `sortWithinPartitions(morton_key(a, b))` before a Warehouse write.
  *
  * Bit-spreading runs as a tight shift/mask sequence in generated code;
  * the same key is reproducible in any engine with integer bit ops
  * (the q49 oracle rebuilds it in DuckDB from shifts and masks).
  */
case class MortonKey(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"morton_key requires two BIGINT, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "morton_key"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    MortonKey.compute(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.MortonKey.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MortonKey =
    copy(left = newLeft, right = newRight)
}

object MortonKey {
  /** Spread the low 32 bits of x so bit i lands at position 2i (the
    * classic parallel-prefix morton spread). */
  def spread(x: Long): Long = {
    var v = x & 0xffffffffL
    v = (v | (v << 16)) & 0x0000ffff0000ffffL
    v = (v | (v << 8)) & 0x00ff00ff00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Shared by interpreted eval and generated code. */
  def compute(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
}
