package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Codegen'd sign-random-projection signature: the whole `bits`-wide
  * band signature of an ARRAY<DOUBLE> vector in ONE expression.
  *
  * The composed form this replaces — `bits` separate
  * `when(round(graft_dot(v, typedlit(plane)), 6) >= 0, 1L << ...)`
  * trees summed — generates a Round + comparison + branch cascade per
  * bit per band (72 subtrees at q24's operating point, 128 at q33's).
  * One tight loop over a reference-held plane matrix generates two
  * method calls instead: smaller generated projections and one array
  * pass per band at eval time. (Measured first-call latency barely
  * moves — the ~8s one-time cost is shared join/aggregate machinery
  * JIT, not this projection — so the win is plan size and eval cost,
  * not compile time.)
  *
  * Bit semantics are IDENTICAL to the composed form (bit i of the
  * result, MSB-first, is set iff round6(dot(v, plane_i)) >= 0, with
  * Catalyst Round's BigDecimal HALF_UP rounding and Java `>=` on the
  * rounded double) — the DuckDB oracle reproduces the same planes from
  * md5, so cross-engine parity is untouched.
  */
case class SrpSignature(child: Expression, band: Int, bits: Int, dim: Int)
    extends UnaryExpression {

  @transient private lazy val flatPlanes: Array[Double] =
    SrpSignature.planes(band, bits, dim)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_srp_sig requires ARRAY<DOUBLE>, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_srp_sig"

  override protected def nullSafeEval(v: Any): Any =
    SrpSignature.compute(v.asInstanceOf[ArrayData], flatPlanes, bits, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("srpPlanes", flatPlanes, "double[]")
    defineCodeGen(ctx, ev,
      v => s"graft.plans.SrpSignature.compute($v, $planesRef, $bits, $dim)")
  }

  override protected def withNewChildInternal(newChild: Expression): SrpSignature =
    copy(child = newChild)
}

object SrpSignature {

  /** Deterministic +-1 hyperplanes, flattened bits x dim row-major:
    * entry (band, bit, d) is +1 iff the first hex digit of
    * md5("band:bit:d") is >= '8' — the md5-parity construction any
    * md5-capable engine (the DuckDB oracle) regenerates in SQL. */
  def planes(band: Int, bits: Int, dim: Int): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Double](bits * dim)
    var i = 0
    while (i < bits) {
      var d = 0
      while (d < dim) {
        val h = md.digest(s"$band:$i:$d".getBytes("UTF-8"))
        out(i * dim + d) = if (((h(0) >> 4) & 0xf) >= 8) 1.0 else -1.0
        d += 1
      }
      i += 1
    }
    out
  }

  /** Shared by interpreted eval and generated code. Rounding matches
    * Catalyst Round(_, 6): BigDecimal HALF_UP on finite doubles,
    * pass-through on NaN/infinities (NaN then fails >= 0, +Inf
    * passes — exactly the composed form's behavior). */
  def compute(v: ArrayData, planes: Array[Double], bits: Int, dim: Int): Long = {
    var sig = 0L
    var b = 0
    while (b < bits) {
      val off = b * dim
      val n = math.min(dim, v.numElements())
      var dot = 0.0
      var d = 0
      while (d < n) { dot += v.getDouble(d) * planes(off + d); d += 1 }
      val r =
        if (java.lang.Double.isNaN(dot) || java.lang.Double.isInfinite(dot)) dot
        else java.math.BigDecimal.valueOf(dot)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      if (r >= 0) sig |= 1L << (bits - 1 - b)
      b += 1
    }
    sig
  }
}
