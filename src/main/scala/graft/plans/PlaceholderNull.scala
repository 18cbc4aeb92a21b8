package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd placeholder-token nuller: returns the input string, or
  * NULL when its space-trimmed form case-insensitively equals one of
  * the constant placeholder tokens — the semantics of
  * `when(length(trim(c)) <= maxLen && lower(trim(c)).isin(tokens...),
  * null).otherwise(c)`, the ingest path's per-column normalization.
  *
  * Why a custom Expression: that composable form runs `lower(trim(c))`
  * — a fresh UTF8String ALLOCATION — plus up to |tokens| string
  * comparisons for every value whose trimmed length clears the gate,
  * and on the reference-shaped ingest corpus most code-like columns
  * (TV1, CGA3, TPV_12 …) are short enough to clear it. Measured on the
  * 18.8 M-row typed-repair lane (LaneProbe ingest_ph_variants): the
  * trim+length gate alone costs ~2 s, the surviving lower+isin term
  * ~12.5 s — 22 columns of it dominated the whole ingest stage. This
  * expression does one bounded byte scan per value: trim via
  * UTF8String (offset arithmetic, no copy), an ASCII case-insensitive
  * byte compare against the tokens of exactly the trimmed byte length,
  * and no allocation on any path a real value takes.
  *
  * Exact-parity discipline (the oracle gates it): tokens are compared
  * LOWERCASED via the same UTF8String.toLowerCase the Column form
  * used; a trimmed value containing any non-ASCII byte falls back to
  * `numChars <= maxChars && lowered-set contains toLowerCase(t)` —
  * byte-for-byte the old semantics, including the Unicode lowercasings
  * that land on ASCII (ſ -> s). Values longer than 4 x maxChars bytes
  * cannot pass the old `length(trim) <= maxChars` gate in ANY encoding
  * (a UTF-8 char is at most 4 bytes), so every scan is bounded by a
  * constant, never the value length.
  */
case class PlaceholderNull(child: Expression, tokens: Seq[String])
    extends UnaryExpression {

  require(tokens.nonEmpty, "placeholder_null needs at least one token")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_placeholder_null requires STRING, got ${t.simpleString}")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true // a matched value becomes null
  override def prettyName: String = "graft_placeholder_null"

  @transient private lazy val matcher =
    new PlaceholderNull.Matcher(tokens.toArray)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[UTF8String]
    if (matcher.matches(v)) null else v
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("phMatcher", matcher,
      classOf[PlaceholderNull.Matcher].getName)
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = true;
      org.apache.spark.unsafe.types.UTF8String ${ev.value} = null;
      if (!${c.isNull} && !$m.matches(${c.value})) {
        ${ev.isNull} = false;
        ${ev.value} = ${c.value};
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): PlaceholderNull =
    copy(child = newChild)
}

object PlaceholderNull {

  /** Constant-folded token tables, shared by interpreted eval and the
    * generated code (a codegen reference object — must serialize). */
  final class Matcher(tokensIn: Array[String]) extends Serializable {
    // lowercased via UTF8String (what lower() runs) for exact parity
    private val lowered: Array[UTF8String] =
      tokensIn.map(t => UTF8String.fromString(t).toLowerCase)
    // the old gate bound: max token length in CHARACTERS
    private val maxChars: Int =
      tokensIn.map(t => UTF8String.fromString(t).numChars()).max
    private val maxBytes: Int = lowered.map(_.numBytes()).max
    // tokens grouped by exact byte length: the ASCII fast path compares
    // a trimmed n-byte value only against the n-byte tokens
    private val byLen: Array[Array[Array[Byte]]] =
      Array.tabulate(maxBytes + 1)(n =>
        lowered.filter(_.numBytes() == n).map(_.getBytes))

    def matches(v: UTF8String): Boolean = {
      val t = v.trim() // 0x20 both ends — exactly Spark's trim()
      val nb = t.numBytes()
      // numChars >= ceil(nb/4), so nb > 4*maxChars fails the old
      // length(trim) <= maxChars gate in any encoding: bail without
      // scanning (bounds every scan below by a constant)
      if (nb > (maxChars << 2)) return false
      var ascii = true
      var i = 0
      while (i < nb) {
        if (t.getByte(i) < 0) { ascii = false; i = nb }
        i += 1
      }
      if (ascii) {
        if (nb > maxBytes) return false
        val cands = byLen(nb)
        var k = 0
        while (k < cands.length) {
          val tok = cands(k)
          var j = 0
          var ok = true
          while (j < nb && ok) {
            var b = t.getByte(j)
            if (b >= 'A' && b <= 'Z') b = (b + 32).toByte
            if (b != tok(j)) ok = false
            j += 1
          }
          if (ok) return true
          k += 1
        }
        false
      } else {
        // non-ASCII: the old semantics verbatim — character-count gate,
        // then Unicode lowercase equality (rare by construction)
        if (t.numChars() > maxChars) false
        else {
          val lo = t.toLowerCase
          var k = 0
          while (k < lowered.length) {
            if (lowered(k).equals(lo)) return true
            k += 1
          }
          false
        }
      }
    }
  }
}
