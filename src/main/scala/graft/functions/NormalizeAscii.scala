package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass dedup-normalization of a text column — the fused form of
  *
  *   trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""),
  *        " +", " "))
  *
  * (lowercase, strip non-[a-z0-9 ], collapse space runs, trim) that THE
  * normalized-dedup identity (TextOps.normalizeText →
  * q_dedup_normalized / Corpus.exactDedup(normalized) /
  * Streams.corpusIngest(normalized)) keys on.
  *
  * Why a custom Expression: the regex chain materializes four
  * intermediate strings per row (lower, two regex buffers, trim) and
  * runs two NFA passes; at corpus scale the allocation traffic — not the
  * matching — dominates (q_dedup_normalized measured 16× CPU at 10× rows
  * on the regex chain, the worst row of the r9 ×10 audit after the ANN
  * family was fixed). This expression does one codepoint pass and one
  * output buffer, inside whole-stage codegen, with an interpreted twin.
  *
  * EQUALITY with the regex chain holds for ALL inputs, not just ASCII:
  * `lower` (UTF8String.toLowerCase = String.toLowerCase(Locale.ROOT) off
  * the ASCII fast path) differs from per-codepoint
  * Character.toLowerCase only on the full-case 1:M lowercase mapping —
  * U+0130 İ → "i" + combining-dot U+0307 — whose extra combining char
  * the [^a-z0-9 ] strip removes anyway, so the kept-character sequence
  * is identical (NormalizeAsciiSpec pins this property on adversarial
  * unicode). The DuckDB oracle keeps the regex spelling — utf8proc's 1:1
  * tolower agrees on the kept subset by the same argument. */
case class NormalizeAscii(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"norm_ascii requires a string argument, got ${t.simpleString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "norm_ascii"

  override def nullSafeEval(input: Any): Any =
    NormalizeAscii.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeAscii.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeAscii =
    copy(child = newChild)
}

object NormalizeAscii {
  /** One pass, one buffer: lowercase per codepoint, keep [a-z0-9],
    * collapse space runs via a pending flag (set only after a kept char
    * exists → leading trim; never flushed at end → trailing trim). */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    val n = str.length
    val sb = new java.lang.StringBuilder(n)
    var pending = false
    var i = 0
    while (i < n) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      if (cp == ' ') {
        if (sb.length > 0) pending = true
      } else {
        val lc = Character.toLowerCase(cp)
        if ((lc >= 'a' && lc <= 'z') || (lc >= '0' && lc <= '9')) {
          if (pending) { sb.append(' '); pending = false }
          sb.append(lc.toChar)
        }
        // anything else is stripped; a stripped char between spaces must
        // NOT break the run (the strip regex runs BEFORE the collapse
        // regex), which the untouched pending flag models
      }
    }
    UTF8String.fromString(sb.toString)
  }
}
