package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization for dedup pipelines. The same page
  * arrives once with a precomposed `é` (U+00E9) and once decomposed
  * (`e` + U+0301), or padded with zero-width/format characters —
  * byte-level fingerprints and shingle hashes then disagree on
  * IDENTICAL text. Spark ships no normalizer function, so this is a
  * native expression over `java.text.Normalizer` plus an optional
  * control/format-character strip.
  *
  * Strip semantics (exactly replayable in RE2 and documented so an
  * external engine can mirror it): remove Unicode category Cc
  * (U+0000–U+001F, U+007F–U+009F) EXCEPT tab/LF/CR, and category Cf
  * (zero-width space joiners, BiDi marks, soft hyphens...). Tab/LF/CR
  * survive because line structure is itself a dedup/quality signal
  * ([[graft.text.TextAnalysis.repetitionStats]]).
  *
  * The expression codegens to one static call — no UDF wrapper, no
  * serialized closure, null handling in generated code; the
  * normalization itself is `java.text.Normalizer` (ICU-grade tables in
  * the JDK), which a loop cannot beat. */
object TextNormalizeUtil {

  /** Static entry point shared by interpreted eval and generated code.
    * `form` ∈ NFC | NFD | NFKC | NFKD. */
  def normalize(s: UTF8String, form: String, stripControls: Boolean): UTF8String = {
    val n = java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.valueOf(form))
    if (!stripControls) return UTF8String.fromString(n)
    val sb = new java.lang.StringBuilder(n.length)
    var i = 0
    while (i < n.length) {
      val cp = n.codePointAt(i)
      val t = Character.getType(cp)
      val keep =
        if (cp == '\t' || cp == '\n' || cp == '\r') true
        else t != Character.CONTROL && t != Character.FORMAT
      if (keep) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
}

/** See [[TextNormalizeUtil]]. `form` is validated at construction so a
  * typo fails at plan time, not per row. */
case class NormalizeText(child: Expression, form: String, stripControls: Boolean)
    extends UnaryExpression {
  // Fails fast on an unknown form name (IllegalArgumentException).
  java.text.Normalizer.Form.valueOf(form)

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"normalize_text needs a string input, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    TextNormalizeUtil.normalize(input.asInstanceOf[UTF8String], form, stripControls)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, childVar =>
      s"""${ev.value} = graft.functions.TextNormalizeUtil.normalize(
         |  $childVar, "$form", $stripControls);""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}
