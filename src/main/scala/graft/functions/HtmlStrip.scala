package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML/markup stripping — the missing ingestion step ahead of every
  * text operator: a web corpus arrives as HTML, and quality scores,
  * fingerprints, shingles and token counts are all garbage when tags,
  * scripts and entities are still in the text. Reference scope: the
  * reference has no markup handling at all (its text surface stops at
  * regex pattern counts, profile_engine.py); this is a north-star
  * LLM-pipeline operator.
  *
  * == Semantics (fixed, engine-replayable) ==
  *
  * A deterministic chain, each step expressible as one RE2-compatible
  * `regexp_replace` (no backreferences, no lookahead) so an external
  * engine replays it byte-for-byte:
  *
  *  1. drop comments            `(?s)<!--.*?-->`
  *  2. drop script blocks       `(?is)<script\b.*?</script[ \t\n\x0B\f\r]*>`
  *  3. drop style blocks        `(?is)<style\b.*?</style[ \t\n\x0B\f\r]*>`
  *  4. drop remaining tags      `(?s)<[^>]*>`
  *  5. decode entities in ONE left-to-right pass (so `&amp;lt;` →
  *     `&lt;`, never `<`): a named entity `&[A-Za-z]+;` from the
  *     fixed table below, a decimal entity `&#[0-9]{1,8};`, or a hex
  *     entity `&#[xX][0-9A-Fa-f]{1,6};`; anything unknown, longer
  *     than the bounds, or naming an invalid codepoint (0,
  *     surrogates, > U+10FFFF) stays literal. `&nbsp;` decodes to a
  *     PLAIN space so step 6 collapses it.
  *  6. collapse whitespace      `[ \t\n\x0B\f\r]+` → one space, then
  *     trim. (The class is Java's ASCII `\s` spelled out — RE2's `\s`
  *     omits U+000B, so a bare `\s` would drift from the replay.)
  *
  * Entities are decoded AFTER tag removal — browser order: markup the
  * author escaped (`&lt;b&gt;`) is text, not a tag, so it survives as
  * literal `<b>`. Unterminated comment/script/style blocks fall
  * through to step 4, which eats per-`>` spans — regex-chain
  * semantics, documented rather than browser-perfect.
  *
  * Named table (the common web set; everything else stays literal):
  * amp lt gt quot apos nbsp mdash ndash hellip copy reg trade laquo
  * raquo middot bull.
  *
  * == 100 TB shape ==
  *
  * Pure map-side: one native codegen expression, no shuffle, no UDF
  * serialization; streams through whole-stage codegen like the other
  * text expressions. */
object HtmlStripUtil {

  private val comments = java.util.regex.Pattern.compile("(?s)<!--.*?-->")
  // Whitespace is the EXPLICIT class [ \t\n\x0B\f\r] (Java's ASCII \s)
  // everywhere: RE2's \s omits U+000B, so a bare \s would diverge from
  // the DuckDB replay on a vertical tab (e.g. a decoded &#11;).
  private[graft] val WsClass = "[ \\t\\n\\x0B\\f\\r]"
  private val scripts =
    java.util.regex.Pattern.compile(s"(?is)<script\\b.*?</script$WsClass*>")
  private val styles =
    java.util.regex.Pattern.compile(s"(?is)<style\\b.*?</style$WsClass*>")
  private val tags = java.util.regex.Pattern.compile("(?s)<[^>]*>")
  private val ws = java.util.regex.Pattern.compile(s"$WsClass+")

  /** One segment per match: an entity candidate or a literal run —
    * every character of the input lands in exactly one segment. */
  private val entitySeg = java.util.regex.Pattern.compile(
    "&[A-Za-z]+;|&#[0-9]{1,8};|&#[xX][0-9A-Fa-f]{1,6};|[^&]+|&")

  private[graft] val named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ", "mdash" -> "—",
    "ndash" -> "–", "hellip" -> "…", "copy" -> "©",
    "reg" -> "®", "trade" -> "™", "laquo" -> "«",
    "raquo" -> "»", "middot" -> "·", "bull" -> "•")

  private def decodeSegment(seg: String): String = {
    if (seg.length < 2 || seg.charAt(0) != '&' || seg.charAt(seg.length - 1) != ';')
      return seg
    if (seg.charAt(1) == '#') {
      val hex = seg.charAt(2) == 'x' || seg.charAt(2) == 'X'
      val digits = seg.substring(if (hex) 3 else 2, seg.length - 1)
      // bounded by the segment regex (≤8 dec / ≤6 hex digits) → no overflow
      val cp = java.lang.Long.parseLong(digits, if (hex) 16 else 10)
      if (cp >= 1 && cp <= 0x10ffff && !(cp >= 0xd800 && cp <= 0xdfff))
        new String(Character.toChars(cp.toInt))
      else seg
    } else named.getOrElse(seg.substring(1, seg.length - 1), seg)
  }

  private def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val m = entitySeg.matcher(s)
    val sb = new java.lang.StringBuilder(s.length)
    while (m.find()) sb.append(decodeSegment(m.group()))
    sb.toString
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def strip(text: UTF8String): UTF8String = {
    var s = text.toString
    if (s.indexOf('<') >= 0) {
      s = comments.matcher(s).replaceAll("")
      s = scripts.matcher(s).replaceAll("")
      s = styles.matcher(s).replaceAll("")
      s = tags.matcher(s).replaceAll("")
    }
    s = decodeEntities(s)
    UTF8String.fromString(ws.matcher(s).replaceAll(" ").trim)
  }
}

/** `html_strip(text)` → cleaned text; see [[HtmlStripUtil]]. */
case class HtmlStrip(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"html_strip needs a string input, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    HtmlStripUtil.strip(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HtmlStripUtil.strip($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlStrip =
    copy(child = newChild)
}
