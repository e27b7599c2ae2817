package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared encoder behind [[BpeEncode]] — one instance per expression,
  * embedded in generated code via `addReferenceObj` so interpreted and
  * codegen paths run the identical object.
  *
  * Semantics contract (see [[graft.text.Bpe]]): pre-tokenize with
  * `lower` + split on `[^a-z0-9]+` (word mode) or with the
  * case/punctuation/whitespace-preserving [[graft.text.Bpe.BytePattern]]
  * whose base symbols are hex-framed UTF-8 bytes (byte mode), then per
  * pre-token apply the merges in rank order, each as an exhaustive
  * left-to-right non-overlapping literal replace on the
  * separator-framed symbol string — byte-equal to the `replace()`
  * chain the DuckDB oracle runs.
  *
  * Performance: a merge `(x, y)` can only apply if `x + y` occurs
  * contiguously in the raw word (merged symbols are always contiguous
  * substrings of the original word), so each merge is pre-screened
  * with an `indexOf` before the framed replace — with a 50k-entry
  * production merge table this skips ~all rounds per word. Distinct
  * words repeat heavily in real text, so encodings are memoized in a
  * per-thread bounded map (cleared when full — corpus vocabularies are
  * Zipfian, so the hot words stay resident). */
final class BpeEncoder(merges: Seq[(String, String)],
    byteLevel: Boolean = false) extends Serializable {
  private val cats = merges.map { case (x, y) => x + y }.toArray
  private val searches = merges.map { case (x, y) => s"|$x||$y|" }.toArray
  private val replacements = merges.map { case (x, y) => s"|$x$y|" }.toArray

  @transient private lazy val memo =
    new ThreadLocal[java.util.HashMap[String, Array[String]]] {
      override def initialValue() = new java.util.HashMap[String, Array[String]]()
    }
  private val MemoCap = 1 << 16

  private val splitter = java.util.regex.Pattern.compile("[^a-z0-9]+")
  @transient private lazy val bytePattern =
    java.util.regex.Pattern.compile(graft.text.Bpe.BytePattern)
  private val HexDigits = "0123456789abcdef"

  /** `word` in the symbol alphabet: the raw chars (word mode) or the
    * lowercase hex of its UTF-8 bytes (byte mode — 2 hex digits = 1
    * base symbol). */
  private def symChars(word: String): String =
    if (!byteLevel) word
    else {
      val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val sb = new java.lang.StringBuilder(bytes.length * 2)
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        sb.append(HexDigits.charAt(b >> 4)).append(HexDigits.charAt(b & 0xf))
        i += 1
      }
      sb.toString
    }

  private def encodeWord(word: String): Array[String] = {
    val m = memo.get()
    val hit = m.get(word)
    if (hit != null) return hit
    val chars = symChars(word)
    val symLen = if (byteLevel) 2 else 1
    // "ab" → "|a||b|": one '|' at each end, "||" between symbols
    // (byte mode: "|61||62|" — a base symbol is 2 hex chars).
    val sb = new java.lang.StringBuilder(chars.length * 3 + 1)
    sb.append('|')
    var i = 0
    while (i < chars.length) {
      sb.append(chars, i, i + symLen).append("||"); i += symLen
    }
    var framed = sb.substring(0, sb.length - 1)
    var r = 0
    while (r < cats.length) {
      // pre-screen on the unframed symbol string: x+y must be a
      // contiguous substring (in byte mode an odd-offset hex hit is a
      // false positive, but the screen only has to be a superset).
      if (chars.contains(cats(r)) && framed.contains(searches(r)))
        framed = framed.replace(searches(r), replacements(r))
      r += 1
    }
    val toks = framed.substring(1, framed.length - 1).split("\\|\\|", -1)
    if (m.size >= MemoCap) m.clear()
    m.put(word, toks)
    toks
  }

  def encode(text: UTF8String): ArrayData = {
    val out = new java.util.ArrayList[UTF8String]()
    def emit(word: String): Unit = {
      val toks = encodeWord(word)
      var j = 0
      while (j < toks.length) { out.add(UTF8String.fromString(toks(j))); j += 1 }
    }
    if (byteLevel) {
      val matcher = bytePattern.matcher(text.toString)
      while (matcher.find()) emit(matcher.group())
    } else {
      val words = splitter.split(text.toLowerCase.toString, -1)
      var i = 0
      while (i < words.length) {
        if (words(i).nonEmpty) emit(words(i))
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/** `bpe_encode(text)` → `array<string>` of BPE tokens under a fixed
  * learned merge table ([[graft.text.Bpe.learnMerges]]). Native
  * expression with codegen — no UDF serialization, null-safe in
  * generated code, the merge table shipped once per task as a
  * reference object rather than per row. */
case class BpeEncode(child: Expression, merges: Seq[(String, String)],
    byteLevel: Boolean = false)
    extends UnaryExpression {

  @transient private lazy val encoder = new BpeEncoder(merges, byteLevel)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode needs a string input, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    encoder.encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncoder", encoder, classOf[BpeEncoder].getName)
    nullSafeCodeGen(ctx, ev, childVar => s"${ev.value} = $ref.encode($childVar);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}
