package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.util.Partitioning.spread

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization stats, quality scoring, language identification, and
  * document fingerprinting. These extend the reference's text metrics
  * (the three fixed regexes + length stats,
  * reference: sparvi/profiler/profile_engine.py:178-238) to the
  * LLM-data-pipeline scope.
  *
  * Every operator is a narrow projection + single aggregate: the scan
  * reads only the text column (column pruning), all expressions are
  * codegen'd built-ins (no UDFs), and nothing shuffles except the
  * final aggregate. At 100 TB each of these is a one-pass map-side
  * computation.
  */
object TextAnalysis {

  /** Whitespace tokens of a trimmed text column. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-ish pre-tokenizer regex: runs of letters, runs of digits, or
    * runs of other non-space symbols — the shape GPT-2-style byte-pair
    * pre-tokenization produces, minus byte-level details. */
  val BpeTokenPattern = "\\p{L}+|\\p{N}+|[^\\s\\p{L}\\p{N}]+"

  /** Count of BPE-ish tokens (regexp_count is codegen'd; no UDF). */
  def bpeTokenCount(text: Column): Column = regexp_count(text, lit(BpeTokenPattern))

  /** Small stopword list used by the quality heuristic. Deliberately
    * tiny and fixed so the score is reproducible across engines. */
  val Stopwords = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Marker words per language for the n-gram/marker language-ID
    * heuristic. Fixed, tiny, deterministic. */
  val LanguageMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "ist", "nicht"),
    "en" -> Seq("the", "and", "of", "to", "is"),
    "es" -> Seq("el", "la", "que", "los", "una"),
    "fr" -> Seq("le", "les", "des", "est", "une"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** Per-document token statistics: whitespace token count, BPE-ish
    * token count, char length, average word length. */
  def tokenStats(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = tokens(col(textCol))
    spread(df).select(
      col(idCol),
      length(col(textCol)).cast("long").as("n_chars"),
      size(w).cast("long").as("n_tokens_ws"),
      bpeTokenCount(col(textCol)).cast("long").as("n_tokens_bpe"),
      round(aggregate(w, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        greatest(size(w), lit(1)), 4).as("avg_word_len"))
  }

  /** Quality heuristics per document: punctuation ratio, stopword
    * ratio, digit ratio, and a composite quality score in [0, 1].
    * The formula is an arbitrary-but-fixed heuristic: length-capped
    * token count, damped by punctuation, boosted by stopword presence
    * (prose-likeness). */
  def qualityScore(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val txt = col(textCol)
    val w = tokens(txt)
    val nChars = length(txt).cast("double")
    val punct = regexp_count(txt, lit("[\\p{Punct}]")).cast("double")
    val digits = regexp_count(txt, lit("[0-9]")).cast("double")
    val stops = size(filter(w, t => t.isin(Stopwords.map(x => x: Any): _*))).cast("double")
    val nTok = greatest(size(w), lit(1)).cast("double")
    val punctRatio = punct / greatest(nChars, lit(1.0))
    val stopRatio = stops / nTok
    val score =
      least(nTok / lit(100.0), lit(1.0)) * (lit(1.0) - punctRatio) *
        (lit(0.5) + lit(0.5) * stopRatio)
    spread(df).select(
      col(idCol),
      round(punctRatio, 4).as("punct_ratio"),
      round(digits / greatest(nChars, lit(1.0)), 4).as("digit_ratio"),
      round(stopRatio, 4).as("stopword_ratio"),
      round(least(score, lit(1.0)), 4).as("quality_score"))
  }

  /** Language identification by marker-word counting: the language
    * whose marker words occur most often among the document's tokens
    * wins; ties break alphabetically; zero hits → "unknown".
    *
    * One traversal of the token array builds ALL per-language counters
    * in a single `aggregate` (a per-language `size(filter(...))` would
    * re-tokenize the document once per language — HOF lambdas
    * re-evaluate captured subtrees). The counts struct is materialized
    * in its own projection so the argmax reads a bound attribute. */
  def languageId(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val langs = LanguageMarkers.map(_._1)
    val w = tokens(lower(col(textCol)))
    val zero = struct(langs.map(l => lit(0).as(l)): _*)
    val counts = aggregate(w, zero, (acc, t) =>
      struct(LanguageMarkers.map { case (lang, markers) =>
        (acc.getField(lang) +
          when(t.isin(markers.map(x => x: Any): _*), 1).otherwise(0)).as(lang)
      }: _*))
    val withCounts = spread(df).select(col(idCol), counts.as("c"))
    // argmax with alphabetical tiebreak: fold over languages in order,
    // keeping the first language with the (strictly) highest count.
    val best = langs.tail.foldLeft(
      struct(col("c").getField(langs.head).as("n"), lit(langs.head).as("lang"))) {
      case (acc, lang) =>
        when(col("c").getField(lang) > acc.getField("n"),
          struct(col("c").getField(lang).as("n"), lit(lang).as("lang")))
          .otherwise(acc)
    }
    withCounts.select(col(idCol), best.as("best")).select(
      col(idCol),
      when(col("best.n") > 0, col("best.lang")).otherwise(lit("unknown")).as("lang_pred"),
      col("best.n").cast("long").as("marker_hits"))
  }

  /** Document fingerprint: md5 of the whitespace-normalized, lowercased
    * text. Identical content (modulo spacing/case) → identical
    * fingerprint; both Spark and DuckDB compute the same digest, so
    * this is oracle-checkable (unlike xxhash64, which is
    * Spark-internal). For scale work prefer [[contentHash64]]. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** 64-bit content hash for scale paths (shuffle keys, dedup):
    * xxhash64 is cheaper and collision-fine at row-key granularity. */
  def contentHash64(text: Column): Column =
    xxhash64(regexp_replace(lower(trim(text)), "\\s+", " "))

  def fingerprints(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol), fingerprint(col(textCol)).as("fingerprint"))

  /** Winnowing fingerprints (the rolling-hash document-fingerprint
    * scheme of the MOSS winnowing paper): hash every character k-gram
    * of the normalized text, slide a window of `w` consecutive k-gram
    * hashes, keep each window's minimum. Guarantee: any shared passage
    * of at least w + k - 1 characters contributes at least one common
    * fingerprint — the primitive for partial-overlap detection, which
    * whole-document similarity (Jaccard/SimHash) cannot see.
    *
    * Output: (id, fp) distinct fingerprint hashes per document.
    * Plan shape: ENTIRELY map-side until the final distinct — the
    * gram-hash + sliding-min + distinct inner loop is one native
    * [[graft.functions.WinnowingMins]] evaluation per row, and only
    * the per-document distinct minima are exploded. (Two earlier
    * formulations document the path here: exploding one row per
    * character k-gram with a `Window.partitionBy(id)` min — a
    * corpus-sized shuffle plus per-document sort — and then the
    * shuffle-free higher-order-function pipeline, whose interpreted
    * per-element lambdas and per-gram md5 allocations still dominated
    * the overlap-pairs gate query.)
    *
    * Winnowing needs any TOTAL ORDER on gram hashes, not a numeric
    * one: `md5` mode keeps the fingerprints as hex strings whose
    * lexicographic minima DuckDB reproduces bit-for-bit (both engines
    * compute identical md5 and compare ASCII identically) — the
    * engine-reproducible gate mode. `xxhash64` (default) is the scale
    * mode: fixed-width longs, cheaper to hash, shuffle, and compare.
    * Null texts produce no fingerprints. */
  def winnowingFingerprints(
      df: DataFrame, textCol: String, idCol: String,
      k: Int = 8, w: Int = 4, hashMode: String = "xxhash64"): DataFrame = {
    val norm = regexp_replace(lower(trim(col(textCol))), "\\s+", " ")
    spread(df).filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), norm.as("t"))
      .select(col("id"),
        explode(graft.functions.VectorFunctions.winnowingMins(col("t"), k, w, hashMode)).as("fp"))
  }
}
