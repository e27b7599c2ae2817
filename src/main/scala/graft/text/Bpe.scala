package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-learned byte-pair-encoding (BPE) tokenization — the real
  * token counts behind training-data budgets, replacing the
  * whitespace/"BPE-ish" placeholder of [[TextAnalysis.tokenStats]].
  * Reference scope: the reference engine has no tokenizer (its token
  * surface stops at text length stats, profile_engine.py:200-236);
  * this is a north-star LLM-pipeline operator.
  *
  * == Semantics (fixed, engine-replayable) ==
  *
  * Pre-tokenization: `lower(text)` split on runs of `[^a-z0-9]+`;
  * empty strings dropped. Every word is represented as a
  * separator-framed symbol string — `"|"` + symbols joined by `"||"`
  * + `"|"` — so that one merge step is ONE literal, non-overlapping,
  * left-to-right string replace (`"|x||y|"` → `"|xy|"`): the exact
  * semantics of `replace()` in Spark, DuckDB, Java and Postgres, which
  * is what makes the whole learning loop externally replayable. The
  * separator cannot collide because symbols are `[a-z0-9]`-only.
  *
  * Learning (`learnMerges`): per round, count every adjacent symbol
  * pair over the DISTINCT-WORD vocabulary weighted by word frequency,
  * pick the pair with the highest count — ties broken by lexicographic
  * (left, right), so the merge table is fully deterministic — record
  * it, and apply its replace to the vocabulary. `numMerges` rounds.
  *
  * Encoding (`tokenize` / [[graft.functions.BpeEncode]]): apply the
  * learned merges to each word IN RANK ORDER, each exhaustively
  * left-to-right — identical to the learning-time procedure. (For pure
  * pair merges this equals the classic lowest-rank-first encoder:
  * merging two symbols never creates a new adjacency of two OTHER
  * already-existing symbols, so an earlier merge can never become
  * applicable again after a later one.)
  *
  * == 100 TB shape ==
  *
  * The corpus is scanned ONCE (the word-frequency aggregate, map-side
  * partial). Every learning round then runs over the distinct-word
  * vocabulary — orders of magnitude smaller than the corpus (~10⁷–10⁸
  * rows for web-scale text vs 10¹¹ documents) — as one partial-agg
  * groupBy plus one map-side replace; only the single best-pair row is
  * collected per round (bounded driver state, like the k-means
  * centroids). The vocabulary frame is re-persisted each round and
  * checkpointed periodically (reliable dir when configured, else
  * localCheckpoint) so lineage stays flat across hundreds of rounds —
  * same discipline as [[graft.dedup.Dedup.connectedComponents]].
  * Encoding is a map-side native expression with no shuffle at all.
  */
object Bpe {

  /** One learned merge: at `rank` (1-based), adjacent symbol pair
    * (`left`, `right`) had the highest corpus pair count `freq`. */
  final case class Merge(rank: Int, left: String, right: String, freq: Long)

  private[graft] val Sep = "|"

  /** `lower`, split on non-alphanumeric runs, drop empties — the fixed
    * pre-tokenization contract shared with the DuckDB replay. */
  private[graft] def words(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), w => length(w) > 0)

  /** Byte-level pre-tokenization contract (GPT-2-style, simplified to
    * stay replayable under both Java regex and RE2): leading-space
    * letter runs, leading-space digit runs, leading-space punctuation
    * runs, or whitespace runs. Alternation is leftmost-first in both
    * engines and every character lands in exactly one pre-token, so
    * case, punctuation and whitespace all survive into the vocabulary
    * — the fidelity the `[a-z0-9]` word mode destroys. (The GPT-2
    * lookahead `\s+(?!\S)` is dropped: RE2 has no lookahead, so a
    * multi-space run becomes one whitespace pre-token instead of
    * donating its last space to the next word. Whitespace is the
    * EXPLICIT class `[ \t\n\x0B\f\r]` — Java's ASCII `\s` — spelled
    * out because RE2's `\s` omits U+000B, so a bare `\s` would
    * pre-tokenize a vertical tab differently in the two engines.) */
  private[graft] val BytePattern =
    " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]+|[ \\t\\n\\x0B\\f\\r]+"

  /** Byte-level pre-tokens of `text`, in order. */
  private[graft] def preTokensBytes(text: Column): Column =
    regexp_extract_all(text, lit(BytePattern), lit(0))

  /** A pre-token as its separator-framed BYTE-symbol string: each
    * UTF-8 byte is a lowercase 2-hex-digit base symbol, so "Hi" →
    * `"|48||69|"`. Hex symbols are `[0-9a-f]`-only — the same
    * no-collision argument as the word mode's `[a-z0-9]`, with the
    * full byte alphabet (any case, punctuation, whitespace, or
    * multi-byte UTF-8) representable. */
  private[graft] def framedHex(word: Column): Column = {
    val doubled = concat(lit(Sep),
      regexp_replace(lower(hex(encode(word, "UTF-8"))), "(..)", "$1||"))
    substr(doubled, lit(1), length(doubled) - 1)
  }

  /** A word as its separator-framed base-symbol string: "ab" →
    * `"|a||b|"`. Built with the same regexp_replace both engines run. */
  private[graft] def framed(word: Column): Column = {
    val doubled = concat(lit(Sep), regexp_replace(word, "(.)", "$1||"))
    // drop the trailing "|" of the final "||"
    substr(doubled, lit(1), length(doubled) - 1)
  }

  /** Learn `numMerges` merges from `df.textCol`. Returns the merge
    * table in rank order. Driver state: one (pair, count) row per
    * round — everything else stays distributed.
    *
    * `byteLevel = true` switches to the [[BytePattern]] byte-alphabet
    * contract: pre-tokens keep case/punctuation/whitespace and base
    * symbols are hex-framed UTF-8 bytes, so the learned table matches
    * what a real byte-level tokenizer would see; merges then name hex
    * symbol strings ("74" + "68" → "7468"). The default remains the
    * `[a-z0-9]` word mode. */
  def learnMerges(df: DataFrame, textCol: String,
      numMerges: Int, checkpointEvery: Int = 10,
      byteLevel: Boolean = false): Seq[Merge] = {
    require(numMerges >= 1, s"numMerges must be >= 1: $numMerges")
    val spark = df.sparkSession
    val useReliable = spark.sparkContext.getCheckpointDir.isDefined
    def materialize(v: DataFrame): DataFrame =
      if (useReliable) v.checkpoint(eager = true) else v.localCheckpoint(true)

    // ONE corpus scan: per-word occurrence counts, then the framed
    // symbol form. Distinct words only from here on.
    val wordsOf = if (byteLevel) preTokensBytes(col(textCol)) else words(col(textCol))
    val frameOf: Column => Column = if (byteLevel) framedHex else framed
    var vocab = df
      .select(explode(wordsOf).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(frameOf(col("word")).as("w"), col("freq"))
      .persist()
    vocab.count() // materialize before the loop

    val merges = Seq.newBuilder[Merge]
    var round = 1
    var exhausted = false
    while (round <= numMerges && !exhausted) {
      // Adjacent symbol pairs of every vocab word, weighted by word
      // frequency. split on the literal "||" after trimming the single
      // framing "|" from each end.
      val syms = split(expr("substring(w, 2, length(w) - 2)"), "\\|\\|")
      val pairs = vocab
        .select(col("freq"),
          explode(zip_with(
            slice(syms, lit(1), size(syms) - 1),
            slice(syms, lit(2), size(syms) - 1),
            (x, y) => struct(x.as("x"), y.as("y")))).as("p"))
        .groupBy(col("p.x").as("x"), col("p.y").as("y"))
        .agg(sum("freq").as("cnt"))
      val best = pairs
        .orderBy(desc("cnt"), asc("x"), asc("y"))
        .limit(1).collect()
      if (best.isEmpty) {
        // every word is a single symbol — nothing left to merge
        exhausted = true
      } else {
        val (x, y, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(round, x, y, cnt)
        val prev = vocab
        val computed = vocab.withColumn("w",
          expr(s"replace(w, '$Sep$x$Sep$Sep$y$Sep', '$Sep$x$y$Sep')"))
        // Checkpoint rounds materialize eagerly through the checkpoint
        // itself — persisting first would strand an extra cache entry
        // per checkpoint round that nothing ever unpersists.
        val next =
          if (round % checkpointEvery == 0) materialize(computed)
          else { val p = computed.persist(); p.count(); p }
        prev.unpersist()
        vocab = next
        round += 1
      }
    }
    vocab.unpersist()
    merges.result()
  }

  /** The learned merge table as a DataFrame —
    * (rank int, left, right, freq). */
  def mergesDf(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF("rank", "left", "right", "freq")
  }

  /** Tokenize `textCol` with a learned merge table: per document, the
    * full BPE token sequence (words in order, each word's tokens in
    * order) as `array<string>`. Map-side native expression
    * ([[graft.functions.BpeEncode]]) — no shuffle, no UDF. */
  def bpeTokens(text: Column, merges: Seq[Merge],
      byteLevel: Boolean = false): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.BpeEncode(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text),
        merges.sortBy(_.rank).map(m => (m.left, m.right)), byteLevel))

  /** Per-document token stats under a learned merge table:
    * (id, n_tokens, n_unique_tokens, tokens_str). In byte mode the
    * tokens are the hex byte-symbol strings the merges name. */
  def tokenize(df: DataFrame, textCol: String, idCol: String,
      merges: Seq[Merge], byteLevel: Boolean = false): DataFrame = {
    val toks = bpeTokens(col(textCol), merges, byteLevel)
    df.select(col(idCol), toks.as("tokens"))
      .select(col(idCol),
        size(col("tokens")).cast("long").as("n_tokens"),
        size(array_distinct(col("tokens"))).cast("long").as("n_unique_tokens"),
        concat_ws(" ", col("tokens")).as("tokens_str"))
  }

  /** Persist a learned merge table as JSON — the tokenizer artifact a
    * pipeline trains once and ships with every job that must tokenize
    * consistently (same contract as
    * [[graft.validation.RuleFiles.export]] for rules). Rank order is
    * preserved; [[loadMerges]] round-trips exactly. */
  def saveMerges(merges: Seq[Merge], filePath: String): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val arr = mapper.createArrayNode()
    merges.sortBy(_.rank).foreach { m =>
      val o = mapper.createObjectNode()
      o.put("rank", m.rank); o.put("left", m.left)
      o.put("right", m.right); o.put("freq", m.freq)
      arr.add(o)
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(filePath),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(arr))
    ()
  }

  /** Load a merge table saved by [[saveMerges]]. Fails loudly on a
    * malformed file — a silently-empty merge table would tokenize
    * every word to characters. */
  def loadMerges(filePath: String): Seq[Merge] = {
    val path = java.nio.file.Paths.get(filePath)
    require(java.nio.file.Files.exists(path), s"File not found: $path")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(java.nio.file.Files.readString(path))
    require(root.isArray, s"$filePath: expected a JSON array of merges")
    import scala.jdk.CollectionConverters._
    val merges = root.elements().asScala.map { n =>
      require(n.hasNonNull("rank") && n.hasNonNull("left") && n.hasNonNull("right"),
        s"$filePath: merge entry missing rank/left/right: $n")
      Merge(n.get("rank").asInt(), n.get("left").asText(),
        n.get("right").asText(),
        if (n.hasNonNull("freq")) n.get("freq").asLong() else 0L)
    }.toSeq
    val ranks = merges.map(_.rank)
    require(ranks == ranks.sorted && ranks.distinct == ranks,
      s"$filePath: merge ranks must be strictly increasing: $ranks")
    merges
  }

  /** Context-window chunking over the REAL token sequence — the
    * learned-BPE upgrade of [[TextAnalysis.chunk]]'s whitespace
    * windows: sliding windows of `maxTokens` BPE tokens with
    * `overlap`, stride = maxTokens − overlap, final window short, same
    * chunk-count arithmetic (`ceil((n − max) / stride) + 1` past one
    * window). Output: (idCol, chunk_idx, n_tokens, chunk_text) with
    * chunk_text the space-joined token window — token space is what a
    * training pipeline feeds the model, and unlike character offsets
    * it is well-defined under subword tokenization.
    *
    * Pure map-side: tokenization is the [[bpeTokens]] expression and
    * the one Generate (explode of the per-doc window list) IS the
    * operator's output — no shuffle, no join, stream-safe. */
  def chunk(df: DataFrame, textCol: String, idCol: String,
      merges: Seq[Merge], maxTokens: Int = 32, overlap: Int = 8): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1: $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens): $overlap")
    val stride = maxTokens - overlap
    val toks = bpeTokens(col(textCol), merges)
    val n = size(col("tokens"))
    val nChunks = when(n <= maxTokens, lit(1))
      .otherwise(ceil((n - maxTokens).cast("double") / stride).cast("int") + 1)
    df.select(col(idCol), toks.as("tokens"))
      .filter(size(col("tokens")) > 0)
      .select(col(idCol), col("tokens"),
        explode(transform(sequence(lit(0), nChunks - 1), k =>
          struct(k.cast("long").as("chunk_idx"),
            slice(col("tokens"), k * stride + 1, lit(maxTokens)).as("w")))).as("c"))
      .select(col(idCol),
        col("c.chunk_idx").as("chunk_idx"),
        size(col("c.w")).cast("long").as("n_tokens"),
        concat_ws(" ", col("c.w")).as("chunk_text"))
  }
}
