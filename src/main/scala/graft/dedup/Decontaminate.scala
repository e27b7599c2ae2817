package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.util.Partitioning.spread

/** Benchmark decontamination: find (and drop) corpus documents that
  * contain evaluation-set material, by token n-gram overlap — the
  * standard published construction (GPT-3 appendix C / PaLM §7-style
  * n-gram collision between each benchmark example and the training
  * corpus).
  *
  * Semantics: a benchmark example `b` is CONTAMINATED IN corpus
  * document `d` when at least `minOverlap` of `b`'s distinct token
  * n-grams also occur in `d`. The fraction's denominator is the
  * example's FULL distinct-gram count — including any grams the
  * bench-frequency cap pruned from the join — so a heavily-capped
  * example can never silently report a perfect overlap it did not
  * prove; run [[cappedBenchGrams]] alongside to see what the cap hid
  * ("no silent caps", as [[Dedup.cappedBuckets]] /
  * [[Dedup.cappedFingerprints]]).
  *
  * Scale shape (the asymmetry is the whole design): the corpus is the
  * 100 TB side, the benchmark is the small side (eval suites are at
  * most ~10^5 examples × ~10^2 grams ≈ 10^7 posting rows). So the
  * benchmark's pruned posting list and per-example gram counts are
  * BROADCAST, the corpus side explodes to (doc, gram) map-side and is
  * immediately filtered by the broadcast hash join — corpus text is
  * never shuffled, and the only exchange is the partial-aggregated
  * (corpus_id, bench_id) match count, whose rows exist only for
  * documents actually sharing a surviving gram with some example.
  *
  * The cap (`maxBenchGramDf`) bounds the one fan-out hazard: a gram
  * occurring in many BENCHMARK examples (shared prompt preamble,
  * boilerplate instructions) multiplies every matching corpus row by
  * its bench document frequency. Grams above the cap are dropped
  * before the join and surfaced by the audit.
  *
  * Gram keys follow the established two-mode convention
  * ([[graft.text.TextAnalysis.winnowingFingerprints]]): `xxhash64`
  * (default) ships fixed-width longs — the scale mode; `md5` keeps
  * hex strings an external engine reproduces bit-for-bit — the
  * oracle-gate mode.
  */
object Decontaminate {

  /** Distinct token n-gram keys of a document set as a posting list:
    * (id, gram), one row per distinct gram per document. Gram text is
    * the space-joined token run ([[Dedup.wordShingles]] — documents
    * shorter than `gramSize` tokens collapse to one whole-text gram),
    * keyed by `hashMode`. Null texts produce no rows. */
  def gramKeys(
      df: DataFrame, idCol: String, textCol: String,
      gramSize: Int = 8, hashMode: String = "xxhash64"): DataFrame = {
    require(gramSize >= 1, s"gramSize must be >= 1: $gramSize")
    val grams = Dedup.wordShingles(col(textCol), gramSize)
    val keyed = hashMode match {
      case "xxhash64" => transform(grams, g => xxhash64(g))
      case "md5"      => transform(grams, g => md5(g))
      case other => throw new IllegalArgumentException(
        s"unknown hashMode: $other (expected xxhash64 or md5)")
    }
    spread(df).filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), explode(keyed).as("gram"))
  }

  private def requirePostingList(df: DataFrame, what: String): Unit = {
    val missing = Seq("id", "gram").filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"$what must be a (id, gram) posting list as produced by gramKeys; missing: ${missing.mkString(", ")}")
  }

  /** Contamination report from PRECOMPUTED posting lists — the shared
    * shape: both frames come from [[gramKeys]] (same gramSize, same
    * hashMode — this variant deliberately takes ONLY the frames and
    * the thresholds, so it cannot accept conflicting signature
    * parameters). Compute the benchmark's list once and pass it to
    * BOTH this and [[cappedBenchGramsFromGrams]] to share the scan.
    *
    * Output: (corpus_id, bench_id, shared_grams, bench_grams,
    * overlap_frac) for every pair at or above `minOverlap`, where
    * `bench_grams` is the example's full distinct-gram count and
    * `overlap_frac` = shared/bench_grams rounded to 4 decimals. */
  def contaminationReportFromGrams(
      corpusGrams: DataFrame, benchGrams: DataFrame,
      minOverlap: Double = 0.5, maxBenchGramDf: Int = 1000,
      broadcastBench: Boolean = true): DataFrame = {
    requirePostingList(corpusGrams, "corpusGrams")
    requirePostingList(benchGrams, "benchGrams")
    require(minOverlap > 0.0 && minOverlap <= 1.0,
      s"minOverlap must be in (0, 1]: $minOverlap")
    require(maxBenchGramDf >= 1, s"maxBenchGramDf must be >= 1: $maxBenchGramDf")
    // Full per-example gram count: the honest denominator (capped
    // grams still count — they reduce the achievable fraction, and the
    // audit makes that visible).
    val benchCounts = benchGrams.groupBy(col("id").as("bench_id"))
      .agg(count(lit(1)).as("bench_grams"))
    // Posting rows are distinct per (id, gram), so plain count is the
    // bench document frequency.
    val rare = benchGrams.groupBy("gram").agg(count(lit(1)).as("bench_df"))
      .filter(col("bench_df") <= maxBenchGramDf).select("gram")
    val pruned = benchGrams.join(rare, "gram")
      .select(col("gram"), col("id").as("bench_id"))
    val hint = (f: DataFrame) => if (broadcastBench) broadcast(f) else f
    corpusGrams.join(hint(pruned), "gram")
      .groupBy(col("id").as("corpus_id"), col("bench_id"))
      .agg(count(lit(1)).as("shared_grams"))
      .join(hint(benchCounts), "bench_id")
      .withColumn("overlap_frac",
        round(col("shared_grams").cast("double") / col("bench_grams"), 4))
      .filter(col("overlap_frac") >= minOverlap)
      .select("corpus_id", "bench_id", "shared_grams", "bench_grams", "overlap_frac")
  }

  /** Convenience wrapper computing both posting lists inline. */
  def contaminationReport(
      corpus: DataFrame, corpusIdCol: String, corpusTextCol: String,
      benchmark: DataFrame, benchIdCol: String, benchTextCol: String,
      gramSize: Int = 8, minOverlap: Double = 0.5,
      maxBenchGramDf: Int = 1000, hashMode: String = "xxhash64",
      broadcastBench: Boolean = true): DataFrame =
    contaminationReportFromGrams(
      gramKeys(corpus, corpusIdCol, corpusTextCol, gramSize, hashMode),
      gramKeys(benchmark, benchIdCol, benchTextCol, gramSize, hashMode),
      minOverlap, maxBenchGramDf, broadcastBench)

  /** The audit for the bench-frequency cap — the grams the cap DROPS
    * (bench document frequency above `maxBenchGramDf`), as
    * (gram, bench_df). Empty output means the cap bound nothing and
    * the report saw every benchmark gram; rows here are (typically)
    * shared prompt boilerplate invisible to the overlap join, each
    * quantified by how many examples carry it. One groupBy over the
    * small side — negligible at any corpus scale. */
  def cappedBenchGramsFromGrams(
      benchGrams: DataFrame, maxBenchGramDf: Int = 1000): DataFrame = {
    requirePostingList(benchGrams, "benchGrams")
    benchGrams.groupBy("gram").agg(count(lit(1)).as("bench_df"))
      .filter(col("bench_df") > maxBenchGramDf)
  }

  /** Convenience wrapper for [[cappedBenchGramsFromGrams]]. */
  def cappedBenchGrams(
      benchmark: DataFrame, benchIdCol: String, benchTextCol: String,
      gramSize: Int = 8, maxBenchGramDf: Int = 1000,
      hashMode: String = "xxhash64"): DataFrame =
    cappedBenchGramsFromGrams(
      gramKeys(benchmark, benchIdCol, benchTextCol, gramSize, hashMode),
      maxBenchGramDf)

  /** The corpus minus every document contaminated by ANY benchmark
    * example: a left-anti join of the corpus against the report's
    * distinct corpus ids. Returns the corpus rows unchanged. */
  def decontaminate(
      corpus: DataFrame, corpusIdCol: String, corpusTextCol: String,
      benchmark: DataFrame, benchIdCol: String, benchTextCol: String,
      gramSize: Int = 8, minOverlap: Double = 0.5,
      maxBenchGramDf: Int = 1000, hashMode: String = "xxhash64",
      broadcastBench: Boolean = true): DataFrame = {
    val contaminated = contaminationReport(
        corpus, corpusIdCol, corpusTextCol,
        benchmark, benchIdCol, benchTextCol,
        gramSize, minOverlap, maxBenchGramDf, hashMode, broadcastBench)
      .select(col("corpus_id")).distinct()
    corpus.join(contaminated,
      corpus(corpusIdCol) === contaminated("corpus_id"), "left_anti")
  }
}
