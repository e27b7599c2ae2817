package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting for training-data
  * pipelines — north-star scope beyond the reference surface (the
  * reference samples rows for PROFILES only,
  * reference: sparvi/profiler/profile_engine.py:381-396).
  *
  * Every operator here is a pure MAP-SIDE projection or filter over a
  * per-row uniform hash: no shuffle, no window, no state — the only
  * shape that is trivially correct at 100 TB and under retries. The
  * hash is keyed on (seed, id), NOT on `rand()`:
  *   - reproducible: the same corpus + seed yields the same split on
  *     any cluster, any partitioning, any retry — `rand()` changes
  *     under task retry and repartitioning, silently leaking val/test
  *     rows into train across reruns;
  *   - stable under growth: a document keeps its assignment when the
  *     corpus around it changes, so an incremental pipeline never
  *     migrates old documents between splits.
  *
  * `hashMode` picks the hash family, mirroring the dedup operators:
  * `"xxhash64"` (default) is the cheap codegen'd scale mode; `"md5"`
  * is the engine-reproducible gate mode (DuckDB replays it
  * digit-for-digit).
  */
object Sampling {

  /** Uniform u ∈ [0, 1) derived from (seed, id). md5 mode: the first
    * 8 hex digits as a 32-bit integer over 2^32 — coarse enough to
    * replay in SQL, uniform enough for split fractions. xxhash64
    * mode: the full 64-bit hash shifted to [0, 2^63) over 2^63.
    * THE single definition for the whole package — [[BudgetSelect]]'s
    * tie-break order and the gate oracles replay this exact formula,
    * so a second copy could silently diverge. */
  private[graft] def uniformHash(id: Column, seed: Long, hashMode: String): Column =
    hashMode match {
      case "md5" =>
        conv(substring(md5(concat_ws(":", lit(seed), id.cast("string"))), 1, 8), 16, 10)
          .cast("double") / lit(4294967296.0) // 2^32
      case "xxhash64" =>
        shiftrightunsigned(xxhash64(lit(seed), id), 1).cast("double") /
          lit(9.223372036854775808e18) // 2^63
      case other => throw new IllegalArgumentException(
        s"unknown hashMode: $other (expected xxhash64 or md5)")
    }

  /** Deterministic train/val/test (or any k-way) split: adds
    * `splitCol` holding the name of the split each row falls into,
    * by cumulative weight over the per-row uniform hash. Weights are
    * normalized, so (8, 1, 1) ≡ (0.8, 0.1, 0.1). Map-side only.
    *
    * Fraction accuracy is statistical (each row lands independently):
    * ±O(1/√n) per split — exact-count splitting would need a global
    * sort/rank shuffle and breaks assignment stability under corpus
    * growth, which is the wrong trade for training data. */
  def hashSplit(
      df: DataFrame, idCol: String,
      splits: Seq[(String, Double)],
      seed: Long = 42L, hashMode: String = "xxhash64",
      splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "splits must be non-empty")
    require(splits.forall(_._2 > 0), s"split weights must be positive: $splits")
    require(splits.map(_._1).distinct.size == splits.size,
      s"split names must be unique: ${splits.map(_._1)}")
    require(!df.columns.contains(splitCol),
      s"input already has a '$splitCol' column — pass splitCol to use another name")
    val total = splits.map(_._2).sum
    val cuts = splits.scanLeft(0.0)(_ + _._2).tail.map(_ / total)
    val u = uniformHash(col(idCol), seed, hashMode)
    // Guard the last bucket with otherwise(): u < 1.0 analytically,
    // but a float boundary must never yield a null split.
    val assigned = splits.init.zip(cuts.init)
      .foldLeft(when(lit(false), lit(""))) { case (acc, ((name, _), cut)) =>
        acc.when(u < cut, name)
      }
      .otherwise(splits.last._1)
    df.withColumn(splitCol, assigned)
  }

  /** Deterministic Bernoulli sampling: keep each row iff its uniform
    * hash falls under `fraction`. Same determinism/stability contract
    * as [[hashSplit]]; the sampled set is a strict subset of any
    * larger fraction's set with the same seed (nested samples — grow
    * a 1% pilot to 10% without resampling the pilot). */
  def sampleByHash(
      df: DataFrame, idCol: String, fraction: Double,
      seed: Long = 42L, hashMode: String = "xxhash64"): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction out of [0,1]: $fraction")
    df.filter(uniformHash(col(idCol), seed, hashMode) < fraction)
  }

  /** Deterministic epoch shuffle: a total order over the corpus that
    * is a pure function of (seed, epoch, id) — the reproducible
    * global shuffle a training run needs (same corpus + seed + epoch
    * → byte-identical order on any cluster; next epoch → a fresh,
    * equally-uniform order; no `rand()` retry hazard). Returns the
    * rows ordered by the epoch's uniform hash with `orderCol` exposing
    * it (for bucketed writes or range-partitioned sinks).
    *
    * Scale: a global sort — Spark range-partitions it distributively
    * (sampling pass + per-partition sort), the standard shape for
    * writing training shards in shuffle order; there is no
    * window/single-task funnel. */
  def epochShuffle(
      df: DataFrame, idCol: String, epoch: Int, seed: Long = 42L,
      hashMode: String = "xxhash64", orderCol: String = "shuffle_key"): DataFrame = {
    require(!df.columns.contains(orderCol),
      s"input already has a '$orderCol' column — pass orderCol to use another name")
    // Epoch folds into the seed so epochs are independent permutations
    // of the same corpus under one base seed.
    df.withColumn(orderCol,
        uniformHash(col(idCol), seed + 0x9E3779B97F4A7C15L * (epoch + 1), hashMode))
      .orderBy(col(orderCol), col(idCol))
  }

  /** Deterministic sequence packing: assign each document to a
    * training bin so that consecutive documents (in a reproducible
    * order) accumulate roughly `tokenBudget` tokens per bin — the
    * batch/shard assignment step of sequence packing, computed
    * deterministically instead of by a first-fit heap no two runs
    * replay the same way. Adds (`shardCol`, `binCol`).
    *
    * The corpus is first cut into `numShards` hash shards (pure
    * function of (seed, id) — same stability contract as every
    * operator here), then each shard is packed independently: its
    * documents ordered by the uniform hash, a running token sum, and
    * bin = floor((cumsum − tokens) / tokenBudget), i.e. a document
    * starts a new bin once the budget is crossed. Bins are "soft": a
    * document longer than the budget gets a bin of its own rather
    * than being split (compose with [[graft.text.TextAnalysis.chunk]]
    * first to bound document length).
    *
    * Scale: the one shuffle is the window over `shardCol` — shards
    * bound partition size (pick numShards ≈ corpus_tokens /
    * (10⁷·budget-ish) so a shard fits a task), and the window's sort
    * is per-shard, never global. Bin ids are (shard, bin) pairs —
    * globally unique, reproducible across runs, independent of
    * cluster shape. */
  def packBins(
      df: DataFrame, idCol: String, tokenCol: String,
      tokenBudget: Long, numShards: Int = 1024,
      seed: Long = 42L, hashMode: String = "xxhash64",
      shardCol: String = "shard", binCol: String = "bin"): DataFrame = {
    require(tokenBudget >= 1, s"tokenBudget must be >= 1: $tokenBudget")
    require(numShards >= 1, s"numShards must be >= 1: $numShards")
    Seq(shardCol, binCol).foreach { c =>
      require(!df.columns.contains(c),
        s"input already has a '$c' column — pass shardCol/binCol to use other names")
    }
    // Shard and order both derive from the ONE uniform hash (shard =
    // leading bits, order = the full value) — one hash evaluation,
    // and both replay in an external engine in md5 mode.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(shardCol)).orderBy(col("__u"), col(idCol))
    df.withColumn("__u", uniformHash(col(idCol), seed, hashMode))
      .withColumn(shardCol, floor(col("__u") * numShards).cast("int"))
      .withColumn(binCol,
        floor((sum(col(tokenCol)).over(w) - col(tokenCol)) / lit(tokenBudget)))
      .drop("__u")
  }

  /** Per-stratum deterministic sampling: each row's keep-fraction is
    * looked up by its stratum value (missing strata → `defaultFraction`,
    * default 0 = drop). The standard rebalancing move for mixed-source
    * training corpora (downsample the crawl, keep all of the curated
    * source) — still one map-side filter, no shuffle, no per-stratum
    * pass. */
  def stratifiedSampleByHash(
      df: DataFrame, idCol: String, strataCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 0.0,
      seed: Long = 42L, hashMode: String = "xxhash64"): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0.0 && f <= 1.0),
      s"fractions out of [0,1]: $fractions / default $defaultFraction")
    val frac = fractions.foldLeft(when(lit(false), lit(0.0))) {
      case (acc, (stratum, f)) => acc.when(col(strataCol) === stratum, f)
    }.otherwise(defaultFraction)
    df.filter(uniformHash(col(idCol), seed, hashMode) < frac)
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    * Spirakis A-ES): each row gets key = u^(1/w) from its (seed, id)
    * uniform hash and its weight column; the n largest keys are the
    * sample. Inclusion probability is proportional to weight in the
    * without-replacement sense, and the whole draw is a pure function
    * of (corpus, seed, n) — reproducible across clusters and retries,
    * unlike any rand()-based reservoir.
    *
    * Non-positive / null weights are excluded (a zero-weight row must
    * never be drawn; pow(u, 1/0) is a NaN trap, not a semantics).
    * Ties (astronomically unlikely with continuous keys) break by id.
    *
    * Scale: the top-n is Spark's TakeOrderedAndProject — per-partition
    * heaps of size n, one tiny merge on the driver; no global sort, no
    * window. n must fit driver memory (it is the SAMPLE size). */
  def weightedSampleByHash(
      df: DataFrame, idCol: String, weightCol: String, n: Int,
      seed: Long = 42L, hashMode: String = "xxhash64",
      keyCol: String = "sample_key"): DataFrame = {
    require(n >= 1, s"sample size must be >= 1: $n")
    require(!df.columns.contains(keyCol),
      s"input already has a '$keyCol' column — pass keyCol to use another name")
    val u = uniformHash(col(idCol), seed, hashMode)
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn(keyCol, pow(u, lit(1.0) / col(weightCol)))
      .orderBy(col(keyCol).desc, col(idCol))
      .limit(n)
  }

  /** The temperature-mixture keep-rates (driver-side, pure): source s
    * holding n_s of N rows gets q_s ∝ (n_s/N)^α (normalized over
    * sources in NAME order — a deterministic summation order both
    * engines can replay) and keep-rate min(1, target·q_s/n_s).
    * α < 1 flattens the mixture toward uniform (the multilingual
    * p^α move: tail sources upweighted relative to the head), α = 1
    * keeps shares as-is scaled to the target, α = 0 is uniform across
    * sources. `target` is the desired total row count in expectation;
    * head sources saturate at rate 1 rather than oversample. */
  def temperatureRates(
      counts: Map[String, Long], alpha: Double, target: Double): Map[String, Double] = {
    require(counts.values.forall(_ >= 0), s"negative counts: $counts")
    val n = counts.values.sum.toDouble
    if (n == 0) return counts.map { case (s, _) => s -> 0.0 }
    // Zero-count sources are excluded from the normalizer: math.pow(0, 0)
    // is 1.0, so at α = 0 an empty source would otherwise claim a full
    // share of z while keeping nothing, deflating every live source's
    // keep-rate below the target.
    val bySource = counts.toSeq.filter(_._2 > 0).sortBy(_._1)
    val w = bySource.map { case (s, c) => s -> math.pow(c / n, alpha) }
    val z = w.map(_._2).sum
    val live = w.map { case (s, ws) =>
      val c = counts(s)
      s -> (if (z == 0) 0.0 else math.min(1.0, target * (ws / z) / c))
    }.toMap
    counts.map { case (s, _) => s -> live.getOrElse(s, 0.0) }
  }

  /** Temperature-weighted source rebalancing in one pass + one
    * map-side filter: count rows per source (S scalars to the
    * driver), derive [[temperatureRates]], select with the same
    * seeded uniform hash as [[stratifiedSampleByHash]] — so the whole
    * resample is a pure replayable function of (corpus, α, target,
    * seed), and the counting aggregate is the only shuffle. */
  def temperatureMixSample(
      df: DataFrame, idCol: String, srcCol: String,
      alpha: Double, target: Double,
      seed: Long = 42L, hashMode: String = "xxhash64"): DataFrame = {
    // The source column is compared and counted as a string so non-string
    // source columns (int shard ids, dates) work; NULL sources are excluded
    // from the rate table and fall through to defaultFraction = 0 (dropped).
    val srcStr = "__graft_src_str"
    val withSrc = df.withColumn(srcStr, col(srcCol).cast("string"))
    val counts = withSrc.groupBy(col(srcStr)).agg(count(lit(1)).as("n"))
      .collect().flatMap(r => Option(r.getString(0)).map(_ -> r.getLong(1))).toMap
    stratifiedSampleByHash(withSrc, idCol, srcStr,
      temperatureRates(counts, alpha, target), seed = seed, hashMode = hashMode)
      .drop(srcStr)
  }
}
