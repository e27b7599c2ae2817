package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.sampling.Sampling

/** Deterministic hash sampling/splitting: reproducibility, assignment
  * stability under corpus growth, nested-sample subset property, and
  * statistical closeness of realized fractions. */
class SamplingSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private lazy val corpus = {
    val s = spark
    import s.implicits._
    (1L to 10000L).map(i => (i, s"doc $i")).toDF("id", "text")
  }

  test("hashSplit assigns every row exactly one valid split, near the requested weights") {
    for (mode <- Seq("xxhash64", "md5")) {
      val out = Sampling.hashSplit(corpus, "id",
        Seq(("train", 8.0), ("val", 1.0), ("test", 1.0)), hashMode = mode)
      val counts = out.groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      withClue(s"$mode: $counts") {
        counts.values.sum shouldBe 10000L
        counts.keySet shouldBe Set("train", "val", "test")
        counts("train").toDouble shouldBe 8000.0 +- 300.0 // ±~7σ of Binomial(10k, .8)
        counts("val").toDouble shouldBe 1000.0 +- 250.0
        counts("test").toDouble shouldBe 1000.0 +- 250.0
      }
    }
  }

  test("hashSplit is deterministic and stable under corpus growth") {
    val s = spark
    import s.implicits._
    val first = Sampling.hashSplit(corpus, "id", Seq(("a", 0.5), ("b", 0.5)))
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // Same call again: identical assignment (no rand() anywhere).
    val again = Sampling.hashSplit(corpus, "id", Seq(("a", 0.5), ("b", 0.5)))
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    again shouldBe first
    // Grow the corpus: every pre-existing id keeps its split.
    val grown = (1L to 20000L).map(i => (i, s"doc $i")).toDF("id", "text")
    val after = Sampling.hashSplit(grown, "id", Seq(("a", 0.5), ("b", 0.5)))
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    first.foreach { case (id, split) => after(id) shouldBe split }
  }

  test("sampleByHash: nested samples — a smaller fraction is a subset of a larger one") {
    val small = Sampling.sampleByHash(corpus, "id", 0.1)
      .select("id").collect().map(_.getLong(0)).toSet
    val large = Sampling.sampleByHash(corpus, "id", 0.3)
      .select("id").collect().map(_.getLong(0)).toSet
    small.subsetOf(large) shouldBe true
    small.size.toDouble shouldBe 1000.0 +- 250.0
    large.size.toDouble shouldBe 3000.0 +- 350.0
    // Different seed → a (near-certainly) different sample.
    Sampling.sampleByHash(corpus, "id", 0.1, seed = 7L)
      .select("id").collect().map(_.getLong(0)).toSet should not be small
  }

  test("stratifiedSampleByHash applies per-stratum fractions; unlisted strata use the default") {
    val s = spark
    import s.implicits._
    val strat = corpus.withColumn("src", (col("id") % 3).cast("string"))
    val out = Sampling.stratifiedSampleByHash(strat, "id", "src",
      Map("0" -> 1.0, "1" -> 0.25)).groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.getOrElse("2", 0L) shouldBe 0L // default fraction drops
    out("0") shouldBe 3333L // fraction 1.0 keeps the whole stratum
    out("1").toDouble shouldBe 833.0 +- 220.0
  }

  test("epochShuffle: deterministic permutation per epoch, different across epochs") {
    val e0a = Sampling.epochShuffle(corpus, "id", epoch = 0)
      .select("id").collect().map(_.getLong(0)).toSeq
    val e0b = Sampling.epochShuffle(corpus, "id", epoch = 0)
      .select("id").collect().map(_.getLong(0)).toSeq
    e0b shouldBe e0a // reproducible
    e0a.sorted shouldBe (1L to 10000L) // a permutation, nothing lost
    e0a should not be (1L to 10000L) // and genuinely shuffled
    val e1 = Sampling.epochShuffle(corpus, "id", epoch = 1)
      .select("id").collect().map(_.getLong(0)).toSeq
    e1 should not be e0a // epochs are independent permutations
    e1.sorted shouldBe (1L to 10000L)
  }

  test("invalid arguments fail fast") {
    an[IllegalArgumentException] should be thrownBy
      Sampling.hashSplit(corpus, "id", Seq(("a", 0.5), ("a", 0.5)))
    an[IllegalArgumentException] should be thrownBy
      Sampling.hashSplit(corpus, "id", Seq(("a", -1.0)))
    an[IllegalArgumentException] should be thrownBy
      Sampling.hashSplit(corpus.withColumn("split", lit("x")), "id", Seq(("a", 1.0)))
    an[IllegalArgumentException] should be thrownBy
      Sampling.sampleByHash(corpus, "id", 1.5)
    an[IllegalArgumentException] should be thrownBy
      Sampling.sampleByHash(corpus, "id", 0.5, hashMode = "sha1")
  }

  test("packBins: per-bin token totals respect the soft budget") {
    val s = spark
    import s.implicits._
    // Token counts 1..200 over 2000 docs, budget 300: every bin's
    // total may overshoot only by its LAST document (soft semantics),
    // i.e. the pre-overshoot prefix is under budget.
    val df = (1L to 2000L).map(i => (i, i % 200 + 1)).toDF("id", "n_tok")
    val out = Sampling.packBins(df, "id", "n_tok", tokenBudget = 300L, numShards = 16)
    out.columns should contain allOf ("shard", "bin")
    val viol = out.groupBy("shard", "bin")
      .agg(sum(col("n_tok")).as("tot"), max(col("n_tok")).as("mx"))
      .filter(col("tot") - col("mx") >= 300L) // prefix before last doc already ≥ budget
      .count()
    viol shouldBe 0L
    // Deterministic across runs and complete.
    val again = Sampling.packBins(df, "id", "n_tok", tokenBudget = 300L, numShards = 16)
    out.select("id", "shard", "bin").collect().toSet shouldBe
      again.select("id", "shard", "bin").collect().toSet
    out.count() shouldBe 2000L
  }

  test("packBins: an oversized document gets its own bin boundary, md5 mode replays") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 1000L), (2L, 10L), (3L, 10L)).toDF("id", "n_tok")
    val out = Sampling.packBins(df, "id", "n_tok", tokenBudget = 100L,
      numShards = 1, hashMode = "md5").collect()
    out.length shouldBe 3
    // All in shard 0. Soft-bin semantics for the 1000-token doc: any
    // doc AFTER it in hash order starts ≥ 1000 tokens later, i.e. at
    // least 10 whole bins later — only docs BEFORE it (prior < 100)
    // can share its bin, and nothing lands strictly between.
    val bins = out.map(r => r.getAs[Long]("id") -> r.getAs[Long]("bin")).toMap
    val big = bins(1L)
    Seq(2L, 3L).foreach { id =>
      withClue(s"doc $id bins=$bins") {
        (bins(id) <= big || bins(id) >= big + 10) shouldBe true
      }
    }
  }

  test("packBins rejects a taken column name and bad budget") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 10L)).toDF("id", "bin")
    an[IllegalArgumentException] should be thrownBy
      Sampling.packBins(df, "id", "bin", tokenBudget = 10L)
    an[IllegalArgumentException] should be thrownBy
      Sampling.packBins(df.withColumnRenamed("bin", "n"), "id", "n", tokenBudget = 0L)
  }

  test("temperatureRates: α flattens the mixture, caps at 1, handles edges") {
    val counts = Map("head" -> 900L, "mid" -> 90L, "tail" -> 10L)
    // α = 1: proportional — every source keeps target/N.
    val r1 = Sampling.temperatureRates(counts, alpha = 1.0, target = 500.0)
    r1.values.foreach(_ shouldBe 0.5 +- 1e-12)
    // α = 0: uniform budget per source — tail saturates at 1.
    val r0 = Sampling.temperatureRates(counts, alpha = 0.0, target = 300.0)
    r0("head") shouldBe (100.0 / 900.0) +- 1e-12
    r0("mid") shouldBe 1.0
    r0("tail") shouldBe 1.0
    // α = 0.5 sits between: the head is downsampled (rate ≈ 0.39)
    // while both smaller sources saturate at 1 at this target.
    val r5 = Sampling.temperatureRates(counts, alpha = 0.5, target = 500.0)
    r5("head") shouldBe 0.3908 +- 0.001
    r5("mid") shouldBe 1.0
    r5("tail") shouldBe 1.0
    // Expected kept total never exceeds the achievable corpus size.
    val kept = counts.map { case (s, n) => r5(s) * n }.sum
    kept should be <= 1000.0 + 1e-9
    // Edges: empty corpus and zero-count source → rate 0.
    Sampling.temperatureRates(Map("a" -> 0L), 0.5, 100.0) shouldBe Map("a" -> 0.0)
    Sampling.temperatureRates(Map.empty[String, Long], 0.5, 100.0) shouldBe Map.empty
    // A zero-count source must not claim normalizer weight: at α = 0
    // pow(0,0) = 1, so an empty source naively deflates every live
    // source's rate. Rates with and without the empty source agree.
    val withEmpty = Sampling.temperatureRates(
      Map("a" -> 100L, "b" -> 100L, "dead" -> 0L), alpha = 0.0, target = 100.0)
    val without = Sampling.temperatureRates(
      Map("a" -> 100L, "b" -> 100L), alpha = 0.0, target = 100.0)
    withEmpty("dead") shouldBe 0.0
    withEmpty("a") shouldBe without("a") +- 1e-12
    withEmpty("b") shouldBe without("b") +- 1e-12
  }

  test("temperatureMixSample handles non-string and null source columns") {
    val s = spark
    import s.implicits._
    // Int source column with nulls: counting casts to string; null
    // sources are excluded from the rate table and dropped.
    val df = (0L until 300L).map(i =>
      (i, if (i % 3 == 2) None else Some((i % 3).toInt))).toDF("id", "src")
    val out = Sampling.temperatureMixSample(df, "id", "src", alpha = 1.0, target = 100.0)
    out.columns should contain("src")
    val bySrc = out.groupBy("src").count().collect()
      .map(r => Option(r.get(0)).map(_.toString) -> r.getLong(1)).toMap
    bySrc.keySet should not contain None
    // α = 1 proportional over the 200 non-null rows: each live source
    // keeps ~half its rows.
    bySrc.values.sum.toDouble shouldBe 100.0 +- 35.0
  }

  test("temperatureMixSample keeps ~target rows with the mixture flattened") {
    val s = spark
    import s.implicits._
    val df = (0L until 1000L).map(i =>
      (i, if (i % 10 < 8) "head" else "tail")).toDF("id", "src")
    val out = Sampling.temperatureMixSample(df, "id", "src", alpha = 0.5, target = 400.0)
      .groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = out.values.sum
    total.toDouble shouldBe 400.0 +- 60.0
    // Flattening: tail share of the sample ≫ its 20% corpus share.
    out("tail").toDouble / total should be > 0.25
    // Determinism: same seed, same selection.
    val again = Sampling.temperatureMixSample(df, "id", "src", alpha = 0.5, target = 400.0)
      .agg(org.apache.spark.sql.functions.sum("id")).head().getLong(0)
    val first = Sampling.temperatureMixSample(df, "id", "src", alpha = 0.5, target = 400.0)
      .agg(org.apache.spark.sql.functions.sum("id")).head().getLong(0)
    again shouldBe first
  }

  test("weightedSampleByHash draws n rows, excludes non-positive weights, favors heavy rows") {
    val s = spark
    import s.implicits._
    // 200 light rows (w=1) vs 200 heavy rows (w=50): the heavy half
    // should dominate a 100-row draw overwhelmingly.
    val df = (1 to 400).map(i => (i.toLong, if (i <= 200) 1.0 else 50.0))
      .toDF("id", "w")
      .union(Seq((401L, 0.0), (402L, -3.0)).toDF("id", "w")) // never drawn
    val out = Sampling.weightedSampleByHash(df, "id", "w", n = 100)
    out.count() shouldBe 100L
    out.filter(org.apache.spark.sql.functions.col("id") > 400L).count() shouldBe 0L
    val heavy = out.filter(org.apache.spark.sql.functions.col("w") === 50.0).count()
    heavy.toDouble should be > 80.0
    // Determinism: the same draw every time.
    val a = out.agg(org.apache.spark.sql.functions.sum("id")).head().getLong(0)
    val b = Sampling.weightedSampleByHash(df, "id", "w", n = 100)
      .agg(org.apache.spark.sql.functions.sum("id")).head().getLong(0)
    a shouldBe b
  }

  test("weightedSampleByHash top-n plans as TakeOrdered, not a global sort") {
    val plan = Sampling.weightedSampleByHash(corpus, "id", "id", n = 5)
      .queryExecution.executedPlan.toString
    plan should include("TakeOrderedAndProject")
  }

  test("sampling plans are pure map-side: no exchange, no aggregate") {
    val plan = Sampling.hashSplit(corpus, "id", Seq(("a", 0.9), ("b", 0.1)))
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
    plan should not include "Aggregate"
    val fplan = Sampling.stratifiedSampleByHash(
      corpus.withColumn("src", lit("s")), "id", "src", Map("s" -> 0.5))
      .queryExecution.executedPlan.toString
    fplan should not include "Exchange"
    fplan should not include "Aggregate"
  }
}
