package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.dedup.Dedup
import graft.text.TextAnalysis

/** End-to-end composition check: the canonical training-data cleanup
  * flow — exact dedup → near-dup components → canonicalize → quality +
  * language filters → token accounting — runs as ONE composed
  * DataFrame program over the documents fixture. Pins the invariants
  * a pipeline author relies on (stage monotonicity, loss accounting,
  * schema joinability), not specific corpus values.
  */
class PipelineSpec extends AnyFunSuite with Matchers with SparkTestBase {

  test("dedup → canonicalize → filter → count composes and conserves documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("text").isNotNull)
    val n0 = docs.count()

    // Stage 1: exact dedup (first occurrence by content digest wins).
    val exact = docs.withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("fp").orderBy("doc_id")))
      .filter(col("rn") === 1).drop("fp", "rn")
    val n1 = exact.count()
    n1 should be <= n0

    // Stage 2: near-dup components + canonical survivor per cluster.
    // The occupancy audit runs alongside the join over one shared
    // banded scan — the "no silent caps" contract: after stage 1's
    // exact dedup, the default cap must bind nothing on this corpus
    // (an empty audit proves the pair set saw every candidate).
    val buckets = Dedup.bandBuckets(exact, "doc_id", "text").persist()
    try {
      Dedup.cappedBucketsFromBuckets(buckets).count() shouldBe 0L
    } finally { buckets.unpersist(blocking = false); () }
    val pairs = Dedup.nearDupPairs(exact, "doc_id", "text", threshold = 0.8)
    val labeled = Dedup.componentIds(exact, "doc_id", pairs)
    labeled.count() shouldBe n1 // labeling loses nothing
    val canonical = labeled.filter(col("doc_id") === col("component"))
    val n2 = canonical.count()
    n2 should be <= n1
    // Survivor set ≡ the components policy of dropNearDuplicates.
    val viaPolicy = Dedup.dropNearDuplicates(exact, "doc_id", "text",
      threshold = 0.8, policy = "components")
    viaPolicy.count() shouldBe n2

    // Stage 3: language + quality filters join on doc_id.
    val lang = TextAnalysis.languageId(canonical, "text", "doc_id")
    val quality = TextAnalysis.qualityScore(canonical, "text", "doc_id")
    val kept = canonical
      .join(lang.filter(col("lang_pred") =!= "unknown"), "doc_id")
      .join(quality.filter(col("quality_score") > 0.1), "doc_id")
    val n3 = kept.count()
    n3 should be <= n2
    n3 should be > 0L

    // Stage 3b: corpus-LM scoring joins the same way — the filter here
    // only asserts scorability (n_grams > 0) so the pin stays
    // corpus-agnostic; a real pipeline thresholds the perplexity.
    val lm = TextAnalysis.lmScore(canonical, "text", "doc_id", vocabSize = 512)
    lm.count() shouldBe n2
    kept.join(lm.filter(col("n_grams") > 0), "doc_id").count() shouldBe n3

    // Stage 4: token accounting over the surviving corpus.
    val tokens = TextAnalysis.tokenStats(kept, "text", "doc_id")
    tokens.count() shouldBe n3
    val totals = tokens.agg(sum("n_tokens_ws"), sum("n_tokens_bpe")).head()
    totals.getLong(0) should be > 0L
    totals.getLong(1) should be >= totals.getLong(0) // BPE ≥ whitespace splits

    // Stage 5: data mixing — budget-select the best-quality documents
    // per language under per-source token budgets, then carve a
    // deterministic validation split. Both stages are map-side /
    // threshold-search operators that join back on doc_id.
    val mixed = graft.sampling.BudgetSelect.budgetSelect(
      kept.join(tokens.select(col("doc_id"), col("n_tokens_ws")), "doc_id"),
      "doc_id", "lang_pred", "quality_score", "n_tokens_ws",
      Map.empty, defaultBudget = 2000L)
    val spentPerLang = mixed.groupBy("lang_pred")
      .agg(sum("n_tokens_ws").as("spent")).collect()
    spentPerLang should not be empty
    all(spentPerLang.map(_.getAs[Long]("spent"))) should be <= 2000L
    val split = graft.sampling.Sampling.hashSplit(
      mixed, "doc_id", Seq(("train", 9.0), ("val", 1.0)))
    split.count() shouldBe mixed.count() // splitting loses nothing
    // Split assignment is a pure function of doc_id: recomputing over
    // the recomputed pipeline yields the identical partition.
    val again = graft.sampling.Sampling.hashSplit(
      mixed, "doc_id", Seq(("train", 9.0), ("val", 1.0)))
    again.filter(col("split") === "val").select("doc_id").collect().toSet shouldBe
      split.filter(col("split") === "val").select("doc_id").collect().toSet

    // Stage 6: decontaminate against a quoted-passage benchmark, then
    // chunk the survivors to a context window and pack the chunks
    // into soft token-budget bins — the last mile before a trainer.
    val wtok = org.apache.spark.sql.functions.split(trim(col("text")), "\\s+")
    val bench = docs.filter(pmod(col("doc_id"), lit(97)) === 11)
      .select(col("doc_id").as("q_id"),
        concat_ws(" ", slice(wtok, 3, 16)).as("q_text"))
    val clean = graft.dedup.Decontaminate.decontaminate(
      split.filter(col("split") === "train"), "doc_id", "text",
      bench, "q_id", "q_text", gramSize = 6, minOverlap = 0.5)
    val nTrain = split.filter(col("split") === "train").count()
    clean.count() should be <= nTrain
    clean.count() should be > 0L
    // Redaction preserves the row set; chunking only ever expands it.
    val redacted = TextAnalysis.redact(clean, "text")
    redacted.count() shouldBe clean.count()
    val chunks = TextAnalysis.chunk(redacted, "text", "doc_id",
      maxTokens = 24, overlap = 4)
    chunks.count() should be >= clean.count()
    chunks.select(max(col("n_tokens"))).head().getLong(0) should be <= 24L
    // Pack chunks into bins keyed by (doc, chunk) — every chunk lands
    // in exactly one bin and the soft-budget invariant holds.
    val packed = graft.sampling.Sampling.packBins(
      chunks.withColumn("cid", col("doc_id") * 1000 + col("chunk_idx")),
      "cid", "n_tokens", tokenBudget = 96L, numShards = 8)
    packed.count() shouldBe chunks.count()
    packed.groupBy("shard", "bin")
      .agg(sum(col("n_tokens")).as("tot"), max(col("n_tokens")).as("mx"))
      .filter(col("tot") - col("mx") >= 96L).count() shouldBe 0L

    // Stage 7: the mixture dashboard reads consistently off the same
    // corpus — per-source doc counts re-add to the corpus total.
    val report = TextAnalysis.sourceMixReport(docs, "text", "source")
    report.agg(sum("n_docs")).head().getLong(0) shouldBe n0
  }

  test("embedding curation composes: shared cells → semantic pairs + audit → components → quantize") {
    import graft.similarity.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val n0 = emb.count()
    // ONE cell-assignment scan feeds both the audit and the pairing
    // join — the shared-bucket contract, SemDeDup flavor.
    val cells = Similarity.kmeansCells(emb, "vec_id", "embedding",
      nCells = 4, kmeansIterations = 2).persist()
    try {
      cells.count() shouldBe n0
      // Default cap binds nothing here; an empty audit proves the
      // pair set saw every within-cell candidate.
      Similarity.cappedBucketsFromBuckets(cells, maxBucketOccupancy = 1000)
        .count() shouldBe 0L
      val pairs = Similarity.nearDupByEmbeddingFromBuckets(cells,
        threshold = 0.3, maxBucketOccupancy = 1000)
      pairs.count() should be > 0L
      val labeled = graft.dedup.Dedup.componentIds(emb, "vec_id", pairs)
      labeled.count() shouldBe n0 // labeling loses nothing
      val canon = labeled.filter(col("vec_id") === col("component"))
      val n1 = canon.count()
      n1 should be < n0  // 0.3-threshold pairs genuinely collapse clusters
      n1 should be > 0L
      // Survivors quantize 1:1 for the ANN working set.
      Similarity.quantizeInt8(canon, "vec_id", "embedding")
        .count() shouldBe n1
    } finally { cells.unpersist(blocking = false); () }
  }

  test("compressed ANN composes: random projection → IVF-PQ over the projected space") {
    import graft.similarity.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val n0 = emb.count()
    // JL-project 64 → 16 (4× smaller vectors, training-free), then
    // search the PROJECTED space with the composed IVF-PQ layout —
    // the full memory ladder: 64×4B floats → 16×8B doubles → 4 codes.
    val proj = Similarity.randomProjection(emb, "embedding", dim = 64, outDim = 16)
    proj.count() shouldBe n0
    val q = proj.filter(col("vec_id") < 3)
    val hits = Similarity.ivfPqTopK(proj, "vec_id", "projected",
      q, "vec_id", "projected", dim = 16, k = 5, nCells = 4, nProbe = 2,
      numSubspaces = 4, codebookSize = 8, kmeansIterations = 2)
      .collect()
    hits.map(_.getAs[Long]("query_id")).distinct should have size 3
    hits.foreach { r =>
      r.getAs[Long]("rank") should (be >= 1L and be <= 5L)
      r.getAs[Long]("neighbor_id") should not be r.getAs[Long]("query_id")
    }
    // No recall bound here: this fixture's vectors are isotropic
    // (max pairwise cosine ~0.5), so the top-5 ordering is noise the
    // code words cannot preserve — recall contracts live in
    // SimilaritySpec's clustered fixtures. What the composition DOES
    // guarantee on any input: full query coverage, k results each,
    // deterministic output.
    val again = Similarity.ivfPqTopK(proj, "vec_id", "projected",
      q, "vec_id", "projected", dim = 16, k = 5, nCells = 4, nProbe = 2,
      numSubspaces = 4, codebookSize = 8, kmeansIterations = 2)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"))).toSet
    hits.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
      r.getAs[Long]("neighbor_id"))).toSet shouldBe again
  }

  test("text-native semantic dedup: hashed TF → JL projection → SemDeDup, no external model") {
    import graft.similarity.Similarity
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("text").isNotNull).limit(60)
    // plant a near-duplicate of the lowest doc under a fresh id
    val donor = base.orderBy("doc_id").select("doc_id", "text").head()
    val planted = Seq((donor.getLong(0) + 1000000L, donor.getString(1) + " tail"))
    val s0 = spark
    import s0.implicits._
    val docs = base.select("doc_id", "text")
      .unionByName(planted.toDF("doc_id", "text"))

    // Stage 1: vocabulary-free text vectors (hashed TF, dim 256).
    val dim = 256
    val sparse = TextAnalysis.hashedTfVectors(docs, "text", "doc_id", dim = dim)
    val dense = sparse.withColumn("v",
      transform(sequence(lit(0), lit(dim - 1)), i =>
        coalesce(
          element_at(map_from_arrays(col("indices"), col("values")), i),
          lit(0L)).cast("double")))

    // Stage 2: JL-compress 256 → 32 dims, map-side.
    val projected = Similarity.randomProjection(dense, "v", dim = dim, outDim = 32)

    // Stage 3: SemDeDup over the projected vectors — the planted copy
    // must pair with its donor at high cosine; every emitted pair
    // clears the threshold by construction.
    val pairs = Similarity.semanticNearDupPairs(
      projected.select(col("doc_id"), col("projected")),
      "doc_id", "projected", nCells = 4, threshold = 0.9,
      kmeansIterations = 2, centroidInitOrder = Some(Seq(col("doc_id"))))
      .collect()
    val ids = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    ids should contain ((donor.getLong(0), donor.getLong(0) + 1000000L))
    pairs.foreach(r => r.getDouble(2) should be >= 0.9)
  }

  test("tokenizer-true data prep: learn BPE → budget-select on real tokens → chunk") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("text").isNotNull)

    // Stage 1: learn the tokenizer from the corpus itself, then attach
    // REAL token counts (not whitespace proxies) to every document.
    val merges = graft.text.Bpe.learnMerges(docs, "text", numMerges = 10)
    val withTokens = docs.join(
      graft.text.Bpe.tokenize(docs, "text", "doc_id", merges)
        .select(col("doc_id"), col("n_tokens")),
      Seq("doc_id"))

    // Stage 2: per-source token budgets driven by those counts — the
    // data-mixing step now measures budget in the same unit the model
    // will consume.
    val budgets = Map("src0" -> 600L, "src1" -> 600L)
    val picked = graft.sampling.BudgetSelect.budgetSelect(
      withTokens, "doc_id", "source", "doc_id", "n_tokens",
      budgets, defaultBudget = 0L)
    val bySource = picked.select("doc_id").join(withTokens, Seq("doc_id"))
      .groupBy("source").agg(sum("n_tokens").as("toks"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    bySource.keySet shouldBe budgets.keySet // zero-budget sources excluded
    bySource.values.foreach { case (toks, n) =>
      toks should be <= 600L
      n should be >= 1L
    }

    // Stage 3: context windows over the SAME learned tokenizer; every
    // selected document chunks completely (full coverage, stride 24).
    val chunks = graft.text.Bpe.chunk(
      picked.select("doc_id").join(docs, Seq("doc_id")), "text", "doc_id", merges,
      maxTokens = 32, overlap = 8)
    val perDoc = chunks.groupBy("doc_id")
      .agg(max("chunk_idx").as("last"), sum("n_tokens").as("window_tokens"))
      .join(withTokens.select(col("doc_id"), col("n_tokens")), Seq("doc_id"))
      .collect()
    perDoc.length.toLong shouldBe picked.count()
    perDoc.foreach { r =>
      val (last, winToks, n) = (r.getLong(1), r.getLong(2), r.getLong(3))
      // window coverage: last chunk's start + its length reaches n
      val stride = 24L
      (last * stride) should be < n
      // windows cover every token at least once: sum of window sizes ≥ n
      winToks should be >= n
    }

    // Determinism end-to-end: the whole pipeline reruns identically.
    val merges2 = graft.text.Bpe.learnMerges(docs, "text", numMerges = 10)
    merges2 shouldBe merges
    val picked2 = graft.sampling.BudgetSelect.budgetSelect(
      withTokens, "doc_id", "source", "doc_id", "n_tokens",
      budgets, defaultBudget = 0L)
    picked2.select("doc_id").collect().map(_.getLong(0)).sorted shouldBe
      picked.select("doc_id").collect().map(_.getLong(0)).sorted
  }
}
