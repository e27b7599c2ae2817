package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.similarity.Similarity

/** Unit tests for cosine top-k search: exact baseline semantics and
  * LSH recall on clustered vectors. */
class SimilaritySpec extends AnyFunSuite with Matchers with SparkTestBase {

  private def vecs(rows: (Long, Seq[Double])*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("vec_id", "embedding")
  }

  test("cosine: identical → 1, orthogonal → 0, opposite → -1") {
    val df = vecs(
      (1L, Seq(1.0, 0.0)), (2L, Seq(1.0, 0.0)),
      (3L, Seq(0.0, 1.0)), (4L, Seq(-1.0, 0.0)))
    val a = df.filter(col("vec_id") === 1).select(col("embedding").as("a"))
    val sims = a.crossJoin(df)
      .select(col("vec_id"), Similarity.cosine(col("a"), col("embedding")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    sims(2L) shouldBe 1.0 +- 1e-12
    sims(3L) shouldBe 0.0 +- 1e-12
    sims(4L) shouldBe -1.0 +- 1e-12
  }

  test("bruteForceTopK: known ordering, self excluded, ranks 1..k") {
    val df = vecs(
      (1L, Seq(1.0, 0.0)),
      (2L, Seq(0.9, 0.1)),   // closest to 1
      (3L, Seq(0.5, 0.5)),
      (4L, Seq(0.0, 1.0)),   // farthest from 1
      (5L, Seq(-1.0, 0.2)))
    val q = df.filter(col("vec_id") === 1)
    val out = Similarity.bruteForceTopK(df, "vec_id", "embedding", q, "vec_id", "embedding", k = 3)
      .orderBy("rank").collect()
    out.map(_.getAs[Long]("neighbor_id")) shouldBe Array(2L, 3L, 4L)
    out.map(_.getAs[Long]("rank")) shouldBe Array(1L, 2L, 3L)
    out.head.getAs[Double]("sim") should be > 0.99
  }

  test("bruteForceTopK tiebreak: equal sims order by neighbor id") {
    val df = vecs(
      (1L, Seq(1.0, 0.0)),
      (7L, Seq(2.0, 0.0)), (3L, Seq(3.0, 0.0)), // both sim 1.0 with q
      (9L, Seq(0.0, 1.0)))
    val q = df.filter(col("vec_id") === 1)
    val out = Similarity.bruteForceTopK(df, "vec_id", "embedding", q, "vec_id", "embedding", k = 2)
      .orderBy("rank").collect()
    out.map(_.getAs[Long]("neighbor_id")) shouldBe Array(3L, 7L)
  }

  /** 40 vectors in 4 tight clusters in R^16, deterministic. */
  private def clustered() = {
    val rnd = new scala.util.Random(7)
    val centers = Seq.fill(4)(Seq.fill(16)(rnd.nextGaussian()))
    val rows = for (i <- 0 until 40) yield {
      val c = centers(i % 4)
      (i.toLong, c.map(_ + rnd.nextGaussian() * 0.05))
    }
    vecs(rows: _*)
  }

  test("annTopK recalls most true neighbors on clustered vectors") {
    val df = clustered()
    val q = df.filter(col("vec_id") < 4)
    val exact = Similarity.bruteForceTopK(df, "vec_id", "embedding", q, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val approx = Similarity.annTopK(df, "vec_id", "embedding", q, "vec_id", "embedding",
      dim = 16, k = 5, nPlanes = 6, multiprobe = 1)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    recall should be >= 0.8
  }

  test("annTopK with enough probes matches exact ranks on clustered data") {
    val df = clustered()
    val q = df.filter(col("vec_id") === 0)
    // In-cluster neighbors agree on nearly every sign bit, so the
    // query's own bucket plus 1-bit probes cover the whole cluster.
    val approx = Similarity.annTopK(df, "vec_id", "embedding", q, "vec_id", "embedding",
      dim = 16, k = 3, nPlanes = 4, multiprobe = 1)
      .orderBy("rank").collect().map(_.getAs[Long]("neighbor_id"))
    val exact = Similarity.bruteForceTopK(df, "vec_id", "embedding", q, "vec_id", "embedding", k = 3)
      .orderBy("rank").collect().map(_.getAs[Long]("neighbor_id"))
    approx shouldBe exact
  }

  test("kmeans centroids land on the 4 planted clusters") {
    val df = clustered()
    val cents = Similarity.kmeansCentroids(df, "embedding", k = 4, iterations = 5)
    cents should have size 4
    // Every vector should be very close (cosine > 0.99) to some centroid.
    import org.apache.spark.sql.functions.greatest
    val sims = cents.map(ct => Similarity.cosine(col("embedding"),
      array(ct.map(org.apache.spark.sql.functions.lit): _*)))
    val worst = df.select(greatest(sims: _*).as("best"))
      .agg(org.apache.spark.sql.functions.min("best")).head().getDouble(0)
    worst should be > 0.99
  }

  test("ivfTopK recalls the true neighbors on clustered vectors") {
    val df = clustered()
    val q = df.filter(col("vec_id") < 4)
    val exact = Similarity.bruteForceTopK(df, "vec_id", "embedding", q, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ivf = Similarity.ivfTopK(df, "vec_id", "embedding", q, "vec_id", "embedding",
      k = 5, nCells = 4, nProbe = 2, kmeansIterations = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    recall should be >= 0.9
  }

  test("pqTopK top-k lands in the query's planted cluster") {
    val df = clustered()
    val q = df.filter(col("vec_id") < 4)
    // 4 subspaces × 4-dim, 8 codes each: the hash-ordered init can
    // drop two seeds into one planted cluster, and unlike IVF — which
    // rescores candidates exactly — PQ's accuracy IS its codebook
    // coverage, so give it seed slack (8 codes for 4 sub-centers).
    //
    // The assertion is CLUSTER-level recall, not exact-neighbor
    // recall: members of one tight cluster quantize to the SAME code
    // word, so their ADC scores tie and intra-cluster ranking is
    // unrecoverable from codes alone — the inherent PQ resolution
    // limit (ties then break by neighbor id). What PQ does guarantee
    // is that the top-k comes from the right cluster.
    val pq = Similarity.pqTopK(df, "vec_id", "embedding", q, "vec_id", "embedding",
      dim = 16, k = 5, numSubspaces = 4, codebookSize = 8, kmeansIterations = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
    pq should have length 20
    val inCluster = pq.count { case (qid, nid) => nid % 4 == qid % 4 }
    inCluster.toDouble / pq.length should be >= 0.9
  }

  test("randomProjection preserves cluster geometry (JL) and is deterministic") {
    val df = clustered()
    val proj = Similarity.randomProjection(df, "embedding", dim = 16, outDim = 8)
    val rows = proj.select("vec_id", "projected").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Double](1)).toMap
    rows(0L) should have size 8
    // Same seed → same projection (replayable by literal matrix).
    val again = Similarity.randomProjection(df, "embedding", dim = 16, outDim = 8)
      .select("vec_id", "projected").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Double](1)).toMap
    again(0L) shouldBe rows(0L)
    // JL contract at this fixture's scale: after 16 → 8 projection,
    // in-cluster pairs still out-rank cross-cluster pairs on cosine.
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val inCluster = for (i <- 0L until 4L) yield cos(rows(i), rows(i + 4))
    val cross = for (i <- 0L until 4L; j <- 0L until 4L if i != j) yield cos(rows(i), rows(j))
    inCluster.min should be > cross.max
  }

  test("ivfPqTopK composes cell pruning with code pricing") {
    val df = clustered()
    val q = df.filter(col("vec_id") < 4)
    // Same cluster-level contract as pqTopK (codes flatten
    // intra-cluster ranking), plus the IVF scope: nProbe=2 of 4 cells
    // must still cover the query's own cluster.
    val out = Similarity.ivfPqTopK(df, "vec_id", "embedding", q, "vec_id", "embedding",
      dim = 16, k = 5, nCells = 4, nProbe = 2, numSubspaces = 4,
      codebookSize = 8, kmeansIterations = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
    out should have length 20
    val inCluster = out.count { case (qid, nid) => nid % 4 == qid % 4 }
    inCluster.toDouble / out.length should be >= 0.9
  }

  test("pqTopK approximates the true inner product through the codes") {
    val df = clustered()
    val q = df.filter(col("vec_id") === 0)
    val pq = Similarity.pqTopK(df, "vec_id", "embedding", q, "vec_id", "embedding",
      dim = 16, k = 3, numSubspaces = 4, codebookSize = 8, kmeansIterations = 5)
      .orderBy("rank").collect()
    // ADC score ≈ ⟨q, x⟩: with tight clusters the reconstruction error
    // is small, so the score should sit within 10% of the exact dot of
    // the top neighbor (both vectors near their shared centroid).
    val top = pq.head
    val vecsById = df.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Double](1)).toMap
    val exactDot = vecsById(0L).zip(vecsById(top.getAs[Long]("neighbor_id")))
      .map { case (a, b) => a * b }.sum
    top.getAs[Double]("sim") shouldBe exactDot +- math.abs(exactDot) * 0.1
  }

  test("pqTopK sampled codebook training keeps cluster-level recall") {
    val df = clustered()
    val q = df.filter(col("vec_id") < 4)
    // Codebooks train on the deterministic hash-half of the corpus;
    // every vector is still encoded and scored. Centroids are
    // statistics, so a 50% sample of tight clusters yields codebooks
    // equivalent to full-corpus training — the same cluster-level
    // recall contract as the full-corpus pqTopK test.
    val pq = Similarity.pqTopK(df, "vec_id", "embedding", q, "vec_id", "embedding",
      dim = 16, k = 5, numSubspaces = 4, codebookSize = 8, kmeansIterations = 5,
      trainFraction = 0.5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
    pq should have length 20
    val inCluster = pq.count { case (qid, nid) => nid % 4 == qid % 4 }
    inCluster.toDouble / pq.length should be >= 0.9
  }

  test("ivfPqTopK sampled training keeps cluster-level recall; bad fraction rejected") {
    val df = clustered()
    val q = df.filter(col("vec_id") < 4)
    val out = Similarity.ivfPqTopK(df, "vec_id", "embedding", q, "vec_id", "embedding",
      dim = 16, k = 5, nCells = 4, nProbe = 2, numSubspaces = 4,
      codebookSize = 8, kmeansIterations = 5, trainFraction = 0.5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
    out should have length 20
    val inCluster = out.count { case (qid, nid) => nid % 4 == qid % 4 }
    inCluster.toDouble / out.length should be >= 0.9
    an[IllegalArgumentException] should be thrownBy
      Similarity.pqTopK(df, "vec_id", "embedding", q, "vec_id", "embedding",
        dim = 16, trainFraction = 0.0)
  }

  test("kmeansCentroidsL2 rejects vectors shorter than the centroid dim") {
    // Zero-padding a short vector would silently land the L2 bias
    // element on a centroid coefficient — the guard must fail loudly.
    val df = vecs(
      (1L, Seq(1.0, 0.0, 0.0, 0.0)), (2L, Seq(0.0, 1.0, 0.0, 0.0)),
      (3L, Seq(1.0, 1.0)))
    val ex = intercept[Exception] {
      Similarity.kmeansCentroidsL2(df, "embedding", k = 2, iterations = 1)
    }
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    msgs should include("nearestCellsL2")
  }

  test("Ann.topK facade dispatches every strategy with one output contract") {
    import graft.similarity.Ann
    import graft.similarity.Ann.AnnStrategy
    val df = clustered()
    val q = df.filter(col("vec_id") < 4)
    def run(s: AnnStrategy) =
      Ann.topK(df, "vec_id", "embedding", q, "vec_id", "embedding",
        dim = 16, k = 5, strategy = s)
    // Every strategy: same schema, k rows per query, ranks 1..k.
    val strategies = Seq[AnnStrategy](
      AnnStrategy.BruteForce, AnnStrategy.Lsh(nPlanes = 6),
      AnnStrategy.Ivf(nCells = 4, nProbe = 2, kmeansIterations = 5),
      AnnStrategy.Pq(kmeansIterations = 5),
      AnnStrategy.IvfPq(nCells = 4, nProbe = 2, kmeansIterations = 5))
    strategies.foreach { s =>
      val out = run(s)
      out.columns shouldBe Array("query_id", "rank", "neighbor_id", "sim")
      val rows = out.collect()
      rows should have length 20
      rows.map(_.getAs[Long]("rank")).toSet shouldBe Set(1L, 2L, 3L, 4L, 5L)
    }
    // Facade results equal the direct call (BruteForce ≡ bruteForceTopK).
    val facade = run(AnnStrategy.BruteForce).orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val direct = Similarity.bruteForceTopK(df, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 5).orderBy("query_id", "rank")
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"), r.getAs[Long]("neighbor_id")))
    facade shouldBe direct
    // Auto: 40 rows → exact; the ladder escalates with corpus size and
    // caps the training fraction.
    Ann.resolveAuto(df, AnnStrategy.Auto()) shouldBe AnnStrategy.BruteForce
    val ivf = Ann.resolveAuto(df, AnnStrategy.Auto(bruteForceMax = 10, maxTrainRows = 20))
    ivf shouldBe a[AnnStrategy.Ivf]
    ivf.asInstanceOf[AnnStrategy.Ivf].trainFraction shouldBe 0.5 +- 1e-12
    Ann.resolveAuto(df, AnnStrategy.Auto(bruteForceMax = 10, ivfMax = 20)) shouldBe
      a[AnnStrategy.IvfPq]
    // And Auto end-to-end matches brute force at this scale.
    run(AnnStrategy.Auto()).orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) shouldBe direct
  }

  test("pqTopK degrades gracefully on tiny and empty corpora, rejects bad dims") {
    val tiny = vecs((1L, Seq.fill(4)(1.0)), (2L, Seq.fill(4)(0.5)))
    val q = tiny.filter(col("vec_id") === 1L)
    // Fewer vectors than codebookSize: kmeans clamps the codebook.
    val r = Similarity.pqTopK(tiny, "vec_id", "embedding", q, "vec_id", "embedding",
      dim = 4, k = 5, numSubspaces = 2, codebookSize = 8, kmeansIterations = 1).collect()
    r.map(_.getAs[Long]("neighbor_id")).toSet shouldBe Set(2L)
    // Empty corpus: empty result with the right schema, no exception.
    val noRows = tiny.filter(col("vec_id") > 100L)
    val r2 = Similarity.pqTopK(noRows, "vec_id", "embedding", q, "vec_id", "embedding",
      dim = 4, k = 5, numSubspaces = 2, codebookSize = 8, kmeansIterations = 1)
    r2.columns.toSeq shouldBe Seq("query_id", "rank", "neighbor_id", "sim")
    r2.collect() should have length 0
    // dim must divide into subspaces.
    an[IllegalArgumentException] should be thrownBy
      Similarity.pqTopK(tiny, "vec_id", "embedding", q, "vec_id", "embedding",
        dim = 4, k = 5, numSubspaces = 3, codebookSize = 2)
  }

  test("ivfTopK degrades gracefully on tiny and empty corpora") {
    val tiny = vecs((1L, Seq.fill(4)(1.0)), (2L, Seq.fill(4)(0.5)))
    val q = tiny.filter(col("vec_id") === 1L)
    // Fewer vectors than nCells/nProbe: centroid count clamps the probes.
    val r = Similarity.ivfTopK(tiny, "vec_id", "embedding", q, "vec_id", "embedding",
      k = 5, nCells = 8, nProbe = 4, kmeansIterations = 1).collect()
    r.map(_.getAs[Long]("neighbor_id")).toSet shouldBe Set(2L)
    // Empty corpus: empty result with the right schema, no exception.
    val empty = tiny.filter(col("vec_id") > 100L)
    val r2 = Similarity.ivfTopK(empty, "vec_id", "embedding", q, "vec_id", "embedding",
      k = 5, nCells = 8, nProbe = 4, kmeansIterations = 1)
    r2.columns.toSeq shouldBe Seq("query_id", "rank", "neighbor_id", "sim")
    r2.collect() should have length 0
  }

  test("nearDupByEmbedding occupancy cap prunes a degenerate hot bucket; the audit names it") {
    // 300 copies of one direction land in a single sign bucket — the
    // uncapped join meets them as C(300,2) pairs at cosine 1.0.
    val rnd = new scala.util.Random(3)
    val v = Seq.fill(8)(rnd.nextGaussian())
    val hot = (1L to 300L).map(i => (i, v.map(_ * (1.0 + i * 1e-9))))
    val w = Seq.fill(8)(rnd.nextGaussian())
    val df = vecs((hot :+ (401L, w) :+ (402L, w.map(_ * 1.001))): _*)

    Similarity.nearDupByEmbedding(df, "vec_id", "embedding", dim = 8,
        threshold = 0.99, maxBucketOccupancy = 0)
      .count() should be >= 300L * 299 / 2

    // Capped: the hot cluster is pruned before pairing; the planted
    // pair outside it still surfaces (unless it shares the hot bucket).
    val capped = Similarity.nearDupByEmbedding(df, "vec_id", "embedding", dim = 8,
        threshold = 0.99, maxBucketOccupancy = 50)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    capped.filter { case (a, b) => a <= 300 || b <= 300 } shouldBe empty

    val audit = Similarity.cappedBuckets(df, "vec_id", "embedding", dim = 8,
      maxBucketOccupancy = 50).collect()
    audit.map(_.getAs[Long]("occupancy")).max should be >= 300L
    // A cap above the cluster empties the audit.
    Similarity.cappedBuckets(df, "vec_id", "embedding", dim = 8,
      maxBucketOccupancy = 400).count() shouldBe 0L
  }

  test("nearDupByEmbedding finds planted near-identical vectors only") {
    val rnd = new scala.util.Random(11)
    val v = Seq.fill(16)(rnd.nextGaussian())
    val dup = v.map(_ * 1.001) // same direction → cosine ≈ 1
    val rows = (0 until 20).map(i => (i.toLong, Seq.fill(16)(rnd.nextGaussian()))) :+
      (100L, v) :+ (101L, dup)
    val df = vecs(rows: _*)
    val pairs = Similarity.nearDupByEmbedding(df, "vec_id", "embedding", dim = 16, threshold = 0.99)
      .collect()
    pairs.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))) shouldBe Array((100L, 101L))
    pairs.head.getAs[Double]("cosine_sim") shouldBe 1.0 +- 1e-9
  }

  test("semanticNearDupPairs finds planted near-identical vectors; matches brute force within cells") {
    val rnd = new scala.util.Random(11)
    val v = Seq.fill(16)(rnd.nextGaussian())
    val rows = (0 until 20).map(i => (i.toLong, Seq.fill(16)(rnd.nextGaussian()))) :+
      (100L, v) :+ (101L, v.map(_ * 1.001))
    val df = vecs(rows: _*)
    val pairs = Similarity.semanticNearDupPairs(df, "vec_id", "embedding",
      nCells = 4, threshold = 0.99, kmeansIterations = 3)
      .collect()
    pairs.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))) shouldBe Array((100L, 101L))
    pairs.head.getAs[Double]("cosine_sim") shouldBe 1.0 +- 1e-9

    // The cluster scope loses nothing the cells keep together: every
    // brute-force pair above threshold whose endpoints share a cell is
    // emitted (the planted pair must share one — cosine ≈ 1 means the
    // same argmax centroid, away from ties).
    val cells = Similarity.kmeansCells(df, "vec_id", "embedding", nCells = 4)
      .select(col("id"), col("bucket")).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Int]("bucket")).toMap
    cells(100L) shouldBe cells(101L)
  }

  test("semanticNearDupPairs occupancy cap prunes a degenerate hot cell; the audit names it") {
    // 300 copies of one direction form one dense k-means cell — the
    // uncapped within-cell join meets them as C(300,2) pairs.
    val rnd = new scala.util.Random(3)
    val v = Seq.fill(8)(rnd.nextGaussian())
    val hot = (1L to 300L).map(i => (i, v.map(_ * (1.0 + i * 1e-9))))
    val spread = (401L to 420L).map(i => (i, Seq.fill(8)(rnd.nextGaussian())))
    val df = vecs((hot ++ spread): _*)

    Similarity.semanticNearDupPairs(df, "vec_id", "embedding", nCells = 4,
        threshold = 0.99, kmeansIterations = 2, maxCellOccupancy = 0)
      .count() should be >= 300L * 299 / 2

    val capped = Similarity.semanticNearDupPairs(df, "vec_id", "embedding", nCells = 4,
        threshold = 0.99, kmeansIterations = 2, maxCellOccupancy = 50)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    capped.filter { case (a, b) => a <= 300 || b <= 300 } shouldBe empty

    val audit = Similarity.cappedCells(df, "vec_id", "embedding", nCells = 4,
      kmeansIterations = 2, maxCellOccupancy = 50).collect()
    audit.map(_.getAs[Long]("occupancy")).max should be >= 300L
    Similarity.cappedCells(df, "vec_id", "embedding", nCells = 4,
      kmeansIterations = 2, maxCellOccupancy = 400).count() shouldBe 0L
  }

  test("nearDupByEmbeddingAgainst: planted match found, combined cap prunes a flood, audit splits sides") {
    val rnd = new scala.util.Random(5)
    val v = Seq.fill(8)(rnd.nextGaussian())
    val q = Seq.fill(8)(rnd.nextGaussian())
    // Existing corpus: a 200-copy template cluster of v, plus q.
    val existing = vecs(((1L to 200L).map(i => (i, v.map(_ * (1.0 + i * 1e-9)))) :+
      (900L, q)): _*)
    // Incoming batch: a near-copy of q (the planted match), a novel
    // vector, and a 50-copy flood of the template.
    val novel = Seq.fill(8)(rnd.nextGaussian())
    val incoming = vecs(((10001L, q.map(_ * 1.001)) +: (10002L, novel) +:
      (10101L to 10150L).map(i => (i, v.map(_ * (1.0 + i * 1e-9))))): _*)

    // Uncapped: the flood meets the template cluster as 50×200 rows.
    Similarity.nearDupByEmbeddingAgainst(incoming, "vec_id", "embedding",
        existing, "vec_id", "embedding", dim = 8, threshold = 0.99,
        maxBucketOccupancy = 0)
      .count() should be >= 50L * 200

    // Capped at 100: the combined 250-vector bucket is pruned; the
    // planted q-match still surfaces (unless q shares the hot bucket).
    val capped = Similarity.nearDupByEmbeddingAgainst(incoming, "vec_id", "embedding",
        existing, "vec_id", "embedding", dim = 8, threshold = 0.99,
        maxBucketOccupancy = 100)
      .collect().map(r => (r.getAs[Long]("incoming_id"), r.getAs[Long]("existing_id")))
    capped.filter { case (a, b) => a >= 10101L || b <= 200L } shouldBe empty
    capped should contain((10001L, 900L))

    // The audit names the hot bucket and splits its sides.
    val audit = Similarity.cappedBucketsAgainst(incoming, "vec_id", "embedding",
      existing, "vec_id", "embedding", dim = 8, maxBucketOccupancy = 100).collect()
    val hot = audit.maxBy(_.getAs[Long]("occupancy"))
    hot.getAs[Long]("occupancy") should be >= 250L
    hot.getAs[Long]("incoming_occupancy") should be >= 50L
    hot.getAs[Long]("existing_occupancy") should be >= 200L
    // A cap above the flood empties the audit.
    Similarity.cappedBucketsAgainst(incoming, "vec_id", "embedding",
      existing, "vec_id", "embedding", dim = 8, maxBucketOccupancy = 400)
      .count() shouldBe 0L
  }

  test("kmeansCells degrades gracefully on an empty corpus") {
    val empty = vecs((1L, Seq.fill(4)(1.0))).filter(col("vec_id") > 100L)
    val cells = Similarity.kmeansCells(empty, "vec_id", "embedding", nCells = 4)
    cells.columns.toSeq shouldBe Seq("id", "v", "bucket")
    cells.count() shouldBe 0L
    Similarity.semanticNearDupPairs(empty, "vec_id", "embedding", nCells = 4)
      .count() shouldBe 0L
  }

  test("quantizeInt8: round-trip error bounded by scale/2; zero vector safe") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 20L).map(i => (i, Seq.fill(16)(rnd.nextGaussian()))) :+
      (99L, Seq.fill(16)(0.0))
    val df = vecs(rows: _*)
    val q = Similarity.quantizeInt8(df, "vec_id", "embedding")
    q.columns.toSeq shouldBe Seq("id", "qvec", "scale")
    val deq = q.select(col("id"), col("scale"),
        Similarity.dequantize(col("qvec"), col("scale")).as("dv"))
      .join(df.select(col("vec_id").as("id"), col("embedding")), "id")
      .collect()
    deq.length shouldBe 21
    deq.foreach { r =>
      val scale = r.getAs[Double]("scale")
      val dv = r.getSeq[Double](r.fieldIndex("dv"))
      val orig = r.getSeq[Double](r.fieldIndex("embedding"))
      dv.zip(orig).foreach { case (d, o) =>
        math.abs(d - o) should be <= scale / 2 + 1e-12
      }
    }
    // Zero vector: scale 1.0, all-zero qvec.
    val z = q.filter(col("id") === 99L).head()
    z.getAs[Double]("scale") shouldBe 1.0
    all(z.getSeq[Byte](1)) shouldBe 0.toByte
    // Max-magnitude element hits exactly ±127.
    q.select(max(aggregate(col("qvec"), lit(0),
      (acc, x) => greatest(acc, abs(x.cast("int")))))).head().getInt(0) shouldBe 127
  }

  test("quantized cosine ranks like exact cosine (scales cancel)") {
    val rnd = new scala.util.Random(3)
    val df = vecs((0L until 50L).map(i => (i, Seq.fill(32)(rnd.nextGaussian()))): _*)
    val q = Similarity.quantizeInt8(df, "vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(df, "vec_id", "embedding",
      df.filter(col("vec_id") < 3), "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val qdf = q.select(col("id").as("vec_id"), col("qvec").as("embedding"))
    val approx = Similarity.bruteForceTopK(qdf, "vec_id", "embedding",
      qdf.filter(col("vec_id") < 3), "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    // int8 on 32-dim Gaussians: the top-5 sets agree almost entirely;
    // require ≥ 12 of 15 to keep the pin robust to rounding at the
    // rank boundary.
    (exact intersect approx).size should be >= 12
  }

  test("clusterQuality: tight clusters cohere; co-located labels flag high separation overlap") {
    val s = spark
    import s.implicits._
    // Label A along +x, label B along +y (orthogonal, tight); label C
    // sits ON TOP of A — its centroid should be near-identical to A's.
    def jitter(base: Seq[Double], i: Int): Seq[Double] =
      base.zipWithIndex.map { case (v, d) => v + (if (d == (i % 4)) 0.01 else 0.0) }
    val rows =
      (1 to 8).map(i => ("A", jitter(Seq(1.0, 0.0, 0.0, 0.0), i))) ++
      (1 to 8).map(i => ("B", jitter(Seq(0.0, 1.0, 0.0, 0.0), i))) ++
      (1 to 8).map(i => ("C", jitter(Seq(1.0, 0.0, 0.0, 0.0), i + 1)))
    val df = rows.toDF("label", "vec")
    val out = Similarity.clusterQuality(df, "vec", "label")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    out("A")._1 shouldBe 8L
    all(out.values.map(_._2)) should be > 0.99 // every cluster is tight
    out("A")._3 should be > 0.99 // A and C are indistinguishable...
    out("C")._3 should be > 0.99
    out("B")._3 should be < 0.1  // ...while B is orthogonal to both
  }

  test("meanPool averages per position, normalizes on request, rejects ragged keys") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      ("d1", Seq(1.0, 2.0, 3.0)),
      ("d1", Seq(3.0, 4.0, 5.0)),
      ("d2", Seq(0.0, 0.0, 2.0))
    ).toDF("doc", "vec")
    val out = Similarity.meanPool(df, "doc", "vec")
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).toList).toMap
    out("d1") shouldBe List(2.0, 3.0, 4.0)
    out("d2") shouldBe List(0.0, 0.0, 2.0)
    val norm = Similarity.meanPool(df, "doc", "vec", normalize = true)
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).toList).toMap
    math.sqrt(norm("d1").map(x => x * x).sum) shouldBe (1.0 +- 1e-12)
    norm("d2") shouldBe List(0.0, 0.0, 1.0)
    // A key pooling unequal-length vectors fails loudly, not raggedly.
    val ragged = Seq(("d1", Seq(1.0, 2.0)), ("d1", Seq(1.0, 2.0, 3.0))).toDF("doc", "vec")
    val e = intercept[Exception] {
      Similarity.meanPool(ragged, "doc", "vec").collect()
    }
    e.getMessage should include("unequal length")
    // Null vectors are excluded, not pooled as zeros.
    val withNull = Seq(("d1", Some(Seq(2.0, 4.0))), ("d1", None)).toDF("doc", "vec")
    Similarity.meanPool(withNull, "doc", "vec")
      .collect().head.getSeq[Double](1).toList shouldBe List(2.0, 4.0)
  }

  test("clusterTopTerms: each semantic cluster is described by its own vocabulary") {
    val s = spark
    import s.implicits._
    // two well-separated embedding cones with distinct vocabularies
    val emb = ((0L to 4L).map(i => (i, Seq(1.0, 0.0, 0.01 * i))) ++
      (5L to 9L).map(i => (i, Seq(0.0, 1.0, 0.01 * i)))).toDF("vec_id", "embedding")
    val docs = ((0L to 4L).map(i => (i, "spark shuffle partition agg")) ++
      (5L to 9L).map(i => (i, "tokenizer corpus merge vocab"))).toDF("doc_id", "text")
    val out = Similarity.clusterTopTerms(emb, "vec_id", "embedding",
        docs, "doc_id", "text", nCells = 2, kmeansIterations = 2, k = 2,
        centroidInitOrder = Some(Seq(col("vec_id"))))
      .collect().map(r => (r.getInt(0), r.getString(1))).groupBy(_._1)
    out.size shouldBe 2
    val vocabByCell = out.view.mapValues(_.map(_._2).toSet).toMap
    // the clusters' top terms are disjoint — each cone's vocabulary
    val Seq(a, b) = vocabByCell.values.toSeq
    a.intersect(b) shouldBe empty
    (a ++ b).subsetOf(
      Set("spark", "shuffle", "partition", "agg", "tokenizer", "corpus", "merge", "vocab")) shouldBe true
  }
}
