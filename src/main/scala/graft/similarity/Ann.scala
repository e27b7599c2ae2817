package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}

/** One entry point over the five ANN top-k variants — the surface a
  * user actually calls. Each variant in [[Similarity]] answers the
  * same question (top-k neighbors of each query by similarity) with a
  * different recall/cost trade; this facade names those trades and
  * picks one automatically when asked.
  *
  * The strategy lattice, cheapest-to-serve first at a given corpus
  * size N (D = dim, Q = queries):
  *
  *   - [[AnnStrategy.BruteForce]] — exact cosine, recall 1.0. Cost
  *     O(N·Q·D) map-side (queries broadcast, no shuffle). The right
  *     answer until N·Q·D stops fitting the cluster's CPU budget.
  *   - [[AnnStrategy.Lsh]] — sign-bucket candidates, exact cosine on
  *     the ~N/2^planes bucket mates. No training pass; recall set by
  *     nPlanes/multiprobe. Right when queries are few and ad hoc.
  *   - [[AnnStrategy.Ivf]] — k-means cells prune WHICH vectors are
  *     scored (O(nProbe·N/nCells) per query, still exact cosine on
  *     candidates). One training pass; the first index-shaped choice.
  *   - [[AnnStrategy.Pq]] — codes shrink what scoring COSTS (D-dim
  *     dot → numSubspaces table lookups, approximate scores). Right
  *     when the corpus must be scanned but cannot be afforded raw.
  *   - [[AnnStrategy.IvfPq]] — both: the standard billion-vector
  *     layout (cells to prune + codes to price). The 100 TB default.
  *
  * [[AnnStrategy.Auto]] picks from one corpus-count scalar: exact
  * brute force while N·Q is small enough that exactness is free-ish,
  * IVF once pruning pays for its training pass, IVF-PQ (with sampled
  * codebook training) at index scale. The thresholds are deliberately
  * conservative — approximate only when exact would hurt.
  */
object Ann {

  sealed trait AnnStrategy
  object AnnStrategy {
    /** Decide from corpus size: ≤ `bruteForceMax` rows → BruteForce;
      * ≤ `ivfMax` → Ivf (√N cells); above → IvfPq with √N cells and
      * codebooks trained on ≤ `maxTrainRows` hash-sampled rows. */
    final case class Auto(
        bruteForceMax: Long = 100000L,
        ivfMax: Long = 2000000L,
        maxTrainRows: Long = 1000000L) extends AnnStrategy
    case object BruteForce extends AnnStrategy
    final case class Lsh(
        nPlanes: Int = 8, multiprobe: Int = 1, seed: Long = 42L) extends AnnStrategy
    final case class Ivf(
        nCells: Int = 16, nProbe: Int = 2,
        kmeansIterations: Int = 3,
        trainFraction: Double = 1.0) extends AnnStrategy
    final case class Pq(
        numSubspaces: Int = 4, codebookSize: Int = 8,
        kmeansIterations: Int = 1,
        trainFraction: Double = 1.0) extends AnnStrategy
    final case class IvfPq(
        nCells: Int = 16, nProbe: Int = 2,
        numSubspaces: Int = 4, codebookSize: Int = 8,
        kmeansIterations: Int = 1,
        trainFraction: Double = 1.0) extends AnnStrategy
  }
  import AnnStrategy._

  /** Top-k neighbors of each query row under the chosen strategy.
    * Output schema is identical across strategies — (query_id, rank,
    * neighbor_id, sim) with rank 1..k per query, ties to the lower
    * neighbor id — so swapping strategies never changes a consumer.
    * `sim` is exact cosine for BruteForce/Lsh/Ivf and the ADC
    * approximate inner product for Pq/IvfPq.
    *
    * `dim` is the embedding width (needed by the plane/subspace
    * strategies); `trainSeed`/`trainHashMode` parameterize the
    * deterministic codebook-training sample exactly as in
    * [[Similarity.pqTopK]]. Auto runs ONE `count()` over the corpus
    * to pick — at index scale that scan is noise next to training. */
  def topK(
      df: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      dim: Int, k: Int = 10,
      strategy: AnnStrategy = Auto(),
      excludeSelf: Boolean = true,
      centroidInitOrder: Option[Seq[Column]] = None,
      trainSeed: Long = 42L, trainHashMode: String = "xxhash64"): DataFrame =
    strategy match {
      case a: Auto =>
        topK(df, idCol, vecCol, queries, queryIdCol, queryVecCol, dim, k,
          resolveAuto(df, a), excludeSelf, centroidInitOrder, trainSeed, trainHashMode)
      case BruteForce =>
        Similarity.bruteForceTopK(df, idCol, vecCol,
          queries, queryIdCol, queryVecCol, k, excludeSelf)
      case s: Lsh =>
        Similarity.annTopK(df, idCol, vecCol, queries, queryIdCol, queryVecCol,
          dim, k, s.nPlanes, s.multiprobe, s.seed, excludeSelf)
      case s: Ivf =>
        Similarity.ivfTopK(df, idCol, vecCol, queries, queryIdCol, queryVecCol,
          k, s.nCells, s.nProbe, s.kmeansIterations, excludeSelf,
          centroidInitOrder, s.trainFraction, trainSeed, trainHashMode)
      case s: Pq =>
        Similarity.pqTopK(df, idCol, vecCol, queries, queryIdCol, queryVecCol,
          dim, k, s.numSubspaces, s.codebookSize, s.kmeansIterations,
          excludeSelf, centroidInitOrder, s.trainFraction, trainSeed, trainHashMode)
      case s: IvfPq =>
        Similarity.ivfPqTopK(df, idCol, vecCol, queries, queryIdCol, queryVecCol,
          dim, k, s.nCells, s.nProbe, s.numSubspaces, s.codebookSize,
          s.kmeansIterations, excludeSelf, centroidInitOrder,
          s.trainFraction, trainSeed, trainHashMode)
    }

  /** The Auto decision, exposed for inspection/tests: one count, then
    * the conservative ladder. Cell count ≈ √N (the classic IVF
    * balance point between cell-scan and probe-scan cost), probes
    * fixed at 2⁄√N-ish coverage, codebook training capped to
    * `maxTrainRows` via the deterministic hash sample. */
  def resolveAuto(df: DataFrame, a: Auto): AnnStrategy = {
    val n = df.count()
    if (n <= a.bruteForceMax) BruteForce
    else {
      val cells = math.max(16, math.min(65536, math.round(math.sqrt(n.toDouble)).toInt))
      val frac = math.min(1.0, a.maxTrainRows.toDouble / n)
      if (n <= a.ivfMax) Ivf(nCells = cells, nProbe = 4, trainFraction = frac)
      else IvfPq(nCells = cells, nProbe = 4, trainFraction = frac)
    }
  }
}
