package graft.profiler

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Exact interpolated percentiles without a single-task merge.
  *
  * Spark's built-in exact `percentile` is a TypedImperativeAggregate
  * whose final merge materializes a value→count map of EVERY distinct
  * value on one task — the scale ceiling for near-unique columns
  * (~60M entries for one column of a 100×-scaled lineitem). This
  * computes the same interpolated percentiles (rank (n-1)·p, linear
  * interpolation — identical to SQL `percentile_cont`) from a fully
  * distributed plan:
  *
  *   1. hash-aggregate (value, count) — distributed, map-side combine;
  *   2. range-partitioned sort by value — distributed;
  *   3. per-partition count totals (collect: one long per partition);
  *   4. targeted scan emitting only the ≤ 2·|percentiles| values whose
  *      global rank range covers a requested rank.
  *
  * Driver state: one long per partition plus one double per requested
  * rank — independent of distinct-value count. The only `mapPartitions`
  * use in the engine, and exactly the sanctioned case: genuinely
  * per-partition imperative logic (global rank assignment over a
  * range-partitioned sort).
  */
object DistributedPercentiles {

  /** Exact percentiles of `column` (nulls ignored, cast to double) at
    * the given fractions. Returns None per fraction when the column
    * has no non-null values. */
  def of(df: DataFrame, column: String, ps: Seq[Double]): Seq[Option[Double]] = {
    require(ps.forall(p => p >= 0.0 && p <= 1.0), s"fractions out of [0,1]: $ps")
    val spark = df.sparkSession
    import spark.implicits._

    // Backtick-quote like every ProfilePasses pass: a legal parquet
    // column name may contain dots.
    val counts = df
      .filter(col(s"`$column`").isNotNull)
      .select(col(s"`$column`").cast("double").as("v"))
      .groupBy("v").agg(count(lit(1)).as("c"))
      .orderBy("v")
      .as[(Double, Long)]
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // Pass 1: per-partition totals (tiny: one row per partition).
      val perPart = counts.rdd
        .mapPartitionsWithIndex { case (i, it) =>
          var s = 0L; it.foreach(s += _._2); Iterator((i, s))
        }
        .collect().sortBy(_._1).map(_._2)
      val n = perPart.sum
      if (n == 0) return ps.map(_ => None)

      val offsets = perPart.scanLeft(0L)(_ + _) // global rank offset per partition
      // Fractional target ranks and the integer ranks needed for
      // interpolation.
      val targets = ps.map(p => (n - 1) * p)
      val needed = targets.flatMap(t => Seq(math.floor(t).toLong, math.ceil(t).toLong)).toSet
      val neededB = spark.sparkContext.broadcast(needed)

      // Pass 2: each partition walks its (value, count) runs with its
      // global offset and emits only values covering a needed rank.
      val rankValues: Map[Long, Double] = counts.rdd
        .mapPartitionsWithIndex { case (i, it) =>
          var cum = offsets(i)
          val want = neededB.value
          it.flatMap { case (v, c) =>
            val lo = cum
            cum += c
            want.iterator.filter(r => r >= lo && r < lo + c).map(r => (r, v))
          }
        }
        .collect().toMap

      targets.map { t =>
        val f = math.floor(t).toLong
        val c = math.ceil(t).toLong
        val vf = rankValues(f)
        if (c == f) Some(vf)
        else Some(vf + (t - f) * (rankValues(c) - vf))
      }
    } finally { counts.unpersist(blocking = false); () }
  }

  /** Quartiles for several columns. Each column is its own distributed
    * pipeline (sharing the input scan via the caller's persist); the
    * pipelines are submitted concurrently from a small thread pool so
    * Spark's scheduler interleaves their jobs instead of serializing
    * the per-job driver latency. */
  def quartiles(df: DataFrame, columns: Seq[String]): Map[String, Seq[Option[Double]]] =
    if (columns.sizeIs <= 1) columns.map(c => c -> of(df, c, Seq(0.25, 0.5, 0.75))).toMap
    else {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(math.min(columns.size, 4))
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try {
        val fs = columns.map(c => Future(c -> of(df, c, Seq(0.25, 0.5, 0.75))))
        Await.result(Future.sequence(fs), Duration.Inf).toMap
      } finally pool.shutdown()
    }
}
