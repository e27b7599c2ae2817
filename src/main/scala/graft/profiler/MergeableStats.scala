package graft.profiler

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Mergeable numeric profiles: summarize table PARTITIONS independently,
  * then combine the summaries into exactly the profile a whole-table
  * scan would produce — without rescanning anything.
  *
  * This is the incremental-profiling shape a 100 TB deployment needs:
  * a daily pipeline profiles ONLY the new partition (one scan of the
  * day's data) and folds it into the corpus profile in milliseconds,
  * instead of re-profiling the historical corpus on every run. The
  * reference re-profiles the full table per run (reference:
  * sparvi/profiler/profile_engine.py:125-210); count/min/max merge
  * trivially, and mean/variance merge exactly via Chan's pairwise
  * update (Chan, Golub, LeVeque 1983) on (n, mean, M2) — the same
  * combine step Spark's own central-moment aggregates use between
  * partial and final aggregation, applied here one level up, across
  * separately-computed profiles.
  */
object MergeableStats {

  /** Per-column mergeable summary of ONE partition/split: melted rows
    * (column_name, n, mean, m2, mn, mx) over non-null values, where
    * `m2` is the sum of squared deviations from the mean (so
    * var_samp = m2/(n-1)). One wide aggregate — single scan, ordinary
    * partial+final hash agg — then a literal-array melt. */
  def numericSummary(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { n =>
      val v = col(s"`$n`").cast(DoubleType)
      Seq(count(v).as(s"${n}_n"),
        avg(v).as(s"${n}_mean"),
        (var_samp(v) * (count(v) - 1).cast(DoubleType)).as(s"${n}_m2"),
        min(v).as(s"${n}_mn"), max(v).as(s"${n}_mx"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map { n =>
        struct(lit(n).as("column_name"), col(s"${n}_n").as("n"),
          col(s"${n}_mean").as("mean"),
          // A single-value split has var_samp = null (n-1 = 0 divisor)
          // but its M2 is exactly 0; normalize so merges stay total.
          coalesce(col(s"${n}_m2"), when(col(s"${n}_n") > 0, 0.0)).as("m2"),
          col(s"${n}_mn").as("mn"), col(s"${n}_mx").as("mx"))
      }: _*)).as("e"))
      .select(col("e.*"))
  }

  /** Merge any number of [[numericSummary]] frames (unioned by the
    * caller) into whole-data statistics per column: (column_name,
    * n_rows, mean, stddev_samp, mn, mx).
    *
    * The merge itself is an `aggregate` higher-order fold over the
    * handful of per-split rows collected per column — Chan's exact
    * (n, mean, M2) combine — so adding a day's summary to a year's is
    * one tiny shuffle of #columns × #splits rows, never a data scan.
    * Empty splits (n=0) are identity elements; the fold is
    * order-insensitive up to float rounding, which the caller's
    * output rounding absorbs. */
  def merge(summaries: DataFrame): DataFrame = {
    val folded = summaries
      .groupBy("column_name")
      .agg(collect_list(struct(col("n"), col("mean"), col("m2"),
        col("mn"), col("mx"))).as("parts"))
      .withColumn("acc", aggregate(
        col("parts"),
        struct(lit(0L).as("n"), lit(0.0).as("mean"), lit(0.0).as("m2"),
          lit(null).cast(DoubleType).as("mn"), lit(null).cast(DoubleType).as("mx")),
        (acc, x) => {
          val n1 = acc.getField("n"); val n2 = x.getField("n")
          val n = n1 + n2
          val delta = x.getField("mean") - acc.getField("mean")
          val mean = when(n2 === 0, acc.getField("mean"))
            .when(n1 === 0, x.getField("mean"))
            .otherwise(acc.getField("mean") + delta * n2.cast(DoubleType) / n.cast(DoubleType))
          val m2 = when(n2 === 0, acc.getField("m2"))
            .when(n1 === 0, x.getField("m2"))
            .otherwise(acc.getField("m2") + x.getField("m2") +
              delta * delta * n1.cast(DoubleType) * n2.cast(DoubleType) / n.cast(DoubleType))
          struct(n.as("n"), mean.as("mean"), m2.as("m2"),
            least(acc.getField("mn"), x.getField("mn")).as("mn"),
            greatest(acc.getField("mx"), x.getField("mx")).as("mx"))
        }))
    folded.select(col("column_name"), col("acc.n").as("n_rows"),
      col("acc.mean").as("mean"),
      when(col("acc.n") > 1, sqrt(col("acc.m2") / (col("acc.n") - 1).cast(DoubleType)))
        .as("stddev_samp"),
      col("acc.mn").as("mn"), col("acc.mx").as("mx"))
  }
}
