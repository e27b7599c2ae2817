package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: the storage-level answer to repeated
  * same-key joins and aggregations at cluster scale.
  *
  * A join between two tables bucketed into the same number of buckets
  * on the join key plans WITHOUT an Exchange on either side — the scan
  * itself reports hash partitioning over the bucket column, so a
  * 100 TB fact–fact join (orders ⨝ lineitem on orderkey, repeated
  * every profiling run) shuffles nothing, ever. That co-location is
  * free at write time: `bucketBy` hashes rows into a fixed bucket
  * count as they land. Broadcast handles the small-dimension case;
  * bucketing is for the joins where BOTH sides are big and the key is
  * stable across runs.
  *
  * Bucketed tables live in the session catalog (Spark's bucketing
  * metadata is catalog-only — a bare `spark.read.parquet` of the same
  * files would not know the layout), so readers go through
  * `spark.table`. Sort-by within buckets additionally removes the
  * sort from sort-merge joins.
  */
object Bucketing {

  /** Write `df` as a bucketed (and optionally in-bucket-sorted)
    * parquet table registered as `table` in the session catalog. */
  def write(
      df: DataFrame, path: String, table: String,
      bucketCols: Seq[String], buckets: Int,
      sortCols: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(bucketCols.nonEmpty, "bucketBy needs at least one column")
    val w = df.write.mode(mode)
      .option("path", path)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    val sorted = if (sortCols.isEmpty) w else w.sortBy(sortCols.head, sortCols.tail: _*)
    sorted.format("parquet").saveAsTable(table)
  }

  /** Load a bucketed table through the catalog (bucketing metadata is
    * catalog-only; reading the files directly loses the layout). */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
