package graft.streaming

import org.apache.spark.sql.SparkSession

/** State-store provider selection for the streaming operators
  * ([[StreamDedup]], [[StreamProfiler]]).
  *
  * The default HDFS-backed provider keeps every state row ON-HEAP in
  * each executor (with a checkpoint copy in the checkpoint dir). For
  * the streaming dedup operators the state is one entry per distinct
  * fingerprint / per occupied band bucket — at 100 TB stream volume
  * that map outgrows executor heaps long before anything else in the
  * pipeline fails. RocksDB (bundled with Spark) keeps state off-heap
  * on local SSD with block-cache reads, bounding the heap footprint
  * regardless of state cardinality — the provider every large
  * stateful production stream should run.
  *
  * The provider is a SESSION conf read when a streaming query STARTS:
  * set it before `writeStream.start()`; running queries keep the
  * provider they started with (state formats are not interchangeable
  * across restarts of the same checkpoint).
  */
object StateStores {

  val ProviderConfKey = "spark.sql.streaming.stateStore.providerClass"

  val RocksDBProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  val HdfsBackedProvider =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"

  /** Set the session's state-store provider by short name:
    * `"rocksdb"` or `"hdfs"`/`"default"` (case-insensitive). Returns
    * the previous provider conf (None = Spark default) so callers can
    * restore it. */
  def configure(spark: SparkSession, provider: String): Option[String] = {
    val previous = spark.conf.getOption(ProviderConfKey)
    provider.toLowerCase match {
      case "rocksdb" => spark.conf.set(ProviderConfKey, RocksDBProvider)
      case "hdfs" | "default" => spark.conf.set(ProviderConfKey, HdfsBackedProvider)
      case other => throw new IllegalArgumentException(
        s"unknown state store provider: $other (expected rocksdb, hdfs, or default)")
    }
    previous
  }

  /** Apply the `streaming.state_store` key of a layered
    * [[graft.config.Config]] map (absent key → leave the session
    * untouched, so plain configs keep Spark's default). */
  def fromConfig(spark: SparkSession, config: Map[String, Any]): Unit =
    config.get("streaming") match {
      case Some(m: Map[_, _]) =>
        m.asInstanceOf[Map[String, Any]].get("state_store")
          .foreach(v => configure(spark, String.valueOf(v)))
      case _ => ()
    }
}
