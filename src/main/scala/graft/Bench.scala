package graft
import org.apache.spark.sql.SparkSession

/** Benchmark harness: times every SparkEntry query at the configured
  * scale factor and emits one JSON line for the driver.
  *
  * A failing query is a bench FAILURE, not a fast run: its error is
  * recorded, surfaced on stderr, and the process exits nonzero so a
  * broken operator can never bench as "0 seconds". The timed action is
  * `collect()` — materializing the actual result values — not
  * `count()`, which for aggregates can plan a slightly cheaper query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: pay JVM/codegen/parquet-footer costs once, outside timing.
    try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: ${e.getMessage}") }

    val errors = Map.newBuilder[String, String]
    // Sorted by name: an unordered Map would hash-shuffle the timing
    // order between builds, landing residual JIT/IO warmup cost on a
    // nondeterministic first query and adding cross-round noise.
    // Optional positional args narrow the run to the named queries —
    // for timing one operator in isolation; the driver passes none.
    // Unknown names are a hard error (a typo must not bench as an
    // empty, 0-second run).
    val unknown = args.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(s"[bench] unknown queries: ${unknown.mkString(", ")}")
      spark.stop()
      sys.exit(2)
    }
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(args.contains).toMap
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).collect(); () }
      catch { case e: Throwable =>
        errors += name -> String.valueOf(e.getMessage)
        System.err.println(s"[bench] $name FAILED: $e")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
    val errs = errors.result()
    if (errs.nonEmpty) {
      System.err.println(s"[bench] ${errs.size} queries failed: ${errs.keys.mkString(", ")}")
      sys.exit(1)
    }
  }
}
