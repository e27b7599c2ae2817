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
  *
  * Besides wall time, every query records its process-CPU and GC time
  * deltas (`cpu_sec` / `gc_sec` maps) plus top-level `cpu_util`
  * (process-CPU ÷ wall ÷ cores) and the host 1-min load average sampled
  * BEFORE the first query (`load_start`) and after the last
  * (`load_end`). A contended host starves this process of cycles, so
  * wall inflates while the per-query CPU delta does not — and the
  * start-of-run load average shows the competing demand directly.
  * `contended: true` is set when the start load exceeds half the core
  * count, making a noise-polluted artifact detectable from the JSON
  * alone instead of by cross-round archaeology.
  */
object Bench {
  private val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean

  /** Cumulative process CPU time in seconds (-1 → NaN if unsupported). */
  private def processCpuSec(): Double = osBean match {
    case b: com.sun.management.OperatingSystemMXBean =>
      val t = b.getProcessCpuTime
      if (t < 0) Double.NaN else t / 1e9
    case _ => Double.NaN
  }

  /** Cumulative stop-the-world GC time in seconds, summed over collectors. */
  private def gcSec(): Double = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(b => math.max(0L, b.getCollectionTime)).sum / 1e3
  }
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

    // Sampled before this process does any parallel work: a 1-min load
    // average near/above the core count here means OTHER processes own
    // the cores and the wall times below are not comparable.
    val loadStart = osBean.getSystemLoadAverage

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
      val cpu0 = processCpuSec()
      val gc0 = gcSec()
      try { fn(spark, sfDir).collect(); () }
      catch { case e: Throwable =>
        errors += name -> String.valueOf(e.getMessage)
        System.err.println(s"[bench] $name FAILED: $e")
      }
      (name, (System.nanoTime() - t0) / 1e9, processCpuSec() - cpu0, gcSec() - gc0)
    }
    // JSON has no NaN literal: an unsupported CPU bean reports -1.
    def num(v: Double): String = if (v.isNaN || v.isInfinite) "-1" else f"$v%.3f"
    def jmap(f: ((String, Double, Double, Double)) => Double): String =
      results.map { r => "\"" + r._1 + "\":" + num(f(r)) }
        .mkString("{", ",", "}")
    val qs = jmap(_._2)
    val cpuQs = jmap(_._3)
    val gcQs = jmap(_._4)
    val total = results.map(_._2).sum
    val cpuTotal = results.map(_._3).sum
    val gcTotal = results.map(_._4).sum
    val cores = Runtime.getRuntime.availableProcessors()
    // Whole-run core utilization — diagnostic context for the per-query
    // cpu_sec map (a CPU-bound query whose wall ≫ cpu was starved).
    val util = if (total > 0 && !cpuTotal.isNaN) cpuTotal / (total * cores) else Double.NaN
    val loadEnd = osBean.getSystemLoadAverage
    val contended = !loadStart.isNaN && loadStart > cores / 2.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
      s""""cpu_sec":$cpuQs,"gc_sec":$gcQs,""" +
      s""""cpu_total":${num(cpuTotal)},"gc_total":${num(gcTotal)},"cpu_util":${num(util)},""" +
      s""""cores":$cores,"load_start":${num(loadStart)},"load_end":${num(loadEnd)},"contended":$contended}""")
    spark.stop()
    val errs = errors.result()
    if (errs.nonEmpty) {
      System.err.println(s"[bench] ${errs.size} queries failed: ${errs.keys.mkString(", ")}")
      sys.exit(1)
    }
  }
}
