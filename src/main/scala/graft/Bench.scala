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
  * (process-CPU ÷ wall ÷ cores) and the host 1-min load average
  * sampled before the first query (`load_start`), after EVERY query
  * (max kept as `load_max`), and after the last (`load_end`). A
  * contended host starves this process of cycles, so wall inflates
  * while the per-query CPU delta does not. Three rounds of polluted
  * artifacts slipped through a start-only load check because the
  * driver keeps only the TAIL of this JSON line — so the contention
  * evidence now (a) comes from mid-run samples, not just the start,
  * and (b) is emitted compactly at the END of the line: a
  * `"slowest"` map (top-10 by wall, each with wall+cpu — wall ≈ cpu
  * on a 32-core-parallel query proves starvation directly), a
  * `"starved"` list (queries with cpu > 1 s whose wall exceeded
  * ~3× cpu/cores while the sampled load was above half the cores),
  * `"load_max"`, and `"contended"` (true when either the load max
  * crossed half the cores or any query starved).
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
    // (name, wall, cpuDelta, gcDelta, 1-min load sampled right after
    // the query — a mid-run contention signature the start-of-run
    // sample cannot provide).
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val cpu0 = processCpuSec()
      val gc0 = gcSec()
      try { fn(spark, sfDir).collect(); () }
      catch { case e: Throwable =>
        errors += name -> String.valueOf(e.getMessage)
        System.err.println(s"[bench] $name FAILED: $e")
      }
      (name, (System.nanoTime() - t0) / 1e9, processCpuSec() - cpu0,
        gcSec() - gc0, osBean.getSystemLoadAverage)
    }
    // JSON has no NaN literal: an unsupported CPU bean reports -1.
    def num(v: Double): String = if (v.isNaN || v.isInfinite) "-1" else f"$v%.3f"
    def jmap(f: ((String, Double, Double, Double, Double)) => Double): String =
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
    val loadSamples = (loadStart +: results.map(_._5)).filterNot(_.isNaN)
    val loadMax = if (loadSamples.nonEmpty) loadSamples.max else Double.NaN
    // A query was starved when it burned real CPU (> 1 s) yet its wall
    // exceeded ~3× the perfectly-parallel floor (cpu/cores) WHILE the
    // sampled load showed competing demand for over half the cores.
    // The load condition keeps quiet-host low-parallelism queries
    // (driver-side diffs, streaming micro-batches) out of the list.
    val starved = results.filter { r =>
      !r._3.isNaN && r._3 > 1.0 && r._2 > 3.0 * r._3 / cores &&
        !r._5.isNaN && r._5 > cores / 2.0
    }.map(_._1)
    val starvedJson = starved.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Top-10 by wall, each with wall+cpu: the compact starvation proof
    // (wall ≈ cpu on a parallel query ⇒ it got ~1 core's cycles).
    val slowest = results.sortBy(-_._2).take(10)
      .map(r => "\"" + r._1 + "\":{\"w\":" + num(r._2) + ",\"c\":" + num(r._3) + "}")
      .mkString("{", ",", "}")
    val contended = (!loadMax.isNaN && loadMax > cores / 2.0) || starved.nonEmpty
    // Contention diagnostics go at the END of the line: the driver's
    // artifact keeps only the tail, and evidence that gets truncated
    // away cannot flag a polluted run.
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
      s""""cpu_sec":$cpuQs,"gc_sec":$gcQs,""" +
      s""""cpu_total":${num(cpuTotal)},"gc_total":${num(gcTotal)},"cpu_util":${num(util)},""" +
      s""""cores":$cores,"load_start":${num(loadStart)},"load_end":${num(loadEnd)},""" +
      s""""load_max":${num(loadMax)},"slowest":$slowest,"starved":$starvedJson,"contended":$contended}""")
    spark.stop()
    val errs = errors.result()
    if (errs.nonEmpty) {
      System.err.println(s"[bench] ${errs.size} queries failed: ${errs.keys.mkString(", ")}")
      sys.exit(1)
    }
  }
}
