package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token-budget selection — THE data-mixing primitive of a training
  * pipeline: per source (group), keep documents in quality order until
  * the source's token budget is spent. North-star scope beyond the
  * reference surface.
  *
  * Semantics (exact, deterministic): within each group, order rows by
  * `orderCol` DESCENDING (higher = better; negate the column for
  * ascending), tie-broken by the (seed, id) uniform hash then id; keep
  * the maximal prefix whose inclusive running token sum is ≤ the
  * group's budget. Rows with a null order or token value are excluded
  * (they have no place in a quality-ordered token prefix).
  *
  * Scale design — the naive form is ONE Window per group (a cumulative
  * sum over the whole source: a handful of partitions each holding
  * billions of rows — the classic window funnel this repo bans). This
  * instead finds the selection THRESHOLD by distributed weighted-rank
  * search, the same no-single-task-merge shape as
  * [[graft.profiler.DistributedPercentiles]]:
  *
  *   1. histogram level: bucket each group's order range into 4096
  *      buckets — ONE hash aggregate for every group together — and
  *      walk buckets best→worst on the driver until the budget
  *      crosses. Buckets before the boundary are kept WHOLLY by a
  *      map-side filter; no ordering is ever materialized for them.
  *   2. refinement levels: while a group's boundary slice still holds
  *      more rows than `boundaryWindowLimit`, re-histogram just the
  *      boundary slices (again one aggregate for all groups),
  *      subdividing each slice's VALUE range while it is
  *      non-degenerate and switching to successive digits of the
  *      uniform tie-break HASH once the slice is a single-value tie
  *      cluster (ties have no internal order to respect, so hash
  *      subdivision realizes the defined order exactly).
  *   3. boundary pass: the final slices (each ≤ the limit, shrinking
  *      ~4096× per level) get the exact inclusive cumulative sum in
  *      one small per-group window — bounded work at any corpus size.
  *
  * Driver state is (groups × 4096) histogram rows per level; each
  * level is two aggregate jobs over a filtered scan. Designed for
  * group counts in the tens-to-thousands (data sources), not
  * millions.
  */
object BudgetSelect {

  private val Buckets = 4096

  /** One group's boundary slice still being refined: the conjunctive
    * predicate pinning the slice, the budget left after everything
    * already kept before it, and how many hash digits have been
    * consumed by tie refinement so far. */
  private final case class Slice(
      group: String, pred: Column, remaining: Long, hashDepth: Int)

  def budgetSelect(
      df: DataFrame, idCol: String, groupCol: String, orderCol: String,
      tokenCol: String, budgets: Map[String, Long],
      defaultBudget: Long = 0L, seed: Long = 42L, hashMode: String = "xxhash64",
      boundaryWindowLimit: Long = 1L << 20): DataFrame = {
    require(budgets.values.forall(_ >= 0) && defaultBudget >= 0,
      s"budgets must be non-negative: $budgets / default $defaultBudget")
    require(boundaryWindowLimit > 0, "boundaryWindowLimit must be positive")

    val grp = col(groupCol).cast("string")
    val ord = col(orderCol).cast("double")
    val tok = col(tokenCol).cast("long")
    val u = Sampling.uniformHash(col(idCol), seed, hashMode)
    // Null/NaN/±Inf order rows have no place in a quality-ordered
    // token prefix (NaN would sort as the LARGEST value and silently
    // eat budget first; a +Inf group maximum makes every value bucket
    // (hi−ord)/(hi−lo) = NaN, so the refinement could never shrink the
    // slice), and a NEGATIVE token count is a data error that would
    // break the cumulative sum's monotonicity (the prefix's very
    // definition) — all are excluded.
    val base = df.filter(ord.isNotNull && !isnan(ord) &&
      ord > Double.NegativeInfinity && ord < Double.PositiveInfinity &&
      tok.isNotNull && tok >= 0)

    // ---- Groups in play: the named ones plus (when the default
    // budget admits anything) every other group present in the data.
    val namedPred =
      budgets.keys.map(grp === _).foldLeft(lit(false))(_ || _)
    val defaultGroups: Seq[String] =
      if (defaultBudget > 0)
        base.filter(!namedPred).select(grp.as("g")).distinct()
          .collect().map(_.getString(0)).toSeq
      else Seq.empty
    var pending: Seq[Slice] =
      (budgets.filter(_._2 > 0).keys.toSeq.map(g => Slice(g, grp === g, budgets(g), 0)) ++
        defaultGroups.map(g => Slice(g, grp === g, defaultBudget, 0)))

    var keptPreds = Seq.empty[Column]
    var boundary = Seq.empty[Slice]
    var level = 0

    // Bucket index 0 = BEST (largest order value / smallest hash).
    // The SAME expression instance drives the histogram, the
    // kept-whole filter, and the next slice's predicate, so the three
    // can never disagree on a row's bucket.
    def valueBucket(lo: Double, hi: Double): Column =
      least(floor((lit(hi) - ord) / (lit(hi) - lit(lo)) * Buckets).cast("int"),
        lit(Buckets - 1))
    def hashBucket(depth: Int): Column =
      pmod(floor(u * math.pow(Buckets, depth + 1)).cast("long"), lit(Buckets.toLong))
        .cast("int")

    while (pending.nonEmpty && level < 8) {
      val anyPred = pending.map(_.pred).reduce(_ || _)
      // Per-slice (≡ per-group) order-range and row count, one job.
      val stats = base.filter(anyPred)
        .groupBy(grp.as("g"))
        .agg(min(ord).as("lo"), max(ord).as("hi"), count(lit(1)).as("n"))
        .collect()
        .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3))))
        .toMap

      // Slices already small enough go straight to the boundary pass;
      // empty slices vanish.
      val (ready, big) = pending.flatMap { s =>
        stats.get(s.group).map(st => (s, st))
      }.partition { case (_, (_, _, n)) => n <= boundaryWindowLimit }
      boundary ++= ready.map(_._1)

      if (big.isEmpty) {
        pending = Seq.empty
      } else {
        // One combined histogram job: each group's rows fall into its
        // own slice's bucket expression via a per-group CASE chain.
        val withBucket = big.map { case (s, (lo, hi, _)) =>
          val b = if (lo == hi) hashBucket(s.hashDepth) else valueBucket(lo, hi)
          (s, lo == hi, b)
        }
        val bucketExpr = withBucket
          .foldLeft(when(lit(false), lit(0))) { case (acc, (s, _, b)) =>
            acc.when(grp === s.group, b)
          }.otherwise(lit(-1))
        val bigPred = big.map(_._1.pred).reduce(_ || _)
        val hist = base.filter(bigPred)
          .groupBy(grp.as("g"), bucketExpr.as("b"))
          .agg(sum(tok).as("t"))
          .collect()
          .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
          .groupBy(_._1)

        pending = withBucket.flatMap { case (s, wasTies, bucketCol) =>
          val walk = hist.getOrElse(s.group, Array.empty[(String, Int, Long)])
            .toSeq.map(r => (r._2, r._3)).sortBy(_._1)
          var remaining = s.remaining
          var cut = -1
          walk.foreach { case (b, t) =>
            if (cut < 0) {
              if (t <= remaining) remaining -= t else cut = b
            }
          }
          if (cut < 0) {
            // The whole slice fits: keep it outright, nothing left to
            // refine for this group.
            keptPreds +:= s.pred
            None
          } else {
            if (cut > 0) keptPreds +:= (s.pred && bucketCol < cut)
            Some(Slice(s.group, s.pred && bucketCol === cut, remaining,
              if (wasTies) s.hashDepth + 1 else s.hashDepth))
          }
        }
      }
      level += 1
    }
    require(pending.isEmpty,
      "budgetSelect failed to shrink a boundary slice within 8 levels — " +
        "this indicates a bucketing regression, not a data property")

    // ---- Exact inclusive-cumulative window over the boundary slices
    // only — each bounded by boundaryWindowLimit rows by construction.
    val wholeDf =
      if (keptPreds.isEmpty) base.limit(0)
      else base.filter(keptPreds.reduce(_ || _))
    val boundaryDf = boundary match {
      case Seq() => base.limit(0)
      case ss =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(grp)
          .orderBy(ord.desc, u.asc, col(idCol).asc)
        val rem = ss.foldLeft(when(lit(false), lit(0L))) { (acc, s) =>
          acc.when(grp === s.group, s.remaining)
        }.otherwise(lit(0L))
        base.filter(ss.map(_.pred).reduce(_ || _))
          .withColumn("__cum", sum(tok).over(w))
          .filter(col("__cum") <= rem)
          .drop("__cum")
    }
    wholeDf.unionByName(boundaryDf)
  }
}
