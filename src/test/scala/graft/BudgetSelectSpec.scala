package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.sampling.BudgetSelect

/** Token-budget selection vs an independent Scala brute force: exact
  * greedy-prefix semantics under value refinement, tie (hash)
  * refinement, per-group budgets, and the default-budget path. The
  * brute force recomputes the md5 uniform hash with java.security —
  * independently of Spark's md5/conv — so the tie-break order itself
  * is cross-checked. */
class BudgetSelectSpec extends AnyFunSuite with Matchers with SparkTestBase {

  /** First 8 md5 hex digits of "42:<id>" over 2^32 — the md5-mode
    * uniform hash, implemented independently of the engine. */
  private def u(id: Long): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"42:$id".getBytes("UTF-8"))
    val hex = d.take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
  }

  private def bruteForce(
      rows: Seq[(Long, String, Double, Long)],
      budgets: Map[String, Long], defaultBudget: Long = 0L): Set[Long] =
    rows.groupBy(_._2).flatMap { case (g, rs) =>
      val budget = budgets.getOrElse(g, defaultBudget)
      val ordered = rs.sortBy(r => (-r._3, u(r._1), r._1))
      var cum = 0L
      ordered.takeWhile { r => cum += r._4; cum <= budget }.map(_._1)
    }.toSet

  // 3 groups × 1500 rows; quality quantized to 101 levels so every
  // group carries real tie runs; tokens 1..100.
  private lazy val fixture: Seq[(Long, String, Double, Long)] =
    (1L to 4500L).map { id =>
      (id, (id % 3).toString, (id * 37 % 101) / 100.0, id % 100 + 1)
    }

  private def df = {
    val s = spark
    import s.implicits._
    fixture.toDF("id", "src", "quality", "tokens")
  }

  test("budgetSelect matches brute force exactly, with refinement levels forced") {
    val budgets = Map("0" -> 20000L, "1" -> 777L)
    val expected = bruteForce(fixture, budgets)
    // A 64-row boundary limit forces multiple histogram levels on a
    // 1500-row group — the refinement loop is the thing under test.
    val got = BudgetSelect.budgetSelect(df, "id", "src", "quality", "tokens",
      budgets, hashMode = "md5", boundaryWindowLimit = 64)
      .select("id").collect().map(_.getLong(0)).toSet
    got shouldBe expected
    got should not be empty
    // Budget exactness: per group, spent ≤ budget and the next-best
    // excluded row would overflow.
    val byId = fixture.map(r => r._1 -> r).toMap
    for ((g, budget) <- budgets) {
      val sel = got.map(byId).filter(_._2 == g)
      val spent = sel.toSeq.map(_._4).sum
      spent should be <= budget
      val excluded = fixture.filter(r => r._2 == g && !got(r._1))
      if (excluded.nonEmpty) {
        val nextBest = excluded.minBy(r => (-r._3, u(r._1), r._1))
        (spent + nextBest._4) should be > budget
      }
    }
  }

  test("a pure tie cluster selects exactly by hash order (hash refinement path)") {
    val s = spark
    import s.implicits._
    val ties = (1L to 3000L).map(id => (id, "t", 0.5, 1L))
    val tdf = ties.toDF("id", "src", "quality", "tokens")
    val got = BudgetSelect.budgetSelect(tdf, "id", "src", "quality", "tokens",
      Map("t" -> 500L), hashMode = "md5", boundaryWindowLimit = 64)
      .select("id").collect().map(_.getLong(0)).toSet
    got shouldBe bruteForce(ties, Map("t" -> 500L))
    got.size shouldBe 500
  }

  test("budgets at or beyond the group total keep everything; zero budgets keep nothing") {
    val all = BudgetSelect.budgetSelect(df, "id", "src", "quality", "tokens",
      Map("0" -> Long.MaxValue / 4), hashMode = "md5")
      .select("id").collect().map(_.getLong(0)).toSet
    all shouldBe fixture.filter(_._2 == "0").map(_._1).toSet
    BudgetSelect.budgetSelect(df, "id", "src", "quality", "tokens",
      Map("0" -> 0L), hashMode = "md5").count() shouldBe 0L
  }

  test("defaultBudget covers unnamed groups; null/negative rows are excluded") {
    val s = spark
    import s.implicits._
    val withBad = fixture ++ Seq((9001L, "0", Double.NaN, 5L),
      (9004L, "0", Double.PositiveInfinity, 5L), (9005L, "0", Double.NegativeInfinity, 5L))
    val bad = Seq[(Long, String, Option[Double], Long)](
      (9002L, "0", None, 5L), (9003L, "0", Some(0.9), -5L))
    val full = withBad.map { case (i, g, q, t) => (i, g, Option(q), t) } ++ bad
    val fdf = full.toDF("id", "src", "quality", "tokens")
    val got = BudgetSelect.budgetSelect(fdf, "id", "src", "quality", "tokens",
      Map.empty, defaultBudget = 1000L, hashMode = "md5")
      .select("id", "src").collect()
    got.map(_.getString(1)).toSet shouldBe Set("0", "1", "2") // default applied to all
    val ids = got.map(_.getLong(0)).toSet
    ids should not contain 9002L // null quality
    ids should not contain 9003L // negative tokens
    ids should not contain 9001L // NaN quality
    // ±Inf quality: a +Inf group max would make every value bucket
    // NaN and the refinement could never shrink — excluded up front.
    ids should not contain 9004L
    ids should not contain 9005L
    // xxhash64 mode runs the same machinery (different order, same contract).
    val fast = BudgetSelect.budgetSelect(df, "id", "src", "quality", "tokens",
      Map("1" -> 777L))
    fast.select(sum("tokens")).head().getLong(0) should be <= 777L
  }

  test("deterministic: repeated runs select the identical set") {
    val a = BudgetSelect.budgetSelect(df, "id", "src", "quality", "tokens",
      Map("2" -> 5000L), hashMode = "md5", boundaryWindowLimit = 64)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = BudgetSelect.budgetSelect(df, "id", "src", "quality", "tokens",
      Map("2" -> 5000L), hashMode = "md5", boundaryWindowLimit = 64)
      .select("id").collect().map(_.getLong(0)).toSet
    b shouldBe a
  }
}
