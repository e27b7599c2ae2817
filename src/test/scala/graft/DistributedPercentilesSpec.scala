package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.profiler.DistributedPercentiles

/** The distributed exact percentile must agree with Spark's built-in
  * exact `percentile` (same (n-1)·p linear interpolation) on every
  * shape we can throw at it. */
class DistributedPercentilesSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private def builtin(df: org.apache.spark.sql.DataFrame, c: String, ps: Seq[Double]): Seq[Double] = {
    val exprs = ps.zipWithIndex.map { case (p, i) =>
      expr(s"percentile(`$c`, ${p}D)").cast("double").as(s"p$i")
    }
    val row = df.agg(exprs.head, exprs.tail: _*).head()
    ps.indices.map(row.getDouble)
  }

  private def check(df: org.apache.spark.sql.DataFrame, c: String,
      ps: Seq[Double] = Seq(0.0, 0.25, 0.5, 0.75, 0.9, 1.0)): Unit = {
    val got = DistributedPercentiles.of(df, c, ps)
    val want = builtin(df, c, ps)
    got.map(_.get).zip(want).foreach { case (g, w) => g shouldBe w +- 1e-9 }
  }

  test("agrees with built-in percentile on random doubles") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5)
    check(Seq.fill(500)(rnd.nextDouble() * 1000).toDF("x"), "x")
  }

  test("agrees on heavy duplicates and integers") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(6)
    check(Seq.fill(400)(rnd.nextInt(5).toLong).toDF("x"), "x")
  }

  test("agrees with nulls mixed in") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val data = Seq.fill(300)(if (rnd.nextBoolean()) Some(rnd.nextDouble()) else None)
    check(data.toDF("x"), "x")
  }

  test("single row, two rows, all-equal column") {
    val s = spark
    import s.implicits._
    check(Seq(42.0).toDF("x"), "x")
    check(Seq(1.0, 2.0).toDF("x"), "x")
    check(Seq.fill(50)(7.0).toDF("x"), "x")
  }

  test("empty and all-null columns yield None") {
    val s = spark
    import s.implicits._
    DistributedPercentiles.of(Seq.empty[Double].toDF("x"), "x", Seq(0.5)) shouldBe Seq(None)
    DistributedPercentiles.of(Seq(Option.empty[Double]).toDF("x"), "x", Seq(0.5)) shouldBe Seq(None)
  }

  test("quartiles over the lineitem fixture match the built-in") {
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val q = DistributedPercentiles.quartiles(df, Seq("l_quantity", "l_extendedprice"))
    for (c <- Seq("l_quantity", "l_extendedprice")) {
      val want = builtin(df, c, Seq(0.25, 0.5, 0.75))
      q(c).map(_.get).zip(want).foreach { case (g, w) => g shouldBe w +- 1e-9 }
    }
  }

  test("batched ofAll equals per-column of, including mixed null columns") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1.0, Some(10.0), Option.empty[Double]),
      (2.0, None, None),
      (2.0, Some(30.0), None),
      (9.0, Some(20.0), None),
      (4.5, Some(40.0), None))
      .toDF("a", "b", "allnull")
      .repartition(3)
    val ps = Seq(0.1, 0.25, 0.5, 0.75, 0.9)
    val batched = DistributedPercentiles.ofAll(df, Seq("a", "b", "allnull"), ps)
    for (c <- Seq("a", "b", "allnull"))
      batched(c) shouldBe DistributedPercentiles.of(df, c, ps)
    batched("allnull") shouldBe ps.map(_ => None)
  }
}
