package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.functions.VectorFunctions

/** The native NearestCells / SignBucketExpr expressions: codegen vs
  * hand-computed results, tie-breaking, float vs double input, and
  * short-vector padding. */
class VectorExpressionsSpec extends AnyFunSuite with SparkTestBase with Matchers {

  private val matrix = Seq(
    Seq(1.0, 0.0, 0.0),
    Seq(0.0, 1.0, 0.0),
    Seq(0.0, 0.0, 1.0),
    Seq(-1.0, 0.0, 0.0))

  test("nearestCells returns top-n row indices by dot product, best first") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Seq(3.0, 2.0, 1.0)), (2L, Seq(-5.0, 0.5, 4.0)))
      .toDF("id", "v")
      .select(col("id"), VectorFunctions.nearestCells(col("v"), matrix, 3).as("cells"))
    val rows = df.orderBy("id").collect()
    // id 1: dots = (3, 2, 1, -3) -> 0, 1, 2
    rows(0).getSeq[Int](1) shouldBe Seq(0, 1, 2)
    // id 2: dots = (-5, 0.5, 4, 5) -> 3, 2, 1
    rows(1).getSeq[Int](1) shouldBe Seq(3, 2, 1)
  }

  test("nearestCells ties break to the lowest row index") {
    val s = spark
    import s.implicits._
    val m = Seq(Seq(1.0, 0.0), Seq(1.0, 0.0), Seq(0.0, 1.0))
    val rows = Seq((1L, Seq(2.0, 2.0)))
      .toDF("id", "v")
      .select(VectorFunctions.nearestCells(col("v"), m, 3).as("cells"))
      .collect()
    // dots = (2, 2, 2): all tied -> index order.
    rows(0).getSeq[Int](0) shouldBe Seq(0, 1, 2)
  }

  test("nearestCells accepts float input and zero-pads short vectors") {
    val s = spark
    import s.implicits._
    val rows = Seq((1L, Seq(1.0f)))
      .toDF("id", "v")
      .select(VectorFunctions.nearestCells(col("v"), matrix, 1).as("cells"))
      .collect()
    // Only dim 0 contributes: dots = (1, 0, 0, -1) -> 0.
    rows(0).getSeq[Int](0) shouldBe Seq(0)
  }

  test("nearestCells is null-safe") {
    val s = spark
    import s.implicits._
    val rows = Seq((1L, Option.empty[Seq[Double]]), (2L, Some(Seq(1.0, 0.0, 0.0))))
      .toDF("id", "v")
      .select(col("id"), VectorFunctions.nearestCells(col("v"), matrix, 1).as("cells"))
      .orderBy("id").collect()
    rows(0).isNullAt(1) shouldBe true
    rows(1).getSeq[Int](1) shouldBe Seq(0)
  }

  test("matrixDots returns every row dot, null-safe, float accepted") {
    val s = spark
    import s.implicits._
    val rows = Seq(
        (1L, Some(Seq(3.0, 2.0, 1.0))),
        (2L, Option.empty[Seq[Double]]))
      .toDF("id", "v")
      .select(col("id"), VectorFunctions.matrixDots(col("v"), matrix).as("dots"))
      .orderBy("id").collect()
    rows(0).getSeq[Double](1) shouldBe Seq(3.0, 2.0, 1.0, -3.0)
    rows(1).isNullAt(1) shouldBe true
    // Float input, short vector: only dim 0 contributes.
    val f = Seq((1L, Seq(2.0f))).toDF("id", "v")
      .select(VectorFunctions.matrixDots(col("v"), matrix).as("dots"))
      .collect()
    f(0).getSeq[Double](0) shouldBe Seq(2.0, 0.0, 0.0, -2.0)
  }

  test("signBucket sets bit i iff the dot against plane i is strictly positive") {
    val s = spark
    import s.implicits._
    val planes = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(-1.0, -1.0))
    val rows = Seq(
      (1L, Seq(2.0, 3.0)),   // dots (2, 3, -5)  -> bits 0,1   = 3
      (2L, Seq(-1.0, 0.0)),  // dots (-1, 0, 1)  -> bit 2      = 4
      (3L, Seq(0.0, 0.0)))   // dots (0, 0, 0)   -> no bits    = 0
      .toDF("id", "v")
      .select(col("id"), VectorFunctions.signBucket(col("v"), planes).as("b"))
      .orderBy("id").collect()
    rows.map(_.getInt(1)).toSeq shouldBe Seq(3, 4, 0)
  }

  test("MinHashAgg is value-identical to the k-column min(xxhash64(lit(i), h)) form") {
    val s = spark
    import s.implicits._
    val k = 16
    val hashed = Seq((1L, "a b c d e f g"), (2L, "h i j k l m n"), (3L, "a b c x y z q"))
      .toDF("id", "text")
      .select(col("id"), explode(graft.dedup.Dedup.wordShingles(col("text"), 3)).as("sh"))
      .select(col("id"), xxhash64(col("sh")).as("h"))
    val legacy = hashed.groupBy("id")
      .agg((0 until k).map(i => min(xxhash64(lit(i), col("h"))).as(s"h$i")).head,
        (1 until k).map(i => min(xxhash64(lit(i), col("h"))).as(s"h$i")): _*)
      .select(col("id"), array((0 until k).map(i => col(s"h$i")): _*).as("sig"))
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getSeq[Long](1))
    val native = hashed.groupBy("id")
      .agg(graft.functions.VectorFunctions.minhashAgg(col("h"), k).as("sig"))
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getSeq[Long](1))
    native shouldBe legacy
  }

  test("SimHashAgg is value-identical to the 64-column vote form, both hash modes") {
    val s = spark
    import s.implicits._
    val shingled = Seq((1L, "a b c d e f g"), (2L, "h i j k l m n o p q"))
      .toDF("id", "text")
      .select(col("id"), explode(graft.dedup.Dedup.wordShingles(col("text"), 3)).as("sh"))

    def legacy(field: org.apache.spark.sql.Column, md5Mode: Boolean): Map[Long, Long] = {
      val prepared =
        if (!md5Mode) shingled.select(col("id"), field.as("h"))
        else shingled.select(col("id"), field.as("hex"))
          .select(col("id") +: (0 until 16).map { j =>
            (expr(s"locate(substring(hex, ${j + 1}, 1), '0123456789abcdef')") - 1).as(s"n$j")
          }: _*)
      val bitSums = (0 until 64).map { b =>
        if (!md5Mode)
          sum(when(col("h").bitwiseAND(lit(1L << b)) =!= 0L, 1).otherwise(-1)).as(s"b$b")
        else
          sum(when(shiftright(col(s"n${b / 4}"), b % 4).bitwiseAND(lit(1)) === 1, 1)
            .otherwise(-1)).as(s"b$b")
      }
      val sk = (0 until 64).map { b =>
        when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ bitwiseOR _)
      prepared.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
        .select(col("id"), sk.as("sk"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    def native(field: org.apache.spark.sql.Column): Map[Long, Long] =
      shingled.select(col("id"), field.as("f")).groupBy("id")
        .agg(graft.functions.VectorFunctions.simhashAgg(col("f")).as("sk"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    native(xxhash64(col("sh"))) shouldBe legacy(xxhash64(col("sh")), md5Mode = false)
    native(md5(col("sh"))) shouldBe legacy(md5(col("sh")), md5Mode = true)
  }

  test("SQL functions register via GraftFunctions/GraftExtensions") {
    val s = spark
    import s.implicits._
    graft.functions.GraftFunctions.register(spark)
    Seq((1L, Seq(3.0, 2.0, 1.0))).toDF("id", "v").createOrReplaceTempView("vex_vecs")
    val r = spark.sql(
      """SELECT graft_nearest_cells(v, array(array(1.0d, 0.0d, 0.0d), array(0.0d, 1.0d, 0.0d)), 2) AS cells,
        |       graft_sign_bucket(v, array(array(1.0d, 0.0d, 0.0d), array(-1.0d, 0.0d, 0.0d))) AS b
        |FROM vex_vecs""".stripMargin).collect()
    r(0).getSeq[Int](0) shouldBe Seq(0, 1)
    r(0).getInt(1) shouldBe 1
    // The extensions class injects the same builders.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions()(ext)
    // Non-literal matrix is rejected at plan time.
    an[Exception] should be thrownBy spark.sql(
      "SELECT graft_sign_bucket(v, array(array(v[0]))) FROM vex_vecs").collect()
  }

  test("codegen and interpreted paths agree") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Seq(3.0, -2.0, 1.0)), (2L, Seq(0.1, 0.2, 0.3))).toDF("id", "v")
    val planes = matrix
    def run(codegen: String): Seq[(Seq[Int], Int, Seq[Double])] = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try df.select(
          VectorFunctions.nearestCells(col("v"), matrix, 2).as("cells"),
          VectorFunctions.signBucket(col("v"), planes).as("b"),
          VectorFunctions.matrixDots(col("v"), matrix).as("dots"))
        .orderBy("cells").collect()
        .map(r => (r.getSeq[Int](0), r.getInt(1), r.getSeq[Double](2))).toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    run("CODEGEN_ONLY") shouldBe run("NO_CODEGEN")
  }

  test("cosineSim is bit-identical to the HOF formulation it replaces") {
    val s = spark
    import s.implicits._
    import graft.similarity.Similarity
    val df = Seq(
      (1L, Seq(3.0f, -2.0f, 1.0f), Seq(0.5f, 0.25f, -1.0f)),
      (2L, Seq(0.1f, 0.2f, 0.3f), Seq(0.1f, 0.2f, 0.3f)),
      (3L, Seq(1.0f, 0.0f, 0.0f), Seq(0.0f, 1.0f, 0.0f)))
      .toDF("id", "a", "b")
    val hof = Similarity.dot(col("a"), col("b")) /
      (Similarity.l2Norm(col("a")) * Similarity.l2Norm(col("b")))
    val rows = df.select(
        VectorFunctions.cosineSim(col("a"), col("b")).as("native"), hof.as("hof"))
      .collect()
    rows.foreach { r =>
      java.lang.Double.doubleToRawLongBits(r.getDouble(0)) shouldBe
        java.lang.Double.doubleToRawLongBits(r.getDouble(1))
    }
  }

  test("cosineSim nulls: null input, length mismatch, zero norm, null element") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Option.empty[Seq[Double]], Some(Seq[Option[Double]](Some(1.0), Some(2.0)))),
      (2L, Some(Seq(1.0, 2.0, 3.0)), Some(Seq[Option[Double]](Some(1.0), Some(2.0)))),
      (3L, Some(Seq(0.0, 0.0)), Some(Seq[Option[Double]](Some(1.0), Some(2.0)))),
      (4L, Some(Seq(1.0, 0.0)), Some(Seq[Option[Double]](Some(1.0), Some(0.0)))),
      (5L, Some(Seq(1.0, 1.0)), Some(Seq[Option[Double]](Some(1.0), None))))
      .toDF("id", "a", "b")
    val rows = df.select(col("id"), VectorFunctions.cosineSim(col("a"), col("b")).as("sim"))
      .orderBy("id").collect()
    rows(0).isNullAt(1) shouldBe true  // null input
    rows(1).isNullAt(1) shouldBe true  // length mismatch (zip_with-null semantics)
    rows(2).isNullAt(1) shouldBe true  // zero divisor (Divide semantics)
    rows(3).getDouble(1) shouldBe 1.0
    rows(4).isNullAt(1) shouldBe true  // null ELEMENT (HOF null propagation)
  }

  test("cosineSim accepts integer element arrays like the HOF form it replaced") {
    val s = spark
    import s.implicits._
    val rows = Seq((Seq(1, 0), Seq(1, 0))).toDF("a", "b")
      .select(VectorFunctions.cosineSim(col("a"), col("b")).as("sim")).collect()
    rows(0).getDouble(0) shouldBe 1.0
  }

  test("cosineSim codegen and interpreted paths agree") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Some(Seq(3.0, -2.0, 1.0)), Some(Seq(0.5, 0.25, -1.0))),
      (2L, Some(Seq(1.0, 2.0)), Some(Seq(1.0, 2.0, 3.0))),
      (3L, Option.empty[Seq[Double]], Some(Seq(1.0))))
      .toDF("id", "a", "b")
    def run(codegen: String): Seq[Option[Long]] = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try df.select(col("id"), VectorFunctions.cosineSim(col("a"), col("b")).as("sim"))
        .orderBy("id").collect()
        .map(r => if (r.isNullAt(1)) None
                  else Some(java.lang.Double.doubleToRawLongBits(r.getDouble(1)))).toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    run("CODEGEN_ONLY") shouldBe run("NO_CODEGEN")
  }

  test("graft_cosine_sim registers as a SQL function") {
    val s = spark
    import s.implicits._
    graft.functions.GraftFunctions.register(spark)
    Seq((Seq(1.0, 0.0), Seq(1.0, 0.0))).toDF("a", "b").createOrReplaceTempView("vex_cos")
    spark.sql("SELECT graft_cosine_sim(a, b) AS sim FROM vex_cos")
      .collect()(0).getDouble(0) shouldBe 1.0
  }

  test("text sketch functions register in SQL and agree with the Column API") {
    val s = spark
    import s.implicits._
    graft.functions.GraftFunctions.register(spark)
    Seq((1L, "a b c d e f g h i j")).toDF("id", "t").createOrReplaceTempView("vex_txt")
    val r = spark.sql(
      """SELECT graft_shingle_hashes(t, 3) AS sh,
        |       graft_simhash_sketch(t, 3, 'md5') AS sk,
        |       graft_winnowing_mins(t, 8, 4, 'md5') AS fps
        |FROM vex_txt""".stripMargin).collect()(0)
    val c = spark.table("vex_txt").select(
      graft.functions.VectorFunctions.shingleHashes(col("t"), 3).as("sh"),
      graft.functions.VectorFunctions.simhashSketch(col("t"), 3, "md5").as("sk"),
      graft.functions.VectorFunctions.winnowingMins(col("t"), 8, 4, "md5").as("fps"))
      .collect()(0)
    r.getSeq[Long](0) shouldBe c.getSeq[Long](0)
    r.getLong(1) shouldBe c.getLong(1)
    r.getSeq[String](2) shouldBe c.getSeq[String](2)
  }

  test("shingleHashStarts: positional xxhash64-of-gram, no fallback, no distinct") {
    val s = spark
    import s.implicits._
    graft.functions.GraftFunctions.register(spark)
    // "a b a b a" trigrams: "a b a"@0, "b a b"@1, "a b a"@2 — the
    // repeat must KEEP both positions (ShingleHashes would dedupe).
    val df = Seq((1L, "a b a b a"), (2L, "x y"), (3L, null.asInstanceOf[String]))
      .toDF("id", "t")
    val got = df.select(col("id"),
      graft.functions.VectorFunctions.shingleHashStarts(col("t"), 3).as("hs"))
      .orderBy("id").collect()
    val expected = df.filter(col("id") === 1)
      .select(
        xxhash64(lit("a b a")).as("h0"), xxhash64(lit("b a b")).as("h1"))
      .head()
    got(0).getSeq[Long](1) shouldBe Seq(
      expected.getLong(0), expected.getLong(1), expected.getLong(0))
    got(1).getSeq[Long](1) shouldBe Seq.empty // shorter than n: NO whole-text fallback
    got(2).isNullAt(1) shouldBe true
    // SQL registration agrees with the Column API
    df.createOrReplaceTempView("vex_sbp")
    spark.sql("SELECT graft_shingle_hash_starts(t, 3) AS hs FROM vex_sbp WHERE id = 1")
      .head().getSeq[Long](0) shouldBe got(0).getSeq[Long](1)
  }

  test("graft_bpe_encode registers in SQL and agrees with the Column API") {
    val s = spark
    import s.implicits._
    graft.functions.GraftFunctions.register(spark)
    Seq((1L, "aaab banana")).toDF("id", "t").createOrReplaceTempView("vex_bpe")
    val sql = spark.sql(
      "SELECT graft_bpe_encode(t, array('a', 'an'), array('n', 'a')) AS toks FROM vex_bpe")
      .head().getSeq[String](0)
    val merges = Seq(graft.text.Bpe.Merge(1, "a", "n", 0),
      graft.text.Bpe.Merge(2, "an", "a", 0))
    val api = Seq((1L, "aaab banana")).toDF("id", "t")
      .select(graft.text.Bpe.bpeTokens(col("t"), merges))
      .head().getSeq[String](0)
    sql shouldBe api
    // aaab: neither merge applies; banana → (a,n)×2 → (an,a) on the tail
    sql shouldBe Seq("a", "a", "a", "b", "b", "an", "ana")
    // non-literal and mismatched-arity merge arrays fail at plan time
    an[Exception] should be thrownBy
      spark.sql("SELECT graft_bpe_encode(t, array(t), array('a')) FROM vex_bpe").collect()
    an[Exception] should be thrownBy
      spark.sql("SELECT graft_bpe_encode(t, array('a'), array('a', 'b')) FROM vex_bpe").collect()
    // a NULL merge-array element gets the clean plan-time message, not an NPE
    val nullElem = intercept[Exception] {
      spark.sql("SELECT graft_bpe_encode(t, array('a', CAST(NULL AS STRING)), " +
        "array('b', 'c')) FROM vex_bpe").collect()
    }
    nullElem.getMessage should include("must not contain null elements")
    // optional 4th arg switches to byte mode: hex tokens, case preserved
    val byteToks = spark.sql(
      "SELECT graft_bpe_encode('Ab', array('41'), array('62'), true) AS toks")
      .head().getSeq[String](0)
    byteToks shouldBe Seq("4162") // 0x41='A', 0x62='b' merged
    an[Exception] should be thrownBy
      spark.sql("SELECT graft_bpe_encode('x', array('a'), array('b'), 'yes')").collect()
  }
}
