package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** SQL surface for graft's native expressions.
  *
  * Wire-up options:
  *   - session config: `spark.sql.extensions=graft.functions.GraftExtensions`
  *     (the standard `SparkSessionExtensions` injection point), or
  *   - an existing session: `GraftFunctions.register(spark)`.
  *
  * Registered functions:
  *   - `graft_nearest_cells(vec, matrix, n)` → array<int> of the n
  *     matrix-row indices with the highest dot product, best first
  *   - `graft_sign_bucket(vec, planes)` → int hyperplane sign bucket
  *   - `graft_cosine_sim(a, b)` → double cosine similarity
  *   - `graft_shingle_hashes(norm_text, n)` → array<bigint> distinct
  *     word n-gram hashes of a whitespace-normalized document
  *   - `graft_simhash_sketch(norm_text, n, mode)` → bigint SimHash-64
  *   - `graft_winnowing_mins(text, k, w, mode)` → winnowing
  *     fingerprints (array<string> for 'md5', array<bigint> for
  *     'xxhash64')
  *   - `graft_oph_signature(hashes, k)` → array<bigint>
  *     one-permutation MinHash signature with optimal densification
  *   - `graft_bpe_encode(text, lefts, rights)` → array<string> BPE
  *     tokens under the learned merge table given as two parallel
  *     LITERAL string arrays in rank order
  *     ([[graft.text.Bpe.learnMerges]] produces it)
  *
  * The matrix/planes argument must be a LITERAL array<array<numeric>>
  * — it is folded at plan time into the expression's reference-object
  * matrix, which is the entire point: the generated code loops over a
  * compact runtime object instead of inlining k×dim literal terms.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}

object GraftFunctions {

  private def matrixOf(e: Expression, fn: String): Array[Array[Double]] = {
    require(e.foldable, s"$fn: the matrix argument must be a literal array<array<numeric>>")
    val elemType = e.dataType match {
      case ArrayType(ArrayType(t, _), _) => t
      case other => throw new IllegalArgumentException(
        s"$fn: expected array<array<numeric>> matrix, got $other")
    }
    def cell(row: ArrayData, j: Int): Double = elemType match {
      case DoubleType => row.getDouble(j)
      case FloatType => row.getFloat(j).toDouble
      case IntegerType => row.getInt(j).toDouble
      case LongType => row.getLong(j).toDouble
      case d: DecimalType => row.getDecimal(j, d.precision, d.scale).toDouble
      case other => throw new IllegalArgumentException(
        s"$fn: non-numeric matrix element type $other")
    }
    val data = e.eval().asInstanceOf[ArrayData]
    (0 until data.numElements()).map { i =>
      val row = data.getArray(i)
      (0 until row.numElements()).map(cell(row, _)).toArray
    }.toArray
  }

  private def intOf(e: Expression, fn: String): Int = {
    require(e.foldable, s"$fn: n must be a literal integer")
    e.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(s"$fn: n must be an integer, got $other")
    }
  }

  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val nearestCells: FunctionDescription = (
    FunctionIdentifier("graft_nearest_cells"),
    new ExpressionInfo(classOf[NearestCells].getName, "graft_nearest_cells"),
    (args: Seq[Expression]) => {
      require(args.length == 3,
        s"graft_nearest_cells(vec, matrix, n) takes 3 arguments, got ${args.length}")
      NearestCells(args(0), matrixOf(args(1), "graft_nearest_cells"),
        intOf(args(2), "graft_nearest_cells"))
    })

  val signBucket: FunctionDescription = (
    FunctionIdentifier("graft_sign_bucket"),
    new ExpressionInfo(classOf[SignBucketExpr].getName, "graft_sign_bucket"),
    (args: Seq[Expression]) => {
      require(args.length == 2,
        s"graft_sign_bucket(vec, planes) takes 2 arguments, got ${args.length}")
      SignBucketExpr(args(0), matrixOf(args(1), "graft_sign_bucket"))
    })

  val cosineSim: FunctionDescription = (
    FunctionIdentifier("graft_cosine_sim"),
    new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine_sim"),
    (args: Seq[Expression]) => {
      require(args.length == 2,
        s"graft_cosine_sim(a, b) takes 2 arguments, got ${args.length}")
      CosineSim(args(0), args(1))
    })

  private def stringOf(e: Expression, fn: String, what: String): String = {
    require(e.foldable, s"$fn: $what must be a literal string")
    e.eval() match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => throw new IllegalArgumentException(s"$fn: $what must be a string, got $other")
    }
  }

  val shingleHashes: FunctionDescription = (
    FunctionIdentifier("graft_shingle_hashes"),
    new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingle_hashes"),
    (args: Seq[Expression]) => {
      require(args.length == 2,
        s"graft_shingle_hashes(norm_text, n) takes 2 arguments, got ${args.length}")
      ShingleHashes(args(0), intOf(args(1), "graft_shingle_hashes"))
    })

  val shingleHashStarts: FunctionDescription = (
    FunctionIdentifier("graft_shingle_hash_starts"),
    new ExpressionInfo(classOf[ShingleHashStarts].getName, "graft_shingle_hash_starts"),
    (args: Seq[Expression]) => {
      require(args.length == 2,
        s"graft_shingle_hash_starts(norm_text, n) takes 2 arguments, got ${args.length}")
      ShingleHashStarts(args(0), intOf(args(1), "graft_shingle_hash_starts"))
    })

  val simhashSketch: FunctionDescription = (
    FunctionIdentifier("graft_simhash_sketch"),
    new ExpressionInfo(classOf[SimHashSketch].getName, "graft_simhash_sketch"),
    (args: Seq[Expression]) => {
      require(args.length == 3,
        s"graft_simhash_sketch(norm_text, n, mode) takes 3 arguments, got ${args.length}")
      SimHashSketch(args(0), intOf(args(1), "graft_simhash_sketch"),
        stringOf(args(2), "graft_simhash_sketch", "mode"))
    })

  val winnowingMins: FunctionDescription = (
    FunctionIdentifier("graft_winnowing_mins"),
    new ExpressionInfo(classOf[WinnowingMins].getName, "graft_winnowing_mins"),
    (args: Seq[Expression]) => {
      require(args.length == 4,
        s"graft_winnowing_mins(text, k, w, mode) takes 4 arguments, got ${args.length}")
      WinnowingMins(args(0), intOf(args(1), "graft_winnowing_mins"),
        intOf(args(2), "graft_winnowing_mins"),
        stringOf(args(3), "graft_winnowing_mins", "mode"))
    })

  private def stringArrayOf(e: Expression, fn: String, what: String): Seq[String] = {
    require(e.foldable, s"$fn: $what must be a literal array<string>")
    e.dataType match {
      case ArrayType(StringType, _) => ()
      case other => throw new IllegalArgumentException(
        s"$fn: $what must be array<string>, got $other")
    }
    val data = e.eval().asInstanceOf[ArrayData]
    (0 until data.numElements()).map { i =>
      // A null element would NPE deep in UTF8String; fail with the
      // same clean plan-time message as the other validations.
      val v = data.getUTF8String(i)
      require(v != null, s"$fn: $what must not contain null elements (element $i is null)")
      v.toString
    }
  }

  private def booleanOf(e: Expression, fn: String, what: String): Boolean = {
    require(e.foldable && e.dataType == org.apache.spark.sql.types.BooleanType,
      s"$fn: $what must be a literal boolean")
    val v = e.eval()
    require(v != null, s"$fn: $what must not be null")
    v.asInstanceOf[Boolean]
  }

  val bpeEncode: FunctionDescription = (
    FunctionIdentifier("graft_bpe_encode"),
    new ExpressionInfo(classOf[BpeEncode].getName, "graft_bpe_encode"),
    (args: Seq[Expression]) => {
      require(args.length == 3 || args.length == 4,
        s"graft_bpe_encode(text, lefts, rights[, byte_level]) takes 3 or 4 arguments, " +
          s"got ${args.length}")
      val lefts = stringArrayOf(args(1), "graft_bpe_encode", "lefts")
      val rights = stringArrayOf(args(2), "graft_bpe_encode", "rights")
      require(lefts.length == rights.length,
        s"graft_bpe_encode: lefts (${lefts.length}) and rights (${rights.length}) " +
          "must pair up rank-for-rank")
      val byteLevel =
        args.length == 4 && booleanOf(args(3), "graft_bpe_encode", "byte_level")
      // rank order = array order: the merge table the caller learned
      BpeEncode(args(0), lefts.zip(rights), byteLevel)
    })

  val htmlStrip: FunctionDescription = (
    FunctionIdentifier("graft_html_strip"),
    new ExpressionInfo(classOf[HtmlStrip].getName, "graft_html_strip"),
    (args: Seq[Expression]) => {
      require(args.length == 1,
        s"graft_html_strip(text) takes 1 argument, got ${args.length}")
      HtmlStrip(args(0))
    })

  val ophSignature: FunctionDescription = (
    FunctionIdentifier("graft_oph_signature"),
    new ExpressionInfo(classOf[OnePermSignature].getName, "graft_oph_signature"),
    (args: Seq[Expression]) => {
      require(args.length == 2,
        s"graft_oph_signature(hashes, k) takes 2 arguments, got ${args.length}")
      OnePermSignature(args(0), intOf(args(1), "graft_oph_signature"))
    })

  def all: Seq[FunctionDescription] =
    Seq(nearestCells, signBucket, cosineSim, shingleHashes, shingleHashStarts,
      simhashSketch, winnowingMins, ophSignature, bpeEncode, htmlStrip)

  /** Register on an already-built session (no extensions config). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
