package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for vector search against a fixed
  * coefficient matrix (k-means centroids, LSH hyperplanes).
  *
  * Why expressions and not unrolled column arithmetic: an argmax over
  * k centroids × d dims unrolled into `vec(0)·w00 + …` literals is a
  * 2·k·d-node expression tree. That tree (a) takes seconds of janino
  * compile time PER DISTINCT PLAN — k-means recompiled it every
  * iteration — and (b) serializes into a multi-megabyte task binary
  * that every task deserializes, a fixed cost that multiplying
  * partitions multiplies. Here the matrix rides along as a reference
  * object (compact kryo/java serialization, shared per task binary)
  * and `doGenCode` emits a LOOP over it: the generated source is a few
  * lines, identical across iterations (so the codegen cache hits), and
  * the per-row cost is a tight primitive loop — faster than both the
  * unrolled form and any higher-order-function formulation (~µs per
  * element-step, interpreted).
  *
  * Both expressions accept `array<float>` or `array<double>` input and
  * treat a vector shorter than a matrix row as zero-padded. Array
  * elements must be non-null (embedding columns; not enforced).
  */
private[graft] trait MatrixDotExpression extends UnaryExpression {

  /** Row-major coefficient matrix. */
  def matrix: Array[Array[Double]]

  protected lazy val elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${getClass.getSimpleName} needs array<float> or array<double> input, got $other")
  }

  /** All row·vec dot products, interpreted path. */
  protected def dots(input: Any): Array[Double] = {
    val a = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val len = a.numElements()
    val out = new Array[Double](matrix.length)
    var c = 0
    while (c < matrix.length) {
      val row = matrix(c)
      val d0 = math.min(row.length, len)
      var s = 0.0
      var d = 0
      while (d < d0) {
        s += row(d) * (if (elemIsFloat) a.getFloat(d) else a.getDouble(d))
        d += 1
      }
      out(c) = s
      c += 1
    }
    out
  }

  /** Shared codegen prelude: declares `$dotsVar` = double[k] of dot
    * products of `childVar` against the reference matrix. */
  protected def dotsCode(ctx: CodegenContext, childVar: String, dotsVar: String): String = {
    val m = ctx.addReferenceObj("matrix", matrix, "double[][]")
    val getter = if (elemIsFloat) "getFloat" else "getDouble"
    val mv = ctx.freshName("M")
    val c = ctx.freshName("c")
    val d = ctx.freshName("d")
    val d0 = ctx.freshName("d0")
    val s = ctx.freshName("s")
    val len = ctx.freshName("len")
    val rowVar = ctx.freshName("matRow")
    s"""
       |double[][] $mv = $m;
       |final int $len = $childVar.numElements();
       |final double[] $dotsVar = new double[$mv.length];
       |for (int $c = 0; $c < $mv.length; $c++) {
       |  final double[] $rowVar = $mv[$c];
       |  final int $d0 = $rowVar.length < $len ? $rowVar.length : $len;
       |  double $s = 0.0;
       |  for (int $d = 0; $d < $d0; $d++) { $s += $rowVar[$d] * $childVar.$getter($d); }
       |  $dotsVar[$c] = $s;
       |}
     """.stripMargin
  }
}

/** Indices of the `n` matrix rows with the highest dot product against
  * the input vector, best first; ties break to the lowest row index
  * (matching `array_position(scores, array_max(scores))` and the
  * `sort_array(struct(-dot, idx))` formulations it replaces). */
case class NearestCells(child: Expression, matrix: Array[Array[Double]], n: Int)
    extends MatrixDotExpression {
  require(n >= 1 && n <= matrix.length, s"n=$n out of range 1..${matrix.length}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val dv = dots(input)
    val used = new Array[Boolean](dv.length)
    val out = new Array[Int](n)
    var j = 0
    while (j < n) {
      var bi = -1
      var bv = 0.0
      var c = 0
      while (c < dv.length) {
        if (!used(c) && (bi < 0 || dv(c) > bv)) { bi = c; bv = dv(c) }
        c += 1
      }
      used(bi) = true
      out(j) = bi
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, childVar => {
      val dotsVar = ctx.freshName("dots")
      val used = ctx.freshName("used")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val bi = ctx.freshName("bi")
      val bv = ctx.freshName("bv")
      s"""
         |${dotsCode(ctx, childVar, dotsVar)}
         |final boolean[] $used = new boolean[$dotsVar.length];
         |final int[] $out = new int[$n];
         |for (int $j = 0; $j < $n; $j++) {
         |  int $bi = -1; double $bv = 0.0;
         |  for (int $c = 0; $c < $dotsVar.length; $c++) {
         |    if (!$used[$c] && ($bi < 0 || $dotsVar[$c] > $bv)) { $bi = $c; $bv = $dotsVar[$c]; }
         |  }
         |  $used[$bi] = true; $out[$j] = $bi;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)

  override def prettyName: String = "nearest_cells"
}

/** All row·vec dot products against the reference matrix, as
  * array<double> — the dense mat-vec primitive ([[NearestCells]]
  * without the argmax): random-projection dimensionality reduction
  * (matrix = scaled Gaussian rows), batch centroid scoring, any
  * fixed-basis transform. Same loop-codegen/reference-object design
  * as the siblings. */
case class MatrixDots(child: Expression, matrix: Array[Array[Double]])
    extends MatrixDotExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(input: Any): Any = new GenericArrayData(dots(input))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, childVar => {
      val dotsVar = ctx.freshName("dots")
      s"""
         |${dotsCode(ctx, childVar, dotsVar)}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($dotsVar);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MatrixDots =
    copy(child = newChild)

  override def prettyName: String = "matrix_dots"
}

/** Sign-bucket id of the input vector against hyperplane rows: bit i
  * is set iff vec · matrix(i) > 0 (strict). At most 31 planes. */
case class SignBucketExpr(child: Expression, matrix: Array[Array[Double]])
    extends MatrixDotExpression {
  require(matrix.length <= 31, s"at most 31 planes, got ${matrix.length}")

  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any = {
    val dv = dots(input)
    var b = 0
    var c = 0
    while (c < dv.length) {
      if (dv(c) > 0) b |= (1 << c)
      c += 1
    }
    b
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, childVar => {
      val dotsVar = ctx.freshName("dots")
      val b = ctx.freshName("b")
      val c = ctx.freshName("c")
      s"""
         |${dotsCode(ctx, childVar, dotsVar)}
         |int $b = 0;
         |for (int $c = 0; $c < $dotsVar.length; $c++) {
         |  if ($dotsVar[$c] > 0) { $b |= (1 << $c); }
         |}
         |${ev.value} = $b;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignBucketExpr =
    copy(child = newChild)

  override def prettyName: String = "sign_bucket"
}

/** Cosine similarity of two vector columns in ONE fused primitive loop
  * (dot product and both squared norms accumulated together), value-
  * identical to the higher-order-function formulation it replaces —
  * `aggregate(zip_with(a,b,_*_))/(sqrt(aggregate(a²))*sqrt(aggregate(b²)))`
  * — which walks each pair of arrays three times through interpreted
  * lambdas and allocates the zipped array. Null semantics match the
  * HOF form throughout: vectors of different lengths yield null
  * (zip_with's null padding), a null ELEMENT on either side yields
  * null (null propagates through the lambda products and sums), and a
  * zero divisor yields null (Spark's Divide). Element null checks are
  * skipped entirely when both array types declare containsNull=false.
  * Accepts any numeric element type, cast to double per element like
  * the HOF form. */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def primitiveNumeric(t: DataType): Boolean = t match {
    case FloatType | DoubleType | IntegerType | LongType | ShortType | ByteType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(le, _), ArrayType(re, _)) if primitiveNumeric(le) && primitiveNumeric(re) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cosine_sim needs two array<primitive numeric> inputs, got $other")
  }

  private def getterName(t: DataType): String = t match {
    case FloatType => "getFloat"
    case DoubleType => "getDouble"
    case IntegerType => "getInt"
    case LongType => "getLong"
    case ShortType => "getShort"
    case ByteType => "getByte"
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  private lazy val leftType = left.dataType.asInstanceOf[ArrayType]
  private lazy val rightType = right.dataType.asInstanceOf[ArrayType]
  private lazy val anyElementNullable = leftType.containsNull || rightType.containsNull

  private def elem(
      a: org.apache.spark.sql.catalyst.util.ArrayData, t: DataType, i: Int): Double =
    t match {
      case FloatType => a.getFloat(i).toDouble
      case DoubleType => a.getDouble(i)
      case IntegerType => a.getInt(i).toDouble
      case LongType => a.getLong(i).toDouble
      case ShortType => a.getShort(i).toDouble
      case ByteType => a.getByte(i).toDouble
      case other => throw new IllegalStateException(s"unsupported element type $other")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val b = r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) null
    else {
      var dot = 0.0
      var na = 0.0
      var nb = 0.0
      var i = 0
      while (i < n) {
        if (anyElementNullable && (a.isNullAt(i) || b.isNullAt(i))) return null
        val x = elem(a, leftType.elementType, i)
        val y = elem(b, rightType.elementType, i)
        dot += x * y
        na += x * x
        nb += y * y
        i += 1
      }
      // Spark's Divide yields null on a zero divisor (all numeric
      // types, non-ANSI) — mirror it for zero-norm/empty vectors.
      val div = math.sqrt(na) * math.sqrt(nb)
      if (div == 0.0) null else dot / div
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (aVar, bVar) => {
      val lGet = getterName(leftType.elementType)
      val rGet = getterName(rightType.elementType)
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val div = ctx.freshName("div")
      val nullCheck =
        if (anyElementNullable)
          s"if ($aVar.isNullAt($i) || $bVar.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |final int $n = $aVar.numElements();
         |if ($n != $bVar.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    final double $x = (double) $aVar.$lGet($i);
         |    final double $y = (double) $bVar.$rGet($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    final double $div = Math.sqrt($na) * Math.sqrt($nb);
         |    if ($div == 0.0) { ${ev.isNull} = true; } else { ${ev.value} = $dot / $div; }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}
