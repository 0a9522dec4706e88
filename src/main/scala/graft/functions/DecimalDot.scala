package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native decimal-exact dot product of two float arrays — the codegen'd
  * form of the `aggregate(zip_with(...))` recipe in VectorQueries:
  * per-element double product → DECIMAL(18,8) quantization (HALF_UP, the
  * same rounding Spark's double→decimal cast applies) → exact integer
  * accumulation → one correctly-rounded double.
  *
  * Why a custom Expression (SURVEY.md §2.12 / prompt preference order):
  * higher-order functions evaluate one Catalyst expression tree PER
  * ELEMENT — lambda dispatch, Decimal boxing, precision checks on every
  * addend. This expression runs the identical arithmetic as a fused
  * long-arithmetic loop inside whole-stage codegen (`doGenCode`), with an
  * interpreted `nullSafeEval` twin for non-codegen paths. Bit-equality
  * with the HOF form (and therefore with the DuckDB oracle) is pinned by
  * DecimalDotSpec and the driver's correctness gate on all five vector
  * queries.
  *
  * Exactness argument: quantized addends are scale-8 integers ≤ ~10⁹ for
  * unit-magnitude embeddings, so a 64-bit accumulator is exact
  * (`longValueExact` throws loudly if a pathological input overflows a
  * single addend — same surface-don't-corrupt convention as util.Exact);
  * the final BigDecimal(sum, 8).doubleValue() is one correctly-rounded
  * conversion, valid while |sum| < 2⁵³. A null array OR a null element
  * nulls the result — identical to the HOF chain, where a null addend
  * nulls the fold.
  */
case class DecimalDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"decimal_dot requires two array<float|double> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "decimal_dot"

  // element type is fixed at bind time: float arrays widen to double, double
  // arrays (trained centroids) are read as-is — the quantized addend set is
  // identical to the oracle's SUM(CAST(a*b AS DECIMAL)) either way
  private lazy val leftIsFloat = DecimalDot.isFloatArray(left.dataType)
  private lazy val rightIsFloat = DecimalDot.isFloatArray(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      sum += DecimalDot.quantize8(xv * yv)
      i += 1
    }
    new java.math.BigDecimal(java.math.BigInteger.valueOf(sum), 8).doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      val p = ctx.freshName("p")
      val getX = DecimalDot.elemCode(x, i, leftIsFloat)
      val getY = DecimalDot.elemCode(y, i, rightIsFloat)
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $sum = 0L;
         |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |  if ($x.isNullAt($i) || $y.isNullAt($i)) {
         |    ${ev.isNull} = true;
         |  } else {
         |    double $p = $getX * $getY;
         |    $sum += graft.functions.DecimalDot.quantize8($p);
         |  }
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = new java.math.BigDecimal(
         |    java.math.BigInteger.valueOf($sum), 8).doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecimalDot =
    copy(left = newLeft, right = newRight)
}

/** Plain double-fold dot product — the native form of
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, (acc,v) -> acc+v)`:
  * the SAME left-to-right accumulation order, so results are bit-identical
  * to the HOF fold (used for the pre-screen passes, where a documented
  * error margin — not exactness — carries correctness; identical results
  * keep those margins reproducible). Null array or null element → null,
  * like the HOF fold. */
case class DoubleDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"double_dot requires two array<float|double> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "double_dot"

  private lazy val leftIsFloat = DecimalDot.isFloatArray(left.dataType)
  private lazy val rightIsFloat = DecimalDot.isFloatArray(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val getX = DecimalDot.elemCode(x, i, leftIsFloat)
      val getY = DecimalDot.elemCode(y, i, rightIsFloat)
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |  if ($x.isNullAt($i) || $y.isNullAt($i)) {
         |    ${ev.isNull} = true;
         |  } else {
         |    $acc += $getX * $getY;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleDot =
    copy(left = newLeft, right = newRight)
}

/** IEEE-754 bit pattern of a double as a long (`Double.doubleToLongBits`,
  * canonical NaN). The building block of order-preserving bit-prefix
  * bucketing (ops.Quantiles): for non-negative doubles the bit pattern is
  * monotone in the value, and flipping the low 63 bits of negatives makes
  * the SIGNED long order match the double order end to end — so a
  * histogram keyed on a bit prefix needs NO min/max pre-pass, unlike an
  * affine [min, max] grid. Codegen is a single intrinsic call. */
case class DoubleBits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"double_bits requires a double argument, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "double_bits"

  override def nullSafeEval(input: Any): Any =
    java.lang.Double.doubleToLongBits(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Double.doubleToLongBits($c)")

  override protected def withNewChildInternal(newChild: Expression): DoubleBits =
    copy(child = newChild)
}

object DecimalDot {

  private[functions] def isFloatArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  private[functions] def elemCode(arr: String, i: String, isFloat: Boolean): String =
    if (isFloat) s"((double) $arr.getFloat($i))" else s"$arr.getDouble($i)"

  /** HALF_UP quantization of a double to a scale-8 unscaled long — the
    * exact value `BigDecimal.valueOf(p).setScale(8, HALF_UP)` produces,
    * computed allocation-free on the fast path. The fast path is valid
    * when |p·10⁸| is (a) far enough from a .5 rounding boundary that the
    * multiply's ≤ ~2⁻⁵²·|scaled| error AND the shortest-string-vs-binary
    * gap (BigDecimal.valueOf rounds the shortest decimal rendering, which
    * differs from the binary value by < ½ ulp) cannot cross the boundary
    * — the 10⁻³ guard is ~10² × the worst case at the 4.5·10¹⁵ cap — and
    * (b) small enough that doubles still represent integers exactly.
    * Anything near a boundary or huge falls back to BigDecimal, so every
    * input returns the reference value bit-for-bit (pinned by
    * DecimalDotSpec's boundary cases). */
  def quantize8(p: Double): Long = {
    val scaled = p * 1e8
    val absS = math.abs(scaled)
    if (absS < 4.5e15) {
      val fl = math.floor(absS)
      val frac = absS - fl
      if (math.abs(frac - 0.5) > 1e-3) {
        val q = if (frac > 0.5) fl + 1 else fl
        if (p < 0) -q.toLong else q.toLong
      } else quantize8Slow(p)
    } else quantize8Slow(p)
  }

  private def quantize8Slow(p: Double): Long =
    java.math.BigDecimal.valueOf(p)
      .setScale(8, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()
  /** Register `decimal_dot` + `double_dot` as session temp functions so
    * `expr(...)` / SQL strings can call them (Sessions.local does this for
    * every engine-created session). */
  /** Kept as the historical entry point; the function list itself lives
    * in [[GraftFunctions.all]] (one list, two registration surfaces —
    * this imperative one and graft.GraftExtensions' injection). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftFunctions.register(spark)
}
