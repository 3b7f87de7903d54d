package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Math functions the reference registers that Spark lacks
  * (/root/reference/extension/core_functions/scalar/math/numeric.cpp):
  * even (round away from zero to the next even integer), gcd, lcm.
  * All codegen'd — single-expression arithmetic.
  */
case class EvenCeil(child: Expression) extends UnaryExpression {
  override def prettyName: String = "even"
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[Double]
    val r = if (x >= 0) math.ceil(x) else math.floor(x)
    if (r % 2 != 0) r + math.signum(if (r == 0) x else r) else r
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x =>
      s"""graft.functions.EvenCeil.even($x)""")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object EvenCeil {
  /** Invoked from generated code. */
  def even(x: Double): Double = {
    val r = if (x >= 0) math.ceil(x) else math.floor(x)
    if (r % 2 != 0) r + math.signum(if (r == 0) x else r) else r
  }
}

case class Gcd(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "gcd"
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    Gcd.gcd(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Gcd.gcd($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

object Gcd {
  def gcd(a0: Long, b0: Long): Long = {
    var a = math.abs(a0); var b = math.abs(b0)
    while (b != 0) { val t = a % b; a = b; b = t }
    a
  }
}

case class Lcm(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "lcm"
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    Lcm.lcm(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Lcm.lcm($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

object Lcm {
  def lcm(a: Long, b: Long): Long =
    if (a == 0 || b == 0) 0 else math.abs(a / Gcd.gcd(a, b) * b)
}

/** gamma(x) via the Lanczos approximation (g=7, 9 terms — the standard
  * public-domain coefficient set); relative error ~1e-14, matching the
  * reference's libm `tgamma` to well past the 6 decimals the oracle
  * rounds to. Reflection formula covers x < 0.5.
  */
case class Gamma(child: Expression) extends UnaryExpression {
  override def prettyName: String = "gamma"
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any = Gamma.gamma(v.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.Gamma.gamma($x)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object Gamma {
  private val g = 7.0
  private[functions] val coef = Array(
    0.99999999999980993, 676.5203681218851, -1259.1392167224028,
    771.32342877765313, -176.61502916214059, 12.507343278686905,
    -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)

  def gamma(x: Double): Double =
    if (x < 0.5) math.Pi / (math.sin(math.Pi * x) * gamma(1 - x))
    else {
      val xx = x - 1; val t = xx + g + 0.5
      var a = coef(0); var i = 1
      while (i < 9) { a += coef(i) / (xx + i); i += 1 }
      math.sqrt(2 * math.Pi) * math.pow(t, xx + 0.5) * math.exp(-t) * a
    }

  def lgamma(x: Double): Double =
    if (x < 0.5) math.log(math.Pi / math.abs(math.sin(math.Pi * x))) - lgamma(1 - x)
    else {
      val xx = x - 1; val t = xx + g + 0.5
      var a = coef(0); var i = 1
      while (i < 9) { a += coef(i) / (xx + i); i += 1 }
      0.5 * math.log(2 * math.Pi) + (xx + 0.5) * math.log(t) - t + math.log(a)
    }
}

case class LGamma(child: Expression) extends UnaryExpression {
  override def prettyName: String = "lgamma"
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any = Gamma.lgamma(v.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.Gamma.lgamma($x)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** IEEE-754 nextafter — `Math.nextAfter` IS the C function, so values
  * match the reference bit-for-bit.
  */
case class NextAfter(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "nextafter"
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    Math.nextAfter(a.asInstanceOf[Double], b.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Math.nextAfter($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

object MathFunctions {
  def even(c: Column): Column = bridge.column(EvenCeil(bridge.expression(c)))
  def gcd(a: Column, b: Column): Column =
    bridge.column(Gcd(bridge.expression(a), bridge.expression(b)))
  def lcm(a: Column, b: Column): Column =
    bridge.column(Lcm(bridge.expression(a), bridge.expression(b)))
  def gamma(c: Column): Column = bridge.column(Gamma(bridge.expression(c)))
  def lgamma(c: Column): Column = bridge.column(LGamma(bridge.expression(c)))
  def nextafter(a: Column, b: Column): Column =
    bridge.column(NextAfter(bridge.expression(a), bridge.expression(b)))
}
