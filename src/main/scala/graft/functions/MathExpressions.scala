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

object MathFunctions {
  def even(c: Column): Column = bridge.column(EvenCeil(bridge.expression(c)))
  def gcd(a: Column, b: Column): Column =
    bridge.column(Gcd(bridge.expression(a), bridge.expression(b)))
  def lcm(a: Column, b: Column): Column =
    bridge.column(Lcm(bridge.expression(a), bridge.expression(b)))
}
