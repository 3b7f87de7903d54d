package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Vector-distance expressions over `ArrayType(FloatType|DoubleType)` —
  * the reference's `list_distance` / `list_inner_product` /
  * `list_cosine_similarity`
  * (/root/reference/extension/core_functions/scalar/list/list_distance.cpp).
  *
  * Spark has no builtin vector math (SURVEY.md §2.8 gap); a lambda
  * (`zip_with` + `aggregate`) works but allocates per row. These are
  * native codegen'd expressions: a tight primitive loop with no boxing,
  * staying inside whole-stage codegen — the hot path for embedding
  * similarity search at scale.
  *
  * Precision contract: float inputs are accumulated in float32, exactly
  * like the reference (its FLOAT[] kernels run entirely in float), so
  * results are comparable bit-for-bit-ish across engines; double inputs
  * accumulate in double.
  */
abstract class VectorBinaryExpression extends BinaryExpression{

  protected def isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = if (isFloat) FloatType else DoubleType

  override def nullable: Boolean = true

  /** (accumulator declarations, loop body, result expression) as Java
    * source, parametrized by float/double type `t`.
    */
  protected def loopJava(t: String): (String, String, String)

  protected def evalFloat(a: ArrayData, b: ArrayData, n: Int): Float
  protected def evalDouble(a: ArrayData, b: ArrayData, n: Int): Double

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) null
    else if (isFloat) evalFloat(a, b, n)
    else evalDouble(a, b, n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = if (isFloat) "float" else "double"
    val getter = if (isFloat) "getFloat" else "getDouble"
    val (decls, body, res) = loopJava(t)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val declsR = decls.replace("$x", x).replace("$y", y)
      val bodyR = body.replace("$x", x).replace("$y", y)
      val resR = res.replace("$x", x).replace("$y", y)
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  $declsR
         |  for (int $i = 0; $i < $n; $i++) {
         |    $t $x = $a.$getter($i);
         |    $t $y = $b.$getter($i);
         |    $bodyR
         |  }
         |  ${ev.value} = $resR;
         |}
       """.stripMargin
    })
  }
}

/** sum(a[i]*b[i]) — reference: list_inner_product. */
case class InnerProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "inner_product"
  override protected def loopJava(t: String): (String, String, String) =
    (s"$t _dot = 0;", "_dot += $x * $y;", "_dot")
  override protected def evalFloat(a: ArrayData, b: ArrayData, n: Int): Float = {
    var dot = 0.0f; var i = 0
    while (i < n) { dot += a.getFloat(i) * b.getFloat(i); i += 1 }
    dot
  }
  override protected def evalDouble(a: ArrayData, b: ArrayData, n: Int): Double = {
    var dot = 0.0; var i = 0
    while (i < n) { dot += a.getDouble(i) * b.getDouble(i); i += 1 }
    dot
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** dot(a,b) / sqrt(|a|²·|b|²) — reference: list_cosine_similarity. */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "cosine_similarity"
  override protected def loopJava(t: String): (String, String, String) =
    (s"$t _dot = 0; $t _na = 0; $t _nb = 0;",
      "_dot += $x * $y; _na += $x * $x; _nb += $y * $y;",
      s"($t)(_dot / Math.sqrt((double)_na * (double)_nb))")
  override protected def evalFloat(a: ArrayData, b: ArrayData, n: Int): Float = {
    var dot = 0.0f; var na = 0.0f; var nb = 0.0f; var i = 0
    while (i < n) {
      val x = a.getFloat(i); val y = b.getFloat(i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    (dot / math.sqrt(na.toDouble * nb.toDouble)).toFloat
  }
  override protected def evalDouble(a: ArrayData, b: ArrayData, n: Int): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / math.sqrt(na * nb)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** sqrt(sum((a[i]-b[i])²)) — reference: list_distance (euclidean). */
case class L2Distance(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "l2_distance"
  override protected def loopJava(t: String): (String, String, String) =
    (s"$t _s = 0;", s"$t _d = $$x - $$y; _s += _d * _d;",
      s"($t)Math.sqrt((double)_s)")
  override protected def evalFloat(a: ArrayData, b: ArrayData, n: Int): Float = {
    var s = 0.0f; var i = 0
    while (i < n) { val d = a.getFloat(i) - b.getFloat(i); s += d * d; i += 1 }
    math.sqrt(s.toDouble).toFloat
  }
  override protected def evalDouble(a: ArrayData, b: ArrayData, n: Int): Double = {
    var s = 0.0; var i = 0
    while (i < n) { val d = a.getDouble(i) - b.getDouble(i); s += d * d; i += 1 }
    math.sqrt(s)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

object VectorFunctions {
  private def c(f: (Expression, Expression) => Expression)(a: Column, b: Column): Column =
    bridge.column(f(bridge.expression(a), bridge.expression(b)))
  def inner_product(a: Column, b: Column): Column = c(InnerProduct)(a, b)
  def cosine_similarity(a: Column, b: Column): Column = c(CosineSimilarity)(a, b)
  def l2_distance(a: Column, b: Column): Column = c(L2Distance)(a, b)
}
