package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `bar(x, min, max[, width])` — Unicode block-character bar chart cell
  * (reference: extension/core_functions/scalar/string/bar.cpp).
  *
  * Semantics follow the reference exactly:
  *  - width must be finite and in [1, 1000], else the query errors;
  *  - bar length 0 if any of x/min/max is NaN or `x <= min` (note: this
  *    makes min >= max render empty, checked before the fraction), full
  *    if `x >= max`, else `width * (x-min)/(max-min)`;
  *  - the length is truncated to eighths; 1..7 leftover eighths render
  *    the U+2589..U+258F partial block, full eighths the U+2588 block.
  *
  * Padding: by default matches the DuckDB 1.0 oracle, which right-pads
  * with spaces to `int(width)` BYTES (each block char is 3 UTF-8 bytes),
  * so a non-empty bar is shorter than `width` characters. The reference
  * fork later changed this to pad to `int(width)` CHARACTERS
  * (bar.cpp:58-61); set `charPad = true` (or use
  * [[UnicodeBar.barReference]]) for that layout. The two modes agree on
  * the bar itself and differ only in trailing spaces.
  */
case class UnicodeBar(x: Expression, min: Expression, max: Expression,
                      width: Expression, charPad: Boolean = false)
    extends QuaternaryExpression {
  override def prettyName: String = "bar"
  override def dataType: DataType = StringType
  override def first: Expression = x
  override def second: Expression = min
  override def third: Expression = max
  override def fourth: Expression = width

  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    UnicodeBar.render(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double], charPad)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b, c, d) => s"graft.functions.UnicodeBar.render($a, $b, $c, $d, $charPad)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(x = f, min = s, max = t, width = q)
}

object UnicodeBar {
  private final val FullBlock = '█'
  // partial blocks by leftover eighths: 1 -> U+258F (1/8) .. 7 -> U+2589 (7/8)
  private def partial(eighths: Int): Char = (0x2590 - eighths).toChar

  /** Invoked from generated code. `charPad = false` pads the bar to
    * `int(width)` bytes (DuckDB 1.0 / the driver's oracle); `true` pads
    * to `int(width)` characters (the reference fork's bar.cpp:58-61).
    */
  def render(x: Double, min: Double, max: Double, maxWidth: Double,
             charPad: Boolean = false): UTF8String = {
    if (maxWidth.isNaN || maxWidth.isInfinite)
      throw new IllegalArgumentException("Max bar width must not be NaN or infinity")
    if (maxWidth < 1)
      throw new IllegalArgumentException("Max bar width must be >= 1")
    if (maxWidth > 1000)
      throw new IllegalArgumentException("Max bar width must be <= 1000")

    val barWidth =
      if (x.isNaN || min.isNaN || max.isNaN || x <= min) 0.0
      else if (x >= max) maxWidth
      else maxWidth * (x - min) / (max - min)
    if (barWidth.isNaN || barWidth.isInfinite)
      throw new IllegalArgumentException("Bar width must not be NaN or infinity")

    // truncate to eighths (the reference's LossyNumericCast<uint32_t>;
    // barWidth is in [0, 1000] here so the plain cast is exact)
    val units = (barWidth * 8).toInt
    val full = units / 8
    val rem = units % 8
    val used = full + (if (rem > 0) 1 else 0)
    // byte padding (oracle): block chars are 3 UTF-8 bytes each;
    // character padding (reference layout): one column per block
    val pad = math.max(0, maxWidth.toInt - (if (charPad) used else 3 * used))
    val sb = new java.lang.StringBuilder(used + pad)
    var i = 0
    while (i < full) { sb.append(FullBlock); i += 1 }
    if (rem > 0) sb.append(partial(rem))
    i = 0
    while (i < pad) { sb.append(' '); i += 1 }
    UTF8String.fromString(sb.toString)
  }

  /** Smart constructor: casts every child to double (the expression has
    * no access to Spark's private implicit-cast machinery).
    */
  def expr(x: Expression, min: Expression, max: Expression,
           width: Expression): Expression =
    UnicodeBar(Cast(x, DoubleType), Cast(min, DoubleType),
      Cast(max, DoubleType), Cast(width, DoubleType))

  def bar(x: Column, min: Column, max: Column, width: Column): Column =
    bridge.column(expr(bridge.expression(x), bridge.expression(min),
      bridge.expression(max), bridge.expression(width)))

  /** Reference-fork layout: identical bar, padded to `width` CHARACTERS
    * (bar.cpp:58-61) instead of the oracle's `width` bytes.
    */
  def barReference(x: Column, min: Column, max: Column, width: Column): Column =
    bridge.column(UnicodeBar(
      Cast(bridge.expression(x), DoubleType), Cast(bridge.expression(min), DoubleType),
      Cast(bridge.expression(max), DoubleType), Cast(bridge.expression(width), DoubleType),
      charPad = true))
}
