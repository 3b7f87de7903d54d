package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Grapheme-cluster length — the reference's `length()` counts grapheme
  * clusters (/root/reference/src/function/scalar/string/length.cpp,
  * `length_grapheme`), while Spark's `length()` counts code points, so
  * "e" + COMBINING ACUTE is 1 there and 2 here. Spark-side parity is this
  * explicit `grapheme_length`; the engine keeps Spark's `length`
  * untouched (documented divergence, COVERAGE.md §2.8). Codegen'd via a
  * static helper on java.text.BreakIterator (character instance — the
  * same user-perceived-character boundary ICU uses).
  */
case class GraphemeLength(child: Expression) extends UnaryExpression {
  override def prettyName: String = "grapheme_length"
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    GraphemeLength.count(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.GraphemeLength.count($s)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Unicode NFC normalization (reference: utf8proc-backed nfc_normalize,
  * extension/core_functions/scalar/string/ — both implement the same
  * Unicode normalization form, so outputs match exactly).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def prettyName: String = "nfc_normalize"
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def nullSafeEval(v: Any): Any =
    NfcNormalize.nfc(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.NfcNormalize.nfc($s)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object NfcNormalize {
  /** Invoked from generated code. */
  def nfc(s: UTF8String): UTF8String =
    UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))

  def nfc_normalize(c: Column): Column =
    bridge.column(NfcNormalize(bridge.expression(c)))
}

object GraphemeLength {
  /** Invoked from generated code. */
  def count(s: UTF8String): Int = {
    val it = java.text.BreakIterator.getCharacterInstance(java.util.Locale.ROOT)
    it.setText(s.toString)
    var n = 0
    while (it.next() != java.text.BreakIterator.DONE) n += 1
    n
  }

  def grapheme_length(c: Column): Column =
    bridge.column(GraphemeLength(bridge.expression(c)))
}
