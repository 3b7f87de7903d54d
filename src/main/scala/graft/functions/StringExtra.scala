package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Remaining reference string functions without Spark builtins:
  * strip_accents (/root/reference/src/function/scalar/string/ via
  * utf8proc) and format_bytes
  * (/root/reference/extension/core_functions/scalar/string/format_bytes.cpp).
  */
case class StripAccents(child: Expression) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "strip_accents"
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    // NFD then drop combining marks — utf8proc-equivalent for Latin text
    val norm = Normalizer.normalize(s, Normalizer.Form.NFD)
      .replaceAll("\\p{Mn}+", "")
    UTF8String.fromString(norm)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class FormatBytes(child: Expression) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "format_bytes"
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(FormatBytes.format(v.asInstanceOf[Long]))
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object FormatBytes {
  private val units = Seq("KiB", "MiB", "GiB", "TiB", "PiB", "EiB")
  /** Mirrors the reference: singular "1 byte", binary units, one decimal
    * truncated toward zero (120.5625 KiB → "120.5 KiB", not 120.6).
    */
  def format(n: Long): String = {
    if (n < 1024 && n > -1024) {
      if (n == 1 || n == -1) s"$n byte" else s"$n bytes"
    } else {
      var k = 0
      var scale = 1024.0
      while (k < units.length - 1 && math.abs(n / scale) >= 1024.0) { k += 1; scale *= 1024.0 }
      val v = n / scale
      val truncated = math.floor(math.abs(v) * 10.0) / 10.0 * math.signum(v)
      f"$truncated%.1f ${units(k)}"
    }
  }
}

object StringExtraFunctions {
  def strip_accents(c: Column): Column = bridge.column(StripAccents(bridge.expression(c)))
  def format_bytes(c: Column): Column = bridge.column(FormatBytes(bridge.expression(c)))
}
