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

/** Count of non-overlapping regex matches — the token-counting kernel
  * (reference: the counting path of regexp_matches in
  * /root/reference/src/function/scalar/string/regexp.cpp). Spark's only
  * stock route is size(regexp_extract_all(..)), which materializes EVERY
  * match as a string just to count them — on a token-per-3-chars corpus
  * that is millions of allocations per scan. Counting on the matcher
  * allocates nothing per row, and real codegen (not CodegenFallback)
  * keeps the enclosing scan inside whole-stage codegen. The pattern must
  * fold to a literal — compiled once at plan time.
  */
case class RegexpCount(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "regexp_count"
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType != StringType || right.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"$prettyName requires (string, string)")
    else if (!right.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"$prettyName pattern must be a literal")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val compiled: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(
      right.eval(null).asInstanceOf[UTF8String].toString)

  override def nullSafeEval(s: Any, p: Any): Any =
    RegexpCount.count(compiled, s.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val patRef = ctx.addReferenceObj("pattern", compiled,
      "java.util.regex.Pattern")
    nullSafeCodeGen(ctx, ev, (s, _) =>
      s"${ev.value} = graft.functions.RegexpCount.count($patRef, $s);")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(l, r)
}

object RegexpCount {
  def count(p: java.util.regex.Pattern, s: UTF8String): Long = {
    val m = p.matcher(s.toString)
    var c = 0L
    while (m.find()) c += 1
    c
  }
}

/** Single-pass tokenizer counters over raw UTF-8 bytes — the hot kernels
  * of the text-analysis family. Semantically these are the two regex
  * counts `size(split(s, '\s+'))` and
  * `count of [a-z]+|[0-9]|[^a-z0-9\s]` (the BPE-ish token classes), but
  * a tokenizer is a scan, not a backtracking-regex loop: java.util.regex
  * runs ~100x slower per char on the alternation than one branchy byte
  * pass, and no real engine tokenizes through its regex machinery.
  * Correct on multi-byte input: whitespace and the token classes are
  * ASCII, and other code points count once via lead-byte detection.
  */
object TokenizerKernel {
  private def isWs(b: Byte): Boolean =
    b == ' '.toByte || b == '\t'.toByte || b == '\n'.toByte ||
      b == '\r'.toByte || b == '\f'.toByte || b == 0x0B.toByte

  /** Whitespace-delimited element count, ≡ size(split(s, "\\s+")) with
    * Spark's limit=-1 semantics: every separator match adds exactly one
    * element (the separator can't match empty), so count = runs + 1.
    */
  def wsTokens(s: UTF8String): Long = {
    val n = s.numBytes
    var i = 0
    var runs = 0L
    var inRun = false
    while (i < n) {
      if (isWs(s.getByte(i))) {
        if (!inRun) { runs += 1; inRun = true }
      } else inRun = false
      i += 1
    }
    runs + 1
  }

  /** BPE-ish token count: lowercase-letter RUNS + single digits + every
    * other non-whitespace code point, ≡ counting matches of
    * `[a-z]+|[0-9]|[^a-z0-9\s]`.
    */
  def bpeTokens(s: UTF8String): Long = {
    val n = s.numBytes
    var i = 0
    var c = 0L
    var inAlpha = false
    while (i < n) {
      val b = s.getByte(i)
      if (b >= 'a' && b <= 'z') {
        if (!inAlpha) { c += 1; inAlpha = true }
      } else {
        inAlpha = false
        if (b >= '0' && b <= '9') c += 1
        // one per code point: UTF-8 continuation bytes don't count
        else if (!isWs(b) && (b & 0xC0) != 0x80) c += 1
      }
      i += 1
    }
    c
  }
}

abstract class TokenizerCountExpression extends UnaryExpression {
  override def dataType: DataType = LongType
  protected def kernel: String // static method name on TokenizerKernel

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.TokenizerKernel.$kernel($s)")
}

case class WsTokenCount(child: Expression) extends TokenizerCountExpression {
  override def prettyName: String = "ws_token_count"
  override protected def kernel: String = "wsTokens"
  override def nullSafeEval(v: Any): Any =
    TokenizerKernel.wsTokens(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class BpeTokenCount(child: Expression) extends TokenizerCountExpression {
  override def prettyName: String = "bpe_token_count"
  override protected def kernel: String = "bpeTokens"
  override def nullSafeEval(v: Any): Any =
    TokenizerKernel.bpeTokens(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object StringExtraFunctions {
  def strip_accents(c: Column): Column = bridge.column(StripAccents(bridge.expression(c)))
  def format_bytes(c: Column): Column = bridge.column(FormatBytes(bridge.expression(c)))
  def regexp_count(s: Column, pattern: Column): Column =
    bridge.column(RegexpCount(bridge.expression(s), bridge.expression(pattern)))
  def ws_token_count(s: Column): Column = bridge.column(WsTokenCount(bridge.expression(s)))
  def bpe_token_count(s: Column): Column = bridge.column(BpeTokenCount(bridge.expression(s)))
}
