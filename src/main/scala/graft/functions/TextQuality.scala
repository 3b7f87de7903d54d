package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text-quality counters — the fused replacement for the two
  * full-text `regexp_replace` materializations + three `split`s the
  * quality metrics otherwise cost (operators/TextAnalysis.quality).
  *
  * One scan over the UTF-8 bytes yields every ingredient of the
  * alpha/stopword/word-length ratios:
  *  - `chars`     = code points (== Spark `length`)
  *  - `ws_words`  = Java `split("\\s+", -1)` element count: maximal
  *                  ASCII-whitespace runs + 1 (leading/trailing empties
  *                  kept, exactly the built-in split semantics)
  *  - `az`        = [a-z] byte count (== length after regexp_replace
  *                  `[^a-z]` → '')
  *  - `spaces`    = ' ' count (space-split tokens = spaces + 1; chars
  *                  minus spaces == length after replacing ' ' with '')
  *  - `stop_hits` = space-split tokens equal to an English stopword
  *
  * The ratio arithmetic stays in Column expressions over these counts so
  * division/rounding semantics are bit-identical to the unfused form.
  * Same single-pass trick as [[TokenizerKernel]]; reference analog: the
  * reference engine evaluates its regexps via RE2 without materializing
  * replacement strings when only a length is needed.
  */
object TextQualityKernel {

  /** English stopwords, as in TextAnalysis.stopwords("en") — the set the
    * quality metric votes against (ASCII, compared byte-wise). */
  private val stopwordsEn: Array[Array[Byte]] =
    Array("the", "a", "and", "of", "to", "in", "is", "it", "that", "for")
      .map(_.getBytes("US-ASCII"))

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  private def isStopword(s: UTF8String, from: Int, to: Int): Boolean = {
    val len = to - from
    var w = 0
    while (w < stopwordsEn.length) {
      val sw = stopwordsEn(w)
      if (sw.length == len) {
        var i = 0
        while (i < len && s.getByte(from + i) == sw(i)) i += 1
        if (i == len) return true
      }
      w += 1
    }
    false
  }

  def counts(s: UTF8String): InternalRow = {
    val n = s.numBytes
    var chars = 0L
    var az = 0L
    var spaces = 0L
    var wsRuns = 0L
    var stopHits = 0L
    var inWs = false
    var tokStart = 0
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if ((b & 0xC0) != 0x80) chars += 1
      if (b >= 'a' && b <= 'z') az += 1
      if (isWs(b)) {
        if (!inWs) { wsRuns += 1; inWs = true }
      } else inWs = false
      if (b == ' ') {
        spaces += 1
        if (isStopword(s, tokStart, i)) stopHits += 1
        tokStart = i + 1
      }
      i += 1
    }
    if (isStopword(s, tokStart, n)) stopHits += 1
    new GenericInternalRow(Array[Any](chars, wsRuns + 1, az, spaces, stopHits))
  }
}

/** `text_quality_counts(text)` → struct of the five counters above.
  * Codegen-friendly (a static kernel call); projected fields share one
  * evaluation via whole-stage codegen's subexpression elimination.
  */
case class TextQualityCounts(child: Expression) extends UnaryExpression {
  override def prettyName: String = "text_quality_counts"
  override def dataType: DataType = StructType(Seq(
    StructField("chars", LongType, nullable = false),
    StructField("ws_words", LongType, nullable = false),
    StructField("az", LongType, nullable = false),
    StructField("spaces", LongType, nullable = false),
    StructField("stop_hits", LongType, nullable = false)))

  override def nullSafeEval(v: Any): Any =
    TextQualityKernel.counts(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextQualityKernel.counts($s)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
