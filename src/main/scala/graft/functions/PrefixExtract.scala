package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Literal-prefix regex extraction fast path.
  *
  * `regexp_extract(s, 'literal([class]+)', 1)` — a literal prefix
  * followed by one greedy character-class capture, the dominant
  * log/JSON-field extraction shape (ClickBench q29 form) — needs no
  * backtracking engine: find the prefix (byte search), take the maximal
  * class run after it. java.util.regex runs this at ~600 ns/row; the
  * kernel at ~tens of ns. The same required-prefix optimization RE2
  * applies internally (reference: the reference engine's RE2-backed
  * regexp_extract, extension/core_functions' regexp functions); here it
  * is a planner rewrite ([[graft.rules.FastRegexpExtract]]) because the
  * JVM's regex engine has no such pass.
  *
  * Semantics are exactly `Matcher.find` + `group(1)`: scan for each
  * prefix occurrence (advancing one position past a failed candidate,
  * as the regex engine does), first occurrence followed by ≥1 class
  * byte wins, greedy run; no match → empty string, NULL input → NULL.
  * ASCII-only pattern (enforced at compile) makes byte-level search
  * exact on multi-byte input: UTF-8 continuation bytes (≥ 0x80) can
  * match neither the prefix nor the class.
  */
object PrefixExtractKernel {

  /** Parse `prefix([class]+)` (whole pattern). Returns (prefix bytes,
    * 128-entry class membership) or None when the pattern is outside
    * the supported surface — negated classes, alternation, suffixes,
    * non-ASCII, anything needing a real engine.
    */
  def compile(pattern: String): Option[(Array[Byte], Array[Boolean])] = {
    val n = pattern.length
    val prefix = new StringBuilder
    var i = 0
    // literal prefix: plain ASCII chars + escaped metachars
    while (i < n && pattern.charAt(i) != '(') {
      val c = pattern.charAt(i)
      if (c == '\\') {
        if (i + 1 >= n) return None
        val e = pattern.charAt(i + 1)
        if ("\\.[](){}*+?|^$\"'-/ :".indexOf(e) < 0) return None
        prefix.append(e); i += 2
      } else if (".[]{}*+?|^$)".indexOf(c) >= 0 || c >= 128) return None
      else { prefix.append(c); i += 1 }
    }
    if (prefix.isEmpty || i >= n || pattern.charAt(i) != '(') return None
    i += 1
    if (i >= n || pattern.charAt(i) != '[') return None
    i += 1
    if (i < n && pattern.charAt(i) == '^') return None // negation unsupported
    val cls = new Array[Boolean](128)
    var any = false
    while (i < n && pattern.charAt(i) != ']') {
      var c = pattern.charAt(i)
      if (c == '\\') {
        if (i + 1 >= n) return None
        val e = pattern.charAt(i + 1)
        if ("\\[]-^.&".indexOf(e) < 0) return None
        c = e; i += 2
      } else {
        // unescaped '[' opens a nested class and '&' can form '&&'
        // (class intersection) under java.util.regex — outside the
        // supported surface, fall back to the real engine
        if (c == '[' || c == '&') return None
        i += 1
      }
      if (c >= 128) return None
      // range c-d (a trailing '-' is a literal)
      if (i + 1 < n && pattern.charAt(i) == '-' && pattern.charAt(i + 1) != ']') {
        val d = pattern.charAt(i + 1)
        if (d == '\\' || d >= 128 || d < c) return None
        var x = c.toInt
        while (x <= d.toInt) { cls(x) = true; any = true; x += 1 }
        i += 2
      } else { cls(c.toInt) = true; any = true }
    }
    // must close with exactly "]+)" at end of pattern
    if (!any || i + 3 != n || pattern.charAt(i) != ']' ||
      pattern.charAt(i + 1) != '+' || pattern.charAt(i + 2) != ')') return None
    Some((prefix.toString.getBytes("US-ASCII"), cls))
  }

  def extract(s: UTF8String, prefix: Array[Byte], cls: Array[Boolean]): UTF8String = {
    val bytes = s.getBytes
    val n = bytes.length
    val pl = prefix.length
    var from = 0
    while (from + pl <= n) {
      // byte search for the next prefix occurrence
      var idx = -1
      var i = from
      val last = n - pl
      val p0 = prefix(0)
      while (idx < 0 && i <= last) {
        if (bytes(i) == p0) {
          var j = 1
          while (j < pl && bytes(i + j) == prefix(j)) j += 1
          if (j == pl) idx = i
        }
        if (idx < 0) i += 1
      }
      if (idx < 0) return UTF8String.EMPTY_UTF8
      val g = idx + pl
      if (g < n && bytes(g) >= 0 && cls(bytes(g))) {
        var e = g + 1
        while (e < n && bytes(e) >= 0 && cls(bytes(e))) e += 1
        return UTF8String.fromBytes(bytes, g, e - g)
      }
      from = idx + 1 // the engine advances one position past a failed candidate
    }
    UTF8String.EMPTY_UTF8
  }
}

/** `regexp_extract(child, pattern, 1)` for compile-supported patterns —
  * created only by [[graft.rules.FastRegexpExtract]], which guarantees
  * [[PrefixExtractKernel.compile]] succeeds on `pattern`.
  */
case class LiteralPrefixExtract(child: Expression, pattern: String)
    extends UnaryExpression {
  override def prettyName: String = "regexp_extract" // same SQL surface
  override def dataType: DataType = StringType

  @transient private lazy val compiled =
    PrefixExtractKernel.compile(pattern).getOrElse(
      throw new IllegalStateException(s"unsupported fast-path pattern: $pattern"))

  override def nullSafeEval(v: Any): Any =
    PrefixExtractKernel.extract(v.asInstanceOf[UTF8String], compiled._1, compiled._2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pfx = ctx.addReferenceObj("prefix", compiled._1, "byte[]")
    val cls = ctx.addReferenceObj("cls", compiled._2, "boolean[]")
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.PrefixExtractKernel.extract($s, $pfx, $cls)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
