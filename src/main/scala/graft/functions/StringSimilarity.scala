package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** String-similarity functions absent from Spark — SURVEY.md §2.8 gap.
  *
  * Semantics mirror the reference implementations
  * (/root/reference/extension/core_functions/scalar/string/jaccard.cpp,
  * jaro_winkler.cpp, damerau_levenshtein.cpp, hamming.cpp), validated
  * against the DuckDB oracle:
  *  - jaccard: |A∩B| / |A∪B| over *character sets*;
  *  - jaro_winkler: Winkler prefix boost (scale 0.1, max 4) applied only
  *    when the Jaro score exceeds 0.7;
  *  - damerau_levenshtein: unrestricted (true) Damerau-Levenshtein, not
  *    the optimal-string-alignment variant ("CA"→"ABC" = 2, not 3);
  *  - hamming: differing positions; NULL when lengths differ (the
  *    reference raises — NULL is the Spark-idiomatic degradation).
  *
  * Scalar evaluation is interpreted (CodegenFallback): these run over
  * candidate *pairs* after LSH/blocking pruning, not over raw scans, so
  * the per-row closure cost is not the bottleneck.
  */
abstract class StringSimilarityExpression extends BinaryExpression
    with CodegenFallback {
  override def nullable: Boolean = true
  protected def compute(a: String, b: String): Any
  override def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[UTF8String].toString, r.asInstanceOf[UTF8String].toString)
}

case class JaccardSimilarity(left: Expression, right: Expression)
    extends StringSimilarityExpression {
  override def prettyName: String = "jaccard"
  override def dataType: DataType = DoubleType
  override protected def compute(a: String, b: String): Any = {
    val sa = a.toSet
    val sb = b.toSet
    if (sa.isEmpty && sb.isEmpty) 1.0
    else (sa & sb).size.toDouble / (sa | sb).size.toDouble
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class HammingDistance(left: Expression, right: Expression)
    extends StringSimilarityExpression {
  override def prettyName: String = "hamming"
  override def dataType: DataType = LongType
  override protected def compute(a: String, b: String): Any =
    if (a.length != b.length) null
    else {
      var d = 0L; var i = 0
      while (i < a.length) { if (a.charAt(i) != b.charAt(i)) d += 1; i += 1 }
      d
    }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class JaroWinklerSimilarity(left: Expression, right: Expression)
    extends StringSimilarityExpression {
  override def prettyName: String = "jaro_winkler_similarity"
  override def dataType: DataType = DoubleType
  override protected def compute(a: String, b: String): Any = {
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    val window = math.max(a.length, b.length) / 2 - 1
    val aM = new Array[Boolean](a.length)
    val bM = new Array[Boolean](b.length)
    var matches = 0
    var i = 0
    while (i < a.length) {
      val lo = math.max(0, i - window)
      val hi = math.min(b.length - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bM(j) && a.charAt(i) == b.charAt(j)) {
          aM(i) = true; bM(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0; var k = 0; i = 0
    while (i < a.length) {
      if (aM(i)) {
        while (!bM(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    // transpositions: floor(mismatched/2) — integer halving, matching the
    // reference implementation (validated against the oracle: an odd
    // mismatch count rounds down, not to x.5)
    val jaro = (m / a.length + m / b.length + (m - (t / 2)) / m) / 3.0
    if (jaro <= 0.7) jaro
    else {
      var prefix = 0
      while (prefix < math.min(4, math.min(a.length, b.length)) &&
        a.charAt(prefix) == b.charAt(prefix)) prefix += 1
      jaro + prefix * 0.1 * (1.0 - jaro)
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class DamerauLevenshtein(left: Expression, right: Expression)
    extends StringSimilarityExpression {
  override def prettyName: String = "damerau_levenshtein"
  override def dataType: DataType = LongType
  override protected def compute(a: String, b: String): Any = {
    val n = a.length; val m = b.length
    if (n == 0) return m.toLong
    if (m == 0) return n.toLong
    val inf = n + m
    // Lowrance–Wagner DP with last-occurrence table (unrestricted DL)
    val d = Array.ofDim[Int](n + 2, m + 2)
    d(0)(0) = inf
    for (i <- 0 to n) { d(i + 1)(1) = i; d(i + 1)(0) = inf }
    for (j <- 0 to m) { d(1)(j + 1) = j; d(0)(j + 1) = inf }
    val da = scala.collection.mutable.Map.empty[Char, Int]
    for (i <- 1 to n) {
      var db = 0
      for (j <- 1 to m) {
        val i1 = da.getOrElse(b.charAt(j - 1), 0)
        val j1 = db
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) { db = j; 0 } else 1
        d(i + 1)(j + 1) = math.min(
          math.min(d(i)(j) + cost, math.min(d(i + 1)(j) + 1, d(i)(j + 1) + 1)),
          d(i1)(j1) + (i - i1 - 1) + 1 + (j - j1 - 1))
      }
      da(a.charAt(i - 1)) = i
    }
    d(n + 1)(m + 1).toLong
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

object StringFunctions {
  private def c(f: (Expression, Expression) => Expression)(a: Column, b: Column): Column =
    bridge.column(f(bridge.expression(a), bridge.expression(b)))
  def jaccard_sim(a: Column, b: Column): Column = c(JaccardSimilarity)(a, b)
  def hamming(a: Column, b: Column): Column = c(HammingDistance)(a, b)
  def jaro_winkler(a: Column, b: Column): Column = c(JaroWinklerSimilarity)(a, b)
  def damerau_levenshtein(a: Column, b: Column): Column = c(DamerauLevenshtein)(a, b)
}
