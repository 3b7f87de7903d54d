package graft

import graft.functions.TokenizerKernel
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The byte-scan tokenizer counters must equal their regex definitions:
  * ws_token_count ≡ size(split(s, "\\s+")) with limit -1 (Java split
  * keeping trailing empties), bpe_token_count ≡ the match count of
  * `[a-z]+|[0-9]|[^a-z0-9\s]`. Randomized over an alphabet that hits
  * every branch (letter runs, digits, punctuation, whitespace runs,
  * multi-byte code points) plus the fixed edge cases.
  */
class TokenizerKernelSpec extends AnyFunSuite {

  private def wsOracle(s: String): Long =
    // split with limit -1 keeps trailing empty strings — matches Spark's
    // StringSplit default, which the kernel mirrors
    s.split("\\s+", -1).length.toLong

  private val bpePat = java.util.regex.Pattern.compile("[a-z]+|[0-9]|[^a-z0-9\\s]")
  private def bpeOracle(s: String): Long = {
    val m = bpePat.matcher(s)
    var c = 0L
    while (m.find()) c += 1
    c
  }

  private def checkBoth(s: String): Unit = {
    val u = UTF8String.fromString(s)
    assert(TokenizerKernel.wsTokens(u) == wsOracle(s), s"ws mismatch on ${s.take(60)}")
    assert(TokenizerKernel.bpeTokens(u) == bpeOracle(s), s"bpe mismatch on ${s.take(60)}")
  }

  test("fixed edges: empty, all-space, leading/trailing runs, unicode") {
    Seq("", " ", "   ", "a", " a", "a ", " a ", "a  b", "ab12cd", "1 2 3",
      "hello, world! 42", "tabs\tand\nnewlines\r\nmixed  runs",
      "héllo wörld", "日本語 テスト", "a.b,c;d", "...", "a1b2c3",
      "ALLCAPS lower MiXeD", "ümlaut-straße").foreach(checkBoth)
  }

  test("randomized against the regex oracles") {
    val alphabet = "abz059 .,!\t\n:éü日 aab "
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val n = rnd.nextInt(80)
      checkBoth((0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
  }

  // --- fused text-quality counters vs their expression definitions ---

  private val enStop =
    Set("the", "a", "and", "of", "to", "in", "is", "it", "that", "for")

  private def checkQuality(s: String): Unit = {
    val row = graft.functions.TextQualityKernel
      .counts(UTF8String.fromString(s))
    val chars = s.codePointCount(0, s.length).toLong
    assert(row.getLong(0) == chars, s"chars on <${s.take(60)}>")
    assert(row.getLong(1) == s.split("\\s+", -1).length.toLong, s"ws_words on <${s.take(60)}>")
    assert(row.getLong(2) == s.count(c => c >= 'a' && c <= 'z').toLong, s"az on <${s.take(60)}>")
    assert(row.getLong(3) == s.count(_ == ' ').toLong, s"spaces on <${s.take(60)}>")
    assert(row.getLong(4) == s.split(" ", -1).count(enStop).toLong, s"stop_hits on <${s.take(60)}>")
  }

  test("quality counters: fixed edges") {
    Seq("", " ", "the", " the ", "the the the", "a", "thee", "THE the",
      "of\tto", "to\nin", "is it that for", "x the", "the,", "  the  ",
      "héllo the wörld", "日本語 the テスト", "a  b", "for").foreach(checkQuality)
  }

  test("quality counters: randomized") {
    val pieces = Seq("the", "a", "and", "of", "to", "thx", "xyz", " ", "  ",
      "\t", "\n", ".", "é", "日", "b", "1")
    val rnd = new scala.util.Random(7)
    (1 to 500).foreach { _ =>
      val n = rnd.nextInt(30)
      checkQuality((0 until n).map(_ => pieces(rnd.nextInt(pieces.length))).mkString)
    }
  }
}
