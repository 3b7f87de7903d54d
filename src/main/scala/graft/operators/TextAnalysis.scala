package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: quality scoring,
  * token counting, language ID, and content fingerprinting. All pure
  * column expressions — no UDFs, fully inside whole-stage codegen, no
  * shuffle except the caller's own aggregations.
  */
object TextAnalysis {

  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "fr" -> Seq("le", "la", "les", "et", "est", "dans", "pour", "que", "une", "des"),
    "es" -> Seq("el", "los", "y", "es", "en", "por", "que", "una", "con", "para"),
    "zh" -> Seq("的", "是", "不", "我", "了", "在", "人", "有", "他", "这"))

  /** Quality metrics: alpha ratio, stopword ratio, average word length.
    *
    * All five counters come from ONE pass over the text
    * ([[graft.functions.TextQualityKernel]]) instead of two full-text
    * regexp_replace materializations + three splits; the ratio
    * arithmetic stays in Column expressions over the counts, so results
    * are bit-identical to the unfused spelling (pinned in
    * TokenizerKernelSpec's differential).
    */
  def quality(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val c = org.apache.spark.sql.graft.bridge.column(
      graft.functions.TextQualityCounts(
        org.apache.spark.sql.graft.bridge.expression(col(textCol))))
    df.select(col(idCol),
      c.getField("chars").as("n_chars_m"),
      c.getField("ws_words").as("n_words"),
      round(c.getField("az").cast("double") / c.getField("chars"), 6)
        .as("alpha_ratio"),
      round(c.getField("stop_hits").cast("double") / (c.getField("spaces") + 1), 6)
        .as("stop_ratio"),
      round((c.getField("chars") - c.getField("spaces")).cast("double") /
        c.getField("ws_words"), 6).as("avg_wlen"))
  }

  /** Whitespace token count + a BPE-ish regex token count
    * (letter runs / single digits / punctuation marks).
    *
    * Both counts run on the allocation-free [[graft.functions.RegexpCount]]
    * kernel: size(split(s, re)) ≡ regexp_count(s, re) + 1 whenever the
    * separator can't match empty (split with limit -1 keeps trailing
    * empties, so every separator match adds exactly one element), and
    * size(regexp_extract_all(..)) materialized every token string just to
    * count it — at one token per ~3 chars that dominated the scan.
    */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.functions.StringExtraFunctions.{bpe_token_count, ws_token_count}
    df.select(col(idCol),
      ws_token_count(col(textCol)).as("n_ws"),
      bpe_token_count(col(textCol)).as("n_bpe"))
  }

  /** Stopword-vote language ID. Returns (score, lang) argmax — the
    * `greatest` over (score, lang) structs compares score first, so ties
    * break deterministically on the language code.
    */
  def languageId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = split(lower(col(textCol)), "\\s+")
    val scored: Seq[Column] = stopwords.toSeq.sortBy(_._1).map { case (lang, sw) =>
      struct(size(filter(words, w => w.isin(sw: _*))).as("score"), lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    df.select(col(idCol),
      best.getField("lang").as("predicted"),
      best.getField("score").cast("long").as("votes"))
  }

  /** Content fingerprints: an exact normalized-content key plus a min-hash
    * over word 3-gram shingles (stable under small edits).
    */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = split(col(textCol), "\\s+")
    val shingles = when(size(words) < 3, array())
      .otherwise(transform(sequence(lit(0), size(words) - 3),
        i => array_join(slice(words, i + lit(1), lit(3)), " ")))
    df.select(col(idCol),
      md5(lower(regexp_replace(col(textCol), "\\s+", " "))).as("content_key"),
      array_min(transform(shingles, s => md5(s))).as("min_shingle_md5"))
  }
}
