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

  /** Gopher-style repetition signals (Rae et al. 2021 §A1.1), the
    * standard pre-training repetition filters: the fraction of word
    * instances that are repeats, and for word 2-grams the duplicated
    * coverage (instances of grams occurring more than once), the
    * beyond-first repeat fraction, and the most-frequent-gram share.
    *
    * Everything is computed INSIDE the row from sorted-array adjacency —
    * no explode, no per-gram shuffle — so at 100 TB this is a pure map
    * stage: repeats = instances − distinct falls out of one
    * `array_sort` + neighbour-equality pass, coverage marks elements
    * equal to either neighbour, and the top-gram share is the longest
    * equal run via `aggregate` carrying (run, best, prev) struct state.
    * Words here are whitespace tokens; docs under 2 words report zero
    * fractions. (Sort order: Spark compares java Strings (UTF-16 units),
    * DuckDB bytes — identical verdicts for any choice of order since
    * only equality of neighbours is consumed.)
    */
  def repetition(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = split(regexp_replace(trim(col(textCol)), "\\s+", " "), " ")
    val nW = size(words)
    // Guard the gram build: for nW < 2, sequence(1, nW-1) would step
    // DOWNWARD ([1, 0]) and element_at(words, 0) throws — one-word and
    // empty docs must fall to an empty gram array instead (CaseWhen only
    // evaluates the matched branch, so the bad sequence never runs).
    val grams = when(nW >= 2,
      transform(sequence(lit(1), nW - 1),
        i => concat_ws(" ", element_at(words, i), element_at(words, i + 1))))
      .otherwise(array().cast("array<string>"))
    val sorted = array_sort(grams)
    val g = size(sorted)
    // eqf(i) = 1 iff sorted(i) == sorted(i+1); length g-1 (clamped ≥0:
    // slice() rejects negative lengths and g=0 for sub-2-word docs)
    val eqf = zip_with(
      slice(sorted, lit(1), greatest(g - 1, lit(0))),
      slice(sorted, lit(2), greatest(g - 1, lit(0))),
      (a, b) => when(a === b, 1).otherwise(0))
    val repeats = aggregate(eqf, lit(0), (acc, x) => acc + x)
    // an instance is "covered" if equal to either sorted neighbour
    val covered = aggregate(
      zip_with(concat(array(lit(0)), eqf), concat(eqf, array(lit(0))),
        (p, n) => greatest(p, n)),
      lit(0), (acc, x) => acc + x)
    val topRun = aggregate(sorted,
      struct(lit(0).as("run"), lit(0).as("best"),
        lit(null).cast("string").as("prev")),
      (acc, x) => {
        val run = when(x <=> acc.getField("prev"),
          acc.getField("run") + 1).otherwise(1)
        struct(run.as("run"),
          greatest(acc.getField("best"), run).as("best"), x.as("prev"))
      },
      acc => acc.getField("best"))
    val gd = g.cast("double")
    def frac(c: Column): Column =
      when(g > 0, round(c.cast("double") / gd, 6)).otherwise(lit(0.0))
    df.select(col(idCol),
      nW.cast("long").as("n_words"),
      when(nW > 0, round((nW - size(array_distinct(words))).cast("double") /
        nW.cast("double"), 6)).otherwise(lit(0.0)).as("rep_word_frac"),
      frac(covered).as("dup_2gram_frac"),
      frac(repeats).as("rep_2gram_frac"),
      frac(topRun).as("top_2gram_frac"))
  }

  /** PII redaction for training corpora: emails, IPv4 addresses and
    * long digit runs (phone/account numbers) replace with typed tags.
    * Pure `regexp_replace` chain over a common RE2/Java regex subset —
    * codegen'd, shuffle-free, order of passes fixed (emails before
    * digit runs so the user part of an address never half-redacts).
    */
  def redactPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val email = regexp_replace(col(textCol),
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email,
      "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "<IP>")
    val digits = regexp_replace(ip, "\\b[0-9]{7,}\\b", "<NUM>")
    df.select(col(idCol), digits.as("redacted"),
      (length(col(textCol)) - length(digits)).cast("long").as("delta_chars"))
  }

  /** Sequence packing (pre-training sample packing): assign documents to
    * fixed-token-budget bins by a running token sum, PER SHARD — the
    * window partitions on `shardCol`, so at 100 TB this shuffles once on
    * the shard key instead of forcing a global single-partition
    * prefix-sum. Bin boundaries are deterministic (docs in `idCol`
    * order; a doc opens a new bin when the running sum would pass
    * `binTokens`, oversized docs own their bin) under the standard
    * contiguous-greedy scheme: bin = floor(cumulative_before / budget).
    */
  def packSequences(df: DataFrame, idCol: String, shardCol: String,
      textCol: String, binTokens: Int): DataFrame = {
    import graft.functions.StringExtraFunctions.ws_token_count
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val n = ws_token_count(col(textCol))
    val before = sum(n).over(w) - n
    df.select(col(shardCol), col(idCol), n.as("n_tokens"),
      floor(before / binTokens).cast("int").as("bin"))
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
