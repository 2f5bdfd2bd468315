package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale corpus pipelines — language ID,
  * quality scoring, token counting, fingerprinting.
  *
  * Everything is composed from `org.apache.spark.sql.functions` (codegen'd,
  * pushdown-friendly); no Scala closures. Each helper returns a `Column`, so
  * the operators stay fusable into the enclosing stage — at 100 TB these run
  * as a single scan pass over the corpus with no shuffle.
  *
  * The reference has no text operators at all (strings are load-only,
  * `/root/reference/src/csv_loader.cpp:151-155`); this is the
  * training-data-pipeline extension surface required by the build brief.
  */
object TextFunctions {

  /** Lowercase, strip non-alphanumerics (keeping spaces), squeeze runs of
    * whitespace — the canonical form used for exact-dedup and
    * fingerprinting. */
  def normText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))

  /** Whitespace tokens. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword pieces: word chunks + standalone punctuation, the
    * common pre-tokenizer regex shape. */
  def bpeishTokens(c: Column): Column =
    regexp_extract_all(c, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  def bpeishTokenCount(c: Column): Column = size(bpeishTokens(c))

  def punctCount(c: Column): Column =
    length(c) - length(regexp_replace(c, "[.,!?;:]", ""))

  /** Number of tokens appearing in `words` (used for stopword ratios and the
    * language-ID vote). `filter` + `array_contains` are native higher-order
    * functions — evaluated per row without leaving the JVM codegen path. */
  def wordHits(c: Column, words: Seq[String]): Column = {
    val wordArr = array(words.map(lit): _*)
    size(filter(tokens(lower(c)), w => array_contains(wordArr, w)))
  }

  /** Small per-language stopword lists for the n-gram/stopword-vote
    * language-ID heuristic. Deliberately tiny and deterministic. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "que", "pas"),
    "es" -> Seq("el", "la", "los", "y", "es", "una", "que", "no"),
    "zh" -> Seq("de", "le", "shi", "bu", "wo", "ni", "ta", "zai"))

  /** Efficient language-ID: materializes the token array and per-language
    * hit counts as real columns (each regex/split runs ONCE per row), then
    * the argmax CASE over the materialized counts. Use this for corpus-scale
    * scoring; `langId` below is the single-Column convenience form.
    *
    * Returns the input plus `pred_lang`.
    */
  def withLangId(df: org.apache.spark.sql.DataFrame, textCol: String)
      : org.apache.spark.sql.DataFrame = {
    val langs = stopwords.keys.toSeq.sorted
    val toked = df.withColumn("__toks", tokens(lower(col(textCol))))
    val withHits = langs.foldLeft(toked) { (acc, l) =>
      val wordArr = array(stopwords(l).map(lit): _*)
      acc.withColumn(s"__h_$l",
        size(filter(col("__toks"), w => array_contains(wordArr, w))))
    }
    val hitCols = langs.map(l => col(s"__h_$l"))
    val best = greatest(hitCols: _*)
    val caseExpr = langs.foldRight(lit(langs.last)) { (l, rest) =>
      when(col(s"__h_$l") === best, lit(l)).otherwise(rest)
    }
    withHits.withColumn("pred_lang",
        when(best <= 0, lit("en")).otherwise(caseExpr))
      .drop(("__toks" +: langs.map(l => s"__h_$l")): _*)
  }

  /** Language-ID by stopword vote: argmax over per-language hit counts with
    * a deterministic tie-break (lexicographic language order, 'en' default
    * when all votes are zero). Convenience Column form — for large corpora
    * prefer `withLangId`, which materializes the hit counts once. */
  def langId(c: Column): Column = {
    val langs = stopwords.keys.toSeq.sorted
    val hits = langs.map(l => wordHits(c, stopwords(l)))
    // fold a (bestLang, bestHits) pair; strictly-greater keeps the
    // tie-break on the earlier language
    val zero = (lit("en"), lit(0))
    val (bestLang, _) = langs.zip(hits).foldLeft(zero) {
      case ((bl, bh), (l, h)) => (when(h > bh, lit(l)).otherwise(bl), greatest(h, bh))
    }
    bestLang
  }

  /** Quality score in [0, 1], unrounded: length sweet-spot, punctuation
    * moderation, stopword presence — the standard cheap heuristics
    * (C4/Gopher-style rules) as one codegen'd expression. The raw double is
    * engine-portable bit-for-bit (integer inputs, fixed op order); prefer it
    * for filters and comparisons — rounding lands on half-way points where
    * decimal-rounding implementations legitimately disagree. */
  def qualityScoreRaw(c: Column): Column = {
    val nTok = tokenCount(c).cast("double")
    val lenScore = least(nTok / lit(50.0), lit(1.0))
    val punctRatio = punctCount(c).cast("double") / greatest(length(c), lit(1)).cast("double")
    val punctScore = when(punctRatio > 0.1, lit(0.0)).otherwise(lit(1.0) - punctRatio * 10.0)
    val stopRatio = wordHits(c, stopwords("en")).cast("double") / greatest(nTok, lit(1.0))
    val stopScore = least(stopRatio * lit(5.0), lit(1.0))
    lenScore * 0.4 + punctScore * 0.3 + stopScore * 0.3
  }

  /** [[qualityScoreRaw]] rounded to 4 decimals for display. */
  def qualityScore(c: Column): Column = round(qualityScoreRaw(c), 4)

  /** 64-bit content fingerprint of the normalized text (xxhash64 — Spark's
    * native codegen'd hash). Distinct-fingerprint counts equal distinct
    * normalized-text counts up to 64-bit collision odds (~n²/2⁶⁵). */
  def fingerprint(c: Column): Column = xxhash64(normText(c))

  /** Intra-document repetition ratio: the fraction of the document's word
    * n-gram occurrences that are repeats of an earlier occurrence —
    * `1 − distinct/total` over NON-distinct shingles. Boilerplate-stuffed
    * and degenerate machine-generated text scores high; the standard
    * Gopher-style repetition quality gate. Documents too short to shingle
    * score 0. Pure integer-count division — deterministic across engines. */
  def repetitionRatio(c: Column, n: Int = 3): Column = {
    val sh = shingles(c, n)
    when(size(sh) === 0, lit(0.0))
      .otherwise((size(sh) - size(array_distinct(sh))).cast("double") /
        size(sh).cast("double"))
  }

  /** Redact common PII spans with typed placeholders: emails, IPv4
    * addresses, and dashed phone numbers. Patterns are deliberately
    * lookaround-free so Java regex (Spark) and RE2 (DuckDB, Go tooling)
    * agree byte-for-byte — the scrub must be reproducible by whatever
    * engine re-processes the corpus. Order matters: emails first (an
    * email's host must not be half-eaten by a later pattern). */
  def redactPii(c: Column): Column = {
    val email = regexp_replace(c,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email,
      "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "<IP>")
    regexp_replace(ip, "\\b[0-9]{3}-[0-9]{3,4}-[0-9]{4}\\b", "<PHONE>")
  }

  /** Gopher quality-rule columns (Rae et al. 2021, appendix A1.1) over a
    * text column: the full published rule set, each rule a separate output
    * column plus the composite `keep` flag, so pipelines can audit WHICH
    * rule rejected a document (the operational requirement at corpus scale —
    * a silent boolean loses the ablation signal).
    *
    * All metrics are integer counts or ratios of integer counts — exact in
    * IEEE double and bit-identical across engines, so the oracle can compare
    * unrounded. Everything is native higher-order functions over ONE
    * materialized token/line array per row: a single scan pass, no shuffle,
    * fully codegen'd.
    *
    * Rules (document is kept iff ALL hold):
    *   - 50 ≤ word count ≤ 100,000
    *   - 3 ≤ mean word length ≤ 10
    *   - symbol-to-word ratio (# or …/...) ≤ 0.1
    *   - ≤ 90% of lines start with a bullet (-, *, •)
    *   - ≤ 30% of lines end with an ellipsis
    *   - ≥ 80% of words contain at least one alphabetic character
    *   - ≥ 2 hits from the stop-word list
    */
  def withGopherRules(df: org.apache.spark.sql.DataFrame, textCol: String)
      : org.apache.spark.sql.DataFrame = {
    val c = col(textCol)
    val staged = df
      .withColumn("__w", tokens(c))
      .withColumn("__l", split(c, "\n"))
    val nWords = size(col("__w")).cast("long")
    val nLines = greatest(size(col("__l")), lit(1)).cast("double")
    // Character sum via integer fold — exact; mean is one exact division.
    val charSum = aggregate(col("__w"), lit(0L),
      (acc, w) => acc + length(w).cast("long"))
    val meanWordLen = charSum.cast("double") /
      greatest(nWords, lit(1L)).cast("double")
    val hashCount = length(c) - length(regexp_replace(c, "#", ""))
    val ellipsisCount =
      ((length(c) - length(regexp_replace(c, "\\.\\.\\.", ""))) / lit(3)) +
        (length(c) - length(regexp_replace(c, "…", "")))
    val symbolRatio = (hashCount + ellipsisCount).cast("double") /
      greatest(nWords, lit(1L)).cast("double")
    val bulletLines = size(filter(col("__l"),
      l => l.rlike("^\\s*[-*•]\\s")))
    val ellipsisLines = size(filter(col("__l"),
      l => l.rlike("(\\.\\.\\.|…)\\s*$")))
    val alphaWords = size(filter(col("__w"), w => w.rlike("[A-Za-z]")))
    val alphaFrac = alphaWords.cast("double") /
      greatest(nWords, lit(1L)).cast("double")
    val stopArr = array(stopwords("en").map(lit): _*)
    val stopHits = size(filter(col("__w"),
      w => array_contains(stopArr, lower(w)))).cast("long")
    staged
      .withColumn("n_words", nWords)
      .withColumn("mean_word_len", meanWordLen)
      .withColumn("symbol_ratio", symbolRatio)
      .withColumn("bullet_frac", bulletLines.cast("double") / nLines)
      .withColumn("ellipsis_frac", ellipsisLines.cast("double") / nLines)
      .withColumn("alpha_frac", alphaFrac)
      .withColumn("stop_hits", stopHits)
      .withColumn("keep",
        col("n_words").between(50L, 100000L) &&
          col("mean_word_len").between(3.0, 10.0) &&
          col("symbol_ratio") <= 0.1 &&
          col("bullet_frac") <= 0.9 &&
          col("ellipsis_frac") <= 0.3 &&
          col("alpha_frac") >= 0.8 &&
          col("stop_hits") >= 2L)
      .drop("__w", "__l")
  }

  /** Word n-gram shingles as an array column: n-token windows joined by a
    * single space; documents shorter than n tokens yield an EMPTY set (the
    * standard contract, and what `generate_series(1, len-n+1)` produces in
    * the SQL oracles — a whole-text fallback would pair up all short docs).
    * Native `sequence`/`transform`/`slice` — no UDF. */
  def shingles(c: Column, n: Int): Column = {
    val toks = tokens(c)
    // round-16: windows build in the codegen'd GramArray kernel — the
    // zip_with chain below stays as the reference implementation
    // (TextKernelsSpec pins value equality, null propagation included)
    when(size(toks) >= n, TextKernels.gramArray(toks, n, " "))
      .otherwise(array().cast("array<string>"))
  }

  /** n-token windows joined by `sep`, as a zip_with CHAIN: window i =
    * toks[i] ⊕ sep ⊕ toks[i+1] ⊕ … ⊕ toks[i+n−1], built by zipping n
    * shifted slices. zip_with evaluates its ARRAY arguments once per row
    * and binds elements into the lambda — the previous
    * transform-with-`slice(toks, i, n)` spelling re-evaluated `toks`
    * (the whole split/trim tokenization) once PER WINDOW, O(tokens²)
    * per document (measured: building 3-gram shingle arrays alone cost
    * 3.3 s of the t22 serve's 6.4 s at sf0.1; the scan floor is 0.3 s).
    * Caller guards size(toks) >= n (a negative slice length errors). */
  private[graft] def slidingJoin(toks: Column, n: Int,
                                 sep: String): Column = {
    val m = size(toks) - lit(n - 1)
    (2 to n).foldLeft(slice(toks, lit(1), m)) { (acc, k) =>
      zip_with(acc, slice(toks, lit(k), m),
        (a, b) => concat(a, lit(sep), b))
    }
  }
}
