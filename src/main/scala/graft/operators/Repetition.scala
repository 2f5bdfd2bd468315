package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** The full Gopher repetition-removal suite (Rae et al. 2021, Table A1) —
  * the companion of the A1.1 rule set in
  * [[graft.functions.TextFunctions.withGopherRules]]: documents are
  * rejected when too much of their content is the SAME content repeated —
  * boilerplate lines, looping n-grams, degenerate machine-generated text.
  * Per document, the published metrics:
  *
  *   - `top_{2,3,4}gram_char_frac` — characters covered by the single most
  *     frequent word n-gram (count × gram length / doc chars)
  *   - `dup_{5..10}gram_char_frac` — characters covered by ALL occurrences
  *     of n-grams that occur more than once
  *   - `dup_line_frac` / `dup_line_char_frac` — occurrence and character
  *     fraction of repeated lines (unit-agnostic: any array<string> of
  *     lines; the gate chunks by fixed word windows since the synthetic
  *     corpus has no newlines — same convention as the d11 line dedup)
  *
  * and the composite `keep` under Rae's thresholds (top2 ≤ .20, top3 ≤ .18,
  * top4 ≤ .16, dup5 ≤ .15 … dup10 ≤ .10, dup_line ≤ .30,
  * dup_line_char ≤ .20).
  *
  * Determinism contract: every metric is a ratio of INTEGER counts
  * (occurrence counts × character lengths over the canonical single-spaced
  * doc length), so the doubles are exact and the oracle compares unrounded
  * — the t15 discipline. The top gram ties break to the lexicographically
  * smallest gram (both engines rank (count DESC, gram ASC)). Character
  * coverage is the standard overlap-agnostic approximation (count × gram
  * length; overlapping occurrences double-count) used by the public
  * reimplementations of the paper's filters.
  *
  * Scale shape: a document's repetition stats depend on NOTHING outside the
  * document, so — unlike the corpus-wide dedup family — this is a pure
  * scan-pass operator: each n-gram set is sorted per row and folded ONCE
  * (`aggregate` over the sorted array: run lengths → top count + duplicate
  * mass), all native higher-order functions, ZERO shuffle at any corpus
  * size. The alternative explode → groupBy(doc, n, gram) spelling would
  * shuffle ~9× the corpus token count for stats that never needed to leave
  * the row.
  *
  * (The reference engine has no text operators at all —
  * `/root/reference/src/csv_loader.cpp:151-155` loads strings and nothing
  * reads them; this is pipeline-extension surface.)
  */
object Repetition {

  /** Word n-gram shingles from a pre-materialized token array (same
    * contract as [[TF.shingles]], minus the re-tokenization per n). */
  // the HOF spellings below are retained as the REFERENCE implementation:
  // TextKernelsSpec pins the codegen'd kernels against them value-for-value
  private[graft] def shinglesOf(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Run-length statistics over a SORTED string array, as one fold:
    * struct(top_cnt, top_gram, dup_occ, dup_chars) where `top` is the most
    * frequent element (ties → smallest) and `dup_*` sum ALL occurrences /
    * characters of elements occurring ≥ 2 times. O(|arr|) per row, no
    * shuffle, no UDF. */
  private[graft] def sortedRunStats(sorted: Column): Column = {
    val zero = struct(
      lit(null).cast("string").as("prev"), lit(0L).as("run"),
      lit(0L).as("top_cnt"), lit(null).cast("string").as("top_gram"),
      lit(0L).as("dup_occ"), lit(0L).as("dup_chars"))
    // fold the just-finished run (prev × run) into the stats
    def closed(acc: Column): Column = {
      val run = acc.getField("run")
      val prev = acc.getField("prev")
      val topCnt = acc.getField("top_cnt")
      val topGram = acc.getField("top_gram")
      val better = (run > topCnt) ||
        ((run === topCnt) && (topGram.isNull || prev < topGram))
      struct(
        when(run > 0 && better, run).otherwise(topCnt).as("top_cnt"),
        when(run > 0 && better, prev).otherwise(topGram).as("top_gram"),
        (acc.getField("dup_occ") +
          when(run >= 2, run).otherwise(lit(0L))).as("dup_occ"),
        (acc.getField("dup_chars") +
          when(run >= 2, run * length(prev).cast("long"))
            .otherwise(lit(0L))).as("dup_chars"))
    }
    aggregate(sorted, zero,
      (acc, x) =>
        when(acc.getField("prev").isNotNull && acc.getField("prev") === x,
          struct(acc.getField("prev").as("prev"),
            (acc.getField("run") + 1L).as("run"),
            acc.getField("top_cnt").as("top_cnt"),
            acc.getField("top_gram").as("top_gram"),
            acc.getField("dup_occ").as("dup_occ"),
            acc.getField("dup_chars").as("dup_chars")))
          .otherwise({
            val c = closed(acc)
            struct(x.as("prev"), lit(1L).as("run"),
              c.getField("top_cnt").as("top_cnt"),
              c.getField("top_gram").as("top_gram"),
              c.getField("dup_occ").as("dup_occ"),
              c.getField("dup_chars").as("dup_chars"))
          }),
      acc => {
        val c = closed(acc)
        struct(c.getField("top_cnt").as("top_cnt"),
          c.getField("top_gram").as("top_gram"),
          c.getField("dup_occ").as("dup_occ"),
          c.getField("dup_chars").as("dup_chars"))
      })
  }

  /** Rae et al. Table A1 thresholds, keyed by output column. */
  val thresholds: Seq[(String, Double)] = Seq(
    "top_2gram_char_frac" -> 0.20,
    "top_3gram_char_frac" -> 0.18,
    "top_4gram_char_frac" -> 0.16,
    "dup_5gram_char_frac" -> 0.15,
    "dup_6gram_char_frac" -> 0.14,
    "dup_7gram_char_frac" -> 0.13,
    "dup_8gram_char_frac" -> 0.12,
    "dup_9gram_char_frac" -> 0.11,
    "dup_10gram_char_frac" -> 0.10,
    "dup_line_frac" -> 0.30,
    "dup_line_char_frac" -> 0.20)

  /** Append the per-rule metric columns and the composite `keep` flag.
    *
    * @param linesOf lines expression for the line-level metrics, given the
    *                text column — defaults to newline splitting; corpora
    *                without line structure pass a chunking expression
    */
  def withRepetitionStats(df: DataFrame, textCol: String,
      linesOf: Column => Column = split(_, "\n")): DataFrame = {
    // spread the input first: the per-doc folds are interpreted (HOFs do
    // not codegen) and CPU-bound, so a one-row-group parquet file would
    // otherwise run the whole suite on ONE core — measured 7.7 s → 1.1 s
    // at sf0.1 from this line alone; a no-op at cluster scale (spread
    // only fans out sub-GiB inputs)
    val staged = spread(df)
      .withColumn("__w", TF.tokens(col(textCol)))
      .withColumn("__l", linesOf(col(textCol)))
    // canonical single-spaced doc length — the denominator every published
    // char-fraction uses; exact integer on both engines
    val nChars = greatest(
      length(array_join(col("__w"), " ")).cast("long"), lit(1L))
    val lineChars = greatest(
      graft.functions.TextKernels.charSum(col("__l")), lit(1L))
    val nLines = greatest(size(col("__l")).cast("long"), lit(1L))
    // round-16: ONE codegen'd kernel pass computes all nine gram sizes
    // (replacing nine interpreted sort+fold HOF chains — the heaviest
    // pure-scan floor in the repo; TextKernelsSpec pins value equality
    // with the HOF spelling, including ties/nulls/unicode). __sa is
    // referenced nine times, so CollapseProject keeps it materialized
    // and the kernel runs once per row.
    val withGrams = staged
      .withColumn("__sa", graft.functions.TextKernels
        .gramRunStats(col("__w"), 2, 10))
      .withColumn("__sl", graft.functions.TextKernels
        .elemRunStats(col("__l")))
    def gramStats(n: Int): Column = element_at(col("__sa"), n - 1)
    def topFrac(n: Int): Column = {
      val s = gramStats(n)
      when(s.getField("top_cnt") === 0, lit(0.0))
        .otherwise((s.getField("top_cnt") *
          length(s.getField("top_gram")).cast("long")).cast("double") /
          nChars.cast("double"))
    }
    def dupFrac(n: Int): Column =
      gramStats(n).getField("dup_chars").cast("double") / nChars.cast("double")
    val out = withGrams
      .withColumn("top_2gram_char_frac", topFrac(2))
      .withColumn("top_3gram_char_frac", topFrac(3))
      .withColumn("top_4gram_char_frac", topFrac(4))
      .withColumn("dup_5gram_char_frac", dupFrac(5))
      .withColumn("dup_6gram_char_frac", dupFrac(6))
      .withColumn("dup_7gram_char_frac", dupFrac(7))
      .withColumn("dup_8gram_char_frac", dupFrac(8))
      .withColumn("dup_9gram_char_frac", dupFrac(9))
      .withColumn("dup_10gram_char_frac", dupFrac(10))
      .withColumn("dup_line_frac",
        col("__sl").getField("dup_occ").cast("double") / nLines.cast("double"))
      .withColumn("dup_line_char_frac",
        col("__sl").getField("dup_chars").cast("double") /
          lineChars.cast("double"))
    val keep = thresholds
      .map { case (c, thr) => col(c) <= thr }
      .reduce(_ && _)
    out.withColumn("keep", keep)
      .drop("__w", "__l", "__sl", "__sa")
  }
}
