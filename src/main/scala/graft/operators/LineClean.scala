package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style LINE-level corpus cleaning (Raffel et al. JMLR'20 §2.2, the
  * C4 pipeline; FineWeb and RefinedWeb keep the same shape): web text is
  * cleaned line by line — short lines, boilerplate phrases
  * ("lorem ipsum", "javascript", cookie banners), and non-sentence lines
  * are DROPPED while the document survives with its remaining lines,
  * then documents that kept too few lines are dropped entirely. This
  * complements the DOCUMENT-level rule set in the Gopher-style
  * [[graft.functions.TextFunctions]] quality scores (t15): those flag
  * whole documents, this repairs them.
  *
  * Input contract: (idCol, linesCol: array<string>) — the operator is
  * segmentation-agnostic like [[Dedup.keepFirstLines]]: real corpora
  * split on '\n', the newline-free test corpus uses fixed word windows.
  *
  * Plan shape at 100 TB: one projection pass — per-document array HOFs
  * (filter/size/array_join), NO explode, NO shuffle, NO join: each task
  * cleans its own documents and the output is exactly one row per input
  * row. The HOF lambdas run interpreted (outside whole-stage codegen),
  * so inputs are [[spread]] first — the repo's measured
  * one-partition-serializes-the-fold cliff (NOTES r8).
  *
  * Determinism: every rule is a pure string predicate (regexp token
  * count, anchored terminal-punctuation match, lowercase substring
  * containment) — bit-identical across engines, no floats anywhere.
  */
object LineClean {

  /** Clean `linesCol` line by line. Output: one row per input document —
    * (idCol, n_lines, n_kept, keep, text) where `text` is the kept lines
    * re-joined with '\n' (empty string when nothing survives) and `keep`
    * is the document-level verdict `n_kept >= minKeptLines`.
    *
    *  - `minWordsPerLine`: drop lines with fewer whitespace-split words
    *    (C4 drops under-3-word lines). Words are counted on the
    *    whitespace-STRIPPED line — stripping uses the regex `\s` class,
    *    not `trim()`, because trim strips only ASCII spaces: a
    *    tab-indented line would otherwise mint a phantom empty first
    *    token and a tab-only line would count 1 word instead of 0
    *    (round-11 ADVICE). `\s` is the ASCII whitespace class in BOTH
    *    engines (Java and RE2 alike exclude NBSP/Unicode spaces by
    *    default — exotic spaces are out of scope, consistently).
    *  - `requireTerminalPunct`: drop lines not ending in terminal
    *    punctuation (C4's "ends in a terminal punctuation mark" rule) —
    *    off for corpora without punctuation.
    *  - `blocklist`: drop lines whose lowercase form contains ANY listed
    *    phrase (C4 uses "javascript", "lorem ipsum", "{", policy
    *    phrases). Matching is plain substring containment, not regex.
    */
  def cleanLines(df: DataFrame, linesCol: String, idCol: String,
                 minWordsPerLine: Int = 3,
                 requireTerminalPunct: Boolean = true,
                 blocklist: Seq[String] =
                   Seq("lorem ipsum", "javascript", "{"),
                 minKeptLines: Int = 1): DataFrame = {
    require(minWordsPerLine >= 0, "minWordsPerLine must be non-negative")
    require(minKeptLines >= 0, "minKeptLines must be non-negative")
    val keepLine: Column => Column = { line =>
      val stripped = regexp_replace(line, "^\\s+|\\s+$", "")
      val wordsOk =
        when(stripped === "", lit(0))
          .otherwise(size(split(stripped, "\\s+"))) >=
          lit(minWordsPerLine)
      val punctOk =
        if (requireTerminalPunct) line.rlike("[.!?\"”]$") else lit(true)
      val blockOk =
        if (blocklist.isEmpty) lit(true)
        else blocklist.map(b => !lower(line).contains(lit(b.toLowerCase)))
          .reduce(_ && _)
      wordsOk && punctOk && blockOk
    }
    // a null lines array is an empty document, not a -1-line one
    spread(df.select(col(idCol), col(linesCol)))
      .select(col(idCol),
        coalesce(col(linesCol), array().cast("array<string>"))
          .as(linesCol))
      .select(col(idCol), col(linesCol),
        filter(col(linesCol), keepLine).as("__kept"))
      .select(col(idCol),
        size(col(linesCol)).cast("long").as("n_lines"),
        size(col("__kept")).cast("long").as("n_kept"),
        (size(col("__kept")) >= lit(minKeptLines)).as("keep"),
        array_join(col("__kept"), "\n").as("text"))
  }

  /** INTRA-document line dedup: keep each line's FIRST occurrence within
    * its own document, preserving order (the RefinedWeb/C4 "remove
    * repeated lines within a page" stage — boilerplate headers, nav
    * menus, and cookie banners repeat inside one page long before they
    * repeat across the corpus). The corpus-wide complement is
    * [[Dedup.keepFirstLines]] (d11), which dedups ACROSS documents; this
    * pass needs no corpus state at all.
    *
    * Plan shape at 100 TB: one projection pass — per-document array HOFs
    * only, NO explode/shuffle/join/window, exactly one output row per
    * document. The dedup predicate is `array_position(lines, x) == i+1`
    * (an element survives iff it sits at its value's first index), which
    * is O(lines²) COMPARES per document with zero allocation — bounded
    * by document size, independent of corpus size, and cheaper in
    * practice than exploding every line into an exchange to run a
    * window over (doc, line). Documents beyond ~10⁴ lines should be
    * split upstream ([[graft.operators.Packing]] chunking) before any
    * per-line pass, this one included.
    *
    * Output: (idCol, n_lines, n_kept, text) — survivors re-joined with
    * '\n'; n_lines − n_kept is the intra-doc duplicate count. */
  def dedupLinesWithinDoc(df: DataFrame, linesCol: String,
                          idCol: String): DataFrame =
    spread(df.select(col(idCol), col(linesCol)))
      .select(col(idCol),
        coalesce(col(linesCol), array().cast("array<string>"))
          .as(linesCol))
      .select(col(idCol), col(linesCol),
        filter(col(linesCol), (x, i) =>
          array_position(col(linesCol), x) === (i + 1).cast("long"))
          .as("__kept"))
      .select(col(idCol),
        size(col(linesCol)).cast("long").as("n_lines"),
        size(col("__kept")).cast("long").as("n_kept"),
        array_join(col("__kept"), "\n").as("text"))

  /** The C4 discover→remove boilerplate loop as ONE call, shared by the
    * p14/p18 gates and the soak (three hand-synchronized copies would
    * silently drift): the corpus's own top-`k` `n`-grams become the
    * line blocklist ([[HeavyHitters.topKNgrams]] — the SKETCH discovery
    * path: MG summary + bounded exact recount, wire O(m) per partition,
    * constant in the vocabulary), documents are segmented into fixed
    * `lineWords`-word windows (the newline-free test-corpus convention;
    * real corpora pre-split on '\n' and call [[cleanLines]] directly),
    * and every line containing a discovered gram is dropped. Word and
    * punctuation rules are off so the composition is isolated to the
    * discovered blocklist. The blocklist is a bounded driver list —
    * exactly `k` grams whatever the corpus size. */
  def scrubDiscoveredBoilerplate(docs: DataFrame, textCol: String,
                                 idCol: String, n: Int = 2, k: Int = 25,
                                 lineWords: Int = 5,
                                 minKeptLines: Int = 1): DataFrame = {
    val block = HeavyHitters.topKNgrams(docs, textCol, n = n, k = k)
      .select("gram").collect().map(_.getString(0)).toSeq
    // token array materializes as a column first; the chunker is the
    // codegen'd WordChunks kernel (round-16)
    val lines = graft.functions.TextKernels.wordChunks(col("__tk"), lineWords)
    cleanLines(docs
      .select(col(idCol), split(trim(col(textCol)), "\\s+").as("__tk"))
      .select(col(idCol), lines.as("lines")), "lines", idCol,
      minWordsPerLine = 0, requireTerminalPunct = false,
      blocklist = block, minKeptLines = minKeptLines)
  }
}
