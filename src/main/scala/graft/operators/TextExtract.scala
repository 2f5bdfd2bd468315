package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML/markup → text extraction — the FIRST operation every
  * web-corpus pipeline runs, completing the ingestion story in front
  * of the quality/dedup stack (language ID, Gopher rules, LM filters
  * and the dedup families all assume clean text; p14's boilerplate
  * scrub starts AFTER markup is gone). Extension surface: the
  * reference has no text processing at all (its String type is
  * load-only, `/root/reference/src/csv_loader.cpp:151-155`).
  *
  * Deliberately RELATIONAL: one chain of `regexp_replace` steps over
  * the text column — scan-shaped, zero shuffle at any corpus size,
  * whole-stage-codegen'd, and exactly reproducible in any engine with
  * RE2-compatible regexes (the PII-redaction discipline: the oracle
  * RUNS the same scrub). The pattern chain is the single source of
  * truth: [[htmlToText]] folds it into a Column and [[htmlToTextSql]]
  * folds the SAME list into oracle SQL, so the two spellings cannot
  * drift (the ZOrder quantizeSql rule).
  *
  * Scope (stated, not guessed): tags, comments, script/style blocks
  * (content REMOVED — their text is code, not prose), the common
  * named entities, and the top-frequency numeric character references
  * (decimal AND hex spellings of the web-corpus punctuation set:
  * curly quotes, dashes, ellipsis, nbsp, plus the NCR spellings of
  * the five named entities — real corpora are full of `&#8217;`-class
  * NCRs, so "named entities only" left extracted text dirty). NCRs
  * outside that literal map, CDATA sections, and pathological markup
  * (a quoted `>` inside an attribute, an unterminated `<foo`) remain
  * out of scope — a general `chr(capture)` decode is not expressible
  * as a portable regex replacement in both engines, a full HTML5
  * tokenizer is a parser, not a projection, and corpus pipelines
  * route such documents to quarantine rather than trust a regex to
  * understand them. */
object TextExtract {

  /** The extraction chain, applied in order. Each step is
    * (RE2-compatible pattern, literal replacement) — no backreferences
    * (RE2 has none), no replacement metacharacters (portable between
    * Java's `$`-aware replaceAll and DuckDB's RE2). Order matters
    * twice: script/style/comment blocks go before the generic tag
    * strip (their CONTENT must vanish, not just their tags), and
    * `&amp;`/`&#38;`/`&#x26;` decode LAST so a literal `&amp;lt;` (or
    * `&#38;#60;`) in the source becomes the text `&lt;` (`&#60;`)
    * rather than `<` (the standard double-escape rule: exactly one
    * level collapses). Each named entity decodes alongside its decimal
    * and hex NCR spellings — same character, three spellings, one
    * replacement — and the top web-corpus punctuation NCRs (curly
    * quotes, dashes, ellipsis) decode to their literal codepoints.
    * Hex NCR digits are case-insensitive via the same `(?i)` the
    * entity names already need. */
  private[operators] val Steps: Seq[(String, String)] = Seq(
    "(?is)<script\\b[^>]*>.*?</script\\s*>" -> " ",
    "(?is)<style\\b[^>]*>.*?</style\\s*>" -> " ",
    "(?s)<!--.*?-->" -> " ",
    "<[^>]*>" -> " ",     // [^>] spans newlines by itself — no (?s) needed
    "(?i)&(nbsp|#160|#xa0);" -> " ",
    "(?i)&(lt|#60|#x3c);" -> "<",
    "(?i)&(gt|#62|#x3e);" -> ">",
    "(?i)&(quot|#34|#x22);" -> "\"",
    "(?i)&(#39|apos|#x27);" -> "'",
    "(?i)&(#8216|#x2018);" -> "‘",
    "(?i)&(#8217|#x2019);" -> "’",
    "(?i)&(#8220|#x201c);" -> "“",
    "(?i)&(#8221|#x201d);" -> "”",
    "(?i)&(#8211|#x2013);" -> "–",
    "(?i)&(#8212|#x2014);" -> "—",
    "(?i)&(#8230|#x2026);" -> "…",
    "(?i)&(amp|#38|#x26);" -> "&")

  /** Markup-stripped, entity-decoded, whitespace-collapsed text of a
    * string column. */
  def htmlToText(c: Column): Column = {
    val stripped = Steps.foldLeft(c.cast("string")) {
      case (acc, (pat, repl)) => regexp_replace(acc, pat, repl)
    }
    trim(regexp_replace(stripped, "\\s+", " "))
  }

  /** The identical chain as DuckDB SQL over the expression `expr` —
    * generated from [[Steps]], so gate and oracle share one spelling. */
  def htmlToTextSql(expr: String): String = {
    def q(s: String) = "'" + s.replace("'", "''") + "'"
    val stripped = Steps.foldLeft(expr) {
      case (acc, (pat, repl)) =>
        s"regexp_replace($acc, ${q(pat)}, ${q(repl)}, 'g')"
    }
    s"trim(regexp_replace($stripped, '\\s+', ' ', 'g'))"
  }
}
