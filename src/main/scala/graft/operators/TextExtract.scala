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
  * (content REMOVED — their text is code, not prose), and the common
  * named entities decode; numeric character references beyond
  * `&#39;`, CDATA sections, and pathological markup (a quoted `>`
  * inside an attribute, an unterminated `<foo`) are out of scope —
  * a full HTML5 tokenizer is a parser, not a projection, and corpus
  * pipelines route such documents to quarantine rather than trust a
  * regex to understand them. */
object TextExtract {

  /** The extraction chain, applied in order. Each step is
    * (RE2-compatible pattern, literal replacement) — no backreferences
    * (RE2 has none), no replacement metacharacters (portable between
    * Java's `$`-aware replaceAll and DuckDB's RE2). Order matters
    * twice: script/style/comment blocks go before the generic tag
    * strip (their CONTENT must vanish, not just their tags), and
    * `&amp;` decodes LAST so a literal `&amp;lt;` in the source
    * becomes the text `&lt;` rather than `<` (the standard
    * double-escape rule). */
  private[operators] val Steps: Seq[(String, String)] = Seq(
    "(?is)<script\\b[^>]*>.*?</script\\s*>" -> " ",
    "(?is)<style\\b[^>]*>.*?</style\\s*>" -> " ",
    "(?s)<!--.*?-->" -> " ",
    "<[^>]*>" -> " ",     // [^>] spans newlines by itself — no (?s) needed
    "(?i)&nbsp;" -> " ",
    "(?i)&lt;" -> "<",
    "(?i)&gt;" -> ">",
    "(?i)&quot;" -> "\"",
    "(?i)&(#39|apos);" -> "'",
    "(?i)&amp;" -> "&")

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
