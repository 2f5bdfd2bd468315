package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the other FIRST operation a web-corpus
  * pipeline runs (beside [[TextExtract]]): crawl frontiers and WARC
  * dumps carry the same page under many URL spellings (case-shifted
  * hosts, default ports, tracking parameters, fragments, `www.`
  * prefixes, doubled slashes), and URL-level keep-first dedup is the
  * cheapest dedup rung there is — one projection plus a groupBy on a
  * slim string key, run BEFORE any content-based family pays a
  * shingle. Extension surface: the reference has no string processing
  * at all (its String type is load-only,
  * `/root/reference/src/csv_loader.cpp:151-155`).
  *
  * The [[TextExtract]] discipline verbatim: the canonicalization is a
  * decomposition (three `regexp_extract`s + `lower` on the
  * case-insensitive parts) followed by ONE ordered pattern list that
  * generates BOTH the Column chain and the DuckDB oracle SQL, so the
  * two spellings cannot drift. All patterns are RE2-compatible (no
  * lookaround, no backreferences in the PATTERN); replacements may
  * reference capture groups, spelled with a `¤N` placeholder that
  * renders as Java's `$N` on the Spark side and RE2's `\N` on the
  * DuckDB side — same group, two engine spellings, one source of
  * truth.
  *
  * Canonical form (stated contract, not guessed): scheme and
  * authority lowercased (path/query case is semantic and kept),
  * fragment dropped, `www.` prefix dropped, default ports dropped
  * (`:80` for http, `:443` for https — others are semantic and kept),
  * known tracking parameters dropped (utm_*, fbclid, gclid, msclkid,
  * mc_cid/mc_eid, igshid, ref_src, spm — case-insensitive), doubled
  * path slashes collapsed, trailing slash and dangling `?`/`&`
  * dropped. Out of scope (stated): percent-encoding normalization and
  * query-parameter SORTING (neither is expressible as a portable
  * regex replacement — reordering needs a parse), IDN/punycode, and
  * scheme folding (http and https are different resources). Inputs
  * without a `scheme://` prefix pass through UNCHANGED — relative
  * references and mailto:-style non-hierarchical URIs are not URLs
  * this canonicalizer understands, and a half-canonicalized non-URL
  * is worse than an untouched one. */
object UrlCanon {

  /** A hierarchical-URL prefix: `scheme://`. Rows not matching this
    * pass through untouched. */
  private[operators] val SchemePrefix = "^[A-Za-z][A-Za-z0-9+.-]*://"

  // Decomposition: scheme, authority (host[:port]), and
  // path-plus-query with the fragment dropped ([^#]* stops at the
  // first '#'). Each is one anchored regexp_extract, identical in
  // both engines; '' on no-match never surfaces because the
  // SchemePrefix guard runs first.
  private[operators] val SchemePat = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private[operators] val AuthPat = SchemePrefix + "([^/?#]*)"
  private[operators] val RestPat = SchemePrefix + "[^/?#]*([^#]*)"

  /** The canonicalization chain, applied in order to the recomposed
    * `lower(scheme)://lower(authority)rest` string. Order matters:
    * tracking-parameter removal runs before the `&`→`?` repair (the
    * repair exists precisely for a removed first parameter), slash
    * collapsing runs before the trailing-slash strip (so `/a//` folds
    * to `/a/` then to `/a`), and the dangling `?`/`&` cleanup runs
    * last (removal can leave a bare `?`). The slash-collapse pattern
    * excludes a preceding `:` so the `//` of `scheme://` survives. */
  private[operators] val Steps: Seq[(String, String)] = Seq(
    "^([a-z][a-z0-9+.-]*://)www\\." -> "¤1",
    "^(http://[^/?#:]*):80([/?]|$)" -> "¤1¤2",
    "^(https://[^/?#:]*):443([/?]|$)" -> "¤1¤2",
    "(?i)[?&](?:utm_[a-z0-9_]+|fbclid|gclid|msclkid|mc_cid|mc_eid|igshid|ref_src|spm)=[^&#]*" -> "",
    "^([a-z][a-z0-9+.-]*://[^?&]*)&" -> "¤1?",
    "([^:/])/{2,}" -> "¤1/",
    "/+(\\?|$)" -> "¤1",
    "[?&]+$" -> "")

  /** Canonical form of a URL column (see object scaladoc for the
    * contract). Pure projection — scan-shaped, zero shuffle at any
    * corpus size, whole-stage-codegen'd. */
  def canonicalizeUrl(c: Column): Column = {
    val s = c.cast("string")
    val recomposed = concat(
      lower(regexp_extract(s, SchemePat, 1)), lit("://"),
      lower(regexp_extract(s, AuthPat, 1)),
      regexp_extract(s, RestPat, 1))
    val canon = Steps.foldLeft(recomposed) { case (acc, (pat, repl)) =>
      regexp_replace(acc, pat, repl.replace("¤", "$"))
    }
    when(s.rlike(SchemePrefix), canon).otherwise(s)
  }

  /** The identical canonicalization as DuckDB SQL over the expression
    * `expr` — generated from the SAME decomposition patterns and
    * [[Steps]] list, so gate and oracle share one spelling. */
  def canonicalizeUrlSql(expr: String): String = {
    def q(str: String) = "'" + str.replace("'", "''") + "'"
    val recomposed =
      s"concat(lower(regexp_extract($expr, ${q(SchemePat)}, 1)), '://', " +
        s"lower(regexp_extract($expr, ${q(AuthPat)}, 1)), " +
        s"regexp_extract($expr, ${q(RestPat)}, 1))"
    val canon = Steps.foldLeft(recomposed) { case (acc, (pat, repl)) =>
      s"regexp_replace($acc, ${q(pat)}, ${q(repl.replace("¤", "\\"))}, 'g')"
    }
    s"CASE WHEN regexp_matches($expr, ${q(SchemePrefix)}) " +
      s"THEN $canon ELSE $expr END"
  }
}
