package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Corpus profiling — the "report card" a curation run starts and ends
  * with: per-slice (language × source, or any grouping) document counts,
  * token totals and means, discrete token-count quantiles, vocabulary
  * size, and type-token ratio. Run before curation to find degenerate
  * slices (a source whose p50 length is 3 tokens is boilerplate; a TTR
  * near zero is a template farm) and after to verify the filters did what
  * they claimed.
  *
  * Exactness contract: counts and sums are integers; means and TTR are
  * single divisions of integers rounded to 6dp; quantiles are the
  * discrete rank-`ceil(q·n)` values ([[Quality.groupQuantiles]] — integer
  * ranks, no interpolation) — everything bit-comparable across engines.
  *
  * Scale shape: one tokenize pass feeds three slim aggregates — (a) the
  * per-group count/sum (map-side combined), (b) the token-count HISTOGRAM
  * + per-group running counts for ALL quantiles in one pass (no per-row
  * window — [[Quality.groupQuantiles]]), and (c) the per-group distinct
  * term count (Spark's two-phase partial-distinct aggregate; the shuffle
  * carries (group, term) pairs, never text bodies). Group cardinality is
  * slices (languages × sources) — every join here is broadcast-sized.
  *
  * (The reference has no profiling surface at all — its aggregates are
  * the five SQL basics over one table, `/root/reference/src/warpdb.cpp` —
  * this is pipeline-extension surface.)
  */
object Profile {

  /** One row per group: n_docs, total_tokens, mean_tokens (6dp),
    * p25/p50/p75 token counts, vocab (distinct normalized terms),
    * ttr = vocab / total_tokens (6dp). Token counts use the repo-wide
    * normalized tokenization ([[TF.normText]] → [[TF.tokens]]). */
  def corpusProfile(df: DataFrame, groupCols: Seq[String],
                    textCol: String)
                   (implicit scope: CacheScope = CacheScope.global): DataFrame = {
    require(groupCols.nonEmpty, "corpusProfile needs at least one group column")
    val gs = groupCols.map(col)
    val toks = scope.cache(
      df.select(gs :+ TF.tokens(TF.normText(col(textCol))).as("__w"): _*)
        .withColumn("__n_tokens", size(col("__w")).cast("long")))
    val counts = toks.groupBy(gs: _*)
      .agg(count(lit(1)).as("n_docs"),
        sum("__n_tokens").as("total_tokens"))
      .withColumn("mean_tokens",
        round(col("total_tokens").cast("double") /
          col("n_docs").cast("double"), 6))
    val quants = Quality.groupQuantiles(
      toks.select(gs :+ col("__n_tokens"): _*), groupCols, "__n_tokens",
      Seq("p25_tokens" -> 0.25, "p50_tokens" -> 0.50, "p75_tokens" -> 0.75))
    val vocab = toks
      .select(gs :+ explode(col("__w")).as("__term"): _*)
      .filter(col("__term") =!= "")
      .groupBy(gs: _*)
      .agg(countDistinct(col("__term")).as("vocab"))
    counts
      .join(quants, groupCols)
      .join(vocab, groupCols)
      .withColumn("ttr",
        round(col("vocab").cast("double") /
          col("total_tokens").cast("double"), 6))
  }
}
