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

  /** Cross-SNAPSHOT drift report — "what changed between last month's
    * crawl and this month's", per group: exact doc/token counts with
    * integer deltas, the KMV-estimated n-gram vocabulary of each side,
    * and the estimated Jaccard overlap of the two vocabularies
    * ([[graft.functions.KmvSketch.estimateJaccard]], the theta-sketch
    * rule). A shrinking overlap with flat counts means the corpus is
    * CHURNING (same size, different content) — invisible to count
    * deltas alone; a vocabulary estimate rising much faster than tokens
    * flags a spam/template influx.
    *
    * Scale shape: each snapshot is scanned independently — one slim
    * cached projection feeding (a) a map-side-combined count/sum agg and
    * (b) the gram-hash KMV sketch agg (≤ k longs per partition-group on
    * the wire) — and only |groups|-row agg outputs with k-long arrays
    * ever join, so comparing two 100 TB snapshots ships two sketch
    * tables, never text, and never joins the corpora. Counts/deltas are
    * exact integers; the estimates are the [[graft.functions.KmvSketch]]
    * integer-count + single-division forms — everything oracle-exact.
    *
    * A group whose documents are all shorter than `n` tokens has an
    * EMPTY vocabulary sketch (estimate 0), not an absent row; a group
    * present in only one snapshot reports zeros on the other side. */
  def snapshotDrift(oldSnap: DataFrame, newSnap: DataFrame,
                    groupCol: String, textCol: String,
                    n: Int = 3, k: Int = 64)
                   (implicit scope: CacheScope = CacheScope.global): DataFrame = {
    import graft.functions.KmvSketch
    require(n > 0, "n must be positive")
    require(k > 0, "k must be positive")
    val emptySk = array().cast("array<bigint>")
    def side(df: DataFrame, tag: String): DataFrame = {
      // spread the RAW text first, shingle after the exchange (the
      // repo's measured spread-before-HOF cliff); cache: two consumers
      val slim = scope.cache(
        spread(df.select(col(groupCol).as("__g"), col(textCol).as("__t"))))
      val cnt = slim.groupBy("__g").agg(
        count(lit(1)).as(s"docs_$tag"),
        sum(TF.tokenCount(col("__t")).cast("long")).as(s"tokens_$tag"))
      val sk = slim
        .select(col("__g"), explode(TF.shingles(col("__t"), n)).as("__gram"))
        .select(col("__g"), KmvSketch.portableHash60(col("__gram")).as("__h"))
        .groupBy("__g").agg(KmvSketch.kmvSketch(col("__h"), k).as(s"sk_$tag"))
      cnt.join(sk, Seq("__g"), "left")
        .withColumn(s"sk_$tag", coalesce(col(s"sk_$tag"), emptySk))
    }
    val joined = side(oldSnap, "old")
      .join(side(newSnap, "new"), Seq("__g"), "full_outer")
    val a = coalesce(col("sk_old"), emptySk)
    val b = coalesce(col("sk_new"), emptySk)
    val un = KmvSketch.union(a, b, k)
    joined.select(
      col("__g").as(groupCol),
      coalesce(col("docs_old"), lit(0L)).as("docs_old"),
      coalesce(col("docs_new"), lit(0L)).as("docs_new"),
      (coalesce(col("docs_new"), lit(0L)) -
        coalesce(col("docs_old"), lit(0L))).as("docs_delta"),
      coalesce(col("tokens_old"), lit(0L)).as("tokens_old"),
      coalesce(col("tokens_new"), lit(0L)).as("tokens_new"),
      (coalesce(col("tokens_new"), lit(0L)) -
        coalesce(col("tokens_old"), lit(0L))).as("tokens_delta"),
      KmvSketch.estimate(a, k).as("est_vocab_old"),
      KmvSketch.estimate(b, k).as("est_vocab_new"),
      when(size(un) === 0, lit(0.0))
        .otherwise(KmvSketch.estimateJaccard(a, b, k)).as("est_jaccard"))
  }
}
