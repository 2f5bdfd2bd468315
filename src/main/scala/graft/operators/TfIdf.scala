package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** TF-IDF top-k term extraction per document — corpus-level keyword
  * scoring, the text-analysis step a training-data pipeline runs for
  * topic filtering and quality signals (beyond the reference, which has no
  * text operators at all).
  *
  * Plan shape at 100 TB: tokenize → per-(doc, term) count (partial+final
  * hash agg — the shuffle carries (doc, term) pairs, not text) → document
  * frequency as a second map-side-combined aggregate over the tf table →
  * broadcast-join the (small) df table back → per-doc top-k via
  * `row_number ≤ k`, which Spark executes as WindowGroupLimit (per-partition
  * partial top-k before the shuffle, like q23). `maxDf` drops
  * corpus-stopwords at the df stage — same skew/scale guard as
  * [[Dedup.ngramJaccard]]; a term in half the corpus scores ≈0 anyway.
  *
  * IDF uses the unsmoothed `ln(N / df)` (df ≥ 1 always, so no divide
  * hazard); scores are deterministic, ties broken by term.
  */
object TfIdf {

  def topTerms(docs: DataFrame, textCol: String, idCol: String, k: Int,
               maxDf: Long = Long.MaxValue)
              (implicit scope: CacheScope = CacheScope.global): DataFrame = {
    require(k > 0, "k must be positive")
    val toks = spread(docs.select(col(idCol).as("id"), col(textCol)))
      .select(col("id"),
        explode(TF.tokens(TF.normText(col(textCol)))).as("term"))
      .filter(col("term") =!= "")
    // cached: both the df aggregate and the scoring join consume it
    val tf = scope.cache(
      toks.groupBy("id", "term").agg(count(lit(1)).as("tf")))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    val n = docs.count().toDouble // one scalar aggregate, driver-held
    val scored = tf.join(df, "term")
      .select(col("id"), col("term"),
        (col("tf") * log(lit(n) / col("df"))).as("score"))
    val w = Window.partitionBy("id").orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("id").as(idCol), col("term"), col("score"))
  }

  /** Corpus-wide top-k word n-grams by occurrence count — the boilerplate
    * discovery pass (which exact phrases dominate the corpus feeds
    * blocklists and complements the span-level dedup in
    * [[Dedup.duplicateWindowSpans]], which removes repeats but doesn't
    * NAME them). Returns (gram, occurrences, n_docs), ordered
    * (occurrences DESC, gram ASC) — the tie-break makes the k-boundary
    * deterministic across engines.
    *
    * Plan shape at 100 TB: shingle-explode → per-(doc, gram) count
    * (partial+final hash agg — the shuffle carries (doc, gram) pairs with
    * counts, never text bodies) → per-gram occurrence/doc-frequency
    * rollup (map-side combined again) → global top-k as
    * `TakeOrderedAndProject` (each partition keeps its own k, the driver
    * merges P·k rows — no global sort ever materializes). */
  def topNgrams(docs: DataFrame, textCol: String, idCol: String,
                n: Int, k: Int): DataFrame = {
    require(n > 0, "n must be positive")
    require(k > 0, "k must be positive")
    spread(docs.select(col(idCol).as("id"), col(textCol)))
      .select(col("id"), explode(TF.shingles(col(textCol), n)).as("gram"))
      .groupBy("id", "gram").agg(count(lit(1)).as("c"))
      .groupBy("gram")
      .agg(sum("c").as("occurrences"), count(lit(1)).as("n_docs"))
      .orderBy(col("occurrences").desc, col("gram").asc)
      .limit(k)
  }
}
