package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** BM25 sparse retrieval — the lexical half of a training-data pipeline's
  * search stack (contamination lookup, quality-by-query probes, dedup
  * candidate mining), complementing the dense-vector ANN family in
  * [[Similarity]]. Beyond the reference, which has no text operators
  * (`/root/reference/include/warpdb.hpp` exposes only scan/filter/agg).
  *
  * Okapi BM25 (Robertson et al., TREC-3):
  * {{{
  *   score(q, d) = Σ_{t ∈ q}  idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  *   idf(t)      = ln(1 + (N − df + 0.5) / (df + 0.5))
  * }}}
  * Query terms are DISTINCT (standard Okapi drops query-side tf; our
  * "queries" are whole documents, where repeating a term shouldn't
  * multiply its vote).
  *
  * Plan shape at 100 TB — term-at-a-time over an inverted index:
  *   1. Build: tokenize → per-(doc, term) count (partial+final hash agg;
  *      the shuffle carries (doc, term) pairs, never text) → doc length +
  *      document frequency as second map-side-combined aggregates. The
  *      postings table is SLIM — (term, n_id, tf, dl, df): dl and df are
  *      denormalized in (the impact-file layout) so serving needs NO join
  *      back to per-doc or per-term side tables.
  *   2. Serve: the query batch's distinct term set is small (|Q|·terms) —
  *      broadcast it against the postings table, aggregate partial scores
  *      per (q_id, n_id), top-k via `row_number ≤ k` which Spark executes
  *      as WindowGroupLimit (per-partition partial top-k BEFORE the
  *      shuffle). The corpus-sized postings table is never shuffled at
  *      serve time.
  *
  * Determinism: per-term contributions are fixed expression trees (both
  * engines evaluate them bit-identically); their SUM is order-dependent in
  * doubles, so scores round to 6dp BEFORE the ranking window and ties
  * break by n_id — the t13 classifier discipline.
  *
  * `maxDf` drops corpus-stopwords at the df stage — the same skew guard as
  * [[TfIdf.topTerms]] and [[Dedup.ngramJaccard]]: a term in half the
  * corpus contributes idf ≈ ln(1+1) everywhere (no ranking signal) but
  * dominates the posting-join fan-out. Stats contract under `maxDf`: N
  * and avgdl are computed over the POST-filter postings — a document
  * whose every term was dropped leaves the searchable corpus entirely
  * (it can never score, so counting it in N would deflate every idf for
  * a doc no query reaches), while dl still counts the dropped terms
  * (length normalization measures the real document). With the default
  * `maxDf` nothing is filtered and N is simply the count of docs with
  * ≥1 token. The stored `_params` stats follow the same contract, and
  * both choices are pinned by tests.
  *
  * Query-batch contract: the serve entry points broadcast the batch's
  * DISTINCT term set against the postings — the whole point of the plan
  * shape (the corpus never shuffles). That assumes a serving-sized batch
  * (up to ~10⁶ distinct terms, single-digit MB broadcast). For a
  * corpus-scale "query" set (e.g. all-pairs contamination mining), pass
  * `broadcastTerms = false`: the hint is dropped and Catalyst/AQE pick
  * the join strategy from actual sizes.
  */
object Retrieval {

  private val Layout = "bm25_v1"

  /** Tokenize to (id, term) pairs, lowercased alnum words — the repo-wide
    * spelling that matches the DuckDB oracle's regexp chain. */
  private def termPairs(df: DataFrame, textCol: String, idCol: String,
                        outId: String): DataFrame =
    spread(df.select(col(idCol).as(outId), col(textCol)))
      .select(col(outId),
        explode(TF.tokens(TF.normText(col(textCol)))).as("term"))
      .filter(col("term") =!= "")

  /** The slim postings frame: one row per (corpus doc, term) with tf and
    * the denormalized dl/df — everything scoring needs. */
  private def postingsFrame(corpus: DataFrame, textCol: String,
                            idCol: String, maxDf: Long)
                           (implicit scope: CacheScope): DataFrame = {
    val tf = scope.cache(
      termPairs(corpus, textCol, idCol, "n_id")
        .groupBy("n_id", "term").agg(count(lit(1)).as("tf")))
    val dl = tf.groupBy("n_id").agg(sum("tf").as("dl"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    // df join is broadcast-able at moderate vocab; dl join co-partitions
    // with tf on n_id. Both are build-time-only costs.
    tf.join(df, "term").join(dl, "n_id")
      .select(col("term"), col("n_id"), col("tf"), col("dl"), col("df"))
  }

  /** Per-(query, doc) BM25 scores from a postings frame + corpus stats.
    * dl stays integral until the ratio — integer sums in double are exact,
    * so avgdl is bit-identical across engines regardless of partial-agg
    * order. */
  private def score(queries: DataFrame, postings: DataFrame,
                    textCol: String, idCol: String, k: Int,
                    nDocs: Double, avgdl: Double,
                    k1: Double, b: Double,
                    broadcastTerms: Boolean): DataFrame = {
    val qt0 = termPairs(queries, textCol, idCol, "q_id").distinct()
    val qterms = if (broadcastTerms) broadcast(qt0) else qt0
    val contrib =
      log(lit(1.0) + (lit(nDocs) - col("df") + lit(0.5)) /
            (col("df") + lit(0.5))) *
        col("tf") * lit(k1 + 1.0) /
        (col("tf") + lit(k1) *
          (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl)))
    val scored = postings.join(qterms, "term")
      .groupBy("q_id", "n_id")
      .agg(round(sum(contrib), 6).as("score"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("score").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank"), col("score"))
  }

  /** One-shot BM25 top-k: builds the postings in-flight. The per-call
    * build cost is the reason the persisted-index path below exists —
    * this form is for ad-hoc batches, the index for serving. */
  /** Two scalar aggregates over the cached slim postings, driver-held.
    * Fails CLEARLY (not with an opaque NPE off a null avgdl) when the
    * corpus produced no postings — empty input, all-empty/null text, or a
    * `maxDf` that dropped every term. */
  private def corpusStats(postings: DataFrame): (Double, Double) = {
    val stats = postings.select(col("n_id"), col("dl")).distinct()
      .agg(count(lit(1)).cast("double").as("n"),
        (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
      .head()
    require(stats.getDouble(0) > 0,
      "bm25: corpus produced no postings (empty corpus, all-empty/null " +
        "text, or maxDf dropped every term)")
    (stats.getDouble(0), stats.getDouble(1))
  }

  def bm25TopK(queries: DataFrame, corpus: DataFrame,
               textCol: String, idCol: String, k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               maxDf: Long = Long.MaxValue,
               broadcastTerms: Boolean = true)
              (implicit scope: CacheScope = CacheScope.global): DataFrame = {
    require(k > 0, "k must be positive")
    val postings = scope.cache(postingsFrame(corpus, textCol, idCol, maxDf))
    val (n, avgdl) = corpusStats(postings)
    score(queries, postings, textCol, idCol, k, n, avgdl, k1, b,
      broadcastTerms)
  }

  /** Persist the inverted index: `index` = the slim postings table
    * (term, n_id, tf, dl, df), `_params` = (layout, n_docs, avgdl, k1, b).
    * Corpus stats and knobs are INDEX METADATA — serving reads them
    * instead of re-deriving or taking caller literals (the calibrated-ANN
    * discipline). The `index` sub-dir name keys into
    * [[Similarity.compactIndex]]'s small-file compaction lifecycle. */
  def buildBm25Index(corpus: DataFrame, textCol: String, idCol: String,
                     path: String, k1: Double = 1.2, b: Double = 0.75,
                     maxDf: Long = Long.MaxValue): Unit = {
    implicit val scope: CacheScope = new CacheScope
    try {
      val spark = corpus.sparkSession
      import spark.implicits._
      val postings = scope.cache(postingsFrame(corpus, textCol, idCol, maxDf))
      val (n, avgdl) = corpusStats(postings)
      Similarity.dropStalePointer(path, "index")
      postings.write.mode("overwrite").parquet(s"$path/index")
      Seq((Layout, n, avgdl, k1, b))
        .toDF("layout", "n_docs", "avgdl", "k1", "b")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/_params")
    } finally scope.release()
  }

  /** A loaded serving handle: the postings frame plus the STORED corpus
    * stats/knobs. Streaming serves load once and score every micro-batch
    * against the same handle (cache `postings` for that — the
    * [[graft.streaming.Streaming]] NB-model discipline). */
  case class Bm25Model(postings: DataFrame, nDocs: Double, avgdl: Double,
                       k1: Double, b: Double)

  /** Load a persisted index: postings via the compaction-aware pointer
    * ([[Similarity.resolveDataDir]]), stats/knobs from `_params`. */
  def loadBm25(spark: SparkSession, indexPath: String): Bm25Model = {
    val p = Similarity.readParams(spark, indexPath).head()
    require(p.getAs[String]("layout") == Layout,
      s"index at $indexPath has layout ${p.getAs[String]("layout")}, " +
        s"expected $Layout")
    Bm25Model(
      spark.read.parquet(Similarity.resolveDataDir(indexPath, "index")),
      p.getAs[Double]("n_docs"), p.getAs[Double]("avgdl"),
      p.getAs[Double]("k1"), p.getAs[Double]("b"))
  }

  /** Score a query batch against a loaded handle — the per-micro-batch
    * body of a streaming serve. */
  def bm25TopKFromModel(queries: DataFrame, m: Bm25Model,
                        textCol: String, idCol: String, k: Int,
                        broadcastTerms: Boolean = true): DataFrame = {
    require(k > 0, "k must be positive")
    score(queries, m.postings, textCol, idCol, k, m.nDocs, m.avgdl, m.k1,
      m.b, broadcastTerms)
  }

  /** Serve a query batch from a persisted index. Reads the postings via
    * the compaction-aware pointer, broadcasts the query term set, and
    * scores with the STORED corpus stats — a frozen index scores appends
    * consistently with its build-time statistics. */
  def bm25TopKFromIndex(queries: DataFrame, indexPath: String,
                        textCol: String, idCol: String, k: Int,
                        broadcastTerms: Boolean = true): DataFrame =
    bm25TopKFromModel(queries, loadBm25(queries.sparkSession, indexPath),
      textCol, idCol, k, broadcastTerms)
}
