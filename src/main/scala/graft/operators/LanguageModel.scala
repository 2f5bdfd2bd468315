package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Corpus-trained unigram language-model scoring — the "perplexity gate" of
  * a training-data pipeline: documents whose tokens are improbable under the
  * corpus's own distribution (mojibake, boilerplate, hash dumps) score low
  * and get filtered. The classic heavy version trains KenLM offline; the
  * in-pipeline version used for first-pass filtering is exactly this — a
  * unigram model estimated from the corpus itself in one aggregate.
  *
  * (The reference has no text operators — strings are load-only,
  * `/root/reference/src/csv_loader.cpp:151-155`; this is part of the
  * training-data extension surface required by the build brief.)
  *
  * Plan shape at 100 TB:
  *   1. tokenize → per-(doc, token) term frequency: partial+final hash agg;
  *      the shuffle carries (doc, token, tf) triples, never text.
  *   2. vocabulary counts `c(w) = Σ tf`: a second map-side-combined
  *      aggregate over the tf table — shuffle is O(vocab), not O(tokens).
  *   3. total-token count N: one scalar aggregate, driver-held (same
  *      pattern as [[TfIdf.topTerms]]'s doc count).
  *   4. score join tf ⋈ vocab on token: the vocab side is tiny relative to
  *      the corpus (Zipf: even web-scale corpora have ≤ billions of distinct
  *      whitespace tokens vs trillions of occurrences), so AQE broadcasts it
  *      at any realistic scale. Skew on "the" is pre-collapsed: after step 1
  *      each document contributes a token at most ONCE, so the heaviest join
  *      key carries O(docs-containing-w) rows, not O(occurrences).
  *   5. per-doc weighted average: `Σ tf·ln(c/N) / Σ tf` — a final hash agg
  *      whose shuffle is O(docs) (a doc's tf rows are co-located after the
  *      step-1 aggregate, so partial aggregation collapses them map-side).
  *
  * No smoothing is needed for SELF-scoring: every scored token came from
  * the corpus, so c(w) ≥ 1 by construction. Scoring a FOREIGN corpus
  * against the model — the real quality-filter deployment, where held-out
  * text is scored against a reference model — goes through [[scoreWith]]'s
  * `oovFloor`: a left join whose missing counts coalesce to a pseudo-count
  * floor, so out-of-vocabulary tokens contribute ln(floor/N) instead of
  * silently dropping out of both numerator and denominator.
  */
object LanguageModel {

  /** Per-document average unigram log-probability under the corpus's own
    * empirical distribution. Returns (idCol, n_tokens, lm_logprob) with
    * lm_logprob = Σ tf·ln(c(w)/N) / Σ tf over the document's tokens
    * (natural log; tokens are lowercased whitespace tokens, matching
    * [[TF.tokens]] of the lowercased text so results line up with
    * `t1_token_count`'s n_tokens).
    */
  def unigramLogProb(docs: DataFrame, textCol: String, idCol: String)
                    (implicit scope: CacheScope = CacheScope.global): DataFrame = {
    val toks = spread(docs.select(col(idCol).as("id"), col(textCol)))
      .select(col("id"),
        explode(TF.tokens(lower(col(textCol)))).as("w"))
    // cached: feeds the vocab aggregate, the total count, and the score join
    val tf = scope.cache(
      toks.groupBy("id", "w").agg(count(lit(1)).as("tf")))
    val vocab = tf.groupBy("w").agg(sum("tf").as("c"))
    // one scalar aggregate, driver-held (metadata-sized, like TfIdf's N);
    // sum over zero rows is NULL — an empty corpus scores an empty frame,
    // not an NPE (n is then never read: tf is empty too)
    val n = totalCount(vocab)
    tf.join(vocab, "w")
      .groupBy("id")
      .agg(
        sum("tf").as("n_tokens"),
        (sum(col("tf") * log(col("c").cast("double") / lit(n))) /
          sum("tf").cast("double")).as("lm_logprob"))
      .select(col("id").as(idCol), col("n_tokens"), col("lm_logprob"))
  }

  /** Train the unigram model alone: (vocab (w, c), N). The training pass
    * is the same two map-side-combined aggregates as [[unigramLogProb]];
    * splitting it out lets a STREAM score against a batch-trained model —
    * the model is computed once at stream setup, each micro-batch pays
    * only its own tokenization + the broadcast vocab join. */
  def trainUnigram(docs: DataFrame, textCol: String): (DataFrame, Double) = {
    val toks = spread(docs.select(col(textCol)))
      .select(explode(TF.tokens(lower(col(textCol)))).as("w"))
    val vocab = toks.groupBy("w").agg(count(lit(1)).as("c"))
    (vocab, totalCount(vocab))
  }

  /** N = Σ c over the vocab — NULL-safe: an empty corpus yields 0.0
    * (sum over zero rows is NULL; getLong would NPE). */
  private def totalCount(vocab: DataFrame): Double =
    Option(vocab.agg(sum("c")).head.get(0))
      .map(_.asInstanceOf[Long].toDouble).getOrElse(0.0)

  /** Score documents against an already-trained unigram model — the
    * serving half of [[trainUnigram]].
    *
    * `oovFloor = None` (default) keeps the self-scoring semantics: tokens
    * absent from the vocabulary are dropped by the inner join. For a
    * FOREIGN corpus pass `Some(floor)`: the join turns into a LEFT join
    * and out-of-vocabulary counts coalesce to the pseudo-count `floor`
    * (e.g. 0.5 — half an observation), so OOV tokens contribute
    * ln(floor/N) and still count in the `n_tokens` denominator — the
    * smoothing a held-out-perplexity filter needs.
    *
    * The vocab side carries no broadcast hint by default: self-trained
    * vocabularies are Zipf-small, but this is the serving path for
    * ARBITRARY models, and a forced broadcast of a huge vocab would OOM
    * the driver. AQE broadcasts small vocabs on its own; callers that
    * KNOW the vocab is tiny (e.g. the per-micro-batch streaming scorer)
    * pass `hintBroadcast = true`.
    * Output schema matches [[unigramLogProb]]. */
  def scoreWith(docs: DataFrame, textCol: String, idCol: String,
                vocab: DataFrame, n: Double,
                oovFloor: Option[Double] = None,
                hintBroadcast: Boolean = false): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      explode(TF.tokens(lower(col(textCol)))).as("w"))
    val tf = toks.groupBy("id", "w").agg(count(lit(1)).as("tf"))
    val v = if (hintBroadcast) broadcast(vocab) else vocab
    val withC = oovFloor match {
      case Some(floor) => tf.join(v, Seq("w"), "left")
        .withColumn("__c", coalesce(col("c").cast("double"), lit(floor)))
      case None => tf.join(v, Seq("w"))
        .withColumn("__c", col("c").cast("double"))
    }
    withC
      .groupBy("id")
      .agg(
        sum("tf").as("n_tokens"),
        (sum(col("tf") * log(col("__c") / lit(n))) /
          sum("tf").cast("double")).as("lm_logprob"))
      .select(col("id").as(idCol), col("n_tokens"), col("lm_logprob"))
  }

  /** Per-document average bigram conditional log-probability
    * `Σ tf·ln(c(w1,w2)/c(w1·)) / Σ tf` where `c(w1·)` counts bigrams whose
    * context is w1 — the maximum-likelihood bigram model, the shape real
    * perplexity filters (KenLM-style) use. Documents with fewer than two
    * tokens have no bigrams and are absent from the output.
    *
    * Same plan skeleton as [[unigramLogProb]] with one extra aggregate:
    * bigrams come out of a single `zip_with` over the token array (codegen,
    * no self-join), per-(doc, bigram) counts collapse map-side, the bigram
    * vocabulary and its context marginals are two more O(vocab) aggregates,
    * and the score join is again bounded by docs-per-bigram after the
    * collapse. No smoothing for the same reason: every scored bigram came
    * from the corpus.
    */
  def bigramLogProb(docs: DataFrame, textCol: String, idCol: String)
                   (implicit scope: CacheScope = CacheScope.global): DataFrame = {
    val toks = spread(docs.select(col(idCol).as("id"), col(textCol)))
      .select(col("id"), TF.tokens(lower(col(textCol))).as("w"))
      .filter(size(col("w")) >= 2)
    // cached: feeds the bigram vocab, the context marginals, and the join.
    // round-16: per-(doc, bigram) counts fold IN-ROW via the codegen'd
    // runs kernel — the old explode → groupBy(id, b) shuffled one row per
    // distinct (doc, bigram) with the bigram string on the wire (the KN
    // path's shape, same swap)
    val tfb = scope.cache(
      toks.select(col("id"), explode(graft.functions.TextKernels
          .gramRuns(col("w"), 2, dropEmpty = false).getField("runs"))
          .as("__r"))
        .select(col("id"), col("__r.item").as("b"),
          col("__r.cnt").as("tf")))
    val cb = scope.cache(tfb.groupBy("b").agg(sum("tf").as("c")))
    val ctx = cb
      .groupBy(element_at(split(col("b"), " "), 1).as("w1"))
      .agg(sum("c").as("cc"))
    tfb.join(cb, "b")
      .withColumn("w1", element_at(split(col("b"), " "), 1))
      .join(ctx, "w1")
      .groupBy("id")
      .agg(
        sum("tf").as("n_bigrams"),
        (sum(col("tf") * log(col("c").cast("double") / col("cc").cast("double"))) /
          sum("tf").cast("double")).as("lm2_logprob"))
      .select(col("id").as(idCol), col("n_bigrams"), col("lm2_logprob"))
  }

  /** Per-document average INTERPOLATED KNESER–NEY bigram log-probability
    * (Kneser & Ney '95; the smoothing real n-gram perplexity filters
    * ship — KenLM's default). The ML bigram model ([[bigramLogProb]])
    * overfits rare contexts; KN discounts every observed bigram by a
    * fixed `discount` D and redistributes the held-out mass to a
    * CONTINUATION unigram — how many distinct contexts a word follows,
    * not how often it occurs ("Francisco" is frequent but only ever
    * follows "San", so its continuation probability is tiny):
    *
    *   P(w2|w1) = max(c(w1,w2) − D, 0)/c(w1·)
    *            + (D · N1+(w1·)/c(w1·)) · N1+(·w2)/N1+(··)
    *
    * All four statistics are closed-form aggregates over the cached
    * bigram vocabulary — distinct-successor and distinct-context counts
    * are `count(*)` over the (w1,w2) type table, no extra corpus pass —
    * which is what makes the smoothing fully oracle-checkable
    * relationally (gate t28). Same plan skeleton and scale shape as
    * [[bigramLogProb]]: the corpus is scanned once into per-(doc,bigram)
    * counts; every later frame is vocabulary-sized. Scoring corpus =
    * training corpus here, so every scored bigram was observed and the
    * discounted term never bottoms out to the bare continuation weight
    * alone; a train/serve split would reuse [[scoreWith]]'s OOV floor
    * discipline. Documents with fewer than two tokens are absent. */
  def kneserNeyBigramLogProb(docs: DataFrame, textCol: String,
                             idCol: String, discount: Double = 0.75)
                            (implicit scope: CacheScope = CacheScope.global): DataFrame = {
    require(discount > 0 && discount < 1, "discount must be in (0,1)")
    val toks = spread(docs.select(col(idCol).as("id"), col(textCol)))
      .select(col("id"), TF.tokens(lower(col(textCol))).as("w"))
      .filter(size(col("w")) >= 2)
    // per-(doc, bigram) counts fold IN-ROW — the old groupBy(id, b)
    // shuffled one row per distinct (doc, bigram) with the bigram string
    // on the wire; the count is a per-document quantity, so it folds
    // where the document already is (guide §2.3, aggregate before you
    // shuffle). Round-16: the zip_with window build + interpreted
    // sort/run-fold HOF chain is ONE codegen'd kernel with identical
    // sorted run order (TextKernelsSpec pins value equality).
    val tfb = scope.cache(
      toks.select(col("id"), explode(graft.functions.TextKernels
          .gramRuns(col("w"), 2, dropEmpty = false).getField("runs"))
          .as("__r"))
        .select(col("id"), col("__r.item").as("b"),
          col("__r.cnt").as("tf")))
    // the bigram TYPE table: counts plus both projections of the key
    val parts = scope.cache(tfb.groupBy("b").agg(sum("tf").as("c"))
      .select(col("b"), col("c"),
        element_at(split(col("b"), " "), 1).as("w1"),
        element_at(split(col("b"), " "), 2).as("w2")))
    // c(w1·) and N1+(w1·): context totals and distinct-successor counts
    val ctx = parts.groupBy("w1")
      .agg(sum("c").as("cc"), count(lit(1)).as("n1f"))
    // N1+(·w2): distinct-context counts per continuation word
    val cont = parts.groupBy("w2").agg(count(lit(1)).as("nctx"))
    // N1+(··): total bigram types — one bounded action over the cached
    // type table (a scalar; embedding it as a literal keeps the score a
    // single projection instead of a cross join)
    val nTypes = parts.count().toDouble
    val d = lit(discount)
    val p = (greatest(col("c").cast("double") - d, lit(0.0)) /
        col("cc").cast("double")) +
      ((d * col("n1f").cast("double") / col("cc").cast("double")) *
        (col("nctx").cast("double") / lit(nTypes)))
    tfb.join(parts, "b")
      .join(ctx, "w1")
      .join(cont, "w2")
      .groupBy("id")
      .agg(
        sum("tf").as("n_bigrams"),
        (sum(col("tf") * log(p)) / sum("tf").cast("double"))
          .as("kn_logprob"))
      .select(col("id").as(idCol), col("n_bigrams"), col("kn_logprob"))
  }
}
