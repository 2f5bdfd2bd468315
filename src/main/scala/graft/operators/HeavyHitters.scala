package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{MisraGries, TextFunctions => TF}

/** EXACT frequent items at corpus scale — "which items appear in at
  * least a φ fraction of the stream" — via the classic two-pass
  * sketch-then-count composition:
  *
  *   pass 1: one scan folds into a Misra–Gries summary
  *     ([[graft.functions.MisraGriesSummary]]) — O(m) state per
  *     partition, ≤ m (item, count) pairs on the wire per partition,
  *     NEVER the full vocabulary (the exact `groupBy(item).count`
  *     shuffle that t19 pays grows with the vocabulary; this one is
  *     CONSTANT in it). The MG guarantee — every item with frequency
  *     > N/(m+1) survives — makes the summary a provable SUPERSET of
  *     the φ-frequent items whenever m ≥ margin/φ, margin > 1.
  *   pass 2: exact counts of the ≤ m candidates only (the corpus scan
  *     filters against a driver-bounded candidate set — an InSet
  *     predicate, no join), then keep count ≥ ceil(φ·N).
  *
  * The output is therefore EXACTLY the φ-frequent item set with TRUE
  * counts — independent of partitioning and merge order, even though
  * the intermediate MG candidate set is not (that order-dependence is
  * why the raw summary alone could never be oracle-checked; the exact
  * second pass is what buys hash-match determinism, the d6/s11
  * calibrated-exactness discipline). Driver state is the candidate
  * list: ≤ m strings, bounded by construction (the DSIR-λ contract).
  *
  * At 100 TB: two scans, each shuffling only sketch partials / candidate
  * counts. The one-pass alternative (exact global count of everything,
  * t19) shuffles the whole (item, count) vocabulary — fine for n-grams
  * over a bounded vocab, unbounded for URLs/hosts/raw phrases, which is
  * the case this operator exists for.
  */
object HeavyHitters {

  /** All items of `itemCol` with count ≥ ceil(phi·N), with exact counts.
    * `margin` (> 1) sizes the sketch at m = ceil(margin/phi): the MG
    * deficit bound N/(m+1) < φN/margin keeps every φ-frequent item in
    * the candidate set with slack. NULL items are ignored (they are
    * absent from both passes). */
  def frequentItems(df: DataFrame, itemCol: String, phi: Double,
                    margin: Double = 2.0)
                   (implicit scope: CacheScope = CacheScope.global): DataFrame = {
    require(phi > 0.0 && phi <= 1.0, "phi must be in (0, 1]")
    require(margin > 1.0, "margin must exceed 1 for the superset guarantee")
    val m = math.ceil(margin / phi).toInt
    require(m <= (1 << 20),
      s"phi=$phi needs $m candidate counters — beyond the bounded-driver " +
        "contract; raise phi or lower margin")
    val items = scope.cache(
      df.select(col(itemCol).cast("string").as("item"))
        .filter(col("item").isNotNull))
    val head = items.agg(count(lit(1)),
      MisraGries.mgSummary(col("item"), m)).head()
    val n = head.getLong(0)
    val cands = head.getSeq[org.apache.spark.sql.Row](1).map(_.getString(0))
    if (n == 0L || cands.isEmpty)
      return items.limit(0).groupBy("item")
        .agg(count(lit(1)).as("cnt"))
    val thr = math.ceil(phi * n).toLong
    items.filter(col("item").isin(cands: _*))
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= lit(thr))
  }

  /** φ-frequent word n-grams of a text corpus — the scale path of the
    * exact top-k n-gram report (t19): boilerplate phrases, license
    * headers, and template fragments surface as heavy hitters long
    * before any top-k budget decides how many to look at. One gram
    * construction pass feeds both passes through the shared cache;
    * `spread` before the shingle HOF (the repo's measured cliff). */
  def frequentNgrams(docs: DataFrame, textCol: String, n: Int,
                     phi: Double, margin: Double = 2.0)
                    (implicit scope: CacheScope = CacheScope.global): DataFrame = {
    require(n > 0, "n must be positive")
    frequentItems(ngramItems(docs, textCol, n), "gram", phi, margin)
      .withColumnRenamed("item", "gram")
  }

  /** Per-GROUP exact φ-frequent items — "which phrases dominate each
    * language/source": pass 1 folds one MG summary PER GROUP in a
    * single map-side-combined agg (wire: ≤ m pairs per partition-group)
    * and collects the |groups|-row result — driver state is
    * groups × m entries, validated against the bounded-driver contract;
    * at higher group cardinality, thresholds would move to a broadcast
    * join (the temperatureSample note). Pass 2 recounts the UNION of
    * all groups' candidates exactly per (group, item) and keeps
    * count ≥ ceil(φ·N_group) — exact per group, because each group's
    * φ-frequent items are guaranteed inside its own candidate set, and
    * counting a candidate under extra groups can only add true
    * positives. Output: (group, item, cnt). */
  def frequentItemsByGroup(df: DataFrame, groupCol: String,
                           itemCol: String, phi: Double,
                           margin: Double = 2.0)
                          (implicit scope: CacheScope = CacheScope.global): DataFrame = {
    import graft.functions.MisraGries
    require(phi > 0.0 && phi <= 1.0, "phi must be in (0, 1]")
    require(margin > 1.0, "margin must exceed 1 for the superset guarantee")
    val m = math.ceil(margin / phi).toInt
    require(m <= (1 << 20),
      s"phi=$phi needs $m candidate counters per group — raise phi")
    val items = scope.cache(
      df.select(col(groupCol).as("group"),
          col(itemCol).cast("string").as("item"))
        .filter(col("item").isNotNull))
    val rows = items.groupBy("group")
      .agg(count(lit(1)).as("n"),
        MisraGries.mgSummary(col("item"), m).as("s"))
      .collect()
    val totalEntries = rows.map(
      _.getSeq[org.apache.spark.sql.Row](2).size.toLong).sum
    require(totalEntries <= (1L << 20),
      s"groups x m = $totalEntries candidate entries exceed the " +
        "bounded-driver contract — raise phi or reduce group cardinality")
    val cands = rows.flatMap(
      _.getSeq[org.apache.spark.sql.Row](2).map(_.getString(0)))
      .distinct.toSeq
    if (rows.isEmpty || cands.isEmpty)
      return items.limit(0).groupBy("group", "item")
        .agg(count(lit(1)).as("cnt"))
    val thrCol = rows.foldLeft(lit(Long.MaxValue): org.apache.spark.sql.Column) {
      case (acc, r) =>
        when(col("group") === lit(r.get(0)),
          lit(math.ceil(phi * r.getLong(1)).toLong)).otherwise(acc)
    }
    items.filter(col("item").isin(cands: _*))
      .groupBy("group", "item").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= thrCol)
  }

  /** The shared gram-construction projection (spread-before-HOF). */
  def ngramItems(docs: DataFrame, textCol: String, n: Int): DataFrame =
    spread(docs.select(col(textCol).as("__t")))
      .select(explode(TF.shingles(col("__t"), n)).as("gram"))

  /** One (group = "all", summary, n_items) row summarizing a corpus
    * slice's items — the ingest shape of the persisted store
    * ([[Sketches.saveMgSummaries]]/[[Sketches.appendMgSummaries]]):
    * daily slices summarize independently, append their row, and never
    * rescan each other. */
  def summarizeItems(df: DataFrame, itemCol: String, m: Int): DataFrame = {
    import graft.functions.MisraGries
    df.select(col(itemCol).cast("string").as("item"))
      .filter(col("item").isNotNull)
      .agg(MisraGries.mgSummary(col("item"), m).as("summary"),
        count(lit(1)).as("n_items"))
      .select(lit("all").as("group"), col("summary"), col("n_items"))
  }

  /** Exact φ-frequent items served FROM a persisted summary store: the
    * candidate set and total N come from the store (whose appended
    * slices must partition `corpus` — the d13/d16 index-family
    * contract), the recount runs over `corpus`. Because the merged
    * summary is a guaranteed superset whenever the stored capacity
    * satisfies m + 1 > 1/φ, the output equals [[frequentItems]] run
    * one-shot over the union — however the slices were batched, and
    * whatever merge order the store's fold used (the merge-order-
    * dependent estimates never reach the output). Single-group ("all")
    * stores only. */
  def frequentItemsFromStore(corpus: DataFrame, itemCol: String,
                             path: String, phi: Double)
                            (implicit scope: CacheScope = CacheScope.global): DataFrame = {
    require(phi > 0.0 && phi <= 1.0, "phi must be in (0, 1]")
    val spark = corpus.sparkSession
    val m = Sketches.mgCapacity(spark, path)
    require((m + 1).toDouble > 1.0 / phi,
      s"stored capacity m=$m cannot guarantee support phi=$phi — " +
        s"rebuild the store with m >= ${math.ceil(1.0 / phi).toInt}")
    val merged = Sketches.loadMgSummaries(spark, path).collect()
    require(merged.length == 1 && merged.head.getAs[String]("group") == "all",
      s"store at $path is not a single-group ('all') summary table")
    val head = merged.head
    val n = head.getAs[Long]("n_items")
    val cands = head.getSeq[org.apache.spark.sql.Row](
      head.fieldIndex("summary")).map(_.getString(0))
    val items = scope.cache(
      corpus.select(col(itemCol).cast("string").as("item"))
        .filter(col("item").isNotNull))
    if (n == 0L || cands.isEmpty)
      return items.limit(0).groupBy("item")
        .agg(count(lit(1)).as("cnt"))
    val thr = math.ceil(phi * n).toLong
    items.filter(col("item").isin(cands: _*))
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= lit(thr))
  }
}
