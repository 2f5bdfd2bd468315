package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — driver contract: one JSON line with per-query seconds.
  *
  * Queries are executed against the `noop` sink so the FULL plan runs
  * (a `count()` would let Catalyst prune projections and undercount work).
  * Robustness against measurement noise (JVM teardown of a preceding
  * process, GC, first-touch codegen):
  *   - a warm-up pass first runs every headline query at the smallest
  *     available scale factor, populating the Janino codegen cache and JIT —
  *     generated code depends on plan+schema, not data volume;
  *   - each query is then timed `reps` times at the target SF and the
  *     MEDIAN is reported — a single descheduling blip or GC pause cannot
  *     move the recorded number;
  *   - cache release happens OUTSIDE the timed window (unpersist
  *     bookkeeping is lifecycle, not query work).
  */
object Bench {
  /** Rounds 1–4 headline set — kept intact so its subtotal stays
    * comparable round-over-round (reported as `legacy_total`). */
  val legacy: Seq[String] = Seq(
    "q1_agg", "q2_filter_project", "q3_masked_map", "q5_join_agg",
    "q8_order_limit_offset", "q9_window", "q10_dialect_sql",
    "q23_topn_per_group", "q24_date_filter_join", "q28_funnel",
    "a9_salted_agg",
    "d1_exact_dedup", "d2_minhash_lsh", "d3_simhash", "d5_embedding_neardup",
    "s1_ann_brute", "t2_quality", "t3_langid", "m2_frame_sample")

  /** Representative headline set: scan+agg, filter+project, join chain,
    * sort+limit, window, dialect path, dedup (exact + minhash + simhash +
    * semantic), ANN (brute + PQ train/encode/ADC), text analysis (incl.
    * corpus-trained LM), global order, multimodal. Streaming excluded
    * (memory-sink lifecycle, not throughput-comparable). Round-5 cutover:
    * the four heaviest round-3/4 operators joined the headline —
    * `total` covers the full set, `legacy_total` the rounds-1–4 subset.
    * Round-6: the persisted-index SERVING paths joined (s11 partition-
    * pruned IVF, s12 IVFPQ ADC-in-probed-cells, d11 line dedup, d13
    * line dedup against the persisted index — the st13-shaped per-batch
    * cost in benchable batch form), so index-serving cost is tracked
    * round-over-round. Index BUILDS are excluded by construction:
    * sessionIndexDir builds once per (gate, sf) on the first rep and the
    * reported median of 3 reps is a build-free serving measurement. */
  val headline: Seq[String] = legacy ++ Seq(
    "t10_lm_logprob", "d10_semantic_dedup", "s6_ann_pq", "p6_shuffle_order",
    "s11_ann_ivf_persisted", "s12_ann_ivfpq_persisted",
    "d11_line_dedup", "d13_line_dedup_incremental",
    // round-7: substring dedup — full-batch span detection and the
    // incremental per-batch serve against the persisted window index
    "d14_duplicate_spans", "d16_spans_incremental",
    // round-7: NB classifier (train+score full corpus; the serve-only path
    // t14 shares the per-JVM model so its median would time pure serving),
    // the bucketed range join, the heap top-k aggregate (vs q23's window
    // formulation), and z-order clustering
    "t13_nb_classifier", "q43_interval_join", "q44_topk_agg", "p9_zorder",
    // round-7 batch 3: Gopher rule-set scan (single-pass, the per-rule
    // audit-column shape) and the per-language adaptive percentile cut
    // (histogram + running-count threshold, broadcast join back)
    "t15_gopher_rules", "t16_adaptive_threshold",
    // round-8: BM25 — one-shot (postings built in-flight) and serving
    // from the persisted index (build excluded: sessionIndexDir builds on
    // the warm-up rep) — and the per-domain token-budget selection
    // (groupRunningTotal path, untimed until now)
    "r1_bm25_topk", "r2_bm25_serve", "a14_domain_token_budget",
    // round-8: the full repetition-removal metric suite (zero-shuffle
    // per-doc sorted-run folds — the heaviest pure-scan pass in the repo)
    // and the corpus profile report (histogram multi-quantile + partial-
    // distinct vocab)
    "t17_repetition_suite", "t18_corpus_profile",
    // round-8 batch 2: top-ngrams (TakeOrdered global top-k), percentile
    // normalization (histogram cume_dist), stratified exact split
    // (groupRunningTotal ranks), best-of-cluster (CC + argmax agg)
    "t19_top_ngrams", "t20_percentile_normalize", "a15_stratified_split",
    "d17_best_of_cluster",
    // round-8 capstone: repetition gate → survivor percentile → tail cut
    // → stratified split, one plan
    "p10_curation_v3",
    // round-8 batch 3: decontamination serving (flag from the persisted
    // eval-shingle index — broadcast semi-join, corpus unshuffled) and
    // DSIR selection (zero-shuffle λ-fold scoring + Gumbel top-k; t24
    // serves from the per-JVM persisted model so the train cost lands on
    // the warm-up rep only)
    "t22_decontaminate_serve", "t24_dsir_select",
    // round-10: the hard-negative ANN serve (partition-pruned overfetch
    // + label filter), decontam serve from an appended index, BPE train
    // (bounded merge loop over the word vocabulary) and encode (dict
    // join, corpus never folds), and Kneser–Ney bigram scoring
    "s15b_hard_negatives_ann", "t25_decontaminate_append",
    "t26_bpe_train", "t27_bpe_encode", "t28_kn_bigram",
    // round-10 capstone: KN score → percentile gate → temperature mix →
    // BPE counts, one composed plan (t30/p13 are cost-covered by t27)
    "p12_curation_v4",
    // round-11: star-contraction CC under the same best-of-cluster gate
    // as d17 — tracks the label-vs-star serving tradeoff (NOTES r10
    // crossover table) round-over-round on identical input
    "d18_best_of_cluster_star",
    // round-11 serving completions: hybrid RRF entirely from persisted
    // indexes (BM25 postings + SQ8 codes, no corpus rescan), the BM25
    // append lifecycle served end-to-end, and the KMV distinct sketch
    // (one scan pass, ≤k longs per partition-group on the wire)
    "r4_hybrid_persisted", "r5_bm25_append", "t33_kmv_vocab",
    "t34_kmv_overlap", "t35_intradoc_line_dedup",
    // round-12 additions: SQ8 drift probe (two fused folds + scalar
    // aggs), the waterfill→token-budget capstone, the cross-snapshot
    // drift report (two independent scans, sketch-only join), and the
    // heavy-hitters pair (MG sketch pass + exact InSet recount; t39
    // serves the same answer from the persisted summary store)
    "s18_sq8_drift", "p13_curation_v5", "t37_snapshot_drift",
    "t38_frequent_ngrams", "t39_frequent_ngrams_store", "t40_countmin",
    "t41_frequent_ngrams_by_lang",
    // the discover→remove composition (top-k blocklist + line scrub)
    "p14_boilerplate_scrub",
    // embedding-space decontamination (broadcast eval, one corpus scan)
    "t42_semantic_decontaminate",
    // topic-balanced mix (centroid argmax projection + a16 mix chain)
    "p15_topic_balanced_mix",
    // round-12: representative-vocabulary (Zipf) twins of the serve
    // paths the 31-word fixture turns into fan-out ceilings — BM25
    // serve, decontamination serve, heavy-hitter discovery. These are
    // the rows where a serve-path regression is VISIBLE (candidate sets
    // are small corpus fractions); the adversarial originals stay
    // benched alongside as the worst case. Index/corpus builds land on
    // the warm-up rep (sessionIndexDir), so medians time serving.
    "z1_bm25_serve_zipf", "z2_contam_serve_zipf", "z3_hh_frequent_zipf",
    // round-12: exact quantiles by histogram refinement — the global
    // three-quantile pass over lineitem (the built-in `percentile`
    // buffers every value; this path's cost is ~log_bins passes of
    // scan+agg) and the grouped median served from the persisted
    // mergeable histogram store (store build lands on the warm-up rep)
    "t47_exact_quantiles", "t49_quantile_by_lang_store",
    // round-12: portable k-means (iters fused scans + slim mean aggs
    // during construction; the timed serve is the final fused argmax)
    "s19_kmeans",
    // round-13: serves from COMPACTED stores (fold + commit lands on
    // the warm-up rep; the medians time the single-slice read the
    // compaction exists to buy — t58 reads beside t49's two-slice
    // serve), the forced shuffle-join CM plan (the 10⁶-group regime's
    // shape, benched beside t40/t41's broadcast-side numbers), and
    // the real ImageIO pixel decode (synthesize + decode the corpus's
    // PNGs per rep — a genuinely codec-bound row)
    "t55_kmv_compacted", "t58_quantile_compacted",
    "t59_countmin_by_lang_shuffle", "m6_pixel_decode",
    // round-14: markup extraction + boilerplate scrub (the regex chain
    // is the heaviest pure-projection pass in the repo — benched as the
    // composition a web pipeline actually runs), the ANN recall floor
    // (three persisted serves + a brute reference — index builds land
    // on the warm-up rep via sessionIndexDir), and the kmeansCells
    // quality check (MLlib fit + two broadcast-join quality scans)
    "p18_html_extract_scrub", "s22_ann_recall_floor",
    "s23_kmeans_cells_quality")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      val elapsed =
        try {
          SparkEntry.queries(name)(spark, dir)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
        }
      // lifecycle, not query work — deliberately outside the timed window;
      // blocking so async eviction can't bleed into the next timed query
      graft.operators.CacheScope.global.release(blocking = true)
      elapsed
    }

    // Warm-up directory: smallest sibling sf* of the target (or an explicit
    // override) — falls back to the target itself, which doubles wall-clock
    // but stays correct on layouts without smaller siblings.
    val warmDir = sys.env.get("SPARK_GRAFT_WARM_DIR").getOrElse {
      val target = new java.io.File(sfDir)
      Option(target.getParentFile)
        .flatMap(p => Option(p.listFiles()))
        .getOrElse(Array.empty[java.io.File])
        .filter(f => f.isDirectory && f.getName.startsWith("sf") && f != target)
        .flatMap(f => f.getName.stripPrefix("sf").toDoubleOption.map(_ -> f.getAbsolutePath))
        .sortBy(_._1).headOption.map(_._2).getOrElse(sfDir)
    }
    // Optional focused run (idle re-measurement of a regression suspect,
    // NOT the driver contract): SPARK_GRAFT_BENCH_ONLY=t10_lm_logprob,...
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = headline.filter(n => only.forall(_.contains(n)))
    System.err.println(s"[bench] warm-up dir: $warmDir; reps: $reps; " +
      s"queries: ${selected.size}")
    selected.foreach(runOnce(_, warmDir))

    def median(xs: Seq[Double]): Double = {
      val ok = xs.filter(_ >= 0)
      if (ok.isEmpty) -1.0
      else ok.sorted.apply(ok.size / 2)
    }
    // Contention legibility: a shared box can inflate a wall-clock reading
    // severalfold with zero code change, and a bare median cannot prove it.
    // Record every rep AND the 1-min system load before/after the run, so a
    // contaminated artifact is self-diagnosing (spiky reps / high loadavg)
    // instead of needing an idle-box re-measurement to adjudicate.
    def loadAvg(): Double = {
      val v = java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage
      math.round(v * 100) / 100.0
    }
    // Millisecond precision: full-precision doubles bloat the JSON line
    // ~3× and the driver artifact keeps only a bounded tail of stdout —
    // sub-ms digits are measurement noise anyway.
    def ms(v: Double): Double = math.round(v * 1000) / 1000.0
    val loadBefore = loadAvg()
    val allReps = selected.map(n =>
      n -> Seq.fill(reps)(ms(runOnce(n, sfDir))))
    val loadAfter = loadAvg()
    val results = allReps.map { case (n, rs) => n -> median(rs) }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val repsJson = allReps.map { case (k, rs) =>
      "\"" + k + "\":" + rs.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = ms(results.map(_._2).filter(_ >= 0).sum)
    val minTotal = ms(allReps.map(_._2.filter(_ >= 0))
      .collect { case rs if rs.nonEmpty => rs.min }.sum)
    val legacyTotal = ms(results.filter(r => legacy.contains(r._1))
      .map(_._2).filter(_ >= 0).sum)
    // round-5's 23-query headline, for like-for-like round-over-round
    // comparison now that the round-6 serving entries widened the set
    val r5Set = legacy ++ Seq("t10_lm_logprob", "d10_semantic_dedup",
      "s6_ann_pq", "p6_shuffle_order")
    val r5Total = ms(results.filter(r => r5Set.contains(r._1))
      .map(_._2).filter(_ >= 0).sum)
    val line = s"""{"metric":"total","value":$total,"unit":"sec","legacy_total":$legacyTotal,"r5_total":$r5Total,"min_total":$minTotal,"loadavg_before":$loadBefore,"loadavg_after":$loadAfter,"queries":$qs,"reps":$repsJson,"sf":"$sfDir"}"""
    println(line)
    // Also persist the line: the stdout copy rides a log stream that WARN
    // noise and tail-truncation can eat (r6's artifact survived only
    // inside a 2000-char tail; the driver's BENCH_r13/r14 drops parsed
    // null for the same reason) — the file copy is always
    // machine-readable. It lands at the REPO ROOT so the end-of-round
    // commit carries it and per-query round-over-round comparison never
    // depends on the flaky stdout tail or the idle replicas.
    try {
      val out = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL_latest.json"))
      Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.writeString(out, line + "\n")
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] could not write bench JSON file: $e")
    }
    spark.stop()
  }
}
