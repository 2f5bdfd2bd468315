package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-regression tripwire (round-8 verdict #6): the p10 cliff — a
  * predicate pushed through an expensive projection turned 3 s into
  * 106 s with zero correctness signal — was caught by the BENCH, rounds
  * after the commit that caused it. This spec catches that class of
  * regression at test time: for each pinned headline gate, the physical
  * plan is reduced to a DIGEST of the operator kinds that matter for
  * scale — shuffle exchanges, broadcast exchanges, cartesian products,
  * per-row window operators, sorts — and compared against a golden
  * value. An unexplained Exchange (new shuffle), CartesianProduct
  * (broadcast fell through), or WindowExec (per-row ranking snuck back
  * into a histogram path) fails here, at commit time.
  *
  * Full-text plan diffs would churn on every cosmetic change; operator
  * KIND counts are stable across renames/reorders but move exactly when
  * the plan shape regresses. When a count changes INTENTIONALLY (a gate
  * redesigned), update the golden entry in the same commit — the diff
  * then documents the plan change for review instead of hiding it.
  *
  * Digests are computed with AQE off (the static plan is the reviewable
  * artifact; AQE's runtime re-plans only ever remove exchanges) at the
  * test SF — counts are data-independent for these plans (no
  * stats-driven join re-orders at this scale).
  */
class PlanDigestSpec extends AnyFunSuite {
  import SparkSpec.{spark, sf}

  private case class Digest(shuffles: Int, broadcasts: Int,
                            cartesians: Int, windows: Int, sorts: Int) {
    override def toString =
      s"Digest($shuffles, $broadcasts, $cartesians, $windows, $sorts)"
  }

  /** The gates whose plan shape is load-bearing at 100 TB: the heaviest
    * bench entries, every histogram-not-window path, and the
    * persisted-index serves. */
  private val golden: Map[String, Digest] = Map(
    // scan+agg / filter+project / join / sort+limit / top-k
    "q1_agg"                  -> Digest(1, 0, 0, 0, 0),
    "q2_filter_project"       -> Digest(0, 0, 0, 0, 0),
    "q5_join_agg"             -> Digest(1, 3, 0, 0, 0),
    "q8_order_limit_offset"   -> Digest(0, 0, 0, 0, 0),
    "q23_topn_per_group"      -> Digest(1, 0, 0, 1, 2),
    // dedup family: exact groupBy + winner join-back, line-hash serve,
    // span detection (slim window rows, winner broadcast)
    "d1_exact_dedup"          -> Digest(2, 0, 0, 0, 0),
    // r15: −1 broadcast — keepByWinners now unpacks the winner structs
    // directly instead of join-backing occ⋈winners to decide membership
    // r16: −2 sorts — the per-hash winner is the occEnc encoded-long
    // min (HashAggregate) instead of min(struct), whose unsortable
    // buffer forced a SortAggregate over every occurrence row
    "d11_line_dedup"          -> Digest(4, 1, 0, 0, 0),
    "d14_duplicate_spans"     -> Digest(4, 1, 0, 2, 1),
    // persisted-index serving: pruned IVF, hard negatives, BM25, contam
    // (windows here are query-side rank/top-k partitioned by q_id — the
    // per-row-window ban applies to CORPUS-wide ranking, not these)
    "s11_ann_ivf_persisted"   -> Digest(2, 2, 0, 2, 4),
    "s15b_hard_negatives_ann" -> Digest(2, 3, 0, 3, 4),
    // v2 appendable layout: df re-derives at serve from the cached
    // candidate slice. Reference-weighted counting multiplies the TINY
    // query-tokenize subplan (2 shuffles, ≤|Q·terms| rows) by its 3
    // cache references and the slice's broadcast semi-join by 2 — the
    // corpus-sized postings path still has ZERO exchanges (PlanSpec pins
    // that directly); +1 real shuffle is the serve-side df agg
    "r2_bm25_serve"           -> Digest(9, 4, 0, 1, 2),
    "t22_decontaminate_serve" -> Digest(6, 5, 0, 0, 0),
    // histogram-instead-of-window paths: ZERO WindowExec is the whole
    // point of the t16/t20/a15 design — a 1 in the windows column here
    // is the exact regression the round-7 verdict flagged
    // r16: −1 shuffle each — the per-group totals aggregate is gone
    // (they ride the running-total pass's driver-side partial sums and
    // join back as a driver-built broadcast frame)
    "t16_adaptive_threshold"  -> Digest(1, 2, 0, 0, 0),
    "a15_stratified_split"    -> Digest(0, 1, 0, 0, 0),
    // zero-/one-shuffle scan passes (Gopher rules, repetition folds,
    // DSIR select — the single shuffle is spread()'s round-robin)
    "t15_gopher_rules"        -> Digest(0, 0, 0, 0, 0),
    "t17_repetition_suite"    -> Digest(1, 0, 0, 0, 0),
    "t24_dsir_select"         -> Digest(1, 0, 0, 0, 0),
    // the composed capstone: the heavy percentile/split phases run as
    // bounded driver-side actions during construction, so the final
    // plan is the cached fold + broadcast joins (r16: −1 shuffle — the
    // stratifiedSplit totals aggregate now rides the running-total
    // pass's driver-side sums)
    "p10_curation_v3"         -> Digest(0, 1, 0, 0, 0),
    // round-10: BPE encode (dict join over distinct words — corpus text
    // never folds) and Kneser–Ney scoring (type-table joins, no window).
    // Cached subplans are counted once per InMemoryTableScan REFERENCE
    // (tfb feeds 2 consumers, the KN type table 3), so these totals are
    // deliberately reference-weighted — stable, and a new consumer of a
    // cached frame is itself a plan change worth reviewing
    "t27_bpe_encode"          -> Digest(5, 1, 0, 0, 0),
    // r15: 14 → 10 shuffles — per-(doc, bigram) counts fold IN-ROW
    // (sortedRuns) instead of a groupBy(id, b) exchange; reference-
    // weighted ×2 via tfb's cached consumers, plus partial/final pairs
    "t28_kn_bigram"           -> Digest(10, 3, 0, 0, 0),
    // round-10 serving batch: SQ8 persisted serve, hybrid-from-indexes
    // (no corpus rescan), Bloom-prefiltered decontamination (broadcast-
    // free), C4 line cleaning (zero-join scan pass), payload near-dup
    // (binary column never shuffles — the sig agg's shuffle carries
    // (id, 8-byte sig))
    "s17_ann_sq8_persisted"   -> Digest(2, 3, 0, 2, 2),
    // lexical side inherits r2's v2-layout reference-weighted deltas
    "r4_hybrid_persisted"     -> Digest(11, 7, 0, 4, 5),
    // t31 vs t22 (6, 5): the Bloom path's whole point is FEWER
    // broadcasts — a broadcast reappearing here means the
    // broadcast-free claim regressed
    "t31_bloom_decontaminate" -> Digest(4, 3, 0, 0, 0),
    "t32_c4_line_filters"     -> Digest(1, 0, 0, 0, 0),
    "m5_payload_neardup"      -> Digest(5, 2, 0, 0, 0),
    // KMV distinct sketch: spread's round-robin + the sketch agg's
    // partial/final exchange — a window or extra shuffle here means the
    // one-pass O(k)-state design regressed toward an exact distinct
    "t33_kmv_vocab"           -> Digest(2, 0, 0, 0, 0),
    // intra-doc line dedup: ONE projection pass — spread's round-robin
    // is the only exchange; any join/window/extra shuffle means the
    // in-row dedup regressed toward an exploded corpus-wide pass
    "t35_intradoc_line_dedup" -> Digest(1, 0, 0, 0, 0),
    // round-11: snapshot drift — all exchanges here move |groups|-row
    // agg outputs and k-long sketch arrays (two independent corpus-side
    // scans feed 4 tiny aggs; the full-outer meet is the 2-sort SMJ);
    // corpus text never joins anything. The heavy-hitter pair's served
    // plan is spread + the exact InSet recount agg — the MG sketch pass
    // runs as a bounded driver action during construction; a window or
    // join appearing here means the recount regressed toward a
    // vocabulary-wide rank. p13's served plan is the RDD-backed
    // range-exchange cumsum (exchanges live below the RDD boundary).
    "t37_snapshot_drift"      -> Digest(8, 2, 0, 0, 2),
    "t38_frequent_ngrams"     -> Digest(2, 0, 0, 0, 0),
    "t39_frequent_ngrams_store" -> Digest(2, 0, 0, 0, 0),
    "p13_curation_v5"         -> Digest(0, 0, 0, 0, 0),
    // CM estimate: the probe batch (spread + distinct + its own tiny
    // agg) broadcasts into the cached counter table, then the min agg —
    // all 4 shuffles move probe-batch/counter-table rows, never corpus;
    // broadcasts must stay ≥ 1 (losing it means the metadata-sized
    // counter table started shuffling against the probe side)
    "t40_countmin"            -> Digest(4, 1, 0, 0, 0),
    // grouped recount: spread + the (group, item) exact count agg
    "t41_frequent_ngrams_by_lang" -> Digest(2, 0, 0, 0, 0),
    // round-12: grouped CM — same shape as t40 with a lang key riding
    // every exchange; the counter table must stay on the broadcast side
    "t43_countmin_by_lang"    -> Digest(4, 1, 0, 0, 0),
    // grouped CM served from the persisted store: the inline build agg
    // is replaced by the store's dedup+sum (metadata-sized rows) — the
    // counter side must STAY broadcast (the auto-probe picks it at
    // language cardinality; this entry pins that the probe never
    // changes the plan)
    "t46_countmin_by_lang_store" -> Digest(4, 1, 0, 0, 0),
    // t43's forced 10⁶-group plan: the probe join exchanges
    // (group, row, cell) on BOTH sides instead of broadcasting the
    // counter table — 2 more shuffles, 0 broadcasts, same answer
    "t59_countmin_by_lang_shuffle" -> Digest(6, 0, 0, 0, 0),
    // grouped store serve: spread + (group, item) recount agg + the
    // stored-totals threshold aggregate, which must arrive by BROADCAST
    // (a shuffle join here means metadata-sized thresholds started
    // exchanging the counted corpus). 4th exchange since mg_v2: the
    // load's per-(slice, group) replay dedup is its own aggregate —
    // it moves ONLY summary rows (≤ slices·groups), never the corpus
    "t44_frequent_by_lang_store" -> Digest(4, 1, 0, 0, 0),
    // t41's forced high-cardinality plan: candidate list and thresholds
    // both ship as broadcasts (left-semi + thr join) instead of
    // InSet/when-chain literals — exchanges must still move only
    // (group, item, cnt) rows. 4 = spread's round-robin counted once
    // per reference of the cached items (recount + threshold agg both
    // consume it) + the two tiny agg exchanges.
    "t45_frequent_by_lang_bcast" -> Digest(4, 2, 0, 0, 0),
    // blocklist discovery is a bounded driver action (top-k collect);
    // the served plan is the zero-join cleanLines projection — spread's
    // round-robin must stay the ONLY exchange
    "p14_boilerplate_scrub"   -> Digest(1, 0, 0, 0, 0),
    // semantic decontam: spread + the broadcast nested-loop against the
    // bounded eval side — a shuffle join here means the benchmark side
    // stopped broadcasting
    "t42_semantic_decontaminate" -> Digest(1, 1, 0, 0, 0),
    // topic mix: the centroid argmax is a pure projection over spread
    // partitions; the mix rank is the RDD-backed cumsum — no window,
    // no join in the served plan
    "p15_topic_balanced_mix"  -> Digest(0, 0, 0, 0, 0),
    // exact quantiles: every refinement pass is a bounded driver action
    // (one scan + one ≤ states·bins-row hash agg) during construction;
    // the served frame is the collected (group, value) result — any
    // operator appearing here means the exact-percentile path regressed
    // toward Spark's buffer-everything `percentile` or a full sort
    "t47_exact_quantiles"     -> Digest(0, 0, 0, 0, 0),
    "t48_quantile_by_lang"    -> Digest(0, 0, 0, 0, 0),
    "t49_quantile_by_lang_store" -> Digest(0, 0, 0, 0, 0),
    "t50_weighted_quantile_by_lang" -> Digest(0, 0, 0, 0, 0),
    "t51_mad_by_lang"         -> Digest(0, 0, 0, 0, 0),
    "t52_quantile_bounds_sketch" -> Digest(0, 0, 0, 0, 0),
    "t53_weighted_quantile_store" -> Digest(0, 0, 0, 0, 0),
    "t54_histogram_drift"     -> Digest(0, 0, 0, 0, 0),
    // portable k-means: the mean updates are bounded driver actions
    // during construction; the SERVED plan is the cached spread (its
    // round-robin exchange) + the fused literal-centroid argmax — a
    // join or window appearing here means assignment regressed toward
    // a corpus × centroid shuffle
    "s19_kmeans"              -> Digest(1, 0, 0, 0, 0),
    // the persisted-model serve must keep the same fused shape: spread
    // + literal-centroid argmax, centroids collected from the store
    "s20_kmeans_persisted"    -> Digest(1, 0, 0, 0, 0),
    // quality report: spread + the per-cluster agg's exchange
    "s21_kmeans_quality"      -> Digest(2, 0, 0, 0, 0),
    // unsupervised mix: assignment + quota selection both live below
    // the RDD boundary of the rank chain (the p15 shape)
    "p17_kmeans_topic_mix"    -> Digest(0, 0, 0, 0, 0),
    // round-13: COMPACTED-store serves must keep their uncompacted
    // siblings' plan shape exactly — compaction changes the files
    // under the store, never the serve plan (t55↔t36's explode+merge
    // agg, t56↔t44, t57↔t46, t58↔t49)
    "t55_kmv_compacted"       -> Digest(1, 0, 0, 0, 0),
    "t56_frequent_compacted"  -> Digest(4, 1, 0, 0, 0), // = t44's shape
    "t57_countmin_compacted"  -> Digest(4, 1, 0, 0, 0),
    "t58_quantile_compacted"  -> Digest(0, 0, 0, 0, 0),
    // quantiles composed into curation: the fences are a bounded driver
    // action; the served plan is ONE broadcast-join filter pass + the
    // survivor agg — a window or second shuffle here means the trim
    // regressed toward a per-row percentile rank
    "p16_iqr_trim"            -> Digest(1, 1, 0, 0, 0))

  /** Loose per-gate ceiling on total expression tree nodes — see the
    * exprNodes check below. Current max across pinned gates is measured
    * and the budget sits ~4× above it (t17's eleven repetition folds at ~3,100 nodes are the legitimate ceiling; the BPE blow-up was ~10× past this budget). */
  private val ExprNodeBudget = 12000

  test("headline gate plans match their golden operator digests") {
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    import org.apache.spark.sql.execution.window.WindowExec
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val mismatches = scala.collection.mutable.ArrayBuffer.empty[String]
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      golden.keys.toSeq.sorted.foreach { name =>
        val df = SparkEntry.queries(name)(spark, sf)
        // Recurse THROUGH cache barriers: an InMemoryRelation hides its
        // cached subplan from plan.collect, but that subplan is where
        // p10's original cliff lived — the digest must cover the whole
        // computation, not just the part above the last cache.
        def nodes(p: org.apache.spark.sql.execution.SparkPlan):
            Seq[org.apache.spark.sql.execution.SparkPlan] =
          p.collect { case n => n }.flatMap {
            case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
              s +: nodes(s.relation.cachedPlan)
            // cached subplans are AQE-wrapped regardless of the session
            // setting, and AdaptiveSparkPlanExec hides its tree from
            // collect (children = Nil) — unwrap it. For a given code +
            // fixture version the unwrapped plan is deterministic: either
            // the gate's construction always materializes the cache
            // (fixed data → fixed AQE decisions) or it never does.
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              a +: nodes(a.executedPlan)
            case n => Seq(n)
          }
        val all = nodes(df.queryExecution.executedPlan)
        val d = Digest(
          all.count(_.isInstanceOf[ShuffleExchangeExec]),
          all.count(_.isInstanceOf[BroadcastExchangeExec]),
          all.count(_.isInstanceOf[CartesianProductExec]),
          all.count(_.isInstanceOf[WindowExec]),
          all.count(_.isInstanceOf[SortExec]))
        if (d != golden(name))
          mismatches += s"""    "$name" -> $d,  // golden: ${golden(name)}"""
        // Expression-SIZE ceiling: operator-kind digests are blind to a
        // plan whose SHAPE is fine but whose expressions exploded — the
        // round-10 BPE encode regression was ~3^N tree growth from
        // folding a self-referencing expression builder, 26 s of pure
        // analysis/codegen with zero new operators. Total expression
        // node count is a loose ceiling (~4× current max), tripped only
        // by that multiplicative failure class, not by ordinary edits.
        val exprNodes = all.map(n =>
          n.expressions.map(e => e.collect { case x => x }.size).sum).sum
        if (exprNodes > ExprNodeBudget)
          mismatches += s"""    "$name": $exprNodes expression nodes """ +
            s"(budget $ExprNodeBudget) — a self-referencing expression " +
            "fold is the usual cause; chain aliased projections instead"
        graft.operators.CacheScope.global.release()
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
    assert(mismatches.isEmpty,
      "plan digests changed (shuffles, broadcasts, cartesians, windows, " +
        "sorts) — if intentional, update the golden entries:\n" +
        mismatches.mkString("\n"))
  }
}
