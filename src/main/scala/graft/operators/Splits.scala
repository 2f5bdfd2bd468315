package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic train/validation/test assignment by key hash.
  *
  * A training pipeline must assign every document to a split such that
  * (a) the assignment is a pure function of the key — stable across runs,
  * re-shards, engines, and languages, never dependent on row order or
  * partition layout; (b) membership can be recomputed by ANY downstream
  * consumer (a Python eval harness, a SQL warehouse) without coordination.
  * That is why the hash is md5 of the decimal key string — every language
  * ships it with identical semantics — rather than an engine-private hash
  * like xxhash64 (cheaper per row, but nothing outside Spark reproduces
  * it). The hash cost is paid once per corpus pass and is noise next to
  * the scan.
  *
  * `salt` decorrelates independent splits of the same corpus: different
  * salt, statistically independent assignment. */
object Splits {

  /** Uniform bucket in [0, buckets) from the first 16 bits of
    * md5(salt ‖ key): pure, order-free, cross-engine reproducible.
    * 16 bits give at most ~1.6% bucket-size bias at buckets=1000
    * (65536 % 1000); at the usual 10/100 buckets the bias is ≤ 0.06%. */
  def hashBucket(key: Column, buckets: Int, salt: String = ""): Column =
    (conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 4),
      16, 10).cast("int") % buckets)

  /** Deterministic sample: keep a row iff its key hashes into the first
    * `fraction` of 1000 buckets. Unlike `df.sample` (seeded per-partition
    * RNG — resolution changes with the partitioning), membership is a pure
    * function of the key: re-runs, re-shards, and other engines select the
    * SAME rows, and samples at different salts are independent. Within a
    * stratum (any group column) the kept fraction concentrates around
    * `fraction` because the hash is uniform and key-independent. */
  def sample(df: DataFrame, keyCol: String, fraction: Double,
             salt: String = ""): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0, 1]")
    df.filter(hashBucket(col(keyCol), 1000, salt) <
      math.round(fraction * 1000).toInt)
  }

  /** Domain-mix sampling: per-stratum keep fractions over one corpus scan
    * — the re-weighting pass of a multi-source training mix (downsample
    * the crawl, keep all of the curated sources). Membership is the same
    * pure key-hash rule as [[sample]], so the mix is reproducible anywhere
    * and re-mixing with different fractions keeps maximal row overlap
    * (a row kept at 0.2 is also kept at 0.5 — nested samples, useful for
    * scaling-law subsets). Strata absent from `fractions` fall back to
    * `default` (0 = drop unknown sources, 1 = keep them all). */
  def domainMix(df: DataFrame, keyCol: String, strataCol: String,
                fractions: Map[String, Double], default: Double = 0.0,
                salt: String = ""): DataFrame = {
    require((fractions.values ++ Seq(default)).forall(f => f >= 0 && f <= 1),
      "fractions must be in [0, 1]")
    val threshold = fractions.foldLeft(
      lit(math.round(default * 1000).toInt)) { case (acc, (stratum, f)) =>
      when(col(strataCol) === stratum,
        lit(math.round(f * 1000).toInt)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol), 1000, salt) < threshold)
  }

  /** Weighted deterministic sampling: keep each row with probability given
    * by `weight` (a per-row Column in [0, 1] — a quality score, a source
    * temperature, a length damper). Same md5-bucket membership rule as
    * [[sample]], so the decision is a pure function of (key, weight):
    * re-runs and other engines keep the SAME rows, and raising a row's
    * weight can only ADD it (nested-sample property per row). This is the
    * "upsample high-quality, damp boilerplate" pass of a training mix,
    * generalizing [[domainMix]] from per-stratum constants to a computed
    * per-row probability. Resolution is 1/1000, like [[sample]]. */
  def sampleByWeight(df: DataFrame, keyCol: String, weight: Column,
                     salt: String = ""): DataFrame =
    df.filter(hashBucket(col(keyCol), 1000, salt) <
      round(weight * lit(1000)).cast("int"))

  /** Assign each row a `bucket` and a `split` label by hashing `keyCol`.
    * Weights are bucket counts out of `trainW + valW + testW` total —
    * the default 8/1/1 over 10 buckets is the standard 80/10/10. */
  def assign(df: DataFrame, keyCol: String,
             trainW: Int = 8, valW: Int = 1, testW: Int = 1,
             salt: String = ""): DataFrame = {
    require(trainW > 0 && valW >= 0 && testW >= 0, "weights must be valid")
    val buckets = trainW + valW + testW
    df.withColumn("bucket", hashBucket(col(keyCol), buckets, salt))
      .withColumn("split",
        when(col("bucket") < trainW, "train")
          .when(col("bucket") < trainW + valW, "val")
          .otherwise("test"))
  }

  /** Stratified EXACT-count split: within every stratum (language, source,
    * …) each split receives exactly its fraction of the stratum's rows —
    * `floor(cum_i·n_g) − floor(cum_{i-1}·n_g)` rows — unlike [[assign]],
    * whose per-row hash gives only expected proportions (a 40-doc minority
    * language can easily land 30/70 under Bernoulli assignment; eval sets
    * built from small strata need the count guarantee).
    *
    * Deterministic: rows rank within their stratum under the md5 keyed-hash
    * order (salt ‖ key — the repo-wide cross-engine hash rule, ties to the
    * key), so the assignment is a pure function of (key set, salt):
    * re-runs, engines, and partition layouts all agree. Split boundaries
    * are `rank ≤ floor(cum·n)` with cum·n computed in double on both
    * engines — identical parse + identical IEEE multiply → identical
    * floor, even at awkward fractions.
    *
    * Scale shape: the per-stratum rank is [[GlobalOrder.groupRunningTotal]]
    * over unit weights (range exchange on (stratum, hash) — a hot stratum
    * SPANS partitions; the window row_number spelling would sort each
    * stratum in ONE task), plus a broadcast of the |strata|-row totals.
    *
    * `fractions` lists (label, fraction) IN ORDER; fractions must sum to 1
    * (±1e-9) so every row is assigned. */
  def stratifiedSplit(df: DataFrame, strataCol: String, keyCol: String,
                      fractions: Seq[(String, Double)],
                      salt: String = "", splitCol: String = "split")
                     (implicit scope: CacheScope = CacheScope.global): DataFrame = {
    require(fractions.nonEmpty, "stratifiedSplit needs at least one split")
    require(fractions.forall(_._2 > 0.0), "fractions must be positive")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${fractions.map(_._2).sum}")
    // round-16: max(__rank) per stratum IS the stratum count, which the
    // running-total pass's driver-side partial sums already hold — the
    // previous totals aggregate re-ran the ranking lineage as one extra
    // action (guide §2.4)
    val (ranked, tots) = GlobalOrder.groupRunningTotalWithTotals(
      df.withColumn("__h",
          md5(concat(lit(salt), col(keyCol).cast("string"))))
        .withColumn("__one", lit(1L)),
      strataCol, Seq(col("__h"), col(keyCol)), "__one", "__rank")
    val totals = GlobalOrder.totalsFrame(df.sparkSession,
      df.schema(strataCol).copy(name = strataCol), tots, "__n")
    val cums = fractions.scanLeft(0.0)(_ + _._2).tail
    // last boundary is floor(1.0·n) = n — the otherwise branch is only a
    // spelling, every row already satisfies the last when()
    val split = fractions.zip(cums).init.foldRight(
      lit(fractions.last._1): Column) { case (((label, _), cum), rest) =>
      when(col("__rank") <= floor(lit(cum) * col("__n")), label)
        .otherwise(rest)
    }
    ranked.join(broadcast(totals), strataCol)
      .withColumn(splitCol, split)
      .drop("__h", "__one", "__rank", "__n")
  }

  /** Temperature-scaled domain sampling — the Gopher/PaLM mixing rule:
    * keep quota_d documents of domain d with quota_d ∝ n_d^(1/T),
    * Σ quota_d ≈ `totalN`. T = 1 is proportional sampling; T > 1
    * flattens the mix toward uniform (small domains' SHARE rises);
    * T < 1 sharpens toward the head domains.
    *
    * Quotas: w_d = n_d^(1/T); quota_d = min(n_d, floor(totalN·w_d/Σw)).
    * Within a domain the kept set is the md5 keyed-hash prefix
    * (rank ≤ quota — the a10/a15 determinism discipline), with the rank
    * from [[GlobalOrder.groupRunningTotal]] so a hot domain spans
    * partitions. Per-domain counts and quotas are driver-side
    * (|domains| rows — the bounded-model contract), embedded as a
    * when-chain; at very high domain cardinality a broadcast quota join
    * is the drop-in alternative.
    *
    * Float parity: when 1/T is a small integer k, w_d is computed as
    * EXACT integer n_d^k in BigInt — n^k overflows Long already at
    * n ≈ 1450 for k = 6, and corpus-sized domain counts overflow even
    * k = 2, so the exact path must not touch fixed-width arithmetic —
    * and the quota is the TRUE floor `(totalN·w_d) / Σw` (BigInt
    * division), engine-independent at any magnitude (the `a16` gate
    * pins T = 0.5, k = 2, with the oracle on integer division too);
    * fractional exponents go through `math.pow`, whose last ulp is
    * libm-dependent — fine for pipelines, not for hash-match oracles. */
  def temperatureSample(df: DataFrame, domainCol: String, keyCol: String,
                        totalN: Long, temperature: Double,
                        salt: String = ""): DataFrame = {
    require(totalN > 0, "totalN must be positive")
    require(temperature > 0, "temperature must be positive")
    val invT = 1.0 / temperature
    // round-16: the per-domain counts are the running-total pass's OWN
    // driver-side partial sums (Σ __one per domain) — the previous
    // separate count aggregate re-ran the whole input lineage as one
    // extra action (guide §2.4)
    val keep = df.columns.map(col).toSeq
    val (ranked, tots) = GlobalOrder.groupRunningTotalWithTotals(
      df.withColumn("__h",
          md5(concat(lit(salt), col(keyCol).cast("string"))))
        .withColumn("__one", lit(1L)),
      domainCol, Seq(col("__h"), col(keyCol)), "__one", "__rank")
    val counts = tots.toArray
      .sortBy(_._1.toString) // deterministic weight-sum order
    val exactK = if (invT == math.rint(invT) && invT >= 1 && invT <= 6)
      Some(math.rint(invT).toInt) else None
    val quotas: Seq[(Any, Long)] = exactK match {
      case Some(k) =>
        val ws = counts.map { case (dv, n) =>
          (dv, n, BigInt(n).pow(k)) }
        val w = ws.map(_._3).sum
        ws.map { case (dv, n, wd) =>
          val q = (BigInt(totalN) * wd) / w // exact floor, no overflow
          dv -> (if (q >= BigInt(n)) n else q.toLong) }
      case None =>
        val ws = counts.map { case (dv, n) =>
          (dv, n, math.pow(n.toDouble, invT)) }
        val w = ws.map(_._3).sum
        ws.map { case (dv, n, wd) =>
          dv -> math.min(n, math.floor(totalN * wd / w).toLong) }
    }
    val quotaCol = quotas.foldLeft(lit(0L): Column) {
      case (acc, (dv, q)) =>
        when(col(domainCol) === lit(dv), lit(q)).otherwise(acc)
    }
    ranked.filter(col("__rank") <= quotaCol).select(keep: _*)
  }

  /** Deterministic shard id in [0, shards): the export-layout counterpart of
    * [[assign]]. Training jobs read shards independently (one worker per
    * shard), so the assignment must be a pure key function — re-exports
    * place every document in the SAME shard, and any consumer can compute
    * shard membership without a manifest lookup. */
  def shard(df: DataFrame, keyCol: String, shards: Int,
            salt: String = ""): DataFrame = {
    require(shards > 0, "shards must be positive")
    df.withColumn("shard", hashBucket(col(keyCol), shards, salt))
  }

  /** Export `df` as a shard-partitioned parquet dataset at `path`
    * (`path/shard=K/…`). `repartition` on the shard column first so each
    * shard's rows land in few files (without it, every task writes a
    * sliver of every shard — shards × tasks small files, the classic
    * metadata explosion at cluster scale); consumers then read one
    * directory per worker and Spark readers get partition pruning on
    * `shard` for free. */
  def writeSharded(df: DataFrame, keyCol: String, shards: Int, path: String,
                   salt: String = ""): Unit =
    shard(df, keyCol, shards, salt)
      .repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** Data-constrained budget allocation (Muennighoff et al.'23, "Scaling
    * Data-Constrained Language Models"): given per-domain token totals
    * T_d and sampling weights w_d, allocate a training-token `budget` as
    * alloc_d = min(λ·w_d, maxEpochs·T_d) with ONE scaling factor λ chosen
    * so Σ alloc_d = budget — water-filling: a domain whose proportional
    * share exceeds its repeat cap SATURATES at maxEpochs·T_d and its
    * excess budget redistributes to the others. Closed form, no
    * iteration: sort domains by saturation threshold θ_d = maxEpochs·T_d
    * / w_d ascending; a domain saturates iff the budget left after
    * filling every earlier (smaller-θ) cap still overflows its own
    * threshold — `budget − capPrefix_{d−1} > θ_d · weightFrom_d` — a
    * predicate off two integer prefix/suffix sums; λ then solves exactly
    * on the unsaturated remainder.
    *
    * `stats` is the per-domain (domain, tokens, weight) frame — the
    * OUTPUT of a corpus-scale aggregate, i.e. metadata-sized (|domains|
    * rows), which is why the prefix sums here may use plain windows: the
    * per-row-window ban is about corpus-sized frames. Everything before
    * the final λ division is integer arithmetic (exact in any engine);
    * θ, λ, and the allocations are single IEEE divisions/multiplies off
    * those integers, so an independent engine reproduces every bit —
    * weights should be INTEGERS (doc counts, the a16 n² temperature
    * trick) to keep that property.
    *
    * Range contract (validated driver-side off the same metadata-sized
    * pass, loud `require` on violation): tokens and weights strictly
    * positive; `maxEpochs·max(tokens)`, `Σ weight`, and `Σ cap` must
    * each fit in a signed 64-bit Long. Squared-token weights overflow
    * that already past ~3·10⁹ tokens per domain — realistic at 100 TB —
    * but allocations are EXACTLY invariant under uniform weight scaling
    * (θ ordering, the saturation predicate, and λ·w all cancel the
    * common factor), so callers pre-divide oversized weights by any
    * common factor (e.g. pass (T_d/2²⁰)² instead of T_d²) without
    * changing a single output bit beyond float rounding.
    *
    * Output: one row per domain — (domain, tokens, weight, saturated,
    * alloc_tokens, epochs = alloc/tokens). If the budget exceeds every
    * cap, all domains saturate and the leftover simply goes unallocated
    * (Σ alloc < budget — the caller's signal to raise maxEpochs). */
  def budgetWaterfill(stats: DataFrame, domainCol: String,
                      tokensCol: String, weightCol: String,
                      budget: Long, maxEpochs: Int)
                     (implicit scope: CacheScope = CacheScope.global): DataFrame = {
    require(maxEpochs > 0, "maxEpochs must be positive")
    require(budget >= 0, "budget must be non-negative")
    import org.apache.spark.sql.expressions.Window
    val ord = Window.orderBy(col("__theta"), col(domainCol))
    val raw = scope.cache(stats
      .select(col(domainCol), col(tokensCol).cast("long").as("__t"),
        col(weightCol).cast("long").as("__w")))
    // range contract (scaladoc), validated BEFORE any cap/θ arithmetic
    // can overflow (ANSI would throw an opaque SparkArithmeticException
    // mid-plan; non-ANSI would silently wrap) — every violation is a
    // loud, named error here. Exact decimal sums so the overflow CHECK
    // itself cannot overflow.
    val chk = raw.agg(
      min(col("__w")), min(col("__t")), max(col("__t")),
      sum(col("__w").cast("decimal(38,0)")),
      sum(col("__t").cast("decimal(38,0)"))).head()
    if (!chk.isNullAt(0)) {
      val longMax = new java.math.BigDecimal(Long.MaxValue)
      require(chk.getLong(1) > 0,
        "budgetWaterfill: tokens must be strictly positive per domain")
      require(chk.getLong(0) > 0,
        "budgetWaterfill: weights must be strictly positive per domain")
      require(chk.getLong(2) <= Long.MaxValue / maxEpochs,
        s"budgetWaterfill: maxEpochs*tokens overflows Long for the " +
          s"largest domain (${chk.getLong(2)} tokens, maxEpochs=$maxEpochs)")
      require(chk.getDecimal(3).compareTo(longMax) <= 0 &&
          chk.getDecimal(4)
            .multiply(new java.math.BigDecimal(maxEpochs))
            .compareTo(longMax) <= 0,
        "budgetWaterfill: the weight or cap sum overflows Long — " +
          "pre-divide weights by a common factor (allocations are " +
          "invariant under uniform weight scaling, see scaladoc) or " +
          "lower maxEpochs")
    }
    val s = scope.cache(raw
      .withColumn("__cap", lit(maxEpochs.toLong) * col("__t"))
      .withColumn("__theta", col("__cap").cast("double") / col("__w"))
      .withColumn("__capPrefix",
        sum(col("__cap")).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__wFrom",
        sum(col("__w")).over(ord.rowsBetween(0, Window.unboundedFollowing)))
      // saturated iff the budget surviving all smaller-θ caps overflows
      // this domain's threshold over the weight mass from here on
      .withColumn("saturated",
        (lit(budget) - (col("__capPrefix") - col("__cap"))).cast("double") >
          col("__theta") * col("__wFrom").cast("double")))
    val agg = s.agg(
      coalesce(sum(when(col("saturated"), col("__cap"))), lit(0L)),
      coalesce(sum(when(!col("saturated"), col("__w"))), lit(0L))).head()
    val satCap = agg.getLong(0)
    val unsatW = agg.getLong(1)
    val lambda =
      if (unsatW == 0L) 0.0 else (budget - satCap).toDouble / unsatW
    s.select(col(domainCol), col("__t").as("tokens"),
      col("__w").as("weight"), col("saturated"),
      when(col("saturated"), col("__cap").cast("double"))
        .otherwise(lit(lambda) * col("__w").cast("double"))
        .as("alloc_tokens"))
      .withColumn("epochs",
        col("alloc_tokens") / col("tokens").cast("double"))
  }
}
