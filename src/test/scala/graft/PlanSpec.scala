package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Optimizer evidence (SURVEY.md §4 / §7.2 phase 8): the optimizations the
  * reference scaffolds but never realizes (stats-driven pruning, filter
  * pushdown, kernel fusion — `/root/reference/src/optimizer.cpp:13-47`,
  * `src/jit.cpp:55-83`) are provided by Catalyst for our plans. These tests
  * pin that by inspecting the physical plans, so a regression that breaks
  * pushdown or broadcast shows up as a test failure, not a silent slowdown.
  */
class PlanSpec extends AnyFunSuite {
  import SparkSpec.{spark, sf}

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter + projection push down to the parquet scan") {
    val df = Tables.load(spark, sf, "lineitem")
      .filter(col("l_quantity") > 45)
      .select("l_orderkey", "l_quantity")
    val p = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"),
      s"missing pushed filter in:\n$p")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"scan reads more columns than projected:\n$p")
  }

  test("whole-stage codegen fuses the scan→filter→project pipeline") {
    val df = Tables.load(spark, sf, "lineitem")
      .filter(col("l_quantity") > 45)
      .select((col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
    // "*(n)" prefixes mark operators fused into WholeStageCodegen stage n
    assert(plan(df).contains("*(1) Project"),
      "expected a WholeStageCodegen'd Project (the reference's fused-kernel analog)")
  }

  test("orderBy+limit rewrites to TakeOrderedAndProject (no global sort)") {
    val df = Tables.load(spark, sf, "orders")
      .orderBy(col("o_totalprice").desc).limit(10)
    assert(plan(df).contains("TakeOrderedAndProject"), plan(df))
  }

  test("small dimension join uses broadcast, not shuffle") {
    val c = Tables.load(spark, sf, "customer")
    val n = Tables.load(spark, sf, "nation")
    val joined = c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
    assert(plan(joined).contains("BroadcastHashJoin"), plan(joined))
  }

  test("timestamp predicates push down to the parquet scan") {
    val df = Tables.load(spark, sf, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
      .select("l_orderkey")
    val p = plan(df)
    assert(p.contains("PushedFilters") && p.contains("GreaterThanOrEqual(l_shipdate"),
      s"timestamp filter did not reach the scan:\n$p")
  }

  test("dialect WHERE compiles to pushdown-able predicates") {
    val df = Engine.sql(spark, sf,
      "SELECT l_orderkey FROM lineitem WHERE l_quantity > 45 AND l_discount > 0.05",
      float32 = false)
    val p = plan(df)
    assert(p.contains("PushedFilters") && p.contains("GreaterThan(l_quantity,45"),
      s"dialect predicate did not reach the scan:\n$p")
  }

  test("constant folding: always-false dialect filter prunes to empty scan") {
    // the reference's intended-but-stubbed optimization
    // (`execute_query_optimized`, /root/reference/src/optimizer.cpp:32-47)
    val df = Engine.sql(spark, sf,
      "SELECT l_orderkey FROM lineitem WHERE 1 > 2", float32 = false)
    val p = df.queryExecution.optimizedPlan.toString
    assert(p.contains("LocalRelation <empty>") || p.contains("LocalTableScan"),
      s"constant-false predicate not folded:\n$p")
  }

  test("bucketed tables co-locate the join: no shuffle Exchange in the plan") {
    // The 100 TB fact-fact join strategy: bucket both sides on the join key
    // at write time, and repeated joins skip the shuffle entirely (the
    // reference has no analog — its 'partitioned execution' is a per-query
    // range split, /root/reference/src/multi_gpu_utils.cpp:23-60).
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    // the in-memory catalog forgets tables across JVMs but their warehouse
    // directories persist — clear them or CREATE TABLE fails with
    // LOCATION_ALREADY_EXISTS
    Seq("li_bucketed", "o_bucketed").foreach { t =>
      val dir = new java.io.File(s"target/spark-warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    Tables.load(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    Tables.load(spark, sf, "orders").select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_bucketed")
    val joined = spark.table("li_bucketed").join(
      spark.table("o_bucketed").hint("merge"),
      col("l_orderkey") === col("o_orderkey"))
    val p = plan(joined)
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("Exchange"), s"bucketed join still shuffles:\n$p")
    assert(joined.count() > 0)
  }

  test("hive-partitioned layout prunes partitions at the scan") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_prune_").toString
    try {
      Tables.load(spark, sf, "events").select("event_id", "event_type", "value")
        .write.mode("overwrite").partitionBy("event_type").parquet(tmp)
      val df = spark.read.parquet(tmp).filter(col("event_type") === "click")
      // the partition predicate must land in PartitionFilters (directory
      // metadata), NOT PushedFilters (row groups) — and the scan must report
      // reading 1 of the 5 event-type partitions
      val scan = df.queryExecution.executedPlan.collectLeaves().head
      val scanStr = scan.toString
      assert(scanStr.contains("PartitionFilters") &&
        scanStr.contains("event_type#") && scanStr.contains("click"),
        s"partition predicate not in PartitionFilters:\n$scanStr")
      val pruned = df.queryExecution.executedPlan.collectLeaves().head
        .asInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]
      df.count() // materialize so selectedPartitions resolves
      assert(pruned.relation.location.listFiles(pruned.partitionFilters, Nil)
        .length == 1, "expected exactly one partition directory to survive pruning")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(tmp))
    }
  }

  test("persisted-IVF serving scan prunes to the probed cell partitions") {
    // The scale contract of the v2 cell-partitioned layout: a serving
    // batch must LIST AND READ only probed `cell=` directories — the
    // probe predicate in PartitionFilters (directory metadata), never a
    // corpus-wide join. Mirrors the hive-prune pin above, on the index.
    import graft.operators.Similarity
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivf_prune_").toString
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false") // plain plan tree
      val emb = Tables.load(spark, sf, "embeddings")
      Similarity.buildIvfIndex(emb.filter(col("vec_id") >= 5),
        "embedding", "vec_id", tmp, cells = 8)
      val df = Similarity.ivfTopKFromIndex(emb.filter(col("vec_id") === 0),
        tmp, "embedding", "vec_id", k = 3, nprobe = 2)
      df.count()
      val scans = df.queryExecution.executedPlan.collectLeaves().collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      val idxScan = scans.filter(_.partitionFilters.nonEmpty)
      assert(idxScan.nonEmpty,
        s"no scan carries PartitionFilters — serving is not partition-pruned:\n${plan(df)}")
      val dirs = idxScan.head.relation.location
        .listFiles(idxScan.head.partitionFilters, Nil).length
      assert(dirs <= 2, s"expected ≤ nprobe=2 partition dirs listed, got $dirs")
      assert(dirs < 8, "pruning read every cell — no better than a full scan")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(tmp))
    }
  }

  test("hard-negative serve from the persisted index: partition-pruned, no cross join") {
    // s15b's scale contract: hard negatives at 100 TB are the
    // ivfTopKFromIndex shape plus a label filter — the corpus side must
    // arrive partition-pruned from the index (probed cell= dirs in
    // PartitionFilters, the label riding inside the pruned rows) and
    // nothing in the plan may be a CartesianProduct. The brute s15 form
    // is the exactness oracle, not the serving plan.
    import graft.operators.Similarity
    val tmp = java.nio.file.Files.createTempDirectory("graft_hn_prune_").toString
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false") // plain plan tree
      val emb = Tables.load(spark, sf, "embeddings")
      Similarity.buildIvfIndex(emb.filter(col("vec_id") >= 5),
        "embedding", "vec_id", tmp, cells = 8, metaCols = Seq("label"))
      val df = Similarity.hardNegativesFromIndex(
        emb.filter(col("vec_id") === 0), tmp, "embedding", "vec_id",
        "label", k = 3, overfetch = 2, nprobe = 2)
      df.count()
      val p = plan(df)
      assert(!p.contains("CartesianProduct"),
        s"hard-negative serve cross-joined the corpus:\n$p")
      val scans = df.queryExecution.executedPlan.collectLeaves().collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      val idxScan = scans.filter(_.partitionFilters.nonEmpty)
      assert(idxScan.nonEmpty,
        s"no scan carries PartitionFilters — the corpus side is not pruned to probed cells:\n$p")
      val dirs = idxScan.head.relation.location
        .listFiles(idxScan.head.partitionFilters, Nil).length
      assert(dirs <= 2, s"expected ≤ nprobe=2 cell dirs listed, got $dirs")
      assert(dirs < 8, "pruning read every cell — no better than a full scan")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(tmp))
    }
  }

  test("hash split and deterministic sample are pure maps: no Exchange in the plan") {
    val ids = Tables.load(spark, sf, "documents").select("doc_id")
    val p1 = plan(graft.operators.Splits.assign(ids, "doc_id"))
    val p2 = plan(graft.operators.Splits.sample(ids, "doc_id", 0.1))
    assert(!p1.contains("Exchange") && !p2.contains("Exchange"),
      s"split/sample should not shuffle:\n$p1\n$p2")
  }

  test("contamination plan: only equi-joins, heavy-shingle guard is a broadcast anti-join") {
    val docs = Tables.load(spark, sf, "documents")
    val df = graft.operators.Dedup.contamination(
      docs.filter(col("doc_id") % 20 =!= 0),
      docs.filter(col("doc_id") % 20 === 0), "text", "doc_id")
    val p = plan(df)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"contamination must never cross-join:\n$p")
    assert(p.contains("LeftAnti"), s"missing anti-join guard:\n$p")
  }

  test("dense packing plan: one hash partitioning by group, no cross join") {
    import graft.functions.{TextFunctions => TF}
    val withN = Tables.load(spark, sf, "documents")
      .select(col("lang"), col("doc_id"),
        size(TF.tokens(col("text"))).cast("long").as("n"))
    val p = plan(graft.operators.Packing.packSequencesDense(
      withN, "lang", "doc_id", "n", 256L))
    assert(p.contains("hashpartitioning(lang"), s"expected group hash:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"unexpected cross join:\n$p")
  }

  test("topk aggregate plan: partial heap on the map side, no sort before the exchange") {
    import graft.functions.TopKAgg
    val df = Tables.load(spark, sf, "orders")
      .groupBy("o_custkey")
      .agg(TopKAgg.topKByValue(col("o_totalprice"), col("o_orderkey"), 3)
        .as("top"))
    val p = plan(df)
    // TypedImperativeAggregate plans as ObjectHashAggregate with a partial
    // stage BEFORE the exchange — the shuffle carries ≤ k pairs per
    // (partition, group), the whole point vs the window top-N's full sort
    assert(p.contains("ObjectHashAggregate"), s"expected object hash agg:\n$p")
    assert(p.contains("partial_top_k_by_value"),
      s"missing map-side partial top-k:\n$p")
    val exchangeIdx = p.indexOf("Exchange hashpartitioning(o_custkey")
    val partialIdx = p.indexOf("partial_top_k_by_value")
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"partial agg should sit below the exchange in the plan tree:\n$p")
  }

  test("interval join plan: bucketed equi-join, never a per-key theta join") {
    val ev0 = Tables.load(spark, sf, "events")
    val ev = ev0.withColumn("ts", Tables.tsNanos(ev0))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("cid"), col("user_id"), col("ts"))
    val wNanos = 1800L * 1000000000L
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"),
        (col("ts") - lit(wNanos)).as("ws"), col("ts").as("we"))
    val p = plan(graft.operators.IntervalJoin.pointInInterval(
      clicks, purch, Seq("user_id"), "ts", "ws", "we", wNanos))
    // the whole point: the range condition rides a bucketed EQUI-join —
    // a theta join would surface as a nested-loop/cartesian product
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"interval join must stay an equi-join:\n$p")
  }

  test("nb classify plan: conditional-count join is broadcast hash, no cartesian") {
    import graft.operators.NaiveBayes
    val docs = Tables.load(spark, sf, "documents")
    val m = NaiveBayes.train(docs, "text", "lang")
    val p = plan(NaiveBayes.classify(docs, "text", "doc_id", m))
    // the O(classes·vocab) model joins each doc's tf rows via broadcast —
    // serving shuffles only the tf aggregate, never the model
    assert(p.contains("BroadcastHashJoin"),
      s"model join should broadcast:\n$p")
    // the per-class fan-out is a broadcast nested loop over the tiny class
    // table by design; an unbroadcast CartesianProduct is the failure mode
    assert(!p.contains("CartesianProduct"),
      s"class fan-out must ride a broadcast:\n$p")
  }

  test("PQ ADC plan: the only cross join is the broadcast query-table side") {
    import graft.operators.Similarity
    val emb = Tables.load(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") < 5)
    val c = emb.filter(col("vec_id") >= 5)
    val book = Similarity.pqTrain(c.limit(100), "embedding", dim = 64, m = 4, k = 4)
    val codes = Similarity.pqEncode(c, book, "embedding", "vec_id", dim = 64, m = 4)
    val p = plan(Similarity.pqTopK(q, c, codes, book, "embedding", "vec_id",
      dim = 64, m = 4, k = 5, rerank = 16))
    assert(!p.contains("CartesianProduct"), s"non-broadcast cross join:\n$p")
    // simple-mode rendering: "BroadcastNestedLoopJoin BuildRight, Cross"
    assert(p.contains("BroadcastNestedLoopJoin") && p.contains("Cross"),
      s"ADC should broadcast the query tables:\n$p")
  }

  test("custom CosineSimilarity participates in codegen (no fallback)") {
    val emb = Tables.load(spark, sf, "embeddings")
    val df = emb.select(graft.functions.VectorFunctions
      .cosineSimilarity(col("embedding"), col("embedding")).as("self"))
    // executes via codegen without throwing, and the value is 1.0
    val v = df.head.getDouble(0)
    assert(math.abs(v - 1.0) < 1e-9)
    // "*(1)" = fused into WholeStageCodegen stage 1 (no CodegenFallback)
    assert(plan(df).contains("*(1) Project"))
  }

  test("semantic dedup plan: cluster equi-join only, never an all-pairs stage") {
    val emb = Tables.load(spark, sf, "embeddings")
    val df = graft.operators.Dedup.semanticDedup(emb, "embedding", "vec_id",
      threshold = 0.4, clusterOf = graft.operators.Dedup.signBitCluster(_, 3))
    val p = plan(df)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"semantic dedup must join on the cluster id, not cross-join:\n$p")
  }

  test("runtime bloom filter prunes the big side of a selective shuffle join") {
    // At cluster scale a fact⋈filtered-dim join is a shuffle join, and the
    // rows the filter will discard should never enter the exchange. Spark's
    // InjectRuntimeFilter builds a bloom filter from the selective (dim)
    // side and applies `might_contain` on the fact side BEFORE its shuffle.
    // Local test data is below every threshold, so pin the rewrite with the
    // thresholds opened up and broadcast disabled (at 100 TB the defaults
    // trigger it for real).
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0")
      val li = Tables.load(spark, sf, "lineitem")
      val ord = Tables.load(spark, sf, "orders")
        .filter(col("o_totalprice") > 400000)
      val j = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy("l_returnflag").agg(count(lit(1)))
      val p = j.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain"),
        s"no runtime bloom filter injected:\n$p")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("bm25 serve: query terms broadcast, postings unshuffled below the join, WindowGroupLimit top-k") {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val docs = Tables.load(spark, sf, "documents")
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_plan_")
    try {
      graft.operators.Retrieval.buildBm25Index(docs, "text", "doc_id",
        dir.toString)
      val served = graft.operators.Retrieval.bm25TopKFromIndex(
        docs.filter(col("doc_id") % 97 === 0), dir.toString,
        "text", "doc_id", k = 5)
      // AdaptiveSparkPlanExec is a leaf to collect() — unwrap to the
      // current physical plan so the traversal sees the join
      val ex = served.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case other => other
      }
      // top-k executes as per-partition partial top-k before the shuffle
      assert(ex.toString.contains("WindowGroupLimit"), ex.toString)
      // the query term set broadcasts against the postings scan...
      val bhj = ex.collect { case j: BroadcastHashJoinExec => j }
      assert(bhj.nonEmpty, s"no broadcast join in serve plan:\n$ex")
      // ...and the corpus-sized postings (streamed) side reaches the join
      // straight from the scan — no exchange moves it. Exchanges BELOW a
      // BroadcastExchange don't count: anything under one is broadcast-
      // sized by construction (the serve-side df agg and the query-batch
      // distinct both live there, shuffling ≤ |query vocabulary| rows).
      val streamed = bhj.map { j =>
        j.buildSide match {
          case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.left
          case _ => j.right
        }
      }
      def corpusShuffles(p: org.apache.spark.sql.execution.SparkPlan):
          Seq[ShuffleExchangeExec] = p match {
        case _: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec =>
          Seq.empty
        case s: ShuffleExchangeExec =>
          s +: s.children.flatMap(corpusShuffles)
        case other => other.children.flatMap(corpusShuffles)
      }
      val shuffled = streamed.flatMap(corpusShuffles)
      assert(shuffled.isEmpty,
        s"postings side shuffles before the serve join:\n$ex")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("decontaminate serve: corpus side reaches the broadcast semi-join shuffle-free") {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    val docs = Tables.load(spark, sf, "documents")
    val dir = java.nio.file.Files.createTempDirectory("graft_contam_plan_")
    try {
      graft.operators.Decontaminate.buildIndex(
        docs.filter(col("doc_id") % 20 === 0), "text", "doc_id",
        dir.toString, shingleSize = 3, hashPostings = false)
      // maxDf = MaxValue: the streaming-serve form — one uncached tree,
      // so the whole corpus path is visible to the traversal
      val served = graft.operators.Decontaminate.flagFromIndex(
        docs.filter(col("doc_id") % 20 =!= 0), dir.toString,
        "text", "doc_id", threshold = 0.5, maxDf = Long.MaxValue)
      val ex = served.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case other => other
      }
      // the eval shingle set broadcasts against the corpus postings, and
      // the corpus (streamed) side arrives at that semi-join with NO
      // exchange — the scan+shingle pass is the only corpus-sized work
      val semi = ex.collect {
        case j: BroadcastHashJoinExec if j.joinType == LeftSemi => j
      }
      assert(semi.nonEmpty, s"no broadcast semi-join in serve plan:\n$ex")
      val streamed = semi.map { j =>
        j.buildSide match {
          case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.left
          case _ => j.right
        }
      }
      // spread()'s small-input round-robin (REPARTITION_BY_NUM) is the
      // deliberate local-parallelism fan-out, a no-op at cluster scale —
      // any OTHER exchange on the corpus side would be a real shuffle
      val shuffled = streamed.flatMap(_.collect {
        case s: ShuffleExchangeExec
            if s.shuffleOrigin !=
              org.apache.spark.sql.execution.exchange.REPARTITION_BY_NUM => s
      })
      assert(shuffled.isEmpty,
        s"corpus side shuffles before the contamination semi-join:\n$ex")
      // and the only corpus-fraction shuffle in the whole serve plan is
      // the slim (t_id, e_id) pair aggregate (plus eval-sized distincts)
      assert(ex.toString.contains("BroadcastHashJoin"), ex.toString)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
