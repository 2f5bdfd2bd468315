package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, VectorFunctions => VF}

/** Ad-hoc profiling / soak main (not part of the driver contract).
  *
  * Round-3 soak: (a) variance probe for d3_simhash — repeated isolated runs,
  * with and without a preceding minhash query, to separate genuine operator
  * cost from JVM/cache interference; (b) 100k-doc / 50k-vector corpora for
  * the sketch dedup + ANN paths, recording per-query shuffle bytes and the
  * candidate-pair counts that dominate at scale. Numbers land in NOTES.md.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // shuffle-byte accounting: stage-level task metrics, accumulated
    val shufWrite = new AtomicLong(0)
    val shufRead = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
      }
    })

    def time(name: String)(f: => Long): Unit = {
      val w0 = shufWrite.get(); val t0 = System.nanoTime()
      val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      graft.operators.CacheScope.global.release()
      // listener events are async — settle briefly before reading counters
      Thread.sleep(200)
      val mb = (shufWrite.get() - w0) / 1e6
      println(f"[scratch] $name: $sec%.2f s ($n rows, shuffle-write $mb%.1f MB)")
    }

    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val emb = Tables.load(spark, sfDir, "embeddings")

    // ---- (a) d3 variance probe: isolated, then interleaved with d2 ----
    println("[scratch] -- d3 variance probe (sf0.1 documents, 5000 docs) --")
    (1 to 4).foreach { i =>
      time(s"d3_iso_$i") { graft.operators.Dedup.simHash(docs, "text", "doc_id").count() }
    }
    time("d2_before_d3") { graft.operators.Dedup.minHashLsh(docs, "text", "doc_id", 0.5).count() }
    (1 to 2).foreach { i =>
      time(s"d3_after_d2_$i") { graft.operators.Dedup.simHash(docs, "text", "doc_id").count() }
    }
    // same interference probe, but with blocking eviction + a forced GC
    // between queries — isolates async-unpersist/garbage interference
    time("d2_again") { graft.operators.Dedup.minHashLsh(docs, "text", "doc_id", 0.5).count() }
    (1 to 2).foreach { i =>
      graft.operators.CacheScope.global.release(blocking = true)
      System.gc()
      time(s"d3_after_d2_settled_$i") { graft.operators.Dedup.simHash(docs, "text", "doc_id").count() }
    }

    // ---- (b) candidate-pair counts: the quantity that explodes at scale ----
    def replicate(df: DataFrame, idCol: String, times: Int): DataFrame =
      (0 until times).map(i =>
        df.withColumn(idCol, col(idCol) + lit(i * 1000000L))).reduce(_ union _)

    val docs100k = replicate(docs, "doc_id", 20)
    println(s"[scratch] soak corpus: ${docs100k.count()} docs")

    // candidate pairs = sum over buckets of C(n,2), computed from the same
    // public sketch expressions the operators use
    def pairsOf(grouped: DataFrame): Long =
      grouped.agg(sum(col("n") * (col("n") - 1) / 2)).head.getAs[Number](0).longValue

    val sig = docs100k.select(col("doc_id"),
      VF.simhash64(TF.tokens(TF.normText(col("text")))).as("sig"))
    val chunks = sig.select(col("doc_id"), posexplode(array(
      (0 until 4).map(i => shiftright(col("sig"), i * 16).bitwiseAND(lit(0xFFFFL))): _*))
      .as(Seq("chunk_idx", "chunk")))
    val d3Cand = pairsOf(chunks.groupBy("chunk_idx", "chunk")
      .agg(count(lit(1)).as("n")))
    println(s"[scratch] d3 candidate pairs @100k docs (no guard): $d3Cand")

    val bands = docs100k.select(col("doc_id"),
      posexplode(VF.minhashBandHashes(
        array_distinct(TF.shingles(TF.normText(col("text")), 3)), 128, 32))
      .as(Seq("band_idx", "band_hash")))
    val d2Cand = pairsOf(bands.groupBy("band_idx", "band_hash")
      .agg(count(lit(1)).as("n")))
    println(s"[scratch] d2 candidate pairs @100k docs: $d2Cand")

    // ---- (c) 100k-doc dedup + 50k-vector ANN timings ----
    time("soak_exact_dedup_100k") {
      graft.operators.Dedup.exact(docs100k, "text", "doc_id").count()
    }
    // groupExact on vs off: the 20×-replicated corpus is the duplicate-heavy
    // shape the stage-0 collapse is built for (sketch shrinks 20×, its
    // candidate pairs ~400×; the expansion joins buy that back)
    time("soak_minhash_lsh_100k_grouped") {
      graft.operators.Dedup.minHashLsh(docs100k, "text", "doc_id", 0.5).count()
    }
    time("soak_minhash_lsh_100k_raw") {
      graft.operators.Dedup.minHashLsh(docs100k, "text", "doc_id", 0.5,
        groupExact = false).count()
    }
    time("soak_simhash_100k") {
      graft.operators.Dedup.simHash(docs100k, "text", "doc_id").count()
    }
    time("soak_staged_dedup_100k") {
      val out = graft.operators.Dedup.dedupCorpus(docs100k, "text", "doc_id", 0.5)
      out.filter(col("keep")).count()
    }
    // connected components over the full 100k-doc near-dup graph (1.05M
    // pairs): rounds = diameter of the near-dup components
    time("soak_connected_components_100k") {
      val edges = graft.operators.Dedup.minHashLsh(docs100k, "text", "doc_id", 0.5)
      graft.operators.Dedup.connectedComponents(
        docs100k.select("doc_id"), edges, "doc_id", "a_id", "b_id")
        .select(countDistinct(col("component"))).head.getLong(0)
    }
    val corpus50k = replicate(emb, "vec_id", 25)
    println(s"[scratch] soak vectors: ${corpus50k.count()}")
    val queries = emb.filter(col("vec_id") < 25)
    time("soak_ann_lsh_50k") {
      graft.operators.Similarity.lshTopK(queries, corpus50k, "embedding", "vec_id", 10).count()
    }
    // scale setting: finer buckets (r=4 → 16 buckets/band instead of 4)
    // cut candidates ~3×; recall drops below the default's — the knob to
    // turn WITH corpus growth, not unconditionally
    time("soak_ann_lsh_50k_b32") {
      graft.operators.Similarity.lshTopK(queries, corpus50k, "embedding", "vec_id", 10,
        bits = 32, bands = 8).count()
    }
    time("soak_ann_brute_50k") {
      graft.operators.Similarity.bruteForceTopK(queries, corpus50k, "embedding", "vec_id", 10).count()
    }

    // ---- (d) streaming throughput ceiling: rate source → watermarked
    // window agg (the st2 shape, unbounded input). The rate source
    // generates rows executor-side, so this measures the engine's
    // aggregation throughput, not file-reading. Swept over offered rates
    // to find where busy-time stops tracking wall-time (the ceiling). ----
    Seq(500000, 2000000, 8000000).foreach { rps =>
      val rate = spark.readStream.format("rate")
        .option("rowsPerSecond", rps.toString)
        .option("numPartitions", "16").load()
        .withColumn("event_type",
          element_at(array(lit("click"), lit("view"), lit("purchase")),
            (col("value") % 3 + 1).cast("int")))
        .withWatermark("timestamp", "10 seconds")
        .groupBy(window(col("timestamp"), "5 seconds"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum("value").as("sv"))
      val q = rate.writeStream.outputMode("update")
        .format("memory").queryName(s"rate_probe_$rps").start()
      Thread.sleep(20000)
      q.stop()
      val progs = q.recentProgress
      val rows = progs.map(_.numInputRows).sum
      val secs = progs.map(_.batchDuration).sum / 1e3
      println(f"[scratch] rate-source window agg @$rps/s offered: $rows rows " +
        f"in $secs%.1f s busy-time = ${rows / math.max(secs, 0.001)}%.0f rows/s")
      spark.catalog.dropTempView(s"rate_probe_$rps")
    }
    spark.stop()
  }
}
