package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling main (not part of the driver contract). */
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
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = Tables.load(spark, sfDir, "documents")
    // warm
    docs.count()
    time("exact_with_spread") {
      graft.operators.Dedup.exact(docs, "text", "doc_id")
        .write.format("noop").mode("overwrite").save()
    }
    time("exact_no_spread") {
      docs.select(col("doc_id"),
          graft.functions.TextFunctions.fingerprint(col("text")).as("__fp"))
        .groupBy("__fp").agg(min("doc_id").as("doc_id"), count(lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
    }
    time("spread_only") {
      val n = graft.operators.Dedup.exact(docs, "text", "doc_id").rdd.getNumPartitions
      println(s"[scratch] partitions: $n")
    }
    time("minhash_lsh") {
      graft.operators.Dedup.minHashLsh(docs, "text", "doc_id", 0.5)
        .write.format("noop").mode("overwrite").save()
    }
    // stage-by-stage minhash profile
    val base = docs.select(col("doc_id").as("id"), col("text")).repartition(32)
    val hashes = base.withColumn("hashes",
      graft.operators.Dedup.shingleHashes(col("text"), 3))
    time("mh_shingle_hashes") {
      hashes.select(col("id"), col("hashes"))
        .write.format("noop").mode("overwrite").save()
    }
    val sig = hashes.withColumn("sig",
      graft.operators.Dedup.minhashFromHashes(col("hashes"), 128))
    time("mh_signatures") {
      sig.select(col("id"), col("sig"))
        .write.format("noop").mode("overwrite").save()
    }
    time("t3_langid_new") {
      SparkEntry.queries("t3_langid")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    // banding + self-join breakdown
    val banded = sig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(31)),
        b => xxhash64(concat_ws(",",
          transform(slice(col("sig"), b * lit(4) + lit(1), lit(4)),
            _.cast("string"))))))
        .as(Seq("band", "bucket")))
    time("mh_banded") {
      banded.write.format("noop").mode("overwrite").save()
    }
    time("mh_join_nocache") {
      val a = banded.as("a"); val b = banded.as("b")
      a.join(b, col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
        .select(col("a.id"), col("b.id")).distinct()
        .write.format("noop").mode("overwrite").save()
    }
    time("mh_join_cached") {
      val cached = banded.persist()
      cached.count()
      val a = cached.as("a"); val b = cached.as("b")
      a.join(b, col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
        .select(col("a.id"), col("b.id")).distinct()
        .write.format("noop").mode("overwrite").save()
      cached.unpersist()
    }
    spark.stop()
  }
}
