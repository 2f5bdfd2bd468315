package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling / soak main (not part of the driver contract). */
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
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    // Soak: replicate documents 10x with offset ids — a duplicate-heavy
    // 50k-doc corpus (every doc has 9 exact copies -> ~225k true dup pairs).
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val rep = (0 until 10).map(i =>
      docs.select((col("doc_id") + lit(i * 1000000)).as("doc_id"), col("text")))
      .reduce(_ union _)
    println(s"[scratch] soak corpus: ${rep.count()} docs")
    time("soak_exact_dedup_50k") {
      graft.operators.Dedup.exact(rep, "text", "doc_id").count()
    }
    time("soak_minhash_lsh_50k") {
      graft.operators.Dedup.minHashLsh(rep, "text", "doc_id", 0.5).count()
    }
    time("soak_simhash_50k") {
      graft.operators.Dedup.simHash(rep, "text", "doc_id").count()
    }
    time("soak_staged_dedup_50k") {
      val out = graft.operators.Dedup.dedupCorpus(rep, "text", "doc_id", 0.5)
      out.filter(col("keep")).count()
    }
    spark.stop()
  }
}
