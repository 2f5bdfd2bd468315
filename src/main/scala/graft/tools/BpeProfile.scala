package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc BPE profiling main (not part of the driver contract). Caught
  * the round-10 encode cliff: folding N merges into ONE nested Catalyst
  * expression grows the tree ~3^N (applyMerge references its input
  * three times) — 26 s of pure analysis/codegen at N=8 over a 31-word
  * dictionary, fixed by chaining one aliased projection per merge
  * (1.0 s warm). Kept as the regression probe for the encode path. */
object BpeProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        + "/documents.parquet")
    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $n: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }
    import graft.operators.Bpe
    var merges: Seq[(String, String)] = Nil
    time("train") {
      val m = Bpe.train(docs, "text", 8)
      merges = m.collect().sortBy(_.getInt(0))
        .map(r => (r.getString(1), r.getString(2))).toSeq
      graft.operators.CacheScope.global.release(); merges.size.toLong
    }
    time("encode_cold") {
      Bpe.encodeTokenCounts(docs, "text", "doc_id", merges)
        .write.format("noop").mode("overwrite").save(); 1L
    }
    time("encode_warm") {
      Bpe.encodeTokenCounts(docs, "text", "doc_id", merges)
        .write.format("noop").mode("overwrite").save(); 1L
    }
    spark.stop()
  }
}
