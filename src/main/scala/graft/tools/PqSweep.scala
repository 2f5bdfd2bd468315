package graft.tools

import org.apache.spark.sql.functions._

import org.apache.spark.sql.SparkSession

import graft.operators.Similarity
import graft.Tables

/** One-off parameter sweep for the PQ ANN path: recall@k vs brute force
  * across (m, rerank). Not part of the driver contract; run with
  * `sbt "runMain graft.tools.PqSweep"`. */
object PqSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val emb = Tables.load(spark, sf, "embeddings").cache()
    val q = emb.filter(col("vec_id") < 5)
    val c = emb.filter(col("vec_id") >= 5)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Similarity.bruteForceTopK(q, c, "embedding", "vec_id", 5))
    for (m <- Seq(16)) {
      val book = Similarity.pqTrain(c, "embedding", dim = 64, m = m, k = 16)
      val codes = Similarity.pqEncode(c, book, "embedding", "vec_id", dim = 64, m = m)
      for (rerank <- Seq(64, 96, 128, 192)) {
        val pq = pairs(Similarity.pqTopK(q, c, codes, book, "embedding",
          "vec_id", dim = 64, m = m, k = 5, rerank = rerank))
        println(f"m=$m%2d rerank=$rerank%3d recall=${(brute & pq).size.toDouble / brute.size}%.2f")
      }
    }
    spark.stop()
  }
}
