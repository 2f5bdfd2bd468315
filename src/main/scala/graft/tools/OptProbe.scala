package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** One-off decomposition probes for the optimization rounds (not part of
  * the driver contract): times the serve-path pieces of the heaviest
  * remaining bench rows in isolation so per-task work is attributed
  * before it is "optimized" (guide §1 — measure first).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.OptProbe"
  */
object OptProbe {
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
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[probe] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        graft.operators.CacheScope.global.release(blocking = true)
      }
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = graft.Tables.load(spark, sfDir, "documents")
    val train = docs.filter(col("doc_id") % 20 =!= 0)

    // t22 decomposition: the serve = shingle scan → broadcast semi-join →
    // df-guard agg → pair join → sizes join
    time("t22_a_scan_only")(noop(train.select("doc_id", "text")))
    val sh3 = array_distinct(TF.shingles(col("text"), 3))
    time("t22_b_shingle_arrays")(noop(
      train.select(col("doc_id"), sh3.as("sh"))))
    time("t22_c_shingle_explode")(noop(
      train.select(col("doc_id"), explode(sh3).as("shingle"))))
    time("t22_d_explode_count")(
      train.select(col("doc_id"), explode(sh3).as("shingle"))
        .groupBy().count().collect())
    spark.stop()
  }
}
