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
    // mimic bench warmup
    Seq("q1_agg", "q5_join_agg", "s1_ann_brute").foreach { n =>
      SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    (1 to 5).foreach { i =>
      time(s"d1_run$i") {
        SparkEntry.queries("d1_exact_dedup")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    (1 to 3).foreach { i =>
      time(s"d2_run$i") {
        SparkEntry.queries("d2_minhash_lsh")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
