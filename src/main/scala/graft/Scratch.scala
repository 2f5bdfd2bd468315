package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling / plan-inspection main (not part of the driver contract). */
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
    val name = sys.env.getOrElse("SCRATCH_QUERY", "q5_join_agg")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.write.format("noop").mode("overwrite").save() // let AQE finalize
    println(s"==== $name final plan ====")
    println(df.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
