package graft.tools

import org.apache.spark.sql.SparkSession

/** Focused gate dump: run ONLY the named SparkEntry queries against a
  * scale-factor dir and write each result to `outDir/<name>` parquet —
  * the fast inner loop for checking one new gate against its DuckDB
  * oracle without replaying all of Verify. Not part of the driver
  * contract.
  *
  * `sbt "runMain graft.tools.GateCheck /root/testdata/sf0.01 /tmp/gc p6_shuffle_order"`
  */
object GateCheck {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: GateCheck <sfDir> <outDir> <query...>")
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      graft.operators.CacheScope.global.release()
      println(s"[gatecheck] wrote $outDir/$name")
    }
    spark.stop()
  }
}
