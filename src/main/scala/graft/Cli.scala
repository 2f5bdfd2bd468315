package graft

import org.apache.spark.sql.SparkSession

/** CLI entry point — the analog of the reference's
  * `./warpdb "expr [WHERE cond]" [file]` (`/root/reference/src/main.cu:120-385`).
  *
  * Usage:
  *   runMain graft.Cli "<expr [WHERE cond]>" [file]           — E1 masked map
  *   runMain graft.Cli --sql "SELECT ..." [sfDir]             — E2 dialect SQL
  *
  * Default file mirrors the reference's `data/test.csv` default with our
  * test lineitem table.
  */
object Cli {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: graft.Cli \"expr [WHERE cond]\" [file] | --sql \"SELECT ...\" [sfDir]")
      sys.exit(2)
    }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val result =
        if (args(0) == "--sql") {
          val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.001")
          Engine.sql(spark, sfDir, args(1), float32 = false)
        } else {
          val path = args.lift(1)
            .getOrElse("/root/testdata/sf0.001/lineitem.parquet")
          Engine.query(graft.sources.Sources.open(spark, path), args(0))
        }
      result.show(100, truncate = false) // K3: stdout sink
    } finally spark.stop()
  }
}
