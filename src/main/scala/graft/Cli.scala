package graft

import org.apache.spark.sql.SparkSession

/** CLI entry point — the analog of the reference's
  * `./warpdb "expr [WHERE cond]" [file]` (`/root/reference/src/main.cu:120-385`).
  *
  * Usage:
  *   runMain graft.Cli "<expr [WHERE cond]>" [file]           — E1 masked map
  *   runMain graft.Cli --sql "SELECT ..." [sfDir]             — E2 dialect SQL
  *   runMain graft.Cli --full-sql "SELECT ..." [sfDir]        — ANSI passthrough
  *
  * `--fns <file>` (before the mode flag) loads `name(p1,…) = expr` function
  * definitions for the dialect modes — the CLI face of the reference's
  * `./custom.cu` pickup. Default file mirrors the reference's
  * `data/test.csv` default with our test lineitem table.
  */
object Cli {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        "usage: graft.Cli [--fns defs.fns] \"expr [WHERE cond]\" [file] " +
          "| --sql \"SELECT ...\" [sfDir] | --full-sql \"SELECT ...\" [sfDir]")
      sys.exit(2)
    }
    // optional --fns <path> (anywhere in the arg list): file-drop function
    // definitions loaded into the engine-wide registry (custom.cu analog —
    // per-engine, not per-query), visible to BOTH the expr and dialect modes
    val fnsIdx = args.indexOf("--fns")
    if (fnsIdx >= 0 && fnsIdx == args.length - 1) {
      System.err.println("--fns requires a definitions-file path")
      sys.exit(2)
    }
    val rest =
      if (fnsIdx >= 0) {
        graft.functions.FunctionRegistry.loadFile(Engine.registry, args(fnsIdx + 1))
        args.patch(fnsIdx, Nil, 2)
      } else args
    if (rest.isEmpty) {
      System.err.println("missing query")
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
        if (rest(0) == "--sql") {
          val sfDir = rest.lift(2).getOrElse("/root/testdata/sf0.001")
          Engine.sql(spark, sfDir, rest(1), float32 = false)
        } else if (rest(0) == "--full-sql") {
          val sfDir = rest.lift(2).getOrElse("/root/testdata/sf0.001")
          Engine.fullSql(spark, sfDir, rest(1))
        } else {
          val path = rest.lift(1)
            .getOrElse("/root/testdata/sf0.001/lineitem.parquet")
          Engine.query(graft.sources.Sources.open(spark, path), rest(0))
        }
      result.show(100, truncate = false) // K3: stdout sink
    } finally spark.stop()
  }
}
