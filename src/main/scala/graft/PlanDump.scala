package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `explain("formatted")` for named gates into per-query files —
  * the optimization-round evidence trail (`plans/r15/<name>_<tag>.txt`).
  *
  *   SPARK_GRAFT_PLAN_DIR=plans/r15 SPARK_GRAFT_PLAN_TAG=before \
  *   sbt "runMain graft.PlanDump d17_best_of_cluster ..."
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val dir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "/root/repo/plans/r15")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "before")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(dir))
    args.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(dir, s"${name}_$tag.txt"), txt)
        println(s"[plandump] wrote $dir/${name}_$tag.txt")
      } catch { case e: Throwable =>
        println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
      graft.operators.CacheScope.global.release(blocking = true)
    }
    spark.stop()
  }
}
