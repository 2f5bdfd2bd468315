package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table catalog over the driver-generated parquet test tables.
  *
  * The reference (WarpDB) resolves a single `FROM <table>` against one loaded
  * file (`/root/reference/src/warpdb.cpp:159-190` extension dispatch); here the
  * catalog is a name → DataFrame mapping over a scale-factor directory, which
  * is the multi-table generalization its JOIN grammar
  * (`/root/reference/src/expression.cpp:375-401`) implies.
  *
  * Scale note: each table is a plain parquet read — Spark splits it into
  * `spark.sql.files.maxPartitionBytes`-sized partitions, so the same code path
  * serves 6k rows locally and 100 TB on a cluster. No caching here: callers
  * select/filter first so parquet column pruning + predicate pushdown stay
  * effective (caching would materialize all columns).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Lazy catalog for the dialect front-end's FROM/JOIN resolution. */
  def catalog(spark: SparkSession, sfDir: String): String => DataFrame =
    name => {
      require(names.contains(name), s"Unknown table: $name")
      load(spark, sfDir, name)
    }
}
