package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

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

  // ---- typed facade ----------------------------------------------------
  // Case-class views of the corpus tables for user code that wants
  // compile-time column safety: `docs.filter(_.lang == "en").map(_.text)`
  // type-checks, while the underlying plan stays Catalyst-optimized
  // (as[T] is a projection contract, not a row-by-row conversion — scans
  // still prune and push down until a typed lambda forces deserialization;
  // prefer the Column API inside hot paths, typed lambdas at the edges).

  /** One corpus document. `ts`-free tables map 1:1; nullable columns use
    * Option at the edge of user code, but the generated test data is
    * fully populated so plain fields keep the API ergonomic. */
  final case class Document(doc_id: Long, text: String, lang: String,
                            source: String, n_chars: Long)

  /** One embedding row: the vector is `Array[Float]` exactly as stored. */
  final case class Embedding(vec_id: Long, embedding: Array[Float],
                             label: Int)

  def documents(spark: SparkSession, sfDir: String): Dataset[Document] = {
    import spark.implicits._
    load(spark, sfDir, "documents").as[Document]
  }

  def embeddings(spark: SparkSession, sfDir: String): Dataset[Embedding] = {
    import spark.implicits._
    load(spark, sfDir, "embeddings").as[Embedding]
  }
}
