package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.KmvSketch

/** Persisted KMV sketch tables — the lifecycle rung for the
  * [[graft.functions.KmvSketch]] family (every other served artifact in
  * the repo has one: ANN indexes, BM25 postings, thresholds, tokenizers).
  *
  * Layout: `$path/sketches` = (group, sk: array<bigint>) rows,
  * `$path/_params` = (layout, k). The design exploits the property that
  * makes KMV worth persisting at all — CLOSURE UNDER UNION (pinned in
  * PipelineSpec): writes are APPEND-ONLY rows, never a rewrite, and the
  * reader merges per group by re-sketching the stored hash values
  * (k-min of a union of k-min sets IS the k-min of the union). So:
  *
  *   - ingest slices sketch independently anywhere, anytime, and append
  *     their |groups|-row tables — no read-modify-write, no generation
  *     swap, crash-safe by parquet file atomicity;
  *   - a load collapses however many appended rows exist per group into
  *     ONE exact sketch (cost: |rows|·k longs through one hash agg —
  *     metadata-scale however big the corpora behind them were);
  *   - two snapshots' stored sketches feed [[KmvSketch.estimateJaccard]]
  *     directly — cross-corpus overlap without touching either corpus.
  *
  * The k and layout persist in `_params` and are validated on every
  * append/load (the index-family tag discipline): merging sketches built
  * at DIFFERENT k silently degrades the estimate floor, so it refuses.
  */
object Sketches {

  private val Layout = "kmv_v1"

  /** Create a sketch table at `path` from a (group, sk) frame — the
    * output shape of `groupBy(group).agg(kmvSketch(h, k))`. */
  def saveKmvSketches(sketches: DataFrame, groupCol: String, skCol: String,
                      path: String, k: Int): Unit = {
    require(k >= 2, s"k must be at least 2, got $k")
    val spark = sketches.sparkSession
    import spark.implicits._
    sketches.select(col(groupCol).as("group"), col(skCol).as("sk"))
      .write.mode("overwrite").parquet(s"$path/sketches")
    Seq((Layout, k)).toDF("layout", "k")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_params")
  }

  private def readK(spark: SparkSession, path: String): Int = {
    val p = Similarity.readParams(spark, path).head()
    require(p.getAs[String]("layout") == Layout,
      s"sketch table at $path has layout ${p.getAs[String]("layout")}, " +
        s"expected $Layout")
    p.getAs[Int]("k")
  }

  /** Append a new slice's (group, sk) rows. The slice must be sketched
    * at the SAME k the table was created with — validated against
    * `_params`, because a union of different-k sketches is only as good
    * as the smaller k and would silently degrade the estimate. */
  def appendKmvSketches(sketches: DataFrame, groupCol: String,
                        skCol: String, path: String, k: Int): Unit = {
    val stored = readK(sketches.sparkSession, path)
    require(stored == k,
      s"sketch table at $path was built at k=$stored, got k=$k — " +
        "sketches merge exactly only at equal k")
    sketches.select(col(groupCol).as("group"), col(skCol).as("sk"))
      .write.mode("append").parquet(s"$path/sketches")
  }

  /** Load the table, merging every appended row per group into one exact
    * sketch: explode the stored hash values and re-aggregate — by union
    * closure this equals the one-shot sketch of everything the appended
    * slices ever saw. Output: (group, sk). */
  def loadKmvSketches(spark: SparkSession, path: String): DataFrame = {
    val k = readK(spark, path)
    spark.read.parquet(s"$path/sketches")
      .select(col("group"), explode(col("sk")).as("h"))
      .groupBy("group")
      .agg(KmvSketch.kmvSketch(col("h"), k).as("sk"))
  }
}
