package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{TextFunctions => TF, VectorFunctions => VF}

/** Stage-level breakdown of d2_minhash_lsh at sf0.1 (not part of the
  * driver contract): times the fingerprint collapse, sketch, band join,
  * and verify stages in isolation to locate the dominant cost. */
object D2Profile {
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
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[d2] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    // warm up the JVM/codegen/parquet footers on the real pipeline once
    graft.operators.Dedup.minHashLsh(docs, "text", "doc_id", 0.5).count()
    graft.operators.CacheScope.global.release(blocking = true)

    (1 to 2).foreach { round =>
      println(s"[d2] -- round $round --")
      val base = graft.operators.spread(
        docs.select(col("doc_id").as("id"), col("text")))
      time("stage0_fingerprint_collapse") {
        base.select(col("id"), xxhash64(col("text")).as("fp"))
          .groupBy("fp").agg(min("id")).count()
      }
      val withSig = base
        .withColumn("sh", array_distinct(TF.shingles(col("text"), 3)))
        .withColumn("bands", VF.minhashBandHashes(col("sh"), 128, 32))
        .select("id", "sh", "bands")
      time("sketch_materialize") { withSig.cache().count() }
      val banded = withSig.select(col("id"),
        posexplode(col("bands")).as(Seq("band", "bucket")))
      val cands = time("band_join_distinct") {
        val a = banded.as("a"); val b = banded.as("b")
        val c = a.join(b,
            col("a.band") === col("b.band") &&
              col("a.bucket") === col("b.bucket") &&
              col("a.id") < col("b.id"))
          .select(col("a.id").as("a_id"), col("b.id").as("b_id")).distinct()
        c.cache().count(); c
      }
      time("verify_exact_jaccard") {
        cands
          .join(withSig.select(col("id").as("a_id"), col("sh").as("sh_a")), "a_id")
          .join(withSig.select(col("id").as("b_id"), col("sh").as("sh_b")), "b_id")
          .select((size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))).cast("double")).as("j"))
          .filter(col("j") >= 0.5).count()
      }
      time("full_operator") {
        graft.operators.Dedup.minHashLsh(docs, "text", "doc_id", 0.5).count()
      }
      withSig.unpersist(); cands.unpersist()
      graft.operators.CacheScope.global.release(blocking = true)
    }
    spark.stop()
  }
}
