package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => VF}

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths, per the standard ANN playbook:
  *  - `bruteForceTopK`: the exact baseline. The (small) query set is
  *    broadcast against the corpus — the corpus NEVER shuffles; each
  *    partition scores its rows against every query (O(|corpus|·|queries|)
  *    work, embarrassingly parallel), then per-query top-k via window.
  *    Correct at any corpus size as long as |queries| is broadcastable.
  *  - `lshTopK`: the scale path when |queries| is large too — random-
  *    hyperplane signatures (Charikar'02) banded into buckets; candidates
  *    come from bucket equi-joins (shuffle on bucket keys only), exact
  *    cosine re-ranks candidates. Recall tuned by bits/bands.
  *
  * Cosine is the custom codegen'd `CosineSimilarity` expression — the inner
  * loop lives inside whole-stage codegen, not a UDF.
  */
object Similarity {

  /** Exact top-k neighbors for each query vector. `queries` and `corpus`
    * both carry (idCol, vecCol); a query's own id is excluded when present
    * in the corpus. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     vecCol: String, idCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    val c = spread(corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        VF.cosineSimilarity(col("q_vec"), col("n_vec")).as("cosine"))
    // rank ties broken by neighbor id for full determinism
    val w = Window.partitionBy("q_id")
      .orderBy(col("cosine").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** LSH-bucketed ANN: candidates from banded random-hyperplane signatures,
    * exact cosine re-rank, per-query top-k. Same output schema as
    * `bruteForceTopK`; recall < 1 by design (tunable via bits/bands).
    *
    * `multiProbe` additionally probes, on the QUERY side only, every bucket
    * at hamming distance 1 within each band (Lv et al., VLDB'07): candidate
    * recall rises as if extra bands existed, but the corpus index stays the
    * same size — the standard recall/space trade for large corpora (query
    * fan-out grows r-fold; corpus-side storage and shuffle don't).
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
              vecCol: String, idCol: String, k: Int,
              bits: Int = 16, bands: Int = 8, seed: Long = 7L,
              multiProbe: Boolean = true): DataFrame = {
    require(bits % bands == 0, "bands must divide bits")
    val r = bits / bands
    // Slim banded index: (id, band, bucket) ONLY. Attaching vectors here
    // would duplicate the full corpus payload ×bands through the bucket
    // join's shuffle — measured 358 MB vs ~10 MB at a 50k×128-dim corpus
    // (soak, NOTES.md). Vectors re-attach by id-equi-join after candidate
    // dedup, so each is shuffled at most once and scored exactly once.
    def banded(df: DataFrame, id: String) =
      spread(df).select(col(idCol).as(id),
          VF.rhpSignature(col(vecCol), bits, seed).as("sig"))
        .select(col(id),
          posexplode(array((0 until bands).map(bd =>
            shiftrightunsigned(col("sig"), bd * r)
              .bitwiseAND(lit((1L << r) - 1))): _*))
            .as(Seq("band", "bucket")))
    val q0 = banded(queries, "q_id")
    val q =
      if (multiProbe) {
        val masks = 0L +: (0 until r).map(1L << _).toSeq
        q0.withColumn("bucket",
            explode(array(masks.map(m => col("bucket").bitwiseXOR(lit(m))): _*)))
      } else q0
    val c = banded(corpus, "n_id")
    val candIds = c.join(q,
        q("band") === c("band") && q("bucket") === c("bucket") &&
          q("q_id") =!= c("n_id"))
      .select(col("q_id"), col("n_id"))
      .dropDuplicates("q_id", "n_id")
    val qv = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    val cv = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
    val scored = candIds.join(qv, "q_id").join(cv, "n_id")
      .select(col("q_id"), col("n_id"),
        VF.cosineSimilarity(col("q_vec"), col("n_vec")).as("cosine"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cosine").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** K-means-trained coarse cells for IVF (Spark MLlib KMeans — seeded,
    * deterministic): returns the corpus plus a `cell` prediction column.
    * Training cost is a handful of passes over (sampled) vectors; at 100 TB
    * you train on a sample and `transform` the full corpus in one map. */
  def kmeansCells(corpus: DataFrame, vecCol: String, k: Int,
                  seed: Long = 7L, maxIter: Int = 10): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    val feat = spread(corpus)
      .withColumn("__features", array_to_vector(col(vecCol)))
    val model = new org.apache.spark.ml.clustering.KMeans()
      .setK(k).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("__features").setPredictionCol("cell")
      .fit(feat)
    model.transform(feat).drop("__features")
  }

  /** IVF-style ANN using a precomputed coarse partition (here: the corpus's
    * cluster/label column as the inverted-file cell): queries probe only
    * their `nprobe` nearest cells' rows. Centroids are computed by averaging
    * per cell (one small agg), broadcast back; the big corpus shuffles ONCE
    * at write time in a real deployment (bucketed/partitioned by cell). */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
              vecCol: String, idCol: String, cellCol: String,
              k: Int, nprobe: Int = 2): DataFrame = {
    // centroid per cell: elementwise mean via posexplode + groupBy (dim, cell)
    val exploded = corpus.select(col(cellCol).as("cell"),
      posexplode(col(vecCol)).as(Seq("dim", "v")))
    val centroids = exploded.groupBy("cell", "dim").agg(avg("v").as("cv"))
      .groupBy("cell")
      .agg(array_sort(collect_list(struct(col("dim"), col("cv")))).as("pairs"))
      .select(col("cell"),
        transform(col("pairs"), p => p.getField("cv").cast("float")).as("centroid"))
    // each query scores all centroids (tiny, broadcast), keeps nprobe cells
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    val probeW = Window.partitionBy("q_id")
      .orderBy(col("c_sim").desc, col("cell").asc)
    val probes = q.crossJoin(broadcast(centroids))
      .select(col("q_id"), col("q_vec"), col("cell"),
        VF.cosineSimilarity(col("q_vec"), col("centroid")).as("c_sim"))
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nprobe)
      .select(col("q_id"), col("q_vec"), col("cell"))
    // score only rows in probed cells
    val c = spread(corpus).select(col(cellCol).as("cell"), col(idCol).as("n_id"),
      col(vecCol).as("n_vec"))
    val scored = c.join(broadcast(probes), Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        VF.cosineSimilarity(col("q_vec"), col("n_vec")).as("cosine"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cosine").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
