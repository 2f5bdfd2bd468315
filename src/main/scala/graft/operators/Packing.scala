package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Greedy sequential sequence packing: assign documents to fixed-capacity
  * training bins ("pack short documents into one context window"), the
  * standard pre-tokenization pass of an LLM data pipeline.
  *
  * Semantics: within each group (e.g. language, or any sharding key),
  * documents are visited in ascending `idCol` order; each is appended to
  * the current bin unless that would push the bin over `budget` tokens, in
  * which case a new bin starts. A document larger than the whole budget
  * gets a bin of its own. Deterministic: output is a pure function of
  * (group, id, size) — no dependence on partitioning or row order.
  *
  * Scale shape: packing is inherently sequential WITHIN a scope (each
  * decision depends on the running fill), so the scope must fit one task —
  * that is not a Spark limitation but the operator's data dependency. The
  * parallelism axis is ACROSS scopes: at 100 TB you pack per (group,
  * shard) with a deterministic shard key (e.g. [[Splits.hashBucket]]),
  * giving arbitrarily many independent folds with no shuffle beyond one
  * hash partition per scope.
  *
  * The fold is a per-partition streaming scan over hash-partitioned,
  * (group, id)-sorted rows — O(rows) with O(1) state, the rare case where
  * `mapPartitions` beats every declarative encoding: a first cut as a
  * native `aggregate` HOF over each group's collect_list array re-copied
  * the accumulator array per element — O(n²) per group, measured 56 s on a
  * 100k-doc soak where this scan takes ~2 s (NOTES.md). */
object Packing {

  /** Pack each group's documents (ascending `idCol`) into bins of at most
    * `budget` units; returns (groupCol, idCol, bin) with bins numbered
    * from 0 per group. `sizeCol` is the per-document unit count (tokens).
    * Output is a pure function of (group, id, size) — the group-wise
    * repartition + within-partition sort pins the scan order regardless of
    * input partitioning. Group values must implement equality (any Spark
    * atomic type does); null groups form one scope. */
  def packSequences(df: DataFrame, groupCol: String, idCol: String,
                    sizeCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = df.sparkSession
    val items = df.select(col(groupCol),
      col(idCol).cast("long").as(idCol), col(sizeCol).cast("long").as("__n"))
    // every row of a group lands in one partition, in id order; a group
    // never spans partitions, so the scan state resets exactly at group
    // boundaries
    val parted = items.repartition(col(groupCol))
      .sortWithinPartitions(col(groupCol), col(idCol))
    val schema = StructType(Seq(
      items.schema.head.copy(name = groupCol),
      StructField(idCol, LongType),
      StructField("bin", LongType)))
    val rows = parted.rdd.mapPartitions { it =>
      var started = false
      var curGrp: Any = null
      var acc = 0L
      var bin = 0L
      it.map { r =>
        val g = r.get(0)
        val id = r.getLong(1)
        val n = r.getLong(2)
        if (!started || g != curGrp) {
          started = true; curGrp = g; acc = 0L; bin = 0L
        }
        if (acc + n > budget && acc > 0L) { bin += 1; acc = n }
        else acc += n
        Row(g, id, bin)
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** Dense packing WITH document splitting: the group's documents form one
    * contiguous token stream (ascending `idCol`) chopped into exact
    * `budget`-unit bins — a document straddling a boundary is split, so
    * every bin except the group's last is exactly full. This is the
    * pre-tokenization layout of GPT-style training runs (documents
    * concatenated, context windows cut at fixed length), where
    * [[packSequences]] is the no-split variant for pipelines that must
    * keep documents whole.
    *
    * Splitting removes the sequential data dependency: a document's
    * placement is `start = Σ sizes before it` (one window cumsum), its
    * bins `start/budget .. (start+n-1)/budget` (a `sequence` explode), and
    * per-bin (offset, len) close-form arithmetic — so unlike the no-split
    * fold this is a single declarative plan: one shuffle for the cumsum,
    * everything else fused map-side. Output: (groupCol, idCol, bin,
    * offset, len) where `offset` indexes into the document and the bin
    * holds its units [offset, offset+len). Zero-size documents occupy no
    * space and emit no rows. */
  def packSequencesDense(df: DataFrame, groupCol: String, idCol: String,
                         sizeCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    import org.apache.spark.sql.expressions.Window
    val items = df.select(col(groupCol),
      col(idCol).cast("long").as(idCol), col(sizeCol).cast("long").as("__n"))
      .filter(col("__n") > 0)
    val w = Window.partitionBy(groupCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val placed = items
      .withColumn("__start", coalesce(sum(col("__n")).over(w), lit(0L)))
      .withColumn("__end", col("__start") + col("__n") - 1)
    placed
      .select(col(groupCol), col(idCol), col("__start"), col("__n"),
        explode(sequence(floor(col("__start") / budget),
          floor(col("__end") / budget))).as("bin"))
      .withColumn("__binStart", greatest(col("__start"), col("bin") * budget))
      .select(col(groupCol), col(idCol), col("bin"),
        (col("__binStart") - col("__start")).as("offset"),
        (least(col("__start") + col("__n"), (col("bin") + 1) * budget) -
          col("__binStart")).as("len"))
  }

  /** Sliding-window document chunking — the context-window prep step of
    * an embedding/RAG pipeline: split each document into ≤ `maxTokens`
    * token windows that overlap by `overlap` tokens, so no boundary
    * context is lost between consecutive chunks. Chunk i covers token
    * positions [1 + i·stride, 1 + i·stride + maxTokens) with
    * stride = maxTokens − overlap; chunk count = max(1,
    * ceil((n − overlap) / stride)) — one chunk for any doc that fits,
    * and the last chunk is the only short one.
    *
    * Scale shape: a ZERO-shuffle scan pass — tokens, window slices, and
    * chunk texts are all computed inside the row with native
    * `sequence`/`transform`/`slice`/`posexplode`; each output chunk row
    * stays on its input's partition. The explode multiplies rows by
    * ~n/stride, which is the output's intrinsic size, not overhead.
    * Deterministic: chunk boundaries are a pure function of
    * (token count, maxTokens, overlap). */
  def chunkByTokens(df: DataFrame, textCol: String, idCol: String,
                    maxTokens: Int, overlap: Int = 0): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens): $overlap vs $maxTokens")
    val stride = maxTokens - overlap
    val tk = col("__tk")
    val k = greatest(lit(1L),
      ceil((size(tk).cast("long") - overlap).cast("double") / stride)
        .cast("long"))
    // the window lambda slices a MATERIALIZED token column — an inline
    // tokens() expression re-runs the split once per chunk
    val chunks = transform(sequence(lit(0L), k - 1),
      i => slice(tk, (i * stride + 1).cast("int"), lit(maxTokens)))
    // spread: the windowing is an interpreted HOF (no codegen), so a
    // one-row-group input would chunk on ONE core; no-op at cluster scale
    spread(df.select(col(idCol), col(textCol)))
      .select(col(idCol),
        graft.functions.TextFunctions.tokens(col(textCol)).as("__tk"))
      .select(col(idCol), posexplode(chunks).as(Seq("chunk_ix", "__toks")))
      .select(col(idCol), col("chunk_ix").cast("int").as("chunk_ix"),
        size(col("__toks")).as("n_tokens"),
        concat_ws(" ", col("__toks")).as("chunk"))
  }
}
