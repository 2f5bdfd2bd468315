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
  * hash partition per scope. The fold itself runs as a native `aggregate`
  * higher-order function over the group's (id, size) array — one pass, no
  * UDF, no driver involvement. */
object Packing {

  /** Pack each group's documents (ascending `idCol`) into bins of at most
    * `budget` units; returns (groupCol, idCol, bin) with bins numbered
    * from 0 per group. `sizeCol` is the per-document unit count (tokens). */
  def packSequences(df: DataFrame, groupCol: String, idCol: String,
                    sizeCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val items = df.select(col(groupCol).as("__grp"),
      col(idCol).cast("long").as("id"), col(sizeCol).cast("long").as("n"))
    // one array per scope, in id order (struct sort: id is the first field)
    val grouped = items.groupBy("__grp")
      .agg(array_sort(collect_list(struct(col("id"), col("n")))).as("items"))
    val zero = struct(lit(0L).as("acc"), lit(0L).as("bin"),
      array().cast("array<struct<id:bigint,bin:bigint>>").as("out"))
    def step(st: Column, d: Column): Column = {
      val overflow = (st.getField("acc") + d.getField("n") > budget) &&
        (st.getField("acc") > 0)
      val acc = when(overflow, d.getField("n"))
        .otherwise(st.getField("acc") + d.getField("n"))
      val bin = when(overflow, st.getField("bin") + 1)
        .otherwise(st.getField("bin"))
      struct(acc.as("acc"), bin.as("bin"),
        concat(st.getField("out"),
          array(struct(d.getField("id").as("id"), bin.as("bin")))).as("out"))
    }
    grouped
      .select(col("__grp"),
        explode(aggregate(col("items"), zero, step, _.getField("out"))).as("p"))
      .select(col("__grp").as(groupCol), col("p.id").as(idCol),
        col("p.bin").as("bin"))
  }
}
