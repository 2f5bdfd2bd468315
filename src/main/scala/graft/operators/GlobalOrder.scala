package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Total-order operators that are safe at corpus scale: global position
  * assignment and global running totals over an arbitrary sort order.
  *
  * The naive Spark spelling — `row_number().over(Window.orderBy(...))` with
  * no partitionBy — collapses the whole dataset into ONE task and is the
  * single most common scale cliff in pipeline code. The scalable shape is
  * the two-phase scheme RDD.zipWithIndex uses:
  *
  *   1. range-exchange on the sort key (`repartitionByRange` samples the
  *      key distribution, so partitions are balanced even for skewed keys)
  *      and sort within each partition — this is exactly how Spark executes
  *      a global `orderBy`, O(n log n) work spread over all executors;
  *   2. one metadata-sized job collects per-partition row counts (or value
  *      sums) — P numbers to the driver, nothing more;
  *   3. a second linear pass adds each partition's exclusive offset to its
  *      local index (or local running sum). No extra shuffle — the pass
  *      runs on the partitions produced by step 1.
  *
  * Used for the training-data steps that need a total order: deterministic
  * corpus shuffling (position = rank under a keyed hash — every re-run and
  * every engine produces the SAME permutation) and token-budget selection
  * (keep documents in priority order until the budget is spent).
  *
  * (The reference's only total-order machinery is its single-thread GPU
  * sorts, `/root/reference/src/warpdb.cpp:472-516` — nothing distributed.)
  */
object GlobalOrder {

  /** Append `posCol`: the row's 0-based rank under `sortCols` (which must
    * reach a total order — include a unique tiebreaker). Two linear jobs,
    * one range exchange, never a single-partition stage.
    *
    * Fully columnar (stays in Tungsten/whole-stage codegen end-to-end —
    * no RDD round-trip, no Row boxing): after the range sort,
    * `monotonically_increasing_id` yields the within-partition row index
    * in its low 33 bits (ids are assigned in row-stream order, which IS
    * the sorted order), a P-row aggregate collects per-partition counts,
    * and the global position is `offset(partition) + local index` via a
    * tiny exclusive-prefix literal — the same zipWithIndex algorithm the
    * RDD spelling used, minus the per-row deserialize/re-plan cost. */
  def withPosition(df: DataFrame, sortCols: Seq[Column],
                   posCol: String = "pos")
                  (implicit scope: CacheScope = CacheScope.global): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sparkContext.defaultParallelism
    // cached: the count job and the offset pass both read the sorted data
    val sorted = scope.cache(
      df.repartitionByRange(p, sortCols: _*)
        .sortWithinPartitions(sortCols: _*))
    // phase 2: P partition counts to the driver (metadata-sized)
    val counts = sorted
      .groupBy(spark_partition_id().as("__pid"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until p)
      .scanLeft(0L)((acc, pid) => acc + counts.getOrElse(pid, 0L))
    val offLit = typedLit(offsets.take(p))
    // phase 3: one fused projection — partition offset + local row index
    sorted
      .withColumn("__mono", monotonically_increasing_id())
      .withColumn(posCol,
        (element_at(offLit, spark_partition_id() + 1) +
          col("__mono").bitwiseAND(lit((1L << 33) - 1))).as(posCol))
      .drop("__mono")
  }

  /** Append `cumCol`: the inclusive running total of `valueCol` under the
    * `sortCols` total order (ROWS UNBOUNDED PRECEDING .. CURRENT ROW).
    * Same two-phase shape as [[withPosition]] with per-partition SUMS as
    * the offsets. NULL values count as 0 (the row keeps its position and
    * carries the running total unchanged) — matching SQL's `SUM() OVER`,
    * which ignores NULLs, rather than failing mid-task on the first NULL. */
  def runningTotal(df: DataFrame, sortCols: Seq[Column], valueCol: String,
                   cumCol: String = "cum")
                  (implicit scope: CacheScope = CacheScope.global): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sparkContext.defaultParallelism
    // cached: the partial-sum job and the offset pass both read the sort
    val sorted = scope.cache(
      df.repartitionByRange(p, sortCols: _*)
        .sortWithinPartitions(sortCols: _*))
    val vIdx = sorted.schema.fieldIndex(valueCol)
    require(sorted.schema(vIdx).dataType == LongType,
      s"$valueCol must be LongType (cast counts to long first)")
    val base = sorted.rdd
    // phase 2: P partial sums to the driver (metadata-sized)
    val partSums = base.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      it.foreach(r => if (!r.isNullAt(vIdx)) s += r.getLong(vIdx))
      Iterator((pid, s))
    }.collect().toMap
    val nParts = base.getNumPartitions
    val offsets = Array.tabulate(nParts)(identity)
      .scanLeft(0L)((acc, pid) => acc + partSums.getOrElse(pid, 0L))
    // phase 3: linear pass adds the exclusive prefix offset
    val rdd = base.mapPartitionsWithIndex { (pid, it) =>
      var run = offsets(pid)
      it.map { r =>
        if (!r.isNullAt(vIdx)) run += r.getLong(vIdx)
        Row.fromSeq(r.toSeq :+ run)
      }
    }
    spark.createDataFrame(rdd, sorted.schema.add(cumCol, LongType, nullable = false))
  }

  /** Deterministic corpus shuffle: global position under the md5 keyed-hash
    * order (same cross-engine hash rule as [[Splits]]) — the "shuffle the
    * training data" step, reproducible on any engine and any cluster
    * layout. Returns the input columns plus `pos`. */
  def shuffleOrder(df: DataFrame, keyCol: String, salt: String = "",
                   posCol: String = "pos")
                  (implicit scope: CacheScope = CacheScope.global): DataFrame =
    withPosition(
      df.withColumn("__h", md5(concat(lit(salt), col(keyCol).cast("string")))),
      Seq(col("__h"), col(keyCol)), posCol)
      .drop("__h")

  /** Priority-ordered budget selection: keep rows in `sortCols` order while
    * the running total of `valueCol` stays within `budget` — the
    * "highest-value documents until the token budget is spent" curation
    * step. Emits the kept rows with their running total. */
  def budgetSelect(df: DataFrame, sortCols: Seq[Column], valueCol: String,
                   budget: Long, cumCol: String = "cum")
                  (implicit scope: CacheScope = CacheScope.global): DataFrame =
    runningTotal(df, sortCols, valueCol, cumCol)
      .filter(col(cumCol) <= budget)
}
