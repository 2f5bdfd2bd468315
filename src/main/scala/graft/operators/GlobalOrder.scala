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

  /** Append `cumCol`: the running total of `valueCol` under `sortCols`,
    * restarting PER GROUP — `SUM() OVER (PARTITION BY group ORDER BY …)`
    * without the window's scale cliff. The window spelling sorts each
    * group inside ONE task, so a training mix with five sources turns a
    * 1000-executor cluster into five sorting threads. Here the range
    * exchange keys on (group, sortCols) — a hot group SPANS partitions —
    * and the two-phase offset scheme of [[runningTotal]] generalizes to
    * per-(partition, group) partial sums: the driver sees P×G numbers
    * (G = #groups, domains-sized), each partition starts every group at
    * its exclusive prefix, one linear pass finishes. NULL values count
    * as 0, like SQL's SUM() OVER. */
  def groupRunningTotal(df: DataFrame, groupCol: String,
                        sortCols: Seq[Column], valueCol: String,
                        cumCol: String = "cum")
                       (implicit scope: CacheScope = CacheScope.global): DataFrame =
    groupRunningTotalWithTotals(df, groupCol, sortCols, valueCol, cumCol)._1

  /** [[groupRunningTotal]] plus the per-group value totals — FREE on the
    * driver: phase 2 already collects per-(partition, group) sums to
    * compute the prefix offsets, and the group total is their sum
    * (integer, order-free — exactly `SUM(valueCol) GROUP BY group`).
    * Callers that previously ran a separate counts/totals aggregate
    * action over the same frame (temperatureSample's quota counts, the
    * quantile family's `__cnt`) read this instead: one action and one
    * full pass fewer per call (guide §2.4 — the s22 recallAtKMany
    * batching rule). */
  private[operators] def groupRunningTotalWithTotals(
      df: DataFrame, groupCol: String,
      sortCols: Seq[Column], valueCol: String,
      cumCol: String = "cum")
     (implicit scope: CacheScope = CacheScope.global): (DataFrame, Seq[(Any, Long)]) = {
    val spark = df.sparkSession
    val p = spark.sparkContext.defaultParallelism
    // group leads the range key: a group's rows are contiguous across the
    // partition sequence, so per-partition prefixes compose per group
    val sorted = scope.cache(
      df.repartitionByRange(p, col(groupCol) +: sortCols: _*)
        .sortWithinPartitions(col(groupCol) +: sortCols: _*))
    val gIdx = sorted.schema.fieldIndex(groupCol)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    require(sorted.schema(vIdx).dataType == LongType,
      s"$valueCol must be LongType (cast counts to long first)")
    val base = sorted.rdd
    // phase 2: per-(partition, group) sums — P×G rows to the driver
    val partSums = base.mapPartitionsWithIndex { (pid, it) =>
      val acc = scala.collection.mutable.LinkedHashMap.empty[Any, Long]
      it.foreach { r =>
        // register the group even when the value is NULL (+0): an
        // all-null slice must still CARRY the prefix into the next
        // partition, not reset it
        val g = r.get(gIdx)
        val v = if (r.isNullAt(vIdx)) 0L else r.getLong(vIdx)
        acc.update(g, acc.getOrElse(g, 0L) + v)
      }
      acc.iterator.map { case (g, s) => (pid, g, s) }
    }.collect()
    // exclusive prefix per group across the partition sequence
    val offsets: Map[(Int, Any), Long] = partSums
      .groupBy(_._2)
      .flatMap { case (g, rows) =>
        val byPid = rows.sortBy(_._1)
        byPid.map(_._1).zip(
          byPid.map(_._3).scanLeft(0L)(_ + _))
          .map { case (pid, off) => (pid, g) -> off }
      }
    // phase 3: linear pass, one running counter per group in this partition
    val rdd = base.mapPartitionsWithIndex { (pid, it) =>
      val run = scala.collection.mutable.HashMap.empty[Any, Long]
      it.map { r =>
        val g = r.get(gIdx)
        var s = run.getOrElse(g, offsets.getOrElse((pid, g), 0L))
        if (!r.isNullAt(vIdx)) s += r.getLong(vIdx)
        run.update(g, s)
        Row.fromSeq(r.toSeq :+ s)
      }
    }
    val totals = partSums.groupBy(_._2)
      .map { case (g, rows) => g -> rows.map(_._3).sum }.toSeq
    (spark.createDataFrame(rdd,
      sorted.schema.add(cumCol, LongType, nullable = false)), totals)
  }

  /** Driver-held per-group totals as a broadcastable one-partition frame
    * (|groups| rows — metadata by the bounded-group contract), for the
    * callers that join the totals back onto the cumulative table. */
  private[operators] def totalsFrame(
      spark: org.apache.spark.sql.SparkSession,
      groupField: org.apache.spark.sql.types.StructField,
      totals: Seq[(Any, Long)], cntCol: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      groupField, org.apache.spark.sql.types.StructField(
        cntCol, LongType, nullable = false)))
    spark.createDataFrame(
      totals.map { case (g, n) => Row(g, n) }.asJava, schema)
  }

  /** Per-domain token-budget selection — the "data mixing" pass of a
    * multi-source training corpus: each source keeps its highest-priority
    * documents until ITS budget (the mixture weight × the total token
    * budget) is spent. Groups absent from `budgets` are dropped — an
    * unknown source has no mixture weight. Built on
    * [[groupRunningTotal]], so no per-group single-task sort anywhere. */
  def mixBudgetSelect(df: DataFrame, groupCol: String,
                      sortCols: Seq[Column], valueCol: String,
                      budgets: Map[String, Long], cumCol: String = "cum")
                     (implicit scope: CacheScope = CacheScope.global): DataFrame = {
    require(budgets.nonEmpty, "mixBudgetSelect needs at least one budget")
    // when-chain over a domains-sized map; unknown groups get NULL → drop
    val budgetOf = budgets.foldLeft(lit(null).cast("long")) {
      case (acc, (g, b)) => when(col(groupCol) === g, lit(b)).otherwise(acc)
    }
    groupRunningTotal(df, groupCol, sortCols, valueCol, cumCol)
      .filter(col(cumCol) <= budgetOf)
  }
}
