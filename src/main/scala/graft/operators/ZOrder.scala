package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional data skipping —
  * the lakehouse write-layout optimization (Delta OPTIMIZE ZORDER BY,
  * Iceberg sort orders): rows sorted by one column skip beautifully on that
  * column and not at all on any other, while rows sorted by the interleaved
  * bits of TWO quantized columns keep each parquet row group's min/max
  * ranges narrow on BOTH — so predicates on either dimension prune row
  * groups at the scan. At 100 TB the scan you skip is the cheapest scan
  * there is; this is a WRITE-side operator whose payoff is every future
  * read.
  *
  * (The reference has no storage layout control at all — tables are
  * whatever the CSV loader produced in host RAM,
  * `/root/reference/src/csv_loader.cpp:38-90`; this is part of the
  * beyond-the-reference scale surface.)
  *
  * Design choices, each load-bearing for cross-engine determinism:
  *   - quantization uses CALLER-SUPPLIED bounds, not data-derived min/max:
  *     the production pattern (bounds come from table stats/partition
  *     metadata, stable across incremental writes — data-derived bounds
  *     would re-cluster the whole table every append), and it keeps the
  *     z-value a pure per-row expression — no extra aggregate pass;
  *   - the quantize→interleave pipeline is built ONLY from codegen'd
  *     builtins (arithmetic, floor, shifts, masks) — one whole-stage-fused
  *     projection, no UDF, and the identical formula is expressible in
  *     ANSI SQL for the oracle;
  *   - clustering is `repartitionByRange` on the z-value + an
  *     intra-partition sort: a range exchange (sampled bounds, same shape
  *     as GlobalOrder/p6) so output files tile the curve contiguously —
  *     NOT a single-partition global sort.
  */
object ZOrder {

  /** Quantize `c` into `[0, 2^bits)` by linear scaling over [min, max):
    * `clamp(floor((c - min) / (max - min) * 2^bits))`. Out-of-bounds
    * values clamp to the edge buckets (stats drift between bound refreshes
    * must degrade locality, not correctness). Double arithmetic — the
    * formula's ops are IEEE-identical across engines. */
  def quantize(c: Column, min: Double, max: Double, bits: Int): Column = {
    require(max > min, s"quantize needs max > min, got [$min, $max]")
    require(bits >= 1 && bits <= 20, s"bits must be in [1,20], got $bits")
    val n = (1L << bits).toDouble
    val q = floor((c.cast("double") - lit(min)) / lit(max - min) * lit(n))
    least(lit((1L << bits) - 1), greatest(lit(0L), q.cast("long")))
  }

  /** Interleave the low `bits` bits of two already-quantized longs:
    * x occupies even bit positions, y odd — the 2-D Morton code. Unrolled
    * shift/mask/or chain, fully codegen'd. */
  def interleave2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 20, s"bits must be in [1,20], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The 2-D z-value of (xCol, yCol) under the given bounds. */
  def zValue2(xCol: Column, xMin: Double, xMax: Double,
              yCol: Column, yMin: Double, yMax: Double, bits: Int): Column =
    interleave2(quantize(xCol, xMin, xMax, bits),
      quantize(yCol, yMin, yMax, bits), bits)

  /** Cluster `df` along the 2-D Morton curve of the two (column, min, max)
    * dimensions: range-exchange on the z-value (`numFiles` output
    * partitions ≈ output files) + intra-partition sort. Keeps all input
    * columns plus the z-value as `zCol` (callers drop it after write if
    * unwanted — keeping it makes the layout auditable). */
  def cluster(df: DataFrame,
              x: (Column, Double, Double), y: (Column, Double, Double),
              bits: Int, numFiles: Int, zCol: String = "zkey"): DataFrame = {
    require(numFiles >= 1, s"numFiles must be positive, got $numFiles")
    require(!df.columns.contains(zCol),
      s"column $zCol already exists — pass a different zCol")
    df.withColumn(zCol, zValue2(x._1, x._2, x._3, y._1, y._2, y._3, bits))
      .repartitionByRange(numFiles, col(zCol))
      .sortWithinPartitions(zCol)
  }

  /** The DuckDB/ANSI spelling of [[quantize]] — generated alongside the
    * Column version so gate oracles can't drift from the engine formula.
    * `e` is a raw numeric SQL expression (e.g. `o_totalprice`,
    * `epoch_us(o_orderdate)`). Compose in a CTE, then feed the aliased
    * results to [[interleave2Sql]]. */
  def quantizeSql(e: String, min: Double, max: Double, bits: Int): String = {
    val n = (1L << bits).toDouble
    s"least(${(1L << bits) - 1}, greatest(0, " +
      s"CAST(floor((CAST($e AS DOUBLE) - $min) / ${max - min} * $n) AS BIGINT)))"
  }

  /** The SQL spelling of [[interleave2]] over two already-quantized column
    * references (`qx`, `qy` — e.g. CTE aliases of [[quantizeSql]]). */
  def interleave2Sql(qx: String, qy: String, bits: Int): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($qx >> $i) & 1) << ${2 * i})",
        s"((($qy >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" | ")
}
