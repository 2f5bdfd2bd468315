package graft

import org.apache.spark.sql.DataFrame

package object operators {
  /** Spread a DataFrame across the session's parallelism for CPU-bound
    * per-row stages (signatures, scoring, decode).
    *
    * Small single-file parquet inputs arrive as ONE partition (a file with
    * one row group cannot be split), which serializes compute-heavy
    * operators onto one core. At cluster scale inputs already have ≥
    * parallelism partitions and this is a no-op — the guard checks the
    * actual partition count so no gratuitous shuffle is added to big scans.
    */
  private[graft] def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // Catalyst size estimate — metadata only (file sizes), no job, no RDD
    // materialization. Inputs under ~1 GiB arrive in a handful of partitions
    // (a one-row-group file is unsplittable), so round-robin them across the
    // cluster; bigger inputs are already parallel.
    val sizeEstimate = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (sizeEstimate < (1L << 30)) df.repartition(target) else df
  }
}
