package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join: attach to every point row the interval
  * rows of the same key that contain it — the attribution/windowing staple
  * ("which campaign window was this click inside") that a naive SQL
  * formulation executes as a per-key theta join (every point × every
  * interval of that key), which at 100 TB means a handful of hot keys each
  * exploding quadratically on one executor.
  *
  * (The reference's grammar stops at equality joins,
  * `/root/reference/include/warpdb.hpp:22`; this is part of the
  * beyond-the-reference surface, oracled against DuckDB's inequality join.)
  *
  * Implementation is bucketed equi-join, the standard range-join
  * optimization (Spark has no native one; Databricks' range-join hint and
  * Flink's interval join use the same trick):
  *
  *   1. pick a bucket width W (≈ the typical interval length);
  *   2. each interval EXPLODES into the buckets it overlaps —
  *      `sequence(floor(start/W), floor(end/W))` rows, ≤ len/W + 2 each;
  *   3. each point maps to its single bucket `floor(ts/W)`;
  *   4. equi-join on (key…, bucket) — a plain hash shuffle both Catalyst
  *      and AQE know how to plan, broadcast, and skew-split;
  *   5. re-check the exact containment predicate (the bucket join is a
  *      superset).
  *
  * A (point, interval) pair can meet in at most ONE bucket — the point's —
  * so no dedup pass is needed; the result is exactly the theta-join output.
  * Cost: the shuffle carries |points| + Σ⌈len/W⌉ interval replicas; W tunes
  * replication against bucket selectivity (W ≈ median interval length keeps
  * replication ≤ 2× while a bucket pair prunes everything farther than W
  * apart). Both inputs reach the join through their parquet scans' pushed
  * filters — nothing here blocks pushdown.
  */
object IntervalJoin {

  /** @param points    rows with a numeric time column `ptCol`
    * @param intervals rows with numeric `startCol`/`endCol` (inclusive ends;
    *                  same unit as `ptCol` — normalize timestamps first,
    *                  e.g. via `graft.Tables.tsNanos`)
    * @param keys      equality key columns present on both sides
    * @param bucketWidth bucket size in the same unit; must be positive
    * @return points' columns + intervals' non-key columns, one row per
    *         (point, containing interval) pair
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keys: Seq[String], ptCol: String,
                      startCol: String, endCol: String,
                      bucketWidth: Long): DataFrame = {
    require(keys.nonEmpty, "interval join needs at least one key column")
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val clash = intervals.columns.filterNot(keys.contains)
      .filter(points.columns.contains)
    require(clash.isEmpty,
      s"interval join: column(s) ${clash.mkString(", ")} exist on both " +
        "sides — rename one side before joining")
    val w = lit(bucketWidth)
    // Bucket function: floor(c/W) via double arithmetic. At epoch-nano
    // magnitudes (~1e18) doubles can't represent c exactly, so this is NOT
    // exact floor division — and doesn't need to be. Correctness requires
    // only that bucketOf is (non-strictly) MONOTONE and applied identically
    // to points and interval endpoints: then start ≤ pt ≤ end implies
    // bucketOf(start) ≤ bucketOf(pt) ≤ bucketOf(end), so the exploded
    // bucket range always covers the point's bucket and the exact
    // containment re-check removes any superset slack. Monotone it is:
    // long→double conversion, division by a positive constant, and floor
    // are each order-preserving. Off-by-one-ulp bucketing only ever shifts
    // a boundary value's bucket — replication changes by ≤ 1, results don't.
    def bucketOf(c: org.apache.spark.sql.Column) =
      floor(c.cast("double") / w.cast("double")).cast("long")
    val pts = points.withColumn("__bucket", bucketOf(col(ptCol)))
    // malformed (end < start) intervals produce an empty sequence → explode
    // drops them, matching the theta join (no point can satisfy both bounds)
    val ivs = intervals
      .filter(col(endCol) >= col(startCol))
      .withColumn("__bucket",
        explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
    pts.join(ivs, keys :+ "__bucket")
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bucket")
  }
}
