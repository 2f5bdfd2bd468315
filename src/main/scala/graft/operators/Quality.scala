package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Adaptive (per-group) quality thresholds for corpus curation.
  *
  * A fixed global cutoff (e.g. "drop docs under 40 tokens") is wrong for a
  * multilingual/multi-domain corpus — the length and quality distributions
  * differ per language, so one constant over-prunes some slices and
  * under-prunes others. The standard fix (CCNet-style per-language
  * percentile buckets) is a per-group quantile cutoff: compute the q-th
  * percentile of the metric WITHIN each group, keep rows at or above their
  * own group's threshold.
  *
  * Exactness contract: the threshold is the DISCRETE percentile — the value
  * at rank `ceil(q·n)` in ascending order — computed with integer ranks, so
  * it is bit-identical across engines (no interpolation, whose formula
  * varies by implementation). `q·n` itself is exact for dyadic q (0.25,
  * 0.5, …) and deterministic regardless.
  *
  * Scale shape: the rank pass shuffles ONLY (group, metric) — project
  * before the window — and the threshold table has one row per group, so
  * the join back to the corpus is a broadcast. Net cost at 100 TB: one
  * 2-column shuffle + one broadcast-join scan pass.
  *
  * The reference engine has no quantile support at all (SURVEY §2.4 — its
  * aggregates are SUM/AVG/COUNT/MIN/MAX, `/root/reference/src/warpdb.cpp`);
  * this is pipeline-extension surface.
  */
object Quality {

  /** One row per group: (groupCol, thr) where thr is the discrete q-th
    * percentile of `valueCol` within the group. */
  def perGroupThreshold(df: DataFrame, groupCol: String, valueCol: String,
      q: Double, thrCol: String = "thr"): DataFrame = {
    require(q > 0.0 && q <= 1.0, s"quantile out of range: $q")
    val w = Window.partitionBy(groupCol).orderBy(col(valueCol))
    val cw = Window.partitionBy(groupCol)
    df.select(col(groupCol), col(valueCol))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__cnt", count(lit(1)).over(cw))
      // rank ceil(q·n): the smallest value with at least q·n values ≤ it.
      .filter(col("__rn") >= ceil(lit(q) * col("__cnt")))
      .groupBy(groupCol)
      .agg(min(col(valueCol)).as(thrCol))
  }

  /** Keep rows whose `valueCol` is ≥ their group's q-th percentile. The
    * result carries the threshold column so downstream audits can see what
    * cutoff each row cleared. */
  def filterByGroupQuantile(df: DataFrame, groupCol: String,
      valueCol: String, q: Double, thrCol: String = "thr"): DataFrame = {
    val thr = perGroupThreshold(df, groupCol, valueCol, q, thrCol)
    df.join(broadcast(thr), Seq(groupCol))
      .filter(col(valueCol) >= col(thrCol))
  }
}
