package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives.
  *
  * AQE's runtime skew-join splitting handles most cases (enabled in every
  * session this engine creates); salting is the complementary *aggregation*
  * fix for pathological hot keys — a single grouping key holding a large
  * fraction of a 100 TB table would otherwise pin one reducer regardless of
  * cluster size.
  */
object Skew {

  /** (stage-1 partial over input, stage-2 merge over partials). */
  type MergeableAgg = (Column => Column, Column => Column)

  val SUM: MergeableAgg = (sum(_), sum(_))
  val COUNT: MergeableAgg = (c => count(c), sum(_))
  val MIN: MergeableAgg = (min(_), min(_))
  val MAX: MergeableAgg = (max(_), max(_))

  /** Two-stage salted aggregation for additively-mergeable aggregates:
    *
    *   stage 1: group by (key, salt), salt = hash(row) mod `saltFactor` —
    *            a hot key's rows spread over `saltFactor` reducers, each
    *            producing a partial;
    *   stage 2: group by key, merging the ≤ saltFactor partials (this
    *            shuffle moves only keys × saltFactor rows — negligible).
    *
    * `aggs` is an ordered list of (outputName, inputColumn, aggregate).
    * Result is identical to the direct groupBy (asserted in SkewSpec).
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltFactor: Int,
                aggs: Seq[(String, Column, MergeableAgg)]): DataFrame = {
    require(aggs.nonEmpty, "saltedAgg needs at least one aggregate")
    // salt by row POSITION, not row content: a hot key frequently carries
    // identical payloads, and a content hash would send all duplicates to
    // one reducer — exactly the skew this operator exists to break. The
    // final result is salt-invariant, so positional nondeterminism is safe.
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)))
    val partials = aggs.map { case (name, input, (partial, _)) =>
      partial(input).as(s"__p_$name")
    }
    val stage1 = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)
    val merges = aggs.map { case (name, _, (_, merge)) =>
      merge(col(s"__p_$name")).as(name)
    }
    stage1.groupBy(keys.map(col): _*)
      .agg(merges.head, merges.tail: _*)
  }

  /** Salted equi-join for a pathologically hot join key: the big (probe)
    * side salts each row with `hash(position) mod saltFactor`, the small
    * (build) side replicates every row `saltFactor` times, and the join
    * runs on (keys…, salt) — a hot key's probe rows land on `saltFactor`
    * reducers instead of one. The result is identical to the unsalted
    * join (salt never reaches the output; every probe row still meets
    * every matching build row exactly once, via its single salt replica).
    *
    * This is the static form of what AQE's skew-join split does at
    * runtime; it remains necessary when the skewed stage is NOT a shuffle
    * join AQE can split (e.g. the shuffle feeds a window/sort first) or
    * when partition stats under-report the skew. Cost: the build side
    * grows ×saltFactor — use for dimension-sized builds only; a big-big
    * skewed join wants range-splitting the hot key by time instead.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltFactor: Int): DataFrame = {
    require(keys.nonEmpty, "saltedJoin needs at least one key column")
    require(saltFactor > 0, s"saltFactor must be positive, got $saltFactor")
    // positional salt, same rationale as saltedAgg: content-derived salt
    // would re-concentrate identical hot-key payloads on one reducer
    val salted = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
