package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF (point-in-time) join: for every left row, attach the most recent
  * right row with the same key and timestamp ≤ the left row's — the
  * feature-pipeline staple ("state of the dimension when the event
  * happened") that plain SQL needs a correlated subquery for and Spark has
  * no native operator for. The reference engine has nothing comparable; this
  * is part of the beyond-the-reference training-pipeline surface (DuckDB's
  * native ASOF JOIN serves as the correctness oracle).
  *
  * Implementation is the union–sort trick, NOT a per-row lookup or a range
  * cross join: tag both sides, align schemas, union, ONE hash shuffle on the
  * key, sort within each key by (ts, side), and carry the latest right
  * payload forward with `last(_, ignoreNulls).over(running window)`. A right
  * row at the same ts as a left row IS visible to it (right sorts first —
  * matching ASOF's `left.ts >= right.ts`). Left rows with no prior right row
  * carry nulls (LEFT ASOF semantics; filter nulls for inner).
  *
  * Scale: cost is one shuffle + one sort over |L|+|R| rows — the floor for
  * any key-partitioned temporal join — and the running-window fill is a
  * single forward pass per key (no frame re-scan). All payload columns share
  * one Window spec, so Catalyst plans a single Window node. Caveat: one key's
  * rows must sort within one partition (inherent to ordered fills); a
  * pathologically hot key concentrates there — pre-split such keys by time
  * range if that ever dominates.
  *
  * Right rows should be unique per (key, ts) — pre-aggregate otherwise
  * (ties at identical (key, ts) would resolve arbitrarily).
  */
object AsOf {

  /** @param payloadCols right-side columns to attach (left keeps ALL its
    *                    columns; the right's key/ts are consumed by the
    *                    match and not re-emitted) */
  def join(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
           payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "asof join needs at least one payload column")
    val leftExtra = left.columns.toSeq.filterNot(c => c == keyCol || c == tsCol)
    val rSchema = right.schema
    val lSchema = left.schema

    // schema-aligned tagged union: left rows carry null right-payloads,
    // right rows carry null left-extras
    val lAligned = left.select(
      col(keyCol) +: col(tsCol) +:
        (leftExtra.map(col) ++
          payloadCols.map(c =>
            lit(null).cast(rSchema(c).dataType).as(s"__r_$c")) :+
          lit(1).as("__side")): _*)
    val rAligned = right.select(
      col(keyCol) +: col(tsCol) +:
        (leftExtra.map(c => lit(null).cast(lSchema(c).dataType).as(c)) ++
          payloadCols.map(c => col(c).as(s"__r_$c")) :+
          lit(0).as("__side")): _*)

    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payloadCols.foldLeft(lAligned.unionByName(rAligned)) {
      (df, c) => df.withColumn(s"__r_$c",
        last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select(left.columns.map(col).toSeq ++
        payloadCols.map(c => col(s"__r_$c").as(c)): _*)
  }
}
